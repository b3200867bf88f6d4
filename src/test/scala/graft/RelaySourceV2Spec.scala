package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.ChangeFeed
import graft.sources.relay.{RelayBinaryLog, RelayOffset, ScnNotFoundException}

/** The custom DataSource V2 relay source: binary segment format, scn
  * offsets, window-whole batches, pruning, fall-off. */
class RelaySourceV2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val envelope = ChangeFeed.envelope(spark, sf()) // 1000 events

  private lazy val logDir: String = {
    val d = Files.createTempDirectory("relaybin").toString
    RelayBinaryLog.write(envelope, d, numSegments = 8)
    d
  }

  test("binary roundtrip: batch read through format(graft-relay) == envelope") {
    val got = spark.read.format("graft-relay").option("path", logDir).load()
    assert(got.count() == 1000)
    val want = envelope.select("scn", "seq", "ts_us", "source_id",
      "partition_id", "opcode", "key_long", "value")
    val gotCore = got.select("scn", "seq", "ts_us", "source_id",
      "partition_id", "opcode", "key_long", "value")
    assert(gotCore.exceptAll(want).isEmpty && want.exceptAll(gotCore).isEmpty)
  }

  test("segments carry disjoint scn bands and EOW markers terminate windows") {
    val segs = RelayBinaryLog.listSegments(logDir)
    assert(segs.length == 8)
    segs.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxScn <= b.minScn)
      case _ =>
    }
    // read one segment raw: every window's records end before an EOW with
    // the same scn, file ends on EOW
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(segs.head.path)))
    var last: RelayBinaryLog.Rec = null
    var recs = List.empty[RelayBinaryLog.Rec]
    var r = RelayBinaryLog.readRecord(in)
    while (r != null) { recs ::= r; last = r; r = RelayBinaryLog.readRecord(in) }
    in.close()
    assert(last.opcode == RelayBinaryLog.OpEow)
    val eows = recs.filter(_.opcode == RelayBinaryLog.OpEow).map(_.scn).toSet
    val datas = recs.filter(_.opcode != RelayBinaryLog.OpEow).map(_.scn).toSet
    assert(datas.subsetOf(eows)) // every window closed
  }

  test("streaming: scn offsets advance whole windows under admission control") {
    val cpDir = Files.createTempDirectory("relaycp").toString
    val q = spark.readStream.format("graft-relay")
      .option("path", logDir)
      .option("maxSegmentsPerBatch", 2)
      .load()
      .writeStream.format("memory").queryName("relay_v2")
      .option("checkpointLocation", cpDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("relay_v2")
    assert(got.count() == 1000)
    assert(got.select("seq").as[Long].collect().toSet == (0L until 1000L).toSet)
    // admission control: 8 segments at ≤2 per batch ⇒ ≥4 batches committed
    val commits = new java.io.File(s"$cpDir/commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= 4)
  }

  test("offset-band planning prunes segments before opening them") {
    val stream = new graft.sources.relay.RelayMicroBatchStream(
      logDir, new CaseInsensitiveStringMap(java.util.Map.of()))
    val segs = RelayBinaryLog.listSegments(logDir)
    val cut = segs(5).minScn // plan a band inside the tail segments
    val parts = stream.planInputPartitions(RelayOffset(cut), RelayOffset(Long.MaxValue))
    assert(parts.length < segs.length && parts.length >= segs.length - 6)
  }

  test("batch scan: pushed scn predicates prune segments at planning time") {
    val got = spark.read.format("graft-relay").option("path", logDir).load()
      .where($"scn" > 600 && $"scn" <= 800)
    // plan description carries the accepted band; result matches envelope
    val scanDesc = got.queryExecution.executedPlan.toString
    assert(scanDesc.contains("scnBand=(600, 800]"))
    val want = envelope.where($"scn" > 600 && $"scn" <= 800).count()
    assert(got.count() == want && want > 0)
  }

  test("checkpoint resume: restart delivers only segments appended after stop") {
    val d = Files.createTempDirectory("relayresume").toString
    val cpDir = Files.createTempDirectory("relayresumecp").toString
    RelayBinaryLog.write(envelope.where($"scn" < 500), d, numSegments = 4)
    def drain(): Long = {
      val n = new java.util.concurrent.atomic.AtomicLong(0)
      val q = spark.readStream.format("graft-relay").option("path", d).load()
        .writeStream
        .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
          { n.addAndGet(batch.count()); () })
        .option("checkpointLocation", cpDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      n.get()
    }
    val first = drain()
    assert(first == envelope.where($"scn" < 500).count())
    // append the rest of the log, resume from the same checkpoint:
    // only the newly appended segments are delivered
    RelayBinaryLog.write(envelope.where($"scn" >= 500), d, numSegments = 4)
    val second = drain()
    assert(second == envelope.where($"scn" >= 500).count())
  }

  test("consumer dispatch (K3) runs over the custom source end to end") {
    val cpDir = Files.createTempDirectory("relaydispcp").toString
    StreamingSpec.Collector.clear()
    val stream = spark.readStream.format("graft-relay")
      .option("path", logDir).option("maxSegmentsPerBatch", 3).load()
    val q = graft.streaming.Dispatcher.start(stream,
      new StreamingSpec.CollectingConsumer, cpDir)
    q.awaitTermination()
    val got = StreamingSpec.Collector.events.toArray(
      Array.empty[graft.streaming.EnvelopeRow])
    assert(got.length == 1000)
    assert(got.map(_.seq).toSet == (0L until 1000L).toSet)
  }

  test("fall-off: startingScn before retention throws ScnNotFound when strict") {
    // simulate retention: drop the earliest segments
    val d = Files.createTempDirectory("relayret").toString
    RelayBinaryLog.write(envelope.where($"scn" >= 500), d, numSegments = 4)
    val opts = new CaseInsensitiveStringMap(java.util.Map.of(
      "startingScn", "0", "failOnFallOff", "true"))
    val stream = new graft.sources.relay.RelayMicroBatchStream(d, opts)
    intercept[ScnNotFoundException](stream.initialOffset())
    // lenient mode clamps to earliest instead
    val lenient = new graft.sources.relay.RelayMicroBatchStream(d,
      new CaseInsensitiveStringMap(java.util.Map.of("startingScn", "0")))
    val off = lenient.initialOffset().asInstanceOf[RelayOffset]
    assert(off.scn >= 489) // earliest - 1, first retained window is ≥ 490
  }
}
