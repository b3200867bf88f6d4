package graft

import java.nio.file.Files

import graft.model.{Checkpoint, VersionedSchema}
import graft.operators.{DbusKeyFilter, KeyModFilter, SourceFilter}

/** The §2.10 API surface end-to-end through the facade. */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val engine: GraftEngine = {
    val dir = Files.createTempDirectory("engine-log").toString
    val e = new GraftEngine(spark, dir)
    e.genDataEvents(500)
    e
  }

  test("/sources and /register surfaces") {
    assert(engine.sources.map(_.name).toSet ==
      Set("click", "view", "purchase", "signup", "error"))
    assert(engine.schemas("events").nonEmpty)
    val v2 = VersionedSchema("events", 9, """{"type":"record","name":"X","fields":[]}""")
    engine.registerSchemas(v2)
    assert(engine.schemas("events").map(_.version).contains(9))
  }

  test("/bufferInfo, /startSCN, /targetSCN") {
    val (lo, hi) = engine.bufferInfo()
    assert(lo == 0L && hi == 490L)
    assert(engine.targetScn() == 490L)
    assert(engine.startScn(sinceScn = 10L) == 0L)
  }

  test("/physicalBuffers and /relayStats project the served log") {
    val buffers = engine.physicalBuffers().collect()
    assert(buffers.length == 4) // one row per physical partition
    assert(buffers.map(_.getAs[Long]("num_events")).sum == 500L)
    val stats = engine.relayStats()
    assert(stats.count() == 5) // one row per logical source
    assert(stats.agg(org.apache.spark.sql.functions.sum("num_events"))
      .as[Long].head() == 500L)
  }

  test("/stream batch with filter and budget") {
    val got = engine.stream(Checkpoint.online(400L),
      filter = SourceFilter(Set(1, 2, 3, 4, 5)), maxEvents = Some(50))
    assert(got.count() == 50)
    assert(got.agg(org.apache.spark.sql.functions.min("scn")).as[Long].head() > 400L)
  }

  test("consume: dispatcher delivery through the facade") {
    StreamingSpec.Collector.clear()
    engine.consume(new StreamingSpec.CollectingConsumer,
      Files.createTempDirectory("engine-cp").toString,
      filter = DbusKeyFilter("MOD", Seq(KeyModFilter(2, 0, 1))))
      .awaitTermination()
    val got = StreamingSpec.Collector.events.toArray(
      Array.empty[graft.streaming.EnvelopeRow])
    assert(got.nonEmpty && got.forall(_.key_long.get % 2 == 0))
  }

  test("streamMult serves per-partition checkpoints in cursor order") {
    val cpMult = graft.model.CheckpointMult(
      Map((0: Short) -> Checkpoint.online(300L),
          (2: Short) -> Checkpoint.flexible),
      cursorPartition = Some(0: Short))
    val got = engine.streamMult(cpMult)
    import org.apache.spark.sql.functions._
    // partition 2 (after cursor) ranks before partition 0 (wrapped)
    assert(got.where($"partition_id" === 2)
      .agg(min("serve_rank")).as[Int].head() == 0)
    assert(got.where($"partition_id" === 0)
      .agg(min("serve_rank")).as[Int].head() == 1)
    assert(got.where($"partition_id" === 0 && $"scn" <= 300).count() == 0)
    assert(got.where($"partition_id" === 1).count() == 0) // unsubscribed
  }

  test("dtail through the facade renders capped EVENT_INFO lines") {
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    engine.dtail("BOB", "EVENT_INFO", maxEvents = 5, out = out.add(_))
      .awaitTermination()
    assert(out.size() == 5)
    assert(out.iterator().next().startsWith("scn:"))
  }

  test("/bootstrap switchover for a too-old checkpoint is a no-op here") {
    // log retains from scn 0, so no fall-off even for scn 0 checkpoints
    val (state, _, cp) = engine.bootstrap(Checkpoint.online(0L))
    assert(state.isEmpty && cp.windowScn == 0L)
  }
  test("live JDBC capture feeds the buffer and serves through /stream") {
    import java.sql.DriverManager
    import org.apache.spark.sql.functions._
    val url = "jdbc:derby:memory:graft_engine_spec"
    val conn = DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE "SY$FEED" (txn BIGINT, k BIGINT, v DOUBLE)""")
      st.executeUpdate(
        """CREATE TABLE "SY$TXLOG" (txn BIGINT, scn BIGINT, ts TIMESTAMP)""")
      (1L to 20L).foreach { t =>
        st.executeUpdate(s"""INSERT INTO "SY$$FEED" VALUES ($t, ${t % 4}, ${t * 0.5})""")
        st.executeUpdate(s"""INSERT INTO "SY$$TXLOG" VALUES ($t, ${t * 10}, TIMESTAMP('2024-01-01 00:00:00'))""")
      }
    } finally conn.close()

    val dir = Files.createTempDirectory("engine-jdbc").toString
    val e = new GraftEngine(spark, dir)
    // poll cycle: capture the txlog tail, map to the envelope, buffer it
    val captured = e.captureJdbc(url, "\"SY$FEED\"", "\"SY$TXLOG\"",
      sinceScn = 100L)
    assert(captured.count() == 10) // txns 11..20
    val envelope = captured.select(
      col("scn"), col("txn").as("seq"),
      (unix_micros(col("event_timestamp").cast("timestamp"))).as("ts_us"),
      lit(1).as("source_id"),
      (col("k") % 4).cast("int").as("partition_id"),
      lit("UPSERT").as("opcode"), col("k").as("key_long"),
      col("v").as("value"), lit(null).cast("string").as("props"))
    e.loadDataEvents(envelope)
    // the buffered capture serves through the standard /stream path
    val served = e.stream(Checkpoint.online(0L))
    assert(served.count() == 10)
    assert(served.agg(min(col("scn")), max(col("scn"))).head() match {
      case r => r.getLong(0) == 110L && r.getLong(1) == 200L
    })
    try DriverManager.getConnection(s"$url;drop=true")
    catch { case _: java.sql.SQLException => () }
  }

}
