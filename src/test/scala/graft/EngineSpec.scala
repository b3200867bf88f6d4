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
}
