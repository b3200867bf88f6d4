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

  test("/bootstrap switchover for a too-old checkpoint is a no-op here") {
    // log retains from scn 0, so no fall-off even for scn 0 checkpoints
    val (state, _, cp) = engine.bootstrap(Checkpoint.online(0L))
    assert(state.isEmpty && cp.windowScn == 0L)
  }
}
