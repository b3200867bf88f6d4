package graft

import java.nio.file.Files

import graft.model.Checkpoint
import graft.operators.{Relay, Routers}
import graft.sources.AvroFileBootstrap
import graft.sources.AvroFileBootstrap.{PositionedRow, SnapshotRow}
import graft.streaming.{Dispatcher, EnvelopeRow, MultiConsumer, RelayStream}
import graft.sources.ChangeFeed

import org.apache.spark.sql.functions._

class BootstrapAvroSpec extends SparkSpec {
  import spark.implicits._

  test("avro-file snapshot roundtrips with file+record positions (B9)") {
    val dir = Files.createTempDirectory("avroboot").toString
    val rows = (0L until 100L).map(i =>
      SnapshotRow(i, i * 10, i % 7, Array[Byte](i.toByte)))
    AvroFileBootstrap.writeSnapshot(spark.createDataset(rows), dir, numFiles = 4)

    val back = AvroFileBootstrap.readSnapshot(spark, dir)
    assert(back.count() == 100)
    assert(back.map(_.id).collect().toSet == (0L until 100L).toSet)
    // positions: record offsets restart per file, ids ordered within file
    val perFile = back.collect().groupBy(_.file)
    assert(perFile.size == 4)
    perFile.values.foreach { rs =>
      val sorted = rs.sortBy(_.recordOffset)
      assert(sorted.map(_.recordOffset).toSeq == sorted.indices.map(_.toLong))
      assert(sorted.map(_.id).toSeq == sorted.map(_.id).sorted.toSeq)
    }
  }

  test("avro-file snapshot resume skips through the checkpoint position") {
    val dir = Files.createTempDirectory("avroboot2").toString
    val rows = (0L until 50L).map(i => SnapshotRow(i, i, i, Array[Byte](1)))
    AvroFileBootstrap.writeSnapshot(spark.createDataset(rows), dir, numFiles = 2)
    val all = AvroFileBootstrap.readSnapshot(spark, dir).collect()
      .sortBy(r => (r.file, r.recordOffset))
    val mid = all(all.length / 2) // pretend we stopped here
    val resumed = AvroFileBootstrap.readSnapshot(spark, dir,
      afterFile = mid.file, afterRecordOffset = mid.recordOffset).collect()
    val expected = all.filter(r => r.file > mid.file ||
      (r.file == mid.file && r.recordOffset > mid.recordOffset))
    assert(resumed.map(_.id).toSet == expected.map(_.id).toSet)
    assert(resumed.length == expected.length)
  }

  test("multi-consumer fans out every callback; any failure fails the event") {
    val a = new CountingConsumer
    val b = new CountingConsumer
    val m = MultiConsumer(Seq(a, b))
    m.onStartWindow(1L)
    assert(m.onEvent(EnvelopeRow(1, 1, None, 1, 0, None, Some(1L), None, None)))
    m.onEndWindow(1L)
    m.onCheckpoint(Checkpoint.online(1L))
    assert(a.events == 1 && b.events == 1 && a.windows == 1 && b.checkpoints == 1)
    val failing = MultiConsumer(Seq(a, new CountingConsumer {
      override def onEvent(e: EnvelopeRow): Boolean = false
    }))
    assert(!failing.onEvent(EnvelopeRow(1, 2, None, 1, 0, None, Some(1L), None, None)))
  }

  test("routers: hash routing is stable, fnv routing handles strings") {
    val df = Seq((1L, "a"), (2L, "b"), (9L, "c"), (-3L, "d")).toDF("k", "s")
    val hashed = df.select(Routers.hashPartition($"k", 4).as("p"))
      .as[Int].collect().toSeq
    assert(hashed == Seq(1, 2, 1, 3))
    val routed = Routers.routeByKey(df, $"k", 4)
    assert(routed.rdd.getNumPartitions == 4 && routed.count() == 4)
    val fnv = df.select(Routers.fnvPartition($"s", 8).as("p")).as[Int].collect()
    assert(fnv.forall(p => p >= 0 && p < 8))
  }

  test("V1 envelope down-conversion reshapes to ms timestamps (P14)") {
    val v1 = Relay.toV1(ChangeFeed.envelope(spark, sf()))
    assert(v1.columns.toSeq ==
      Seq("scn", "seq", "ts_ms", "source_id", "partition_id", "opcode",
        "key_long", "value"))
    val r = v1.orderBy("seq").select("ts_ms").as[Long].head()
    val orig = ChangeFeed.envelope(spark, sf()).orderBy("seq")
      .select("ts_us").as[Long].head()
    assert(r == orig / 1000L)
  }

  test("observe() metrics surface relay stats per action (A3 streaming)") {
    val observed = Relay.observed(ChangeFeed.envelope(spark, sf()))
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var metrics: Option[org.apache.spark.sql.Row] = None
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.get("relay_stats").foreach(r => metrics = Some(r))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      observed.count()
      // listener fires async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (listener.metrics.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val m = listener.metrics.get
      assert(m.getAs[Long]("num_events") == 1000L)
      assert(m.getAs[Long]("max_scn") == 990L)
    } finally spark.listenerManager.unregister(listener)
  }

  class CountingConsumer extends graft.streaming.DatabusConsumer {
    var events = 0; var windows = 0; var checkpoints = 0
    override def onStartWindow(scn: Long): Unit = windows += 1
    override def onEvent(e: EnvelopeRow): Boolean = { events += 1; true }
    override def onCheckpoint(cp: Checkpoint): Unit = checkpoints += 1
  }
}
