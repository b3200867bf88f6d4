package graft

import graft.model.Checkpoint
import graft.operators._
import graft.sources.ChangeFeed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mirrors TestDbusEventBufferStreamEvents / TestBootstrap shapes: scan
  * bands, checkpoint resume, LWW merge, snapshot+catchup consistency. */
class RelayBootstrapSpec extends SparkSpec {
  import spark.implicits._

  // envelope-shaped change log: (scn, seq, source_id, partition_id,
  // key_long, opcode, value)
  private lazy val log: DataFrame = Seq(
    (0L, 0L, 1, 0, 10L, "UPSERT", 1.0),
    (0L, 1L, 1, 0, 10L, "UPSERT", 2.0),  // same key updated twice in window
    (0L, 2L, 1, 1, 11L, "UPSERT", 3.0),
    (10L, 10L, 1, 0, 10L, "DELETE", 0.0), // tombstone later window
    (10L, 11L, 2, 1, 11L, "UPSERT", 4.0),
    (20L, 20L, 1, 0, 12L, "UPSERT", 5.0),
    (20L, 21L, 2, 1, 11L, "UPSERT", 6.0))
    .toDF("scn", "seq", "source_id", "partition_id", "key_long", "opcode", "value")

  test("streamEvents from flexible checkpoint returns everything") {
    assert(Relay.streamEvents(log).count() == 7)
  }

  test("streamEvents after checkpoint: strictly-later windows") {
    val got = Relay.streamEvents(log, Checkpoint.online(0L))
      .select("seq").as[Long].collect().toSet
    assert(got == Set(10L, 11L, 20L, 21L))
  }

  test("partial-window resume skips windowOffset events") {
    // checkpoint mid-window 0 after 2 delivered events
    val got = Relay.streamEvents(log, Checkpoint.online(0L, windowOffset = 2))
      .select("seq").as[Long].collect().toSet
    assert(got == Set(2L, 10L, 11L, 20L, 21L))
  }

  test("event budget takes first N in scn order") {
    val got = Relay.streamEvents(log, maxEvents = Some(3))
      .select("seq").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 2L))
  }

  test("LWW merge dedups key updates within a window") {
    val merged = Relay.mergeTransaction(log)
    val w0k10 = merged.where($"scn" === 0 && $"key_long" === 10)
      .select("value", "merged_updates").as[(Double, Long)].collect().head
    assert(w0k10 == ((2.0, 2L))) // seq 1 wins, 2 updates merged
    assert(merged.count() == 6)
  }

  test("applyLog: latest per key wins, deletes drop the key") {
    val state = Bootstrap.applyLog(log)
    val byKey = state.select("key_long", "value").as[(Long, Double)]
      .collect().toMap
    assert(byKey == Map(11L -> 6.0, 12L -> 5.0)) // key 10 deleted at scn 10
  }

  test("snapshot+catchup stitch equals direct apply at targetScn") {
    val stitched = Bootstrap.snapshotPlusCatchup(log, startScn = 0L, targetScn = 10L)
      .select("key_long", "value").as[(Long, Double)].collect().toMap
    val direct = Bootstrap.applyLog(log.where($"scn" <= 10))
      .select("key_long", "value").as[(Long, Double)].collect().toMap
    assert(stitched == direct && stitched == Map(11L -> 4.0))
  }

  test("startScn validates the too-young condition") {
    val applied = log.select($"scn".as("windowscn"))
    assert(Bootstrap.startScn(applied, sinceScn = 5L) == 0L)
    assertThrows[IllegalStateException](
      Bootstrap.startScn(applied.where($"windowscn" >= 10), sinceScn = 5L))
  }

  test("targetScn is the max produced window") {
    assert(Bootstrap.targetScn(log.select($"scn".as("windowscn"))) == 20L)
  }

  test("snapshot/catchup band predicates match the reference SQL shape") {
    val tab = log.withColumnRenamed("seq", "id")
    val snap = Bootstrap.snapshotScan(tab, sinceId = 0L, targetScn = 20L)
      .select("id").as[Long].collect().toSet
    assert(snap == Set(1L, 2L, 10L, 11L)) // id>0, scn<20
    val cat = Bootstrap.catchupScan(
      tab.withColumnRenamed("scn", "windowscn"),
      sinceId = -1L, startScn = 10L, targetScn = 20L)
      .select("id").as[Long].collect().toSet
    assert(cat == Set(10L, 11L, 20L, 21L))
  }

  test("scalable seeder chunks are ordered, complete and balanced") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val chunked = Bootstrap.seederChunksScalable(orders, "o_orderkey", 4)
    assert(chunked.count() == orders.count())
    val stats = chunked.groupBy("chunk_id")
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("lo"),
        max("o_orderkey").as("hi"))
      .orderBy("chunk_id")
      .collect()
    assert(stats.length == 4)
    // ranges are disjoint and ordered
    stats.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"))
    }
    // balanced within quantile tolerance
    val sizes = stats.map(_.getAs[Long]("n"))
    assert(sizes.min > sizes.max / 2)
  }

  test("cleaner drops rows below the scn watermark") {
    val l = log.withColumnRenamed("scn", "windowscn")
    assert(Bootstrap.cleanLog(l, 10L).count() == 4)
  }

  test("envelope windows are seq-contiguous and share one scn") {
    val e = ChangeFeed.envelope(spark, sf())
    val bad = e.groupBy("scn")
      .agg(min("seq").as("lo"), max("seq").as("hi"), count(lit(1)).as("n"))
      .where($"hi" - $"lo" + 1 =!= $"n")
    assert(bad.count() == 0)
    // window id = scn = first seq of window
    assert(e.where($"seq" - ($"seq" % ChangeFeed.WindowSize) =!= $"scn").count() == 0)
  }

  test("streamOrdered keeps per-partition scn order") {
    val parts = Relay.streamOrdered(ChangeFeed.envelope(spark, sf()))
      .select("partition_id", "scn", "seq")
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        var ok = true
        var prev = (-1, -1L, -1L)
        it.foreach { r =>
          if (r._1 == prev._1 && (r._2 < prev._2 || (r._2 == prev._2 && r._3 < prev._3)))
            ok = false
          prev = r
        }
        Iterator.single(ok)
      }.collect()
    assert(parts.forall(identity))
  }
}
