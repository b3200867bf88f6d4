package graft

import org.apache.spark.sql.functions._

import graft.sources.{ChangeFeed, Store, WireFixtures}

/** Serving store + wire fixtures: layout, idempotence, row fidelity. */
class StoreSpec extends SparkSpec {
  import spark.implicits._

  test("store table rewrite preserves rows exactly and is idempotent") {
    val direct = spark.read.parquet(s"${sf()}/orders.parquet")
    val stored = Store.table(spark, sf(), "orders")
    assert(stored.count() == direct.count())
    // value-level equality: anti-joins empty both ways
    assert(stored.exceptAll(direct).isEmpty && direct.exceptAll(stored).isEmpty)
    // second access serves the same files (no rewrite: same file list)
    val files1 = stored.inputFiles.toSet
    val files2 = Store.table(spark, sf(), "orders").inputFiles.toSet
    assert(files1 == files2 && files1.nonEmpty)
  }

  test("store event log equals the envelope projection of the raw feed") {
    val fromStore = Store.eventLog(spark, sf())
    val direct = ChangeFeed.envelope(spark, sf())
    assert(fromStore.count() == direct.count())
    assert(fromStore.select("scn", "seq", "source_id", "key_long")
      .exceptAll(direct.select("scn", "seq", "source_id", "key_long")).isEmpty)
  }

  test("store layout: multiple files, range-partitioned so scn bands prune") {
    val log = Store.eventLog(spark, sf())
    assert(log.inputFiles.length >= 2)
    // each file holds a disjoint contiguous scn range (range partitioning):
    // per-file [min,max] intervals must not overlap
    val ranges = log.groupBy(input_file_name())
      .agg(min("scn").as("lo"), max("scn").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("non-store tables read the source file directly") {
    val nation = Store.table(spark, sf(), "nation")
    assert(nation.inputFiles.exists(_.contains("/root/testdata")))
  }

  test("gg trail fixture roundtrips every event through the XML parser") {
    val dir = WireFixtures.goldenGateTrailDir(spark, sf())
    val parsed = graft.sources.GoldenGateTrail.read(spark, dir)
    val raw = ChangeFeed.raw(spark, sf())
    assert(parsed.count() == raw.count())
    // per-source counts match the raw feed's event_type histogram
    val envCnt = graft.sources.GoldenGateTrail
      .toEnvelope(parsed, ChangeFeed.registry)
      .groupBy("source_id").count().as[(Int, Long)].collect().toMap
    val rawCnt = raw.groupBy("event_type").count().as[(String, Long)]
      .collect().toMap
    ChangeFeed.registry.sources.foreach { s =>
      assert(envCnt.getOrElse(s.id, 0L) == rawCnt.getOrElse(s.name, 0L))
    }
  }

  test("binlog fixture: composite scn windows survive the parse") {
    val dir = WireFixtures.binlogDumpDir(spark, sf())
    val env = graft.sources.BinlogFeed.toEnvelope(
      graft.sources.BinlogFeed.parseJsonLines(spark, dir), ChangeFeed.registry)
    val raw = ChangeFeed.raw(spark, sf())
    assert(env.count() == raw.count())
    // the window scn is its COMMIT marker's position: an odd offset (data
    // rows sit on even slots) that dominates every row seq in the window
    val badParity = env.where(
      pmod(col("scn").bitwiseAND(lit(0xFFFFFFFFL)), lit(2)) =!= 1).count()
    assert(badParity == 0)
    assert(env.where(col("scn") < col("seq")).count() == 0)
  }

  test("plan cache hands back one persisted frame per (plan, params)") {
    import graft.pipeline.{Dedup, PlanCache}
    val docs = Store.table(spark, sf(), "documents").select("doc_id", "text")
    val a = Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64)
    val b = Dedup.minhashSignatures(docs, "text", "doc_id", 3, 64)
    assert(a eq b) // same instance — one cache entry, not one per call
    val c = Dedup.minhashSignatures(docs, "text", "doc_id", 3, 32)
    assert(!(a eq c)) // different params → different entry
    PlanCache.clear()
  }

  test("plan cache keys distinguish SAME-SCHEMA tables at different paths") {
    // canonicalized.toString erases file-relation locations, so two scale
    // factors of the same table canonicalize identically — the exact
    // session shape Bench runs (sf0.001 warm-up, then sf0.1 passes). A
    // colliding key would silently reuse the small SF's signature table
    // for the big one (this bit round 5's streaming dedup store at sf0.1).
    import graft.pipeline.{Dedup, PlanCache}
    val small = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val big = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    assert(PlanCache.planKey(small) != PlanCache.planKey(big))
    val sa = Dedup.minhashSignatures(small, "text", "doc_id", 3, 64)
    val sb = Dedup.minhashSignatures(big, "text", "doc_id", 3, 64)
    assert(!(sa eq sb)) // separate entries — each corpus signed itself
    // the corpora happen to share ids/count across SFs; the signatures
    // must still differ because the texts do
    assert(sa.select("sig").exceptAll(sb.select("sig")).count() > 0)
    PlanCache.clear()
  }
}
