package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting operators: identical semantics to their unsalted forms on
  * skewed inputs, hot keys spread across salt values. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape that pins a shuffle task
  private lazy val skewed = spark.range(10000)
    .select(when($"id" % 10 < 9, 7L).otherwise($"id" % 100).as("k"),
      ($"id" % 37).as("v"))

  test("salted join == plain join on skewed probe") {
    val dim = (0L until 100L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k").groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's rows really do scatter: probe side carries >1 salt
    val saltsSeen = skewed.where($"k" === 7L)
      .withColumn("__salt",
        pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(8)))
      .select("__salt").distinct().count()
    assert(saltsSeen > 1)
  }

  test("salted distinct count == exact countDistinct per group") {
    val got = Skew.saltedDistinctCount(skewed, "k", "v", salts = 8)
    val want = skewed.groupBy("k")
      .agg(count_distinct($"v").as("distinct_count"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("HLL approx distinct is within its advertised error bound") {
    // approx_count_distinct's default rsd is 0.05; HLL++'s error is
    // probabilistic but this seed-free plan is deterministic per input, so
    // a 3σ band (15%) is a stable regression guard for the q_hll_distinct
    // surface (approx vs exact ride the same frame there too)
    val rows = graft.sources.ChangeFeed.envelope(spark, sf())
      .groupBy($"source_id")
      .agg(approx_count_distinct($"key_long").as("approx"),
        count_distinct($"key_long").as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
        s"source ${r.getInt(0)}: approx $approx vs exact $exact outside 15%")
    }
  }
}
