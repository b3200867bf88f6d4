package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators.
  *
  * At 100 TB a handful of heavy-hitter keys (a viral document id, a
  * default/null key, a hot tenant) can pin an entire shuffle behind one
  * straggler task. AQE's runtime skew-join splitting covers sort-merge
  * joins; these operators encode the *declarative* salting discipline for
  * the cases AQE does not reach (aggregation fan-in, broadcast-ineligible
  * replicated joins), and they compose with any downstream plan.
  */
object Skew {

  /** Inner equi-join where `build`'s hot keys would skew the shuffle:
    * the build side is replicated once per salt value, the probe side is
    * scattered deterministically across salts, so one hot key spreads over
    * `salts` tasks instead of one. Semantics identical to
    * `probe.join(build, key)`; cost = `salts`× the (small) build side. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact distinct count per group that survives hot groups: the value
    * space of each group is hash-partitioned into `salts` disjoint slices,
    * each slice counts its distincts independently (map-side partial
    * aggregation applies), and per-group slice counts sum — exact because
    * the slices partition the value space. A hot group's state splits over
    * `salts` reducers instead of one. */
  def saltedDistinctCount(df: DataFrame, groupCol: String, valueCol: String,
      salts: Int): DataFrame =
    df.groupBy(col(groupCol),
        pmod(xxhash64(col(valueCol)), lit(salts)).as("__slice"))
      .agg(count_distinct(col(valueCol)).as("__slice_distinct"))
      .groupBy(col(groupCol))
      .agg(sum(col("__slice_distinct")).as("distinct_count"))
}
