package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftRules
import graft.sources.ChangeFeed

/** Optimizer rules: implied scn-band bounds reach the raw parquet scan. */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("scn band on the capture path pushes implied seq bounds to the scan") {
    GraftRules.install(spark)
    val env = ChangeFeed.envelope(spark, sf())
    val banded = env.where($"scn" > 300 && $"scn" <= 700)

    // implied event_id bounds appear in the scan's pushed filters
    val plan = banded.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("GreaterThan(event_id,290)"),
      s"missing implied lower bound in:\n$plan")
    assert(plan.contains("LessThan(event_id,710)"),
      s"missing implied upper bound in:\n$plan")

    // and the result is exactly the unoptimized semantics
    assert(banded.count() ==
      env.collect().count(r => r.getLong(0) > 300 && r.getLong(0) <= 700))
  }

  test("equality scn predicate derives a closed seq window") {
    GraftRules.install(spark)
    val env = ChangeFeed.envelope(spark, sf())
    val one = env.where($"scn" === 500)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(event_id,490)") &&
      plan.contains("LessThan(event_id,510)"), s"no closed window in:\n$plan")
    assert(one.count() == 10)
  }

  test("rule is idempotent and preserves non-matching filters") {
    GraftRules.install(spark)
    GraftRules.install(spark) // double install must not duplicate
    val env = ChangeFeed.envelope(spark, sf())
    val q = env.where($"source_id" === 3 && $"scn" >= 200)
    val n1 = q.count()
    val n2 = env.where($"source_id" === 3 && $"scn" >= 200).count()
    assert(n1 == n2)
  }
}
