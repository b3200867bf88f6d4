package graft

import graft.functions.{FnvHash64, GraftFunctions}
import graft.operators.{AsOfJoin, Sessions}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionsAsofSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionize splits on gaps per key") {
    val events = Seq(
      (1L, 0L), (1L, 100L), (1L, 150L), // session 0
      (1L, 1000L), (1L, 1050L),         // session 1 (gap 850 > 500)
      (2L, 10L)).toDF("key", "ts")
    val out = Sessions.sessionSummary(events, "key", "ts", gap = 500L)
      .orderBy("key", "session_seq")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 150L, 3L), (1L, 1L, 1000L, 1050L, 2L),
      (2L, 0L, 10L, 10L, 1L)))
  }

  test("streaming sessionize emits closed sessions via state timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessions.SessionEvent]
    val q = Sessions.sessionizeStream(input.toDS(), gapMs = 200L,
      useTimeout = false)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      input.addData(Sessions.SessionEvent(1L, 0L), Sessions.SessionEvent(1L, 100L))
      q.processAllAvailable()
      // gap exceeded within one batch closes the first session
      input.addData(Sessions.SessionEvent(1L, 1000L))
      q.processAllAvailable()
      input.addData(Sessions.SessionEvent(1L, 5000L))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .as[Sessions.SessionOut].collect().toSet
      assert(got.contains(Sessions.SessionOut(1L, 0L, 100L, 2L)))
      assert(got.contains(Sessions.SessionOut(1L, 1000L, 1000L, 1L)))
    } finally q.stop()
  }

  test("asof backward join picks latest build at-or-before probe time") {
    val probe = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 10L, "b10"), (1L, 15L, "b15"), (2L, 99L, "b99"))
      .toDF("k", "bt", "bval")
    val got = AsOfJoin.asofBackward(probe, build, "k", "t", "bt", Seq("bval"))
      .select("k", "t", "asof_bval")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set((1L, 10L, Some("b10")), (1L, 20L, Some("b15")),
      (2L, 5L, None)))
  }

  test("fnv_hash64 native expression matches the kernel and codegens") {
    GraftFunctions.register(spark)
    val df = Seq("databus", "", "unicode ✓").toDF("s")
    val viaCol = df.select(GraftFunctions.fnv_hash64($"s")).as[Long].collect().toSeq
    val viaSql = df.createOrReplaceTempView("fnv_in")
    val sqlGot = spark.sql("SELECT fnv_hash64(s) FROM fnv_in").as[Long].collect().toSeq
    val expected = Seq("databus", "", "unicode ✓").map(FnvHash64.hash)
    assert(viaCol == expected && sqlGot == expected)
    assert(FnvHash64.hash("databus") == graft.pipeline.Dedup.fnv1a64("databus"))
    // type check rejects non-strings
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT fnv_hash64(42)").collect()
    }
  }

  test("fnv_hash64 registers into an independent session") {
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT fnv_hash64('x')").head().getLong(0) ==
      FnvHash64.hash("x"))
  }

  test("cosine_sim and l2sq are SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))," +
        " l2sq(array(CAST(1.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)))").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 4.0) < 1e-9)
  }
}
