package graft

import java.sql.DriverManager

import graft.sources.JdbcTxlogCapture

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S1 live form: capture against an embedded Derby database — batch pull,
  * scn-band parallel split, chunked paging, and the MicroBatchStream's
  * incremental offset contract (new commits picked up on checkpoint
  * resume, nothing re-delivered). */
class JdbcCaptureSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graft_spec"
  private val View = "\"SY$EVENTS\""
  private val Txlog = "\"SY$TXLOG\""

  private def withDb[A](f: => A): A = {
    val conn = DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        s"""CREATE TABLE $View (txn BIGINT, k BIGINT, v DOUBLE, tag VARCHAR(16))""")
      st.executeUpdate(
        s"""CREATE TABLE $Txlog (txn BIGINT, scn BIGINT, ts TIMESTAMP)""")
      (1L to 50L).foreach { t =>
        st.executeUpdate(s"INSERT INTO $View VALUES ($t, ${t % 7}, ${t * 1.5}, 'tag$t')")
        st.executeUpdate(s"INSERT INTO $Txlog VALUES ($t, ${t * 10}, TIMESTAMP('2024-01-01 00:00:00'))")
      }
    } finally conn.close()
    try f
    finally {
      try DriverManager.getConnection(s"$url;drop=true")
      catch { case _: java.sql.SQLException => () } // drop "fails" with 08006
    }
  }

  private def append(from: Long, to: Long): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      (from to to).foreach { t =>
        st.executeUpdate(s"INSERT INTO $View VALUES ($t, ${t % 7}, ${t * 1.5}, 'tag$t')")
        st.executeUpdate(s"INSERT INTO $Txlog VALUES ($t, ${t * 10}, TIMESTAMP('2024-01-02 00:00:00'))")
      }
    } finally conn.close()
  }

  test("batch pull honors sinceScn and the parallel band split is exact") {
    withDb {
      val all = JdbcTxlogCapture.read(spark, url, View, Txlog, sinceScn = -1L)
      assert(all.count() == 50)
      assert(all.columns.map(_.toLowerCase).toSeq ==
        Seq("scn", "event_timestamp", "txn", "k", "v", "tag"))
      val tail = JdbcTxlogCapture.read(spark, url, View, Txlog, sinceScn = 300L)
      assert(tail.agg(min(col("scn"))).head().getLong(0) == 310L)
      assert(tail.count() == 20)
      val banded = JdbcTxlogCapture.read(spark, url, View, Txlog,
        sinceScn = 300L, numPartitions = 4)
      assert(banded.count() == 20)
      assert(banded.select("txn").except(tail.select("txn")).isEmpty)
    }
  }

  test("chunked query pages the first N transactions after sinceScn") {
    withDb {
      val page = JdbcTxlogCapture.readChunked(spark, url, View, Txlog,
        sinceScn = 100L, chunk = 5L)
      // rows 11..15 (5 txns, one row each here)
      assert(page.count() == 5)
      assert(page.agg(max(col("scn"))).head().getLong(0) == 150L)
    }
  }

  test("micro-batch stream drains, then a resumed run delivers ONLY new commits") {
    withDb {
      val root = java.nio.file.Files.createTempDirectory("jdbcspec").toString
      def drain(): Unit = {
        val q = spark.readStream.format("graft-jdbc-capture")
          .option("url", url).option("view", View).option("txlog", Txlog)
          .option("startingScn", 0L)
          .option("maxScnPerBatch", 200L)
          .load()
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            b.write.mode("append").parquet(s"$root/out"); ()
          }
          .option("checkpointLocation", s"$root/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      val first = spark.read.parquet(s"$root/out")
      assert(first.count() == 50)
      // multiple bounded micro-batches: scn span 500 at 200/batch ⇒ ≥ 3
      assert(first.select("txn").distinct().count() == 50)

      append(51L, 60L)
      drain()
      val second = spark.read.parquet(s"$root/out")
      // resumed from the checkpointed offset: exactly the 10 new commits,
      // none of the first 50 re-delivered
      assert(second.count() == 60)
      assert(second.groupBy("txn").count().where(col("count") > 1).isEmpty)
      assert(second.agg(max(col("scn"))).head().getLong(0) == 600L)
    }
  }
}
