package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

/** Embedded-Derby sy$txlog fixture for the live JDBC capture path
  * (S1): an in-memory database per (JVM, sfDir) holding the reference's
  * capture schema —
  *   "SY$LINEITEM"(txn, l_partkey, l_quantity)  — the source view
  *   "SY$TXLOG"(txn, scn, ts)                   — the commit log
  * populated from a deterministic slice of the parquet tables (txn =
  * l_orderkey, scn = o_orderkey * 10, the exact q_capture_txlog fixture
  * restricted to o_orderkey % 20 = 0 so JDBC batch-insert stays cheap at
  * every SF). `sy$…` must be QUOTED on Derby ($ is illegal in ordinary
  * identifiers there, legal on Oracle). */
object DerbyTxlogFixture {

  case class Db(url: String, viewTable: String, txlogTable: String)

  private val built = new java.util.concurrent.ConcurrentHashMap[String, Db]()

  def ensure(spark: SparkSession, sfDir: String): Db =
    built.computeIfAbsent(sfDir, _ => build(spark, sfDir))

  private def build(spark: SparkSession, sfDir: String): Db = {
    val dbName = "graft_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val url = s"jdbc:derby:memory:$dbName"
    val conn = DriverManager.getConnection(s"$url;create=true")
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE "SY$LINEITEM" (txn BIGINT, l_partkey BIGINT, l_quantity DOUBLE)""")
      st.executeUpdate(
        """CREATE TABLE "SY$TXLOG" (txn BIGINT, scn BIGINT, ts TIMESTAMP)""")

      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
        .where(org.apache.spark.sql.functions.col("o_orderkey") % 20 === 0)
        .select("o_orderkey", "o_orderdate").collect()
      val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .where(org.apache.spark.sql.functions.col("l_orderkey") % 20 === 0)
        .select("l_orderkey", "l_partkey", "l_quantity").collect()

      conn.setAutoCommit(false)
      val insTx = conn.prepareStatement(
        """INSERT INTO "SY$TXLOG" VALUES (?, ?, ?)""")
      orders.foreach { r =>
        insTx.setLong(1, r.getLong(0))
        insTx.setLong(2, r.getLong(0) * 10)
        insTx.setTimestamp(3, java.sql.Timestamp.valueOf(
          r.getAs[java.time.LocalDateTime](1)))
        insTx.addBatch()
      }
      insTx.executeBatch()
      val insLi = conn.prepareStatement(
        """INSERT INTO "SY$LINEITEM" VALUES (?, ?, ?)""")
      items.zipWithIndex.foreach { case (r, i) =>
        insLi.setLong(1, r.getLong(0))
        insLi.setLong(2, r.getLong(1))
        insLi.setDouble(3, r.getDouble(2))
        insLi.addBatch()
        if (i % 5000 == 4999) insLi.executeBatch()
      }
      insLi.executeBatch()
      conn.commit()
      st.executeUpdate("""CREATE INDEX txlog_scn ON "SY$TXLOG" (scn)""")
      st.executeUpdate("""CREATE INDEX view_txn ON "SY$LINEITEM" (txn)""")
      conn.commit()
    } finally conn.close()
    Db(url, "\"SY$LINEITEM\"", "\"SY$TXLOG\"")
  }
}
