package graft

import org.apache.spark.sql.functions._

import graft.functions.ZorderKey
import graft.pipeline.Layout

/** Z-order layout: key math vs a bit-by-bit reference, the measurable
  * clustering claim (a 2-D box intersects FEWER file rectangles than
  * under a single-column sort), row identity through the rewrite, loud
  * range failures, and the SQL surface. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refKey(a: Long, b: Long): Long = {
    var k = 0L
    var i = 0
    while (i < 31) {
      k |= ((a >> i) & 1L) << (2 * i)
      k |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    k
  }

  test("zorder key matches the bit-by-bit reference across the domain") {
    val probes = Seq(0L, 1L, 2L, 3L, 7L, 8L, 255L, 256L, 65535L, 65536L,
      123456789L, 0x7fffffffL)
    for (a <- probes; b <- probes)
      assert(ZorderKey.key(a, b) == refKey(a, b), s"key($a, $b)")
    // z-order is a total order consistent with quadrant nesting: both
    // coords in the low half sorts before both in the high half
    assert(ZorderKey.key(15L, 15L) < ZorderKey.key(16L, 16L))
  }

  test("out-of-range inputs fail loudly, never silently mask") {
    intercept[IllegalArgumentException] { ZorderKey.key(-1L, 0L) }
    intercept[IllegalArgumentException] { ZorderKey.key(0L, 0x80000000L) }
  }

  test("a 2-D box intersects fewer z-ordered file rectangles than a-sorted ones") {
    // 64x64 grid, 16 files: the a-sort slices the plane into thin
    // full-height strips (every b-range is the whole domain), the
    // z-order tiles it into near-squares
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b =>
      (a.toLong, b.toLong))).toDF("a", "b")
    val root = java.nio.file.Files.createTempDirectory("zspec").toString
    Layout.zorderWrite(grid, s"$root/z", "a", "b", numFiles = 16)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$root/lin")

    // the box is wide in `a`, narrow in `b` — the shape the a-sort is
    // blind to: its strips all span the full b domain, so only the
    // a-predicate prunes; z-order tiles prune on BOTH predicates
    def hit(dir: String): Long = Layout.fileBounds(spark, dir, "a", "b")
      .where(col("a_max") >= 4 && col("a_min") <= 59 &&
        col("b_max") >= 24 && col("b_min") <= 39)
      .count()
    val (zHit, linHit) = (hit(s"$root/z"), hit(s"$root/lin"))
    assert(zHit < linHit,
      s"z-order must prune better: z=$zHit linear=$linHit of 16 files")

    // the rewrite moves bytes, never rows
    val back = spark.read.parquet(s"$root/z")
    assert(back.count() == 64L * 64L &&
      back.exceptAll(grid).isEmpty && grid.exceptAll(back).isEmpty)
  }

  test("zorder_key is SQL-registered and codegen agrees with eval") {
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT zorder_key(CAST(5 AS BIGINT), CAST(3 AS BIGINT)) AS k")
      .as[Long].head()
    assert(row == refKey(5L, 3L))
  }
}
