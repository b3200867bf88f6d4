package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Ann

/** Bit-parity pin for the RDD-kernel Lloyd's iteration (r17): the
  * per-iteration assignment+stats pass moved from a Catalyst aggregate
  * (nearestCellStruct → groupBy(cell).agg(count, sum(dist), vec_sum) —
  * re-planned EVERY iteration because the codebook literal changes) to
  * a plain RDD job with the same arithmetic in the task closure. This
  * spec pins the kernel against the aggregate form, kept verbatim below
  * as the reference:
  *
  *  - single-partition corpus: bit-identical centroids AND WCSS (one
  *    partial, so even the merge order coincides);
  *  - multi-partition corpus: the merge order differs by design
  *    (partition order vs exchange arrival order — the latter was never
  *    deterministic), so parity is 1e-9-relative on floats and the
  *    DOWNSTREAM contract is exact: every corpus vector's assignment
  *    under either codebook is identical;
  *  - Lloyd's invariant (WCSS non-increasing) holds on the kernel form.
  */
class TrainCentroidsSpec extends SparkSpec {
  import spark.implicits._

  /** The r16 aggregate-form iteration, verbatim (minus memo/persist —
    * the spec feeds it small local frames). */
  private def referenceTrain(c: DataFrame, k: Int, iters: Int)
      : (Array[(Long, Seq[Float])], Seq[Double]) = {
    var cents = c.orderBy(col("id")).limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1).toSeq) }
    val wcss = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to iters) {
      val best = Ann.nearestCellStruct(cents, col("vec"))
      val dim = cents(0)._2.length
      val stats = c
        .select(col("vec"), best.getField("c").as("cell"),
          best.getField("d").as("dist"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), sum(col("dist")).as("dsum"),
          graft.functions.GraftFunctions.vec_sum(col("vec"), dim).as("s"))
        .collect()
      wcss += stats.map(_.getDouble(2)).sum
      val means = stats.map { r =>
        val n = r.getLong(1)
        val s = r.getSeq[Double](3)
        r.getLong(0) -> (0 until dim).map(i => (s(i) / n).toFloat).toSeq
      }.toMap
      cents = cents.map { case (cid, old) =>
        (cid, means.getOrElse(cid, old))
      }
    }
    (cents, wcss.toSeq)
  }

  // real-valued corpus (irrational-ish coordinates — fp order actually
  // matters, unlike integer grids where every double sum is exact)
  private def corpus(n: Int) = (0 until n).map { i =>
    (i.toLong, Array.tabulate(6) { d =>
      (math.sin(i * 2.39996 + d) * 10.0 + math.cos(i * 0.7 * d)).toFloat
    })
  }.toDF("id", "vec")

  test("single-partition corpus: kernel ≡ aggregate form, bit-exact") {
    val c = corpus(300).coalesce(1)
    val (refBook, refWcss) = referenceTrain(c, k = 5, iters = 4)
    val (book, wcss) = Ann.trainCentroids(c, k = 5, iters = 4)
    assert(book.map(_._1).toSeq == refBook.map(_._1).toSeq)
    assert(book.flatMap(_._2).toSeq == refBook.flatMap(_._2).toSeq,
      "trained floats must be bit-identical on a single partition")
    assert(wcss == refWcss, s"WCSS $wcss vs reference $refWcss")
  }

  test("multi-partition corpus: fp-tolerant parity, assignments exact") {
    val c = corpus(400).repartition(4)
    val (refBook, refWcss) = referenceTrain(c, k = 6, iters = 3)
    val (book, wcss) = Ann.trainCentroids(c, k = 6, iters = 3)
    assert(book.map(_._1).toSeq == refBook.map(_._1).toSeq)
    book.flatMap(_._2).zip(refBook.flatMap(_._2)).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b)) + 1e-12f,
        s"centroid coordinate $a vs $b")
    }
    wcss.zip(refWcss).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b)),
        s"wcss $a vs $b")
    }
    // the downstream contract: identical assignment for every vector
    val assignKernel = c.select(col("id"),
      Ann.nearestCellExpr(book, col("vec")).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val assignRef = c.select(col("id"),
      Ann.nearestCellExpr(refBook, col("vec")).as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(assignKernel == assignRef,
      "assignments under kernel-trained vs reference-trained books differ")
  }

  test("Lloyd's invariant: WCSS non-increasing under the kernel form") {
    val (_, wcss) = Ann.trainCentroids(corpus(500), k = 4, iters = 5)
    wcss.sliding(2).foreach { pair =>
      assert(pair(1) <= pair(0) * (1 + 1e-9) + 1e-9, wcss.toString)
    }
  }

  test("empty cells keep their previous centroid") {
    // the three init centroids are IDENTICAL (the three lowest ids all
    // sit at the origin), so the distance-tie rule sends every row to
    // the smallest cell id and cells 1–2 are empty from iteration 1 —
    // their coordinates must stay frozen, not collapse to NaN (0/0)
    val pts = ((0 until 10).map(i => (i.toLong, Array(0.0f, 0.0f))) ++
      (10 until 20).map(i => (i.toLong, Array(4.0f, 4.0f))))
      .toDF("id", "vec")
    val (book, _) = Ann.trainCentroids(pts, k = 3, iters = 3)
    assert(book.length == 3)
    assert(book.forall(_._2.forall(v => !v.isNaN)),
      s"NaN centroid from an empty cell: ${book.toSeq}")
    assert(book(2)._2 == Seq(0.0f, 0.0f),
      "an always-empty cell must keep its init centroid")
  }
}
