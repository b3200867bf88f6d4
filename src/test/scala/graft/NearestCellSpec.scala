package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Ann

/** Bit-parity of the fused [[graft.functions.NearestCell]] assignment
  * kernel with the declarative reference form it replaced (array_min
  * over k struct(l2sq(vec, lit(cent)), id) entries) — the swap is a
  * performance change ONLY: same distances (L2SqDistance's sequential
  * double accumulation over the shorter prefix), same argmin (smallest
  * distance, ties to the smallest cell id), so every memoized codebook,
  * planted-twin oracle and recall floor must be unchanged. */
class NearestCellSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.VectorFunctions.l2sq

  /** The pre-round-16 declarative assignment — kept HERE as the
    * reference implementation the kernel must match. */
  private def declarative(codebook: Array[(Long, Seq[Float])],
      vecCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_min(array(codebook.map { case (cid, cv) =>
      struct(l2sq(vecCol, typedlit(cv)).as("d"), lit(cid).as("c"))
    }: _*))

  private def vec(i: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(d => (((i * 31 + d * 7) % 101).toFloat - 50f) / 9f)

  test("kernel == declarative form: distances, argmin, and tie-breaks") {
    val dim = 16
    // codebook with UNSORTED, non-contiguous ids, including two
    // IDENTICAL centroids (ids 90 and 3) so distance ties are real and
    // the smallest-id rule is actually exercised
    val cb: Array[(Long, Seq[Float])] = Array(
      (90L, vec(2, dim).toSeq), (7L, vec(5, dim).toSeq),
      (3L, vec(2, dim).toSeq), (41L, vec(9, dim).toSeq),
      (11L, vec(13, dim).toSeq))
    val corpus = (0L until 300L).map(i => (i, vec(i % 23, dim)))
      .toDF("id", "vec")
    val both = corpus.select(col("id"),
      Ann.nearestCellStruct(cb, col("vec")).as("k"),
      declarative(cb, col("vec")).as("r"))
      .select(col("id"), col("k.d").as("kd"), col("k.c").as("kc"),
        col("r.d").as("rd"), col("r.c").as("rc"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(3),
        s"distance mismatch at id ${r.getLong(0)}: $r")
      assert(r.getLong(2) == r.getLong(4),
        s"argmin mismatch at id ${r.getLong(0)}: $r")
    }
    // ids 90 and 3 share one centroid vector, so every row nearest to it
    // ties — the winner must ALWAYS be 3 (the smaller id); 90 never wins
    assert(both.exists(_.getLong(2) == 3L), "fixture lost its tied rows")
    assert(!both.exists(_.getLong(2) == 90L),
      "a distance tie resolved to the larger centroid id")
  }

  test("kernel == declarative under interpreted eval (codegen off)") {
    val dim = 8
    val cb: Array[(Long, Seq[Float])] =
      Array((5L, vec(1, dim).toSeq), (2L, vec(4, dim).toSeq))
    val corpus = (0L until 50L).map(i => (i, vec(i, dim))).toDF("id", "vec")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows = corpus.select(
        Ann.nearestCellStruct(cb, col("vec")).as("k"),
        declarative(cb, col("vec")).as("r")).collect()
      rows.foreach { r =>
        assert(r.getStruct(0) == r.getStruct(1), r.toString)
      }
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("shorter-prefix and ragged-codebook edges") {
    // vec shorter than centroids: L2SqDistance scores the shared prefix
    val cb: Array[(Long, Seq[Float])] =
      Array((0L, Seq(1f, 2f, 3f, 4f)), (1L, Seq(9f, 9f, 9f, 9f)))
    val corpus = Seq((10L, Array(1f, 2f))).toDF("id", "vec")
    val k = corpus.select(Ann.nearestCellStruct(cb, col("vec")).as("k"))
      .select(col("k.d"), col("k.c")).head()
    val r = corpus.select(declarative(cb, col("vec")).as("r"))
      .select(col("r.d"), col("r.c")).head()
    assert(k == r, s"$k vs $r")
    assert(k.getLong(1) == 0L && k.getDouble(0) == 0.0)
    // ragged codebook refuses loudly instead of mis-indexing the flat array
    intercept[IllegalArgumentException] {
      Ann.nearestCellStruct(
        Array((0L, Seq(1f, 2f)), (1L, Seq(1f))), col("vec"))
    }
  }

  test("top_cells == declarative crossJoin + row_number probe ranking") {
    import org.apache.spark.sql.expressions.Window
    val dim = 16
    // includes duplicate centroids (ids 90/3 identical) so the
    // (dist, cell_id) tie rule is exercised inside the top-n cut
    val cb: Array[(Long, Seq[Float])] = Array(
      (90L, vec(2, dim).toSeq), (7L, vec(5, dim).toSeq),
      (3L, vec(2, dim).toSeq), (41L, vec(9, dim).toSeq),
      (11L, vec(13, dim).toSeq))
    val queries = (0L until 120L).map(i => (i, vec(i % 23, dim)))
      .toDF("id", "vec")
    val centDf = cb.toSeq.map { case (i, v) => (i, v) }.toDF("id", "vec")
    for (nProbe <- Seq(1, 2, 3, 7)) {
      val kernel = queries.select(col("id").as("query_id"),
          explode(Ann.topCellsExpr(cb, col("vec"), nProbe)).as("p"))
        .select(col("query_id"), col("p.c").as("cell_id"),
          col("p.d").as("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val wq = Window.partitionBy(col("query_id"))
        .orderBy(col("dist"), col("cell_id"))
      val ref = queries.select(col("id").as("query_id"),
          col("vec").as("qvec"))
        .crossJoin(broadcast(centDf.select(col("id").as("cell_id"),
          col("vec").as("cent"))))
        .withColumn("dist", l2sq(col("qvec"), col("cent")))
        .withColumn("r", row_number().over(wq)).where(col("r") <= nProbe)
        .select("query_id", "cell_id", "dist")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(kernel == ref, s"nProbe=$nProbe probe sets differ")
    }
    // output is sorted ascending by (d, c) — positional check
    val ordered = queries.limit(20).select(
        Ann.topCellsExpr(cb, col("vec"), 5).as("p")).collect()
    ordered.foreach { r =>
      val elems = r.getSeq[org.apache.spark.sql.Row](0)
      elems.sliding(2).foreach {
        case Seq(x, y) =>
          val c = java.lang.Double.compare(x.getDouble(0), y.getDouble(0))
          assert(c < 0 || (c == 0 && x.getLong(1) < y.getLong(1)),
            s"not sorted: $elems")
        case _ => ()
      }
    }
  }

  test("vec_sum aggregate == per-dimension declarative sums") {
    val dim = 8
    // ragged + null rows exercise the documented edges: short arrays
    // contribute their prefix, null arrays contribute nothing
    val rows: Seq[(Long, Option[Seq[Float]])] =
      (0L until 100L).map(i => (i % 5, Option(vec(i, dim).toSeq))) ++
        Seq((1L, Some(Seq(1f, 2f))), (2L, None))
    val df = rows.toDF("g", "vec")
    val viaKernel = df.groupBy("g")
      .agg(graft.functions.GraftFunctions.vec_sum(col("vec"), dim).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // try_element_at: the null-on-out-of-bounds item access (plain
    // getItem THROWS under the session's default ANSI mode)
    val sumCols = (0 until dim).map(i =>
      sum(try_element_at(col("vec"), lit(i + 1)).cast("double")).as(s"s$i"))
    val viaSums = df.groupBy("g")
      .agg(sumCols.head, sumCols.tail: _*)
      .collect().map { r =>
        r.getLong(0) -> (0 until dim).map(i =>
          if (r.isNullAt(i + 1)) 0.0 else r.getDouble(i + 1))
      }.toMap
    assert(viaKernel.keySet == viaSums.keySet)
    viaKernel.keySet.foreach { g =>
      assert(viaKernel(g) == viaSums(g), s"group $g")
    }
  }

  test("trainCentroids is unchanged by the kernel swap (WCSS + assignment)") {
    // the spec that would catch any drift in the training path: a fixed
    // corpus trains to the same codebook as the declarative per-step
    // replay below (init = first k by id; one Lloyd's step = per-cell
    // means under declarative assignment)
    val dim = 8
    val corpus = (0L until 200L).map(i => (i, vec(i % 37, dim)))
      .toDF("id", "vec")
    val (cb, wcss) = Ann.trainCentroids(corpus, k = 4, iters = 2)
    assert(cb.length == 4 && wcss.length == 2)
    // WCSS non-increasing — Lloyd's invariant (fp-tolerant)
    assert(wcss(1) <= wcss(0) * (1 + 1e-9) + 1e-9, wcss.toString)
    // replay the assignment of the trained book both ways: identical
    val viaKernel = corpus.select(col("id"),
      Ann.nearestCellExpr(cb, col("vec")).as("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaRef = corpus.select(col("id"),
      declarative(cb, col("vec")).getField("c").as("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaKernel == viaRef)
  }
}
