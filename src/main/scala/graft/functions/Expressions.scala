package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash of a string column — a native Catalyst expression
  * with whole-stage codegen.
  *
  * Why a custom Expression: the reference buckets string keys with its own
  * hash family (util/Fnv1aHashImpl.java:1, FnvHashFunction.java:1,
  * KeyModFilter.java:55-70), and bucket-assignment parity requires the
  * exact function. A Scala UDF would leave the hot filter path interpreted;
  * this expression generates straight-line Java inside the same codegen
  * stage as the surrounding predicate (preference order (b) of the build
  * rules: compose > Expression > plan rule > mapPartitions).
  *
  * Matches [[graft.pipeline.Dedup.fnv1a64]] (the kernel-side twin) over
  * ASCII; over full UTF-16 both sides iterate chars of the Java string.
  */
case class FnvHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fnv_hash64 requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    FnvHash64.hash(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // ctx.freshName per use: fixed names collide (duplicate declaration)
      // when the expression appears twice in one codegen'd projection
      val (sv, hv, iv) = (ctx.freshName("s"), ctx.freshName("h"), ctx.freshName("i"))
      s"""
         |String $sv = $c.toString();
         |long $hv = 0xcbf29ce484222325L;
         |for (int $iv = 0; $iv < $sv.length(); $iv++) {
         |  $hv ^= $sv.charAt($iv);
         |  $hv *= 0x100000001b3L;
         |}
         |${ev.value} = $hv;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)
  override def prettyName: String = "fnv_hash64"
}

object FnvHash64 {
  def hash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }
}

/** Cosine similarity of two `array<float>` columns — native Catalyst
  * expression with whole-stage codegen.
  *
  * Why a custom Expression: higher-order functions (`aggregate`/`zip_with`)
  * do not participate in whole-stage codegen — Spark evaluates their lambda
  * trees interpreted per element, which makes the similarity hot path
  * (dedup verify, ANN scoring: O(candidates × dims) multiplies) an
  * interpreter loop. This expression reads the Tungsten `ArrayData`
  * buffers directly and emits one fused Java loop into the surrounding
  * codegen stage — no UDF boxing, no encoder deserialization.
  *
  * Accumulation is sequential in double (floats widened per element),
  * bit-identical to [[VectorFunctions.cosineKernel]] and the engine's SQL
  * oracles. Lengths may differ; the shorter prefix is scored. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (nv, iv) = (ctx.freshName("n"), ctx.freshName("i"))
      val (dv, nav, nbv) = (ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"))
      val (xv, yv) = (ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |int $nv = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dv = 0.0, $nav = 0.0, $nbv = 0.0;
         |for (int $iv = 0; $iv < $nv; $iv++) {
         |  double $xv = (double) $a.getFloat($iv);
         |  double $yv = (double) $b.getFloat($iv);
         |  $dv += $xv * $yv; $nav += $xv * $xv; $nbv += $yv * $yv;
         |}
         |${ev.value} = $dv / (java.lang.Math.sqrt($nav) * java.lang.Math.sqrt($nbv));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity = copy(newLeft, newRight)
  override def prettyName: String = "cosine_sim"
}

/** Squared L2 distance of two `array<float>` columns — same rationale and
  * numeric discipline as [[CosineSimilarity]] (fused codegen loop over
  * ArrayData, sequential double accumulation, shorter-prefix semantics). */
case class L2SqDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"l2sq requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (nv, iv) = (ctx.freshName("n"), ctx.freshName("i"))
      val (accv, ddv) = (ctx.freshName("acc"), ctx.freshName("d"))
      s"""
         |int $nv = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $accv = 0.0;
         |for (int $iv = 0; $iv < $nv; $iv++) {
         |  double $ddv = (double) $a.getFloat($iv) - (double) $b.getFloat($iv);
         |  $accv += $ddv * $ddv;
         |}
         |${ev.value} = $accv;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): L2SqDistance = copy(newLeft, newRight)
  override def prettyName: String = "l2sq"
}

/** Fused nearest-centroid argmin over a driver-held codebook — the
  * k-means/IVF assignment kernel as ONE native expression.
  *
  * Why a custom Expression: the declarative form — `array_min` over k
  * `struct(l2sq(vec, lit(centᵢ)), idᵢ)` entries — is semantically right
  * but allocates k structs per row and inlines k loop bodies into the
  * generated method, which at production codebook sizes (k = 64 … 8000)
  * blows past JIT inlining budgets and runs effectively interpreted:
  * the round-16 stage probe measured the k=64 assignment scan at ~40 ns
  * per (row, centroid) — ~175 s per training iteration at 4M rows,
  * making Lloyd's training the dominant stage of every ANN store build
  * and semantic-dedup family. This expression holds the codebook as a
  * flat `float[]` reference object and emits one tight k×dim loop —
  * same arithmetic, same result, two orders of magnitude less code.
  *
  * Bit-parity contract with the declarative form (NearestCellSpec):
  * per-centroid distance is [[L2SqDistance]]'s exact accumulation
  * (sequential double over the shorter prefix), and the argmin follows
  * struct-min ordering — smallest distance wins, distance ties keep the
  * smallest centroid id (`java.lang.Double.compare` = Spark's double
  * total order). Identical vectors therefore land in identical cells
  * under EITHER form, and every memoized codebook, planted-twin oracle
  * and recall floor is unchanged by the swap.
  *
  * Returns `struct<d: double, c: bigint>` — training reads both fields,
  * assignment projects `c`. */
case class NearestCell(child: Expression, ids: Array[Long],
    flat: Array[Float], dim: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType,
    StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", LongType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val lim = math.min(a.numElements(), dim)
    var bestD = 0.0; var bestC = 0L; var first = true
    var c = 0
    while (c < ids.length) {
      var acc = 0.0; var i = 0; val off = c * dim
      while (i < lim) {
        val d = a.getFloat(i).toDouble - flat(off + i).toDouble
        acc += d * d
        i += 1
      }
      val cmp = java.lang.Double.compare(acc, bestD)
      if (first || cmp < 0 || (cmp == 0 && ids(c) < bestC)) {
        bestD = acc; bestC = ids(c); first = false
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("nearestCellCents", flat, "float[]")
    val idsRef = ctx.addReferenceObj("nearestCellIds", ids, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val (limv, cv, iv) =
        (ctx.freshName("lim"), ctx.freshName("cc"), ctx.freshName("i"))
      val (accv, dv, offv) =
        (ctx.freshName("acc"), ctx.freshName("d"), ctx.freshName("off"))
      val (bdv, bcv, fv, cmpv) = (ctx.freshName("bestD"),
        ctx.freshName("bestC"), ctx.freshName("first"), ctx.freshName("cmp"))
      s"""
         |int $limv = java.lang.Math.min($a.numElements(), $dim);
         |double $bdv = 0.0; long $bcv = 0L; boolean $fv = true;
         |for (int $cv = 0; $cv < ${ids.length}; $cv++) {
         |  double $accv = 0.0;
         |  int $offv = $cv * $dim;
         |  for (int $iv = 0; $iv < $limv; $iv++) {
         |    double $dv = (double) $a.getFloat($iv)
         |      - (double) $centsRef[$offv + $iv];
         |    $accv += $dv * $dv;
         |  }
         |  int $cmpv = java.lang.Double.compare($accv, $bdv);
         |  if ($fv || $cmpv < 0 || ($cmpv == 0 && $idsRef[$cv] < $bcv)) {
         |    $bdv = $accv; $bcv = $idsRef[$cv]; $fv = false;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Double.valueOf($bdv),
         |      java.lang.Long.valueOf($bcv)});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
  override def prettyName: String = "nearest_cell"
  // the codebook arrays are plan constants — keep them out of plan
  // strings (default argString would print JVM array identities, making
  // otherwise-identical plans compare unequal)
  override def toString: String =
    s"nearest_cell($child, k=${ids.length}, dim=$dim)"
}

/** Fused top-nProbe nearest-centroids — [[NearestCell]]'s sibling for
  * the PROBE-RANKING stage of every IVF-family serve: per query vector,
  * the nProbe centroids with the smallest (l2sq, id) pairs, ascending.
  *
  * Why a custom Expression: the declarative form — crossJoin the query
  * frame against the broadcast codebook, score, then row_number over
  * (dist, cell_id) — materializes queries × k rows EACH CARRYING BOTH
  * VECTORS through a per-query window exchange. Request-sized serves
  * hide it (30 queries × k), but the corpus-sized batch regime at
  * deployment geometry (k ∝ N) makes it the dominant shuffle: 200k
  * queries × k=8000 ≈ 1.6G rows × two dim-64 arrays ≈ a near-TB
  * exchange for what is per-row arithmetic. This kernel turns the probe
  * ranking into ONE projection (no crossJoin, no window): k×dim flops
  * per row into an nProbe-bounded insertion list.
  *
  * Parity contract (NearestCellSpec): distances are [[L2SqDistance]]'s
  * exact accumulation; selection and output order are row_number over
  * (dist ASC, cell_id ASC) — the declarative form's exact tie rule.
  * Returns `array<struct<d: double, c: bigint>>` of length
  * min(nProbe, k), sorted ascending. */
case class TopCells(child: Expression, ids: Array[Long],
    flat: Array[Float], dim: Int, nProbe: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType,
    StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_cells requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val k = ids.length
    val lim = math.min(a.numElements(), dim)
    val np = math.min(nProbe, k)
    val bd = new Array[Double](np)
    val bc = new Array[Long](np)
    var filled = 0
    var cc = 0
    while (cc < k) {
      var acc = 0.0; var i = 0; val off = cc * dim
      while (i < lim) {
        val d = a.getFloat(i).toDouble - flat(off + i).toDouble
        acc += d * d
        i += 1
      }
      val id = ids(cc)
      val reject = filled == np && {
        val cmp = java.lang.Double.compare(acc, bd(np - 1))
        cmp > 0 || (cmp == 0 && id > bc(np - 1))
      }
      if (!reject) {
        var pos = if (filled < np) filled else np - 1
        var go = pos > 0
        while (go) {
          val c2 = java.lang.Double.compare(bd(pos - 1), acc)
          if (c2 > 0 || (c2 == 0 && bc(pos - 1) > id)) {
            bd(pos) = bd(pos - 1); bc(pos) = bc(pos - 1); pos -= 1
            go = pos > 0
          } else go = false
        }
        bd(pos) = acc; bc(pos) = id
        if (filled < np) filled += 1
      }
      cc += 1
    }
    val out = new Array[Any](filled)
    var j = 0
    while (j < filled) {
      out(j) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](bd(j), bc(j)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("topCellsCents", flat, "float[]")
    val idsRef = ctx.addReferenceObj("topCellsIds", ids, "long[]")
    val np = math.min(nProbe, ids.length)
    nullSafeCodeGen(ctx, ev, a => {
      val (limv, cv, iv, jv) = (ctx.freshName("lim"), ctx.freshName("cc"),
        ctx.freshName("i"), ctx.freshName("j"))
      val (accv, dv, offv, idv) = (ctx.freshName("acc"), ctx.freshName("d"),
        ctx.freshName("off"), ctx.freshName("id"))
      val (bdv, bcv, fillv, posv) = (ctx.freshName("bd"),
        ctx.freshName("bc"), ctx.freshName("filled"), ctx.freshName("pos"))
      val (cmpv, c2v, rejv, outv) = (ctx.freshName("cmp"),
        ctx.freshName("c2"), ctx.freshName("reject"), ctx.freshName("out"))
      s"""
         |int $limv = java.lang.Math.min($a.numElements(), $dim);
         |double[] $bdv = new double[$np];
         |long[] $bcv = new long[$np];
         |int $fillv = 0;
         |for (int $cv = 0; $cv < ${ids.length}; $cv++) {
         |  double $accv = 0.0;
         |  int $offv = $cv * $dim;
         |  for (int $iv = 0; $iv < $limv; $iv++) {
         |    double $dv = (double) $a.getFloat($iv)
         |      - (double) $centsRef[$offv + $iv];
         |    $accv += $dv * $dv;
         |  }
         |  long $idv = $idsRef[$cv];
         |  boolean $rejv = false;
         |  if ($fillv == $np) {
         |    int $cmpv = java.lang.Double.compare($accv, $bdv[$np - 1]);
         |    $rejv = $cmpv > 0 || ($cmpv == 0 && $idv > $bcv[$np - 1]);
         |  }
         |  if (!$rejv) {
         |    int $posv = ($fillv < $np) ? $fillv : ($np - 1);
         |    while ($posv > 0) {
         |      int $c2v = java.lang.Double.compare($bdv[$posv - 1], $accv);
         |      if ($c2v > 0 || ($c2v == 0 && $bcv[$posv - 1] > $idv)) {
         |        $bdv[$posv] = $bdv[$posv - 1];
         |        $bcv[$posv] = $bcv[$posv - 1];
         |        $posv--;
         |      } else break;
         |    }
         |    $bdv[$posv] = $accv; $bcv[$posv] = $idv;
         |    if ($fillv < $np) $fillv++;
         |  }
         |}
         |Object[] $outv = new Object[$fillv];
         |for (int $jv = 0; $jv < $fillv; $jv++) {
         |  $outv[$jv] =
         |    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{java.lang.Double.valueOf($bdv[$jv]),
         |        java.lang.Long.valueOf($bcv[$jv])});
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($outv);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
  override def prettyName: String = "top_cells"
  override def toString: String =
    s"top_cells($child, k=${ids.length}, dim=$dim, nProbe=$nProbe)"
}

/** Dot product of two numeric array columns — same fused-codegen
  * discipline as [[CosineSimilarity]], but element types may be FLOAT or
  * DOUBLE independently per side (PCA's centered vectors are double,
  * raw embeddings float; the accumulation is double either way, with
  * sequential left-to-right order for cross-engine parity).
  *
  * Same edge semantics as cosine_sim/l2sq, which differ from the HOF
  * reference form on malformed input: unequal lengths truncate to the
  * shorter prefix and arrays are assumed null-element-free (embedding
  * columns are) — `VectorFunctions.dot` would return NULL in both
  * cases. On equal-length null-free arrays the two are bit-identical
  * (spec-checked). */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  override def dataType: DataType = DoubleType
  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<FLOAT|DOUBLE> on both sides, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  @inline private def isFloat(t: DataType): Boolean =
    elemType(t).contains(FloatType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val (fa, fb) = (isFloat(left.dataType), isFloat(right.dataType))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (nv, iv, accv) =
        (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      def getter(src: String, t: DataType) =
        if (isFloat(t)) s"(double) $src.getFloat($iv)" else s"$src.getDouble($iv)"
      s"""
         |int $nv = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $accv = 0.0;
         |for (int $iv = 0; $iv < $nv; $iv++) {
         |  $accv += ${getter(a, left.dataType)} * ${getter(b, right.dataType)};
         |}
         |${ev.value} = $accv;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)
  override def prettyName: String = "dot_product"
}

/** Unicode NFC normalization of a string column — native Catalyst
  * expression with whole-stage codegen.
  *
  * Why it exists: web corpora mix precomposed and combining-sequence
  * encodings of the same text ("é" as U+00E9 vs "e"+U+0301), which
  * defeats exact dedup hashing, token counting and string equality —
  * canonicalizing to NFC is the standard first step of a text-cleanup
  * stage. Spark has no normalization builtin; a Scala UDF would box
  * every row out of the codegen stage. This expression emits one
  * `java.text.Normalizer` call (public JDK API, the reference Unicode
  * NFC implementation) inline in the generated code, with a cheap
  * `isNormalized` fast path so the overwhelmingly-ASCII common case
  * never allocates a new string. */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      NormalizeNfc.nfc(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sv = ctx.freshName("s")
      s"""
         |String $sv = $c.toString();
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NormalizeNfc.nfc($sv));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NormalizeNfc {
  /** NFC with an isNormalized fast path (ASCII and already-NFC strings
    * return the same instance — no allocation). */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
}

/** Character-distribution entropy in integer 1e-4-bit units — native
  * Catalyst expression with whole-stage codegen.
  *
  * Why a custom Expression: the column-function form (array_sort(split)
  * + an `aggregate` fold) is correct but interpreted — higher-order
  * functions don't participate in codegen, and the per-char lambda
  * machinery measured ~0.3 ms/doc at sf0.1 (1.7 s for the corpus scan).
  * This kernel is one pass over the string's code points into a sorted
  * count map plus one pass over the counts — same H = log2 n −
  * (Σ c·log2 c)/n identity, same sorted summation order, same `+ 1e-6`
  * floor nudge, so it is value-identical to the column form and to the
  * SQL oracle. */
case class CharEntropyE4(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_entropy_e4 requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    CharEntropyE4.compute(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyE4.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyE4 =
    copy(child = newChild)
  override def prettyName: String = "char_entropy_e4"
}

object CharEntropyE4 {
  private def log2(x: Double): Double = math.log(x) / math.log(2.0)

  /** One pass over code points → sorted counts → H in 1e-4-bit units. */
  def compute(s: String): Long = {
    if (s.isEmpty) return 0L
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > 1L) sum += c.toDouble * log2(c.toDouble)
    }
    val h = log2(n.toDouble) - sum / n.toDouble
    math.floor(h * 10000.0 + 1e-6).toLong
  }
}

/** All character k-gram hashes of a string in ONE pass — native
  * Catalyst expression with whole-stage codegen, returning
  * `array<long>` where element i is the hash of chars i..i+k-1.
  *
  * Why a custom Expression: the column form
  * (`explode(sequence) + xxhash64(substring(t, pos, k))`) re-slices and
  * re-hashes k chars at EVERY position — O(n·k) char touches plus a
  * string allocation per position. This kernel is the classic
  * polynomial rolling hash (O(1) per position after the first window:
  * h' = (h − c·B^(k−1))·B + c_new, 64-bit wraparound) with a splitmix
  * finalizer for bit mixing — the positional fingerprint scans
  * (winnowing, CDC boundary detection) are stride-1 over the whole
  * corpus, so this is their dominant cost. Hash VALUES are
  * engine-internal (nothing oracles them; the winnow/CDC contracts are
  * hash-agnostic), so the finalizer choice is free. */
case class KGramHash64(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"kgram_hashes: k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kgram_hashes requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      KGramHash64.compute(v.asInstanceOf[UTF8String].toString, k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.KGramHash64.compute($c.toString(), $k));")

  override protected def withNewChildInternal(newChild: Expression): KGramHash64 =
    copy(child = newChild)
  override def prettyName: String = "kgram_hashes"
}

object KGramHash64 {
  private final val B = 0x100000001b3L // FNV-1a prime as the poly base

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Rolling k-gram hashes over UTF-16 code units (one pass, O(n)).
    * Empty result for strings shorter than k. */
  def compute(s: String, k: Int): Array[Long] = {
    val n = s.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    var bk = 1L
    var j = 0
    while (j < k - 1) { bk *= B; j += 1 }
    val out = new Array[Long](n)
    var h = 0L
    j = 0
    while (j < k) { h = h * B + s.charAt(j); j += 1 }
    out(0) = mix(h)
    var i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * bk) * B + s.charAt(i + k - 1)
      out(i) = mix(h)
      i += 1
    }
    out
  }
}

/** Robust winnowing selection fused with the rolling hash — ONE pass,
  * O(n), zero shuffles: for each complete `w`-window over the k-gram
  * hashes, the minimum hash (rightmost on ties) is selected and recorded
  * once, exactly the MOSS scheme. Returns `array<struct<pos, fp>>`
  * (1-based gram positions).
  *
  * Why fused: the compositional form (explode the hash array → per-doc
  * sort window → min-struct → distinct) shuffles every position row and
  * sorts per document; the selection is a textbook monotonic-deque
  * sliding minimum the kernel computes in the same pass that rolls the
  * hashes — the fingerprint table then EXPLODES ONLY THE SELECTED ~2/(w+1)
  * density, and nothing position-shaped ever shuffles. The windowed
  * derivation remains in Dedup as the spec cross-check. */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 2, s"winnow_select: degenerate k=$k / w=$w")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"winnow_select requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    WinnowSelect.computeRows(v.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowSelect.computeRows(" +
        s"$c.toString(), $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
  override def prettyName: String = "winnow_select"
}

object WinnowSelect {
  /** Selected (pos, fp) pairs — sliding minimum by (hash asc, pos desc)
    * over every complete w-window of the rolling k-gram hashes, each
    * selection recorded once (selection windows per position are
    * contiguous, so consecutive-dedup == distinct). */
  def compute(s: String, k: Int, w: Int): Array[(Long, Long)] = {
    val hs = KGramHash64.compute(s, k)
    val n = hs.length
    if (n < w) return Array.empty
    // monotonic deque of indices: hashes strictly increasing front→back;
    // on equal hash the LATER index replaces (rightmost tie-break)
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var lastPos = -1
    var i = 0
    while (i < n) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      val p = i - w + 1 // window [p, i] complete when p >= 0
      if (p >= 0) {
        while (dq(head) < p) head += 1
        val sel = dq(head)
        if (sel != lastPos) {
          out += (((sel + 1).toLong, hs(sel)))
          lastPos = sel
        }
      }
      i += 1
    }
    out.toArray
  }

  /** The Catalyst-facing form: array of (pos, fp) InternalRows. */
  def computeRows(s: String, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val pairs = compute(s, k, w)
    val rows = new Array[Any](pairs.length)
    var i = 0
    while (i < pairs.length) {
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(
        pairs(i)._1, pairs(i)._2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** Content-defined chunking fused into the rolling-hash pass — ONE
  * O(n) kernel per document returning `array<struct<start, chunk_len,
  * chunk_md5>>` (1-based offsets). A boundary opens where the k-gram
  * hash ≡ 0 mod divisor; position 1 anchors the first chunk.
  *
  * Why fused (and why this replaced the compositional form): chunk
  * cutting needs the text and the boundary positions TOGETHER — the
  * compositional form exploded positions, filtered, ran a lead() window
  * and re-joined the text; worse, it mixed the kernel's UTF-16 code-unit
  * offsets with Spark `substring`/`length` CODE-POINT arithmetic, which
  * mis-cuts any document containing supplementary-plane characters
  * (emoji — routine in the web-crawl domain this serves). In-kernel
  * cutting uses one unit system throughout, never splits a surrogate
  * pair (boundaries on a low surrogate shift one unit right), and md5s
  * the chunk's UTF-8 bytes exactly like Spark's `md5(text cast binary)`.
  * Offsets in the output are UTF-16 code units — documented, and
  * consistent: start/chunk_len tile [1, units(text)] exactly. */
case class CdcChunkExpr(child: Expression, k: Int, divisor: Int)
    extends UnaryExpression {
  require(k >= 2 && divisor >= 2, s"cdc_chunks: degenerate k=$k / divisor=$divisor")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("start", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk_len", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    CdcChunkExpr.computeRows(v.asInstanceOf[UTF8String].toString, k, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunkExpr.computeRows(" +
        s"$c.toString(), $k, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunkExpr =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}

object CdcChunkExpr {
  /** (start, len) chunk extents in 1-based UTF-16 units; boundary
    * positions that would split a surrogate pair shift one unit right
    * (a boundary must start a code point or the chunk bytes are not a
    * valid encoding of anything). */
  def extents(s: String, k: Int, divisor: Int): Array[(Int, Int)] = {
    if (s.isEmpty) return Array((1, 0))
    val hs = KGramHash64.compute(s, k)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 1
    while (i < hs.length) {
      if (java.lang.Math.floorMod(hs(i), divisor.toLong) == 0L) {
        val p = if (Character.isLowSurrogate(s.charAt(i))) i + 1 else i
        if (p > starts.last && p < s.length) starts += p
      }
      i += 1
    }
    val out = new Array[(Int, Int)](starts.length)
    var j = 0
    while (j < starts.length) {
      val end = if (j + 1 < starts.length) starts(j + 1) else s.length
      out(j) = (starts(j) + 1, end - starts(j))
      j += 1
    }
    out
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def computeRows(s: String, k: Int, divisor: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ex = extents(s, k, divisor)
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = new Array[Any](ex.length)
    var j = 0
    while (j < ex.length) {
      val (start1, len) = ex(j)
      md.reset()
      val digest = md.digest(s.substring(start1 - 1, start1 - 1 + len)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexChars((digest(b) >>> 4) & 0xF)
        hex(2 * b + 1) = HexChars(digest(b) & 0xF)
        b += 1
      }
      rows(j) = org.apache.spark.sql.catalyst.InternalRow(
        start1.toLong, len.toLong, UTF8String.fromString(new String(hex)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** Morton (Z-order) interleave of two LONG columns — native Catalyst
  * expression with whole-stage codegen; the sort key behind
  * [[graft.pipeline.Layout.zorderWrite]]'s multi-dimensional clustering.
  *
  * Why a custom Expression: a 2-D box predicate over a single-column
  * sort prunes only that column's files; sorting by the bit-interleaved
  * key clusters rows so EVERY file's (min, max) footer range is tight
  * in BOTH dimensions — parquet row-group pruning then works for both
  * predicates at once (the OPTIMIZE ZORDER idea, computed here as one
  * codegen'd key, 10 shift-mask steps, no UDF in the layout scan).
  *
  * Inputs must be in [0, 2^31): curation-pipeline layout keys (ids,
  * lengths, day numbers, bucketed ranks) are non-negative by
  * construction, and an out-of-range value fails LOUDLY — silently
  * masking bits would interleave a different number than the caller
  * sorted by, which corrupts the layout invariant without any visible
  * error. Reference analogue: the buffer's (scn, index) two-level key
  * discipline (ScnIndex.java:94) — this is the lake-layout form.
  */
case class ZorderKey(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder_key requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def nullSafeEval(l: Any, r: Any): Any =
    ZorderKey.key(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = ZorderKey.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.key($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZorderKey = copy(left = newLeft, right = newRight)
  override def prettyName: String = "zorder_key"
}

object ZorderKey {
  /** Spread the low 31 bits of x to even bit positions (0,2,4,…,60). */
  @inline def spread(x: Long): Long = {
    var v = x
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** 62-bit Morton key: bit i of `a` → bit 2i, bit i of `b` → bit
    * 2i+1. Total order on keys = Z-curve order on (a, b). */
  def key(a: Long, b: Long): Long = {
    if (a < 0L || a > 0x7fffffffL || b < 0L || b > 0x7fffffffL)
      throw new IllegalArgumentException(
        s"zorder_key: inputs must be in [0, 2^31), got ($a, $b)")
    spread(a) | (spread(b) << 1)
  }
}

/** N-ary Morton key (3 or 4 dimensions) — the lake layouts a real
  * deployment z-orders are rarely two-column (source_id × partition ×
  * day, or id × length × day × domain-bucket). The 64-bit key budget
  * splits evenly: 21 bits per dimension for 3 (63-bit key), 15 bits
  * for 4 (60-bit key — 16 would put dim 3's top bit on the sign bit
  * and break the total order). Out-of-budget inputs fail LOUDLY, same
  * contract as [[ZorderKey]]: silently masking bits would interleave a
  * different number than the caller sorted by — a corrupted layout
  * with no visible error. Bit i of dimension d lands at bit i·n + d,
  * so key order = Z-curve order on the tuple; the spreads are the
  * standard Morton shift-mask cascades, verified bit-by-bit against a
  * loop reference in LayoutSpec. */
case class ZorderKeyN(children: Seq[Expression]) extends Expression {
  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size < 3 || children.size > 4)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_key_n supports 3 or 4 dimensions, got ${children.size}" +
          " (use zorder_key for 2)")
    else if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder_key_n requires BIGINT inputs, got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Long]
      i += 1
    }
    if (n == 3) ZorderKeyN.key3(vals(0), vals(1), vals(2))
    else ZorderKeyN.key4(vals(0), vals(1), vals(2), vals(3))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val cls = ZorderKeyN.getClass.getName.stripSuffix("$")
    val fn = s"key${children.size}"
    val args = evals.map(_.value).mkString(", ")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val nullCond =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ")
      else "false"
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $nullCond;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) { ${ev.value} = $cls.$fn($args); }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZorderKeyN =
    copy(children = newChildren)
  override def prettyName: String = "zorder_key_n"
}

object ZorderKeyN {
  /** Per-dimension bit budgets: 63/3 and 60/4 (bit 14·4+3 = 59 is the
    * highest 4-D bit — 16-bit inputs would reach the sign bit). */
  val MaxBits3 = 21
  val MaxBits4 = 15

  /** Spread the low 21 bits of x to every 3rd bit (0,3,…,60). */
  @inline def spread3(x: Long): Long = {
    var v = x
    v = (v | (v << 32)) & 0x1f00000000ffffL
    v = (v | (v << 16)) & 0x1f0000ff0000ffL
    v = (v | (v << 8)) & 0x100f00f00f00f00fL
    v = (v | (v << 4)) & 0x10c30c30c30c30c3L
    v = (v | (v << 2)) & 0x1249249249249249L
    v
  }

  /** Spread the low 15 bits of x to every 4th bit (0,4,…,56). */
  @inline def spread4(x: Long): Long = {
    var v = x
    v = (v | (v << 24)) & 0x000000ff000000ffL
    v = (v | (v << 12)) & 0x000f000f000f000fL
    v = (v | (v << 6)) & 0x0303030303030303L
    v = (v | (v << 3)) & 0x1111111111111111L
    v
  }

  def key3(a: Long, b: Long, c: Long): Long = {
    val max = (1L << MaxBits3) - 1L
    if (a < 0L || a > max || b < 0L || b > max || c < 0L || c > max)
      throw new IllegalArgumentException(
        s"zorder_key_n: 3-D inputs must be in [0, 2^$MaxBits3), " +
          s"got ($a, $b, $c)")
    spread3(a) | (spread3(b) << 1) | (spread3(c) << 2)
  }

  def key4(a: Long, b: Long, c: Long, d: Long): Long = {
    val max = (1L << MaxBits4) - 1L
    if (a < 0L || a > max || b < 0L || b > max ||
        c < 0L || c > max || d < 0L || d > max)
      throw new IllegalArgumentException(
        s"zorder_key_n: 4-D inputs must be in [0, 2^$MaxBits4), " +
          s"got ($a, $b, $c, $d)")
    spread4(a) | (spread4(b) << 1) | (spread4(c) << 2) | (spread4(d) << 3)
  }
}

/** The Gopher quality-rule battery as ONE native expression — the
  * whole per-doc signal set (token count, mean token length, duplicate
  * token fraction, top-bigram fraction, punctuation ratio, stopword
  * presence) computed in a single pass over the document and emitted as
  * the same `struct<len_ok, mean_len_ok, dup_ok, bigram_ok, punct_ok,
  * stop_ok, keep>` the declarative battery produces.
  *
  * Why a custom Expression: the declarative battery
  * ([[graft.functions.TextFunctions.gopherRulesDeclarative]]) is built
  * from higher-order array functions (`aggregate`, `zip_with`,
  * `array_sort` folds) which skip whole-stage codegen and run as
  * interpreted lambda trees — and the struct's six signals each
  * re-derive the token array, so a corpus scan pays several interpreted
  * split+fold passes per document. The quality battery is a headline
  * per-row scan of the 100 TB documents table (it gates every
  * downstream curation stage), so it gets the [[CharEntropyE4]]
  * treatment: one static-method kernel, one tokenize, one hash pass.
  *
  * Exact-parity contract with the declarative form (spec-pinned in
  * CorpusOpsSpec, and transitively with the DuckDB oracle that
  * re-derives every verdict bit): tokenization is Spark's
  * `split(text, WsPlus)` with the default limit -1 — leading AND
  * trailing separator runs contribute EMPTY tokens and the empty string
  * tokenizes to [""]; lengths count Unicode code points (Spark
  * `length`); the top-bigram mode count follows the sorted-run identity
  * on exactly n−1 bigrams; the punct ratio on an empty document is
  * 0/0 — there the kernel keeps IEEE semantics (NaN, which fails
  * `<= maxPunct`), matching the DuckDB oracle's float division, where
  * the declarative battery under the session's default ANSI mode
  * raises DIVIDE_BY_ZERO instead (GopherRulesSpec pins the divergence:
  * the kernel's verdict is the oracle's, and the 100 TB scan survives
  * degenerate rows); stopword occurrences are non-overlapping left-to-right
  * matches of " w " against the space-padded document (the `split`
  * counting identity); and a NULL document yields a struct of NULL
  * fields (not a NULL struct), `keep` included — three-valued logic
  * never sees a FALSE to collapse to. */
/** Element-wise sum of a float-array column as ONE imperative
  * aggregate — Lloyd's per-cell statistics kernel.
  *
  * Why a custom aggregate: the declarative form — `dim` separate
  * `sum(vec[i])` aggregate expressions — is executed fine, but its
  * PLANNING is not: every Lloyd's iteration builds a fresh query (the
  * codebook literal changed), and Catalyst analysis + optimization of a
  * 66-expression aggregate costs ~1 s — a scale-INDEPENDENT
  * per-iteration floor that dominated training at small corpora (every
  * hierarchical sub-training, every sf1-sized leg) once the assignment
  * argmin became [[NearestCell]]. This aggregate is one expression with
  * a `double[dim]` buffer: one hash probe + one tight element loop per
  * row.
  *
  * Parity contract with the `sum(vec[i] cast double)` battery
  * (NearestCellSpec): per-element accumulation in row order within each
  * partition, partial merge per element, rows with a NULL array
  * contribute nothing, arrays shorter than `dim` contribute their
  * prefix (the `try_element_at` null-skipping semantics — plain
  * getItem would THROW under the session's default ANSI mode), and
  * positions past `dim` are ignored. An all-missing position sums to
  * 0.0 where declarative sum() yields NULL — the kernel's buffer
  * never leaves the reals. Returns `array<double>` of length `dim`. */
case class VecSumAgg(child: Expression, dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(dim > 0, s"vec_sum: dim $dim")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum requires ARRAY<FLOAT>, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](dim)

  override def update(buffer: Array[Double],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val lim = math.min(a.numElements(), dim)
      var i = 0
      while (i < lim) {
        if (!a.isNullAt(i)) buffer(i) += a.getFloat(i).toDouble
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double],
      input: Array[Double]): Array[Double] = {
    var i = 0
    while (i < dim) { buffer(i) += input(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buffer.map(d => d: Any))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * dim)
    var i = 0
    while (i < dim) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
  override def prettyName: String = "vec_sum"
}

case class GopherRules(child: Expression, minTokens: Long, maxTokens: Long,
    minMeanLen: Double, maxMeanLen: Double, maxDupFrac: Double,
    maxTopBigram: Double, maxPunct: Double, stopwords: Seq[String])
  extends UnaryExpression {
  import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

  private val fieldNames = Seq("len_ok", "mean_len_ok", "dup_ok",
    "bigram_ok", "punct_ok", "stop_ok", "keep")
  override def dataType: DataType =
    StructType(fieldNames.map(StructField(_, BooleanType, nullable = true)))
  override def nullable: Boolean = false
  // null text → struct of null fields, so the struct itself always exists
  override def nullIntolerant: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gopher_rules requires STRING, got ${child.dataType.catalogString}")

  private def conf: GopherRules.Conf = GopherRules.Conf(minTokens, maxTokens,
    minMeanLen, maxMeanLen, maxDupFrac, maxTopBigram, maxPunct,
    stopwords.toArray)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GopherRules.NullRow
    else GopherRules.compute(v.asInstanceOf[UTF8String].toString, conf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val confRef = ctx.addReferenceObj("gopherConf", conf,
      "graft.functions.GopherRules.Conf")
    val c = child.genCode(ctx)
    val out =
      code"""
        ${c.code}
        InternalRow ${ev.value} = ${c.isNull}
          ? graft.functions.GopherRules.NullRow()
          : graft.functions.GopherRules.compute(${c.value}.toString(), $confRef);
      """
    ev.copy(code = out, isNull =
      org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): GopherRules =
    copy(child = newChild)
  override def prettyName: String = "gopher_rules"
}

object GopherRules {
  /** Plan-constant rule thresholds + stopword list (one reference object
    * in generated code instead of nine scalar constants). */
  case class Conf(minTokens: Long, maxTokens: Long, minMeanLen: Double,
      maxMeanLen: Double, maxDupFrac: Double, maxTopBigram: Double,
      maxPunct: Double, stopwords: Array[String])

  private val nullRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](null, null, null, null, null, null, null))
  /** Capitalized accessor for Scala, parenthesized form for codegen. */
  def NullRow(): org.apache.spark.sql.catalyst.expressions.GenericInternalRow =
    nullRow

  private def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r'

  private def isPunct(ch: Char): Boolean = ch match {
    case '.' | ',' | ';' | ':' | '!' | '?' | '\'' | '"' | '(' | ')' |
         '[' | ']' | '{' | '}' | '-' => true
    case _ => false
  }

  /** Non-overlapping left-to-right occurrence count (the `split`
    * counting identity len(split(s, needle, -1)) − 1). */
  private def countOcc(s: String, needle: String): Long = {
    var n = 0L
    var from = 0
    var idx = s.indexOf(needle, from)
    while (idx >= 0) {
      n += 1
      from = idx + needle.length
      idx = s.indexOf(needle, from)
    }
    n
  }

  /** One pass over the document → the seven rule booleans. */
  def compute(s: String,
      conf: Conf): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    // tokenize = split(text, "[ \t\n\f\r]+") with limit -1: a leading
    // separator run yields an empty first token, a trailing run an empty
    // last token, and "" yields [""]
    val toks = new java.util.ArrayList[String]()
    var wsCp = 0L      // whitespace code points (all BMP singles)
    var punctCp = 0L
    var sumTokCp = 0L  // code points across tokens
    var i = 0
    var tokStart = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (isWs(ch)) {
        toks.add(s.substring(tokStart, i))
        // consume the whole separator run
        while (i < s.length && isWs(s.charAt(i))) { wsCp += 1; i += 1 }
        tokStart = i
      } else {
        if (isPunct(ch)) punctCp += 1
        i += 1
        if (Character.isHighSurrogate(ch) && i < s.length &&
          Character.isLowSurrogate(s.charAt(i))) i += 1
        sumTokCp += 1
      }
    }
    toks.add(s.substring(tokStart, s.length))
    val totalCp = sumTokCp + wsCp

    val n = toks.size.toLong
    val lenOk = n >= conf.minTokens && n <= conf.maxTokens
    val mean = sumTokCp.toDouble / n.toDouble
    val meanOk = mean >= conf.minMeanLen && mean <= conf.maxMeanLen

    val distinct = new java.util.HashSet[String](toks)
    val dupFrac = (n - distinct.size).toDouble / n.toDouble
    val dupOk = dupFrac <= conf.maxDupFrac

    val bigramOk: Boolean = if (n < 2) {
      0.0 <= conf.maxTopBigram
    } else {
      val counts = new java.util.HashMap[String, Integer]()
      var maxC = 0
      var b = 0
      while (b < toks.size - 1) {
        val bg = toks.get(b) + " " + toks.get(b + 1)
        val c = counts.merge(bg, Integer.valueOf(1), (x, y) =>
          Integer.valueOf(x.intValue() + y.intValue()))
        if (c.intValue() > maxC) maxC = c.intValue()
        b += 1
      }
      maxC.toDouble / (n - 1).toDouble <= conf.maxTopBigram
    }

    // 0/0 = NaN on an empty document; NaN <= maxPunct is false in both
    // Java and Spark comparison semantics
    val punctOk = punctCp.toDouble / totalCp.toDouble <= conf.maxPunct

    val padded = " " + s + " "
    var hits = 0L
    var w = 0
    while (w < conf.stopwords.length) {
      hits += countOcc(padded, " " + conf.stopwords(w) + " ")
      w += 1
    }
    val stopOk = hits >= 1L

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](lenOk, meanOk, dupOk, bigramOk, punctOk, stopOk,
        lenOk && meanOk && dupOk && bigramOk && punctOk && stopOk))
  }
}

/** Column + SQL surfaces for the engine's native expressions. */
object GraftFunctions {
  def fnv_hash64(c: Column): Column =
    ColumnBridge.column(FnvHash64(ColumnBridge.expression(c)))

  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NormalizeNfc(ColumnBridge.expression(c)))

  def char_entropy_e4(c: Column): Column =
    ColumnBridge.column(CharEntropyE4(ColumnBridge.expression(c)))
  /** [[VecSumAgg]] — element-wise float-array sum as one aggregate
    * expression (Lloyd's statistics kernel). */
  def vec_sum(vec: Column, dim: Int): Column =
    ColumnBridge.column(VecSumAgg(ColumnBridge.expression(vec), dim)
      .toAggregateExpression())

  /** [[GopherRules]] — the fused quality-rule battery. Thresholds ride
    * the expression as plan constants (not columns), mirroring the
    * declarative battery's signature. */
  def gopher_rules(text: Column, minTokens: Long, maxTokens: Long,
      minMeanLen: Double, maxMeanLen: Double, maxDupFrac: Double,
      maxTopBigram: Double, maxPunct: Double,
      stopwords: Seq[String]): Column =
    ColumnBridge.column(GopherRules(ColumnBridge.expression(text),
      minTokens, maxTokens, minMeanLen, maxMeanLen, maxDupFrac,
      maxTopBigram, maxPunct, stopwords))


  def kgram_hashes(c: Column, k: Int): Column =
    ColumnBridge.column(KGramHash64(ColumnBridge.expression(c), k))

  def winnow_select(c: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(c), k, w))

  def cdc_chunks(c: Column, k: Int, divisor: Int): Column =
    ColumnBridge.column(CdcChunkExpr(ColumnBridge.expression(c), k, divisor))

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2sq(a: Column, b: Column): Column =
    ColumnBridge.column(
      L2SqDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** [[NearestCell]] over a flattened codebook (row-major k×dim). Not
    * SQL-registered — the codebook is a driver-held constant, not a
    * column. */
  def nearest_cell(vec: Column, ids: Array[Long], flat: Array[Float],
      dim: Int): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec), ids,
      flat, dim))

  /** [[TopCells]] over a flattened codebook — same constant-codebook
    * contract as [[nearest_cell]]. */
  def top_cells(vec: Column, ids: Array[Long], flat: Array[Float],
      dim: Int, nProbe: Int): Column =
    ColumnBridge.column(TopCells(ColumnBridge.expression(vec), ids,
      flat, dim, nProbe))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def zorder_key(a: Column, b: Column): Column =
    ColumnBridge.column(
      ZorderKey(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def zorder_key_n(cols: Column*): Column =
    ColumnBridge.column(ZorderKeyN(cols.map(ColumnBridge.expression)))

  /** Register SQL functions on an existing session
    * (`SELECT fnv_hash64(col) ...`, `SELECT cosine_sim(a, b) ...`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", exprs => FnvHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NormalizeNfc(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy_e4", exprs => CharEntropyE4(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2sq", exprs => L2SqDistance(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key", exprs => ZorderKey(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder_key_n", exprs => ZorderKeyN(exprs), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kgram_hashes", buildKgram, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_select", buildWinnow, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cdc_chunks", buildCdc, "built-in")
  }

  /** Foldable-integer argument of a SQL-registered kernel (the k/w/
    * divisor parameters are compile-time shape constants, not data).
    * Strictly integral: a fractional or out-of-int-range literal fails
    * loudly instead of silently truncating to a different kernel shape
    * than the query wrote. */
  private[functions] def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval() match {
      case i: java.lang.Integer => i.intValue
      case s: java.lang.Short => s.intValue
      case b: java.lang.Byte => b.intValue
      case l: java.lang.Long =>
        require(l.longValue == l.intValue.toLong,
          s"$what out of int range: $l")
        l.intValue
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
  }

  /** Registry builders shared by register() and GraftExtensions — one
    * place for arity checks and literal extraction. */
  private[functions] def buildKgram(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"kgram_hashes expects 2 arguments (text, k), got ${exprs.length}")
    KGramHash64(exprs(0), litInt(exprs(1), "kgram_hashes.k"))
  }
  private[functions] def buildWinnow(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"winnow_select expects 3 arguments (text, k, w), got ${exprs.length}")
    WinnowSelect(exprs(0), litInt(exprs(1), "winnow_select.k"),
      litInt(exprs(2), "winnow_select.w"))
  }
  private[functions] def buildCdc(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"cdc_chunks expects 3 arguments (text, k, divisor), got ${exprs.length}")
    CdcChunkExpr(exprs(0), litInt(exprs(1), "cdc_chunks.k"),
      litInt(exprs(2), "cdc_chunks.divisor"))
  }
}

/** SparkSessionExtensions entry point — install via
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("fnv_hash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FnvHash64].getName, "fnv_hash64"),
      (exprs: Seq[Expression]) => FnvHash64(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NormalizeNfc].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NormalizeNfc(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("l2sq"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[L2SqDistance].getName, "l2sq"),
      (exprs: Seq[Expression]) => L2SqDistance(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("char_entropy_e4"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CharEntropyE4].getName, "char_entropy_e4"),
      (exprs: Seq[Expression]) => CharEntropyE4(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("kgram_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[KGramHash64].getName, "kgram_hashes"),
      (exprs: Seq[Expression]) => GraftFunctions.buildKgram(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_select"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowSelect].getName, "winnow_select"),
      (exprs: Seq[Expression]) => GraftFunctions.buildWinnow(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_chunks"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CdcChunkExpr].getName, "cdc_chunks"),
      (exprs: Seq[Expression]) => GraftFunctions.buildCdc(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("zorder_key"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ZorderKey].getName, "zorder_key"),
      (exprs: Seq[Expression]) => ZorderKey(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("zorder_key_n"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ZorderKeyN].getName, "zorder_key_n"),
      (exprs: Seq[Expression]) => ZorderKeyN(exprs)))
    e.injectOptimizerRule(_ => graft.plans.ImpliedScnBandPushdown)
  }
}
