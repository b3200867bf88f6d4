package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |String s$$ = $c.toString();
         |long h$$ = 0xcbf29ce484222325L;
         |for (int i$$ = 0; i$$ < s$$.length(); i$$++) {
         |  h$$ ^= s$$.charAt(i$$);
         |  h$$ *= 0x100000001b3L;
         |}
         |${ev.value} = h$$;
       """.stripMargin)

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

/** Column + SQL surfaces for the engine's native expressions. */
object GraftFunctions {
  def fnv_hash64(c: Column): Column =
    ColumnBridge.column(FnvHash64(ColumnBridge.expression(c)))

  /** Register SQL functions on an existing session
    * (`SELECT fnv_hash64(col) ...`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", exprs => FnvHash64(exprs.head), "built-in")
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
  }
}
