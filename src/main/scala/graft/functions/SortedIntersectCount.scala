package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd |A ∩ B| for two ASCENDING-SORTED, duplicate-free
  * `array<bigint>` columns — a two-pointer merge scan.
  *
  * Why a custom Catalyst expression (SURVEY.md §4.2 escape hatch, same
  * rationale as [[L2SquaredDistance]]): the PPJoin verify stage computes
  * the exact shingle-set intersection size for every candidate pair via
  * `size(array_intersect(hs_a, hs_b))`. Spark's `ArrayIntersect` is
  * general-purpose: per ROW it builds a hash set over one side with boxed
  * elements, probes with dedup bookkeeping, and MATERIALIZES the
  * intersection array that `size` then throws away — measured 144 µs per
  * ~50-element pair at the sf1 probe, 180 of ppjoin's 388 task-CPU-s.
  * The pair arrays are per-doc shingle SETS that the build already sorts
  * once (8-byte longs, ascending), so the intersection size is a single
  * allocation-free merge scan: O(|A|+|B|) long comparisons, no boxing,
  * no hash set, no output array, inside whole-stage codegen.
  *
  * CONTRACT: both inputs sorted ascending with no duplicates (Spark's
  * `sort_array` over a set column yields exactly this). On unsorted
  * input the count is simply wrong — this is a private building block
  * for operators that own their sort order, not a general function.
  * Null input → null, mirroring `array_intersect`'s null semantics. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val ok = isLongArray(left.dataType) && isLongArray(right.dataType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_icount_sorted expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_icount_sorted"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Register `graft_icount_sorted(a, b)` in the session's function
    * registry so it is usable from `expr(...)` strings. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_icount_sorted")))
      reg.createOrReplaceTempFunction(
        "graft_icount_sorted",
        exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
  }
}
