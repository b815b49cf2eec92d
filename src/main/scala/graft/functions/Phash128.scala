package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 128-bit perceptual-hash stand-in over a string payload:
  * `graft_phash128(payload)` returns `array<bigint>` of four 32-bit
  * quarters (q0..q3), bit-for-bit identical to the built-in tower
  *
  * {{{
  * codes = transform(sequence(0,127),
  *           i -> ascii(substring(payload, 1 + (i*(length-1)) div 127, 1)))
  * bits  = transform(codes, c -> if(128*c > aggregate(codes,0L,+), 1L, 0L))
  * q_k   = aggregate(zip_with(slice(bits, 1+32k, 32), sequence(0,31),
  *           (b,i) -> b * shiftleft(1L, i)), 0L, +)
  * }}}
  *
  * Why a custom Catalyst expression (SURVEY.md §4.2 escape hatch, the
  * same jump [[FixedPointDotProduct]] made for the cosine path): the
  * tower above runs on the interpreted higher-order-function path —
  * 128 `substring`+`ascii` evaluations plus four 32-element fold
  * closures per row, ~1 ms/doc, measured as the sf1 scale probe's #1
  * line (53.6 s; the candidate join it feeds is milliseconds). This
  * expression walks the payload's UTF-8 bytes ONCE (the 128 sample
  * positions are monotone, so the codepoint walk never restarts),
  * thresholds against the exact integer sample sum, and packs the four
  * quarters in a tight primitive loop — no per-element closures, no
  * array materialization, still inside whole-stage codegen.
  *
  * Exact replication notes: Spark's `length` counts codepoints,
  * `substring` slices by codepoint, and `ascii` returns the CODEPOINT
  * of its argument's first character — so the sample value here is the
  * decoded codepoint at the sampled position, matching the built-in
  * tower on every input (FunctionsSpec pins kernel == tower on ASCII,
  * 2-byte, and 3-byte UTF-8). Empty payloads yield all-zero quarters
  * on both paths (`ascii('') = 0`, `128·0 > 0` false).
  */
case class Phash128(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_phash128 expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_phash128"

  override def nullSafeEval(payload: Any): Any =
    Phash128.compute(payload.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Phash128.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Phash128 =
    copy(child = newChild)
}

object Phash128 {
  /** One-pass hash kernel — static so generated code calls it directly. */
  def compute(payload: UTF8String): ArrayData = {
    val bytes = payload.getBytes
    val nChars = payload.numChars()
    val codes = new Array[Int](128)
    var sum = 0L
    if (nChars > 0) {
      val span = (nChars - 1).toLong
      var cp = 0 // codepoint index of byte offset `off`
      var off = 0
      var i = 0
      while (i < 128) {
        val p = ((i * span) / 127).toInt
        while (cp < p) {
          off += UTF8String.numBytesForFirstByte(bytes(off))
          cp += 1
        }
        // Spark's ascii() yields the CODEPOINT of the first character
        // (FunctionsSpec pins kernel == tower on multibyte inputs)
        val c = CharCounts.codePointAt(bytes, off,
          UTF8String.numBytesForFirstByte(bytes(off)))
        codes(i) = c
        sum += c
        i += 1
      }
    }
    val qs = new Array[Long](4)
    var i = 0
    while (i < 128) {
      if (128L * codes(i) > sum) qs(i >>> 5) |= 1L << (i & 31)
      i += 1
    }
    new GenericArrayData(qs)
  }

  /** Register `graft_phash128(payload)` in the session's function
    * registry so it is usable from `expr(...)` strings. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_phash128")))
      reg.createOrReplaceTempFunction(
        "graft_phash128", exprs => Phash128(exprs(0)), "scala_udf")
  }
}
