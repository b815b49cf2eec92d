package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a `bigint` key column.
  *
  * Why a custom Catalyst expression (SURVEY.md §4.2 escape hatch): Spark
  * builds `org.apache.spark.util.sketch.BloomFilter`s natively
  * (`df.stat.bloomFilter`, and the same machinery backs AQE runtime
  * filters), but exposes no public expression to PROBE one from a query —
  * the documented route is a Scala UDF, which falls off the codegen path.
  * This expression carries the serialized filter in the plan, lazily
  * deserializes it once per JVM (`@transient lazy`), and emits a direct
  * `mightContainLong` call inside whole-stage codegen — the probe costs
  * two hashes and a couple of bit tests per row, no boxing.
  *
  * Scale story: the filter is bounded by the INSERTED set (here the
  * benchmark shingle keys), not the corpus, so shipping it as a plan
  * reference object is the same contract as a broadcast dim — and the
  * probing side becomes a map-only pass with zero shuffle, which is
  * exactly what a 100 TB decontamination sweep needs.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom expects bigint, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom"

  /** Called from both interpreted eval and the generated code. */
  def contains(v: Long): Boolean = filter.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = contains(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the expression itself is the reference object (serializable via
    // filterBytes); the generated row loop calls straight into contains()
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Build a Bloom filter over the single `bigint` column of `keys` and
    * register a session function `<name>(key)` probing it. Re-registering
    * the same name replaces the previous filter (per-dir filters use
    * distinct names). Returns the serialized size in bytes. */
  def buildAndRegister(
      spark: SparkSession,
      name: String,
      keys: org.apache.spark.sql.DataFrame,
      expectedItems: Long,
      fpp: Double): Long = {
    val bf = keys.stat.bloomFilter(keys.columns.head, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomMightContain(exprs.head, bytes), "scala_udf")
    bytes.length.toLong
  }
}
