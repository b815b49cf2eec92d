package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 surface
  * (`df.write.format("graftsink")`): a metrics sink that aggregates
  * per-task row counts and a key checksum through the V2 COMMIT
  * PROTOCOL — the part of a real connector (JDBC writer, object-store
  * committer, index builder) that makes distributed writes exactly-once:
  *
  *  - each task's [[DataWriter]] accumulates privately and emits a
  *    [[WriterCommitMessage]] from `commit()` — nothing is globally
  *    visible until the DRIVER's [[BatchWrite.commit]] folds the
  *    messages of exactly the committed task attempts (a failed/retried
  *    attempt's partial state is dropped via `abort()`, never summed),
  *  - the first long column feeds the checksum, so a lost or duplicated
  *    task attempt shifts the total and the tests would catch it.
  *
  * At 100 TB this is the pattern that replaces "write then recount":
  * write-side metrics ride the commit messages for free. */
class CountSink extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftsink"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CountSinkTable(schema)
}

/** Driver-side registry of committed write totals, keyed by the sink's
  * `run` option (JVM-static — this is a single-JVM observation point for
  * tests/queries; the totals themselves travel in commit messages). */
object CountSinkRegistry {
  final case class Totals(rows: Long, checksum: Long, commits: Int)
  private val byRun = new ConcurrentHashMap[String, Totals]()
  def put(run: String, t: Totals): Unit = byRun.put(run, t)
  def get(run: String): Option[Totals] = Option(byRun.get(run))
  def clear(run: String): Unit = byRun.remove(run)
}

final class CountSinkTable(schema0: StructType) extends Table with SupportsWrite {
  override def name(): String = "graftsink"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CountBatchWrite(info.options.getOrDefault("run", info.queryId))
      }
    }
}

final case class CountCommit(rows: Long, checksum: Long) extends WriterCommitMessage

final class CountBatchWrite(run: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new CountWriterFactory
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var sum = 0L
    messages.foreach { case CountCommit(r, c) => rows += r; sum += c }
    CountSinkRegistry.put(run, CountSinkRegistry.Totals(rows, sum, messages.length))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    CountSinkRegistry.clear(run)
}

final class CountWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        if (record.numFields > 0 && !record.isNullAt(0)) sum += record.getLong(0)
      }
      override def commit(): WriterCommitMessage = CountCommit(rows, sum)
      override def abort(): Unit = ()   // partial counts die with the task
      override def close(): Unit = ()
    }
}

object CountSinkOps {

  /** Write every order key through the V2 sink and surface the totals
    * the COMMIT PROTOCOL assembled — the oracle recomputes them from the
    * table, so the equality proves no task attempt was lost or
    * double-counted on the way to the driver. */
  def sinkDsv2Metrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val run = "sink_dsv2_metrics_" + java.util.UUID.randomUUID().toString
    graft.Tables.orders(spark, dir).select($"o_orderkey")
      .write.format("graftsink").option("run", run).mode("append").save()
    val t = CountSinkRegistry.get(run).getOrElse(
      throw new IllegalStateException("graftsink commit never reached the driver"))
    CountSinkRegistry.clear(run)
    Seq((t.rows, t.checksum)).toDF("n_rows", "key_checksum")
  }

  val sinkDsv2MetricsSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
      |FROM orders""".stripMargin
}
