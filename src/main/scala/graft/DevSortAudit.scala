package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning

/** Dev-only: static audit — which queries end in a range (orderBy)
  * exchange whose child contains a FileScan with NO intervening
  * exchange? Those re-execute the whole scan chain in the range
  * partitioner's sampling job. Delete freely. */
object DevSortAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def hasScanNoExchange(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeExec => false
      case f: FileSourceScanExec => true
      case other => other.children.exists(hasScanNoExchange)
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("streaming_") && !name.startsWith("sink_")
          && !name.startsWith("pipeline_")) {
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          val rangeEx = plan.collect {
            case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
          }
          val flagged = rangeEx.filter(e => hasScanNoExchange(e.child))
          if (flagged.nonEmpty)
            println(s"[audit] FLAG $name (${flagged.size} range exchange(s) over scan-chains)")
        } catch {
          case e: Throwable => println(s"[audit] ERR $name: ${e.getMessage.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
