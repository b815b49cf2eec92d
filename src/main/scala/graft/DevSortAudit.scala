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
    // post-shuffle heavy segment: a Window / Sort / merge join above the
    // nearest exchange — the sampler re-runs that segment too, but it
    // re-reads materialized shuffle files rather than re-scanning, and
    // the measured barrier verdict for this whole class was REJECT
    // (see Presentation's scaladoc); the flag is kept as an inventory
    def heavySegment(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeExec => false
      case w: org.apache.spark.sql.execution.window.WindowExec => true
      case s: SortExec => true
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case other => other.children.exists(heavySegment)
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("streaming_") && !name.startsWith("sink_")
          && !name.startsWith("pipeline_")) {
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          val rangeEx = plan.collect {
            case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
          }
          val scanFlag = rangeEx.filter(e => hasScanNoExchange(e.child))
          val winFlag = rangeEx.filter(e => !hasScanNoExchange(e.child) && heavySegment(e.child))
          if (scanFlag.nonEmpty)
            println(s"[audit] FLAG-SCAN $name (${scanFlag.size} range exchange(s) over scan-chains)")
          if (winFlag.nonEmpty)
            println(s"[audit] FLAG-SEGMENT $name (${winFlag.size} range exchange(s) over post-shuffle window/sort segments)")
        } catch {
          case e: Throwable => println(s"[audit] ERR $name: ${e.getMessage.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
