package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared session per JVM. Master `local[8, 4]` = 8 task slots AND 4
  * task-failure retries — the retry budget is what lets the
  * fault-injection suites mirror the reference's fixed-delay restart
  * strategy (`/root/reference/src/main/ru/hse/flinkanomaly/Main.java:29-30`)
  * for batch jobs. Slots were 4 through r13; 8 overlaps the parallel
  * query gate's six concurrent sessions without starving them (r14
  * measured the change as suite 531 → 419 s; later same-HEAD runs on a
  * quieter host landed at 279–359 s — the win is the overlap, the exact
  * wall number is host noise), while shuffle.partitions stays 4 so
  * every partition-count-sensitive assertion sees the same layouts as
  * before. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[8, 4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
