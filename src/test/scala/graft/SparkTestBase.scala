package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** One shared session per JVM. Master `local[4, 4]` = 4 threads AND 4
  * task-failure retries — the retry budget is what lets the
  * fault-injection suites mirror the reference's fixed-delay restart
  * strategy (`/root/reference/src/main/ru/hse/flinkanomaly/Main.java:29-30`)
  * for batch jobs. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4, 4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
