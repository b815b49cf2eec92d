package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only scratch: time named variants to isolate a perf anomaly.
  * Not part of the driver contract. Current probe (r17): the graph
  * family — A/B the triangle enumeration's three-way `union` of `tri`
  * projections (which repeats the wedge-join subtree per branch unless
  * runtime exchange reuse fires) against a single-execution
  * `explode(array(ta,tb,tc))` restatement, and PageRank's per-iteration
  * `edges ⋈ outdeg` recomputation against a within-query persist. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata_sf3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cpuNs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Any): Unit = {
      Thread.sleep(300) // let listener drain
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBE $name wall=$wall%.2f s cpu=${(cpuNs.get() - c0) / 1e9}%.2f s")
    }

    import org.apache.spark.sql.functions._



    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    def prPlain = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        percent_rank().over(wp).as("pr"), cume_dist().over(wp).as("cd"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
    def prSharded = graft.operators.Extended.windowPercentRankSharded(spark, sfDir, 65536L)
    val wc = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    def cdPlain = Tables.customer(spark, sfDir)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("bal_cume", cume_dist().over(wc))
      .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
    def cdSharded = graft.operators.Extended.windowCumeDistSharded(spark, sfDir, 65536L)
    for (i <- 1 to 3) time(s"pr PLAIN $i")(noop(prPlain))
    for (i <- 1 to 3) time(s"pr SHARDED $i")(noop(prSharded))
    for (i <- 1 to 3) time(s"cd PLAIN $i")(noop(cdPlain))
    for (i <- 1 to 3) time(s"cd SHARDED $i")(noop(cdSharded))

    spark.stop()
  }
}
