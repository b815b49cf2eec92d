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
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    def ntilePlain = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_orders"), min(col("o_orderkey")).as("first_orderkey"))
      .orderBy(col("o_orderpriority"), col("quartile"))
    def ntileSharded = graft.operators.Extended.windowNtileSharded(spark, sfDir, 65536L)
    for (i <- 1 to 3) time(s"ntile PLAIN $i")(noop(ntilePlain))
    for (i <- 1 to 3) time(s"ntile SHARDED $i")(noop(ntileSharded))
    val pa = ntilePlain.collect(); val pb = ntileSharded.collect()
    println(s"PROBE ntile parity rows=${pa.length} equal=${pa.sameElements(pb)}")

    spark.stop()
  }
}
