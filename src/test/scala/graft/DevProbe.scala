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
    def q21Sql = graft.Sql.sqlWaitingSuppliers(spark, sfDir)
    def q21Rewrite = {
      graft.Sql.register(spark, sfDir)
      val o = spark.table("orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderdate"))
      val l = spark.table("lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val L = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          expr("l_shipdate > o_orderdate + INTERVAL '60' DAY"))
      val w = Window.partitionBy(col("l_orderkey"))
      val flagged = L
        .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("n_late", size(collect_set(
          when(col("late"), col("l_suppkey"))).over(w)))
      val sn = spark.table("supplier").join(spark.table("nation"),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
        .select(col("s_suppkey"), col("s_name"))
      flagged.filter(col("late") && col("o_orderstatus") === "F" &&
          col("n_supp") >= 2 && col("n_late") === 1)
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }
    for (i <- 1 to 3) time(s"q21 SQL $i")(noop(q21Sql))
    for (i <- 1 to 3) time(s"q21 REWRITE $i")(noop(q21Rewrite))
    val qa = q21Sql.collect(); val qb = q21Rewrite.collect()
    println(s"PROBE q21 parity rows=${qa.length}/${qb.length} equal=${qa.sameElements(qb)}")

    spark.stop()
  }
}
