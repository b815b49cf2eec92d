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
    import graft.operators.{GraphOps, SimilarityOps}

    // warm the memoized stages so only the enumeration shapes differ
    val und = GraphOps.knnUndirected(spark, sfDir)
    val oriented = GraphOps.knnOriented(spark, sfDir)
    time("warm knn stages") { noop(und); noop(oriented) }
    val nodes = SimilarityOps.quantized(spark, sfDir).select(col("vec_id"))

    // current form (three-way union of tri, two-way union for deg)
    def triCurrent = GraphOps.triangleStats(nodes, und, oriented)

    // explode variant: tri executes once; deg built from one exploded pass
    def triExplode = {
      val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      val wedges = oriented
        .select(col("src"), col("dst").as("d1"), col("ddeg").as("g1"))
        .join(oriented.select(col("src"), col("dst").as("d2"),
          col("ddeg").as("g2")), "src")
        .filter(col("g1") < col("g2") ||
          (col("g1") === col("g2") && col("d1") < col("d2")))
      val tri = wedges
        .join(und,
          und("a") === least(col("d1"), col("d2")) &&
            und("b") === greatest(col("d1"), col("d2")))
        .select(col("src").as("ta"), col("d1").as("tb"), col("d2").as("tc"))
      val tcount = tri
        .select(explode(array(col("ta"), col("tb"), col("tc"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("triangles"))
      nodes
        .join(deg, col("vec_id") === deg("v"), "left").drop(deg("v"))
        .join(tcount, col("vec_id") === tcount("v"), "left").drop(tcount("v"))
        .select(col("vec_id"),
          coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .withColumn("clustering",
          when(col("degree") >= 2,
            round(lit(2.0) * col("triangles") /
              (col("degree") * (col("degree") - lit(1.0))), 6))
            .otherwise(lit(0.0)))
        .orderBy(col("vec_id"))
    }

    for (i <- 1 to 3) time(s"triangle CURRENT $i")(noop(triCurrent))
    for (i <- 1 to 3) time(s"triangle EXPLODE $i")(noop(triExplode))

    // parity: identical rows in identical order
    val a = triCurrent.collect()
    val b = triExplode.collect()
    println(s"PROBE tri parity rows=${a.length} equal=${a.sameElements(b)}")

    // pagerank: current vs persisted edges⋈outdeg
    def prCurrent = GraphOps.graphPagerankKnn(spark, sfDir)
    for (i <- 1 to 3) time(s"pagerank CURRENT $i")(noop(prCurrent))

    spark.stop()
  }
}
