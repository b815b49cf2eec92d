package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only scratch: time named variants to isolate a perf anomaly.
  * Not part of the driver contract. Current probe (r17): decompose the
  * consumers of the new token_stats / decontam_stats shared stages and
  * the reworked knn_edges build, to attribute their per-run task CPU
  * after the caches are hot (the packed bench read an anomalous 5.3
  * CPU-s for quality_repetition_score reading a 5k-row cached table). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    // post-broadcast-cliff join strategy probe: at sf3 the TPC-H joins
    // flip broadcast → sort-merge; compare SMJ vs AQE shuffled-hash vs
    // runtime bloom filter on the same data in the same JVM
    println("bloom default = " + spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.enabled"))
    val qs = Seq("text_tfidf_topterms", "text_fingerprint",
      "text_bpe_pairs", "text_feature_hashing", "text_chunk_overlap",
      "agg_rollup_revenue", "agg_cube_orders", "agg_grouping_sets")
    def runSet(tag: String): Unit = qs.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      time(s"$tag $q")(noop(df))
    }
    for (round <- 1 to 3) {
      spark.conf.set("spark.sql.files.openCostInBytes", (4L << 20).toString)
      runSet(s"oc4m r$round")
      spark.conf.set("spark.sql.files.openCostInBytes", (128L << 10).toString)
      runSet(s"oc128k r$round")
    }
    sys.exit(0)

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // knn-edge rule: OLD (skinny pairs + two array-fetch joins) vs NEW
    // (arrays attached to the assignment, cosine inline) — same JVM
    val n = graft.operators.SimilarityOps.quantized(spark, sfDir)
    val asg = graft.operators.SimilarityOps.ivfAssign(spark, sfDir)
    noop(n); noop(asg) // warm both caches so only the join shapes differ
    def cosine(qa: String, qb: String, n2a: String, n2b: String) =
      expr(s"cast(graft_dot($qa, $qb) as double)") /
        (sqrt(col(n2a)) * sqrt(col(n2b)))
    val oldPairs = asg.as("a").join(asg.as("b"),
        col("a.pivot_id") === col("b.pivot_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vid"), col("b.vec_id").as("neighbor_id"))
    val oldScored = oldPairs
      .join(n.select(col("vec_id").as("vid"), col("q").as("qq"),
        col("n2").as("qn2")), "vid")
      .join(n.select(col("vec_id").as("neighbor_id"), col("q"),
        col("n2")), "neighbor_id")
      .select(col("vid"), col("neighbor_id"),
        cosine("qq", "q", "qn2", "n2").as("cos_sim"))
    val wk = Window.partitionBy(col("vid"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val oldKnn = oldScored.withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= 3)
      .select(col("vid").as("vec_id"), col("neighbor_id"), col("cos_sim"),
        col("rk"))
    val members = asg.join(n, "vec_id")
    val newKnn = members.as("a").join(members.as("b"),
        col("a.pivot_id") === col("b.pivot_id") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vid"), col("b.vec_id").as("neighbor_id"),
        cosine("a.q", "b.q", "a.n2", "b.n2").as("cos_sim"))
      .withColumn("rk", row_number().over(wk)).filter(col("rk") <= 3)
      .select(col("vid").as("vec_id"), col("neighbor_id"), col("cos_sim"),
        col("rk"))
    for (i <- 1 to 3) time(s"knn OLD shape $i")(noop(oldKnn))
    for (i <- 1 to 3) time(s"knn NEW shape $i")(noop(newKnn))

    spark.stop()
  }
}
