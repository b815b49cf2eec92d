package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only scratch: time named variants to isolate a perf anomaly.
  * Not part of the driver contract. Current probe: decompose the r14
  * ppjoin build into its sub-plans to locate the CPU floor the sf1
  * isolation run surfaced (388 task-CPU-s vs r13's 269 packed). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/testdata_sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val cpuNs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
    })
    def time(name: String)(f: => Any): Unit = {
      Thread.sleep(300) // let listener drain
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBE $name wall=$wall%.2f s cpu=${(cpuNs.get() - c0) / 1e9}%.2f s")
    }

    time("shingle_index_build")(
      graft.operators.DedupOps.shingleSizes(spark, sfDir).count())
    val idx = graft.operators.DedupOps.shingleIndex(spark, sfDir)

    val sets = idx.groupBy($"doc_id")
      .agg(md5(sort_array(collect_list($"h")).cast("string")).as("ck"))
    time("sets_once")(sets.count())
    val members = sets
      .join(sets.groupBy($"ck").agg(min($"doc_id").as("rep")), "ck")
      .select($"doc_id", $"rep").persist()
    time("members")(members.count())

    val docTok = idx
      .join(members.filter($"doc_id" === $"rep").select($"doc_id"),
        Seq("doc_id"), "left_semi")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"df", $"h"))).as("ts"))
      .select($"doc_id",
        expr("transform(ts, x -> x.h)").as("hs"),
        size($"ts").cast("long").as("len"))
      .persist()
    time("docTok")(docTok.count())

    val pfx = docTok
      .select($"doc_id", $"len", posexplode(
        expr("slice(hs, 1, cast(len - (len + 1) div 2 + 1 as int))")))
      .select($"doc_id", $"len",
        ($"pos" + 1).cast("long").as("pos"), $"col".as("h"))
    val pfxIdx = pfx.filter(
      $"pos" <= expr("len - (len * 2 + 2) div 3 + 1"))
    time("pfx_count")(pfx.count())

    val cand = pfxIdx.as("a").join(pfx.as("b"),
        $"a.h" === $"b.h" &&
        ($"a.len" < $"b.len" ||
          ($"a.len" === $"b.len" && $"a.doc_id" < $"b.doc_id")) &&
        $"b.len" <= $"a.len" * 2 &&
        lit(1) + least($"a.len" - $"a.pos", $"b.len" - $"b.pos") >=
          expr("(a.len + b.len + 2) div 3"))
      .select(least($"a.doc_id", $"b.doc_id").as("doc_a"),
        greatest($"a.doc_id", $"b.doc_id").as("doc_b")).distinct()
    time("cand")(cand.count())

    // r13-shape candidate join for comparison: symmetric full prefixes
    val candOld = pfx.as("a").join(pfx.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id" &&
        $"a.len" <= $"b.len" * 2 && $"b.len" <= $"a.len" * 2 &&
        lit(1) + least($"a.len" - $"a.pos", $"b.len" - $"b.pos") >=
          expr("(a.len + b.len + 2) div 3"))
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    time("cand_r13_shape")(candOld.count())

    val repPairs = cand
      .join(docTok.select($"doc_id".as("doc_a"),
        $"hs".as("hs_a"), $"len".as("sz_a")), "doc_a")
      .join(docTok.select($"doc_id".as("doc_b"),
        $"hs".as("hs_b"), $"len".as("sz_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        size(array_intersect($"hs_a", $"hs_b")).cast("long").as("n_common"),
        $"sz_a", $"sz_b")
      .withColumn("union_n", $"sz_a" + $"sz_b" - $"n_common")
      .filter($"n_common" * 2 >= $"union_n")
    time("verify")(repPairs.count())

    spark.stop()
  }
}
