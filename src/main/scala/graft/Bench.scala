package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at the
  * scale factor in SPARK_GRAFT_SF_DIR and prints ONE JSON line. A short
  * untimed warmup (generic codegen + one small parquet scan) keeps JVM/
  * codegen startup out of the first timed query; queries run in sorted
  * name order for stable reports. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: codegen pipeline + parquet reader + shuffle machinery
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).collect()
    // memoized shared stages (MinHash estimates, SimHash sketch, PPJoin
    // pairs) are built and timed ONCE up front as their own ledger lines:
    // previously whichever dedup-family query ran first paid the whole
    // sketch build, so unchanged queries appeared to regress between
    // rounds whenever registration order shifted
    // prewarm handles its own per-stage failures (a failed stage drops
    // only its ledger line); only a FATAL error reaches here, and then
    // the JVM is not worth salvaging — let it die loudly
    val shared = graft.operators.DedupOps.prewarmSharedStages(spark, sfDir)
    // noop-format write executes the FULL plan (final sorts/projections
    // included) — a count() would let Catalyst prune them. The "queries"
    // map holds ONLY successes (so a naive sum over it is correct); failed
    // queries go in a separate name->seconds map, never mixed in.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, ok)
    }
    def jsonMap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jsonMap(results.collect { case (k, v, true) => (k, v) })
    // "failed" keeps the original name-array shape (r1/r2 parsers expect
    // it); per-failure timings live in "failed_secs" alongside.
    val failedNames = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val failedSecs = jsonMap(results.collect { case (k, v, false) => (k, v) })
    val sharedJson = jsonMap(shared)
    // headline total = queries + shared-stage builds, so it stays
    // comparable with rounds where the builds hid inside query lines
    val total = results.collect { case (_, v, true) => v }.sum + shared.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shared_stages":$sharedJson,"failed":$failedNames,"failed_secs":$failedSecs,"sf":"$sfDir"}""")
    // The full line above exceeds harnesses that keep only a short output
    // tail (the per-round capture holds 2000 bytes — ~115 queries is ~4 KB,
    // which truncates the headline "value" right out of the record). Emit a
    // compact, complete summary LAST: same schema, "queries" limited to the
    // slowest 20, always well under the tail window.
    val slowest = results.collect { case (k, v, true) => (k, v) }
      .sortBy(-_._2).take(20)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.count(_._3)},"queries":${jsonMap(slowest)},"shared_stages":$sharedJson,"failed":$failedNames,"sf":"$sfDir"}""")
    spark.stop()
  }
}
