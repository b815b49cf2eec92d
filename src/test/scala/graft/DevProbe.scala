package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only scratch: time named variants to isolate a perf anomaly.
  * Not part of the driver contract. Current probe: decompose
  * text_bigram_logprob (the #2 genuine CPU line at sf3, 142.9 task-CPU-s)
  * into its corpus passes — token/bigram explodes, vocab joins, and the
  * collect_list + interpreted-`aggregate`-HOF fold — and time a variant
  * that moves the per-element log() term out of the interpreted lambda
  * into a codegen projection (fold becomes a plain interpreted add). */
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

    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id",
        expr("filter(split(lower(text), ' '), x -> x <> '')").as("a"))
    val tok = toks.select($"doc_id", explode($"a").as("token"))
    val vocab = tok.groupBy($"token").agg(count(lit(1)).as("c"))
    val totals = vocab.agg(sum($"c").as("n_total"))
    val bg = toks.filter(size($"a") >= 2)
      .select($"doc_id", explode(expr(
        """zip_with(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1),
          |  (x, y) -> named_struct('x', x, 'y', y))""".stripMargin)).as("b"))
      .select($"doc_id", $"b.x".as("x"), $"b.y".as("y"),
        concat($"b.x", lit(" "), $"b.y").as("bigram"))
    val bgc = bg.groupBy($"bigram").agg(count(lit(1)).as("cxy"))
    val dbg = bg.groupBy($"doc_id", $"bigram", $"x", $"y")
      .agg(count(lit(1)).as("k"))

    time("vocab")(noop(vocab))
    time("bgc")(noop(bgc))
    time("dbg")(noop(dbg))

    val joined = dbg.join(bgc, "bigram")
      .join(vocab.select($"token".as("x"), $"c".as("cx")), Seq("x"))
      .join(vocab.select($"token".as("y"), $"c".as("cy")), Seq("y"))
    time("joins_no_agg")(noop(joined))

    time("full_current")(noop(
      graft.operators.TextOps.textBigramLogprob(spark, sfDir)))

    // variant: term computed in a codegen projection; the HOF lambda
    // folds plain adds over (bigram, term) structs sorted by bigram —
    // identical IEEE sequence (same products, same add order)
    val variant = joined
      .crossJoin(broadcast(totals))
      .select($"doc_id", $"k", $"bigram",
        ($"k".cast("double") *
          log(($"cxy".cast("double") +
               $"cy".cast("double") / $"n_total".cast("double")) /
              ($"cx".cast("double") + lit(1.0)))).as("term"))
      .groupBy($"doc_id")
      .agg(sum($"k").as("n_bigrams"),
        sort_array(collect_list(struct($"bigram", $"term"))).as("xs"))
      .select($"doc_id", $"n_bigrams",
        round(
          aggregate($"xs", lit(0.0), (acc, t) =>
            acc + t.getField("term")) /
            $"n_bigrams".cast("double"), 6).as("avg_logprob2"))
      .orderBy($"doc_id")
    time("full_term_projected")(noop(variant))

    // bit-parity of the variant against the registered query
    val cur = graft.operators.TextOps.textBigramLogprob(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val v = variant.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val mismatch = cur.keySet.union(v.keySet).filter { k =>
      cur.get(k) != v.get(k) ||
        java.lang.Double.doubleToLongBits(cur(k)._2) !=
          java.lang.Double.doubleToLongBits(v(k)._2)
    }
    println(s"PROBE parity mismatches=${mismatch.size} of ${cur.size}")

    spark.stop()
  }
}
