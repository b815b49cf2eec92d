package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit main: dumps `explain(formatted)` for the headline queries
  * into PLANS.md, together with the plan-shape counts that matter at
  * cluster scale (exchanges, scans, broadcasts, whole-stage-codegen
  * spans). The audit set is the queries whose physical shape carries the
  * 100 TB story — pushdown proof on the selective TPC-H filters, the
  * single-shuffle sketch aggregations, the broadcast-vs-shuffle join
  * split, and the fused multi-stage curation pipelines — so a reviewer
  * can read the actual plans without re-running the engine.
  *
  * Usage: `runMain graft.Plans [sfDir] [outFile]`
  * (defaults: /root/testdata/sf0.01, PLANS.md).
  *
  * Complements [[Explain]] (which dumps EVERY registered query's plan to
  * a scratch directory for ad-hoc diffing): this main is the small,
  * annotated, committed subset — the audit artifact, not the firehose.
  */
object Plans {

  /** (query key, what the plan must show to survive a 100× scale-up). */
  private val Audited: Seq[(String, String)] = Seq(
    "sql_forecast_revenue" ->
      ("TPC-H Q6 shape: the date/discount/quantity predicates must reach " +
        "the parquet scan as PushedFilters and the ReadSchema must be the " +
        "4 referenced columns, not the full lineitem row."),
    "sql_promo_revenue" ->
      ("TPC-H Q14 shape: selective date filter pushed to the lineitem " +
        "scan; part joined without shuffling lineitem twice."),
    "agg_pricing_summary" ->
      ("TPC-H Q1 shape: ONE shuffle on the 4-value group key with partial " +
        "aggregation (map-side combine) before it — the exchange moves " +
        "group states, not 6M rows."),
    "agg_corr_quantity_price" ->
      ("Single partial+final moment aggregation in DECIMAL(38); no " +
        "shuffle beyond the tiny 3-group final."),
    "join_orders_customers" ->
      ("Dimension join: customer side BROADCAST, no shuffle of orders."),
    "join_dpp_pruned" ->
      ("Dynamic partition pruning: the partitioned fact scan must show a " +
        "dynamicpruning subquery on the partition column, so only " +
        "dimension-selected partitions are read."),
    "join_asof_native" ->
      ("Custom AsOfJoinExec: both sides sort-shuffled ONCE on the key, " +
        "then a co-partitioned merge — no range-condition nested loop."),
    "dedup_minhash_lsh" ->
      ("All 16 minhash permutations out of ONE hash aggregation over the " +
        "shared shingle cache (InMemoryTableScan), banded equi-join — " +
        "no 16x row explosion, no cartesian."),
    "dedup_semantic" ->
      ("SemDeDup (trained default): coarse assignment scores the corpus " +
        "against the K=16 trained-centroid BROADCAST (bounded by K, " +
        "never the corpus) via one max_by aggregation; within-cluster " +
        "self-join hash-partitioned on cluster id. The density-pivot " +
        "variant survives as dedup_semantic_pivots for the exact oracle."),
    "similarity_ivfpq" ->
      ("IVF-PQ: the 128-row codebook is the one broadcast; candidate " +
        "lists come from the probe equi-join; ADC re-rank touches only " +
        "candidates, never the full corpus."),
    "text_quality_logreg" ->
      ("Trained-classifier application: one narrow shuffle-free codegen " +
        "projection per document — zero exchanges before the ordered " +
        "output."),
    "curation_training_extract" ->
      ("End-to-end gate->dedup->split->pack: exactly TWO documents scans " +
        "for the whole pipeline (one for the dedup registry, one for the " +
        "surviving text), everything else reuses shuffles."),
    "curation_corpus_report" ->
      ("Corpus report fused to ONE documents scan feeding all report " +
        "columns."),
    "pack_sequences_deduped" ->
      ("Packing consumes dedup keepers without rescanning documents for " +
        "each stage; one shuffle keyed by pack id."),
    "curation_decontaminate_bloom" ->
      ("Map-only decontamination: the corpus side must show ZERO " +
        "exchanges before the per-doc aggregation — the Bloom probe is a " +
        "filter-projection riding the shingle scan, the benchmark side " +
        "exists only as filter bytes inside the plan."),
    "dedup_incremental_bloom" ->
      ("Registry join prefiltered: the registry exchange consumes ONLY " +
        "the Bloom-positive branch; the negative branch unions in past " +
        "it untouched. Output bit-equal to dedup_incremental."),
    "embedding_covariance" ->
      ("Moment-matrix accumulation through the custom graft_moments " +
        "TypedImperativeAggregate (r11): partial ObjectHashAggregate " +
        "below ONE single-buffer exchange, and NO Generate below the " +
        "aggregate (the r10 form fanned every vector 2080x pre-agg); " +
        "the only Generate sits ABOVE it, unpacking the single result " +
        "row into the bounded (i,j) grid."),
    "multimodal_phash_dedup" ->
      ("Canonicalize-then-band (r11): hashing is one codegen'd " +
        "graft_phash128 call per row (no interpreted lambda tower in " +
        "any Project), the band equi-join's inputs are DISTINCT hashes " +
        "(HashAggregate above the hash projection), and doc pairs " +
        "reappear only in the two output-sized expansion joins — never " +
        "all-pairs, never tower-per-candidate."),
    "text_char_entropy" ->
      ("Histogram kernel (r11): one codegen'd graft_char_counts call " +
        "per document emits the sorted (ch, c) array — the plan must " +
        "show NO Generate and no (doc_id, ch) exchange (the r10 " +
        "char-explode fanned one row per character); the only exchange " +
        "is the final presentation sort."),
    "sample_weighted_docs" ->
      ("Weighted Bernoulli sample: ONE 1-row total-mass aggregate comes " +
        "back as a BroadcastExchange and the inclusion test is a narrow " +
        "codegen'd filter — no corpus-sized shuffle anywhere in the plan."),
    "events_downsample" ->
      ("Keep-last decimation as ONE partial+final max(struct) hash " +
        "aggregation: partial agg below the single exchange, so the " +
        "shuffle carries one candidate per (user, minute) per partition " +
        "— never the raw feed, and no Window sort anywhere."),
    "curation_snapshot_diff" ->
      ("Snapshot changelog: both sides reduce to (doc_id, md5) narrow " +
        "projections BEFORE the full-outer SortMergeJoin on doc_id, so " +
        "the join moves 16-byte digests; co-partitioned for free under " +
        "id-bucketed storage."),
    "graph_pagerank_knn" ->
      ("Distributed PageRank: every iteration reads the CACHED 3n-row " +
        "edge stage (InMemoryTableScan), joins ranks on src and " +
        "partial+final-sums on dst; the only broadcasts are the 1-row " +
        "node-count frames — nothing corpus-proportional, no window, " +
        "no driver-side loop state beyond the unrolled plan itself."),
    "profile_columns" ->
      ("Profiler: eleven PRUNED single-column parquet scans (each " +
        "ReadSchema is exactly one column), each feeding its own " +
        "partial+final distinct aggregation — NOT the one-pass " +
        "multi-distinct Expand(x11), which shuffles eleven copies of " +
        "the table (measured 23 s vs 2.3 s at sf0.1)."),
    "curation_pareto_front" ->
      ("Skyline: the un-partitioned RANGE-frame window (the exact " +
        "sweep) must sit ABOVE the bucketed suffix-max prefilter, so " +
        "the global sort sees only the surviving candidates; the " +
        "bucket-maxima frame arrives as a BroadcastExchange."),
    "dedup_threshold_sweep" ->
      ("Sweep: one pass over the CACHED PPJoin pair set crossed with " +
        "the 10-row literal threshold frame — no shingle recomputation, " +
        "no second pair join; both stat branches aggregate the same " +
        "swept frame.")
  )

  /** Counts physical operators by their numbered detail-section headers
    * (`(7) Exchange`): formatted explain prints every node twice (tree +
    * details), the headers exactly once per node. */
  private def countOp(plan: String, op: String): Int =
    s"""\\(\\d+\\) $op""".r.findAllIn(plan).size

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sb = new StringBuilder
    sb ++= "# PLANS — physical-plan audit of the headline queries\n\n"
    sb ++= s"Generated by `runMain graft.Plans` against `$sfDir`. Plan\n"
    sb ++= "SHAPE is scale-factor-independent; sizes in the dumps are the\n"
    sb ++= "audit SF's. Per plan: the property the shape must hold at\n"
    sb ++= "cluster scale, the shuffle/scan/broadcast counts, and the\n"
    sb ++= "full `explain(formatted)` output. (AQE initial plans do not\n"
    sb ++= "annotate whole-stage-codegen ids; codegen spans are visible\n"
    sb ++= "per executed stage in the Spark UI, not in these dumps.)\n\n"

    Audited.foreach { case (name, story) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val exchanges = countOp(plan, "Exchange")
      val scans = countOp(plan, "Scan parquet")
      val mem = countOp(plan, "InMemoryTableScan")
      val bcast = countOp(plan, "BroadcastExchange")
      sb ++= s"## `$name`\n\n"
      sb ++= s"**Scale contract:** $story\n\n"
      sb ++= s"**Shape counts:** $exchanges shuffle exchange(s), $bcast " +
        s"broadcast(s), $scans parquet scan(s), $mem cached-stage scan(s).\n\n"
      sb ++= "```text\n" + plan.trim + "\n```\n\n"
      // scalastyle:off println
      println(s"[plans] $name: shuffles=$exchanges broadcasts=$bcast " +
        s"parquetScans=$scans cachedScans=$mem")
      // scalastyle:on println
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"[plans] wrote ${Audited.size} plans to $out")
    spark.stop()
  }
}
