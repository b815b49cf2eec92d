package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data profiling + distribution summaries — the "look at the table
  * before you trust it" operators every warehouse ships (cf. DuckDB
  * `SUMMARIZE`, Deequ/Great-Expectations profilers).
  *
  *  - `profile_columns` — one row per `lineitem` column: null count,
  *    exact distinct count, min/max (typed lanes: numeric as rounded
  *    doubles, everything else as strings). The ingest-gate artifact a
  *    pipeline diffs between crawl generations to catch schema/value
  *    drift before training on it.
  *  - `agg_equidepth_histogram` — 10-bin equi-DEPTH histogram of
  *    `l_extendedprice` (each bin ≈ same row count); the complement of
  *    [[PipelineOps.aggHistogramPrice]]'s fixed-width bins, and the
  *    shape optimizers actually store (selectivity estimation wants
  *    quantile boundaries, not uniform buckets).
  *  - `agg_rfm_segments` — classic RFM (recency/frequency/monetary)
  *    customer segmentation: per-customer aggregates, global quintile
  *    boundaries, 125-cell segment summary.
  *
  * Scale story (100 TB):
  *  - `profile_columns` runs one PRUNED single-column aggregation per
  *    column (see the method doc for why the one-pass multi-distinct
  *    Expand(×11) formulation is a measured 30× worse); each shuffle
  *    carries only that column's distinct partials. At real corpus
  *    scale the drop-in is `approx_count_distinct` (HLL, constant
  *    state — see `agg_approx_distinct`), which DOES fuse into one
  *    pass; the exact form is the oracle-checkable variant.
  *  - the histogram avoids the global-sort trap: a single `ntile(10)`
  *    window over an un-partitioned ORDER BY would funnel the corpus
  *    through one task. Instead: pass 1 computes the 9 exact decile
  *    boundaries (partial+final `percentile`, one row out), pass 2
  *    bins every row against the broadcast boundary array and
  *    hash-aggregates — both passes fully parallel at any scale (at
  *    100 TB, swap pass 1 to `approx_percentile` and keep pass 2).
  *  - RFM aggregates orders per customer (hash agg), then reduces the
  *    per-customer table twice more (boundary row, segment cells) —
  *    data volume drops at every step; every join is against a
  *    broadcast 1-row boundary frame.
  *
  * Determinism: doubles are never summed directly — money flows as
  * exact integer cents (`BIGINT`) and is divided back out once, like
  * [[Relational.aggCorrQuantityPrice]]; percentile boundaries are the
  * same interpolated doubles on both engines (see `agg_percentiles`);
  * bin membership uses strict `>` against boundaries so a 1-ulp
  * boundary difference cannot flip an integer-valued observation.
  */
object ProfilingOps {

  private val ProfiledCols: Seq[(String, String)] = Seq(
    // (column, lane): numeric lanes profile min/max as rounded doubles,
    // string/timestamp lanes as strings — doubles stringify differently
    // across engines, strings compare exactly
    "l_orderkey" -> "num", "l_partkey" -> "num", "l_suppkey" -> "num",
    "l_linenumber" -> "num", "l_quantity" -> "num",
    "l_extendedprice" -> "num", "l_discount" -> "num", "l_tax" -> "num",
    "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")

  /** Column profiler (`profile_columns`): one PRUNED single-column
    * aggregation per column, unioned. The tempting "one pass, 11
    * countDistincts" formulation plans as Expand(×11) — it SHUFFLES
    * eleven copies of the table keyed by (gid, value), which measured
    * 23 s at sf0.1 vs well under a second this way: columnar parquet
    * makes 11 single-column scans read the same total bytes as one
    * full-width scan, and each distinct is then a standard partial+final
    * two-phase agg on its own column only. */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val perCol: Seq[DataFrame] = ProfiledCols.map { case (c, lane) =>
      val mm: Seq[Column] = lane match {
        case "num" => Seq(
          round(min(col(c)).cast("double"), 6).as("min_num"),
          round(max(col(c)).cast("double"), 6).as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
        case _ => Seq(
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          min(col(c).cast("string")).as("min_str"),
          max(col(c).cast("string")).as("max_str"))
      }
      val aggs: Seq[Column] = Seq(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct")) ++ mm
      li.select(col(c))
        .agg(aggs.head, aggs.tail: _*)
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    perCol.reduce(_.unionByName(_)).orderBy($"column_name")
  }

  lazy val profileColumnsSql: String = {
    val selects = ProfiledCols.map { case (c, lane) =>
      val mm = lane match {
        case "num" =>
          s"""round(CAST(min($c) AS DOUBLE), 6) AS min_num,
             |  round(CAST(max($c) AS DOUBLE), 6) AS max_num,
             |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str""".stripMargin
        case _ =>
          s"""CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             |  min(CAST($c AS VARCHAR)) AS min_str, max(CAST($c AS VARCHAR)) AS max_str""".stripMargin
      }
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  $mm
         |FROM lineitem""".stripMargin
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** The distinct-value cumulative table behind
    * [[aggEquidepthHistogram]]'s exact decile selection, memoized +
    * persisted per (session, dir): per distinct `l_extendedprice`, its
    * count and its LOCAL cumulative count within a fixed-width
    * value-range bucket (`floor(v/64)` — contiguous and monotone in v,
    * so bucket-carry composition reconstructs the global cumulative;
    * exact widths are a performance knob only). Content-bounded: the
    * TPC-H price grid saturates (~583k distinct at sf10 for 60M rows),
    * so this stage stops growing with the corpus. */
  private def equidepthCum(spark: SparkSession, dir: String): DataFrame =
    DedupOps.cachedDf(spark, s"equidepth_cum:$dir") {
      import spark.implicits._
      val wLoc = Window.partitionBy($"bucket").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(spark, dir)
        .groupBy($"l_extendedprice".as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("bucket", floor($"v" / 64.0).cast("long"))
        .withColumn("lcum", sum($"cnt").over(wLoc))
    }

  /** 10-bin equi-depth histogram of `l_extendedprice`
    * (`agg_equidepth_histogram`): bin = 1 + #{decile boundaries < x}.
    *
    * Exact decile boundaries WITHOUT `percentile()`'s all-values
    * single aggregation buffer (the r16 ladder's #1 wall line at sf0.1
    * AND sf3 — one task sorts the whole column): order statistics over
    * the [[equidepthCum]] distinct-value table instead. (1) global
    * cumulative counts via bucket-carry composition (exclusive prefix
    * over the tiny bucket-summary table — the event detectors' two-level
    * scan on the value axis); (2) the ≤ 18 bracketing ranks
    * (`pos = (n−1)·d/10`, exact integers on the tenths grid) looked up
    * with one broadcast range join; (3) linear interpolation. Binning
    * parity with the oracle's `quantile_cont` is ulp-safe BY
    * CONSTRUCTION, not by matching libm: a boundary with fraction
    * f ∈ {0.1..0.9} either IS a data value (equal neighbors, exact in
    * both engines) or sits strictly inside a ≥ 0.01-wide gap between
    * consecutive distinct prices, which last-ulp formula differences
    * cannot cross, so every `x > b` bin test agrees; boundaries never
    * appear in the output. */
  def aggEquidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val loc = equidepthCum(spark, dir)
    val summ = loc.groupBy($"bucket").agg(sum($"cnt").as("sb"))
    // exclusive carry over the ~1.6k bucket summaries (bounded input —
    // a global window here is the driver-sized presentation pattern)
    val wPrev = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = summ
      .withColumn("cb", coalesce(sum($"sb").over(wPrev), lit(0L)))
      .select($"bucket", $"cb")
    val cum = loc.join(broadcast(carry), "bucket")
      .select($"v", $"cnt", ($"cb" + $"lcum").as("cum"))
    val nRow = summ.agg(sum($"sb").as("n"))
    val need = spark.range(1, 10).toDF("d")
      .crossJoin(broadcast(nRow))
      .select($"d", expr("(n - 1) * d").as("pos10"))
      .select($"d", expr("pos10 div 10 + 1").as("rank_lo"),
        ($"pos10" % 10).as("f10"))
      .select($"d", $"f10", explode(array(
        struct($"rank_lo".as("r"), lit(true).as("is_lo")),
        struct(($"rank_lo" + 1).as("r"), lit(false).as("is_lo")))).as("rr"))
      .select($"d", $"f10", $"rr.r".as("r"), $"rr.is_lo".as("is_lo"))
    // value-at-rank: rank r falls to the distinct value whose cumulative
    // range (cum-cnt, cum] covers it — 18 broadcast rows against the
    // content-bounded cum table
    val atRank = cum.join(broadcast(need),
      $"cum" - $"cnt" < $"r" && $"r" <= $"cum")
    val bdy = atRank.groupBy($"d")
      .agg(max($"f10").as("f10"),
        max(when($"is_lo", $"v")).as("v_lo"),
        max(when(!$"is_lo", $"v")).as("v_hi"))
      .select($"d", when($"f10" === 0, $"v_lo")
        .otherwise($"v_lo" +
          ($"v_hi" - $"v_lo") * ($"f10".cast("double") / lit(10.0))).as("b"))
    val bounds = bdy.agg(
      expr("transform(array_sort(collect_list(struct(d, b))), x -> x.b)")
        .as("bounds"))
    li.crossJoin(broadcast(bounds))
      .select($"l_extendedprice".as("x"),
        expr("1 + aggregate(bounds, 0, (acc, b) -> acc + if(x > b, 1, 0))").as("bin"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_rows"),
        min($"x").as("lo"), max($"x").as("hi"),
        sum($"cents").as("sum_cents"))
      .select($"bin", $"n_rows", $"lo", $"hi",
        round($"sum_cents" / 100.0 / $"n_rows", 6).as("avg_price"))
      .orderBy($"bin")
  }

  /** Sketch-boundary equi-depth histogram (`agg_equidepth_sketch`) — the
    * production twin of [[aggEquidepthHistogram]], same shape/columns but
    * decile boundaries from `approx_percentile` (Greenwald-Khanna,
    * accuracy 10000 → rank error ≤ n/10⁴). The exact variant (r16) is
    * distributed order-statistic selection over the distinct-value
    * table — scalable while the VALUE GRID is content-bounded, as
    * TPC-H prices are; the sketch is what survives a continuous-valued
    * column (distinct ≈ rows would make the exact path's distinct
    * table corpus-sized), a bounded mergeable summary with partial
    * aggregation — one map-side pass + a tiny merge, no distinct
    * shuffle at all. Binning/count/avg math is
    * identical (and still exact per bin). No cross-engine oracle —
    * sketch boundaries are engine-specific; the suite pins bin
    * contiguity, exact total preservation, and per-bin depth within the
    * sketch's rank-error budget against the exact variant. */
  def aggEquidepthSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val deciles = (1 to 9).map(i => s"0.${i}D").mkString(", ")
    val bounds = li.agg(
      expr(s"approx_percentile(l_extendedprice, array($deciles), 10000)")
        .as("bounds"))
    li.crossJoin(broadcast(bounds))
      .select($"l_extendedprice".as("x"),
        expr("1 + aggregate(bounds, 0, (acc, b) -> acc + if(x > b, 1, 0))").as("bin"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_rows"),
        min($"x").as("lo"), max($"x").as("hi"),
        sum($"cents").as("sum_cents"))
      .select($"bin", $"n_rows", $"lo", $"hi",
        round($"sum_cents" / 100.0 / $"n_rows", 6).as("avg_price"))
      .orderBy($"bin")
  }

  lazy val aggEquidepthHistogramSql: String = {
    val deciles = (1 to 9).map(i => s"quantile_cont(l_extendedprice, 0.$i)").mkString(", ")
    s"""WITH bounds AS (SELECT [$deciles] AS bs FROM lineitem),
       |binned AS (
       |  SELECT l_extendedprice AS x,
       |         1 + list_sum(list_transform(bs,
       |               b -> CASE WHEN l_extendedprice > b THEN 1 ELSE 0 END)) AS bin,
       |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
       |  FROM lineitem, bounds)
       |SELECT CAST(bin AS INT) AS bin, count(*) AS n_rows,
       |       min(x) AS lo, max(x) AS hi,
       |       round(sum(cents) / 100.0 / count(*), 6) AS avg_price
       |FROM binned GROUP BY bin ORDER BY bin""".stripMargin
  }

  /** Benford's-law first-digit literals log₁₀(1 + 1/d), computed once on
    * the driver and inlined as the SAME double literals into both
    * engines' plans (the projection-matrix trick of [[SimilarityOps]]) —
    * cross-engine `log10` calls could differ in the last ulp; a shared
    * literal cannot. */
  private lazy val BenfordP: Map[Int, Double] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap

  /** Benford first-digit audit of `o_totalprice`
    * (`quality_benford_totalprice`): observed leading-digit counts vs
    * the Benford expectation, with per-digit χ² contributions — the
    * classic fabricated-data / unit-mixup smell test a profiler runs on
    * any money column. (TPC-H-style synthetic uniforms FAIL Benford —
    * loudly visible in the chi2 column — which is exactly what the audit
    * is for: flagging distributions that don't look organically grown.)
    *
    * Scale: first digit extracted from the exact integer cents' decimal
    * string (BIGINT→VARCHAR renders identically on both engines; no
    * float log10 in the row path), one 9-group hash agg, one 1-row total
    * broadcast back. */
  def qualityBenfordTotalprice(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val digits = Tables.orders(spark, dir)
      .select(substring(
        expr("cast(cast(round(o_totalprice * 100) as bigint) as string)"), 1, 1)
        .cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum($"n_obs").as("n_total"))
    val expected = typedLit(BenfordP.map { case (d, p) => d -> p })
    digits.crossJoin(broadcast(tot))
      .withColumn("p", element_at(expected, $"digit"))
      .select($"digit", $"n_obs",
        expr("n_obs * 1000 div n_total").as("obs_permille"),
        round($"p" * 1000, 3).as("benford_permille"),
        round(($"n_obs" - $"n_total" * $"p") * ($"n_obs" - $"n_total" * $"p") /
          ($"n_total" * $"p"), 6).as("chi2_term"))
      .orderBy($"digit")
  }

  lazy val qualityBenfordTotalpriceSql: String = {
    val pCase = (1 to 9)
      .map(d => s"WHEN $d THEN CAST(${BenfordP(d)} AS DOUBLE)")
      .mkString(" ")
    s"""WITH digits AS (
       |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
       |         count(*) AS n_obs
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM digits),
       |withp AS (
       |  SELECT digit, n_obs, n_total,
       |         CASE digit $pCase END AS p
       |  FROM digits, tot)
       |SELECT digit, n_obs,
       |       n_obs * 1000 // n_total AS obs_permille,
       |       round(p * 1000, 3) AS benford_permille,
       |       round((n_obs - n_total * p) * (n_obs - n_total * p)
       |             / (n_total * p), 6) AS chi2_term
       |FROM withp ORDER BY digit""".stripMargin
  }

  /** RFM segmentation over orders (`agg_rfm_segments`): per-customer
    * (recency_days, frequency, monetary_cents), quintile scores (5 =
    * best: most recent / most orders / most revenue), segment rollup. */
  def aggRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val quintiles = "array(0.2D, 0.4D, 0.6D, 0.8D)"
    val perCust = Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(max($"o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("monetary_cents"))
    val refDate = Tables.orders(spark, dir).agg(max($"o_orderdate").as("ref_date"))
    val rfm = perCust.crossJoin(broadcast(refDate))
      .select($"o_custkey",
        datediff(to_date($"ref_date"), to_date($"last_order")).as("recency_days"),
        $"frequency", $"monetary_cents")
    val bounds = rfm.agg(
      expr(s"percentile(recency_days, $quintiles)").as("rb"),
      expr(s"percentile(frequency, $quintiles)").as("fb"),
      expr(s"percentile(monetary_cents, $quintiles)").as("mb"))
    rfm.crossJoin(broadcast(bounds))
      .select($"o_custkey", $"monetary_cents",
        // recency: SMALLER is better → invert the count-of-exceeded-bounds
        expr("5 - aggregate(rb, 0, (acc, b) -> acc + if(recency_days > b, 1, 0))").as("r_score"),
        expr("1 + aggregate(fb, 0, (acc, b) -> acc + if(frequency > b, 1, 0))").as("f_score"),
        expr("1 + aggregate(mb, 0, (acc, b) -> acc + if(monetary_cents > b, 1, 0))").as("m_score"))
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum($"monetary_cents").as("seg_cents"))
      .select($"r_score", $"f_score", $"m_score", $"n_customers",
        round($"seg_cents" / 100.0 / $"n_customers", 6).as("avg_monetary"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }

  lazy val aggRfmSegmentsSql: String =
    """WITH per_cust AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_order,
      |         count(*) AS frequency,
      |         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
      |  FROM orders GROUP BY o_custkey),
      |ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
      |rfm AS (
      |  SELECT o_custkey,
      |         date_diff('day', CAST(last_order AS DATE), CAST(ref_date AS DATE)) AS recency_days,
      |         frequency, monetary_cents
      |  FROM per_cust, ref),
      |bounds AS (
      |  SELECT [quantile_cont(recency_days, 0.2), quantile_cont(recency_days, 0.4),
      |          quantile_cont(recency_days, 0.6), quantile_cont(recency_days, 0.8)] AS rb,
      |         [quantile_cont(frequency, 0.2), quantile_cont(frequency, 0.4),
      |          quantile_cont(frequency, 0.6), quantile_cont(frequency, 0.8)] AS fb,
      |         [quantile_cont(monetary_cents, 0.2), quantile_cont(monetary_cents, 0.4),
      |          quantile_cont(monetary_cents, 0.6), quantile_cont(monetary_cents, 0.8)] AS mb
      |  FROM rfm),
      |scored AS (
      |  SELECT o_custkey, monetary_cents,
      |         5 - list_sum(list_transform(rb, b -> CASE WHEN recency_days > b THEN 1 ELSE 0 END)) AS r_score,
      |         1 + list_sum(list_transform(fb, b -> CASE WHEN frequency > b THEN 1 ELSE 0 END)) AS f_score,
      |         1 + list_sum(list_transform(mb, b -> CASE WHEN monetary_cents > b THEN 1 ELSE 0 END)) AS m_score
      |  FROM rfm, bounds)
      |SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
      |       CAST(m_score AS INT) AS m_score,
      |       count(*) AS n_customers,
      |       round(sum(monetary_cents) / 100.0 / count(*), 6) AS avg_monetary
      |FROM scored
      |GROUP BY r_score, f_score, m_score
      |ORDER BY r_score, f_score, m_score""".stripMargin

  /** Gopher-style rule-based quality gate (`quality_gopher_rules`):
    * the named-boolean-rule battery of Rae et al. 2021 (Gopher, §A1.1;
    * the same shape ships in Dolma/RefinedWeb/FineWeb pipelines),
    * restated for this corpus — per document:
    *
    *  - `wc`   word count within [25, 5000]
    *  - `mwl`  mean word length within [3, 10] chars
    *  - `stop` stopword fraction >= 4% (the tiny shared
    *           [[TextOps.StopWords]] list stands in for Gopher's)
    *  - `ttr`  type-token ratio >= 40% (repetition guard)
    *  - `maxw` longest word <= 15 chars (garbage/concat guard)
    *
    * rolled up per source: how many docs fail EACH rule plus the
    * all-rules pass rate. This is the artifact a curation run reads
    * before choosing filters: [[graft.operators.CurationOps]]'s
    * quality gate scores documents on a weighted composite; Gopher
    * rules instead attribute every rejection to a NAMED predicate, so
    * a drop in pass rate points at the rule (and thus the crawler
    * regression) that caused it.
    *
    * Exactness: every rule is an integer cross-multiplication on token
    * counts (`n_stop*25 >= n_tok`, `3*n_tok <= chars <= 10*n_tok`) —
    * no floating-point ratios anywhere, so both engines agree bit-for-
    * bit; the pass rate is integer per-mille. Token chars are derived
    * as `length(text) - (n_tok - 1)` (total minus separators) to keep
    * the map phase to ONE pass over the string functions.
    *
    * Scale shape: the rule vector is a narrow map-only projection
    * (split/filter/array_distinct are per-row, no shuffle); the only
    * shuffle is the final partial+final hash agg keyed by source, whose
    * state is #sources x 7 counters. Output bounded by the source
    * alphabet at any corpus size. */
  def qualityGopherRules(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"source",
        size(split($"text", " ")).cast("bigint").as("n_tok"),
        size(filter(split(lower($"text"), " "),
          t => t.isInCollection(TextOps.StopWords))).cast("bigint").as("n_stop"),
        size(array_distinct(split(lower($"text"), " ")))
          .cast("bigint").as("n_distinct"),
        array_max(transform(split($"text", " "), t => length(t)))
          .cast("bigint").as("max_word"),
        (length($"text") - size(split($"text", " ")) + 1)
          .cast("bigint").as("tok_chars"))
    val rules = toks.select($"source",
      ($"n_tok" >= 25L && $"n_tok" <= 5000L).as("r_wc"),
      (lit(3L) * $"n_tok" <= $"tok_chars" &&
        $"tok_chars" <= lit(10L) * $"n_tok").as("r_mwl"),
      ($"n_stop" * 25L >= $"n_tok").as("r_stop"),
      ($"n_distinct" * 5L >= $"n_tok" * 2L).as("r_ttr"),
      ($"max_word" <= 15L).as("r_maxw"))
    def fails(c: Column): Column = sum(when(c, 0L).otherwise(1L))
    rules.groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        fails($"r_wc").as("fail_wc"),
        fails($"r_mwl").as("fail_mwl"),
        fails($"r_stop").as("fail_stop"),
        fails($"r_ttr").as("fail_ttr"),
        fails($"r_maxw").as("fail_maxw"),
        sum(when($"r_wc" && $"r_mwl" && $"r_stop" && $"r_ttr" && $"r_maxw",
          1L).otherwise(0L)).as("n_pass"))
      .withColumn("pass_permille", expr("n_pass * 1000 div n_docs"))
      .orderBy($"source")
  }

  val qualityGopherRulesSql: String = {
    val stop = TextOps.StopWords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (
       |  SELECT source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(len(list_filter(string_split(lower(text), ' '),
       |      x -> x IN ($stop))) AS BIGINT) AS n_stop,
       |    CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS n_distinct,
       |    CAST(list_max(list_transform(string_split(text, ' '),
       |      x -> len(x))) AS BIGINT) AS max_word,
       |    CAST(len(text) - len(string_split(text, ' ')) + 1 AS BIGINT) AS tok_chars
       |  FROM documents),
       |rules AS (
       |  SELECT source,
       |    n_tok >= 25 AND n_tok <= 5000 AS r_wc,
       |    3 * n_tok <= tok_chars AND tok_chars <= 10 * n_tok AS r_mwl,
       |    n_stop * 25 >= n_tok AS r_stop,
       |    n_distinct * 5 >= n_tok * 2 AS r_ttr,
       |    max_word <= 15 AS r_maxw
       |  FROM t)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN r_wc THEN 0 ELSE 1 END) AS BIGINT) AS fail_wc,
       |  CAST(sum(CASE WHEN r_mwl THEN 0 ELSE 1 END) AS BIGINT) AS fail_mwl,
       |  CAST(sum(CASE WHEN r_stop THEN 0 ELSE 1 END) AS BIGINT) AS fail_stop,
       |  CAST(sum(CASE WHEN r_ttr THEN 0 ELSE 1 END) AS BIGINT) AS fail_ttr,
       |  CAST(sum(CASE WHEN r_maxw THEN 0 ELSE 1 END) AS BIGINT) AS fail_maxw,
       |  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_stop AND r_ttr AND r_maxw
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_stop AND r_ttr AND r_maxw
       |      THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS pass_permille
       |FROM rules
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }
}
