package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the quality/contamination/packing passes a
  * training-data pipeline runs between dedup and the final extract:
  *
  *  - repetition scoring (top-token fraction + type/token ratio),
  *  - benchmark-contamination detection (n-gram overlap against a held-out
  *    benchmark set),
  *  - sequence packing (greedy cumulative-token packing into fixed-size
  *    training sequences, per source partition),
  *  - per-domain quota sampling (deterministic cap per source),
  *  - PII-style scrubbing (regex redaction with an audit count).
  *
  * Determinism: all scores are rationals over exact integer counts
  * (IEEE-bit-equal across engines); sampling and packing order by
  * md5/doc_id, never `rand()` — identical output on any cluster size,
  * partitioning, or engine.
  *
  * Scale notes: every operator here is one narrow projection plus at most
  * one hash aggregation or one bounded window. Nothing collects to the
  * driver and nothing forces a broadcast of a corpus-proportional side
  * (the stand-in benchmark shingle set joins without a hint — see
  * [[contaminationNgramOverlap]]); the only broadcasts are genuine 1-row
  * scalars (corpus totals).
  */
object CurationOps {

  /** Repetition / diversity score per document: total tokens, distinct
    * tokens, the most-frequent-token count, and the two derived rationals
    * (top-token fraction, type/token ratio) used as repetition filters.
    * Two chained hash aggregations over the token stream — the second one
    * is co-partitioned with the first's doc_id grouping, so only the
    * (doc, token) aggregation shuffles the wide stream. */
  def qualityRepetitionScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r17: reads the memoized token-stats stage (same two-aggregation
    // chain this query always computed — see [[tokenGateStats]])
    tokenGateStats(spark, dir)
      .select($"doc_id", $"n_tokens", $"n_distinct", $"top_count",
        ($"top_count".cast("double") / $"n_tokens").as("top_frac"),
        ($"n_distinct".cast("double") / $"n_tokens").as("type_token_ratio"))
      .orderBy($"doc_id")
  }

  val qualityRepetitionScoreSql: String =
    """WITH cnt AS (
      |  SELECT doc_id, token, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |    FROM documents) t
      |  WHERE token <> '' GROUP BY doc_id, token),
      |agg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |         count(*) AS n_distinct, max(c) AS top_count
      |  FROM cnt GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_distinct, top_count,
      |       CAST(top_count AS DOUBLE) / n_tokens AS top_frac,
      |       CAST(n_distinct AS DOUBLE) / n_tokens AS type_token_ratio
      |FROM agg
      |ORDER BY doc_id""".stripMargin

  /** Benchmark-contamination check: fraction of each corpus document's
    * word-3-gram shingles that also occur in a held-out "benchmark" set
    * (every 97th document stands in for the eval suite). NOTE: because
    * the stand-in benchmark is a fixed FRACTION of the corpus (1/97), its
    * shingle set grows linearly with corpus size — so no broadcast hint:
    * AQE broadcasts it at small scale and falls back to a shuffled hash
    * join when it outgrows the threshold. (A real eval suite is a fixed
    * external table whose size is independent of the corpus; with that
    * contract a mandatory broadcast would be sound.) */
  def contaminationNgramOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r17: reads the memoized [[decontamStats]] stage — the corpus ⋈
    // benchmark shingle join + per-doc aggregation runs once per
    // (session, dir) instead of once per consumer
    decontamStats(spark, dir)
      .select($"doc_id", $"n_shingles", $"n_contaminated",
        ($"n_contaminated".cast("double") / $"n_shingles").as("contamination"))
      .orderBy($"doc_id")
  }

  val contaminationNgramOverlapSql: String =
    ("""WITH """ + DedupOps.shinglesCte + """,
      |bench AS (
      |  SELECT DISTINCT m FROM shingles WHERE doc_id % 97 = 0)
      |SELECT s.doc_id, count(*) AS n_shingles,
      |       count(b.m) AS n_contaminated,
      |       CAST(count(b.m) AS DOUBLE) / count(*) AS contamination
      |FROM shingles s LEFT JOIN bench b ON s.m = b.m
      |WHERE s.doc_id % 97 <> 0
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""").stripMargin

  /** Decontamination DECISION (`curation_decontaminate`) — the action the
    * [[contaminationNgramOverlap]] report exists to drive: a corpus
    * document is `dropped` when ≥5% of its 3-gram shingles appear in the
    * benchmark stand-in (the GPT-3/PaLM "dirty document" rule with the
    * threshold stated over exact integers — `20·n_contaminated ≥
    * n_shingles` — so the cutoff never rides a float compare). Composes
    * the report query unchanged, so the whole decision is one extra
    * codegen'd CASE over the same shared-shingle join; pipelines filter
    * `decision = 'kept'` before the training extract. */
  def curationDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    contaminationNgramOverlap(spark, dir)
      .select($"doc_id", $"n_shingles", $"n_contaminated",
        when(lit(20) * $"n_contaminated" >= $"n_shingles", "dropped")
          .otherwise("kept").as("decision"))
      .orderBy($"doc_id")
  }

  val curationDecontaminateSql: String =
    ("""WITH """ + DedupOps.shinglesCte + """,
      |bench AS (
      |  SELECT DISTINCT m FROM shingles WHERE doc_id % 97 = 0),
      |rep AS (
      |  SELECT s.doc_id, count(*) AS n_shingles, count(b.m) AS n_contaminated
      |  FROM shingles s LEFT JOIN bench b ON s.m = b.m
      |  WHERE s.doc_id % 97 <> 0
      |  GROUP BY s.doc_id)
      |SELECT doc_id, n_shingles, n_contaminated,
      |       CASE WHEN 20 * n_contaminated >= n_shingles
      |            THEN 'dropped' ELSE 'kept' END AS decision
      |FROM rep
      |ORDER BY doc_id""").stripMargin

  /** Contamination rollup by ingest source
    * (`curation_contamination_by_source`) — the triage view a curation
    * team actually acts on: per `documents.source`, how many documents
    * the decontamination rule drops and what fraction of the source's
    * shingles hit the benchmark set. A scrape with a high rate gets its
    * pipeline fixed; per-document rows can't show that.
    *
    * Shape: composes the per-document report unchanged (same shared
    * cached shingle stage), joins the doc-level `source` label on
    * doc_id (hash-partitioned equi-join — doc-count-proportional, never
    * shingle-proportional), then one tiny groupBy over the handful of
    * sources. All ratios are exact-integer divisions, bit-stable across
    * engines. Benchmark stand-in documents (doc_id % 97 = 0) are not in
    * the report, so each source counts only its scoreable documents. */
  def contaminationBySource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = curationDecontaminate(spark, dir)
    val src = Tables.documents(spark, dir).select($"doc_id", $"source")
    dec.join(src, "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"decision" === "dropped", 1L).otherwise(0L)).as("n_dropped"),
        sum($"n_contaminated").as("n_contaminated_shingles"),
        sum($"n_shingles").as("n_shingles"))
      .select($"source", $"n_docs", $"n_dropped",
        ($"n_dropped".cast("double") / $"n_docs").as("drop_rate"),
        ($"n_contaminated_shingles".cast("double") / $"n_shingles")
          .as("shingle_rate"))
      .orderBy($"source")
  }

  val contaminationBySourceSql: String =
    ("""WITH """ + DedupOps.shinglesCte + """,
      |bench AS (
      |  SELECT DISTINCT m FROM shingles WHERE doc_id % 97 = 0),
      |rep AS (
      |  SELECT s.doc_id, count(*) AS n_shingles, count(b.m) AS n_contaminated
      |  FROM shingles s LEFT JOIN bench b ON s.m = b.m
      |  WHERE s.doc_id % 97 <> 0
      |  GROUP BY s.doc_id)
      |SELECT d.source,
      |  count(*) AS n_docs,
      |  CAST(sum(CASE WHEN 20 * r.n_contaminated >= r.n_shingles
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |  CAST(CAST(sum(CASE WHEN 20 * r.n_contaminated >= r.n_shingles
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
      |    / count(*) AS drop_rate,
      |  CAST(CAST(sum(r.n_contaminated) AS BIGINT) AS DOUBLE)
      |    / CAST(sum(r.n_shingles) AS BIGINT) AS shingle_rate
      |FROM rep r JOIN documents d USING (doc_id)
      |GROUP BY d.source
      |ORDER BY d.source""").stripMargin

  /** Sequence packing: greedily pack documents into fixed 2048-token
    * training sequences by cumulative token count, independently per
    * source. The window is partitioned by source (bounded per-partition
    * state, no global sort) — exactly how a 1000-executor packing job
    * runs: each shard packs its own documents, and sequence ids are local
    * to the shard. One shuffle on source, one window pass, one
    * aggregation. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ROWS frame pinned explicitly to match the oracle SQL: the default
    // RANGE frame sums tied order keys together, which diverges from
    // ROWS the moment doc_id is ever non-unique within a source.
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select($"source", $"doc_id",
        size(split($"text", " ")).cast("bigint").as("n_tok"))
      .withColumn("cum", sum($"n_tok").over(w))
      .withColumn("seq_id", floor(($"cum" - $"n_tok") / lit(2048.0)))
      .groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("seq_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"source", $"seq_id")
  }

  val packSequencesSql: String =
    """WITH toks AS (
      |  SELECT source, doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |cum AS (
      |  SELECT source, doc_id, n_tok,
      |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
      |                          ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM toks)
      |SELECT source, CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS seq_id,
      |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM cum
      |GROUP BY source, seq_id
      |ORDER BY source, seq_id""".stripMargin

  /** Dedup-aware sequence packing (`pack_sequences_deduped`) — the full
    * curate → dedup → pack training-data path as one query: the chunker's
    * output is chunk-deduplicated (each distinct chunk keeps its earliest
    * (doc_id, chunk_idx) occurrence, exactly `dedup_chunks`' keep rule),
    * and the SURVIVING chunks are greedily packed into 2048-token
    * training sequences per source — so duplicated boilerplate is paid
    * for once in the training mix instead of once per copy.
    *
    * Plan shape: one hash aggregate keyed by chunk_hash (the dedup), one
    * hash join to documents for the source column (doc_id-keyed, never
    * corpus-proportional on the build side), one per-source window and
    * one final aggregation — the same bounded-state shape as
    * [[packSequences]], with the dedup folded in as a single extra
    * shuffle whose key cardinality is the distinct-chunk count. */
  def packSequencesDeduped(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keepers = TextOps.chunkKeepers(spark, dir)
    val src = Tables.documents(spark, dir).select($"doc_id", $"source")
    // ROWS frame pinned for the same RANGE-vs-ROWS tie divergence noted
    // in [[packSequences]]; (doc_id, chunk_idx) is unique over keepers,
    // so the order below is total
    val w = Window.partitionBy($"source").orderBy($"doc_id", $"chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keepers.join(src, "doc_id")
      .withColumn("cum", sum($"n_chunk_tokens").over(w))
      .withColumn("seq_id", floor(($"cum" - $"n_chunk_tokens") / lit(2048.0)))
      .groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("n_chunks"), sum($"n_chunk_tokens").as("seq_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"source", $"seq_id")
  }

  val packSequencesDedupedSql: String =
    s"""WITH ${TextOps.chunksCte},
       |${TextOps.chunkKeepersCte},
       |cum AS (
       |  SELECT d.source, k.doc_id, k.chunk_idx, k.n_chunk_tokens,
       |         sum(k.n_chunk_tokens) OVER (PARTITION BY d.source
       |             ORDER BY k.doc_id, k.chunk_idx
       |             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM keepers k JOIN documents d USING (doc_id))
       |SELECT source, CAST(floor((cum - n_chunk_tokens) / 2048.0) AS BIGINT) AS seq_id,
       |       count(*) AS n_chunks, CAST(sum(n_chunk_tokens) AS BIGINT) AS seq_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum
       |GROUP BY source, seq_id
       |ORDER BY source, seq_id""".stripMargin

  /** Per-domain quota sampling: keep at most 10 documents per source,
    * chosen by md5(doc_id) rank — the domain-balancing pass that stops a
    * single crawl domain from dominating the training mix. Deterministic
    * (same kept set on any engine or partitioning); one window per
    * source partition, bounded by the quota. */
  def sampleDomainQuota(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    Tables.documents(spark, dir)
      .select($"source", $"doc_id")
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 10)
      .orderBy($"source", $"rk")
  }

  val sampleDomainQuotaSql: String =
    """SELECT source, doc_id, rk FROM (
      |  SELECT source, doc_id, row_number() OVER (
      |    PARTITION BY source
      |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents) t
      |WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin

  /** PII-style scrubbing with an audit trail: redact every digit in the
    * event properties payload (stand-in for the digit-bearing PII classes
    * — phone numbers, account ids) and report how many characters were
    * redacted per event. Pure narrow map — a single codegen'd
    * RegExpReplace builds the scrubbed payload and a RegExpCount (match
    * counting, no replacement-string allocation) derives the audit count;
    * no shuffle before the output sort. The 100 TB shape is a map-only
    * pass with the audit aggregated downstream. */
  def eventsPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        regexp_replace($"props", "[0-9]", "#").as("scrubbed"),
        regexp_count($"props", lit("[0-9]")).cast("bigint").as("n_redacted"))
      .orderBy($"event_id")
  }

  val eventsPiiScrubSql: String =
    """SELECT event_id,
      |       regexp_replace(props, '[0-9]', '#', 'g') AS scrubbed,
      |       CAST(len(regexp_extract_all(props, '[0-9]')) AS BIGINT) AS n_redacted
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Domain mixture weighting (DoReMi-style prep): per-source document
    * and token counts, the source's token share, and a sqrt-share
    * sampling weight — the numbers a mixture-balancing pass feeds the
    * sampler so no single crawl domain dominates the training mix. The
    * weight is left UN-normalized: token counts are exact BIGINTs, share
    * is one int/int division and sqrt is IEEE-deterministic, whereas
    * normalizing would sum doubles in engine-dependent order. Shape: one
    * narrow projection, one hash agg keyed by source, one broadcast
    * 1-row total. */
  def domainMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, dir)
      .select($"source", size(split($"text", " ")).cast("bigint").as("n_tok"))
    val grouped = perDoc.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
    // total derived from the GROUPED side (sum of 20 group sums, exact
    // BIGINT), not from a second pass over perDoc: both branches hang off
    // the identical groupBy exchange, so ReuseExchange leaves ONE corpus
    // scan where a perDoc-side total would force two
    val total = grouped.agg(sum($"n_tokens").as("total_tokens"))
    grouped
      .crossJoin(broadcast(total))
      .select($"source", $"n_docs", $"n_tokens",
        ($"n_tokens".cast("double") / $"total_tokens".cast("double")).as("token_share"),
        sqrt($"n_tokens".cast("double") / $"total_tokens".cast("double")).as("sample_weight"))
      .orderBy($"source")
  }

  val domainMixtureSql: String =
    """WITH perdoc AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total_tokens FROM perdoc)
      |SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_tok) AS DOUBLE) / (SELECT CAST(total_tokens AS DOUBLE) FROM tot) AS token_share,
      |       sqrt(CAST(sum(n_tok) AS DOUBLE) / (SELECT CAST(total_tokens AS DOUBLE) FROM tot)) AS sample_weight
      |FROM perdoc
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** Length-bucket batching stats: documents binned into fixed 32-token
    * buckets (integer arithmetic — no float log2, which is not bit-stable
    * across engines at bucket boundaries), with the padding waste a
    * batcher would pay padding every doc in the bucket to the bucket
    * ceiling. The padding-efficiency audit behind length-grouped
    * batching. Narrow map + one hash agg; bucket cardinality is bounded
    * by max document length / 32. */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(size(split($"text", " ")).cast("bigint").as("n_tok"))
      .select($"n_tok", (expr("(n_tok + 31) div 32") * 32L).as("bucket_ceil"))
      .groupBy($"bucket_ceil")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").as("sum_tokens"),
        sum($"bucket_ceil" - $"n_tok").as("sum_padding"))
      .select($"bucket_ceil", $"n_docs", $"sum_tokens", $"sum_padding",
        ($"sum_padding".cast("double") /
          ($"bucket_ceil" * $"n_docs").cast("double")).as("waste_frac"))
      .orderBy($"bucket_ceil")
  }

  val lengthBucketsSql: String =
    """WITH perdoc AS (
      |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |b AS (SELECT n_tok, ((n_tok + 31) // 32) * 32 AS bucket_ceil FROM perdoc)
      |SELECT CAST(bucket_ceil AS BIGINT) AS bucket_ceil, count(*) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
      |       CAST(sum(bucket_ceil - n_tok) AS BIGINT) AS sum_padding,
      |       CAST(sum(bucket_ceil - n_tok) AS DOUBLE)
      |         / CAST(bucket_ceil * count(*) AS DOUBLE) AS waste_frac
      |FROM b
      |GROUP BY bucket_ceil
      |ORDER BY bucket_ceil""".stripMargin

  /** Composite quality gate (`curation_quality_gate`) — the keep/drop
    * verdict a curation pipeline attaches to every document before the
    * training extract, with the FIRST failing rule as the audit reason:
    * too_short (< 20 tokens), too_long (> 5000), repetitive (top token
    * above 20% of mass), low_diversity (type/token ratio below 0.3),
    * else ok. Every threshold is evaluated as an exact integer
    * cross-multiply (`top_count·5 > n_tokens`, `n_distinct·10 <
    * n_tokens·3`) — no doubles anywhere near the verdict, so the gate is
    * bit-identical on any engine or partitioning. Documents with zero
    * tokens survive the left join with zeroed stats and gate as
    * too_short rather than vanishing.
    *
    * Plan shape: the same two chained hash aggregations as
    * [[qualityRepetitionScore]] plus one doc_id-keyed join back to the
    * corpus spine — at 100 TB the verdict is a narrow map over the
    * aggregate, and downstream consumers read `keep` as a pushed-down
    * filter. */
  /** The gate's per-document token statistics — shared by
    * [[curationQualityGate]] (which left-joins them to the corpus spine
    * so zero-token docs still get a verdict) and
    * [[curationTrainingExtract]] (which filters the keep thresholds
    * directly on the aggregate, spine-free, since kept docs always have
    * stats). */
  private def tokenGateStats(spark: SparkSession, dir: String): DataFrame =
    // r17: memoized + PERSISTED shared stage (`token_stats` ledger line).
    // Five consumers recomputed the tokenize + two-aggregation chain from
    // scratch (repetition score, quality gate, both training extracts,
    // and the funnel via the gate) — at sf3 the funnel alone re-ran it
    // inside its 93.6 CPU-s plan. The cached table is ONE skinny row per
    // document (4 longs), so the persist is doc-count-bounded — the same
    // budget class as shingle_sets — and every consumer now reads the
    // aggregation instead of re-exploding the token stream. Guide §2.4
    // (share one exchange), §5 (cache only what is reused and bounded).
    DedupOps.cachedDf(spark, s"tokstats:$dir") {
      import spark.implicits._
      Tables.documents(spark, dir)
        .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
        .filter($"token" =!= "")
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("c"))
        .groupBy($"doc_id")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          max($"c").as("top_count"))
        .persist()
    }

  /** Bench/registry accessor for the shared token-stats stage. */
  private[graft] def tokenStatsStage(spark: SparkSession, dir: String): DataFrame =
    tokenGateStats(spark, dir)

  /** Memoized + PERSISTED per-document contamination counts
    * `(doc_id, n_shingles, n_contaminated)` — the `rep` table four
    * consumers previously recomputed end-to-end (the overlap report, the
    * decontamination decision, the by-source rollup, and the funnel):
    * each re-ran the corpus-shingle ⋈ benchmark-shingle join + per-doc
    * aggregation (~10 CPU-s each at sf0.1, shingle-stream-sized at
    * scale). One skinny row per scoreable document, so the persist is
    * doc-count-bounded. Guide §2.4. */
  private[graft] def decontamStats(spark: SparkSession, dir: String): DataFrame =
    DedupOps.cachedDf(spark, s"decontam:$dir") {
      import spark.implicits._
      val sh = DedupOps.sharedShingles(spark, dir)
      val bench = sh.filter($"doc_id" % 97 === 0)
        .select($"m").distinct().withColumn("hit", lit(1))
      sh.filter($"doc_id" % 97 =!= 0)
        .join(bench, Seq("m"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"), count($"hit").as("n_contaminated"))
        .persist()
    }

  def curationQualityGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val stats = tokenGateStats(spark, dir)
    val reason =
      when($"n_tokens" < 20, "too_short")
        .when($"n_tokens" > 5000, "too_long")
        .when($"top_count" * 5 > $"n_tokens", "repetitive")
        .when($"n_distinct" * 10 < $"n_tokens" * 3, "low_diversity")
        .otherwise("ok")
    Tables.documents(spark, dir).select($"doc_id")
      .join(stats, Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        coalesce($"n_distinct", lit(0L)).as("n_distinct"),
        coalesce($"top_count", lit(0L)).as("top_count"))
      .withColumn("reason", reason)
      .withColumn("keep", $"reason" === "ok")
      .orderBy($"doc_id")
  }

  val curationQualityGateSql: String =
    """WITH cnt AS (
      |  SELECT doc_id, token, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |    FROM documents) t
      |  WHERE token <> '' GROUP BY doc_id, token),
      |agg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |         count(*) AS n_distinct, max(c) AS top_count
      |  FROM cnt GROUP BY doc_id),
      |j AS (
      |  SELECT d.doc_id,
      |         coalesce(a.n_tokens, 0) AS n_tokens,
      |         CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
      |         CAST(coalesce(a.top_count, 0) AS BIGINT) AS top_count
      |  FROM documents d LEFT JOIN agg a USING (doc_id)),
      |v AS (
      |  SELECT doc_id, n_tokens, n_distinct, top_count,
      |         CASE WHEN n_tokens < 20 THEN 'too_short'
      |              WHEN n_tokens > 5000 THEN 'too_long'
      |              WHEN top_count * 5 > n_tokens THEN 'repetitive'
      |              WHEN n_distinct * 10 < n_tokens * 3 THEN 'low_diversity'
      |              ELSE 'ok' END AS reason
      |  FROM j)
      |SELECT doc_id, n_tokens, n_distinct, top_count, reason,
      |       reason = 'ok' AS keep
      |FROM v
      |ORDER BY doc_id""".stripMargin

  /** The full curation pipeline as ONE declarative plan
    * (`curation_training_extract`): quality-gate the corpus (keep only
    * `reason = 'ok'` documents), exact-dedup the keepers (earliest
    * doc_id per normalized content hash), restrict to the deterministic
    * `train` split, and greedily pack the survivors into 2048-token
    * sequences per source — i.e. gate → dedup → split → pack, the
    * end-to-end path a training-data extract actually runs, expressed as
    * a single Catalyst plan so the optimizer can pipeline the stages
    * (the gate's token aggregate feeds the packer's weights without a
    * second tokenize pass).
    *
    * Plan shape at 100 TB: two chained token aggregations (gate), one
    * min-over-content-hash window (dedup — a window, not a groupBy +
    * semi join back, which would make Catalyst expand the gate subtree
    * twice), one narrow md5-bucket filter (split), one per-source window
    * and a final aggregation (pack). Every shuffle keys on doc_id, the
    * content hash, or source; nothing broadcasts a corpus-proportional
    * side; documents is scanned exactly twice (token stream + spine),
    * plan-asserted in OperatorSpec. */
  def curationTrainingExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the oracle's `kept` CTE verbatim: keep thresholds directly on the
    // token aggregate — no corpus-spine left join (kept docs always have
    // stats), so the whole extract scans documents exactly twice
    val kept = tokenGateStats(spark, dir)
      .filter($"n_tokens" >= 20 && $"n_tokens" <= 5000 &&
        $"top_count" * 5 <= $"n_tokens" &&
        $"n_distinct" * 10 >= $"n_tokens" * 3)
      .select($"doc_id", $"n_tokens")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", md5(lower($"text")).as("content_hash"))
    val gated = kept.join(docs, "doc_id")
    // keep-earliest among the GATED docs (dedup after gating, so a
    // dropped low-id copy cannot shadow a kept duplicate). Expressed as
    // a min-over-hash WINDOW rather than a groupBy + semi join back:
    // the self-join form makes Catalyst expand the whole gate subtree
    // TWICE (verified in the physical plan — six scans instead of two);
    // the window is one extra content_hash shuffle over a single
    // instance of the gated stream.
    val train = gated
      .withColumn("keep_id",
        min($"doc_id").over(Window.partitionBy($"content_hash")))
      .filter($"doc_id" === $"keep_id" && trainBucket)
    packBySource(train)
  }

  /** The deterministic 90% train-bucket predicate shared by both extract
    * variants (salted md5 over doc_id — see [[curationTrainValTest]]). */
  private def trainBucket: Column =
    (conv(substring(md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 8), 16, 10)
      .cast("long") % 100) < 90

  /** The greedy 2048-token per-source packing tail shared by both
    * extract variants: per-source running token sum → sequence id →
    * bounded per-(source, seq) aggregation. `train` carries
    * (source, doc_id, n_tokens). */
  private def packBySource(train: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    train
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("seq_id", floor((col("cum") - col("n_tokens")) / lit(2048.0)))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("seq_id"))
  }

  /** The NEAR-DUP form of the end-to-end extract
    * (`curation_training_extract_neardup`): same gate → dedup → split →
    * pack pipeline, but the dedup stage drops MinHash near-duplicates —
    * every document that sits in a connected component of the
    * est-Jaccard ≥ 0.5 candidate graph and is NOT that component's
    * canonical member ([[PipelineOps.dedupCanonicalPick]]'s longest-
    * content, smallest-id rule) — instead of only exact content-hash
    * copies. This closes the loop the dedup family already computes:
    * the extract now drops what `dedup_minhash_lsh` +
    * `dedup_connected_components` + `dedup_canonical_pick` decided,
    * which subsumes exact dups (identical content collides in every
    * MinHash band).
    *
    * Composition choice, stated: the near-dup component structure (and
    * each component's canonical) is computed over the WHOLE corpus, and
    * the quality gate then filters the keeper set — so a canonical that
    * fails the gate does not resurrect its dropped near-dups. That
    * matches how production pipelines sequence global dedup before
    * per-document filtering, and keeps this extract consistent with the
    * standalone `dedup_canonical_pick` decisions.
    *
    * Plan shape at 100 TB: everything the exact variant does, plus the
    * CC label set (proportional to the DUPLICATE set, not the corpus)
    * anti-joined on doc_id against the gated stream — a hash anti-join
    * on the key, no new corpus-wide shuffle; the pack tail is shared
    * code. */
  def curationTrainingExtractNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kept = tokenGateStats(spark, dir)
      .filter($"n_tokens" >= 20 && $"n_tokens" <= 5000 &&
        $"top_count" * 5 <= $"n_tokens" &&
        $"n_distinct" * 10 >= $"n_tokens" * 3)
      .select($"doc_id", $"n_tokens")
    val docs = Tables.documents(spark, dir).select($"doc_id", $"source")
    val gated = kept.join(docs, "doc_id")
    // non-canonical members of near-dup components — the drop set
    val drops = PipelineOps.dedupCanonicalPick(spark, dir)
      .filter(!$"keep").select($"doc_id")
    val train = gated
      .join(drops, Seq("doc_id"), "left_anti")
      .filter(trainBucket)
    packBySource(train)
  }

  val curationTrainingExtractNearDupSql: String =
    s"""${PipelineOps.ccCtes},
       |labeled AS (
       |  SELECT cc.doc_id, cc.comp_id, d.n_chars
       |  FROM cc JOIN documents d USING (doc_id)),
       |canon AS (
       |  SELECT comp_id, doc_id AS canonical_id,
       |         row_number() OVER (PARTITION BY comp_id
       |                            ORDER BY n_chars DESC, doc_id) AS rn
       |  FROM labeled),
       |drops AS (
       |  SELECT l.doc_id
       |  FROM labeled l JOIN canon c ON l.comp_id = c.comp_id AND c.rn = 1
       |  WHERE l.doc_id <> c.canonical_id),
       |cnt AS (
       |  SELECT doc_id, token, count(*) AS c FROM (
       |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
       |    FROM documents) t
       |  WHERE token <> '' GROUP BY doc_id, token),
       |agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |         count(*) AS n_distinct, max(c) AS top_count
       |  FROM cnt GROUP BY doc_id),
       |kept AS (
       |  SELECT doc_id, n_tokens FROM agg
       |  WHERE n_tokens >= 20 AND n_tokens <= 5000
       |    AND top_count * 5 <= n_tokens
       |    AND n_distinct * 10 >= n_tokens * 3),
       |gated AS (
       |  SELECT k.doc_id, k.n_tokens, d.source
       |  FROM kept k JOIN documents d USING (doc_id)),
       |train AS (
       |  SELECT g.source, g.doc_id, g.n_tokens
       |  FROM gated g LEFT JOIN drops dr ON dr.doc_id = g.doc_id
       |  WHERE dr.doc_id IS NULL
       |    AND CAST(concat('0x', substr(md5(CAST(g.doc_id AS VARCHAR) || ':split'), 1, 8))
       |             AS BIGINT) % 100 < 90),
       |cum AS (
       |  SELECT source, doc_id, n_tokens,
       |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                             ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM train)
       |SELECT source, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_id,
       |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum
       |GROUP BY source, seq_id
       |ORDER BY source, seq_id""".stripMargin

  val curationTrainingExtractSql: String =
    """WITH cnt AS (
      |  SELECT doc_id, token, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |    FROM documents) t
      |  WHERE token <> '' GROUP BY doc_id, token),
      |agg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |         count(*) AS n_distinct, max(c) AS top_count
      |  FROM cnt GROUP BY doc_id),
      |kept AS (
      |  SELECT doc_id, n_tokens FROM agg
      |  WHERE n_tokens >= 20 AND n_tokens <= 5000
      |    AND top_count * 5 <= n_tokens
      |    AND n_distinct * 10 >= n_tokens * 3),
      |gated AS (
      |  SELECT k.doc_id, k.n_tokens, d.source, md5(lower(d.text)) AS content_hash
      |  FROM kept k JOIN documents d USING (doc_id)),
      |keepers AS (
      |  SELECT min(doc_id) AS doc_id FROM gated GROUP BY content_hash),
      |train AS (
      |  SELECT g.source, g.doc_id, g.n_tokens
      |  FROM gated g JOIN keepers USING (doc_id)
      |  WHERE CAST(concat('0x', substr(md5(CAST(g.doc_id AS VARCHAR) || ':split'), 1, 8))
      |             AS BIGINT) % 100 < 90),
      |cum AS (
      |  SELECT source, doc_id, n_tokens,
      |         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |                             ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM train)
      |SELECT source, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS seq_id,
      |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM cum
      |GROUP BY source, seq_id
      |ORDER BY source, seq_id""".stripMargin

  /** Deterministic train/val/test split assignment
    * (`curation_train_val_test`) — the hold-out step every training
    * pipeline ships: md5 over a SALTED doc key (`doc_id || ':split'`,
    * so the split is independent of the md5 buckets `sample_hash_docs`
    * already consumes) → bucket 0..99 → 90/5/5 train/val/test labels.
    * The assignment is a pure function of doc_id: stable across runs,
    * engines, cluster sizes, and table layout changes — re-partitioning
    * the corpus can never move a document across the contamination
    * boundary.
    *
    * Plan shape: one narrow projection over the scan (no shuffle but the
    * presentation sort); at 100 TB the label costs one md5 per row and
    * the split can be consumed as a pushed-down filter
    * (`WHERE split = 'train'`). */
  def curationTrainValTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id",
        (conv(substring(md5(concat($"doc_id".cast("string"), lit(":split"))), 1, 8), 16, 10)
          .cast("long") % 100).as("bucket"))
      .select($"doc_id", $"bucket",
        when($"bucket" < 90, "train")
          .when($"bucket" < 95, "val")
          .otherwise("test").as("split"))
      .orderBy($"doc_id")
  }

  val curationTrainValTestSql: String =
    """SELECT doc_id, bucket,
      |  CASE WHEN bucket < 90 THEN 'train'
      |       WHEN bucket < 95 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))
      |         AS BIGINT) % 100 AS bucket
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Dataset card (`curation_dataset_card`): the per-(lang, source) summary
    * table a corpus release ships — document/token/char totals, exact
    * p50/p95 document length, chars-per-token, and each cell's share of
    * the corpus token mass. One scan, one (lang, source) hash aggregation
    * (bounded cardinality: |langs|×|sources|), and the corpus total
    * derived from the GROUPED side so ReuseExchange keeps it to one scan
    * (same trick as [[domainMixture]]). Exact `percentile` (not the
    * sketch) is affordable here because each group buffers only its own
    * doc-length multiset — at 100 TB that is per-(lang,source) doc counts,
    * not the corpus; swap to `approx_percentile` only if a single cell
    * holds billions of docs. All doubles are single divisions/interpolations
    * of exact BIGINT aggregates — bit-equal across engines. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, dir)
      .select($"lang", $"source",
        size(split($"text", " ")).cast("bigint").as("n_tok"),
        length($"text").cast("bigint").as("n_chars"))
    val grouped = perDoc.groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        sum($"n_chars").as("sum_chars"),
        expr("percentile(n_tok, array(0.5D, 0.95D))").as("tok_p"))
    val total = grouped.agg(sum($"n_tokens").as("total_tokens"))
    grouped.crossJoin(broadcast(total))
      .select($"lang", $"source", $"n_docs", $"n_tokens", $"sum_chars",
        $"tok_p".getItem(0).as("tok_p50"),
        $"tok_p".getItem(1).as("tok_p95"),
        ($"sum_chars".cast("double") / $"n_tokens".cast("double")).as("chars_per_token"),
        ($"n_tokens".cast("double") / $"total_tokens".cast("double")).as("token_share"))
      .orderBy($"lang", $"source")
  }

  val datasetCardSql: String =
    """WITH perdoc AS (
      |  SELECT lang, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents),
      |grouped AS (
      |  SELECT lang, source, count(*) AS n_docs,
      |    CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |    quantile_cont(n_tok, 0.5) AS tok_p50,
      |    quantile_cont(n_tok, 0.95) AS tok_p95
      |  FROM perdoc GROUP BY lang, source),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM grouped)
      |SELECT lang, source, n_docs, n_tokens, sum_chars, tok_p50, tok_p95,
      |  CAST(sum_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS chars_per_token,
      |  CAST(n_tokens AS DOUBLE) / (SELECT CAST(total_tokens AS DOUBLE) FROM tot)
      |    AS token_share
      |FROM grouped
      |ORDER BY lang, source""".stripMargin

  /** Temperature-resampled language mixture (`curation_lang_temperature`):
    * the α=0.5 exponentiated-smoothing reweighting multilingual training
    * runs use to keep low-resource languages from being drowned out
    * (q_l ∝ p_l^α). α is fixed at 0.5 so the exponentiation is `sqrt` —
    * IEEE-correctly-rounded in every engine, unlike `pow(x, 0.3)` which
    * is only 1-ulp-accurate and not bit-stable across libm
    * implementations. To keep the output bit-equal we also avoid
    * cross-group float sums (partition-order-dependent): each emitted
    * weight is a closed form over exact BIGINT counts —
    * `sample_weight = sqrt(total/n_l) = p_l^{-1/2}` (the unnormalized
    * temperature weight) and `upsample_vs_largest = sqrt(n_max/n_l)`
    * (how much more often language l is sampled than the largest one,
    * under q). One bounded-cardinality aggregation; the total and max
    * are derived from the grouped side (ReuseExchange → one scan). */
  def langTemperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grouped = Tables.documents(spark, dir)
      .select($"lang", size(split($"text", " ")).cast("bigint").as("n_tok"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
    val tot = grouped.agg(sum($"n_tokens").as("total_tokens"),
      max($"n_tokens").as("max_tokens"))
    grouped.crossJoin(broadcast(tot))
      .select($"lang", $"n_docs", $"n_tokens",
        ($"n_tokens".cast("double") / $"total_tokens".cast("double")).as("token_share"),
        sqrt($"total_tokens".cast("double") / $"n_tokens".cast("double")).as("sample_weight"),
        sqrt($"max_tokens".cast("double") / $"n_tokens".cast("double")).as("upsample_vs_largest"))
      .orderBy($"lang")
  }

  val langTemperatureMixtureSql: String =
    """WITH grouped AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |               CAST(max(n_tokens) AS BIGINT) AS max_tokens FROM grouped)
      |SELECT lang, n_docs, n_tokens,
      |  CAST(n_tokens AS DOUBLE) / (SELECT CAST(total_tokens AS DOUBLE) FROM tot)
      |    AS token_share,
      |  sqrt((SELECT CAST(total_tokens AS DOUBLE) FROM tot) / CAST(n_tokens AS DOUBLE))
      |    AS sample_weight,
      |  sqrt((SELECT CAST(max_tokens AS DOUBLE) FROM tot) / CAST(n_tokens AS DOUBLE))
      |    AS upsample_vs_largest
      |FROM grouped
      |ORDER BY lang""".stripMargin

  /** Epoch/repeat cap for data-constrained training: Muennighoff et al.
    * 2023 ("Scaling Data-Constrained Language Models", arXiv:2305.16264)
    * measure that up to ~4 epochs of repeated data is nearly as good as
    * fresh data, after which returns decay to zero. */
  private val MaxEpochs = 4.0

  /** Budget multiplier: the plan targets 2× the corpus token count —
    * the data-constrained regime where the epoch cap binds for
    * over-weighted low-resource languages. */
  private val BudgetX = 2

  /** Epoch sampling plan (`curation_epoch_plan`) — the step AFTER the
    * [[langTemperatureMixture]] reweighting: given a training token
    * budget ([[BudgetX]] × corpus tokens) and the α=0.5 temperature
    * mixture q_l ∝ √p_l, decide how many EPOCHS of each language to
    * schedule, capped at [[MaxEpochs]] passes (Muennighoff et al. 2023),
    * and report the unfillable deficit the cap leaves. This is the table
    * a data-mixing controller feeds to the sampler: per language, the
    * mixture share, target tokens, raw ideal epochs, capped epochs, the
    * tokens actually allocated, and the shortfall to redistribute.
    *
    * Bit-stability across engines: the only cross-group float reduction
    * (the mixture normalizer Z = Σ_l √n_l) is a SORTED SEQUENTIAL fold —
    * `aggregate(sort_array(collect_list(...)))` here, `list_reduce(list(
    * ... ORDER BY lang))` in the oracle — so both engines add the same
    * doubles in the same order; everything else is a closed form over
    * exact BIGINT counts with a single-rounded op per step (√ is IEEE
    * correctly rounded; mul/div mirror the oracle's tree op for op).
    *
    * Scale shape: one partial+final aggregation over the corpus into a
    * bounded (≤ language-count) key space, a 1-row broadcast of the
    * totals, and per-row arithmetic — the same footprint as the mixture
    * query it extends. */
  def curationEpochPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val grouped = Tables.documents(spark, dir)
      .select($"lang", size(split($"text", " ")).cast("bigint").as("n_tok"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
    val tot = grouped.agg(
      sum($"n_tokens").as("total_tokens"),
      aggregate(
        sort_array(collect_list(struct($"lang", $"n_tokens"))), lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n_tokens").cast("double"))).as("z"))
    val nL     = $"n_tokens".cast("double")
    val target = (lit(BudgetX) * $"total_tokens").cast("double") * sqrt(nL) / $"z"
    val raw    = target / nL
    val capped = least(lit(MaxEpochs), raw)
    val alloc  = capped * nL
    grouped.crossJoin(broadcast(tot))
      .select($"lang", $"n_docs", $"n_tokens",
        round(sqrt(nL) / $"z", 6).as("mix_share"),
        round(target, 2).as("target_tokens"),
        round(raw, 6).as("epochs_raw"),
        round(capped, 6).as("epochs"),
        round(alloc, 2).as("allocated_tokens"),
        round(greatest(lit(0.0), target - alloc), 2).as("deficit_tokens"))
      .orderBy($"lang")
  }

  val curationEpochPlanSql: String =
    """WITH grouped AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang),
      |tot AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |    list_reduce(
      |      list_prepend(CAST(0.0 AS DOUBLE),
      |        list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY lang)),
      |      (a, b) -> a + b) AS z
      |  FROM grouped)
      |SELECT lang, n_docs, n_tokens,
      |  round(sqrt(CAST(n_tokens AS DOUBLE)) / t.z, 6) AS mix_share,
      |  round(CAST(2 * t.total_tokens AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE)) / t.z,
      |        2) AS target_tokens,
      |  round(CAST(2 * t.total_tokens AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE)) / t.z
      |        / CAST(n_tokens AS DOUBLE), 6) AS epochs_raw,
      |  round(least(4.0, CAST(2 * t.total_tokens AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE))
      |        / t.z / CAST(n_tokens AS DOUBLE)), 6) AS epochs,
      |  round(least(4.0, CAST(2 * t.total_tokens AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE))
      |        / t.z / CAST(n_tokens AS DOUBLE)) * CAST(n_tokens AS DOUBLE), 2)
      |    AS allocated_tokens,
      |  round(greatest(CAST(0.0 AS DOUBLE),
      |        CAST(2 * t.total_tokens AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE)) / t.z
      |        - least(4.0, CAST(2 * t.total_tokens AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE))
      |                / t.z / CAST(n_tokens AS DOUBLE)) * CAST(n_tokens AS DOUBLE)), 2)
      |    AS deficit_tokens
      |FROM grouped, tot t
      |ORDER BY lang""".stripMargin

  /** Curation funnel report (`curation_funnel_report`) — the
    * observability view every pipeline run ships: per stage (ingest →
    * quality gate → decontaminate → exact dedup, the
    * `curation_training_extract` order), how many documents entered,
    * survived, and dropped, with an exact-integer per-mille drop rate.
    * This is the table an operator reads to spot a mis-tuned gate or a
    * poisoned crawl before training does.
    *
    * Scale shape: the per-doc pass flags are computed once in a single
    * fused plan (gate stats, decontamination decision, first-per-hash
    * among survivors), then ONE 1-row aggregation counts all four
    * stages simultaneously — the funnel costs one corpus pass + the
    * stages' own joins, not four sequential pipelines; `stack` unpivots
    * the 1-row counts into the 4-stage table (bounded output).
    *
    * The first-survivor-per-hash flag is a window over `content_hash`,
    * not a groupBy + self-join back on the hash (r16: the join form
    * re-executed the ENTIRE gate+decontaminate chain on both sides of
    * the content_hash exchange — the planner cannot exchange-reuse the
    * two subtrees because one carries the extra aggregate — doubling
    * the query's task CPU; one window = one exchange, one pass). */
  def curationFunnelReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val gate = curationQualityGate(spark, dir).select($"doc_id", $"keep")
    val dec = curationDecontaminate(spark, dir)
      .select($"doc_id", $"decision")
    val flagged = Tables.documents(spark, dir)
      .select($"doc_id", md5(lower($"text")).as("content_hash"))
      .join(gate, "doc_id")
      .join(dec, Seq("doc_id"), "left")
      .withColumn("pass_gate", $"keep")
      .withColumn("pass_decont",
        $"pass_gate" && ($"decision".isNull || $"decision" =!= "dropped"))
    val byHash = Window.partitionBy($"content_hash")
    val counts = flagged
      .withColumn("first_id",
        min(when($"pass_decont", $"doc_id")).over(byHash))
      .agg(count(lit(1)).as("n"),
        sum(when($"pass_gate", 1L).otherwise(0L)).as("g"),
        sum(when($"pass_decont", 1L).otherwise(0L)).as("d"),
        sum(when($"pass_decont" && $"doc_id" === $"first_id", 1L)
          .otherwise(0L)).as("u"))
    counts.selectExpr(
      """stack(4,
        |  1, 'ingest',        n, n,
        |  2, 'quality_gate',  n, g,
        |  3, 'decontaminate', g, d,
        |  4, 'exact_dedup',   d, u) AS (stage_ord, stage, docs_in, docs_out)
        |""".stripMargin)
      .select($"stage_ord", $"stage", $"docs_in", $"docs_out",
        ($"docs_in" - $"docs_out").as("dropped"),
        expr("(docs_in - docs_out) * 1000 div greatest(docs_in, 1)")
          .as("drop_permille"))
      .orderBy($"stage_ord")
  }

  val curationFunnelReportSql: String =
    ("""WITH """ + DedupOps.shinglesCte + """,
      |cnt AS (
      |  SELECT doc_id, token, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |    FROM documents) t
      |  WHERE token <> '' GROUP BY doc_id, token),
      |gagg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |         count(*) AS n_distinct, max(c) AS top_count
      |  FROM cnt GROUP BY doc_id),
      |gate AS (
      |  SELECT d.doc_id,
      |    (coalesce(a.n_tokens, 0) >= 20 AND coalesce(a.n_tokens, 0) <= 5000
      |     AND NOT coalesce(a.top_count, 0) * 5 > coalesce(a.n_tokens, 0)
      |     AND NOT coalesce(a.n_distinct, 0) * 10 < coalesce(a.n_tokens, 0) * 3)
      |      AS pass_gate
      |  FROM documents d LEFT JOIN gagg a USING (doc_id)),
      |bench AS (SELECT DISTINCT m FROM shingles WHERE doc_id % 97 = 0),
      |rep AS (
      |  SELECT s.doc_id, count(*) AS n_shingles, count(b.m) AS n_contaminated
      |  FROM shingles s LEFT JOIN bench b ON s.m = b.m
      |  WHERE s.doc_id % 97 <> 0
      |  GROUP BY s.doc_id),
      |flags AS (
      |  SELECT d.doc_id, md5(lower(d.text)) AS content_hash, g.pass_gate,
      |    (g.pass_gate AND NOT coalesce(20 * r.n_contaminated >= r.n_shingles,
      |                                  FALSE)) AS pass_decont
      |  FROM documents d
      |  JOIN gate g USING (doc_id)
      |  LEFT JOIN rep r USING (doc_id)),
      |firsted AS (
      |  -- window formulation, in lockstep with the engine (r17, ADVICE):
      |  -- the old GROUP BY + JOIN USING(content_hash) dropped NULL-hash
      |  -- rows from the funnel counts (equi-join on NULL matches
      |  -- nothing) while the engine's window groups NULLs into one
      |  -- partition — harmless on non-null text, but the formulations
      |  -- must not be able to diverge
      |  SELECT doc_id, pass_gate, pass_decont,
      |         min(CASE WHEN pass_decont THEN doc_id END)
      |           OVER (PARTITION BY content_hash) AS first_id
      |  FROM flags),
      |counts AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN f.pass_gate THEN 1 ELSE 0 END) AS BIGINT) AS g,
      |    CAST(sum(CASE WHEN f.pass_decont THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN f.pass_decont AND f.doc_id = f.first_id
      |             THEN 1 ELSE 0 END) AS BIGINT) AS u
      |  FROM firsted f),
      |funnel AS (
      |  SELECT 1 AS stage_ord, 'ingest' AS stage, n AS docs_in, n AS docs_out FROM counts
      |  UNION ALL SELECT 2, 'quality_gate', n, g FROM counts
      |  UNION ALL SELECT 3, 'decontaminate', g, d FROM counts
      |  UNION ALL SELECT 4, 'exact_dedup', d, u FROM counts)
      |SELECT stage_ord, stage, docs_in, docs_out,
      |  docs_in - docs_out AS dropped,
      |  (docs_in - docs_out) * 1000 // greatest(docs_in, 1) AS drop_permille
      |FROM funnel
      |ORDER BY stage_ord""").stripMargin

  /** Per-source dedup-rate triage (`curation_dedup_rate_by_source`):
    * for every source, its document count, within-source exact-dup mass
    * (docs beyond the first per content hash), the near-dup documents a
    * canonical-pick pass would drop there, and exact-integer per-mille
    * rates — the table that localizes a duplication problem to the
    * crawl/source that produced it (a healthy corpus dups at noise
    * level everywhere; one hot source = a re-crawled or mirrored feed
    * worth fixing upstream instead of paying dedup for forever).
    *
    * Plan shape: one documents pass produces the per-source
    * (count, distinct-content) aggregate; the near-dup side reuses the
    * CC canonical-pick labels (proportional to the CLUSTERED set, not
    * the corpus) joined back to sources by doc_id; the final join is
    * bounded by #sources. Same content hash (`md5(lower(text))`) as
    * [[DedupOps.dedupExactDocs]], same drop decision as
    * [[PipelineOps.dedupCanonicalPick]], so the three reports can never
    * disagree about what "duplicate" means. */
  def curationDedupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val bySource = docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(lower($"text"))).as("n_distinct"))
    val drops = PipelineOps.dedupCanonicalPick(spark, dir)
      .filter(!$"keep")
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .groupBy($"source").agg(count(lit(1)).as("drops"))
    bySource.join(drops, Seq("source"), "left")
      .select($"source", $"n_docs",
        ($"n_docs" - $"n_distinct").as("n_exact_dup"),
        coalesce($"drops", lit(0L)).as("n_neardup_drop"))
      .withColumn("exact_dup_permille",
        expr("n_exact_dup * 1000 div greatest(n_docs, 1)"))
      .withColumn("neardup_permille",
        expr("n_neardup_drop * 1000 div greatest(n_docs, 1)"))
      .orderBy($"source")
  }

  lazy val curationDedupRateBySourceSql: String =
    s"""${PipelineOps.canonicalCtes},
       |drops AS (
       |  SELECT d.source, count(*) AS n_neardup_drop
       |  FROM labeled l
       |  JOIN canon c ON l.comp_id = c.comp_id AND c.rn = 1
       |  JOIN documents d ON d.doc_id = l.doc_id
       |  WHERE l.doc_id <> c.canonical_id
       |  GROUP BY d.source),
       |base AS (
       |  SELECT source, count(*) AS n_docs,
       |         count(DISTINCT md5(lower(text))) AS n_distinct
       |  FROM documents GROUP BY source)
       |SELECT b.source, b.n_docs,
       |  b.n_docs - b.n_distinct AS n_exact_dup,
       |  CAST(coalesce(dr.n_neardup_drop, 0) AS BIGINT) AS n_neardup_drop,
       |  (b.n_docs - b.n_distinct) * 1000 // greatest(b.n_docs, 1)
       |    AS exact_dup_permille,
       |  CAST(coalesce(dr.n_neardup_drop, 0) AS BIGINT) * 1000
       |    // greatest(b.n_docs, 1) AS neardup_permille
       |FROM base b LEFT JOIN drops dr USING (source)
       |ORDER BY b.source""".stripMargin

  /** Snapshot-to-snapshot corpus changelog (`curation_snapshot_diff`):
    * the added/deleted/changed document list between two crawl
    * snapshots — what a lakehouse table diff (Iceberg/Delta snapshot
    * compare) emits, and the input that turns a full recompute into an
    * incremental one (only `changed`+`added` re-enter the
    * dedup/gate/pack pipeline; `deleted` retracts downstream
    * aggregates). The corpus ships as one snapshot, so snapshot B is
    * DERIVED from it by expressions both engines evaluate identically
    * (the [[TextOps.textPiiScrub]] planted-pattern contract): every
    * 103rd doc is deleted, every 101st carries revised content, and
    * every 107th spawns a new doc at id+10⁷ (a doc divisible by both
    * 101 and 103 deletes — deletion wins in both engines by
    * construction).
    *
    * Scale shape: both sides reduce to (doc_id, 16-byte content hash)
    * in narrow codegen'd projections BEFORE the join, so the full-outer
    * hash join on doc_id — co-partitioned for free under id-bucketed
    * storage — moves digests, never text; output is proportional to
    * the CHANGE SET (unchanged rows are filtered pre-sort). */
  def curationSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
    val a = base.select($"doc_id", md5(lower($"text")).as("hash_a"))
    val b = base.filter(pmod($"doc_id", lit(103)) =!= 0)
      .select($"doc_id", md5(lower(
        when(pmod($"doc_id", lit(101)) === 0, concat($"text", lit(" rev2")))
          .otherwise($"text"))).as("hash_b"))
      .union(base.filter(pmod($"doc_id", lit(107)) === 0)
        .select(($"doc_id" + 10000000L).as("doc_id"),
          md5(lower(concat($"text", lit(" new")))).as("hash_b")))
    a.join(b, Seq("doc_id"), "full_outer")
      .select($"doc_id",
        when($"hash_a".isNull, "added")
          .when($"hash_b".isNull, "deleted")
          .when($"hash_a" =!= $"hash_b", "changed")
          .otherwise("unchanged").as("status"))
      .filter($"status" =!= "unchanged")
      .orderBy($"doc_id")
  }

  val curationSnapshotDiffSql: String =
    """WITH a AS (SELECT doc_id, md5(lower(text)) AS hash_a FROM documents),
      |b AS (
      |  SELECT doc_id,
      |    md5(lower(CASE WHEN doc_id % 101 = 0 THEN text || ' rev2'
      |              ELSE text END)) AS hash_b
      |  FROM documents WHERE doc_id % 103 <> 0
      |  UNION ALL
      |  SELECT doc_id + 10000000, md5(lower(text || ' new'))
      |  FROM documents WHERE doc_id % 107 = 0)
      |SELECT doc_id, status FROM (
      |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |    CASE WHEN a.doc_id IS NULL THEN 'added'
      |         WHEN b.doc_id IS NULL THEN 'deleted'
      |         WHEN a.hash_a <> b.hash_b THEN 'changed'
      |         ELSE 'unchanged' END AS status
      |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id) t
      |WHERE status <> 'unchanged'
      |ORDER BY doc_id""".stripMargin

  /** Epoch-plan materialization (`curation_epoch_sample`) — the step
    * after [[curationEpochPlan]]: turn each language's fractional epoch
    * count into a CONCRETE per-document repeat count the dataloader's
    * sampler consumes. Every doc repeats ⌊epochs⌋ times; the fractional
    * remainder becomes a token budget filled greedily by the
    * md5-ranked prefix of the language (reproducible, scan-order-free —
    * the [[sampleDomainQuota]] keying), so Σ repeat·n_tok tracks the
    * plan's allocation to within one document.
    *
    * Determinism across engines: the fractional budget is collapsed to
    * an exact BIGINT (`floor((epochs − ⌊epochs⌋)·n_tokens)`) from the
    * same round-6 epochs value both engines already hash-agree on
    * (`curation_epoch_plan` is oracle-green), and the prefix test
    * compares exact BIGINT cumulative sums against it — no float
    * boundary can flap a row. Scale: the plan side is a bounded
    * per-lang broadcast; the only ordering is a window partitioned by
    * lang (per-group sort, pinned ROWS frame — never a global total
    * order), and rank + cumulative sum share one window sort. */
  def curationEpochSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast("bigint").as("n_tok"))
    val grouped = docs.groupBy($"lang").agg(sum($"n_tok").as("n_tokens"))
    val tot = grouped.agg(
      sum($"n_tokens").as("total_tokens"),
      aggregate(
        sort_array(collect_list(struct($"lang", $"n_tokens"))), lit(0.0),
        (acc, x) => acc + sqrt(x.getField("n_tokens").cast("double"))).as("z"))
    val nL = $"n_tokens".cast("double")
    val plan = grouped.crossJoin(broadcast(tot))
      .select($"lang", $"n_tokens",
        round(least(lit(MaxEpochs),
          (lit(BudgetX) * $"total_tokens").cast("double") * sqrt(nL) / $"z" / nL),
          6).as("epochs"))
      .select($"lang",
        floor($"epochs").cast("bigint").as("base_epochs"),
        expr("cast(floor((epochs - floor(epochs)) * n_tokens) as bigint)")
          .as("frac_tokens"))
    val w = Window.partitionBy($"lang")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    val repeat = $"base_epochs" +
      when($"cum_tok" <= $"frac_tokens", 1L).otherwise(0L)
    docs.join(broadcast(plan), "lang")
      .withColumn("rk", row_number().over(w))
      .withColumn("cum_tok", sum($"n_tok").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"doc_id", $"lang", $"n_tok", $"rk",
        repeat.as("repeat_count"),
        (repeat * $"n_tok").as("planned_tokens"))
      .orderBy($"doc_id")
  }

  val curationEpochSampleSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |grouped AS (
      |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |  FROM docs GROUP BY lang),
      |tot AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |    list_reduce(
      |      list_prepend(CAST(0.0 AS DOUBLE),
      |        list(sqrt(CAST(n_tokens AS DOUBLE)) ORDER BY lang)),
      |      (a, b) -> a + b) AS z
      |  FROM grouped),
      |plan AS (
      |  SELECT lang,
      |    CAST(floor(ep) AS BIGINT) AS base_epochs,
      |    CAST(floor((ep - floor(ep)) * n_tokens) AS BIGINT) AS frac_tokens
      |  FROM (
      |    SELECT lang, n_tokens,
      |      round(least(4.0,
      |        CAST(2 * t.total_tokens AS DOUBLE) * sqrt(CAST(n_tokens AS DOUBLE))
      |          / t.z / CAST(n_tokens AS DOUBLE)), 6) AS ep
      |    FROM grouped, tot t) p),
      |ranked AS (
      |  SELECT doc_id, lang, n_tok,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
      |    sum(n_tok) OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
      |  FROM docs)
      |SELECT r.doc_id, r.lang, r.n_tok, r.rk,
      |  CAST(p.base_epochs
      |       + CASE WHEN r.cum_tok <= p.frac_tokens THEN 1 ELSE 0 END
      |     AS BIGINT) AS repeat_count,
      |  CAST((p.base_epochs
      |        + CASE WHEN r.cum_tok <= p.frac_tokens THEN 1 ELSE 0 END)
      |       * r.n_tok AS BIGINT) AS planned_tokens
      |FROM ranked r JOIN plan p USING (lang)
      |ORDER BY r.doc_id""".stripMargin

  /** (session, dir) → registered probe-function name, so the Bloom build
    * job runs once per session/dir instead of once per query invocation. */
  private val bloomFns = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Bloom-filter decontamination (`curation_decontaminate_bloom`) — the
    * 100 TB form of [[curationDecontaminate]]: instead of joining every
    * corpus shingle against the benchmark shingle table, build ONE
    * Bloom filter over the benchmark keys (bounded by the eval suite,
    * never the corpus; fpp 1%) and probe it with a codegen'd expression
    * ([[graft.functions.BloomMightContain]]) in a map-only pass — the
    * corpus side never shuffles, and the only cross-node traffic is the
    * filter bytes riding the task binary like a broadcast dim. Keys are
    * the shingle md5s truncated to 60 bits (exact-integer `conv`), so
    * probe hashing is a two-hash `mightContainLong`.
    *
    * Approximation contract (why there is NO SQL oracle, like the HLL
    * sketches): false positives only — every exactly-contaminated
    * shingle is flagged (Bloom filters have no false negatives, and the
    * 60-bit truncation maps equal md5s to equal keys), so the dropped
    * set is a SUPERSET of [[curationDecontaminate]]'s and the measured
    * extra-flag rate is bounded by fpp. Both invariants are asserted in
    * OperatorSpec against the exact query. */
  def curationDecontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sh = DedupOps.sharedShingles(spark, dir)
      .select($"doc_id",
        conv(substring(hex($"m"), 1, 15), 16, 10).cast("long").as("h60"))
    val key = s"${System.identityHashCode(spark)}:$dir"
    val fn = bloomFns.computeIfAbsent(key, { _ =>
      val name = "graft_bloom_" + (dir.hashCode.toLong & 0xffffffffL).toHexString
      val bench = sh.filter($"doc_id" % 97 === 0).select($"h60").distinct()
      graft.functions.BloomMightContain.buildAndRegister(
        spark, name, bench, math.max(1L, bench.count()), 0.01)
      name
    })
    sh.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", expr(s"$fn(h60)").as("hit"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"hit", 1L).otherwise(0L)).as("n_flagged"))
      .select($"doc_id", $"n_shingles", $"n_flagged",
        when(lit(20) * $"n_flagged" >= $"n_shingles", "dropped")
          .otherwise("kept").as("decision"))
      .orderBy($"doc_id")
  }

  /** Shard count for [[curationShardManifest]] — 8 output shards, the
    * bounded key space the manifest aggregates into. */
  private val NumShards = 8

  /** Size-balanced shard manifest (`curation_shard_manifest`) — the step
    * between packing and writing: assign every document to one of
    * [[NumShards]] output shards so shard byte-sizes stay balanced, and
    * report the manifest a writer (and its readers) consume: per shard,
    * document count, total/min/max chars, and the balance skew vs the
    * ideal even split. Assignment is longest-processing-time-style
    * round-robin: within each (lang, source) group, docs ranked by
    * (n_chars DESC, doc_id) take shards cyclically — big docs spread
    * first, so each group's contribution to every shard differs by at
    * most one document. The cycle STARTS at an md5-derived per-group
    * offset: without it every group's first (largest) document lands in
    * shard 0, which at many-small-groups corpora concentrates the whole
    * corpus head in one shard.
    *
    * Scale shape: the ONLY ordering is a window partitioned by
    * (lang, source) — a hash-partitioned per-group sort, never a global
    * total order (the naive global-rank formulation serializes the corpus
    * through one partition; this one scales with the widest group). The
    * manifest aggregate has [[NumShards]] keys, and the one cross-shard
    * scalar (the corpus total) is a broadcast 1-row join. All stats are
    * exact BIGINTs; `skew` divides two exact integers per row (round 6
    * absorbs last-ulp libm variance, as everywhere else). */
  def curationShardManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"lang", $"source")
      .orderBy($"n_chars".desc, $"doc_id".asc)
    val off = conv(substring(md5(concat_ws("|", $"lang", $"source")), 1, 6), 16, 10)
      .cast("int")
    val assigned = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .withColumn("shard", pmod(row_number().over(w) - 1 + off, lit(NumShards)))
    val perShard = assigned.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
    val total = perShard.agg(sum($"total_chars").as("corpus_chars"))
    perShard.crossJoin(broadcast(total))
      .select($"shard", $"n_docs", $"total_chars", $"min_chars", $"max_chars",
        round($"total_chars".cast("double") /
          ($"corpus_chars".cast("double") / NumShards), 6).as("skew"))
      .orderBy($"shard")
  }

  val curationShardManifestSql: String =
    s"""WITH assigned AS (
       |  SELECT doc_id, n_chars,
       |    (row_number() OVER (PARTITION BY lang, source
       |                        ORDER BY n_chars DESC, doc_id) - 1
       |     + CAST(concat('0x', substr(md5(lang || '|' || source), 1, 6)) AS BIGINT))
       |    % $NumShards AS shard
       |  FROM documents),
       |per_shard AS (
       |  SELECT shard, count(*) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    min(n_chars) AS min_chars, max(n_chars) AS max_chars
       |  FROM assigned GROUP BY shard),
       |tot AS (SELECT CAST(sum(total_chars) AS BIGINT) AS corpus_chars FROM per_shard)
       |SELECT shard, n_docs, total_chars, min_chars, max_chars,
       |  round(CAST(total_chars AS DOUBLE)
       |        / (CAST(corpus_chars AS DOUBLE) / $NumShards), 6) AS skew
       |FROM per_shard, tot
       |ORDER BY shard""".stripMargin

  /** Model-vs-rules calibration (`curation_model_calibration`): the
    * learned quality classifier's keep-probability bucketed into deciles
    * against the rule gate's verdict on the same documents — per decile,
    * how many docs land there and what fraction the rule gate keeps
    * (exact per-mille). This is the table a pipeline owner reads before
    * swapping the rule gate for the classifier: a well-calibrated model
    * shows gate agreement rising monotonically with prob_keep, and the
    * disagreement deciles are exactly where to spend labeling budget.
    *
    * Scale shape: both inputs are single-pass per-document projections
    * already keyed by doc_id; the calibration itself is one doc_id
    * equi-join plus an 11-bucket agg (decile grid), so the report adds
    * no new corpus-sized shuffle beyond what its two inputs do. Decile
    * via floor(prob·10) is parity-safe: prob_keep is already rounded to
    * 6 dp by the classifier in BOTH engines, so the bucket boundary
    * arithmetic sees identical doubles. */
  def curationModelCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val model = TextOps.textQualityLogreg(spark, dir).select($"doc_id", $"prob_keep")
    val gate = curationQualityGate(spark, dir).select($"doc_id", $"keep")
    model.join(gate, "doc_id")
      .withColumn("prob_decile", floor($"prob_keep" * 10).cast("int"))
      .groupBy($"prob_decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"keep", 1L).otherwise(0L)).as("n_gate_keep"))
      .select($"prob_decile", $"n_docs", $"n_gate_keep",
        expr("(n_gate_keep * 1000) div n_docs").as("gate_keep_permille"))
      .orderBy($"prob_decile")
  }

  /** Composed from the two component oracles verbatim (their ORDER BY
    * stripped), so the calibration oracle can never drift from what
    * `text_quality_logreg` / `curation_quality_gate` individually
    * verify. */
  lazy val curationModelCalibrationSql: String = {
    val m = TextOps.textQualityLogregSql.trim
    val g = curationQualityGateSql.trim
    require(m.endsWith("ORDER BY doc_id") && g.endsWith("ORDER BY doc_id"),
      "component oracles changed shape — recompose the calibration oracle")
    s"""WITH model AS (${m.stripSuffix("ORDER BY doc_id")}),
       |gate AS (${g.stripSuffix("ORDER BY doc_id")}),
       |joined AS (
       |  SELECT CAST(floor(m.prob_keep * 10) AS INT) AS prob_decile, g.keep
       |  FROM model m JOIN gate g ON g.doc_id = m.doc_id)
       |SELECT prob_decile, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_gate_keep,
       |  (CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) * 1000)
       |    // count(*) AS gate_keep_permille
       |FROM joined GROUP BY prob_decile
       |ORDER BY prob_decile""".stripMargin
  }

  /** Pareto front of the corpus on (length, quality)
    * (`curation_pareto_front`): the documents no other document beats on
    * BOTH `len_chars` and `quality_score` — the skyline a curator reads
    * when trading "long context samples" against "clean samples" without
    * committing to a single scalarized score (every point on the front
    * is optimal for SOME weighting of the two objectives).
    *
    * Dominance: B dominates A iff B.len ≥ A.len ∧ B.q ≥ A.q with at
    * least one strict. Equal (len, q) pairs are mutually non-dominating
    * and all kept.
    *
    * Scale shape — the naive skyline is an O(n²) NOT-EXISTS self-join
    * (that IS the oracle, as the semantic spec); the engine instead runs
    * the standard sweep, made distributed in two stages:
    *   1. PRE-FILTER: bucket docs by `len_chars DIV 64`, take per-bucket
    *      max quality (tiny hash agg), suffix-max it over strictly
    *      greater buckets (window over the BOUNDED bucket table), and
    *      keep only docs whose quality beats every strictly-longer
    *      bucket's best. Provably drops only dominated docs (a
    *      strictly-greater bucket implies strictly greater length), and
    *      on non-adversarial data leaves O(buckets · log n) survivors
    *      however large the corpus.
    *   2. EXACT SWEEP on the survivors: two window passes (max quality
    *      over strictly-longer rows via a RANGE frame, max quality
    *      within the same length) — the only un-partitioned sort runs
    *      on the tiny survivor set.
    * Quality doubles come from the same per-row expression tree as
    * `text_quality_score` (bit-equal across engines, no accumulation),
    * so dominance comparisons agree exactly. */
  def curationParetoFront(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val q = TextOps.textQualityScore(spark, dir)
      .select($"doc_id", $"len_chars", $"quality_score")
    val buckets = q.groupBy(($"len_chars" / 64).cast("bigint").as("bucket"))
      .agg(max($"quality_score").as("bq"))
    val wSuffix = Window.orderBy($"bucket".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val suffix = buckets.withColumn("suffix_bq", max($"bq").over(wSuffix))
    val cand = q
      .join(broadcast(suffix),
        ($"len_chars" / 64).cast("bigint") === $"bucket")
      .filter($"suffix_bq".isNull || $"quality_score" > $"suffix_bq")
      .select($"doc_id", $"len_chars", $"quality_score")
    val wLonger = Window.orderBy($"len_chars")
      .rangeBetween(1L, Window.unboundedFollowing)
    val wSame = Window.partitionBy($"len_chars")
    cand
      .withColumn("maxq_longer", max($"quality_score").over(wLonger))
      .withColumn("maxq_same", max($"quality_score").over(wSame))
      .filter(($"maxq_longer".isNull || $"quality_score" > $"maxq_longer") &&
        $"quality_score" === $"maxq_same")
      .select($"doc_id", $"len_chars", $"quality_score")
      .orderBy($"len_chars".desc, $"doc_id")
  }

  /** Oracle = the naive quantified dominance spec (NOT EXISTS), which the
    * bucketed sweep must reproduce exactly. */
  lazy val curationParetoFrontSql: String = {
    val qs = TextOps.textQualityScoreSql.trim
    require(qs.endsWith("ORDER BY doc_id"),
      "text_quality_score oracle changed shape — recompose the pareto oracle")
    s"""WITH q AS (
       |  SELECT doc_id, len_chars, quality_score
       |  FROM (${qs.stripSuffix("ORDER BY doc_id")}) t)
       |SELECT doc_id, len_chars, quality_score
       |FROM q a
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM q b
       |  WHERE b.len_chars >= a.len_chars AND b.quality_score >= a.quality_score
       |    AND (b.len_chars > a.len_chars OR b.quality_score > a.quality_score))
       |ORDER BY len_chars DESC, doc_id""".stripMargin
  }
}
