package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the corpus k-NN graph.
  *
  * [[SimilarityOps.similarityKnnGraph]] materializes every vector's top-3
  * same-cell cosine neighbors; this object treats those edges as a graph
  * and computes the two classic structural signals a curation pipeline
  * reads off it:
  *
  *  - `graph_pagerank_knn` — PageRank (3 unrolled power iterations,
  *    d = 0.85). On a similarity graph, high-rank nodes are the corpus's
  *    "hub" documents — prototypical content that many near-neighbors
  *    point at — and rank-weighted sampling (keep hubs, thin the
  *    periphery) is a published coreset-selection recipe. Complements
  *    [[PipelineOps.dedupConnectedComponents]] (which answers "which docs
  *    are the same") with "which docs are central".
  *  - `graph_triangle_count` — per-node triangle count + local clustering
  *    coefficient. Triangles separate genuinely dense semantic clusters
  *    (template/boilerplate families → candidates for aggressive dedup)
  *    from star-shaped hub neighborhoods that merely share one popular
  *    neighbor; the coefficient is the standard density score.
  *
  * Scale story (100 TB): both run on the memoized [[knnEdges]] stage —
  * out-degree is capped at k = 3, so the edge table is 3n rows however
  * large the corpus.
  *  - PageRank: each iteration is one hash equi-join (edges ⋈ ranks on
  *    src, both sides partitioned by the join key) plus one partial+final
  *    sum keyed by dst — the textbook distributed formulation; no
  *    collect, no window, state is one double per node. Dangling mass is
  *    NOT redistributed (the common "PageRank-lite" used by web-scale
  *    engines when rank ORDER, not a probability simplex, is the
  *    deliverable) — deterministic and cheaper by one global agg per
  *    iteration; documented here so the oracle states the same recursion.
  *  - Triangles: enumeration joins canonically oriented edges (a < b), so
  *    every triangle is generated exactly once. Fan-out per node is
  *    bounded by its undirected degree ≤ 2k + cell co-membership; on a
  *    general (power-law) graph the standard fix is degree-ordered
  *    orientation, which this formulation reduces to when ids are
  *    replaced by (degree, id) ranks.
  *
  * Determinism: edges derive from exact fixed-point cosine
  * ([[SimilarityOps.quantized]]); rank doubles differ across engines only
  * by summation order (≪ 1e-12 relative), and every emitted double is
  * rounded to 1e-6 like the rest of the float surface.
  */
object GraphOps {

  /** Memoized directed k-NN edge list `(src, dst)` — the
    * [[SimilarityOps.similarityKnnGraph]] result persisted once per
    * (session, dir): PageRank replays it 4× (out-degree + 3 iterations)
    * and the triangle pass 3×, so both read the tiny cached 3n-row list
    * instead of re-running the same-cell join. */
  private[operators] def knnEdges(spark: SparkSession, dir: String): DataFrame =
    DedupOps.cachedDf(spark, s"knnedges:$dir") {
      SimilarityOps.similarityKnnGraph(spark, dir)
        .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
        .persist()
    }

  private val Damping = 0.85
  private val Iterations = 3

  /** PageRank over the k-NN graph (`graph_pagerank_knn`): 3 power
    * iterations from the uniform vector, rank reported as the ratio to
    * the uniform rank (scale-free across corpus sizes; 1.0 = average).
    * r₀ = 1/N;  rₖ₊₁(v) = (1−d)/N + d·Σ_{u→v} rₖ(u)/outdeg(u). */
  def graphPagerankKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nodes = SimilarityOps.quantized(spark, dir).select($"vec_id")
    val edges = knnEdges(spark, dir)
    val outdeg = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val edgesN = edges.join(outdeg, "src")
    val tot = nodes.agg(count(lit(1)).as("n_total"))
    val r0 = nodes.crossJoin(broadcast(tot))
      .select($"vec_id", (lit(1.0) / $"n_total").as("r"))
    val rFinal = (1 to Iterations).foldLeft(r0) { (r, _) =>
      val contrib = edgesN
        .join(r.select($"vec_id".as("src"), $"r"), "src")
        .groupBy($"dst").agg(sum($"r" / $"outdeg").as("c"))
      nodes.join(contrib, $"vec_id" === $"dst", "left").drop("dst")
        .crossJoin(broadcast(tot))
        .select($"vec_id",
          (lit(1.0 - Damping) / $"n_total" +
            lit(Damping) * coalesce($"c", lit(0.0))).as("r"))
    }
    rFinal.crossJoin(broadcast(tot))
      .select($"vec_id", round($"r" * $"n_total", 6).as("rank_ratio"))
      .orderBy($"rank_ratio".desc, $"vec_id")
  }

  lazy val graphPagerankKnnSql: String = {
    // unrolled power iterations as chained CTEs (same recursion as the
    // Spark fold; DuckDB has no mutable iteration either)
    val iters = (1 to Iterations).map { k =>
      s"""c$k AS (
         |  SELECT e.dst, sum(r.r / e.outdeg) AS c
         |  FROM edges e JOIN r${k - 1} r ON r.vec_id = e.src
         |  GROUP BY e.dst),
         |r$k AS (
         |  SELECT nd.vec_id,
         |         ${1.0 - Damping} / (SELECT n_total FROM tot)
         |           + $Damping * coalesce(c$k.c, 0.0) AS r
         |  FROM nodes nd LEFT JOIN c$k ON c$k.dst = nd.vec_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${SimilarityOps.knnEdgesCte},
       |nodes AS (SELECT vec_id FROM n),
       |tot AS (SELECT count(*) AS n_total FROM nodes),
       |outdeg AS (SELECT vec_id AS src, count(*) AS outdeg FROM knn GROUP BY vec_id),
       |edges AS (
       |  SELECT k.vec_id AS src, k.neighbor_id AS dst, o.outdeg
       |  FROM knn k JOIN outdeg o ON o.src = k.vec_id),
       |r0 AS (
       |  SELECT vec_id, 1.0 / (SELECT n_total FROM tot) AS r FROM nodes),
       |$iters
       |SELECT vec_id,
       |       round(r * (SELECT n_total FROM tot), 6) AS rank_ratio
       |FROM r$Iterations
       |ORDER BY rank_ratio DESC, vec_id""".stripMargin
  }

  /** Per-node triangle count + local clustering coefficient
    * (`graph_triangle_count`). Edges are canonically oriented (a < b) so
    * the 3-way join emits each triangle exactly once; the coefficient is
    * 2T / (deg·(deg−1)), 0 when deg < 2. Every node appears (isolated
    * vectors report 0/0/0.0), so the report doubles as a degree table. */
  def graphTriangleCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nodes = SimilarityOps.quantized(spark, dir).select($"vec_id")
    val edges = knnEdges(spark, dir)
    val und = edges
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct()
    val deg = und.select($"a".as("v")).union(und.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("degree"))
    val tri = und.as("e1")
      .join(und.as("e2"), $"e2.a" === $"e1.b")
      .join(und.as("e3"), $"e3.a" === $"e1.a" && $"e3.b" === $"e2.b")
      .select($"e1.a".as("ta"), $"e1.b".as("tb"), $"e2.b".as("tc"))
    val tcount = tri.select($"ta".as("v"))
      .union(tri.select($"tb".as("v")))
      .union(tri.select($"tc".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("triangles"))
    nodes
      .join(deg, $"vec_id" === deg("v"), "left").drop(deg("v"))
      .join(tcount, $"vec_id" === tcount("v"), "left").drop(tcount("v"))
      .select($"vec_id",
        coalesce($"degree", lit(0L)).as("degree"),
        coalesce($"triangles", lit(0L)).as("triangles"))
      .withColumn("clustering",
        when($"degree" >= 2,
          round(lit(2.0) * $"triangles" / ($"degree" * ($"degree" - lit(1.0))), 6))
          .otherwise(lit(0.0)))
      .orderBy($"vec_id")
  }

  lazy val graphTriangleCountSql: String =
    s"""WITH ${SimilarityOps.knnEdgesCte},
       |und AS (
       |  SELECT DISTINCT least(vec_id, neighbor_id) AS a,
       |                  greatest(vec_id, neighbor_id) AS b
       |  FROM knn),
       |deg AS (
       |  SELECT v, count(*) AS degree FROM (
       |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) u
       |  GROUP BY v),
       |tri AS (
       |  SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
       |  FROM und e1
       |  JOIN und e2 ON e2.a = e1.b
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       |tcount AS (
       |  SELECT v, count(*) AS triangles FROM (
       |    SELECT ta AS v FROM tri UNION ALL SELECT tb AS v FROM tri
       |    UNION ALL SELECT tc AS v FROM tri) u
       |  GROUP BY v)
       |SELECT nd.vec_id,
       |       coalesce(deg.degree, 0) AS degree,
       |       coalesce(t.triangles, 0) AS triangles,
       |       CASE WHEN coalesce(deg.degree, 0) >= 2
       |            THEN round(2.0 * coalesce(t.triangles, 0)
       |                       / (deg.degree * (deg.degree - 1.0)), 6)
       |            ELSE 0.0 END AS clustering
       |FROM (SELECT vec_id FROM n) nd
       |LEFT JOIN deg ON deg.v = nd.vec_id
       |LEFT JOIN tcount t ON t.v = nd.vec_id
       |ORDER BY nd.vec_id""".stripMargin
}
