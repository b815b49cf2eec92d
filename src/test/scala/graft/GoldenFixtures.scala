package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Golden-file fixtures for the DETERMINISTIC no-oracle queries (the
  * model-based family: seed-fixed MLlib fits, sign-fixed power
  * iteration, trained quantizers). The driver's DuckDB gate records only
  * a rows>0 check for these, and the ScalaTest invariants pin floors
  * (recall >= x, loss monotone) rather than exact outputs — a committed
  * golden file pins the full output, so any change to the training loop,
  * the seed handling, or the tie-breaking shows up as a diff instead of
  * sliding silently inside the invariant floor (the same hardening the
  * BPE family got from its cross-engine oracle in round 12).
  *
  * Format (one .tsv per query under src/test/resources/golden/):
  *   line 1: `name:type` per column, tab-separated (Catalyst typeName)
  *   rest:   one row per line, values tab-separated, strings escaped,
  *           null as `\N`, doubles via Double.toString (round-trip exact)
  * Rows are sorted by the tuple of NON-floating columns (the integer /
  * string keys every pinned query carries), so the comparison is robust
  * to output-order changes while doubles compare under a tolerance that
  * absorbs partial-aggregation association noise.
  */
object GoldenFixtures {
  /** Queries pinned by a golden file. Every entry must be registered in
    * [[SparkEntry.queries]] and be deterministic at a fixed sf dir. */
  val Pinned: Seq[String] = Seq(
    "text_logreg_train",
    "embedding_pca_project",
    "similarity_ivf_trained",
    "similarity_ivfpq_trained",
    "similarity_recall_report_trained",
    "anomaly_kmeans",
    "dedup_semantic")

  val SfDir = "/root/testdata/sf0.001"

  /** Relative + absolute tolerance for floating columns: wide enough for
    * partial-agg association order (~1e-15 per op, amplified by the
    * 20-iteration logreg loop), far tighter than any invariant floor. */
  def doublesClose(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) ||
      math.abs(a - b) <= 1e-9 + 1e-7 * math.max(math.abs(a), math.abs(b))

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  private def isFloating(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case _ => false
  }

  /** (header line, sorted row lines). Sorting key = the non-floating
    * columns, which must uniquely identify every row (asserted). */
  def serialize(df: DataFrame): (String, Seq[String]) = {
    val schema = df.schema
    val header = schema.fields
      .map(f => s"${f.name}:${f.dataType.typeName}").mkString("\t")
    val rows = df.collect()
    def cell(r: org.apache.spark.sql.Row, i: Int): String =
      if (r.isNullAt(i)) "\\N"
      else schema.fields(i).dataType match {
        case StringType => esc(r.getString(i))
        case _ => r.get(i).toString
      }
    val keyIdx = schema.fields.indices.filterNot(i => isFloating(schema.fields(i).dataType))
    require(keyIdx.nonEmpty, "golden fixture needs at least one non-floating key column")
    val keyed = rows.map { r =>
      val key = keyIdx.map(i => cell(r, i)).mkString("\t")
      val line = schema.fields.indices.map(i => cell(r, i)).mkString("\t")
      (key, line)
    }
    require(keyed.map(_._1).distinct.length == keyed.length,
      "non-floating columns must uniquely key every row for a stable golden sort")
    (header, keyed.sortBy(_._1).map(_._2).toSeq)
  }

  /** Column types parsed from a golden header, for the tolerance split. */
  def headerTypes(header: String): Seq[(String, String)] =
    header.split("\t").toSeq.map { c =>
      val i = c.lastIndexOf(':')
      (c.substring(0, i), c.substring(i + 1))
    }
}
