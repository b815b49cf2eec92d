package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque-binary (multimodal) column plumbing: treat media payloads as
  * `binary` columns with typed metadata, decoded/feature-extracted by
  * imperative per-partition code.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake ([[FakeMediaCodec.decode]]) — but the
  * Spark-side plumbing is real: a `binary` payload column, a
  * `mapPartitions` pass with batched iteration (the Scala analog of a
  * pandas-batch UDF: one codec instance per partition, streamed rows), and
  * a typed output schema. Swapping [[FakeMediaCodec]] for a real codec is
  * the only change needed at production scale.
  *
  * Scale notes: decode is embarrassingly parallel and narrow — no shuffle;
  * partition sizing (`spark.sql.files.maxPartitionBytes`) is the only
  * knob. Metadata-only downstream queries never deserialize the payload
  * (column pruning drops the binary column at the scan).
  */
object MultimodalOps {

  /** Decoded-media metadata row. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

  /** STUB codec: derives metadata deterministically from the payload bytes
    * in place of a real image decode. The arithmetic is mirrored by the
    * DuckDB oracle, which is exactly what makes the plumbing testable
    * without codecs. */
  object FakeMediaCodec {
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      val fmt = (n % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      }
      MediaMeta(docId, n, n % 640, (n * 7) % 480, fmt)
    }
  }

  /** Binary payload column + per-partition decode → typed metadata.
    * The payload is the document text's UTF-8 bytes standing in for real
    * media bytes (same schema shape: `binary` + id). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads
      .mapPartitions { it =>
        // one codec per partition (mirrors per-batch codec reuse in a
        // pandas UDF); rows stream through without materializing
        it.map { case (id, bytes) => FakeMediaCodec.decode(id, bytes) }
      }
      .toDF()
      .orderBy($"doc_id")
  }

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  octet_length(encode(text)) % 640 AS width,
      |  (octet_length(encode(text)) * 7) % 480 AS height,
      |  CASE octet_length(encode(text)) % 3
      |    WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame-sampling plumbing over the payload: deterministic byte-offset
    * "frames" (every 64th byte as an i8 sample) aggregated to a checksum —
    * the shape of audio/video frame extraction without a codec. */
  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          var i = 0
          var n = 0L
          var sum = 0L
          while (i < bytes.length) { sum += (bytes(i) & 0xffL); n += 1; i += 64 }
          (id, n, sum)
        }
      }
      .toDF("doc_id", "n_frames", "frame_checksum")
      .orderBy($"doc_id")
  }

  /** Oracle strides the UTF-8 BYTES of the payload (hex-decode of
    * encode(text), 2 hex chars per byte, stride 128 = 64 bytes), exactly
    * like the Spark side's `bytes(i) & 0xff` — a char-striding oracle
    * would silently diverge on any multi-byte text. */
  val multimodalFrameSampleSql: String =
    """SELECT doc_id,
      |  CAST(len(samples) AS BIGINT) AS n_frames,
      |  CAST(coalesce(list_sum(samples), 0) AS BIGINT) AS frame_checksum
      |FROM (
      |  SELECT doc_id,
      |    [CAST(concat('0x', substr(h, i, 2)) AS INT)
      |     for i in range(1, 2 * nb, 128)] AS samples
      |  FROM (SELECT doc_id, hex(encode(text)) AS h,
      |               octet_length(encode(text)) AS nb
      |        FROM documents) t0) t
      |ORDER BY doc_id""".stripMargin

  /** "Resize" plumbing: downsample every payload to a fixed-size
    * 64-sample thumbnail (stride = ⌊n/64⌋ bytes, the byte-domain stand-in
    * for pixel-domain bilinear resize), emitting the thumbnail length,
    * plain sum, and an order-sensitive weighted checksum — so a permuted
    * or off-by-one-stride "resize" fails the compare. Same shape as a
    * production image-resize pass: narrow `mapPartitions`, one codec per
    * partition, output size constant per row regardless of input size
    * (what makes downstream batch tensors rectangular). */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val stride = math.max(1, n / 64)
          val k = math.min(64, n)
          var i = 0
          var sum = 0L
          var weighted = 0L
          while (i < k) {
            val s = bytes(i * stride) & 0xff
            sum += s
            weighted += s.toLong * (i + 1)
            i += 1
          }
          (id, k.toLong, sum, weighted)
        }
      }
      .toDF("doc_id", "thumb_len", "thumb_sum", "thumb_weighted")
      .orderBy($"doc_id")
  }

  /** Oracle strides the hex-encoded UTF-8 bytes: sample i (1-based)
    * reads the byte at offset (i−1)·stride, i.e. hex position
    * 1 + 2·(i−1)·stride. */
  val multimodalResizeSql: String =
    """SELECT doc_id,
      |  CAST(len(samples) AS BIGINT) AS thumb_len,
      |  CAST(coalesce(list_sum(samples), 0) AS BIGINT) AS thumb_sum,
      |  CAST(coalesce(list_sum(
      |    [samples[i] * i for i in range(1, len(samples) + 1)]), 0) AS BIGINT)
      |    AS thumb_weighted
      |FROM (
      |  SELECT doc_id,
      |    [CAST(concat('0x', substr(h, 1 + 2 * (i - 1) * stride, 2)) AS INT)
      |     for i in range(1, least(64, nb) + 1)] AS samples
      |  FROM (SELECT doc_id, hex(encode(text)) AS h,
      |               octet_length(encode(text)) AS nb,
      |               greatest(1, octet_length(encode(text)) // 64) AS stride
      |        FROM documents) t0) t
      |ORDER BY doc_id""".stripMargin

  /** Raw-media ingest through Spark's `binaryFile` source: stage a
    * sample of document payloads as standalone `<doc_id>.bin` files
    * (executor-side imperative IO — the write path a media pipeline's
    * upstream produces), then read them back as (path, length, content)
    * rows and extract id + size + checksum without ever interpreting the
    * bytes.
    *
    * This is the ingest shape for images/audio at 100 TB: one task per
    * file group, no schema inference, the binary column prunable for
    * metadata-only queries. Here executors write to the shared local
    * tmpfs; on a cluster the staging dir is object storage and the code
    * is unchanged. The `% 37` sample bounds file count — binaryFile is
    * for payloads measured in MB/file, not a row format. */
  def sourceBinaryfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_binfiles").toString
    Tables.documents(spark, dir)
      .filter($"doc_id" % 37 === 0)
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .foreachPartition { (it: Iterator[(Long, Array[Byte])]) =>
        it.foreach { case (id, bytes) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, s"$id.bin"), bytes)
        }
      }
    spark.read.format("binaryFile").load(out + "/*.bin")
      .select(
        regexp_extract($"path", "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        $"length".as("n_bytes"),
        md5($"content").as("checksum"))
      .orderBy($"doc_id")
  }

  /** Oracle recomputes size + md5 from the source text the files were
    * staged from (both engines hash the same UTF-8 bytes). */
  val sourceBinaryfileSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  md5(text) AS checksum
      |FROM documents
      |WHERE doc_id % 37 = 0
      |ORDER BY doc_id""".stripMargin
}
