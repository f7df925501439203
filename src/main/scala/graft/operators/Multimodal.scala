package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Multimodal-column convention: media as opaque `binary` payloads with a
  * typed metadata struct alongside (kind, n_bytes, checksum). The decode /
  * feature-extract stage runs per partition over batches of rows — the
  * Spark-side plumbing (schema, partitioning, batch shape) is real; the
  * byte-level decoder is a STUB (this container ships no image/audio
  * codecs): `FakeCodec.decode` derives deterministic pseudo-features from
  * the payload bytes where a real deployment would invoke an image/audio
  * library per batch.
  *
  * Scale: payloads never shuffle — metadata extraction and feature
  * aggregation happen map-side; only (id, features) rows move. For 100 TB
  * of media you would additionally store payloads out-of-line (object
  * store) and carry URIs + byte ranges in the column.
  */
object Multimodal extends QueryModule {

  /** STUB decoder — deterministic stand-in for an image/audio codec. */
  object FakeCodec {
    /** "Decode" a payload into (width, height, mean-byte) pseudo-metadata. */
    def decode(bytes: Array[Byte]): (Int, Int, Double) = {
      if (bytes.isEmpty) return (0, 0, 0.0)
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
      val w = 64 + (bytes.length % 512)
      val h = 64 + ((bytes(0) & 0xff) % 512)
      (w, h, sum.toDouble / bytes.length)
    }
  }

  case class Media(media_id: Long, kind: String, payload: Array[Byte])

  /** Metadata pass over binary payloads — oracle-checked (byte length and
    * first-byte code are format-independent). */
  val qMeta: QueryDef = QueryDef(
    "q93_multimodal_meta",
    (s, d) => {
      import s.implicits._
      Tables.df(s, d, "documents")
        .select($"doc_id".as("media_id"),
          lit("text/plain").as("kind"),
          $"text".cast("binary").as("payload"))
        .select($"media_id", $"kind",
          octet_length($"payload").as("n_bytes"),
          ascii(decode($"payload", "UTF-8")).as("first_byte"))
        .groupBy($"kind")
        .agg(count(lit(1)).as("n_media"),
          sum($"n_bytes").cast("long").as("total_bytes"),
          min($"first_byte").as("min_first"), max($"first_byte").as("max_first"))
    },
    Some("""
      SELECT 'text/plain' AS kind, COUNT(*) AS n_media,
        CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        MIN(ascii(text)) AS min_first, MAX(ascii(text)) AS max_first
      FROM documents"""))

  /** Partition-batched decode: Dataset[Media] → mapPartitions → features.
    * Oracle-checked since round 10: the stub codec is plain byte
    * arithmetic over ASCII payloads, so DuckDB replays it exactly — byte
    * sums via `ord` folds, and Scala's `math.round(x·1000)/1000` as
    * `floor(x·1000 + 0.5)/1000` (identical IEEE sequence, so identical
    * doubles). The spec additionally pins exact values for known
    * payloads. */
  val qDecode: QueryDef = QueryDef(
    "q94_multimodal_decode_stub",
    (s, d) => {
      import s.implicits._
      Tables.df(s, d, "documents")
        .select($"doc_id".as("media_id"), lit("image/fake").as("kind"),
          $"text".cast("binary").as("payload"))
        .as[Media]
        .mapPartitions(_.map { m =>
          val (w, h, mean) = FakeCodec.decode(m.payload)
          (m.media_id, m.kind, w, h, math.round(mean * 1000.0) / 1000.0)
        })
        .toDF("media_id", "kind", "width", "height", "mean_byte")
        .groupBy($"kind", $"width")
        .agg(count(lit(1)).as("n"), max($"mean_byte").as("max_mean"))
        .orderBy($"width")
    },
    Some("""
      WITH m AS (
        SELECT doc_id, octet_length(encode(text)) AS len,
          list_reduce(list_prepend(0, list_transform(range(1, length(text) + 1),
            i -> ord(substr(text, i, 1)))), (a, b) -> a + b) AS s
        FROM documents)
      SELECT 'image/fake' AS kind,
        CAST(CASE WHEN len = 0 THEN 0 ELSE 64 + (len % 512) END AS INT) AS width,
        CAST(COUNT(*) AS BIGINT) AS n,
        MAX(CASE WHEN len = 0 THEN 0.0
            ELSE floor((CAST(s AS DOUBLE) / len) * 1000.0 + 0.5) / 1000.0
            END) AS max_mean
      FROM m GROUP BY 2 ORDER BY width"""))

  /** Frame sampling: treat the payload as fixed-stride frames and keep
    * every Nth — the video-pipeline shape (stride/offset arithmetic is
    * real; frame decode remains the stub). Emits (media_id, frame_no,
    * frame_checksum) rows — one explode, no payload shuffle before it.
    * Oracle-checked since round 10: the aggregate surface is pure
    * stride arithmetic over the payload length (sampled-frame count and
    * last frame index), which DuckDB reproduces directly. */
  val qFrameSample: QueryDef = QueryDef(
    "q95b_multimodal_frame_sample",
    (s, d) => {
      import s.implicits._
      val frameBytes = 32
      val everyNth = 4
      Tables.df(s, d, "documents")
        .select($"doc_id".as("media_id"), $"text".cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, payload) =>
          val nFrames = payload.length / frameBytes
          (0 until nFrames by everyNth).map { f =>
            val frame = payload.slice(f * frameBytes, (f + 1) * frameBytes)
            (id, f, frame.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)))
          }
        }
        .toDF("media_id", "frame_no", "frame_checksum")
        .groupBy($"media_id")
        .agg(count(lit(1)).as("n_sampled"),
          max($"frame_no").as("last_frame"))
        .orderBy($"media_id")
    },
    Some("""
      WITH f AS (SELECT doc_id, octet_length(encode(text)) // 32 AS nf
                 FROM documents)
      SELECT doc_id AS media_id,
        CAST((nf + 3) // 4 AS BIGINT) AS n_sampled,
        CAST(((nf - 1) // 4) * 4 AS INT) AS last_frame
      FROM f WHERE nf > 0 ORDER BY media_id"""))

  override def defs: Seq[QueryDef] = Seq(qMeta, qDecode, qFrameSample)
}
