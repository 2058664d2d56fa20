package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed per-partition.
  *
  * The container has no real codec libraries, so the byte-level decode is a
  * STUB — `FakeCodec` defines a deterministic self-describing container
  * (`GRAFT1|kind|w|h|frames|payload`) standing in for JPEG/WAV/MP4. What IS
  * real, and what these operators exercise, is the Spark side a production
  * pipeline needs:
  *   - a typed `Dataset[MediaFile]` with the binary payload + metadata,
  *   - `mapPartitions` decode (per-partition batching: one codec context
  *     per partition, not per row — swap `FakeCodec.decode` for libjpeg/
  *     ffmpeg bindings and nothing else changes),
  *   - frame sampling (video → every k-th frame id) and a byte-histogram
  *     feature extractor whose output feeds the Similarity operators,
  *   - resize as a metadata + payload transform.
  *
  * Scale: all per-record, embarrassingly parallel, no shuffle; payload
  * bytes never leave their partition. Feature vectors (64 doubles) are the
  * only thing downstream aggregations touch — the 100 TB pattern of
  * "decode once near the data, move only features".
  */
object Multimodal {

  final case class MediaFile(media_id: Long, kind: String, content: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, width: Int,
      height: Int, frames: Int, n_bytes: Long, ok: Boolean)
  final case class MediaFeature(media_id: Long, feature: Array[Double])

  /** Deterministic stand-in for a real media container/codec. */
  object FakeCodec {
    private val Magic = "GRAFT1"

    def encode(kind: String, w: Int, h: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
      val header = s"$Magic|$kind|$w|$h|$frames|".getBytes("UTF-8")
      header ++ payload
    }

    /** The stub point: a real pipeline parses JPEG/WAV headers here. */
    def decode(bytes: Array[Byte]): Option[(String, Int, Int, Int, Array[Byte])] = {
      val s = new String(bytes.take(64), "UTF-8")
      val parts = s.split('|')
      if (parts.length < 5 || parts(0) != Magic) None
      else {
        val headerLen = parts.take(5).map(_.length + 1).sum
        try Some((parts(1), parts(2).toInt, parts(3).toInt, parts(4).toInt,
          bytes.drop(headerLen)))
        catch { case _: NumberFormatException => None }
      }
    }
  }

  /** Decode metadata per partition — one decoder context per partition,
    * the shape a real codec binding needs. Corrupt records surface as
    * ok=false rows instead of task failures. */
  def decodeMeta(media: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (a real impl would init its codec context here, once)
      it.map { m =>
        FakeCodec.decode(m.content) match {
          case Some((kind, w, h, frames, payload)) =>
            MediaMeta(m.media_id, kind, w, h, frames,
              m.content.length.toLong, ok = kind == m.kind && payload.nonEmpty)
          case None =>
            MediaMeta(m.media_id, m.kind, -1, -1, -1, m.content.length.toLong, ok = false)
        }
      }
    }
  }

  /** Frame sampling: every `step`-th frame id of a decoded video. */
  def sampleFrames(meta: Dataset[MediaMeta], step: Int): DataFrame =
    meta.filter(col("ok") && col("frames") > 0)
      .select(col("media_id"),
        sequence(lit(0), col("frames") - 1, lit(step)).as("frame_ids"))

  /** Byte-histogram feature (64 buckets, L1-normalized) — the deterministic
    * stand-in for an embedding model, computed where the bytes live. */
  def byteHistogram(media: Dataset[MediaFile]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val counts = new Array[Double](64)
        FakeCodec.decode(m.content).foreach { case (_, _, _, _, payload) =>
          payload.foreach(b => counts((b & 0xff) >> 2) += 1.0)
        }
        val total = math.max(counts.sum, 1.0)
        MediaFeature(m.media_id, counts.map(_ / total))
      }
    }
  }

  /** Resize stub: metadata scales exactly; the payload transform is where a
    * real resampler would run (here: deterministic byte truncation). */
  def resize(media: Dataset[MediaFile], scale: Double): Dataset[MediaFile] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        FakeCodec.decode(m.content) match {
          case Some((kind, w, h, frames, payload)) =>
            val (nw, nh) = ((w * scale).toInt.max(1), (h * scale).toInt.max(1))
            val keep = (payload.length * scale * scale).toInt.max(1).min(payload.length)
            MediaFile(m.media_id, kind,
              FakeCodec.encode(kind, nw, nh, frames, payload.take(keep)))
          case None => m
        }
      }
    }
  }

  /** Deterministic fixture: wrap each document's text bytes as fake media
    * (kind cycles image/audio/video; dims derived from doc stats). */
  def syntheticMedia(s: SparkSession, dir: String): Dataset[MediaFile] = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val w = 16 + (id % 64).toInt
        val h = 16 + (id % 48).toInt
        val frames = if (kind == "video") 1 + (id % 30).toInt else 0
        MediaFile(id, kind, FakeCodec.encode(kind, w, h, frames, text.getBytes("UTF-8")))
      }
  }

  /** MM1: binary-column metadata extraction over a real table — byte
    * length, content hash, leading-bytes hex — the part of media handling
    * that is NOT stubbed (documents.text reinterpreted as its UTF-8
    * payload bytes; at scale this column is the raw image/audio blob). */
  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm1_binary_metadata",
      // byte-based throughout: encode() is UTF-8 VARCHAR→BLOB (a direct
      // CAST AS BLOB errors on non-ASCII text), and head_hex slices the
      // HEX of the blob (16 hex chars = 8 bytes) because DuckDB 1.0 has no
      // substr over BLOB — a character-based substr would diverge from
      // Spark's binary substring on any multi-byte leading codepoint.
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS content_md5,
        |       substr(hex(encode(text)), 1, 16) AS head_hex
        |FROM documents ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bin", col("text").cast("binary"))
        .select(col("doc_id"),
          length(col("bin")).cast("long").as("n_bytes"),
          md5(col("bin")).as("content_md5"),
          hex(expr("substring(bin, 1, 8)")).as("head_hex"))
        .orderBy("doc_id").limit(2000)
    }
  )
}
