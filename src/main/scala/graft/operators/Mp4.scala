package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** REAL video CONTAINER handling (ISO-BMFF / MP4), no codec required.
  *
  * mm2/mm3 upgraded image and audio from the FakeCodec stub to genuine
  * containers (PNG/BMP via javax.imageio, RIFF/WAVE via javax.sound).
  * Video frame DECODE stays impossible in this container (the JDK ships no
  * video codec), but the container layer — the part a 100 TB curation
  * pipeline actually runs before ever touching pixels (probe dimensions,
  * frame counts, durations; reject corrupt files; locate the sample data)
  * — is pure byte parsing. This object implements it for real:
  *
  *  - [[write]] builds a structurally valid minimal MP4: `ftyp` +
  *    `moov{mvhd, trak{tkhd, mdia{mdhd, hdlr, minf{vmhd, dinf{dref{url}},
  *    stbl{stsd, stts, stsc, stsz, stco}}}}}` + `mdat`, with big-endian
  *    box framing, 16.16 fixed-point tkhd dimensions, and an stts sample
  *    table carrying the frame count — the same boxes ffprobe reads.
  *  - [[parse]] is an independent bounds-checked box-tree walk: it
  *    recovers width/height from tkhd, timescale/duration from mvhd,
  *    frame count by summing stts entries, and the mdat payload size —
  *    returning None (never throwing) on any structural violation.
  *
  * mm6 puts the round trip under the differential gate the mm2 way: the
  * fixture parameters are closed-form functions of doc_id, so DuckDB
  * derives every expected field from the formula while Spark derives them
  * from the parsed bytes — a hash match certifies the container encode →
  * parse round trip without either engine shipping a video stack. A
  * deterministic subset is truncated mid-mdat and MUST surface as
  * ok=false rows (graceful corrupt-file degradation, not task failure).
  *
  * Scale shape (the mm1-mm5 discipline): containers are built and parsed
  * per partition where the bytes live; only fixed-width metadata rows
  * ever shuffle.
  */
object Mp4 {

  // ------------------------------------------------------------- writer

  private val Timescale = 600
  private val SampleDelta = 25 // 24 fps in a 600-tick timescale

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def zeros(n: Int): Array[Byte] = new Array[Byte](n)

  private def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = parts.flatten.toArray
    be32(8L + payload.length) ++ fcc(tpe) ++ payload
  }

  /** Identity transform matrix (the only part of tkhd/mvhd players verify). */
  private val Matrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
    be32(0) ++ be32(0x00010000L) ++ be32(0) ++
    be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** A structurally valid single-video-track MP4 whose mdat carries
    * `payload`. Frame count is encoded in the stts/stsz tables exactly as
    * a real muxer would for constant-rate samples. */
  def write(width: Int, height: Int, frames: Int, payload: Array[Byte]): Array[Byte] = {
    val duration = frames.toLong * SampleDelta
    val mvhd = box("mvhd",
      be32(0), be32(0), be32(0),                       // version/flags, ctime, mtime
      be32(Timescale.toLong), be32(duration),
      be32(0x00010000L), be16(0x0100), zeros(10),      // rate 1.0, volume 1.0, reserved
      Matrix, zeros(24), be32(2))                      // matrix, predefined, next track id
    val tkhd = box("tkhd",
      be32(7), be32(0), be32(0),                       // flags: enabled|in-movie|in-preview
      be32(1), be32(0), be32(duration),                // track id, reserved, duration
      zeros(8), be16(0), be16(0), be16(0), be16(0),    // layer, alternate, volume, reserved
      Matrix,
      be32(width.toLong << 16), be32(height.toLong << 16)) // 16.16 fixed point
    val mdhd = box("mdhd",
      be32(0), be32(0), be32(0), be32(Timescale.toLong), be32(duration),
      be16(0x55c4), be16(0))                           // language 'und'
    val hdlr = box("hdlr", be32(0), be32(0), fcc("vide"), zeros(12), zeros(1))
    val vmhd = box("vmhd", be32(1), be16(0), be16(0), be16(0), be16(0))
    val dinf = box("dinf", box("dref", be32(0), be32(1), box("url ", be32(1))))
    val stsd = box("stsd", be32(0), be32(1),
      be32(16), fcc("mp4v"), zeros(6), be16(1))        // minimal sample entry
    val stts = box("stts", be32(0), be32(1), be32(frames.toLong), be32(SampleDelta.toLong))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(frames.toLong), be32(1))
    val stsz = box("stsz", be32(0), be32(256), be32(frames.toLong)) // constant sample size
    val stco = box("stco", be32(0), be32(1), be32(0))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val ftyp = box("ftyp", fcc("isom"), be32(0x200), fcc("isom"), fcc("mp41"))
    ftyp ++ moov ++ box("mdat", payload)
  }

  // ------------------------------------------------------------- parser

  /** Parsed container facts: everything a probe needs before any decode. */
  final case class VideoInfo(width: Int, height: Int, nFrames: Long,
      durationMs: Long, mdatBytes: Long)

  private[operators] def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
    ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  /** Exposed for tests that hand-construct box variants [[write]] never
    * emits (version-1 headers, largesize framing). */
  private[operators] def buildBox(tpe: String, parts: Array[Byte]*): Array[Byte] =
    box(tpe, parts: _*)

  /** The direct children of [start, end) as (type, payloadStart, payloadEnd);
    * None if any box frame is malformed or overruns `end` — truncation
    * anywhere therefore poisons the whole parse. Handles the spec's two
    * alternate framings: size==1 (64-bit largesize follows the fourcc)
    * and size==0 (box extends to the end of the enclosing scope). */
  private def children(b: Array[Byte], start: Int, end: Int): Option[List[(String, Int, Int)]] = {
    var off = start
    val out = List.newBuilder[(String, Int, Int)]
    while (off < end) {
      if (off + 8 > end) return None
      val size32 = u32(b, off)
      val (payloadStart, size) =
        if (size32 == 1L) {
          if (off + 16 > end) return None
          (off + 16, u64(b, off + 8))
        } else if (size32 == 0L) (off + 8, (end - off).toLong)
        else (off + 8, size32)
      // compare against (end - off), never (off + size): a crafted u64
      // largesize near 2^63 would overflow the addition and slip past the
      // bound, sending the cursor backwards (negative size.toInt) into an
      // infinite loop — untrusted bytes must only ever yield None
      if (size < payloadStart - off || size > end - off) return None
      out += ((new String(b, off + 4, 4, "US-ASCII"), payloadStart, (off + size).toInt))
      off += size.toInt
    }
    Some(out.result())
  }

  private def child(kids: List[(String, Int, Int)], tpe: String): Option[(Int, Int)] =
    kids.collectFirst { case (t, s, e) if t == tpe => (s, e) }

  /** (timescale, duration) from an mvhd payload, honoring the version
    * byte: version 0 packs them as u32s after 2×u32 times, version 1
    * after 2×u64 times with a u64 duration. Unknown versions → None. */
  private def mvhdTimes(b: Array[Byte], s: Int, e: Int): Option[(Long, Long)] =
    if (e - s < 20) None // guard BEFORE b(s): an empty mvhd payload may end the buffer
    else b(s) & 0xff match {
      case 0 => Some((u32(b, s + 12), u32(b, s + 16)))
      case 1 if e - s >= 32 => Some((u32(b, s + 20), u64(b, s + 24)))
      case _ => None
    }

  /** Bounds-checked ISO-BMFF walk — an independent implementation of the
    * container spec, not an inverse of [[write]] (it skips unknown boxes,
    * honors version-1 headers and largesize/to-EOF framing, and sums
    * multi-entry stts tables write never produces). */
  def parse(bytes: Array[Byte]): Option[VideoInfo] =
    for {
      top <- children(bytes, 0, bytes.length)
      moov <- child(top, "moov")
      mdat <- child(top, "mdat")
      mkids <- children(bytes, moov._1, moov._2)
      mvhd <- child(mkids, "mvhd")
      ts <- mvhdTimes(bytes, mvhd._1, mvhd._2)
      (timescale, duration) = ts
      if timescale > 0
      trak <- child(mkids, "trak")
      tkids <- children(bytes, trak._1, trak._2)
      tkhd <- child(tkids, "tkhd").filter(p => p._2 - p._1 >= 84)
      width = (u32(bytes, tkhd._2 - 8) >> 16).toInt
      height = (u32(bytes, tkhd._2 - 4) >> 16).toInt
      mdia <- child(tkids, "mdia")
      dkids <- children(bytes, mdia._1, mdia._2)
      minf <- child(dkids, "minf")
      fkids <- children(bytes, minf._1, minf._2)
      stbl <- child(fkids, "stbl")
      skids <- children(bytes, stbl._1, stbl._2)
      stts <- child(skids, "stts").filter(p => p._2 - p._1 >= 8)
      n = u32(bytes, stts._1 + 4)
      if stts._2 - stts._1 >= 8 + 8 * n
      frames = (0L until n).map(i => u32(bytes, stts._1 + 8 + 8 * i.toInt)).sum
    } yield VideoInfo(width, height, frames,
      duration * 1000L / timescale, (mdat._2 - mdat._1).toLong)

  // ------------------------------------------------------------ fixtures

  final case class VideoProbe(media_id: Long, ok: Boolean, width: Int,
      height: Int, n_frames: Long, duration_ms: Long, mdat_bytes: Long)

  /** Formula-parameterized real MP4s over the documents table (the mm2
    * fixture discipline): every field the probe recovers has a closed
    * form in doc_id, and ids ≡ 0 (mod 41) are truncated mid-mdat so the
    * corrupt path is exercised deterministically. */
  def probeFixtures(s: SparkSession, dir: String): Dataset[VideoProbe] = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id", "text")
      .where(col("doc_id") < 300) // column filter: pushes into the parquet scan
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val w = 160 + (id % 16).toInt * 8
          val h = 96 + (id % 9).toInt * 16
          val frames = 1 + (id % 30).toInt
          val full = write(w, h, frames, text.getBytes("UTF-8"))
          val bytes = if (id % 41 == 0) full.take(full.length - 7) else full
          parse(bytes) match {
            case Some(v) => VideoProbe(id, ok = true, v.width, v.height,
              v.nFrames, v.durationMs, v.mdatBytes)
            case None => VideoProbe(id, ok = false, -1, -1, -1L, -1L, -1L)
          }
        }
      }
  }

  val defs: Seq[QueryDef] = Seq(
    // MM6: real MP4 container probe under the differential gate. The
    // oracle re-derives every parsed field from the generation formula
    // (duration_ms = frames·25·1000 div 600 — exact integer division on
    // both engines), so the hash match certifies the byte-exact container
    // round trip AND that truncated files degrade to ok=false rows.
    QueryDef("mm6_video_container",
      """WITH v AS (SELECT doc_id AS media_id,
        |             CAST(160 + (doc_id % 16) * 8 AS INT) AS width,
        |             CAST(96 + (doc_id % 9) * 16 AS INT) AS height,
        |             1 + doc_id % 30 AS frames,
        |             octet_length(encode(text)) AS payload
        |           FROM documents WHERE doc_id < 300)
        |SELECT media_id,
        |       media_id % 41 <> 0 AS ok,
        |       CASE WHEN media_id % 41 = 0 THEN -1 ELSE width END AS width,
        |       CASE WHEN media_id % 41 = 0 THEN -1 ELSE height END AS height,
        |       CAST(CASE WHEN media_id % 41 = 0 THEN -1 ELSE frames END AS BIGINT) AS n_frames,
        |       CAST(CASE WHEN media_id % 41 = 0 THEN -1
        |            ELSE (frames * 25 * 1000) // 600 END AS BIGINT) AS duration_ms,
        |       CAST(CASE WHEN media_id % 41 = 0 THEN -1 ELSE payload END AS BIGINT) AS mdat_bytes
        |FROM v ORDER BY media_id""".stripMargin) { (s, dir) =>
      probeFixtures(s, dir).toDF()
        .select(col("media_id"), col("ok"), col("width"), col("height"),
          col("n_frames"), col("duration_ms"), col("mdat_bytes"))
        .orderBy("media_id")
    },

    // MM7: frame sampling off the REAL container — mm4's every-4th-frame
    // kernel re-based from the FakeCodec header onto the stts-derived
    // frame counts mm6 parses out of genuine MP4 boxes. Corrupt files
    // contribute no frames (the production contract: a truncated shard
    // file must drop out of the training set, not poison the job). The
    // oracle mirrors both the sampling arithmetic and the corrupt-id
    // exclusion, so the hash match certifies parse + filter + sampling
    // end to end.
    QueryDef("mm7_video_frame_sample",
      """WITH v AS (SELECT doc_id AS media_id, 1 + doc_id % 30 AS frames
        |           FROM documents WHERE doc_id < 300 AND doc_id % 41 <> 0),
        |f AS (SELECT media_id, unnest(generate_series(0, frames - 1, 4)) AS frame_id
        |      FROM v)
        |SELECT media_id, CAST(frame_id AS BIGINT) AS frame_id
        |FROM f ORDER BY media_id, frame_id""".stripMargin) { (s, dir) =>
      probeFixtures(s, dir).toDF()
        .filter(col("ok") && col("n_frames") > 0)
        .select(col("media_id"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_id"))
        .orderBy("media_id", "frame_id")
    }
  )
}
