package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, processed per-partition.
  *
  * IMAGES and AUDIO decode for REAL: [[JdkImageCodec]] encodes/decodes
  * genuine PNG/BMP (lossless, pixel-exact — mm2) and JPEG (lossy,
  * tolerance-certified — mm8) through `javax.imageio`, and
  * [[JdkAudioCodec]] genuine RIFF/WAVE PCM through `javax.sound.sampled`
  * (all JDK-shipped, no external deps), with codec-free DuckDB formula
  * oracles. VIDEO decodes for real too: [[Mp4]] does ISO-BMFF container
  * building + parsing (mm6/mm7), and [[JdkGifCodec]] runs a genuine
  * multi-frame pixel round trip through the JDK's animated-GIF codec
  * (mm9) — lossless, so every pixel of every frame sits under the exact
  * hash gate. (Modern inter-frame codecs — H.264/VP9 — still have no JDK
  * decoder; the mm9 path certifies the frame-sequenced decode plumbing a
  * binding to such a codec would reuse unchanged.) `FakeCodec` remains as
  * a deterministic self-describing container (`GRAFT1|kind|w|h|frames|
  * payload`) for the codec-agnostic plumbing queries (mm1/mm4).
  * Common to all paths is the Spark side a production pipeline needs:
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

  // ------------------------------------------------------------ real codec

  /** REAL image codec via JDK `javax.imageio` (no external deps): PNG
    * (8-bit grayscale) and BMP (24-bit RGB), both lossless. This replaces
    * the FakeCodec stub for the image kind; audio/video stay stubbed
    * (the container ships no audio/video codecs).
    *
    * The fixtures are CONSTRUCTED images: pixel p (row-major y·w+x) of
    * image `id` carries formula values — gray v(p) = (31p + id) mod 256;
    * RGB r/g/b(p) = (31p/37p/41p + id) mod 256 — so every decoded
    * statistic has a closed form an independent engine can compute
    * WITHOUT a codec. That is what makes mm2 oracle-able: DuckDB derives
    * the expected sums from the formula over generate_series while Spark
    * derives them from ImageIO-decoded bytes; the hash match certifies
    * the full encode→decode round trip bit-for-bit. */
  object JdkImageCodec {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayInputStream
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO

    def width(id: Long): Int = 16 + (id % 13).toInt
    def height(id: Long): Int = 16 + (id % 7).toInt

    /** Real PNG bytes: 8-bit grayscale, pixel p = (31p + id) mod 256.
      * `perturbAt ≥ 0` flips that one pixel by +128 mod 256 — the
      * near-duplicate construction mm5 pairs up (default: untouched). */
    def encodePng(id: Long, perturbAt: Int = -1): Array[Byte] = {
      val (w, h) = (width(id), height(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var p = 0
      while (p < w * h) {
        val bump = if (p == perturbAt) 128L else 0L
        raster.setSample(p % w, p / w, 0, ((31L * p + id + bump) % 256).toInt)
        p += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Real BMP bytes: 24-bit RGB, channel c(p) = (k_c·p + id) mod 256.
      * `perturbAt` bumps every channel of that pixel by +128 mod 256. */
    def encodeBmp(id: Long, perturbAt: Int = -1): Array[Byte] = {
      val (w, h) = (width(id), height(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      var p = 0
      while (p < w * h) {
        val bump = if (p == perturbAt) 128L else 0L
        val r = ((31L * p + id + bump) % 256).toInt
        val g = ((37L * p + id + bump) % 256).toInt
        val b = ((41L * p + id + bump) % 256).toInt
        img.setRGB(p % w, p / w, (r << 16) | (g << 8) | b)
        p += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "bmp", out)
      out.toByteArray
    }

    /** Real JPEG bytes: 8-bit grayscale, pixel v(x,y) = x + y + id. The
      * ramp is deliberately SMOOTH AND WRAP-FREE (max value = (w-1) +
      * (h-1) + id ≤ 27 + 21 + 99 < 256 for the fixture ids), because JPEG
      * is lossy: a high-frequency pattern (mm2's mod-256 sawtooth) would
      * decode with large, quality-dependent error, while a smooth ramp
      * keeps the DCT round-trip error within a few gray levels — small
      * enough to certify with a pinned tolerance instead of pixel
      * equality. Writes through the JDK's real JPEG encoder at its
      * default quality. */
    def encodeJpeg(id: Long): Array[Byte] = {
      val (w, h) = (width(id), height(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var p = 0
      while (p < w * h) {
        raster.setSample(p % w, p / w, 0, ((p % w) + (p / w) + id).toInt)
        p += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", out)
      out.toByteArray
    }

    /** Decode any ImageIO-supported container; None on corrupt/unknown
      * bytes (never throws — corrupt records must degrade to ok=false
      * rows, not task failures). */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** Per-pixel value sum over ALL raster bands (gray → v; RGB → r+g+b;
      * band order cancels under the sum) and the position-weighted mix
      * Σ (p mod 251)·val(p) that catches pixel permutations. Raster
      * samples, not getRGB: getRGB routes through colorspace conversion,
      * which is NOT the identity for grayscale. */
    def pixelSums(img: BufferedImage): (Long, Long, Long) = {
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      var sum = 0L; var mix = 0L
      var p = 0
      while (p < w * h) {
        var v = 0
        var b = 0
        while (b < bands) { v += raster.getSample(p % w, p / w, b); b += 1 }
        sum += v; mix += (p % 251).toLong * v
        p += 1
      }
      (w.toLong * h, sum, mix)
    }
  }

  final case class ImageMeta(media_id: Long, width: Int, height: Int,
      n_px: Long, px_sum: Long, px_mix: Long, ok: Boolean)

  /** Real-image fixture set: the first `n` documents become PNG (even
    * doc_id) / BMP (odd doc_id) files with formula pixels. The bytes are
    * genuine container files — `file`-identifiable PNG/BMP, decodable by
    * any image tool. */
  def imageFixtures(s: SparkSession, dir: String, n: Int = 200): Dataset[MediaFile] = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id").where(col("doc_id") < n)
      .as[Long].map { id =>
        if (id % 2 == 0) MediaFile(id, "png", JdkImageCodec.encodePng(id))
        else MediaFile(id, "bmp", JdkImageCodec.encodeBmp(id))
      }
  }

  /** Decode REAL image bytes per partition (same shape as [[decodeMeta]]:
    * one codec context per partition, corrupt bytes → ok=false row). */
  def decodeImages(media: Dataset[MediaFile]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        JdkImageCodec.decode(m.content) match {
          case Some(img) =>
            val (n, sum, mix) = JdkImageCodec.pixelSums(img)
            ImageMeta(m.media_id, img.getWidth, img.getHeight, n, sum, mix, ok = true)
          case None => ImageMeta(m.media_id, -1, -1, 0L, 0L, 0L, ok = false)
        }
      }
    }
  }

  /** 64-bucket L1-normalized pixel-value histogram over the decoded
    * raster — the real-codec sibling of [[byteHistogram]]; its output
    * plugs straight into the Similarity operators (MultimodalSpec feeds
    * it to the brute-force cosine top-k). */
  def pixelHistogram(media: Dataset[MediaFile]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val counts = new Array[Double](64)
        JdkImageCodec.decode(m.content).foreach { img =>
          val raster = img.getRaster
          val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
          var p = 0
          while (p < w * h) {
            var b = 0
            while (b < bands) {
              counts(raster.getSample(p % w, p / w, b) >> 2) += 1.0
              b += 1
            }
            p += 1
          }
        }
        val total = math.max(counts.sum, 1.0)
        MediaFeature(m.media_id, counts.map(_ / total))
      }
    }
  }

  final case class ImageHash(media_id: Long, fp: Long)

  /** Fixture set for image near-dedup: the 200 mm2 images plus, for the
    * first 100, a perceptual NEAR-COPY — same formula pixels with exactly
    * one pixel (the center, (w·h) div 2) bumped by +128 mod 256, written
    * as a genuine PNG/BMP under media_id = base + 200. One altered pixel
    * lands in one dHash grid cell, which flips at most the two
    * neighbour-comparison bits that read that cell — so every (base,
    * base+200) pair is within Hamming 2 by construction, a guarantee the
    * pigeonhole banding (≤ 3) must then recover. */
  def imageNearDupFixtures(s: SparkSession, dir: String): Dataset[MediaFile] = {
    import s.implicits._
    val copies = Tables.documents(s, dir).select("doc_id")
      .where(col("doc_id") < 100).as[Long].map { base =>
        val center = (JdkImageCodec.width(base) * JdkImageCodec.height(base)) / 2
        if (base % 2 == 0)
          MediaFile(base + 200, "png", JdkImageCodec.encodePng(base, center))
        else
          MediaFile(base + 200, "bmp", JdkImageCodec.encodeBmp(base, center))
      }
    imageFixtures(s, dir).unionByName(copies)
  }

  /** 64-bit dHash (difference hash) from REAL decoded pixels: luminance
    * (sum of raster bands) pooled onto a 9×8 grid — cell (gx, gy) =
    * (x·9 div w, y·8 div h), pure integer arithmetic — then bit (x, y) =
    * [cell(x,y) brighter than cell(x+1,y)] for the 8×8 adjacent pairs,
    * compared CROSS-MULTIPLIED (sumA·cntB > sumB·cntA) so unequal cell
    * populations never meet a float. The classic perceptual fingerprint:
    * stable under small pixel edits, re-encodes, and container changes
    * (a PNG and a BMP of the same pixels hash identically). Per-record,
    * no shuffle; undecodable payloads drop out (flatMap, not a poisoned
    * row) so one corrupt file can't sink the batch. */
  def dhash64(media: Dataset[MediaFile]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        JdkImageCodec.decode(m.content).map { img =>
          val raster = img.getRaster
          val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
          val sums = new Array[Long](9 * 8)
          val cnts = new Array[Long](9 * 8)
          var p = 0
          while (p < w * h) {
            val (x, y) = (p % w, p / w)
            var v = 0L
            var b = 0
            while (b < bands) { v += raster.getSample(x, y, b); b += 1 }
            val cell = (y * 8 / h) * 9 + (x * 9 / w)
            sums(cell) += v; cnts(cell) += 1
            p += 1
          }
          var fp = 0L
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 8) {
              val a = gy * 9 + gx
              if (sums(a) * cnts(a + 1) > sums(a + 1) * cnts(a))
                fp |= 1L << (gy * 8 + gx)
              gx += 1
            }
            gy += 1
          }
          ImageHash(m.media_id, fp)
        }
      }
    }
  }

  /** REAL multi-frame video decode via the JDK's animated-GIF codec —
    * closing the "video frame pixel decode" gap: the JDK ships no
    * H.264/VP9 codec (mm6/mm7 therefore stop at real ISO-BMFF container
    * parsing), but `javax.imageio`'s GIF plugin is a genuine multi-frame
    * video round trip — LZW-compressed, frame-sequenced, and LOSSLESS,
    * which is exactly what makes per-frame PIXEL decode certifiable with
    * an mm2-style exact formula oracle rather than mm8's tolerances.
    *
    * Fixture videos are animated GIFs built frame-by-frame through the
    * JDK GIF writer (`writeToSequence`): frame f of video `id` is a
    * grayscale-palette indexed image whose pixel p carries
    * (31p + 7f + id) mod 256. Decode walks the frames with the GIF
    * reader and reads values back through getRGB (palette-resolved, so
    * the certification is immune to color-table permutations). */
  object JdkGifCodec {
    import java.awt.image.{BufferedImage, IndexColorModel}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO}

    def nFrames(id: Long): Int = 3 + (id % 5).toInt
    def width(id: Long): Int = JdkImageCodec.width(id)
    def height(id: Long): Int = JdkImageCodec.height(id)
    def valueAt(id: Long, f: Int, p: Int): Int =
      ((31L * p + 7L * f + id) % 256).toInt

    private val GrayPalette: IndexColorModel = {
      val ramp = Array.tabulate(256)(_.toByte)
      new IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    /** Real animated-GIF bytes: `nFrames(id)` full frames. */
    def encodeGif(id: Long): Array[Byte] = {
      val (w, h) = (width(id), height(id))
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames(id)).foreach { f =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, GrayPalette)
        val raster = img.getRaster
        var p = 0
        while (p < w * h) {
          raster.setSample(p % w, p / w, 0, valueAt(id, f, p))
          p += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      out.toByteArray
    }

    /** Decode every frame; None on corrupt/truncated bytes or when any
      * frame fails (never throws — the mm8 degradation discipline). */
    def decodeFrames(bytes: Array[Byte]): Option[Seq[BufferedImage]] =
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          reader.setInput(iis)
          val n = reader.getNumImages(true) // full scan: throws on truncation
          val frames = (0 until n).map(reader.read(_))
          reader.dispose()
          Some(frames)
        }
      } catch { case _: Exception => None }
  }

  final case class FrameStats(media_id: Long, frame_id: Int, n_px: Long,
      px_sum: Long, px_mix: Long, ok: Boolean)

  /** mm9 fixture matrix: ids 0-59 genuine animated GIFs, 60-69 truncated
    * streams (cut at 55% — at least the tail frames are gone). */
  def videoFixtures(s: SparkSession, dir: String): Dataset[MediaFile] = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id").where(col("doc_id") < 70)
      .as[Long].map { id =>
        if (id < 60) MediaFile(id, "gif", JdkGifCodec.encodeGif(id))
        else {
          val full = JdkGifCodec.encodeGif(id)
          MediaFile(id, "gif", full.take(full.length * 11 / 20))
        }
      }
  }

  /** Decode every frame of every video per partition and emit per-frame
    * pixel statistics (the mm2 sums, now indexed by frame). A video
    * counts as decoded only if the reader surfaces EXACTLY its expected
    * frame census with the expected dimensions — a truncated stream that
    * yields a partial frame sequence degrades to the single ok=false
    * row, never to a shorter-but-clean-looking sequence (the mm8
    * partial-success discipline, lifted to the frame axis). Values read
    * through getRGB so a permuted GIF color table cannot fake a match. */
  def decodeVideoFrames(media: Dataset[MediaFile]): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val expW = JdkGifCodec.width(m.media_id)
        val expH = JdkGifCodec.height(m.media_id)
        JdkGifCodec.decodeFrames(m.content) match {
          case Some(frames)
              if frames.size == JdkGifCodec.nFrames(m.media_id) &&
                frames.forall(f => f.getWidth == expW && f.getHeight == expH) =>
            frames.zipWithIndex.map { case (img, f) =>
              var sum = 0L; var mix = 0L
              var p = 0
              while (p < expW * expH) {
                val v = (img.getRGB(p % expW, p / expW) >> 16) & 0xff
                sum += v; mix += (p % 251).toLong * v
                p += 1
              }
              FrameStats(m.media_id, f, expW.toLong * expH, sum, mix, ok = true)
            }
          case _ =>
            Seq(FrameStats(m.media_id, -1, 0L, 0L, 0L, ok = false))
        }
      }
    }
  }

  /** Per-file mm8 verdict row. `dims_ok` rather than raw decoded width/
    * height: whether ImageIO rejects a truncated stream or partially
    * reconstructs it is decoder-version behavior, and raw dims of a
    * partial reconstruction would be unpredictable to the oracle — while
    * "decoded dims equal the id's formula dims" is robustly FALSE for
    * both corrupt tiers (the truncated tier re-uses id−100's stream,
    * whose dims never coincide with id's: the offsets 100 mod 13 and
    * 100 mod 7 are nonzero). */
  final case class JpegVerdict(media_id: Long, ok: Boolean, dims_ok: Boolean,
      mean_ok: Boolean, mae_ok: Boolean)

  /** mm8 tolerances, in 1/256 gray-level units per pixel: the decoded
    * image's MEAN must sit within MeanTol/256 of the formula mean, and
    * the per-pixel mean absolute error within MaeTol/256. Pinned well
    * above the measured JDK-default-quality error on the smooth ramp and
    * far below the ≥ 64-level error a transpose, channel swap, or
    * wrong-id decode produces. */
  val JpegMeanTol256 = 320L // mean offset ≤ 1.25 gray levels
  val JpegMaeTol256 = 1280L // MAE ≤ 5 gray levels

  /** JPEG fixture matrix (mm8): ids 0-99 genuine JPEG files (smooth-ramp
    * pixels), 100-119 TRUNCATED JPEGs (a valid stream cut at 40% — the
    * classic interrupted-crawl corruption), 120-139 non-JPEG bytes under
    * the jpg kind (mislabeled upload). The corrupt tiers pin the
    * degradation taxonomy: decode failures must surface as ok=false ROWS,
    * never task failures, and never partial successes counted as clean. */
  def jpegFixtures(s: SparkSession, dir: String): Dataset[MediaFile] = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id").where(col("doc_id") < 140)
      .as[Long].map { id =>
        if (id < 100) MediaFile(id, "jpg", JdkImageCodec.encodeJpeg(id))
        else if (id < 120) {
          val full = JdkImageCodec.encodeJpeg(id - 100)
          MediaFile(id, "jpg", full.take(full.length * 2 / 5))
        } else MediaFile(id, "jpg", s"not a jpeg at all #$id".getBytes("UTF-8"))
      }
  }

  /** Decode the JPEG matrix per partition and emit per-file VERDICTS (the
    * lossy-codec analog of [[decodeImages]]'s exact sums): dimensions are
    * exact metadata (JPEG never changes them), the value content is
    * certified against the known formula ramp within pinned integer
    * tolerances (errors scaled by 256 so no float ever decides a
    * verdict), and undecodable bytes degrade to ok=false rows. A
    * truncated stream that ImageIO partially reconstructs still fails:
    * its missing blocks decode to filler values, which blows the MAE
    * bound, and `ok` demands decoded dims AND in-tolerance content
    * together. */
  def decodeJpegVerdicts(media: Dataset[MediaFile]): Dataset[JpegVerdict] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        JdkImageCodec.decode(m.content) match {
          case Some(img) =>
            val raster = img.getRaster
            val (w, h) = (img.getWidth, img.getHeight)
            val expW = JdkImageCodec.width(m.media_id)
            val expH = JdkImageCodec.height(m.media_id)
            var errSum = 0L; var absSum = 0L
            var p = 0
            val n = w.toLong * h
            while (p < w * h) {
              var v = 0L
              var b = 0
              while (b < raster.getNumBands) { v += raster.getSample(p % w, p / w, b); b += 1 }
              val e = 256L * (v - ((p % w) + (p / w) + m.media_id))
              errSum += e; absSum += math.abs(e)
              p += 1
            }
            val dimsOk = w == expW && h == expH
            val meanOk = math.abs(errSum) <= JpegMeanTol256 * n
            val maeOk = absSum <= JpegMaeTol256 * n
            JpegVerdict(m.media_id, dimsOk && meanOk && maeOk,
              dimsOk, meanOk, maeOk)
          case None => JpegVerdict(m.media_id, ok = false, dims_ok = false,
            mean_ok = false, mae_ok = false)
        }
      }
    }
  }

  /** REAL audio codec via JDK `javax.sound.sampled` (no external deps):
    * RIFF/WAVE, 16-bit signed little-endian mono PCM. This replaces the
    * FakeCodec stub for the audio kind the way [[JdkImageCodec]] did for
    * images; video container probing is real too (ISO-BMFF box parsing,
    * [[Mp4]]) — only video FRAME decode stays stubbed (no JDK video codec).
    *
    * Fixture audio is CONSTRUCTED: sample i of clip `id` is
    * ((2718281·i + 31·id) mod 65536) − 32768, so every decoded statistic
    * has a closed form an independent engine computes WITHOUT a codec —
    * the oracle derives expected sums from the formula over
    * generate_series while Spark derives them from AudioSystem-decoded
    * frames; a hash match certifies the full WAV encode→decode round
    * trip recovered every sample exactly (rate, count, values, AND
    * positions via the ordinal-weighted mix). */
  object JdkAudioCodec {
    import java.io.ByteArrayInputStream
    import java.io.ByteArrayOutputStream
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    def nSamples(id: Long): Int = 256 + (id % 97).toInt
    def sampleRate(id: Long): Int = 8000 + ((id % 3) * 4000).toInt
    def sampleAt(id: Long, i: Long): Int =
      (((2718281L * i + 31L * id) % 65536L) - 32768L).toInt

    /** Real WAV bytes (RIFF header + PCM data chunk via AudioSystem). */
    def encodeWav(id: Long): Array[Byte] = {
      val n = nSamples(id)
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sampleAt(id, i)
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate(id).toFloat, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode WAV container bytes → (rate, channels, samples); None on
      * corrupt/unsupported bytes (degrade to ok=false rows, never task
      * failures). The JDK parser handles the RIFF chunk walk; samples are
      * reassembled from the little-endian frames it exposes. */
    def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        val data = ais.readAllBytes()
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val n = data.length / 2
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) = ((data(2 * i + 1).toInt << 8) | (data(2 * i).toInt & 0xff))
            i += 1
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, samples))
        }
      } catch { case _: Exception => None }
  }

  final case class WavMeta(media_id: Long, sample_rate: Int, channels: Int,
      n_samples: Long, s_sum: Long, s_mix: Long, ok: Boolean)

  /** Real-audio fixture set: the first `n` documents become genuine WAV
    * clips with formula samples (RIFF-identifiable, playable). */
  def audioFixtures(s: SparkSession, dir: String, n: Int = 200): Dataset[MediaFile] = {
    import s.implicits._
    Tables.documents(s, dir).select("doc_id").where(col("doc_id") < n)
      .as[Long].map(id => MediaFile(id, "wav", JdkAudioCodec.encodeWav(id)))
  }

  /** Decode REAL WAV bytes per partition (same contract as
    * [[decodeImages]]: one codec context per partition, corrupt bytes →
    * ok=false row). */
  def decodeWavs(media: Dataset[MediaFile]): Dataset[WavMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        JdkAudioCodec.decodeWav(m.content) match {
          case Some((rate, ch, samples)) =>
            var sum = 0L; var mix = 0L; var i = 0
            while (i < samples.length) {
              sum += samples(i); mix += (i % 251).toLong * samples(i); i += 1
            }
            WavMeta(m.media_id, rate, ch, samples.length.toLong, sum, mix, ok = true)
          case None => WavMeta(m.media_id, -1, -1, 0L, 0L, 0L, ok = false)
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
    },

    // MM2: REAL image decode under the differential gate. Spark builds
    // genuine PNG/BMP files (formula pixels), decodes them with
    // javax.imageio, and emits per-image decoded statistics; the oracle
    // computes the SAME statistics from the pixel formula over
    // generate_series — codec-free. A hash match therefore certifies the
    // real encode→decode round trip recovered every pixel exactly (dims,
    // values, AND positions via the ordinal-weighted mix).
    QueryDef("mm2_image_decode",
      """WITH ids AS (SELECT doc_id AS media_id,
        |               CAST(16 + doc_id % 13 AS INT) AS width,
        |               CAST(16 + doc_id % 7 AS INT) AS height
        |             FROM documents WHERE doc_id < 200),
        |px AS (SELECT media_id, width, height,
        |              unnest(generate_series(0, CAST(width AS BIGINT) * height - 1)) AS p
        |       FROM ids),
        |v AS (SELECT media_id, width, height, p,
        |        CASE WHEN media_id % 2 = 0
        |          THEN (31 * p + media_id) % 256
        |          ELSE (31 * p + media_id) % 256 + (37 * p + media_id) % 256
        |               + (41 * p + media_id) % 256
        |        END AS val
        |      FROM px)
        |SELECT media_id, CAST(min(width) AS INT) AS width,
        |       CAST(min(height) AS INT) AS height,
        |       count(*) AS n_px,
        |       CAST(sum(val) AS BIGINT) AS px_sum,
        |       CAST(sum((p % 251) * val) AS BIGINT) AS px_mix
        |FROM v GROUP BY media_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      decodeImages(imageFixtures(s, dir))
        .select(col("media_id"), col("width"), col("height"),
          col("n_px"), col("px_sum"), col("px_mix"))
        .orderBy("media_id")
    },

    // MM3: REAL audio decode under the differential gate — the WAV
    // sibling of mm2. Spark writes genuine RIFF/WAVE PCM clips (formula
    // samples), decodes them with javax.sound.sampled, and emits decoded
    // statistics; the oracle computes the SAME statistics from the sample
    // formula — codec-free. The hash match certifies the container round
    // trip recovered rate, count, and every 16-bit sample exactly.
    QueryDef("mm3_audio_decode",
      """WITH ids AS (SELECT doc_id AS media_id,
        |               CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |               256 + doc_id % 97 AS n
        |             FROM documents WHERE doc_id < 200),
        |sm AS (SELECT media_id, sample_rate,
        |              unnest(generate_series(0, n - 1)) AS i
        |       FROM ids),
        |v AS (SELECT media_id, sample_rate, i,
        |             (2718281 * i + 31 * media_id) % 65536 - 32768 AS s
        |      FROM sm)
        |SELECT media_id, CAST(min(sample_rate) AS INT) AS sample_rate,
        |       CAST(1 AS INT) AS channels,
        |       count(*) AS n_samples,
        |       CAST(sum(s) AS BIGINT) AS s_sum,
        |       CAST(sum((i % 251) * s) AS BIGINT) AS s_mix
        |FROM v GROUP BY media_id ORDER BY media_id""".stripMargin) { (s, dir) =>
      decodeWavs(audioFixtures(s, dir))
        .select(col("media_id"), col("sample_rate"), col("channels"),
          col("n_samples"), col("s_sum"), col("s_mix"))
        .orderBy("media_id")
    },

    // MM4: video frame sampling — every 4th frame id of each decoded
    // video, exploded to (media_id, frame_id) rows. The frame count is
    // parsed out of the container header by the decode pass (the
    // syntheticMedia fixture's frames formula is 1 + id mod 30 for the
    // video kind), so a hash match certifies the encode→decode header
    // round trip AND the sampling arithmetic. Per-record and narrow:
    // decode and sequence-generation never shuffle; at 100 TB the only
    // data movement is the (id, frame_id) pairs a trainer actually reads.
    QueryDef("mm4_frame_sample",
      """WITH v AS (SELECT doc_id AS media_id, 1 + doc_id % 30 AS frames
        |           FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT media_id, unnest(generate_series(0, frames - 1, 4)) AS frame_id
        |      FROM v)
        |SELECT media_id, CAST(frame_id AS BIGINT) AS frame_id
        |FROM f ORDER BY media_id, frame_id""".stripMargin) { (s, dir) =>
      sampleFrames(decodeMeta(syntheticMedia(s, dir)), step = 4)
        .select(col("media_id"), explode(col("frame_ids")).as("f"))
        .select(col("media_id"), col("f").cast("long").as("frame_id"))
        .orderBy("media_id", "frame_id")
    },

    // MM5: image perceptual near-dedup — the multimodal tier's answer to
    // d4b. Spark decodes 300 REAL PNG/BMP files (200 bases + 100
    // one-pixel-perturbed near-copies), computes a 64-bit dHash from the
    // decoded rasters, and finds every pair within Hamming ≤ 3 via the
    // SAME pigeonhole banding d4b uses (4×16-bit blocks, keyed equi-join,
    // never all-pairs — the 100 TB shape). The oracle re-derives every
    // fingerprint codec-free from the pixel FORMULA (the mm2 pattern) and
    // brute-forces all pairs, so a hash match certifies three things at
    // once: the PNG/BMP decode round trip, the integer dHash arithmetic,
    // and that banding loses no pair. All 100 (base, base+200) copies
    // are within Hamming 2 by construction and MUST appear.
    QueryDef("mm5_image_phash_neardup", {
      // fp = Σ bit(x,y)·2^(8y+x); bit 63 spelled as (-MAX-1), d4b's trick
      val fpInt = (0 until 64).map { i =>
        val v = if (i == 63) "(CAST(-9223372036854775807 AS BIGINT) - 1)"
        else s"CAST(${1L << i} AS BIGINT)"
        s"sum(CASE WHEN y * 8 + x = $i AND bit = 1 THEN $v ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH ids AS (SELECT doc_id AS media_id, doc_id AS base
        |             FROM documents WHERE doc_id < 200
        |             UNION ALL
        |             SELECT doc_id + 200, doc_id FROM documents WHERE doc_id < 100),
        |dims AS (SELECT media_id, base, 16 + base % 13 AS w, 16 + base % 7 AS h
        |         FROM ids),
        |px AS (SELECT media_id, base, w, h,
        |              unnest(generate_series(0, CAST(w AS BIGINT) * h - 1)) AS p
        |       FROM dims),
        |v AS (SELECT media_id,
        |        ((p % w) * 9) // w AS gx, ((p // w) * 8) // h AS gy,
        |        CASE WHEN base % 2 = 0
        |          THEN (31 * p + base + bump) % 256
        |          ELSE (31 * p + base + bump) % 256 + (37 * p + base + bump) % 256
        |               + (41 * p + base + bump) % 256
        |        END AS lum
        |      FROM (SELECT *, CASE WHEN media_id >= 200 AND p = (w * h) // 2
        |                      THEN 128 ELSE 0 END AS bump FROM px)),
        |cells AS (SELECT media_id, gx, gy, sum(lum) AS s, count(*) AS n
        |          FROM v GROUP BY 1, 2, 3),
        |bits AS (SELECT a.media_id, a.gx AS x, a.gy AS y,
        |           CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS bit
        |         FROM cells a JOIN cells b
        |           ON a.media_id = b.media_id AND a.gy = b.gy AND b.gx = a.gx + 1
        |         WHERE a.gx < 8),
        |f AS (SELECT media_id, $fpInt AS fp FROM bits GROUP BY media_id)
        |SELECT a.media_id AS a_id, b.media_id AS b_id,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
        |FROM f a JOIN f b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY a_id, b_id""".stripMargin
    }) { (s, dir) =>
      // sharedExchange = false: the fingerprint lineage here is a
      // 300-image bounded fixture — the planner's two concurrent
      // broadcast branches beat three pinned exchanges of fixed cost
      // (+0.4 s measured with the d4b shape; see simhashCandidates)
      val f = dhash64(imageNearDupFixtures(s, dir)).toDF()
        .withColumnRenamed("media_id", "doc_id")
      Dedup.hammingPairs(f, maxHamming = 3, sharedExchange = false)
        .orderBy("a_id", "b_id")
    },

    // MM8: REAL JPEG decode — the LOSSY third format of the codec matrix
    // (PNG and BMP are lossless and pixel-exact in mm2; JPEG can never
    // be). Spark writes genuine JPEG files through the JDK encoder
    // (smooth-ramp pixels, see encodeJpeg), decodes them back, and emits
    // per-file verdicts: dims exactly preserved, mean and MAE inside
    // pinned integer tolerances — plus two CORRUPT tiers (truncated
    // stream, non-JPEG bytes) that must land as all-false rows. The
    // oracle states each tier's expected verdicts from the id alone, so
    // the hash match certifies the decode taxonomy and the bounded-error
    // round trip without demanding bit-exact lossy output.
    QueryDef("mm8_jpeg_decode",
      """SELECT doc_id AS media_id,
        |       doc_id < 100 AS ok,
        |       doc_id < 100 AS dims_ok,
        |       doc_id < 100 AS mean_ok,
        |       doc_id < 100 AS mae_ok
        |FROM documents WHERE doc_id < 140 ORDER BY media_id""".stripMargin) { (s, dir) =>
      decodeJpegVerdicts(jpegFixtures(s, dir))
        .select("media_id", "ok", "dims_ok", "mean_ok", "mae_ok")
        .orderBy("media_id")
    },

    // MM9: REAL video frame PIXEL decode under the exact differential
    // gate. Spark builds genuine animated GIFs (the JDK's one true
    // multi-frame codec — lossless LZW, so pixel exactness is on the
    // table), decodes every frame of every video, and emits per-frame
    // pixel statistics; the oracle computes the SAME statistics from the
    // (id, frame, p) formula over generate_series — codec-free. The hash
    // match certifies the full multi-frame encode→decode round trip:
    // frame census, dimensions, every pixel of every frame (values AND
    // positions via the ordinal-weighted mix). Truncated streams must
    // collapse to single ok=false rows — a partially-decodable video
    // never masquerades as a shorter clean one.
    QueryDef("mm9_video_frame_decode",
      """WITH ids AS (SELECT doc_id AS media_id,
        |               16 + doc_id % 13 AS w, 16 + doc_id % 7 AS h,
        |               3 + doc_id % 5 AS nf
        |             FROM documents WHERE doc_id < 60),
        |fr AS (SELECT media_id, w, h,
        |              unnest(generate_series(0, nf - 1)) AS frame_id
        |       FROM ids),
        |px AS (SELECT media_id, frame_id, w, h,
        |              unnest(generate_series(0, CAST(w AS BIGINT) * h - 1)) AS p
        |       FROM fr),
        |v AS (SELECT media_id, frame_id, p,
        |             (31 * p + 7 * frame_id + media_id) % 256 AS val
        |      FROM px),
        |good AS (SELECT media_id, CAST(frame_id AS INT) AS frame_id,
        |                count(*) AS n_px,
        |                CAST(sum(val) AS BIGINT) AS px_sum,
        |                CAST(sum((p % 251) * val) AS BIGINT) AS px_mix,
        |                TRUE AS ok
        |         FROM v GROUP BY 1, 2),
        |bad AS (SELECT doc_id AS media_id, CAST(-1 AS INT) AS frame_id,
        |               CAST(0 AS BIGINT) AS n_px, CAST(0 AS BIGINT) AS px_sum,
        |               CAST(0 AS BIGINT) AS px_mix, FALSE AS ok
        |        FROM documents WHERE doc_id >= 60 AND doc_id < 70)
        |SELECT * FROM (SELECT * FROM good UNION ALL SELECT * FROM bad)
        |ORDER BY media_id, frame_id""".stripMargin) { (s, dir) =>
      decodeVideoFrames(videoFixtures(s, dir)).toDF()
        .orderBy("media_id", "frame_id")
    }
  )
}
