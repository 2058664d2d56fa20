package graft.operators

import graft.SparkSpec

/** ISO-BMFF container round trip + parser robustness (mm6). */
class Mp4Spec extends SparkSpec {

  test("write→parse round-trips dimensions, frame count, duration, mdat size") {
    val payload = Array.tabulate[Byte](1000)(i => (i * 7).toByte)
    val v = Mp4.parse(Mp4.write(width = 640, height = 360, frames = 24, payload))
      .getOrElse(fail("parse returned None on a well-formed file"))
    assert(v.width === 640)
    assert(v.height === 360)
    assert(v.nFrames === 24L)
    assert(v.durationMs === 1000L) // 24 frames · 25 ticks · 1000 / 600
    assert(v.mdatBytes === 1000L)
  }

  test("single-frame and empty-payload files parse") {
    val v = Mp4.parse(Mp4.write(16, 16, frames = 1, Array.emptyByteArray)).get
    assert(v.nFrames === 1L)
    assert(v.mdatBytes === 0L)
  }

  test("any truncation fails the parse instead of throwing") {
    val full = Mp4.write(320, 240, 10, Array.fill[Byte](64)(1))
    for (cut <- Seq(1, 7, 50, full.length / 2, full.length - 9)) {
      assert(Mp4.parse(full.take(full.length - cut)).isEmpty, s"cut=$cut")
    }
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4.parse(Array[Byte](0, 0, 0, 3)).isEmpty) // size < 8
  }

  test("a crafted near-2^63 largesize yields None, not a hang or crash") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val full = Mp4.write(320, 240, 10, Array.fill[Byte](64)(1))
    // top-level box claiming a u64 size that would overflow off+size
    val evil = full ++ be32(1) ++ "free".getBytes("US-ASCII") ++
      be32(0x7fffffffL) ++ be32(0xfffff800L)
    assert(Mp4.parse(evil).isEmpty)
    // and one with the u64 top bit set (negative as a signed Long)
    val evil2 = full ++ be32(1) ++ "free".getBytes("US-ASCII") ++
      be32(0x80000000L) ++ be32(0L)
    assert(Mp4.parse(evil2).isEmpty)
  }

  test("an empty mvhd payload at the end of the buffer yields None, not AIOOBE") {
    val bytes = Mp4.buildBox("mdat", Array.fill[Byte](8)(1)) ++
      Mp4.buildBox("moov", Mp4.buildBox("mvhd"))
    assert(Mp4.parse(bytes).isEmpty)
  }

  test("a corrupted moov fourcc fails the parse") {
    val full = Mp4.write(320, 240, 10, Array.fill[Byte](64)(1))
    val idx = full.indexOfSlice("moov".getBytes("US-ASCII"))
    assert(idx > 0)
    val bad = full.clone(); bad(idx) = 'X'.toByte
    assert(Mp4.parse(bad).isEmpty)
  }

  test("version-1 mvhd (64-bit times) parses at the shifted offsets") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    val full = Mp4.write(320, 240, 10, Array.fill[Byte](64)(1))
    // splice a v1 mvhd (u64 ctime/mtime/duration) in place of write's v0
    // one, reusing its tail fields (rate/volume/matrix/next-track) verbatim
    val idx = full.indexOfSlice("mvhd".getBytes("US-ASCII")) - 4
    assert(idx > 0, "expected to locate write()'s mvhd bytes")
    val v0len = Mp4.u32(full, idx).toInt
    val v0 = full.slice(idx, idx + v0len)
    val tail = v0.drop(8 + 20) // past v0 header + flags/ctime/mtime/timescale/duration
    val v1 = Mp4.buildBox("mvhd",
      Array[Byte](1, 0, 0, 0), be64(0), be64(0), be32(600L), be64(250L), tail)
    // moov is the enclosing box: patch its size for the larger mvhd
    val moovIdx = full.indexOfSlice("moov".getBytes("US-ASCII")) - 4
    val moovSize = Mp4.u32(full, moovIdx) + (v1.length - v0.length)
    val patched = full.take(moovIdx) ++ be32(moovSize) ++
      full.slice(moovIdx + 4, idx) ++ v1 ++ full.drop(idx + v0.length)
    val v = Mp4.parse(patched).getOrElse(fail("v1 mvhd did not parse"))
    assert(v.durationMs === 416L) // 250 ticks · 1000 / 600
    assert(v.nFrames === 10L)
  }

  test("largesize (size==1 + u64) and to-EOF (size==0) framings parse") {
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val full = Mp4.write(320, 240, 10, Array.fill[Byte](64)(1))
    val mdatIdx = full.indexOfSlice("mdat".getBytes("US-ASCII")) - 4
    val head = full.take(mdatIdx)
    val payload = full.drop(mdatIdx + 8)
    // largesize: [1][mdat][u64 size][payload]
    val large = head ++ be32(1) ++ "mdat".getBytes("US-ASCII") ++
      be32(0) ++ be32(16L + payload.length) ++ payload
    assert(Mp4.parse(large).map(_.mdatBytes) === Some(payload.length.toLong))
    // to-EOF: [0][mdat][payload to end of file]
    val toEof = head ++ be32(0) ++ "mdat".getBytes("US-ASCII") ++ payload
    assert(Mp4.parse(toEof).map(_.mdatBytes) === Some(payload.length.toLong))
  }

  test("unknown boxes are skipped, not rejected (forward compatibility)") {
    val full = Mp4.write(320, 240, 10, Array.fill[Byte](64)(1))
    // prepend a top-level `free` box — real muxers emit these
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val v = Mp4.parse(free ++ full)
    assert(v.nonEmpty && v.get.nFrames === 10L)
  }

  test("mm6 fixtures: corrupt slice degrades to ok=false, rest parse clean") {
    import org.apache.spark.sql.functions._
    val df = Mp4.probeFixtures(spark, sf).toDF().cache()
    try {
      assert(df.count() === 300)
      assert(df.filter(col("media_id") % 41 === 0 && col("ok")).count() === 0)
      assert(df.filter(col("media_id") % 41 =!= 0 && !col("ok")).count() === 0)
      // spot-check the formula on one clean row
      val r = df.filter(col("media_id") === 1).head()
      assert(r.getAs[Int]("width") === 168 && r.getAs[Int]("height") === 112)
      assert(r.getAs[Long]("n_frames") === 2L)
    } finally df.unpersist()
  }
}
