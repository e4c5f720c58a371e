package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Multimodal plumbing tests: binary column in, feature rows out; the
  * decode stub is deterministic so results are assertable. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.build("graft-test")

  private def media(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, media("IMG|640|480|abcd")),
      (2L, media("AUD|1|16000|xyz")),
      (3L, media("garbage-without-header")),
      (4L, null.asInstanceOf[Array[Byte]]),
      (5L, media("VID|1920|1080|")))
      .toDF("media_id", "media").repartition(4)
  }

  test("feature extraction: schema, values, corrupt handling") {
    val feats = Multimodal.extractFeatures(df, "media_id", "media")
    assert(feats.schema === Multimodal.featureSchema)
    val byId = feats.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) === "IMG")
    assert(byId(1L).getInt(2) === 640 && byId(1L).getInt(3) === 480)
    assert(byId(1L).getLong(4) === 4)
    assert(byId(1L).getLong(5) === "abcd".getBytes.map(_ & 0xff).sum)
    assert(byId(2L).getString(1) === "AUD")
    // corrupt + null media → decode_ok = false, never an exception
    assert(!byId(3L).getBoolean(6))
    assert(!byId(4L).getBoolean(6))
    assert(byId(5L).getLong(4) === 0)
    // quarantine split by flag
    assert(feats.filter(!col("decode_ok")).count() === 2)
  }

  test("partition preservation: decode runs where the data lives") {
    val feats = Multimodal.extractFeatures(df, "media_id", "media")
    assert(feats.rdd.getNumPartitions === df.rdd.getNumPartitions)
  }

  /** Render a real PNG in-memory: w×h, pixel (x,y) = gray level g(x,y). */
  private def png(w: Int, h: Int)(g: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = g(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode: true dimensions + luminance payload") {
    val bytes = png(8, 5)((x, y) => x * 10 + y)
    assert(Multimodal.looksLikeImage(bytes))
    val d = Multimodal.decode(bytes).get
    assert(d.kind === "IMG")
    assert(d.width === 8 && d.height === 5)
    assert(d.payload.length === 40)
    // gray pixel g: BT.601 luminance of (g,g,g) is exactly g
    assert((d.payload(0) & 0xff) === 0)          // (0,0)
    assert((d.payload(8) & 0xff) === 1)          // (0,1) row-major
    assert((d.payload(39) & 0xff) === 74)        // (7,4) = 70+4
    // truncated PNG → quarantine, not exception
    assert(Multimodal.decode(bytes.take(20)) === None)
  }

  test("real PNG flows through extractFeatures next to container rows") {
    import spark.implicits._
    val bytes = png(4, 4)((_, _) => 9)
    val mixed = Seq(
      (10L, bytes),
      (11L, media("AUD|1|16000|xyz"))).toDF("media_id", "media")
    val byId = Multimodal.extractFeatures(mixed, "media_id", "media")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(10L).getString(1) === "IMG")
    assert(byId(10L).getInt(2) === 4 && byId(10L).getInt(3) === 4)
    assert(byId(10L).getLong(4) === 16)
    assert(byId(10L).getLong(5) === 16L * 9) // uniform gray 9
    assert(byId(11L).getString(1) === "AUD") // stub path intact
  }

  test("resize: exact box-filter values on a 4x4 gradient PNG") {
    import spark.implicits._
    val bytes = png(4, 4)((x, y) => x * 10 + y)
    val df2 = Seq((20L, bytes)).toDF("media_id", "media")
    val r = Multimodal.resize(df2, "media_id", "media", 2, 2).collect()
    assert(r.length === 1)
    assert(r.head.getInt(1) === 2 && r.head.getInt(2) === 2)
    val px = r.head.getAs[Array[Byte]](3).map(_ & 0xff).toSeq
    // each output pixel = floor(mean of its 2x2 box): box(0,0) =
    // {0,10,1,11} → 5, box(1,0) = {20,30,21,31} → 25, box(0,1) =
    // {2,12,3,13} → 7, box(1,1) = {22,32,23,33} → 27
    assert(px === Seq(5, 25, 7, 27))
  }

  test("resize: upscale degrades to nearest-neighbor; non-images dropped") {
    import spark.implicits._
    val one = png(1, 1)((_, _) => 42)
    val mixed = Seq(
      (30L, one),
      (31L, media("AUD|1|16000|xyz")),
      (32L, media("garbage"))).toDF("media_id", "media")
    val r = Multimodal.resize(mixed, "media_id", "media", 3, 2).collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(30L)) // images only
    assert(r.head.getAs[Array[Byte]](3).map(_ & 0xff).toSeq ===
      Seq.fill(6)(42))
  }

  test("audio framing: full windows only, centered integer energy, AUD only") {
    import spark.implicits._
    val rows = Seq(
      // payload bytes 0x80,0x84,0x7c,0x80,0x90 → centered 0,4,-4,0,16
      (50L, media("AUD|8000|1|" + new String(
        Array[Byte](0x80.toByte, 0x84.toByte, 0x7c.toByte, 0x80.toByte, 0x90.toByte),
        "ISO-8859-1"))),
      (51L, media("AUD|8000|1|ab")),    // shorter than win → 0 frames
      (52L, media("VID|1|1|abcdefgh")), // wrong kind → dropped
      (53L, media("garbage")))          // undecodable → dropped
      .toDF("media_id", "media")
    val frames = Multimodal.audioFrames(rows, "media_id", "media",
      win = 3, hop = 2).collect()
    val byId = frames.groupBy(_.getLong(0))
    // windows at offsets 0 and 2 (offset 4 is partial → excluded)
    val f = byId(50L).sortBy(_.getLong(1))
    assert(f.map(_.getLong(1)).toSeq === Seq(0L, 1L))
    assert(f.map(_.getLong(2)).toSeq === Seq(3L, 3L))
    // energies: 0²+4²+(−4)² = 32; (−4)²+0²+16² = 272
    assert(f.map(_.getLong(3)).toSeq === Seq(32L, 272L))
    assert(!byId.contains(51L) && !byId.contains(52L) && !byId.contains(53L))
  }

  test("frame sampling: every k-th chunk, empty payload yields no frames") {
    val frames = Multimodal.frameSample(df, "media_id", "media", every = 2)
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(byId(1L).length === 2) // "abcd" → ab, cd
    assert(byId(1L).map(_.getInt(1)).sorted.toSeq === Seq(0, 1))
    assert(!byId.contains(5L)) // empty payload
    assert(!byId.contains(3L)) // corrupt skipped
  }

  test("dHash: brightness-invariant perceptual hash, banded near-dup pairs") {
    import spark.implicits._
    // 9x4 fake images (identity resize): A, an exact copy of A, a
    // one-comparison perturbation of A, a brightness-shifted A, and an
    // unrelated pattern
    def img(px: Seq[Int]): Array[Byte] =
      media("IMG|9|4|" + px.map(_.toChar).mkString)
    val a = (0 until 36).map(i => 60 + (i % 9) * 5)       // rising rows
    val bumped = a.updated(1, 40)                          // flips bits around x=0/1
    val shifted = a.map(_ + 10)                            // same neighbor ORDER
    val other = (0 until 36).map(i => 200 - (i % 9) * 7)   // falling rows
    val df4 = Seq(
      (1L, img(a)), (2L, img(a)), (3L, img(bumped)),
      (4L, img(shifted)), (5L, img(other)))
      .toDF("doc_id", "media")
    val hashes = Multimodal.dHash(df4, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) === hashes(2L))
    assert(hashes(1L) === hashes(4L), "gray shift must not change the hash")
    assert(hashes(1L) !== hashes(5L))
    val d13 = java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))
    assert(d13 >= 1 && d13 <= 3, s"one-pixel bump flipped $d13 bits")
    val pairs = Multimodal.dHashNearDup(Multimodal.dHash(df4, "doc_id", "media"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 1-2-4 mutually identical (hamming 0), 3 near all of them; 5 alone
    assert(pairs.filter(_._3 == 0L).map(p => (p._1, p._2)) ===
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("dHashCrossNearDup: only train×eval pairs; equal ids are legitimate") {
    import spark.implicits._
    def img(px: Seq[Int]): Array[Byte] =
      media("IMG|9|4|" + px.map(_.toChar).mkString)
    val a = (0 until 36).map(i => 60 + (i % 9) * 5)
    val other = (0 until 36).map(i => 200 - (i % 9) * 7)
    // train: {1: a, 2: other}; eval: {1: a (same id, distinct corpus),
    // 7: a-shifted}. Expect eval 1 and 7 each matching train 1 only.
    val train = Multimodal.dHash(
      Seq((1L, img(a)), (2L, img(other))).toDF("doc_id", "media"),
      "doc_id", "media")
    val eval = Multimodal.dHash(
      Seq((1L, img(a)), (7L, img(a.map(_ + 10)))).toDF("doc_id", "media"),
      "doc_id", "media")
    val got = Multimodal.dHashCrossNearDup(train, eval)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 0L), (1L, 7L, 0L)), got.toString)
    // within-corpus pair (train 1, train 2) and (eval 1, eval 7) never
    // form — the whole point of the quadrant restriction — and the
    // unrelated train image matches nothing
    assert(!got.exists(_._1 == 2L))
  }

  test("dHash banded recall is the pigeonhole guarantee, incl. one-band damage") {
    import spark.implicits._
    // craft two hashes differing in exactly 3 bits, ALL inside one
    // 8-bit band — the adversarial case for banding (3 diffs can kill
    // at most 3 of 4 bands, so one intact band must remain)
    def imgFor(bits: Long): Array[Byte] = {
      // chained +-5 around base 128 (a run of 8 stays within 88..168,
      // never wrapping the unsigned byte range)
      val px = new Array[Int](36)
      for (y <- 0 until 4) {
        px(y * 9) = 128
        for (x <- 0 until 8) {
          val bit = (bits >> (31 - (y * 8 + x))) & 1L
          // comparison is px[x+1] > px[x]; chain values so each
          // comparison is independent: alternate base levels
          px(y * 9 + x + 1) = if (bit == 1L) px(y * 9 + x) + 5
            else px(y * 9 + x) - 5
        }
      }
      media("IMG|9|4|" + px.map(_.toChar).mkString)
    }
    val h1 = 0x0F0F0F0FL
    val h2 = h1 ^ 0x00000007L // 3 bits, all in band 0
    val df2 = Seq((1L, imgFor(h1)), (2L, imgFor(h2))).toDF("doc_id", "media")
    val hs = Multimodal.dHash(df2, "doc_id", "media")
    val got = hs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === h1 && got(2L) === h2, s"crafted hashes drifted: $got")
    val pairs = Multimodal.dHashNearDup(hs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 3L)))
  }

  test("dHash banding prunes: unrelated hashes make zero candidates") {
    import spark.implicits._
    // hashes crafted so no two images share ANY 8-bit band (band value
    // = the image index, repeated in all four bands). The guard this
    // pins: banding must cover only the REAL 32-bit hash width — bands
    // laid over the zero high bits of the packing long would collide
    // for EVERY pair (bv = 0), silently degenerating candidate
    // generation to an all-pairs product that the Hamming filter then
    // hides from every output-level test.
    val n = 40
    val hs = (1 to n).map { i =>
      val b = i.toLong
      (i.toLong, (b << 24) | (b << 16) | (b << 8) | b)
    }.toDF("media_id", "dhash")
    assert(Multimodal.dHashCandidates(hs, hashBits = 32, bands = 4).count() === 0,
      "disjoint-band hashes must generate no candidate pairs")
    // and the pair output is of course empty too
    assert(Multimodal.dHashNearDup(hs).count() === 0)
  }

  test("video frames hash exactly like the same bytes shipped as stills") {
    import spark.implicits._
    // two 9x4 frames with distinct ascii planes, packed into one VID
    // container; each frame's dhash must equal dHash of the IMG form
    val f0 = (0 until 36).map(i => ('A' + (i % 26)).toChar).mkString
    val f1 = (0 until 36).map(i => ('z' - (i % 26)).toChar).mkString
    val vid = Seq((7L, media(s"VID|9|4|$f0$f1"))).toDF("doc_id", "media")
    val stills = Seq((0L, media(s"IMG|9|4|$f0")), (1L, media(s"IMG|9|4|$f1")))
      .toDF("doc_id", "media")
    val vh = Multimodal.videoFrameHashes(vid, "doc_id", "media")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    val sh = Multimodal.dHash(stills, "doc_id", "media")
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    assert(vh === sh, "per-frame hash must equal the still-image dHash")
    // stride samples every k-th frame; ragged payloads are quarantined
    val vid4 = Seq((8L, media(s"VID|9|4|$f0$f1$f0$f1"))).toDF("doc_id", "media")
    assert(Multimodal.videoFrameHashes(vid4, "doc_id", "media", stride = 2)
      .collect().map(_.getInt(1)).toSet === Set(0, 2))
    val ragged = Seq((9L, media("VID|9|4|short"))).toDF("doc_id", "media")
    assert(Multimodal.videoFrameHashes(ragged, "doc_id", "media").count() === 0)
  }

  test("videoNearDup: minMatches floor and banded pruning") {
    import spark.implicits._
    // crafted frame hashes: videos 1/2 share TWO identical frames,
    // videos 1/3 share only ONE — the floor keeps (1,2), drops (1,3).
    // band-disjoint filler (video 4) generates no candidates at all.
    def quad(b: Long) = (b << 24) | (b << 16) | (b << 8) | b
    val hs = Seq(
      (1L, 0, quad(10)), (1L, 1, quad(11)), (1L, 2, quad(12)),
      (2L, 0, quad(10)), (2L, 1, quad(11)), (2L, 2, quad(33)),
      (3L, 0, quad(12)), (3L, 1, quad(34)), (3L, 2, quad(35)),
      (4L, 0, quad(60)), (4L, 1, quad(61)), (4L, 2, quad(62)))
      .toDF("media_id", "frame_no", "dhash")
    val got = Multimodal.videoNearDup(hs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L)),
      s"expected only the 2-frame match to clear minMatches=2: $got")
    // floor of 1 admits the single-frame overlap too
    val loose = Multimodal.videoNearDup(hs, minMatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loose === Set((1L, 2L, 2L), (1L, 3L, 1L)))
  }

  test("audioFingerprint: delta signs, volume invariance, short-audio drop") {
    import spark.implicits._
    // 3 frames (win=4, hop=4, bits=2): energies 4·1², 4·3², 4·2² →
    // deltas (up, down) → fingerprint 0b10 = 2
    def pcm(vals: Int*): String = vals.map(v => (128 + v).toChar).mkString
    val quiet = pcm(1,1,1,1, 3,3,3,3, 2,2,2,2)
    val loud  = pcm(2,2,2,2, 6,6,6,6, 4,4,4,4) // 2x amplitude
    val df3 = Seq(
      (1L, media(s"AUD|8|1|$quiet")),
      (2L, media(s"AUD|8|1|$loud")),
      (3L, media(s"AUD|8|1|${pcm(1,1,1,1)}"))) // 1 frame: too short
      .toDF("doc_id", "media")
    val got = Multimodal.audioFingerprint(df3, "doc_id", "media",
        win = 4, hop = 4, bits = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L),
      s"expected fp=0b10 for both volumes, short audio dropped: $got")
    // and the near-dup wrapper pairs them through the shared banded path
    val fps = Seq((1L, 2L), (2L, 2L)).toDF("media_id", "afp")
    val pairs = Multimodal.audioNearDup(fps, bits = 2, bands = 2,
        maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
  }

  test("dHash flows through real PNG decode (resize path, not the stub)") {
    import spark.implicits._
    // a 36x16 real PNG with a horizontal gradient: every resized
    // neighbor comparison is "brighter to the right" -> all-ones hash
    val grad = png(36, 16)((x, _) => 40 + x * 5)
    val dfp = Seq((7L, grad)).toDF("doc_id", "media")
    val h = Multimodal.dHash(dfp, "doc_id", "media")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(7L) === 0xFFFFFFFFL, f"expected all-ones, got ${h(7L)}%08x")
  }
}
