package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, explode, expr}
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * Decode is two-tiered. Real image bytes (PNG/BMP/GIF, sniffed by magic
  * number) decode through `javax.imageio` — pure JVM, no native deps —
  * yielding true dimensions plus a luminance-plane payload. Everything
  * else falls through to the deterministic fake-container STUB
  * (`decodeStub`): this container ships no audio/video libraries, so
  * those kinds parse a fake header instead. A production decoder (JavaCV,
  * ffmpeg-over-pipe) drops into the same seam: bytes in,
  * Option[Decoded] out.
  *
  * Scale notes: decode runs inside mapPartitions so the (expensive)
  * decoder initializes once per partition, not per row; ImageIO's disk
  * cache is disabled (executor-local tmp churn); output rows are small
  * feature structs, so a decode stage can follow a pruned binary-column
  * scan without shuffling media bytes anywhere.
  */
object Multimodal {

  /** Decoded media header: kind + dimensions + payload. */
  final case class Decoded(kind: String, width: Int, height: Int,
      payload: Array[Byte])

  /** Magic-number sniff: only bytes that claim to be a real image pay
    * for an ImageIO probe. PNG \x89PNG, BMP "BM", GIF "GIF8". */
  def looksLikeImage(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && {
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') ||
      (bytes(0) == 'B' && bytes(1) == 'M') ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8')
    }

  /** Real image decode via javax.imageio. Payload is the 8-bit luminance
    * plane (integer BT.601 weights — deterministic across JVMs), so
    * byte_sum downstream is a real, stable image statistic. Corrupt or
    * truncated image bytes → None (quarantine), never an exception. */
  def decodeImage(bytes: Array[Byte]): Option[Decoded] =
    try {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val out = new Array[Byte](w * h)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            out(i) = lum.toByte
            i += 1
            x += 1
          }
          y += 1
        }
        Some(Decoded("IMG", w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decoder for the kinds with no pure-JVM codec here. Fake
    * container format: `K|w|h|payload-bytes` where K is IMG/AUD/VID.
    * A real decoder keeps this exact signature: bytes in,
    * Option[Decoded] out (None = corrupt → quarantine). */
  def decodeStub(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null) return None
    val s = new String(bytes, "ISO-8859-1")
    val parts = s.split("\\|", 4)
    if (parts.length != 4) return None
    val kind = parts(0)
    if (!Set("IMG", "AUD", "VID").contains(kind)) return None
    for {
      w <- parts(1).toIntOption
      h <- parts(2).toIntOption
    } yield Decoded(kind, w, h, parts(3).getBytes("ISO-8859-1"))
  }

  /** The decode seam used by the operators: real images through ImageIO,
    * everything else through the container stub. */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    if (bytes == null) None
    else if (looksLikeImage(bytes)) decodeImage(bytes)
    else decodeStub(bytes)

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_payload_bytes", LongType),
    StructField("byte_sum", LongType),     // stand-in for real features
    StructField("decode_ok", BooleanType)))

  /** Decode + feature-extract: one pass, partition-preserving; corrupt
    * media yields a row with decode_ok=false (quarantine by filter). */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val idIdx = df.columns.indexOf(idCol)
    val mIdx = df.columns.indexOf(mediaCol)
    require(idIdx >= 0 && mIdx >= 0, s"missing $idCol/$mediaCol")
    val rdd = df.rdd.mapPartitions { it =>
      // decoder init would happen here, once per partition
      it.map { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        decode(bytes) match {
          case Some(d) =>
            var sum = 0L
            d.payload.foreach(b => sum += (b & 0xff))
            Row(id, d.kind, d.width, d.height, d.payload.length.toLong, sum, true)
          case None =>
            Row(id, null, null, null, null, null, false)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Deterministic box-filter downscale of the decoded luminance plane —
    * the multimodal "resize" op. Output pixel (ox,oy) = floor(mean) of
    * its source box; integer accumulation only, so results are
    * bit-identical across JVMs (no float rounding drift between
    * executors). Targets larger than the source degrade to
    * nearest-neighbor (every box is clamped to at least one source
    * pixel). Non-image or undecodable rows are dropped — quarantine
    * them upstream via [[extractFeatures]]'s decode_ok flag. Same
    * mapPartitions shape as the other ops: media bytes never shuffle,
    * and the output is a fixed outW*outH bytes per row regardless of
    * source size. */
  def resize(df: DataFrame, idCol: String, mediaCol: String,
      outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "target dimensions must be positive")
    // Int-overflow guard: outW*outH sizes a byte array, and box indices
    // multiply target by source dims — 46341² already wraps negative
    require(outW.toLong * outH <= Int.MaxValue / 4,
      s"target $outW x $outH exceeds the supported pixel count")
    val spark = df.sparkSession
    val idIdx = df.columns.indexOf(idCol)
    val mIdx = df.columns.indexOf(mediaCol)
    require(idIdx >= 0 && mIdx >= 0, s"missing $idCol/$mediaCol")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", BinaryType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        decode(bytes) match {
          // LONG product: stub headers are attacker/corruption input,
          // and an Int w*h wraps (65536x65536 -> 0) past this guard
          // into out-of-bounds pixel reads — quarantine, never crash
          case Some(d) if d.kind == "IMG" && d.width > 0 && d.height > 0 &&
              d.payload.length.toLong == d.width.toLong * d.height =>
            Some(Row(id, outW, outH,
              boxResize(d.payload, d.width, d.height, outW, outH)))
          case _ => None
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** The integer box-filter core of [[resize]]: output pixel = floor
    * mean of its clamped source box. Shared with the per-frame video
    * path so a frame hashes exactly like the same bytes as an image. */
  private[operators] def boxResize(payload: Array[Byte], w: Int, h: Int,
      outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    var oy = 0
    while (oy < outH) {
      // Long box arithmetic: oy*height can exceed Int for tall
      // targets over tall sources even when both fit individually
      val y0 = (oy.toLong * h / outH).toInt
      val y1 = math.max(y0 + 1, ((oy + 1).toLong * h / outH).toInt)
      var ox = 0
      while (ox < outW) {
        val x0 = (ox.toLong * w / outW).toInt
        val x1 = math.max(x0 + 1, ((ox + 1).toLong * w / outW).toInt)
        var sum = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            sum += (payload(y * w + x) & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        out(oy * outW + ox) = (sum / n).toByte
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** MSB-first bit pack of the horizontal neighbor comparisons of a
    * (hashW+1)×hashH plane — [[dHash]]'s kernel, shared with
    * [[videoFrameHashes]]. */
  private[operators] def dhashBits(px: Array[Byte], hashW: Int,
      hashH: Int): Long = {
    var bits = 0L
    var y = 0
    while (y < hashH) {
      var x = 0
      while (x < hashW) {
        val a = px(y * (hashW + 1) + x) & 0xff
        val b = px(y * (hashW + 1) + x + 1) & 0xff
        bits = (bits << 1) | (if (b > a) 1L else 0L)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Perceptual difference-hash (dHash) over decoded images — the
    * standard near-duplicate fingerprint for image corpora (resize to
    * (hashW+1)×hashH, one bit per horizontal neighbor comparison,
    * row-major MSB-first into a LONG). Built ON [[resize]]'s
    * integer-exact box filter, so the hash is a pure integer function
    * of the pixels: bit-identical across JVMs and SQL-reproducible
    * when the source is already (hashW+1)×hashH (identity resize).
    * Gray-level shifts preserve the bits (neighbor ORDER survives
    * brightness changes) — the property that makes dHash a NEAR-dup
    * key where byte hashing only catches exact copies. Undecodable
    * media simply yields no row (the quarantine posture of resize).
    * hashW·hashH ≤ 64 so the hash packs one BIGINT. */
  def dHash(df: DataFrame, idCol: String, mediaCol: String,
      hashW: Int = 8, hashH: Int = 4): DataFrame = {
    require(hashW >= 1 && hashH >= 1 && hashW * hashH <= 64,
      s"dHash grid $hashW x $hashH must pack into 64 bits")
    val spark = df.sparkSession
    val resized = resize(df, idCol, mediaCol, hashW + 1, hashH)
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType)))
    val w = hashW
    val h = hashH
    val rdd = resized.rdd.mapPartitions { it =>
      it.map { r =>
        Row(r.getLong(0), dhashBits(r.getAs[Array[Byte]](3), w, h))
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Near-duplicate image pairs by banded dHash Hamming distance — the
    * s01 (SimHash text) scheme carried to the image side: the 32-bit
    * default hash splits into 4 bands of 8 bits; candidates share a
    * band bucket; true Hamming ≤ `maxHamming` verifies. Recall is a
    * PIGEONHOLE GUARANTEE, not a probability: ≤ 3 differing bits touch
    * at most 3 of the 4 bands, so every qualifying pair shares an
    * intact band (maxHamming must stay < bands for the argument).
    * Candidate generation joins (band, value, id) rows only — image
    * bytes never shuffle, identical-image buckets are AQE-splittable
    * skew, never a content move.
    *
    * `hashBits` must be the REAL packed width from [[dHash]]
    * (hashW·hashH; 32 for the default 8×4 grid) — banding over the
    * full 64-bit long would make every band above the hash width
    * identically zero for every image, silently degenerating those
    * bands' buckets into an all-pairs cross product: output still
    * correct (the Hamming filter saves it), but the LSH pruning the
    * operator exists for is gone at corpus scale. */
  def dHashNearDup(hashes: DataFrame, hashBits: Int = 32, bands: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming $maxHamming needs < $bands bands for guaranteed recall")
    dHashCandidates(hashes, hashBits, bands)
      // filter BEFORE the dedup: multi-band collisions of non-near
      // pairs would otherwise ride through the distinct's shuffle just
      // to be dropped after
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Cross-corpus variant of [[dHashNearDup]] — the PERCEPTUAL level
    * of the contamination-screen family (exact n-grams → c03/c18,
    * fuzzy text → m07, embeddings → e24, images → here): which eval
    * images sit within `maxHamming` of ANY train image. Same band
    * scheme ([[bandedHammingPairs]]'s unsigned shift + mask keys, same
    * pigeonhole recall), with the join RESTRICTED to train×eval —
    * within-corpus pairs never form, and no id inequality: the two
    * corpora are distinct tables, so equal ids are distinct images and
    * a legitimate pair. Output (train_id, eval_id, hamming), one row
    * per qualifying pair. */
  def dHashCrossNearDup(train: DataFrame, eval: DataFrame,
      hashBits: Int = 32, bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bands,
      s"maxHamming $maxHamming needs < $bands bands for guaranteed recall")
    val t = bandKeys(train, hashBits, bands)
    val e = bandKeys(eval, hashBits, bands)
    t.as("x").join(e.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv"))
      .select(col("x.media_id").as("train_id"),
        col("y.media_id").as("eval_id"),
        expr("bit_count(x.dhash ^ y.dhash)").cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The pre-filter candidate relation of [[dHashNearDup]]: one row per
    * (ordered pair, shared band) collision, WITH multiplicity. Exposed
    * package-private so MultimodalSpec can pin the pruning property —
    * unrelated images must generate ≪ n² candidates, the invariant the
    * Hamming filter's correctness silently masks. */
  private[graft] def dHashCandidates(hashes: DataFrame, hashBits: Int,
      bands: Int): DataFrame =
    bandedHammingPairs(hashes, hashBits, bands, Nil)

  /** THE banded-Hamming candidate join — one definition for the image
    * ([[dHashCandidates]]) and video ([[videoNearDup]]) paths, so the
    * banding scheme and its pigeonhole-recall argument cannot drift
    * between them. Explodes each row into (bi, bv) band keys — by
    * UNSIGNED shift + mask, not div/mod: a 64-bit hash with the top
    * bit set is a NEGATIVE long, and arithmetic div would corrupt its
    * band values — and joins rows sharing a band, ordered
    * media_id < media_id. `carry` columns ride through as
    * `<name>_a`/`<name>_b` beside (id_a, id_b, hamming). */
  /** (media_id, dhash, carry..., bi, bv) band-key frame — the shared
    * banding of [[bandedHammingPairs]] and [[dHashCrossNearDup]]. */
  private def bandKeys(hashes: DataFrame, hashBits: Int, bands: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(hashBits >= 1 && hashBits <= 64,
      s"hashBits $hashBits must be in [1, 64]")
    require(bands >= 1 && hashBits % bands == 0,
      s"bands $bands must divide hashBits $hashBits")
    val width = hashBits / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    hashes.select(
      (Seq(col("media_id"), col("dhash")) ++ carry.map(col) :+
        explode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> struct(b as bi, " +
          s"shiftrightunsigned(dhash, b * $width) & ${mask}L as bv))"))
          .as("band")): _*)
      .select((Seq(col("media_id"), col("dhash")) ++ carry.map(col) ++
        Seq(col("band.bi").as("bi"), col("band.bv").as("bv"))): _*)
  }

  private def bandedHammingPairs(hashes: DataFrame, hashBits: Int,
      bands: Int, carry: Seq[String]): DataFrame = {
    val banded = bandKeys(hashes, hashBits, bands, carry)
    banded.as("x").join(banded.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select((Seq(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        expr("bit_count(x.dhash ^ y.dhash)").cast("bigint").as("hamming")) ++
        carry.flatMap(c =>
          Seq(col(s"x.$c").as(s"${c}_a"), col(s"y.$c").as(s"${c}_b")))): _*)
  }

  /** Per-frame perceptual hashes of a VIDEO column: decode the
    * container, split the payload into fixed (width·height)-byte
    * frames, keep every `stride`-th (the sampling dial — hashing every
    * frame of real video is wasted work; near-dup detection needs a
    * sparse signature), and dHash each frame through the SAME integer
    * resize → neighbor-compare kernel as [[dHash]], so a frame hashes
    * bit-identically to the same bytes shipped as a still image.
    * Output (media_id, frame_no, dhash) — fixed-width rows; video
    * bytes never leave the decoding partition. Videos whose payload is
    * not a whole number of frames are dropped (the quarantine
    * posture). */
  def videoFrameHashes(df: DataFrame, idCol: String, mediaCol: String,
      stride: Int = 1, hashW: Int = 8, hashH: Int = 4): DataFrame = {
    require(stride >= 1, s"stride $stride")
    require(hashW >= 1 && hashH >= 1 && hashW * hashH <= 64,
      s"dHash grid $hashW x $hashH must pack into 64 bits")
    val spark = df.sparkSession
    val idIdx = df.columns.indexOf(idCol)
    val mIdx = df.columns.indexOf(mediaCol)
    require(idIdx >= 0 && mIdx >= 0, s"missing $idCol/$mediaCol")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("dhash", LongType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        decode(bytes) match {
          // LONG frame size: an Int w*h wraps on corrupt headers
          // (65536x65536 -> 0 -> modulo-by-zero; 65537x65536 -> false
          // pass -> out-of-bounds frame reads) — quarantine, never
          // crash. A frame must also individually fit an array.
          case Some(d) if d.kind == "VID" && d.width > 0 && d.height > 0 &&
              d.width.toLong * d.height <= Int.MaxValue &&
              d.payload.length > 0 &&
              d.payload.length.toLong % (d.width.toLong * d.height) == 0 =>
            val fSize = d.width * d.height
            val n = d.payload.length / fSize
            (0 until n by stride).iterator.map { f =>
              val frame = java.util.Arrays.copyOfRange(
                d.payload, f * fSize, (f + 1) * fSize)
              val px = boxResize(frame, d.width, d.height, hashW + 1, hashH)
              Row(id, f, dhashBits(px, hashW, hashH))
            }
          case _ => Iterator.empty
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Video near-duplicates over a [[videoFrameHashes]] frame: two
    * videos pair when at least `minMatches` DISTINCT sampled-frame
    * pairs collide within `maxHamming` bits — trims, re-encodes, and
    * overlay edits perturb individual frames, but a shared scene keeps
    * enough near-identical frames to clear the floor. Candidate
    * generation is [[dHashNearDup]]'s banded scheme per FRAME (same
    * pigeonhole recall per frame pair; `hashBits` must again be the
    * real packed width), joining only (band, value, video, frame)
    * rows; the Hamming filter runs before the distinct's shuffle and
    * the final aggregate moves one row per surviving frame pair.
    * Output (vid_a, vid_b, matched_frames), vid_a < vid_b. */
  def videoNearDup(frameHashes: DataFrame, hashBits: Int = 32,
      bands: Int = 4, maxHamming: Int = 3, minMatches: Int = 2): DataFrame = {
    require(hashBits >= 1 && hashBits <= 64,
      s"hashBits $hashBits must be in [1, 64]")
    require(bands >= 1 && hashBits % bands == 0,
      s"bands $bands must divide hashBits $hashBits")
    require(maxHamming < bands,
      s"maxHamming $maxHamming needs < $bands bands for guaranteed recall")
    require(minMatches >= 1, s"minMatches $minMatches")
    bandedHammingPairs(frameHashes, hashBits, bands, Seq("frame_no"))
      // Hamming filter BEFORE the distinct's shuffle, as in dHashNearDup
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a").as("vid_a"), col("frame_no_a").as("fa"),
        col("id_b").as("vid_b"), col("frame_no_b").as("fb"))
      .distinct()
      .groupBy("vid_a", "vid_b")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("matched_frames"))
      .filter(col("matched_frames") >= minMatches)
  }

  /** Acoustic fingerprint: the sign of consecutive FRAME-ENERGY deltas
    * packed MSB-first into a long — the audio member of the perceptual
    * near-dup family ([[dHash]] for stills, [[videoFrameHashes]] for
    * video). Energy is [[audioFrames]]'s exact integer Σ(s−128)² per
    * win/hop window, so the fingerprint is a pure integer function of
    * the samples (bit-identical cross-engine); level changes scale all
    * energies together, so the delta SIGNS — like dHash's neighbor
    * order — survive volume normalization, which byte hashing does
    * not. Needs `bits`+1 full frames; shorter audio yields no row
    * (quarantine posture). */
  def audioFingerprint(df: DataFrame, idCol: String, mediaCol: String,
      win: Int, hop: Int, bits: Int = 32): DataFrame = {
    require(win > 0 && hop > 0, "window and hop must be positive")
    require(bits >= 1 && bits <= 64, s"bits $bits must pack into a long")
    val spark = df.sparkSession
    val idIdx = df.columns.indexOf(idCol)
    val mIdx = df.columns.indexOf(mediaCol)
    require(idIdx >= 0 && mIdx >= 0, s"missing $idCol/$mediaCol")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("afp", LongType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        decode(if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx))
          .toSeq.flatMap {
            case d if d.kind == "AUD" &&
                d.payload.length >= win + bits.toLong * hop =>
              val e = new Array[Long](bits + 1)
              var f = 0
              while (f <= bits) {
                var sum = 0L
                var j = 0
                while (j < win) {
                  val v = (d.payload(f * hop + j) & 0xff) - 128
                  sum += v.toLong * v
                  j += 1
                }
                e(f) = sum
                f += 1
              }
              var fp = 0L
              var i = 0
              while (i < bits) {
                fp = (fp << 1) | (if (e(i + 1) > e(i)) 1L else 0L)
                i += 1
              }
              Seq(Row(id, fp))
            case _ => Nil
          }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Audio near-duplicates over an [[audioFingerprint]] frame — the
    * same banded-Hamming candidate scheme as the image/video paths
    * (one definition: this delegates to [[dHashNearDup]]), with the
    * same pigeonhole recall (maxHamming < bands). Default dials: 32
    * fingerprint bits in 4 bands of 8 — at 16 bits a random pair sits
    * within Hamming 3 with p ≈ 1%, which floods a corpus-scale join
    * with accidental pairs; 32 bits puts that at ~1e-6. */
  def audioNearDup(fps: DataFrame, bits: Int = 32, bands: Int = 4,
      maxHamming: Int = 3): DataFrame =
    dHashNearDup(fps.select(col("media_id"), col("afp").as("dhash")),
      bits, bands, maxHamming)

  /** Audio framing — THE audio-pipeline primitive (every downstream
    * feature: energy/VAD, spectrograms, wav2vec windows, starts from
    * framed samples): slide a `win`-sample window by `hop` over the
    * decoded payload (8-bit unsigned PCM semantics, center 128) and
    * emit per-frame sample count + integer energy Σ(s−128)². Full
    * frames only — the standard framing convention, and what keeps the
    * output shape a pure function of payload length. Integer
    * arithmetic end-to-end, so frames are bit-identical across JVMs
    * and against the SQL oracle. Same mapPartitions shape as the other
    * decode ops: media bytes never shuffle; output rows are
    * fixed-width frame features. */
  def audioFrames(df: DataFrame, idCol: String, mediaCol: String,
      win: Int, hop: Int): DataFrame = {
    require(win > 0 && hop > 0, "window and hop must be positive")
    val spark = df.sparkSession
    val idIdx = df.columns.indexOf(idCol)
    val mIdx = df.columns.indexOf(mediaCol)
    require(idIdx >= 0 && mIdx >= 0, s"missing $idCol/$mediaCol")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", LongType),
      StructField("n_samples", LongType),
      StructField("energy", LongType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        decode(if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx))
          .toSeq.flatMap {
            case d if d.kind == "AUD" =>
              var frames = List.newBuilder[Row]
              var off = 0
              var no = 0L
              while (off + win <= d.payload.length) {
                var e = 0L
                var j = 0
                while (j < win) {
                  val v = (d.payload(off + j) & 0xff) - 128
                  e += v.toLong * v
                  j += 1
                }
                frames += Row(id, no, win.toLong, e)
                no += 1
                off += hop
              }
              frames.result()
            case _ => Nil
          }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame-sample stand-in: pick every k-th byte of the payload as the
    * "frames" of a video column — the real version samples decoded
    * frames; the partition/batch shape is identical. */
  def frameSample(df: DataFrame, idCol: String, mediaCol: String,
      every: Int): DataFrame = {
    require(every >= 1, s"every $every must be positive")
    val spark = df.sparkSession
    val idIdx = df.columns.indexOf(idCol)
    val mIdx = df.columns.indexOf(mediaCol)
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idIdx)
        decode(if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx))
          .toSeq.flatMap { d =>
            d.payload.grouped(every).zipWithIndex.map { case (chunk, i) =>
              Row(id, i, chunk.take(1))
            }
          }
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
