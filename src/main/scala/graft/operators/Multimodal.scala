package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The decode step is a STUB (`decodeStub`): this container ships no
  * image/audio libraries, so it parses a deterministic fake header
  * instead. The Spark-side shape — schema contract, per-partition
  * batching, partition preservation, null/corrupt handling — is real and
  * is what a production decoder (JavaCV, TwelveMonkeys, ffmpeg-over-pipe)
  * would drop into: replace `decodeStub` body, keep the signature.
  *
  * Scale notes: decode runs inside mapPartitions so the (expensive)
  * decoder initializes once per partition, not per row; output rows are
  * small feature structs, so a decode stage can follow a pruned
  * binary-column scan without shuffling media bytes anywhere.
  */
object Multimodal {

  /** Decoded media header: kind + dimensions + payload. */
  final case class Decoded(kind: String, width: Int, height: Int,
      payload: Array[Byte])

  /** STUB decoder. Fake container format: `K|w|h|payload-bytes` where K
    * is IMG/AUD/VID. A real decoder keeps this exact signature:
    * bytes in, Option[Decoded] out (None = corrupt → quarantine). */
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
        decodeStub(bytes) match {
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

  /** Frame-sample stand-in: pick every k-th byte of the payload as the
    * "frames" of a video column — the real version samples decoded
    * frames; the partition/batch shape is identical. */
  def frameSample(df: DataFrame, idCol: String, mediaCol: String,
      every: Int): DataFrame = {
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
        decodeStub(if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx))
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
