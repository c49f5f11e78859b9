package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` payloads with typed metadata; decode/feature steps
  * run per-partition in batches.
  *
  * The decode itself is STUBBED (no codec libraries in this environment):
  * `fakeDecode` derives deterministic pseudo-features from the bytes. The
  * Spark-side plumbing is real — schema, per-partition batching,
  * mapPartitions signature — exactly where a JNI/FFI decoder would slot
  * in. At 100 TB the decode stage is partition-parallel with no shuffle:
  * features attach to rows in place.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte],
                            media_type: String)
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Int, width: Int, height: Int,
                                 checksum: String)

  /** Synthesize a binary payload column from text (stand-in for real image
    * bytes; the engine treats it as opaque either way). */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"),
      concat(lit("image/fake-"), col("doc_id") % 3).as("media_type"))

  /** STUB decoder: deterministic pseudo-dimensions + md5 checksum. A real
    * implementation calls the codec here, batch-per-partition. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val n = bytes.length
    (n % 640, (n * 7) % 480, hex)
  }

  final case class ResizedMedia(doc_id: Long, media_type: String,
                                width: Int, height: Int,
                                thumbnail: Array[Byte])

  /** STUB resize: deterministic fake — a real implementation calls the
    * image library here. The "thumbnail" is a strided byte sample of the
    * payload (content-dependent, reproducible); dims are the requested
    * target. Same per-partition batch boundary as decodeFeatures. */
  def resizeStub(media: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    media.as[MediaRow](Encoders.product[MediaRow]).mapPartitions { rows =>
      // per-partition init of a real codec would go here
      rows.map { r =>
        val stride = math.max(1, r.payload.length / (targetW * targetH / 64 + 1))
        val thumb = r.payload.indices.by(stride).map(r.payload).toArray
        ResizedMedia(r.doc_id, r.media_type, targetW, targetH, thumb)
      }
    }
  }

  /** Per-partition batch "decode": the mapPartitions boundary a native
    * decoder needs (amortized codec init per partition, not per row). */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.as[MediaRow](Encoders.product[MediaRow]).mapPartitions { rows =>
      // per-partition init of a real decoder would go here
      rows.map { r =>
        val (w, h, sum) = fakeDecode(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length, w, h, sum)
      }
    }
  }

  /** Frame sampling: treat the payload as a sequence of fixed-size
    * frames, keep every `every`-th, one output row per sampled frame
    * (the video-keyframe extraction shape: generator fan-out, per-frame
    * checksum, no shuffle). */
  def frameSample(docs: DataFrame, textCol: String = "text",
                  frameChars: Int = 64, every: Int = 4): DataFrame = {
    val frames = expr(
      s"""CASE WHEN length($textCol) = 0 THEN array()
          ELSE transform(
            sequence(0, cast(ceil(length($textCol) / $frameChars.0) as int) - 1),
            i -> substring($textCol, i * $frameChars + 1, $frameChars)) END""")
    docs.select(col("doc_id"), posexplode(frames).as(Seq("frame_idx", "frame")))
      .where(col("frame_idx") % every === 0)
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(to_binary(col("frame"), lit("utf-8"))).as("frame_md5"))
  }

  /** Expression-only twin of decodeFeatures (same output, pure Catalyst —
    * used by the oracle-checked query; proves the two paths agree). */
  def decodeFeaturesExpr(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      (length(col("payload")) % 640).cast("long").as("width"),
      ((length(col("payload")) * 7) % 480).cast("long").as("height"),
      md5(col("payload")).as("checksum"))
}
