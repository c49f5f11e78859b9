package graft.functions

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioSystem, UnsupportedAudioFileException}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real audio decode on the JDK's public sampled-audio API
  * (javax.sound.sampled — headless-safe, no native deps): WAV/AIFF/AU
  * containers to (sample rate, channels, bits, frame count, PCM
  * digest). The [[ImageExpressions]] pattern applied to the second
  * modality: a CodegenFallback expression for the declarative /
  * oracle-checked path (container parsing dominates evaluation) and an
  * `ops.Multimodal` mapPartitions twin for the per-partition-init
  * shape a heavier codec (MP3/Opus via FFI) would use.
  *
  * Determinism contract: the digest covers the raw PCM frame bytes in
  * stream order, exactly as stored in the container — WAV PCM is
  * uncompressed, so decode is lossless and bit-stable. Expectations in
  * the golden fixture (graft.MakeAudioFixtures) come from this same
  * decoder. */
object AudioExpressions {

  /** (sampleRate, channels, bitsPerSample, frames, pcm md5) for
    * decodable bytes; None when no registered reader accepts them. */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Int, Long, String)] = {
    val in =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch {
        case _: UnsupportedAudioFileException | _: java.io.IOException => null
      }
    if (in == null) None
    else
      try {
        val f = in.getFormat
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
        Some((f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
          in.getFrameLength, md.digest().map("%02x".format(_)).mkString))
      } catch {
        // a well-formed header over truncated frames: drop, don't fail
        case _: java.io.IOException => None
      } finally in.close()
  }

  val DecodedType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("pcm_md5", StringType, nullable = false)))

  /** binary → struct(sample_rate, channels, bits, n_frames, pcm_md5);
    * null for undecodable bytes (drop-don't-fail, as with images). */
  case class AudioDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DecodedType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"audio_decode expects binary, got ${child.dataType}")
    }
    override protected def nullSafeEval(input: Any): Any =
      decodeAudio(input.asInstanceOf[Array[Byte]]) match {
        case Some((sr, ch, b, fr, m)) =>
          InternalRow(sr, ch, b, fr, UTF8String.fromString(m))
        case None => null
      }
    override def prettyName: String = "audio_decode"
    override protected def withNewChildInternal(newChild: Expression): AudioDecode =
      copy(child = newChild)
  }

  def audio_decode(payload: Column): Column =
    ColumnBridge.column(AudioDecode(ColumnBridge.expression(payload)))
}
