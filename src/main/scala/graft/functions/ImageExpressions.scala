package graft.functions

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Real image decode on the JDK's public codec API (javax.imageio) —
  * no external native libraries, so it runs wherever the engine does.
  *
  * Layering: the pixel-level helpers live HERE (functions depends on
  * nothing in ops) and `ops.Multimodal` builds its batch operators on
  * top, in both of its twin shapes — the [[ImageDecode]] Catalyst
  * expression for the declarative/oracle-checked path, and a
  * `mapPartitions` path where a heavier codec (JNI/FFI) would slot in
  * with per-partition init. The expression is CodegenFallback by
  * design: the PNG/JPEG inflate dominates evaluation by orders of
  * magnitude, so fusing the surrounding row code buys nothing
  * (contrast [[VectorExpressions]], where the arithmetic IS the cost).
  *
  * Determinism contract: the pixel digest is computed over `getRGB`
  * values — the colorspace-normalized 8-bit ARGB view — in row-major
  * order, independent of the decoder's internal raster layout. PNG
  * decode is lossless and bit-stable; JPEG decode is deterministic for
  * a given JDK decoder, and the fixture expectations are produced by
  * the same decoder (golden-file semantics).
  */
object ImageExpressions {

  /** (width, height, bands, row-major RGB md5) for decodable bytes;
    * None for bytes no registered reader accepts (truncated files,
    * non-image payloads). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, String)] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) None
    else Some((img.getWidth, img.getHeight,
      img.getRaster.getNumBands, pixelMd5(img)))
  }

  /** md5 over every pixel's 8-bit (R, G, B) triple in row-major order.
    * `getRGB` normalizes through the color model, so the digest is a
    * function of the IMAGE, not of the decoder's raster layout. */
  def pixelMd5(img: BufferedImage): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](3)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        buf(0) = ((rgb >> 16) & 0xff).toByte
        buf(1) = ((rgb >> 8) & 0xff).toByte
        buf(2) = (rgb & 0xff).toByte
        md.update(buf)
        x += 1
      }
      y += 1
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Bilinear resize to (targetW, targetH) and PNG re-encode — the
    * thumbnail shape. Software Graphics2D on a TYPE_3BYTE_BGR target:
    * pure-Java rasterization, no display pipeline, so the output bytes
    * are reproducible (spec-asserted). PNG out regardless of the input
    * codec: thumbnails re-encode lossless so a second resize pass
    * never compounds JPEG loss. */
  def resizeToPng(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val src =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (src == null) None
    else {
      val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_3BYTE_BGR)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      Some(encodePng(dst))
    }
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  val DecodedType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixel_md5", StringType, nullable = false)))

  /** binary → struct(width, height, channels, pixel_md5); null for
    * undecodable bytes (the caller decides drop-vs-flag semantics —
    * a corrupt object in a 100 TB crawl must never fail the stage). */
  case class ImageDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = DecodedType
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_decode expects binary, got ${child.dataType}")
    }
    override protected def nullSafeEval(input: Any): Any =
      decodeImage(input.asInstanceOf[Array[Byte]]) match {
        case Some((w, h, c, m)) =>
          InternalRow(w, h, c, UTF8String.fromString(m))
        case None => null
      }
    override def prettyName: String = "image_decode"
    override protected def withNewChildInternal(newChild: Expression): ImageDecode =
      copy(child = newChild)
  }

  def image_decode(payload: Column): Column =
    ColumnBridge.column(ImageDecode(ColumnBridge.expression(payload)))
}
