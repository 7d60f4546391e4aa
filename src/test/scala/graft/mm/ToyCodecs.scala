package graft.mm

import java.io.{ByteArrayInputStream, InputStream}

import javax.imageio.{ImageReader, ImageTypeSpecifier}
import javax.imageio.spi.ImageReaderSpi
import javax.imageio.stream.ImageInputStream
import javax.sound.sampled.{AudioFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, FormatConversionProvider}

/** Test-scope "codec jars": a toy image format plus a toy compressed
  * audio format, registered through the STANDARD JDK SPI seams
  * (`javax.imageio.spi.ImageReaderSpi` programmatically;
  * `javax.sound.sampled.spi.*` via META-INF/services in test
  * resources). They exist to prove the Multimodal decoder claim that
  * "a codec SPI jar on the classpath swaps in with no plumbing
  * change": [[Multimodal.decodePixels]] and [[Multimodal.decodeAudio]]
  * are NOT modified in any way for these formats — the specs feed toy
  * payloads through the same public API and the routing happens
  * entirely inside the JDK registries the decoders already probe.
  *
  * Toy image format `TOYI`: magic "TOYI", then unsigned byte width,
  * unsigned byte height, then w*h*3 row-major RGB bytes.
  *
  * Toy audio container: magic "TOYA" carries encoding TOYENC (one
  * signed byte per frame, mono, 8 kHz) for which the toy
  * FormatConversionProvider offers a real PCM_SIGNED/16 transcode
  * (sample = byte << 8); magic "TOYB" carries encoding TOYRAW for
  * which NO transcoder is registered — the decoder must route it to
  * the per-row error channel with the container params intact.
  */
object ToyCodecs {
  val ImageMagic: Array[Byte] = "TOYI".getBytes("US-ASCII")
  val AudioMagicConv: Array[Byte] = "TOYA".getBytes("US-ASCII")
  val AudioMagicRaw: Array[Byte] = "TOYB".getBytes("US-ASCII")

  val ToyEnc = new AudioFormat.Encoding("TOYENC")
  val ToyRaw = new AudioFormat.Encoding("TOYRAW")

  def toyImage(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3)
    ImageMagic ++ Array(w.toByte, h.toByte) ++ rgb
  }

  def toyAudio(magic: Array[Byte], frames: Array[Byte]): Array[Byte] =
    magic ++ Array(frames.length.toByte) ++ frames

  def toyFormat(enc: AudioFormat.Encoding): AudioFormat =
    new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
}

/** SPI for the TOYI image format — registered programmatically in the
  * spec via `IIORegistry.getDefaultInstance.registerServiceProvider`
  * (what a provider jar's static registration does at load time). */
class ToyImageReaderSpi extends ImageReaderSpi(
    "graft-test", "1.0", Array("toyi"), Array("toyi"), Array("image/x-toyi"),
    classOf[ToyImageReader].getName,
    Array[Class[_]](classOf[ImageInputStream]),
    null, false, null, null, null, null, false, null, null, null, null) {

  override def canDecodeInput(source: AnyRef): Boolean = source match {
    case s: ImageInputStream =>
      s.mark()
      try {
        val m = new Array[Byte](4)
        s.readFully(m)
        java.util.Arrays.equals(m, ToyCodecs.ImageMagic)
      } catch { case _: Exception => false } finally s.reset()
    case _ => false
  }

  override def createReaderInstance(extension: AnyRef): ImageReader =
    new ToyImageReader(this)

  override def getDescription(locale: java.util.Locale): String =
    "toy TOYI raw-RGB reader (test fixture)"
}

class ToyImageReader(spi: ImageReaderSpi) extends ImageReader(spi) {
  private def stream: ImageInputStream = getInput.asInstanceOf[ImageInputStream]

  private lazy val parsed: (Int, Int, Array[Byte]) = {
    val s = stream
    s.seek(0)
    val m = new Array[Byte](4)
    s.readFully(m)
    require(java.util.Arrays.equals(m, ToyCodecs.ImageMagic), "not a TOYI stream")
    val w = s.read()
    val h = s.read()
    val rgb = new Array[Byte](w * h * 3)
    s.readFully(rgb)
    (w, h, rgb)
  }

  override def getNumImages(allowSearch: Boolean): Int = 1
  override def getWidth(imageIndex: Int): Int = parsed._1
  override def getHeight(imageIndex: Int): Int = parsed._2
  override def getStreamMetadata: javax.imageio.metadata.IIOMetadata = null
  override def getImageMetadata(imageIndex: Int): javax.imageio.metadata.IIOMetadata = null

  override def getImageTypes(imageIndex: Int): java.util.Iterator[ImageTypeSpecifier] =
    java.util.Collections.singletonList(
      ImageTypeSpecifier.createFromBufferedImageType(
        java.awt.image.BufferedImage.TYPE_INT_RGB)).iterator()

  override def read(imageIndex: Int,
      param: javax.imageio.ImageReadParam): java.awt.image.BufferedImage = {
    val (w, h, rgb) = parsed
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val k = (y * w + x) * 3
        img.setRGB(x, y,
          ((rgb(k) & 0xff) << 16) | ((rgb(k + 1) & 0xff) << 8) | (rgb(k + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }
}

/** AudioFileReader SPI for the TOYA/TOYB containers — discovered by
  * `AudioSystem` through the META-INF/services entry in test
  * resources (exactly how a provider jar ships). */
class ToyAudioFileReader extends AudioFileReader {
  import javax.sound.sampled.AudioFileFormat

  private def parse(stream: InputStream): AudioInputStream = {
    if (!stream.markSupported())
      throw new UnsupportedAudioFileException("stream must support mark")
    stream.mark(5)
    val m = new Array[Byte](4)
    val got = stream.readNBytes(m, 0, 4)
    val enc =
      if (got == 4 && java.util.Arrays.equals(m, ToyCodecs.AudioMagicConv)) ToyCodecs.ToyEnc
      else if (got == 4 && java.util.Arrays.equals(m, ToyCodecs.AudioMagicRaw)) ToyCodecs.ToyRaw
      else { stream.reset(); throw new UnsupportedAudioFileException("not a TOY stream") }
    val n = stream.read()
    new AudioInputStream(stream, ToyCodecs.toyFormat(enc), n.toLong)
  }

  override def getAudioInputStream(stream: InputStream): AudioInputStream = parse(stream)

  override def getAudioFileFormat(stream: InputStream): AudioFileFormat = {
    val in = parse(stream)
    new AudioFileFormat(new AudioFileFormat.Type("TOY", "toy"),
      in.getFormat, in.getFrameLength.toInt)
  }

  override def getAudioFileFormat(url: java.net.URL): AudioFileFormat =
    getAudioFileFormat(new ByteArrayInputStream(url.openStream().readAllBytes()))
  override def getAudioFileFormat(file: java.io.File): AudioFileFormat =
    getAudioFileFormat(new ByteArrayInputStream(
      java.nio.file.Files.readAllBytes(file.toPath)))
  override def getAudioInputStream(url: java.net.URL): AudioInputStream =
    getAudioInputStream(new ByteArrayInputStream(url.openStream().readAllBytes()))
  override def getAudioInputStream(file: java.io.File): AudioInputStream =
    getAudioInputStream(new ByteArrayInputStream(
      java.nio.file.Files.readAllBytes(file.toPath)))
}

/** FormatConversionProvider SPI: TOYENC → PCM_SIGNED/16 (little- or
  * big-endian), sample = toy byte << 8. TOYRAW is deliberately NOT
  * convertible — it exercises the decoder's "no transcoder registered"
  * error-channel path. */
class ToyFormatConversionProvider extends FormatConversionProvider {
  import AudioFormat.Encoding

  override def getSourceEncodings: Array[Encoding] = Array(ToyCodecs.ToyEnc)
  override def getTargetEncodings: Array[Encoding] = Array(Encoding.PCM_SIGNED)

  override def getTargetEncodings(sourceFormat: AudioFormat): Array[Encoding] =
    if (sourceFormat.getEncoding == ToyCodecs.ToyEnc) Array(Encoding.PCM_SIGNED)
    else Array.empty

  override def getTargetFormats(targetEncoding: Encoding,
      sourceFormat: AudioFormat): Array[AudioFormat] =
    if (targetEncoding == Encoding.PCM_SIGNED &&
        sourceFormat.getEncoding == ToyCodecs.ToyEnc)
      Array(
        new AudioFormat(Encoding.PCM_SIGNED, sourceFormat.getSampleRate, 16,
          sourceFormat.getChannels, sourceFormat.getChannels * 2,
          sourceFormat.getSampleRate, false),
        new AudioFormat(Encoding.PCM_SIGNED, sourceFormat.getSampleRate, 16,
          sourceFormat.getChannels, sourceFormat.getChannels * 2,
          sourceFormat.getSampleRate, true))
    else Array.empty

  override def getAudioInputStream(targetEncoding: Encoding,
      sourceStream: AudioInputStream): AudioInputStream =
    getAudioInputStream(
      getTargetFormats(targetEncoding, sourceStream.getFormat).headOption
        .getOrElse(throw new IllegalArgumentException("unsupported conversion")),
      sourceStream)

  override def getAudioInputStream(targetFormat: AudioFormat,
      sourceStream: AudioInputStream): AudioInputStream = {
    val src = sourceStream.getFormat
    require(src.getEncoding == ToyCodecs.ToyEnc &&
      targetFormat.getEncoding == Encoding.PCM_SIGNED &&
      targetFormat.getSampleSizeInBits == 16,
      "unsupported conversion")
    val toy = sourceStream.readAllBytes()
    val out = new Array[Byte](toy.length * 2)
    var i = 0
    while (i < toy.length) {
      val sample = toy(i).toInt << 8
      if (targetFormat.isBigEndian) {
        out(2 * i) = ((sample >> 8) & 0xff).toByte
        out(2 * i + 1) = (sample & 0xff).toByte
      } else {
        out(2 * i) = (sample & 0xff).toByte
        out(2 * i + 1) = ((sample >> 8) & 0xff).toByte
      }
      i += 1
    }
    new AudioInputStream(new ByteArrayInputStream(out), targetFormat, toy.length.toLong)
  }
}
