package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** Animated-GIF frame walk + builder — the third REAL codec through
  * the [[FrameDecoder]] seam (after MJPEG-in-MP4 and AVI DIB/RLE8):
  * the JDK's ImageIO ships a native GIF reader AND writer, so both
  * the multi-frame decode and the fixture builder are honest
  * end-to-end LZW work, no stub anywhere.
  *
  * Frame semantics: ImageIO's GIF reader returns each image
  * descriptor's STORED raster, not the disposal-composited logical
  * screen — real-world GIFs with partial-frame optimization would
  * hash per stored region. The builders in this repo write
  * full-frame rasters (as does [[encodeAnimated]]), where the two
  * notions coincide; the hash contract is explicitly over stored
  * rasters. Format: GIF89a (CompuServe spec, public). */
object Gif {

  /** Frame count plus the first min(count, maxFrames) frames of a
    * GIF stream, decoded in storage order. None for bytes that are
    * not a GIF stream at all; a decode failure on an IN-RANGE frame
    * THROWS (the [[FrameDecoder]] caller maps it to the
    * all-frames-or-nothing null) — frames past maxFrames are never
    * decoded, matching the "in-range frames only" contract of the
    * MJPEG/AVI decoders. */
  def readFrames(b: Array[Byte],
                 maxFrames: Int): Option[(Int, IndexedSeq[BufferedImage])] = {
    if (b == null || b.length < 6 ||
      b(0) != 'G' || b(1) != 'I' || b(2) != 'F') return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(b))
    try {
      val it = ImageIO.getImageReaders(iis)
      if (!it.hasNext) return None
      val r = it.next()
      try {
        r.setInput(iis)
        val n = r.getNumImages(true)
        Some((n, (0 until math.min(n, maxFrames)).map(r.read(_))))
      } finally r.dispose()
    } finally iis.close()
  }

  /** Encode 8-bit gray rasters (row-major, w×h each) as ONE animated
    * GIF through the JDK GIF writer's write-to-sequence path — a
    * real LZW encode per frame, so the decode side exercises the
    * real inverse. Deterministic for fixed inputs (the writer's
    * palette derivation is a pure function of the image color
    * model). */
  def encodeAnimated(w: Int, h: Int,
                     frames: Seq[Array[Byte]]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { g =>
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        img.getRaster.setDataElements(0, 0, w, h, g)
        writer.writeToSequence(new IIOImage(img, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }
}
