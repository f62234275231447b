package graft.corpus

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / resize /
  * frame-sample / feature-extract run per-partition over the binary batches.
  *
  * The image path is REAL, zero new dependencies — the JDK ships codecs:
  *
  *  - [[decode]] sniffs the container and parses dimensions straight from
  *    the header bytes (PNG IHDR, JPEG SOF marker scan, GIF logical screen
  *    descriptor, BMP info header) WITHOUT decoding pixels. At 100 TB this
  *    is the difference between a metadata pass that streams headers and
  *    one that rasterizes every image.
  *  - [[resize]] is a real raster scale: `ImageIO.read` → bilinear
  *    `Graphics2D.drawImage` at the integer-exact target geometry →
  *    re-encode in the source format.
  *  - [[frameSample]] walks a multi-frame container (animated GIF — the
  *    one multi-frame format the JDK reads) with an `ImageReader`, emitting
  *    every-nth frame re-encoded as PNG. Video codecs (h264 etc.) are not
  *    in the JDK, so for those containers each payload is one "frame".
  *  - [[features]] computes a real visual feature: a normalized grayscale
  *    histogram over the decoded raster (byte histogram fallback for
  *    payloads no JDK codec reads).
  *
  * Spark shape: every operator is a narrow per-partition transform — one
  * codec context per partition, no shuffle; heavy payloads should set
  * `spark.sql.files.maxPartitionBytes` low enough that a partition of
  * payloads fits executor memory. `ImageIO.setUseCache(false)` keeps the
  * JDK codecs in-memory (the default spills every stream to a temp file —
  * a per-row disk write on the hot path).
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  // ------------------------------------------------------------- fixtures

  /** Deterministic image geometry derived from a document's text — the
    * ground truth an oracle recomputes in SQL:
    * format = length%3 → png/jpeg/gif, width = 16+(ascii(first)%8)*4,
    * height = 16+(length%8)*4.
    */
  def geometryOf(text: String): (String, Int, Int) = {
    // code points, not UTF-16 units: DuckDB length() counts characters, so
    // non-BMP text (emoji) must derive the same format/height on both sides
    val len = text.codePointCount(0, text.length)
    val fmt = (len % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "gif"
    }
    val c0 = if (text.isEmpty) 0 else text.codePointAt(0)
    (fmt, 16 + (c0 % 8) * 4, 16 + (len % 8) * 4)
  }

  /** Encode a real w×h image in `format` ("png"/"jpeg"/"gif"/"bmp") with
    * deterministic pixel content (a seeded gradient — content only matters
    * for resize/feature determinism, not for metadata).
    */
  def encodeImage(format: String, w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (x * 7 + y * 13 + seed).toInt & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.setUseCache(false)
    require(ImageIO.write(img, format, out), s"no JDK writer for $format")
    out.toByteArray
  }

  /** Encode a real animated GIF of `nFrames` w×h frames (the JDK gif
    * writer's sequence API). */
  def encodeAnimatedGif(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    ImageIO.setUseCache(false)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = (x * 7 + y * 13 + f * 29 + seed).toInt & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Attach a REAL image payload column (`binary`) whose format and
    * geometry derive deterministically from the text ([[geometryOf]]) —
    * the stand-in for reading a blob/fileref column, except the bytes are
    * genuine PNG/JPEG/GIF files the decode stage must actually parse.
    */
  def withPayload(docs: DataFrame, textCol: String): DataFrame = {
    val inSchema = docs.schema
    val outSchema = inSchema.add(StructField("payload", BinaryType, nullable = false))
    val textIdx = inSchema.fieldIndex(textCol)
    docs.mapPartitions { it =>
      it.map { row =>
        val text = row.getString(textIdx)
        val (fmt, w, h) = geometryOf(text)
        Row.fromSeq(row.toSeq :+ encodeImage(fmt, w, h, seed = text.length.toLong))
      }
    }(Encoders.row(outSchema))
  }

  // ------------------------------------------------ header-only metadata

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Real metadata decode from container headers, no pixel decode:
    * PNG signature + IHDR (width/height big-endian at 16/20), JPEG SOFn
    * marker scan (height/width at segment+5/+7), GIF87a/89a logical screen
    * descriptor (little-endian at 6/8), BMP BITMAPINFOHEADER (18/22).
    * Unrecognized payloads → ("unknown", 0, 0, n_bytes).
    */
  def decodeMeta(b: Array[Byte]): (String, Int, Int, Long) = {
    val n = b.length.toLong
    // PNG: \x89PNG\r\n\x1a\n then the IHDR chunk is mandatory-first
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      return ("png", be32(b, 16), be32(b, 20), n)
    // JPEG: FFD8, scan markers to the first SOF (C0-CF minus C4/C8/CC)
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return ("unknown", 0, 0, n)
        val m = b(i + 1) & 0xff
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
        else if (m == 0xda) return ("jpeg", 0, 0, n) // SOS before any SOF
        else {
          val segLen = be16(b, i + 2)
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 8 < b.length) return ("jpeg", be16(b, i + 7), be16(b, i + 5), n)
            return ("jpeg", 0, 0, n)
          }
          i += 2 + segLen
        }
      }
      return ("jpeg", 0, 0, n)
    }
    // GIF: GIF87a / GIF89a
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return ("gif", le16(b, 6), le16(b, 8), n)
    // BMP: "BM" + BITMAPINFOHEADER (height negative = top-down)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return ("bmp", le32(b, 18), math.abs(le32(b, 22)), n)
    ("unknown", 0, 0, n)
  }

  /** Per-partition decode of the `payload` binary column → `meta` struct.
    * mapPartitions (not a per-row UDF) so batches stay together; the
    * header parse never rasterizes, so this streams at scan speed.
    */
  def decode(df: DataFrame): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("meta", MetaSchema, nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val (fmt, w, h, n) = decodeMeta(bytes)
        Row.fromSeq(row.toSeq :+ Row(fmt, w, h, n))
      }
    }(Encoders.row(outSchema))
  }

  /** Target geometry under a `maxSide` bound, integer-exact (no float
    * rounding, so an oracle recomputes it with integer division):
    * untouched when max(w,h) <= maxSide, else side*maxSide/max(w,h). */
  def targetGeometry(w: Int, h: Int, maxSide: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxSide || m == 0) (w, h)
    else (math.max(1, w * maxSide / m), math.max(1, h * maxSide / m))
  }

  /** REAL raster resize: decode with the JDK codec, bilinear-scale onto a
    * BufferedImage of the exact [[targetGeometry]], re-encode in the
    * source format, refresh `meta` from the new payload. Payloads no JDK
    * codec reads pass through untouched. Narrow per-partition transform.
    */
  def resize(df: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide >= 1, s"maxSide must be >= 1, got $maxSide")
    val inSchema = df.schema
    require(inSchema.fieldNames.contains("meta"), "resize runs after decode()")
    val payloadIdx = inSchema.fieldIndex("payload")
    val metaIdx = inSchema.fieldIndex("meta")
    df.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val meta = row.getStruct(metaIdx)
        val fmt = meta.getString(0)
        val img =
          try ImageIO.read(new ByteArrayInputStream(bytes)) catch { case _: Exception => null }
        if (img == null) row // not an image the JDK reads: pass through
        else {
          val (nw, nh) = targetGeometry(img.getWidth, img.getHeight, maxSide)
          val scaled = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, nw, nh, null)
          g.dispose()
          val out = new ByteArrayOutputStream()
          ImageIO.write(scaled, fmt, out)
          val newBytes = out.toByteArray
          Row.fromSeq(row.toSeq.updated(payloadIdx, newBytes)
            .updated(metaIdx, Row(fmt, nw, nh, newBytes.length.toLong)))
        }
      }
    }(Encoders.row(inSchema))
  }

  /** REAL frame sampler over multi-frame containers: an `ImageReader`
    * walks the payload's frames (animated GIF in the JDK), every-nth frame
    * is re-encoded as PNG into the `frame` column with its index. Single
    * -frame images emit frame 0; unreadable payloads emit no rows (they
    * are not frame sources). flatMap row explosion, narrow.
    */
  def frameSample(df: DataFrame, everyNth: Int, maxFrames: Int = 16): DataFrame = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("frame_idx", IntegerType, nullable = false))
      .add(StructField("frame", BinaryType, nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    df.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Seq.empty[Row] }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val nFrames = math.max(1, reader.getNumImages(true))
            (0 until nFrames by everyNth).take(maxFrames).flatMap { f =>
              try {
                val img = reader.read(f)
                val out = new ByteArrayOutputStream()
                ImageIO.write(img, "png", out)
                Some(Row.fromSeq(row.toSeq :+ f :+ out.toByteArray))
              } catch { case _: Exception => None }
            }
          } finally { reader.dispose(); iis.close() }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL visual feature: a `dim`-bucket grayscale histogram over the
    * decoded raster, normalized to sum 1 — the shape (fixed-dim float
    * vector per payload, one decoder per partition) of an embedding-model
    * pass. Payloads no JDK codec reads fall back to a byte-value histogram
    * (same dimension, still deterministic).
    */
  def features(df: DataFrame, dim: Int = 8): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val inSchema = df.schema
    val outSchema = inSchema.add(
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val payloadIdx = inSchema.fieldIndex("payload")
    df.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val img =
          try ImageIO.read(new ByteArrayInputStream(bytes)) catch { case _: Exception => null }
        val hist = new Array[Long](dim)
        var total = 0L
        if (img != null) {
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val gray = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              hist(gray * dim / 256) += 1
              total += 1
              x += 1
            }
            y += 1
          }
        } else {
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) * dim / 256) += 1; total += 1; i += 1 }
        }
        val v = Array.tabulate(dim)(i => if (total == 0) 0f else hist(i).toFloat / total)
        Row.fromSeq(row.toSeq :+ v.toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
