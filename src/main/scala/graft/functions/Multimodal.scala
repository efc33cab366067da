package graft.functions

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{ImageIO, ImageReader, ImageWriter}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction runs as
  * a partition-mapped batch stage.
  *
  * Raster images use a REAL pure-JVM codec: `javax.imageio` reads/writes
  * PNG, BMP and GIF with no external libraries, so [[decodeImage]],
  * [[imageFeatures]], [[extractFeatures]] and [[resizeImage]] operate on
  * actual pixels. Payloads no codec recognizes (`ImageIO.read` returns
  * null) yield null features — the stage never fakes a decode. Container
  * DEMUX is real too: [[parseBoxes]] walks actual ISO-BMFF (MP4/MOV/HEIF)
  * big-endian box framing — largesize, size-0-to-EOF, nested containers,
  * garbage-tolerant — and [[sampleFramesDemuxed]] chunks real mdat content;
  * [[sampleFrames]]'s raw byte chunker remains for formats without box
  * framing. What stays outside pure-JVM reach is only the codec layer
  * proper (sample-accurate H.264/AAC track decode — JNI/FFI territory).
  *
  * Scale notes: media rows are large and few, so the decode stages use
  * `mapPartitions` (one iterator pass, no per-row task overhead) and callers
  * should `repartition` by byte-budget, not row count, before heavy decodes.
  */
object Multimodal {

  // In-memory payloads never benefit from ImageIO's disk-backed stream
  // cache — with it on, EVERY convenience read/write creates and deletes a
  // temp file, which dominates small-image decode cost. Rather than flip
  // the JVM-global ImageIO.setUseCache (a hidden side effect on every
  // other ImageIO user in the JVM), every path below constructs an
  // explicit MemoryCache image stream, which ignores the cache setting.

  /** Canonical media schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Output schema of the feature-extraction stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Output schema of the decoded-image statistics stage. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("px_mean", DoubleType, nullable = true),
    StructField("px_min", IntegerType, nullable = true),
    StructField("px_max", IntegerType, nullable = true)))

  /** Exact statistics of a decoded raster. */
  final case class ImageStats(width: Int, height: Int, channels: Int,
                              pxMean: Double, pxMin: Int, pxMax: Int)

  // One reusable codec instance per (thread, format): the ImageIO.read /
  // ImageIO.write convenience paths re-probe the plugin registry and build
  // a fresh reader/writer per call, which dominates small-image decode
  // cost. Executor task threads are pooled, so a ThreadLocal keeps the
  // instance alive across rows AND across mapPartitions batches; readers
  // and writers are not thread-safe, but each thread owns its own.
  private val readerCache = new ThreadLocal[java.util.HashMap[String, ImageReader]] {
    override def initialValue() = new java.util.HashMap[String, ImageReader]()
  }
  private val pngWriter = new ThreadLocal[ImageWriter] {
    override def initialValue(): ImageWriter =
      ImageIO.getImageWritersByFormatName("png").next()
  }

  /** Container format from magic bytes — the three formats the JDK codec
    * reads. Null for anything else (falls back to the probing convenience
    * path, which knows every registered plugin).
    */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else null

  /** Real image decode: PNG/BMP/GIF are sniffed from the byte header and
    * decoded by a per-thread reusable `ImageReader`; other payloads go
    * through the auto-detecting `ImageIO.read` probe. None for
    * empty/corrupt/unrecognized payloads.
    */
  private[graft] def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.length == 0) None
    else sniffFormat(bytes) match {
      case null =>
        // probing path for formats we don't sniff: explicit in-memory
        // stream (never ImageIO's temp-file cache) + registry probe;
        // anything unreadable → None
        val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val it = ImageIO.getImageReaders(in)
          if (!it.hasNext) None
          else {
            val r = it.next()
            try {
              r.setInput(in, true, true)
              Option(r.read(0))
            } catch { case _: Exception => None } // corrupt header/stream
            finally r.dispose()
          }
        } catch { case _: Exception => None }
        finally { try in.close() catch { case _: Exception => () } }
      case fmt =>
        val cache = readerCache.get()
        var r = cache.get(fmt)
        if (r == null) {
          val it = ImageIO.getImageReadersByFormatName(fmt)
          if (it.hasNext) { r = it.next(); cache.put(fmt, r) }
        }
        if (r == null) None // registry has no plugin for the sniffed format
        else {
          val in = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
          try {
            r.setInput(in, true, true)
            Option(r.read(0))
          } catch {
            case _: Exception =>
              // a failed read can leave the reader dirty — drop it; the next
              // row on this thread builds a fresh one
              cache.remove(fmt)
              r.dispose()
              None
          } finally {
            // the catch above may have disposed r, making setInput throw —
            // keep the stream close independent of it
            try r.setInput(null) catch { case _: Exception => () }
            try in.close() catch { case _: Exception => () }
          }
        }
    }

  /** Encode a raster as PNG through the per-thread reusable writer (the
    * `ImageIO.write` convenience path pays plugin probe + fresh writer per
    * call).
    */
  private[graft] def writePng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val w = pngWriter.get()
    val out = new MemoryCacheImageOutputStream(baos)
    try {
      w.setOutput(out)
      w.write(img)
    } catch {
      case e: Exception =>
        // a failed write can leave the writer dirty — drop it (mirrors the
        // reader path); the ThreadLocal re-initializes on next use
        pngWriter.remove()
        w.dispose()
        throw e
    } finally {
      try w.setOutput(null) catch { case _: Exception => () }
      try out.close() catch { case _: Exception => () }
    }
    baos.toByteArray
  }

  /** Decode an image payload and compute exact pixel statistics across all
    * raster bands. None when the payload is not a decodable image.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[ImageStats] =
    readImage(bytes).map { img =>
      val raster = img.getRaster
      val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var b = 0
          while (b < bands) {
            val v = raster.getSample(x, y, b)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            b += 1
          }
          x += 1
        }
        y += 1
      }
      ImageStats(w, h, bands, sum.toDouble / (w.toLong * h * bands), mn, mx)
    }

  /** `dim`-bucket normalized sample-value histogram of a decoded image —
    * a real, deterministic feature vector (bucket = v·dim/256 over every
    * raster sample; values sum to 1). Null when the payload doesn't decode.
    */
  private[graft] def imageHistogram(bytes: Array[Byte], dim: Int): Array[Float] =
    readImage(bytes) match {
      case None => null
      case Some(img) =>
        val raster = img.getRaster
        val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
        val counts = new Array[Long](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) {
              val v = raster.getSample(x, y, b)
              val bucket = math.min(dim - 1, v * dim / 256)
              counts(bucket) += 1
              b += 1
            }
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h * bands).toDouble
        val out = new Array[Float](dim)
        var j = 0
        while (j < dim) { out(j) = (counts(j) / n).toFloat; j += 1 }
        out
    }

  /** Decode-free payload metadata: (media_id, n_bytes) via Catalyst
    * built-ins only — `length` on a binary column is the byte count. Use
    * this, NOT [[extractFeatures]], when downstream needs sizes but no
    * decoded features: `mapPartitions` stages are opaque to Catalyst, so
    * routing a metadata-only query through a decode stage pays the full
    * decode per row that column pruning can never delete.
    */
  def payloadMeta(media: DataFrame,
                  idCol: String = "media_id", payloadCol: String = "payload"): DataFrame =
    media.select(col(idCol).cast("long").as("media_id"),
      coalesce(length(col(payloadCol)), lit(0)).cast("int").as("n_bytes"))

  /** Feature-extract a media frame: binary payload → float feature vector
    * ([[imageHistogram]] — real pixels via javax.imageio; null features for
    * payloads no codec recognizes). `mapPartitions` keeps one decoder
    * instance per task (codecs are expensive to initialize) and streams rows
    * without materializing the partition.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16,
                      idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    val input = media.select(col(idCol).cast("long"), col(payloadCol))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        Row(id, bytes.length, imageHistogram(bytes, dim))
      }
    }(enc).toDF()
  }

  /** Decoded-image statistics stage: (media_id, n_bytes, width, height,
    * channels, px_mean, px_min, px_max) from a real decode; the six stat
    * columns are null for payloads that are not a decodable image.
    */
  def imageFeatures(media: DataFrame,
                    idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(imageFeatureSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodeImage(bytes) match {
            case Some(s) =>
              Row(id, bytes.length, s.width, s.height, s.channels, s.pxMean, s.pxMin, s.pxMax)
            case None => Row(id, bytes.length, null, null, null, null, null, null)
          }
        }
      }(enc).toDF()
  }

  /** Frame-sampling stage: split each media payload into fixed-size chunks
    * ("frames") and keep every `everyN`-th — the video/audio frame-sample
    * plumbing. Byte chunking stands in for the container demuxer (MP4/MKV
    * demux has no pure-JVM codec); the iteration shape, sampling cadence and
    * output contract are the production ones. Emits (media_id, frame_no,
    * frame_bytes); downstream feature extraction consumes frames exactly
    * like whole payloads.
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = true)))

  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int,
                   idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val frames = bytes.grouped(frameBytes).zipWithIndex
        frames.collect { case (chunk, i) if i % everyN == 0 => Row(id, i, chunk) }
      }(enc).toDF()
  }

  /** REAL image resize: decode, scale the longest side to `maxDim` with a
    * bilinear Graphics2D draw (deterministic software rendering), re-encode
    * as PNG. Images already within the bound, and payloads that are not
    * decodable images, pass through unchanged — use [[resizePayload]] for
    * opaque byte budgets. Fused [[expressions.ResizeImageExpr]] (not a
    * ScalaUDF): the surrounding projection stays in one codegen stage.
    */
  def resizeImage(media: DataFrame, maxDim: Int,
                  payloadCol: String = "payload"): DataFrame = {
    require(maxDim > 0)
    import org.apache.spark.sql.graft.ColumnBridge
    media.withColumn(payloadCol, ColumnBridge.column(
      expressions.ResizeImageExpr(ColumnBridge.expression(col(payloadCol)), maxDim)))
  }

  /** Opaque byte-budget downsample: cap any payload at `targetBytes` by
    * stride sampling. This is deliberately NOT an image operation (no
    * decode — it works on payloads of any modality); see [[resizeImage]]
    * for the real raster resize. Fused [[expressions.StridedResizeExpr]].
    */
  def resizePayload(media: DataFrame, targetBytes: Int,
                    idCol: String = "media_id", payloadCol: String = "payload"): DataFrame = {
    require(targetBytes > 0)
    import org.apache.spark.sql.graft.ColumnBridge
    media.withColumn(payloadCol, ColumnBridge.column(
      expressions.StridedResizeExpr(ColumnBridge.expression(col(payloadCol)), targetBytes)))
  }

  /** Synthesize a media frame from any table (test/demo path): payload bytes
    * derive deterministically from a source column, exercising the full
    * plumbing without staging real media files.
    */
  def synthesizeMedia(df: DataFrame, idCol: String, fromCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(fromCol).cast("string"), "UTF-8").as("payload"),
      struct(
        lit("application/x-graft-demo").as("mime"),
        length(col(fromCol).cast("string")).cast("int").as("width"),
        lit(1).as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Encode a REAL grayscale PNG whose geometry and pixels derive
    * arithmetically from a non-negative id: width = id%17 + 1,
    * height = id%13 + 1, gray(x, y) = (id·31 + y·width + x) % 256.
    * PNG is lossless 8-bit gray, so a decode recovers these exact values —
    * which makes every decoded statistic independently computable by a SQL
    * oracle from the id alone.
    */
  private[graft] def encodePng(id: Long): Array[Byte] = {
    require(id >= 0, s"encodePng needs a non-negative id (got $id): " +
      "geometry derives from id%17/id%13, which must stay positive")
    val w = (id % 17 + 1).toInt
    val h = (id % 13 + 1).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + (y.toLong * w + x)) % 256).toInt)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** Synthesize real PNG images keyed by a non-negative id column — the
    * deterministic image-fixture path ([[encodePng]]'s pattern): downstream
    * decode stages exercise the actual javax.imageio codec and an oracle
    * can replay every decoded statistic from the id.
    */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame = {
    val enc = udf { id: Long => encodePng(id) }
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", enc(col("media_id")))
      .withColumn("meta", struct(
        lit("image/png").as("mime"),
        (col("media_id") % 17 + 1).cast("int").as("width"),
        (col("media_id") % 13 + 1).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))
  }

  // ======================= ISO-BMFF container demux =======================
  // MP4/MOV/HEIF files are a flat tree of length-prefixed boxes
  // ([size:u32be][type:4cc][payload...]; size==1 → u64 largesize follows,
  // size==0 → box runs to EOF) — parsing the box layer needs no codec at
  // all, just the framing walk below. This replaces the byte-chunking
  // stand-in for DEMUX: frame sampling now splits real mdat payloads, and
  // only sample-accurate track decode (the codec layer proper) remains
  // outside pure-JVM reach.

  /** Box-tree containers whose payload is itself a box sequence. */
  private val BmffContainers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** One parsed box: 4cc type, absolute offset, total size (header
    * included), nesting level. Malformed framing yields a terminal "_err"
    * box covering the unparseable tail — the walk never throws on crawl
    * garbage.
    */
  val boxSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("box_no", IntegerType, nullable = false),
    StructField("box_type", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("level", IntegerType, nullable = false)))

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourCc(b: Array[Byte], o: Int): String = {
    val cs = new Array[Char](4)
    var i = 0
    while (i < 4) {
      val c = (b(o + i) & 0xff).toChar
      // keep the 4cc printable so a garbage type can't corrupt downstream
      cs(i) = if (c >= ' ' && c <= '~') c else '?'
      i += 1
    }
    new String(cs)
  }

  /** Real containers nest a handful of levels; a payload claiming more is
    * crafted/corrupt, and unbounded recursion on it would StackOverflow the
    * task — the one error the `_err` handling can't absorb.
    */
  private val MaxBoxDepth = 64

  /** Walk the box tree of one payload (depth-first, document order). */
  private[graft] def parseBoxes(bytes: Array[Byte]): Seq[(String, Long, Long, Int)] = {
    val out = Seq.newBuilder[(String, Long, Long, Int)]
    def walk(start: Int, end: Int, level: Int): Unit = {
      if (level >= MaxBoxDepth) {
        out += (("_err", start.toLong, (end - start).toLong, level)); return
      }
      var off = start
      while (off < end) {
        if (off + 8 > end) {
          out += (("_err", off.toLong, (end - off).toLong, level)); return
        }
        val size32 = be32(bytes, off)
        val tpe = fourCc(bytes, off + 4)
        val (size, headerLen) =
          if (size32 == 1L && off + 16 <= end) (be64(bytes, off + 8), 16)
          else if (size32 == 0L) ((end - off).toLong, 8)
          else (size32, 8)
        if (size < headerLen || off + size > end) {
          out += (("_err", off.toLong, (end - off).toLong, level)); return
        }
        out += ((tpe, off.toLong, size, level))
        if (BmffContainers.contains(tpe))
          walk(off + headerLen, off + size.toInt, level + 1)
        off += size.toInt
      }
    }
    if (bytes.nonEmpty) walk(0, bytes.length, 0)
    out.result()
  }

  /** Demux stage: payloads → one row per box, document order. Same
    * partition-mapped shape as the decode stages.
    */
  def demuxBoxes(media: DataFrame, idCol: String = "media_id",
                 payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(boxSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        parseBoxes(bytes).zipWithIndex.map { case ((t, o, s, l), i) =>
          Row(id, i, t, o, s, l)
        }
      }(enc).toDF()
  }

  /** REAL demuxed frame sampling: chunk only the content of mdat boxes
    * (the media data), not the container framing — [[sampleFrames]]'s
    * contract fed by an actual demux instead of raw byte offsets. Frame
    * numbering is continuous across multiple mdat boxes.
    */
  def sampleFramesDemuxed(media: DataFrame, frameBytes: Int, everyN: Int,
                          idCol: String = "media_id",
                          payloadCol: String = "payload"): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val enc = RowEncoder.encoderFor(frameSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        // Re-derive each mdat's header length: a largesize box (size32 == 1)
        // carries a 16-byte header, and slicing a fixed 8 would leak the
        // 8 largesize bytes into the first frame.
        val mdat = parseBoxes(bytes).collect {
          case ("mdat", off, size, _)
              if size > (if (be32(bytes, off.toInt) == 1L) 16 else 8) =>
            val headerLen = if (be32(bytes, off.toInt) == 1L) 16 else 8
            java.util.Arrays.copyOfRange(bytes, off.toInt + headerLen,
              (off + size).toInt)
        }
        val frames = mdat.iterator.flatMap(_.grouped(frameBytes)).zipWithIndex
        frames.collect { case (chunk, i) if i % everyN == 0 => Row(id, i, chunk) }
          .toSeq
      }(enc).toDF()
  }

  /** Synthesize a structurally REAL ISO-BMFF payload from a non-negative
    * id: ftyp(20) · free(8 + id%7) · moov(20 + id%11 ⊃ mvhd) ·
    * mdat(8 + id·13%97 + 1). Real big-endian framing bytes flow through
    * [[parseBoxes]]; every box offset/size is arithmetic in the id, so a
    * SQL oracle replays the whole demux.
    */
  private[graft] def encodeBmff(id: Long): Array[Byte] = {
    require(id >= 0, "encodeBmff derives box sizes from id modulos")
    val out = new ByteArrayOutputStream()
    def box(tpe: String, payload: Array[Byte]): Unit = {
      val size = payload.length + 8
      out.write(Array[Byte]((size >>> 24).toByte, (size >>> 16).toByte,
        (size >>> 8).toByte, size.toByte))
      out.write(tpe.getBytes("US-ASCII"))
      out.write(payload)
    }
    def fill(n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((id * 31 + i) % 256).toByte)
    box("ftyp", "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
      "mp41".getBytes("US-ASCII"))
    box("free", fill((id % 7).toInt))
    // moov contains exactly one mvhd child: moov payload IS the mvhd box
    val mvhdPayload = fill((id % 11).toInt + 4)
    val mvhd = new ByteArrayOutputStream()
    val mvhdSize = mvhdPayload.length + 8
    mvhd.write(Array[Byte]((mvhdSize >>> 24).toByte, (mvhdSize >>> 16).toByte,
      (mvhdSize >>> 8).toByte, mvhdSize.toByte))
    mvhd.write("mvhd".getBytes("US-ASCII"))
    mvhd.write(mvhdPayload)
    box("moov", mvhd.toByteArray)
    box("mdat", fill((id * 13 % 97).toInt + 1))
    out.toByteArray
  }

  /** Synthesized-BMFF fixture path, mirroring [[synthesizeImages]]. */
  def synthesizeBmff(df: DataFrame, idCol: String): DataFrame = {
    val enc = udf { id: Long => encodeBmff(id) }
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", enc(col("media_id")))
      .withColumn("meta", struct(
        lit("video/mp4").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        (col("media_id") % 97 * 40).as("duration_ms")))
  }

  // ============================ audio (WAV/PCM) ============================
  // javax.sound.sampled decodes RIFF/WAVE PCM with no native dependencies —
  // the one audio codec inside pure-JVM reach (MP3/AAC stay honestly out,
  // like the BMFF track-decode gap). Same device as the PNG path: the
  // fixture WAV's samples derive arithmetically from the id, the decode is
  // REAL (AudioSystem parses the actual RIFF framing), and every emitted
  // statistic is replayable by a SQL oracle from the id alone.

  /** Output schema of the decoded-audio statistics stage. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("peak", IntegerType, nullable = true),
    StructField("zero_crossings", LongType, nullable = true)))

  private val WavSampleRate = 8000

  /** Sample i of fixture id — full int16 range, sign-alternating enough to
    * exercise the zero-crossing counter. Mirrored verbatim by the oracle.
    */
  private def wavSample(id: Long, i: Int): Int =
    (((id * 31 + i.toLong * 7919) % 65536) - 32768).toInt

  /** Encode a REAL RIFF/WAVE file (PCM16 mono little-endian, 8 kHz) whose
    * sample count and values derive arithmetically from a non-negative id:
    * n = id%97 + 16, sample(i) = (id·31 + i·7919) % 65536 − 32768. PCM is
    * lossless, so a decode recovers these exact values.
    */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    require(id >= 0, "encodeWav derives sample count/values from id modulos")
    val n = (id % 97).toInt + 16
    encodePcmWav(Array.tabulate(n)(i => wavSample(id, i)), WavSampleRate)
  }

  /** RIFF/WAVE writer for arbitrary PCM16 mono samples (the general form
    * [[encodeWav]]'s id-derived fixture uses).
    */
  private[graft] def encodePcmWav(samples: Array[Int], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream(44 + dataLen)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1)                    // PCM
    le16(1)                    // mono
    le32(rate)
    le32(rate * 2)             // byte rate
    le16(2)                    // block align
    le16(16)                   // bits per sample
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    var i = 0
    while (i < samples.length) { le16(samples(i) & 0xffff); i += 1 }
    out.toByteArray
  }

  /** Synthesized-WAV fixture path, mirroring [[synthesizeImages]]. */
  def synthesizeAudio(df: DataFrame, idCol: String): DataFrame = {
    val enc = udf { id: Long => encodeWav(id) }
    df.select(col(idCol).cast("long").as("media_id"))
      .withColumn("payload", enc(col("media_id")))
      .withColumn("meta", struct(
        lit("audio/wav").as("mime"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        ((col("media_id") % 97 + 16) * 1000 / WavSampleRate).cast("long")
          .as("duration_ms")))
  }

  /** Real audio decode + per-clip statistics: `AudioSystem` parses the
    * container/format layer (RIFF framing, fmt chunk), samples decode per
    * the format's own endianness/width, stats run over channel-interleaved
    * frames' first channel. Unrecognized/corrupt/non-16-bit payloads yield
    * null stats — the stage never fakes a decode. Zero crossings count
    * sign-bucket changes ((prev ≥ 0) ≠ (cur ≥ 0)) between consecutive
    * samples. Partition-mapped like the image decode stage.
    */
  def audioFeatures(media: DataFrame, idCol: String = "media_id",
                    payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodeWavStats(bytes) match {
            case Some((sr, ch, samples)) =>
              val n = samples.length.toLong
              var sumSq = 0L
              var peak = 0
              var zc = 0L
              var i = 0
              while (i < samples.length) {
                val s = samples(i)
                sumSq += s.toLong * s
                val a = math.abs(s)
                if (a > peak) peak = a
                if (i > 0 && ((samples(i - 1) >= 0) != (s >= 0))) zc += 1
                i += 1
              }
              val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
              Row(id, bytes.length, sr, ch, n, n * 1000L / sr, rms, peak, zc)
            case None =>
              Row(id, bytes.length, null, null, null, null, null, null, null)
          }
        }
      }(enc).toDF()
  }

  /** Decode WAV bytes via javax.sound.sampled: (sampleRate, channels,
    * channel-0 samples). None when the payload isn't decodable 16-bit PCM.
    */
  private[graft] def decodeWavStats(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        // sample rate is a raw fmt-chunk field the reader does NOT validate:
        // a crafted/corrupt WAV declaring rate 0 would otherwise reach the
        // duration division and crash the stage instead of yielding nulls
        val ok = fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && fmt.getSampleRate >= 1f
        if (!ok) return None
        val frameSize = fmt.getFrameSize
        val raw = ais.readAllBytes()
        if (frameSize <= 0 || raw.length % frameSize != 0) return None
        val nFrames = raw.length / frameSize
        val samples = new Array[Int](nFrames)
        val bigEndian = fmt.isBigEndian
        var f = 0
        while (f < nFrames) {
          val o = f * frameSize // first channel of the frame
          val v =
            if (bigEndian) (raw(o) << 8) | (raw(o + 1) & 0xff)
            else (raw(o + 1) << 8) | (raw(o) & 0xff)
          samples(f) = v.toShort.toInt
          f += 1
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels, samples))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  // ---------------- audio fingerprinting (audio near-dup) ----------------

  /** Haitsma–Kalker-style audio fingerprint: per 2048-sample frame
    * (hop 1024), `bands` geometrically-spaced band energies via Goertzel,
    * then one (bands−1)-bit code per frame from the SIGN of the band-energy
    * time–frequency derivative
    *
    *   bit_b = (E[n][b] − E[n][b+1]) − (E[n−1][b] − E[n−1][b+1]) > 0.
    *
    * Uniform amplitude scaling preserves every sign (energy scales by a
    * constant), and a hop-aligned time shift reindexes the codes without
    * changing them — the two robustness properties the spec pins.
    */
  private[graft] def audioFrameCodes(samples: Array[Int], sampleRate: Int,
                                     frame: Int = 2048, hop: Int = 1024,
                                     bands: Int = 16): Array[Int] = {
    if (samples.length < 2 * frame) return Array.empty
    val fLo = 300.0
    val fHi = 0.45 * sampleRate
    val freqs = Array.tabulate(bands)(b => fLo * math.pow(fHi / fLo, b.toDouble / (bands - 1)))
    def goertzel(from: Int, f: Double): Double = {
      val w = 2.0 * math.Pi * f / sampleRate
      val coeff = 2.0 * math.cos(w)
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
      var i = 0
      while (i < frame) {
        s0 = samples(from + i) + coeff * s1 - s2
        s2 = s1; s1 = s0
        i += 1
      }
      s1 * s1 + s2 * s2 - coeff * s1 * s2 // band energy
    }
    val nFrames = (samples.length - frame) / hop + 1
    val energies = Array.tabulate(nFrames, bands)((n, b) => goertzel(n * hop, freqs(b)))
    Array.tabulate(nFrames - 1) { i =>
      val n = i + 1
      var code = 0
      var b = 0
      while (b < bands - 1) {
        val d = (energies(n)(b) - energies(n)(b + 1)) -
          (energies(n - 1)(b) - energies(n - 1)(b + 1))
        if (d > 0) code |= (1 << b)
        b += 1
      }
      code
    }
  }

  private val audioFpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_codes", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = true)))

  /** Per-payload fingerprint stage: (media_id, n_codes, codes); codes null
    * for payloads that don't decode as PCM WAV. Same mapPartitions shape
    * as [[audioFeatures]] — the decode is the cost, not the row.
    */
  def audioFingerprints(media: DataFrame, idCol: String = "media_id",
                        payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFpSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          decodeWavStats(bytes) match {
            case Some((rate, _, samples)) if rate > 0 =>
              val codes = audioFrameCodes(samples, rate)
              Row(id, codes.length, codes.toSeq)
            case _ => Row(id, 0, null)
          }
        }
      }(enc).toDF()
  }

  /** Audio near-dup pairs by shared frame codes: the (id, code) posting
    * list joins on the 4-byte code value (payloads never shuffle), pairs
    * keep when the shared DISTINCT-code fraction of the smaller side
    * reaches `minShared`. Hop-shifted and amplitude-scaled twins share
    * most codes; unrelated audio shares noise-level few.
    */
  def audioNearDupPairs(media: DataFrame, idCol: String = "media_id",
                        payloadCol: String = "payload", minShared: Double = 0.35,
                        maxCodeDocs: Long = 4096L): DataFrame = {
    val fp = audioFingerprints(media, idCol, payloadCol)
      .filter(col("codes").isNotNull && col("n_codes") > 0)
    sharedCodePairs(
      fp.select(col("media_id"), explode(col("codes")).as("__c")).distinct(),
      minShared, maxCodeDocs)
  }

  /** Shared-fingerprint pair funnel: input is one (media_id, __c) row per
    * DISTINCT code a payload carries (any fixed-width code — audio frame
    * codes, per-frame image phashes); pairs keep when the shared fraction
    * of the smaller side reaches `minShared`. Posting join on the code
    * value, hot-code cap, payloads never shuffle.
    */
  private def sharedCodePairs(codes0: DataFrame, minShared: Double,
                              maxCodeDocs: Long): DataFrame = {
    // the share_frac denominator counts codes AFTER the hot-code prune:
    // both the numerator join and the denominator then see the same code
    // universe, so a payload whose codes are mostly shared boilerplate is
    // judged on its distinctive remainder — pre-prune counting diluted the
    // ratio and genuine twins never reached minShared (the exact bug
    // WinnowOverlap.pairsFromFingerprints documents and avoids)
    val pruned0 =
      if (maxCodeDocs <= 0L) codes0
      else {
        val hot = codes0.groupBy(col("__c")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") > maxCodeDocs).select(col("__c"))
        codes0.join(hot, Seq("__c"), "left_anti")
      }
    val nDistinct = pruned0.groupBy(col("media_id")).agg(count(lit(1)).as("__n"))
    val pruned = pruned0.join(nDistinct, "media_id")
    val a = pruned.select(col("media_id").as("id_a"), col("__c"), col("__n").as("n_a"))
    val b = pruned.select(col("media_id").as("id_b"), col("__c"), col("__n").as("n_b"))
    a.join(b, Seq("__c")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("share_frac", col("shared") / least(col("n_a"), col("n_b")))
      .filter(col("share_frac") >= minShared)
      .select(col("id_a"), col("id_b"), col("shared"),
        round(col("share_frac"), 4).as("share_frac"))
  }

  private val videoFpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("phash", LongType, nullable = true)))

  /** Video fingerprint stage: demux mdat frames ([[sampleFramesDemuxed]]'s
    * contract — fixed `frameBytes` chunks, every `everyN`-th kept), then
    * perceptual-hash each frame that decodes as an image. phash null for
    * non-image frames (real codec payloads need the out-of-JVM decoder the
    * demux docs call out). (media_id, frame_no, phash).
    */
  def videoFingerprints(media: DataFrame, frameBytes: Int, everyN: Int = 1,
                        idCol: String = "media_id",
                        payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(videoFpSchema)
    sampleFramesDemuxed(media, frameBytes, everyN, idCol, payloadCol)
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getInt(1), phash64(bytes).map(Long.box).orNull)
        }
      }(enc).toDF()
  }

  /** Video near-dup pairs by shared frame perceptual hashes — the
    * image-phash code stream through the same shared-fingerprint funnel as
    * [[audioNearDupPairs]]: re-encoded or lightly-edited cuts share most
    * frame hashes; unrelated footage shares none.
    */
  def videoNearDupPairs(media: DataFrame, frameBytes: Int, everyN: Int = 1,
                        idCol: String = "media_id", payloadCol: String = "payload",
                        minShared: Double = 0.5, maxCodeDocs: Long = 4096L): DataFrame = {
    val fp = videoFingerprints(media, frameBytes, everyN, idCol, payloadCol)
      .filter(col("phash").isNotNull)
    sharedCodePairs(
      fp.select(col("media_id"), col("phash").as("__c")).distinct(),
      minShared, maxCodeDocs)
  }

  // ---------------- perceptual image hashing (image near-dup) ----------------

  /** 64-bit perceptual hash (pHash, the DCT variant): block-average the
    * decoded image to 32×32 grayscale, 2-D DCT-II, threshold the top-left
    * 8×8 low-frequency coefficients (DC excluded) at their median. Images
    * that LOOK the same — re-encoded, slightly brightened, lightly
    * resampled — land within a few bits; unrelated images differ in ~32.
    * None for undecodable payloads. Pure-JVM math over the existing
    * `readImage` decode.
    */
  private[graft] def phash64(bytes: Array[Byte]): Option[Long] = readImage(bytes).map { img =>
    val N = 32
    val raster = img.getRaster
    val (w, h, bands) = (img.getWidth, img.getHeight, raster.getNumBands)
    val gray = Array.ofDim[Double](N, N)
    var ty = 0
    while (ty < N) {
      var tx = 0
      while (tx < N) {
        val x0 = tx * w / N; val x1 = math.max(x0 + 1, (tx + 1) * w / N)
        val y0 = ty * h / N; val y1 = math.max(y0 + 1, (ty + 1) * h / N)
        var s = 0.0; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            var b = 0; var px = 0.0
            while (b < bands) { px += raster.getSample(x, y, b); b += 1 }
            s += px / bands; n += 1; x += 1
          }
          y += 1
        }
        gray(ty)(tx) = if (n == 0) 0.0 else s / n
        tx += 1
      }
      ty += 1
    }
    // separable 2-D DCT-II
    val cos = Array.tabulate(N, N)((k, i) => math.cos(math.Pi / N * (i + 0.5) * k))
    val tmp = Array.ofDim[Double](N, N)
    for (k <- 0 until N; x <- 0 until N) {
      var s = 0.0; var y = 0
      while (y < N) { s += gray(y)(x) * cos(k)(y); y += 1 }
      tmp(k)(x) = s
    }
    val dct = Array.ofDim[Double](8, 8)
    for (u <- 0 until 8; v <- 0 until 8) {
      var s = 0.0; var x = 0
      while (x < N) { s += tmp(u)(x) * cos(v)(x); x += 1 }
      dct(u)(v) = s
    }
    // quantize before thresholding: degenerate images (stripes, flats)
    // put many coefficients EXACTLY at the median, where last-ulp float
    // residue (e.g. from a brightness shift, whose AC effect is
    // analytically zero) would flip bits — 1e-6 rounding pins the ties
    def q(x: Double): Double = math.rint(x * 1e6) / 1e6
    val vals = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
      yield q(dct(u)(v))).toArray
    val med = vals.sorted.apply(vals.length / 2)
    var bits = 0L; var idx = 0
    for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0) {
      if (q(dct(u)(v)) > med) bits |= (1L << idx)
      idx += 1
    }
    bits
  }

  private val phashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("phash", LongType, nullable = true)))

  /** Per-payload perceptual hash stage: (media_id, n_bytes, phash), phash
    * null for payloads that don't decode as images. mapPartitions, same
    * shape as [[imageFeatures]] — ImageIO work dwarfs row overhead, and no
    * Catalyst expression fits a raster decode.
    */
  def imagePhash(media: DataFrame, idCol: String = "media_id",
                 payloadCol: String = "payload"): DataFrame = {
    val enc = RowEncoder.encoderFor(phashSchema)
    media.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          Row(id, bytes.length, phash64(bytes).map(Long.box).orNull)
        }
      }(enc).toDF()
  }

  /** Image near-dup pairs: perceptual hashes through the SimHash pigeonhole
    * funnel ([[SimHash.nearDupPairsByFingerprint]]) — candidates ∝ chunk
    * collisions, never all-pairs; undecodable payloads drop out.
    */
  def imageNearDupPairs(media: DataFrame, idCol: String = "media_id",
                        payloadCol: String = "payload", maxDist: Int = 6,
                        maxChunkDocs: Long = 4096L): DataFrame =
    SimHash.nearDupPairsByFingerprint(
      imagePhash(media, idCol, payloadCol), "media_id", col("phash"),
      maxDist, maxChunkDocs)

  // ---------------- content-defined chunking (blob-level dedup) ----------------

  /** Content-defined chunks of a binary payload
    * ([[expressions.GearChunksExpr]]): `array<struct<offset,length,hash>>`,
    * boundaries determined by the payload bytes so an insert/delete only
    * re-chunks its neighborhood — the primitive for dedup of
    * near-identical blobs. Map-side codegen; the payload never shuffles.
    */
  def cdcChunks(payload: Column, minSize: Int = 256, avgBits: Int = 10,
                maxSize: Int = 4096): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(expressions.GearChunksExpr(
      ColumnBridge.expression(payload), minSize, avgBits, maxSize))
  }

  /** Blob near-dup pairs by shared content-defined chunks: payloads whose
    * shared-chunk BYTE mass is ≥ `minOverlap` of the smaller payload.
    * Funnel: per-payload chunking map-side → explode (id, hash, length)
    * triples only (the bytes stay put) → equi-join on the 8-byte chunk
    * hash → per-pair shared-mass aggregation — candidate-proportional,
    * identical shape to the text span dedup.
    */
  def payloadNearDupPairs(media: DataFrame, idCol: String, payloadCol: String,
                          minOverlap: Double = 0.5, minSize: Int = 256,
                          avgBits: Int = 10, maxSize: Int = 4096): DataFrame = {
    val chunks = media
      .select(col(idCol).as("__id"), length(col(payloadCol)).cast("long").as("__bytes"),
        explode(cdcChunks(col(payloadCol), minSize, avgBits, maxSize)).as("c"))
      .select(col("__id"), col("__bytes"), col("c.hash").as("__h"), col("c.length").as("__l"))
      // identical repeated chunks within one payload must count once per hash
      .groupBy(col("__id"), col("__bytes"), col("__h"))
      .agg(min(col("__l")).as("__l"))
    val a = chunks.select(col("__id").as("id_a"), col("__bytes").as("bytes_a"),
      col("__h"), col("__l"))
    val b = chunks.select(col("__id").as("id_b"), col("__bytes").as("bytes_b"),
      col("__h"), col("__l").as("__lb"))
    a.join(b, Seq("__h")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("bytes_a"), col("bytes_b"))
      .agg(sum(least(col("__l"), col("__lb"))).as("shared_bytes"))
      .withColumn("overlap",
        col("shared_bytes") / least(col("bytes_a"), col("bytes_b")))
      .filter(col("overlap") >= minOverlap)
      .select(col("id_a"), col("id_b"), col("shared_bytes"),
        round(col("overlap"), 4).as("overlap"))
  }
}
