package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing (north-star, SURVEY §2.4): media
 * payloads are opaque `binary` columns travelling next to a typed
 * metadata struct; decode / feature-extraction runs as a
 * partition-batched transform so a real decoder (image/audio libs)
 * can drop in without changing the plan shape.
 *
 * STUB NOTE: this container has no media codecs, so `decodeStub`
 * below is a clearly-marked deterministic fake (byte statistics in
 * place of pixels). The Spark-side plumbing — schema, batch
 * iteration, partitioning, output shape — is real and tested; a
 * production deployment swaps `stubFeatures` for the actual codec
 * call.
 */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)))

  /**
   * Promote a text corpus to the multimodal layout: payload =
   * UTF-8 bytes (standing in for image/audio bytes), metadata
   * struct alongside. At 100 TB payloads stay columnar in parquet;
   * nothing here materializes them on the driver.
   */
  def attachBinary(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("source"),
        octet_length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes")).as("meta"))

  /**
   * Output schema of the (stub) feature extractor. All-integer
   * statistics (sum instead of mean) so the DuckDB oracle reproduces
   * them exactly — float means would hit rounding-mode divergence.
   */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sum_bytes", LongType, nullable = false),
    StructField("max_byte", LongType, nullable = false),
    StructField("head_crc_slot", LongType, nullable = false)))

  /**
   * The decoder plug point: a real deployment implements this with a
   * codec handle (libjpeg/ffmpeg context, model session, …) opened in
   * the factory passed to [[decodeWith]] — construction is the
   * expensive part the per-partition batch shape amortizes.
   */
  trait PayloadDecoder extends Serializable {
    def features(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long)
  }

  /**
   * Batched decode/feature-extract over the binary payload with a
   * CALLER-SUPPLIED decoder — the `mapInPandas`-shaped stage of a
   * media pipeline, expressed as `mapPartitions` (JVM-side; batch =
   * partition iterator). The factory runs ONCE per partition and the
   * handle is reused for every record — exactly what mapInPandas
   * batching buys a Python media pipeline. Swapping in a real codec
   * is passing a different factory; the plumbing (schema, batching,
   * partitioning) is identical — and tested, via a spec that plugs a
   * non-stub decoder in.
   */
  def decodeWith(withBinary: DataFrame,
      openDecoder: () => PayloadDecoder): DataFrame = {
    val spark = withBinary.sparkSession
    val rows = withBinary.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      val decoder = openDecoder()
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        Row.fromTuple(decoder.features(id, bytes))
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }

  /**
   * [[decodeWith]] plugged with the deterministic stub (byte
   * statistics standing in for pixel/sample features — the sandbox
   * ships no codecs; the oracle replays the stub arithmetic exactly).
   */
  def decodeStub(withBinary: DataFrame): DataFrame =
    decodeWith(withBinary, () => StubDecoder.open())

  /**
   * Stand-in for a real codec handle: `opens` counts constructions so
   * tests can assert once-per-partition, never per-record.
   */
  object StubDecoder {
    val opens = new java.util.concurrent.atomic.AtomicLong(0L)
    def open(): StubDecoder = { opens.incrementAndGet(); new StubDecoder }
  }
  final class StubDecoder extends PayloadDecoder {
    def features(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long) =
      stubFeatures(id, bytes)
  }

  /** Deterministic fake decoder: byte statistics standing in for real features. */
  private def stubFeatures(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    var sum = 0L; var mx = 0L; var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b; if (b > mx) mx = b; i += 1
    }
    val head = new String(bytes, 0, math.min(16, bytes.length), "UTF-8")
    (id, bytes.length.toLong, sum, mx, graft.core.Slots.slot(head).toLong)
  }

  // -------------------------------------------------------------------
  // REAL codec path: javax.imageio (java.desktop ships PNG/BMP/GIF
  // codecs with every JDK — no new dependency). The stub above stays
  // for synthetic probes; this is the default factory a production
  // image pipeline starts from.
  // -------------------------------------------------------------------

  /** Output schema of the real image decode: exact decoded geometry + pixel sum. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("px_sum", LongType, nullable = false)))

  /** Decoder contract for real image payloads (same plug-point shape as [[PayloadDecoder]]). */
  trait ImageDecoder extends Serializable {
    def features(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long)
  }

  /**
   * The shipped default: decode with `javax.imageio.ImageIO` — a REAL
   * codec running on real compressed bytes, not a byte-statistics
   * stub. Emits exact decoded width/height and the sum of the
   * blue-channel values (= gray level for grayscale payloads), all
   * integers so a truth-column oracle replays them exactly.
   */
  object ImageIoDecoder {
    val opens = new java.util.concurrent.atomic.AtomicLong(0L)
    def open(): ImageIoDecoder = { opens.incrementAndGet(); new ImageIoDecoder }
  }
  final class ImageIoDecoder extends ImageDecoder {
    def features(id: Long, bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload for doc $id")
      val w = img.getWidth
      val h = img.getHeight
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { s += (img.getRGB(x, y) & 0xff); x += 1 }
        y += 1
      }
      (id, w.toLong, h.toLong, w.toLong * h, s)
    }
  }

  /**
   * Batched REAL image decode over the binary payload — identical
   * plumbing to [[decodeWith]] (factory once per partition, handle
   * reused per record; schema/batching/partitioning unchanged), but
   * the default factory is the [[ImageIoDecoder]]: this is the
   * non-stub media→features stage.
   */
  def decodeImages(withBinary: DataFrame,
      openDecoder: () => ImageDecoder = () => ImageIoDecoder.open()): DataFrame = {
    val spark = withBinary.sparkSession
    val rows = withBinary.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      val decoder = openDecoder()
      it.map { r =>
        Row.fromTuple(decoder.features(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    }
    spark.createDataFrame(rows, imageFeatureSchema)
  }

  /**
   * Deterministic grayscale PNG encoder (UDF): pixel (x, y) of doc
   * `id` carries gray level (id·31 + x·7 + y·13) mod 256. Real
   * `ImageIO.write` PNG bytes — so [[decodeImages]] exercises a true
   * compress→decompress round trip — while the TRUTH (dimensions,
   * pixel sum) stays closed-form over (id, w, h), replayable by any
   * engine without a codec. The encode is per-row imperative work by
   * nature; a UDF is the honest shape (it IS the workload, not a
   * scalar wrapper Catalyst could have codegen'd).
   */
  def encodePng: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, w: Int, h: Int) =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

  /**
   * Pixel-level perceptual hash over the DECODED image — block-mean
   * pHash on real pixels, the image-domain counterpart of the
   * byte-level [[graft.functions.PHash64Expr]]: the image divides
   * into an 8×8 grid (block of pixel (x, y) is
   * (y·8/h)·8 + (x·8/w), floor division), and bit b is set iff block
   * b's mean gray level exceeds the global mean — compared in EXACT
   * integer arithmetic (s_b·N > total·n_b), so any engine replays the
   * 64 bits bit-for-bit from closed-form pixels. Output (doc_id, ph)
   * feeds [[Dedup.simhashPairsFromSketches]] unchanged for near-dup
   * pair generation.
   */
  def imagePhash(withBinary: DataFrame): DataFrame = {
    val spark = withBinary.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ph", LongType, nullable = false)))
    val rows = withBinary.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, s"undecodable image payload for doc $id")
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (img.getRGB(x, y) & 0xff).toLong
            val b = (y * 8 / h) * 8 + (x * 8 / w)
            sums(b) += v
            counts(b) += 1
            total += v
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var ph = 0L
        var b = 0
        while (b < 64) {
          if (counts(b) > 0 && sums(b) * n > total * counts(b)) ph |= (1L << b)
          b += 1
        }
        Row(id, ph)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /**
   * REAL image resize through the in-JDK codec: decode (ImageIO) →
   * nearest-neighbor resample of the PIXEL grid — output (x, y) takes
   * source pixel (x·factor, y·factor), output dims ⌈w/f⌉×⌈h/f⌉ —
   * → re-encode PNG. Unlike [[resizeStub]]'s byte-stride this
   * transforms decoded pixels, yet the result stays closed-form for
   * deterministic fixtures, so a codec-less oracle replays the
   * decoded truth of the RESIZED image exactly. Same mapPartitions
   * batch shape as [[decodeImages]] (plan: scan → narrow map, no
   * shuffle, no driver materialization).
   */
  def resizeImages(withBinary: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val spark = withBinary.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rows = withBinary.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, s"undecodable image payload for doc $id")
        val w2 = (img.getWidth + factor - 1) / factor
        val h2 = (img.getHeight + factor - 1) / factor
        val out = new java.awt.image.BufferedImage(
          w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            out.setRGB(x, y, img.getRGB(x * factor, y * factor))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Row(id, bos.toByteArray)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /**
   * Media → embedding stage: deterministic pseudo-embedding per
   * payload via [[graft.functions.ByteEmbedExpr]] (scan-stage; a real
   * deployment swaps in a model encoder, same schema). Output feeds
   * directly into the Similarity operators — the multimodal→vector→
   * ANN pipeline end to end.
   */
  def embedStub(withBinary: DataFrame, dim: Int = 8): DataFrame =
    withBinary.select(col("doc_id"),
      graft.functions.VectorFunctions.byte_embed(col("payload"), dim)
        .cast("array<double>").as("embedding"))

  /**
   * Resize/downsample stage: every `factor`-th byte of the payload
   * ([[graft.functions.ByteStrideExpr]]), metadata updated to the new
   * size. STUB for a pixel-aware resampler — the plan shape (scan-
   * stage byte transform, no shuffle, no driver materialization) is
   * what a real resize keeps.
   */
  def resizeStub(withBinary: DataFrame, factor: Int = 2): DataFrame =
    withBinary.select(
      col("doc_id"),
      graft.functions.VectorFunctions.byte_stride(col("payload"), factor).as("payload"),
      struct(
        col("meta.mime").as("mime"),
        col("meta.source").as("source"),
        octet_length(graft.functions.VectorFunctions.byte_stride(col("payload"), factor))
          .cast(LongType).as("n_bytes")).as("meta"))

  /**
   * Frame sampling: every `stride`-th fixed-size chunk of the payload
   * (the video-frame-sample shape: cheap slicing, no decode).
   */
  def frameSample(withBinary: DataFrame, chunk: Int = 64, stride: Int = 4): DataFrame =
    withBinary.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), (octet_length(col("payload")) / (chunk * stride)).cast(IntegerType)),
        i => substring(col("payload"), i * chunk * stride + 1, lit(chunk)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .filter(octet_length(col("frame")) > 0)

  /**
   * Perceptual-hash near-dup pairs over the binary payload: 64-bit
   * [[graft.functions.PHash64Expr]] per payload (scan stage), then
   * pairs within hamming distance ≤ `maxHamming`. Candidates come
   * from 16-bit band buckets — by pigeonhole a pair ≤ 3 bits apart
   * has at least one of its 4 bands identical, so recall is EXACT for
   * maxHamming ≤ 3 while the join never compares across buckets (the
   * all-pairs self-join the blocking avoids is quadratic in corpus
   * size; buckets are capped like every Dedup candidate generator).
   * The media analog of [[Dedup.simhashNearDupPairs]].
   */
  def phashNearDupPairs(withBinary: DataFrame, maxHamming: Int = 3,
      maxBucket: Int = 500): DataFrame = {
    // a phash is a 64-bit sketch under hamming distance — exactly the
    // simhash pair problem, so delegate to the hardened generator:
    // 4×16-bit band buckets, and OVERSIZED buckets refine into 12-bit
    // sub-piece buckets instead of paying bucket² or dropping recall
    // (pigeonhole keeps recall exact for hamming ≤ 3). The previous
    // band-only formulation measured 194 s at 200k payloads — similar
    // payloads collide whole 16-bit bands, and capped-but-huge buckets
    // still exploded quadratically.
    val ph = withBinary.select(col("doc_id").as("id"),
      graft.functions.VectorFunctions.phash64(col("payload")).as("sk"))
    graft.operators.Dedup.simhashPairsFromSketches(ph, maxHamming, maxBucket)
  }
}
