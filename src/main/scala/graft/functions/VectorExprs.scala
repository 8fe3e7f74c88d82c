package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Vector math over `array<float>` / `array<double>` embedding columns,
 * as native Catalyst expressions (whole-stage codegen; double
 * accumulation regardless of element type, so results are stable and
 * oracle-comparable).
 *
 * The reference engine has no vector ops (SURVEY §2.4) — these are the
 * north-star similarity-search primitives for LLM-scale data
 * pipelines: cosine top-k, LSH bucketing (via [[RandomProjExpr]]), and
 * embedding near-dup detection build on them.
 */
object VectorOps {
  /** Called from generated code. Double-accumulated cosine similarity. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  /** Cosine between an array<double> value and a driver-built centroid
    * — bit-identical kernel to [[cosineD]]/Similarity.cosineArr. */
  def cosineDA(a: ArrayData, c: Array[Double]): Double = {
    val n = math.min(a.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = c(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Top-n centroid ids by cosine (desc; earlier id wins ties via the
    * strict insertion compare), over a driver-built matrix sorted by id. */
  def topCentroids(v: ArrayData, ids: Array[Long],
      cents: Array[Array[Double]], n: Int): ArrayData = {
    val bs = new Array[Long](n); val cs = new Array[Double](n)
    var filled = 0
    var ci = 0
    while (ci < cents.length) {
      val c = cosineDA(v, cents(ci))
      var pos = filled
      while (pos > 0 && c > cs(pos - 1)) pos -= 1
      if (pos < n) {
        val last = math.min(filled, n - 1)
        var j = last; while (j > pos) { bs(j) = bs(j - 1); cs(j) = cs(j - 1); j -= 1 }
        bs(pos) = ids(ci); cs(pos) = c
        if (filled < n) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(bs.take(filled))
  }

  /** Cosine-distance silhouette of a vector against its own centroid (a)
    * and the nearest other centroid (b): (b−a)/max(a,b), 0 when both 0. */
  def silhouetteScore(v: ArrayData, cl: Long, ids: Array[Long],
      cents: Array[Array[Double]]): Double = {
    var a = 0.0
    var bMin = Double.PositiveInfinity
    var i = 0
    while (i < cents.length) {
      val d = 1.0 - cosineDA(v, cents(i))
      if (ids(i) == cl) a = d else if (d < bMin) bMin = d
      i += 1
    }
    val m = math.max(a, bMin)
    if (m == 0.0) 0.0 else (bMin - a) / m
  }

  /** PQ-encode one vector: per subspace, the L2-nearest codebook entry
    * (strict compare — lowest entry wins ties); also the total squared
    * reconstruction error. */
  def pqEncode(v: ArrayData, m: Int,
      books: Array[Array[Double]]): (Array[Long], Double) = {
    val subdim = v.numElements() / m
    val codes = new Array[Long](m)
    var err2 = 0.0
    var j = 0
    while (j < m) {
      var bestB = -1
      var bestD = Double.PositiveInfinity
      var b = 0
      while (b < books.length) {
        val c = books(b)
        var d = 0.0
        var i = 0
        while (i < subdim) {
          val diff = v.getDouble(j * subdim + i) - c(j * subdim + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestB = b } // strict: lowest b wins ties
        b += 1
      }
      codes(j) = bestB.toLong
      err2 += bestD
      j += 1
    }
    (codes, err2)
  }

  def pqCodes(v: ArrayData, m: Int, books: Array[Array[Double]]): ArrayData =
    new GenericArrayData(pqEncode(v, m, books)._1)

  def pqEncodeStruct(v: ArrayData, m: Int,
      books: Array[Array[Double]]): org.apache.spark.sql.catalyst.InternalRow = {
    val (codes, err2) = pqEncode(v, m, books)
    org.apache.spark.sql.catalyst.InternalRow(
      new GenericArrayData(codes), math.sqrt(err2))
  }

  /** Called from generated code: PQ asymmetric distance (see [[PqAdcExpr]]). */
  def pqAdc(qv: ArrayData, codes: ArrayData,
      books: Array[Array[Double]], m: Int): Double = {
    val subdim = qv.numElements() / m
    var d = 0.0
    var j = 0
    while (j < m) {
      val c = books(codes.getLong(j).toInt)
      var i = 0
      while (i < subdim) {
        val diff = qv.getDouble(j * subdim + i) - c(j * subdim + i)
        d += diff * diff
        i += 1
      }
      j += 1
    }
    d
  }

  /**
   * Called from generated code: ADC against PRECOMPUTED per-query
   * distance tables — tables(q)(j)(b) = ||qsub_j − book[b]sub_j||²,
   * so one code row scores against every query with m lookups per
   * query (the standard PQ search trick; no query vector ever rides
   * a scored row).
   */
  def pqAdcTables(codes: ArrayData,
      tables: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Double](tables.length)
    var q = 0
    while (q < tables.length) {
      val t = tables(q)
      var d = 0.0
      var j = 0
      while (j < t.length) {
        d += t(j)(codes.getLong(j).toInt)
        j += 1
      }
      out(q) = d
      q += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Sign-bit sketch of a vector against `k` deterministic random
   * hyperplanes (seeded xorshift — no RNG state on executors): the
   * classic random-projection LSH for cosine distance. Vectors with
   * high cosine similarity agree on most bits, so equal sketch
   * prefixes form ANN candidate buckets.
   */
  def randomProjBitsF(a: ArrayData, k: Int, seed: Long): Long =
    randomProjBits(a, k, seed, isFloat = true)

  def randomProjBitsD(a: ArrayData, k: Int, seed: Long): Long =
    randomProjBits(a, k, seed, isFloat = false)

  private def randomProjBits(a: ArrayData, k: Int, seed: Long, isFloat: Boolean): Long = {
    val n = a.numElements()
    var bits = 0L
    var h = 0
    while (h < k) {
      // per-(plane,dim) pseudo-random gaussian-ish weight in [-1,1)
      var acc = 0.0
      var i = 0
      while (i < n) {
        var z = seed + h.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        val w = (z.toDouble / Long.MaxValue.toDouble) // [-1,1]
        acc += w * (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      if (acc >= 0) bits |= (1L << h)
      h += 1
    }
    bits
  }
}

/**
 * md5-derived random-projection planes (verification-grade LSH): the
 * plane weight for (table, bit, dim) is ±1 by the low bit of the
 * first 8 md5 bytes of "lsh:table:bit:dim". Deterministic with no RNG
 * state, and exactly reproducible in any engine with an md5 function
 * (DuckDB: `('0x'||substr(md5(s),1,16))::UBIGINT & 1`) — so LSH
 * bucketing itself becomes oracle-checkable, like the md5 simhash
 * (TextExprs.Md5Ops). Plane matrices are cached per (table, k).
 */
object Md5Proj {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(table: Int, k: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((table, k), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(k) { b =>
        Array.tabulate(dims) { i =>
          val d = md.digest(s"lsh:$table:$b:$i".getBytes("UTF-8"))
          // low bit of the big-endian first-8-byte word = low bit of byte 7
          if ((d(7) & 1) == 1) 1.0 else -1.0
        }
      }
    })

  /** k-bit sketch of a float-array vector against table `table`'s md5 planes. */
  def md5ProjBitsF(a: ArrayData, k: Int, table: Int): Long = {
    val n = a.numElements()
    val ps = planes(table, k, 64)
    var bits = 0L
    var b = 0
    while (b < k) {
      val p = ps(b)
      val m = math.min(n, p.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += p(i) * a.getFloat(i).toDouble; i += 1 }
      if (acc >= 0) bits |= (1L << b)
      b += 1
    }
    bits
  }

  /** Double-array variant (same planes, same semantics). */
  def md5ProjBitsD(a: ArrayData, k: Int, table: Int): Long = {
    val n = a.numElements()
    val ps = planes(table, k, 64)
    var bits = 0L
    var b = 0
    while (b < k) {
      val p = ps(b)
      val m = math.min(n, p.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += p(i) * a.getDouble(i); i += 1 }
      if (acc >= 0) bits |= (1L << b)
      b += 1
    }
    bits
  }
}

/**
 * `byte_embed(payload, dim)` — deterministic pseudo-embedding of a
 * binary payload: element j = sum of unsigned bytes at positions ≡ j
 * (mod dim). The stub "feature extractor" of the multimodal pipeline
 * (a real deployment swaps in a model encoder); integer sums make it
 * exactly reproducible in the DuckDB oracle. Scan-stage, O(bytes).
 */
object ByteEmbedOps {
  def byteEmbed(bytes: Array[Byte], dim: Int): ArrayData = {
    val out = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff).toLong; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * `byte_stride(payload, k)` — every k-th byte of a binary payload:
 * the resize/downsample stage of the multimodal pipeline (a real
 * deployment swaps in a pixel-aware resampler; the plan shape — a
 * scan-stage byte transform — is identical). O(bytes), codegen'd.
 */
object ByteStrideOps {
  def byteStride(bytes: Array[Byte], k: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + k - 1) / k)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * k); i += 1 }
    out
  }
}

case class ByteStrideExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_stride"

  override protected def nullSafeEval(a: Any): Any =
    ByteStrideOps.byteStride(a.asInstanceOf[Array[Byte]], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ByteStrideOps.byteStride($a, $k)")

  override protected def withNewChildInternal(c: Expression): ByteStrideExpr = copy(child = c)
}

/**
 * `phash64(payload)` — perceptual-hash stand-in over a binary
 * payload: the byte stream is divided into a 64-block grid (the
 * "resize"), and bit i is set iff block i's mean exceeds the global
 * mean, compared exactly by cross-multiplication (s_i·n > total·len_i
 * — no float division, so any engine replays the hash
 * bit-identically). A production image pipeline swaps the byte grid
 * for DCT coefficients of decoded pixels; the near-dup machinery on
 * top (band blocking + hamming verify) is unchanged. Exact for
 * payloads to ~100 MB (s_i·n ≤ 255·n² < 2⁶³).
 */
object PHashOps {
  def phash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var total = 0L
    var i = 0
    while (i < n) { total += (bytes(i) & 0xff); i += 1 }
    var h = 0L
    var b = 0
    while (b < 64) {
      val st = b * n / 64
      val en = (b + 1) * n / 64
      var s = 0L
      var j = st
      while (j < en) { s += (bytes(j) & 0xff); j += 1 }
      if (s * n > total * (en - st)) h |= (1L << b)
      b += 1
    }
    h
  }
}

case class PHash64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phash64"

  override protected def nullSafeEval(a: Any): Any =
    PHashOps.phash64(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PHashOps.phash64($a)")

  override protected def withNewChildInternal(c: Expression): PHash64Expr = copy(child = c)
}

case class ByteEmbedExpr(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_embed"

  override protected def nullSafeEval(a: Any): Any =
    ByteEmbedOps.byteEmbed(a.asInstanceOf[Array[Byte]], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.ByteEmbedOps.byteEmbed($a, $dim)")

  override protected def withNewChildInternal(c: Expression): ByteEmbedExpr = copy(child = c)
}

/** `cosine_sim(a, b)` — cosine similarity of two embedding arrays. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (isFloat) VectorOps.cosineF(x, y) else VectorOps.cosineD(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isFloat) "cosineF" else "cosineD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** `rand_proj_bits(vec)` — k-bit random-hyperplane LSH sketch. */
case class RandomProjExpr(child: Expression, k: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rand_proj_bits"

  private def fn: String = child.dataType match {
    case ArrayType(FloatType, _) => "randomProjBitsF"
    case _ => "randomProjBitsD"
  }

  override protected def nullSafeEval(a: Any): Any =
    if (fn == "randomProjBitsF") VectorOps.randomProjBitsF(a.asInstanceOf[ArrayData], k, seed)
    else VectorOps.randomProjBitsD(a.asInstanceOf[ArrayData], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.$fn($a, $k, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): RandomProjExpr = copy(child = c)
}

/** `md5_proj_bits(vec)` — k-bit md5-plane LSH sketch (cross-engine-reproducible). */
case class Md5ProjExpr(child: Expression, k: Int, table: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_proj_bits"

  private def fn: String = child.dataType match {
    case ArrayType(FloatType, _) => "md5ProjBitsF"
    case _ => "md5ProjBitsD"
  }

  override protected def nullSafeEval(a: Any): Any =
    if (fn == "md5ProjBitsF") Md5Proj.md5ProjBitsF(a.asInstanceOf[ArrayData], k, table)
    else Md5Proj.md5ProjBitsD(a.asInstanceOf[ArrayData], k, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Md5Proj.$fn($a, $k, $table)")

  override protected def withNewChildInternal(c: Expression): Md5ProjExpr = copy(child = c)
}

/**
 * `pq_adc(queryVec, codes)` — PQ asymmetric distance: Σ over the m
 * subspaces of ||qsub_j − codebook[code_j]||². The codebook matrix
 * rides the plan as a codegen reference object (like the BPE merge
 * table), so scoring stays inside whole-stage codegen with direct
 * ArrayData access — no per-row Seq boxing, which dominates the
 * equivalent Scala UDF at millions of scored pairs.
 */
/**
 * `top_centroids(v, n)` over a driver-built (ids, centroid-matrix) pair
 * — the IVF/kmeans coarse-assignment kernel as a scan-stage codegen
 * expression: the matrix rides the plan as a reference object, each row
 * costs one pass over nlist centroids, no UDF and no per-row
 * Seq[Double] conversion. Top-n by (cosine desc, id asc — strict
 * insertion compare keeps the earlier id on ties).
 */
case class TopCentroidsExpr(child: Expression, ids: Array[Long],
    cents: Array[Array[Double]], n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_centroids"
  override protected def nullSafeEval(in: Any): Any =
    VectorOps.topCentroids(in.asInstanceOf[ArrayData], ids, cents, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val cRef = ctx.addReferenceObj("centMatrix", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOps.topCentroids($c, $idRef, $cRef, $n)")
  }
  override protected def withNewChildInternal(c: Expression): TopCentroidsExpr =
    copy(child = c)
}

/** `silhouette(v, cl)` against a driver-built centroid matrix (see
  * [[VectorOps.silhouetteScore]]) — scan-stage, no UDF. */
case class SilhouetteExpr(left: Expression, right: Expression,
    ids: Array[Long], cents: Array[Array[Double]]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "silhouette"
  override protected def nullSafeEval(v: Any, cl: Any): Any =
    VectorOps.silhouetteScore(v.asInstanceOf[ArrayData],
      cl.asInstanceOf[Long], ids, cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val cRef = ctx.addReferenceObj("centMatrix", cents, "double[][]")
    defineCodeGen(ctx, ev, (v, cl) =>
      s"graft.functions.VectorOps.silhouetteScore($v, $cl, $idRef, $cRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `pq_codes(v)` — PQ code array under a driver-built codebook
  * ([[VectorOps.pqEncode]]), scan-stage, no UDF. */
case class PqCodesExpr(child: Expression, m: Int,
    books: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes"
  override protected def nullSafeEval(in: Any): Any =
    VectorOps.pqCodes(in.asInstanceOf[ArrayData], m, books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.pqCodes($c, $m, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PqCodesExpr =
    copy(child = c)
}

/** `pq_encode(v)` — struct(codes array<bigint>, err double) where err is
  * the root total squared reconstruction error. */
case class PqEncodeExpr(child: Expression, m: Int,
    books: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("err", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"
  override protected def nullSafeEval(in: Any): Any =
    VectorOps.pqEncodeStruct(in.asInstanceOf[ArrayData], m, books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.pqEncodeStruct($c, $m, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

case class PqAdcExpr(left: Expression, right: Expression,
    books: Array[Array[Double]], m: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.pqAdc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], books, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][]")
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.pqAdc($a, $b, $ref, $m)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/**
 * `pq_adc_tables(codes)` — one ADC distance per query from
 * precomputed per-query distance tables ([[VectorOps.pqAdcTables]]);
 * the tables ride the plan as a codegen reference object.
 */
case class PqAdcTablesExpr(child: Expression,
    tables: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_tables"

  override protected def nullSafeEval(a: Any): Any =
    VectorOps.pqAdcTables(a.asInstanceOf[ArrayData], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqTables", tables, "double[][][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps.pqAdcTables($a, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PqAdcTablesExpr = copy(child = c)
}

object VectorFunctions {
  /** Cosine similarity as a Column function (codegen'd, no UDF). */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Top-n centroid ids by cosine over a driver-built (id, centroid) matrix. */
  def top_centroids(v: Column, cents: Array[(Long, Array[Double])], n: Int): Column =
    ColumnBridge.column(TopCentroidsExpr(ColumnBridge.expression(v),
      cents.map(_._1), cents.map(_._2), n))

  /** Cosine-distance silhouette against a driver-built centroid matrix. */
  def silhouette_score(v: Column, cl: Column, cents: Array[(Long, Array[Double])]): Column =
    ColumnBridge.column(SilhouetteExpr(ColumnBridge.expression(v),
      ColumnBridge.expression(cl), cents.map(_._1), cents.map(_._2)))

  /** PQ code array under a driver-built codebook. */
  def pq_codes(v: Column, m: Int, books: Array[Array[Double]]): Column =
    ColumnBridge.column(PqCodesExpr(ColumnBridge.expression(v), m, books))

  /** PQ struct(codes, err) — codes plus root squared reconstruction error. */
  def pq_encode(v: Column, m: Int, books: Array[Array[Double]]): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(v), m, books))

  /** PQ asymmetric distance of a query vector against a code row. */
  def pq_adc(queryVec: Column, codes: Column, books: Array[Array[Double]], m: Int): Column =
    ColumnBridge.column(PqAdcExpr(ColumnBridge.expression(queryVec),
      ColumnBridge.expression(codes), books, m))

  /** Per-query ADC distances of a code row against precomputed tables. */
  def pq_adc_tables(codes: Column, tables: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcTablesExpr(ColumnBridge.expression(codes), tables))

  def rand_proj_bits(v: Column, k: Int = 16, seed: Long = 42L): Column =
    ColumnBridge.column(RandomProjExpr(ColumnBridge.expression(v), k, seed))

  def md5_proj_bits(v: Column, k: Int, table: Int): Column =
    ColumnBridge.column(Md5ProjExpr(ColumnBridge.expression(v), k, table))

  def byte_embed(payload: Column, dim: Int): Column =
    ColumnBridge.column(ByteEmbedExpr(ColumnBridge.expression(payload), dim))

  def byte_stride(payload: Column, k: Int): Column =
    ColumnBridge.column(ByteStrideExpr(ColumnBridge.expression(payload), k))

  def phash64(payload: Column): Column =
    ColumnBridge.column(PHash64Expr(ColumnBridge.expression(payload)))

  def crc16_slot(c: Column): Column =
    ColumnBridge.column(Crc16SlotExpr(ColumnBridge.expression(c)))
}
