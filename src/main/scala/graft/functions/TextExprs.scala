package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Text-sketch primitives for large-scale dedup, as native Catalyst
 * expressions over a token array column (`array<string>`). The
 * reference has no text operators (SURVEY §2.4); these are the
 * north-star LLM-pipeline sketches:
 *
 *  - [[MinHashSigExpr]]: k-permutation MinHash signature — banded into
 *    LSH buckets it finds near-duplicate documents without the O(n²)
 *    pair scan.
 *  - [[SimHashExpr]]: 64-bit Charikar simhash — hamming-close docs are
 *    near-dups.
 *  - [[RollingHashExpr]]: order-sensitive polynomial fingerprint —
 *    exact-content identity cheaper than comparing full text.
 *
 * All hashing is seeded & deterministic (no RNG state on executors) so
 * results are reproducible across runs and cluster sizes.
 */
object TextOps {
  /** 64-bit avalanche mix (splitmix64 finalizer — public domain algorithm). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then avalanched. */
  def hashToken(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /**
   * MinHash signature of a token set: one base hash per token, k
   * virtual permutations via seeded remixing. Returns array<long> of
   * length k. Empty input → all Long.MaxValue (never matches a
   * non-empty doc's band).
   */
  def minhashSig(tokens: ArrayData, k: Int, seed: Long): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val base = hashToken(tokens.getUTF8String(t))
        var i = 0
        while (i < k) {
          val h = mix64(base ^ (seed + i * 0x9E3779B97F4A7C15L))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit simhash over token hashes (unweighted). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = hashToken(tokens.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Order-sensitive polynomial rolling hash over token hashes. */
  def rollingHash(tokens: ArrayData): Long = {
    var h = 1125899906842597L
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val th = if (tokens.isNullAt(t)) 0L else hashToken(tokens.getUTF8String(t))
      h = h * 31L + th
      t += 1
    }
    h
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /**
   * MinHash signature over PRE-HASHED tokens (array<long>). At scale
   * the token/shingle set is hashed to 8-byte keys before any shuffle
   * (strings never leave the scan stage); this variant consumes those
   * hashes directly.
   */
  def minhashSigFromHashes(hashes: ArrayData, k: Int, seed: Long): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = hashes.numElements()
    var t = 0
    while (t < n) {
      if (!hashes.isNullAt(t)) {
        val base = hashes.getLong(t)
        var i = 0
        while (i < k) {
          val h = mix64(base ^ (seed + i * 0x9E3779B97F4A7C15L))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }
}

/**
 * Single-pass text sketching — tokenize / hash / shingle / sketch in
 * one traversal of the UTF-8 bytes, no intermediate token arrays.
 * Composed-builtin equivalents (`split` + `transform` + `slice` +
 * `xxhash64`) re-evaluate the split per shingle position (Catalyst
 * CollapseProject inlines the shared subexpression), going O(tokens²)
 * per document; these stay O(bytes).
 */
object TextPass {
  /** Mean of per-token scores from a driver-built table (null-key-free;
    * misses take `dflt`); empty array → 0.0. Keys are UTF8String so the
    * probe compares bytes — no per-row String materialization. */
  def tokenScoreMean(arr: ArrayData,
      scores: java.util.HashMap[UTF8String, java.lang.Double], dflt: Double): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = scores.get(arr.getUTF8String(i))
      s += (if (v == null) dflt else v.doubleValue())
      i += 1
    }
    s / n
  }

  /** FNV-1a + avalanche over an ASCII-lowercased byte slice. */
  @inline private def hashSlice(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b | 0x20).toByte
      h ^= (b & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    TextOps.mix64(h)
  }

  /** Callback per n-token shingle hash over space-separated tokens. */
  private def eachShingle(text: UTF8String, n: Int)(f: Long => Unit): Unit = {
    val bytes = text.getBytes
    val ring = new Array[Long](n)
    var tokCount = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        ring(tokCount % n) = hashSlice(bytes, start, i)
        tokCount += 1
        if (tokCount >= n) {
          // polynomial combine of the window, oldest token first
          var h = 1125899906842597L
          var j = 0
          while (j < n) { h = h * 31L + ring((tokCount + j) % n); j += 1 }
          f(h)
        }
        start = i + 1
      }
      i += 1
    }
  }

  /** Distinct hashed n-gram shingles of a text. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    eachShingle(text, n) { h => if (seen.add(h)) out += h }
    new GenericArrayData(out.toArray)
  }

  /**
   * ALL hashed n-gram shingles in POSITION order (non-distinct):
   * element i is the hash of the window starting at token i. The
   * positional form the span-rewrite dedup needs — same one-pass
   * O(bytes) traversal as [[shingleHashes]].
   */
  def shingleHashSeq(text: UTF8String, n: Int): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    eachShingle(text, n) { h => out += h }
    new GenericArrayData(out.toArray)
  }

  /**
   * ALL n-gram shingle STRINGS (non-distinct, order preserved), one
   * pass over the bytes — ≡ sliding concat_ws(" ", slice(split(text,
   * " "), i, n)) but O(bytes), where the composed-builtin form is
   * O(tokens²) per doc because Catalyst re-inlines the shared split()
   * into every window (same effect the hashed path documents).
   * Single-space join over split-on-single-space tokens, so empty
   * tokens from consecutive spaces behave exactly like split()'s.
   */
  def shingleStrings(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var tokCount = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        starts(tokCount % n) = start
        ends(tokCount % n) = i
        tokCount += 1
        if (tokCount >= n) {
          var len = n - 1 // n-1 separator spaces
          var j = 0
          while (j < n) { val k = (tokCount + j) % n; len += ends(k) - starts(k); j += 1 }
          val buf = new Array[Byte](len)
          var pos = 0
          j = 0
          while (j < n) {
            val k = (tokCount + j) % n // oldest token first
            val l = ends(k) - starts(k)
            System.arraycopy(bytes, starts(k), buf, pos, l)
            pos += l
            if (j < n - 1) { buf(pos) = ' '; pos += 1 }
            j += 1
          }
          out += UTF8String.fromBytes(buf)
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /**
   * 64-bit simhash over n-gram shingle features, one pass. Shingles
   * (not tokens) keep the sketch discriminative on low-entropy
   * corpora: token sets of natural documents overlap heavily, and a
   * token-level simhash degenerates into a handful of values.
   */
  def simhashDoc(text: UTF8String, n: Int): Long = {
    val counts = new Array[Int](64)
    eachShingle(text, n) { h =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  private val laneCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Per-lane multipliers/offsets (odd a, mixed b) derived once from the seed. */
  private def lanes(k: Int, seed: Long): (Array[Long], Array[Long]) =
    laneCache.computeIfAbsent((k, seed), { _ =>
      val a = new Array[Long](k); val b = new Array[Long](k)
      var i = 0
      while (i < k) {
        a(i) = TextOps.mix64(seed + i * 0x9E3779B97F4A7C15L) | 1L  // odd multiplier
        b(i) = TextOps.mix64(seed ^ (i * 0xC2B2AE3D27D4EB4FL))
        i += 1
      }
      (a, b)
    })

  /**
   * MinHash signature straight from text — duplicates can't change a
   * min, so no distinct set. One avalanche mix per shingle, then the
   * k lanes are universal hashes `a_i*h + b_i` (2 ops per lane — a
   * full mix per (shingle, lane) measured ~2× slower end-to-end).
   */
  def minhashDoc(text: UTF8String, n: Int, k: Int, seed: Long): ArrayData = {
    val (la, lb) = lanes(k, seed)
    val sig = Array.fill(k)(Long.MaxValue)
    eachShingle(text, n) { base =>
      val m = TextOps.mix64(base)
      var i = 0
      while (i < k) {
        val h = la(i) * m + lb(i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /**
   * Apply a learned word-level BPE merge table: merges are applied in
   * rank order; each pass replaces adjacent (x, y) unit pairs
   * left-to-right, non-overlapping (scanning resumes AFTER a merged
   * unit). Merged units join their members with U+0001, which no
   * whitespace token contains — so a merged unit is atomic to later
   * merges, and the replay is exactly a sequence of string
   * `replace` steps over a double-space-separated encoding (which is
   * how the DuckDB oracle reproduces it). O(merges × tokens) per doc,
   * scan-stage.
   */
  def bpeSegment(text: UTF8String, merges: Array[Array[String]]): ArrayData = {
    var units: Array[String] = text.toString.split(" ", -1)
    var r = 0
    while (r < merges.length) {
      val x = merges(r)(0)
      val y = merges(r)(1)
      val out = new Array[String](units.length)
      var i = 0
      var o = 0
      while (i < units.length) {
        if (i < units.length - 1 && units(i) == x && units(i + 1) == y) {
          out(o) = x + "\u0001" + y; i += 2
        } else {
          out(o) = units(i); i += 1
        }
        o += 1
      }
      units = java.util.Arrays.copyOf(out, o)
      r += 1
    }
    new GenericArrayData(units.map(UTF8String.fromString): Array[UTF8String])
  }
}

/**
 * Cross-engine-reproducible hashing: every function here derives from
 * MD5 (a published, universally implemented digest), so a DuckDB /
 * Trino / Postgres oracle can recompute the identical sketch in plain
 * SQL (`('0x' || substr(md5(x), 1, 16))::UBIGINT` + two's-complement
 * wrap). The FNV-based sketches in [[TextOps]]/[[TextPass]] stay the
 * throughput path (no digest per token); these are the
 * verification-grade variants — same algorithms, portable base hash.
 */
object Md5Ops {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of MD5(s), big-endian, as a signed 64-bit value. */
  def md5lo64(s: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  /** 64-bit simhash over md5lo64 feature hashes of a string array (duplicates weighted). */
  def simhashMd5(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = md5lo64(tokens.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Mersenne-prime modulus: products fit in 63 bits (2^31 * 131 + 2^31 < 2^39). */
  final val PolyMod = 2147483647L // 2^31 - 1
  final val PolyBase = 131L

  /**
   * Single-pass md5 simhash over word-n-gram shingles. Because
   * `split(s, ' ')` tokens are joined by exactly one space, every
   * n-token window is a contiguous byte slice of the input — so the
   * sketch equals `simhashMd5(shingle-strings)` while reading the
   * text once (the composed builtin pipeline re-evaluates the split
   * per shingle position, going O(tokens²) per document). Input must
   * already be lowercased (pass `lower(text)`); returns the sketch of
   * zero windows (docs with < n tokens) as 0 — callers filter those.
   */
  def simhashMd5Doc(text: UTF8String, n: Int): Long = {
    val bytes = text.getBytes
    // token start offsets (a token begins at 0 and after every space)
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1 // sentinel: "start" after a virtual space
    val counts = new Array[Int](64)
    val md = md5.get()
    var w = 0
    while (w + n <= nTokens) {
      val from = starts(w)
      val until = starts(w + n) - 1 // end of last token in the window
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      val h = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /**
   * Winnowing fingerprint selection (MOSS) in ONE pass over the
   * lowered text bytes: word-`k`-gram md5lo64 hashes (sign bit
   * cleared so min-ordering matches any signed-64 engine), window-
   * of-`w` minima, distinct. Byte windows between token offsets
   * reproduce `concat_ws(" ", slice(split(text," "), i, k))` exactly
   * (consecutive separators round-trip verbatim). The codegen'd
   * replacement for the interpreted HOF composition, which
   * re-evaluates its lambda per element (~20× slower measured at
   * 200k docs).
   */
  def winnowMd5Doc(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTokens += 1; i += 1 }
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1
    val nGrams = nTokens - k + 1
    if (nGrams < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val grams = new Array[Long](nGrams)
    val md = md5.get()
    var g = 0
    while (g < nGrams) {
      val from = starts(g)
      val until = starts(g + k) - 1
      md.reset()
      md.update(bytes, from, until - from)
      val d = md.digest()
      grams(g) = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) |
        ((d(5) & 0xffL) << 16) | ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) &
        Long.MaxValue
      g += 1
    }
    val nWins = nGrams - w + 1
    val sel = new Array[Long](nWins)
    var j = 0
    while (j < nWins) {
      var mn = grams(j)
      var x = j + 1
      while (x < j + w) { if (grams(x) < mn) mn = grams(x); x += 1 }
      sel(j) = mn
      j += 1
    }
    java.util.Arrays.sort(sel)
    var uniq = 1
    j = 1
    while (j < nWins) { if (sel(j) != sel(j - 1)) uniq += 1; j += 1 }
    val out = new Array[Long](uniq)
    out(0) = sel(0)
    var o = 1
    j = 1
    while (j < nWins) {
      if (sel(j) != sel(j - 1)) { out(o) = sel(j); o += 1 }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /**
   * Order-sensitive polynomial fingerprint over md5lo64 token hashes,
   * mod 2^31-1 — the arithmetic stays in BIGINT range in any SQL
   * engine, so an oracle can fold the identical recurrence with
   * `list_reduce`.
   */
  def polyFingerprintMd5(tokens: ArrayData): Long = {
    var h = 0L
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val th = if (tokens.isNullAt(t)) 0L
        else ((md5lo64(tokens.getUTF8String(t)) % PolyMod) + PolyMod) % PolyMod
      h = (h * PolyBase + th) % PolyMod
      t += 1
    }
    h
  }
}

/** `md5lo64(str)` — first 8 bytes of MD5 as signed big-endian long (cross-engine-reproducible). */
case class Md5Lo64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5lo64"
  override protected def nullSafeEval(in: Any): Any =
    Md5Ops.md5lo64(in.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.md5lo64($c)")
  override protected def withNewChildInternal(c: Expression): Md5Lo64Expr = copy(child = c)
}

/** `simhash_md5_doc(loweredText, n)` — single-pass md5 simhash over word-n-gram shingles. */
case class SimHashMd5DocExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_md5_doc"
  override protected def nullSafeEval(in: Any): Any =
    Md5Ops.simhashMd5Doc(in.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.simhashMd5Doc($c, $n)")
  override protected def withNewChildInternal(c: Expression): SimHashMd5DocExpr = copy(child = c)
}

/** `winnow_md5_doc(text, k, w)` — distinct winnowing fingerprints, one pass (see Md5Ops.winnowMd5Doc). */
case class WinnowMd5DocExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_md5_doc"
  override protected def nullSafeEval(in: Any): Any =
    Md5Ops.winnowMd5Doc(in.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.winnowMd5Doc($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): WinnowMd5DocExpr = copy(child = c)
}

/** `simhash_md5(features)` — 64-bit simhash over md5lo64 hashes of a string array. */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_md5"
  override protected def nullSafeEval(in: Any): Any =
    Md5Ops.simhashMd5(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.simhashMd5($c)")
  override protected def withNewChildInternal(c: Expression): SimHashMd5Expr = copy(child = c)
}

/** `poly_fingerprint(tokens)` — order-sensitive md5-based polynomial fingerprint mod 2^31-1. */
case class PolyFingerprintMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_fingerprint"
  override protected def nullSafeEval(in: Any): Any =
    Md5Ops.polyFingerprintMd5(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.polyFingerprintMd5($c)")
  override protected def withNewChildInternal(c: Expression): PolyFingerprintMd5Expr = copy(child = c)
}

/** `shingle_strings(text, n)` — ALL word-n-gram shingle strings (non-distinct), one pass. */
case class ShingleStringsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_strings"
  override protected def nullSafeEval(in: Any): Any =
    TextPass.shingleStrings(in.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextPass.shingleStrings($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleStringsExpr = copy(child = c)
}

/** `shingle_hash_seq(text, n)` — ALL hashed shingles in position order, one pass. */
case class ShingleHashSeqExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash_seq"
  override protected def nullSafeEval(in: Any): Any =
    TextPass.shingleHashSeq(in.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextPass.shingleHashSeq($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashSeqExpr = copy(child = c)
}

/** `shingle_hashes(text, n)` — distinct hashed word-n-gram shingles, one pass. */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(in: Any): Any =
    TextPass.shingleHashes(in.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextPass.shingleHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
}

/**
 * `bpe_segment(loweredText, merges)` — segment a document by a learned
 * word-level BPE merge table ([[TextPass.bpeSegment]]); the table rides
 * the plan as a codegen reference object, so application is a
 * scan-stage O(merges × tokens) pass with no join against the merge
 * list.
 */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_segment"
  @transient private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray
  override protected def nullSafeEval(in: Any): Any =
    TextPass.bpeSegment(in.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextPass.bpeSegment($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeSegmentExpr = copy(child = c)
}

/**
 * `token_score_mean(tokens, table, default)` — mean over an
 * `array<string>` of a driver-built per-token score (language-model
 * NLL, DSIR importance log-ratios, quality lexicon weights). The
 * score table rides the plan as a codegen reference object (the
 * [[BpeSegmentExpr]] discipline), so scoring is a scan-stage pass
 * with UTF8String-keyed byte-compare lookups — no Scala UDF (no
 * per-row Seq[String] conversion, no SerializedLambda on the wire),
 * no join, no shuffle.
 */
case class TokenScoreMeanExpr(child: Expression,
    scores: java.util.HashMap[UTF8String, java.lang.Double], dflt: Double)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_score_mean"
  override protected def nullSafeEval(in: Any): Any =
    TextPass.tokenScoreMean(in.asInstanceOf[ArrayData], scores, dflt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenScores", scores, "java.util.HashMap")
    // emit the default via its bit pattern (the Literal-codegen
    // discipline): a raw `${dflt}D` interpolation produces
    // uncompilable Java for non-finite defaults (`NaND`, `InfinityD`)
    // and silently kicks the stage out of whole-stage codegen
    val dBits = java.lang.Double.doubleToLongBits(dflt)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextPass.tokenScoreMean($c, $ref, Double.longBitsToDouble(${dBits}L))")
  }
  override protected def withNewChildInternal(c: Expression): TokenScoreMeanExpr =
    copy(child = c)
}

/** `minhash_doc(text, n, k, seed)` — k-long MinHash signature computed in the scan stage. */
case class MinHashDocExpr(child: Expression, n: Int, k: Int, seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_doc"
  override protected def nullSafeEval(in: Any): Any =
    TextPass.minhashDoc(in.asInstanceOf[UTF8String], n, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextPass.minhashDoc($c, $n, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashDocExpr = copy(child = c)
}

/** `simhash_doc(text, n)` — 64-bit simhash over shingle features, scan-stage. */
case class SimHashDocExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_doc"
  override protected def nullSafeEval(in: Any): Any =
    TextPass.simhashDoc(in.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextPass.simhashDoc($c, $n)")
  override protected def withNewChildInternal(c: Expression): SimHashDocExpr = copy(child = c)
}

case class MinHashSigLongExpr(child: Expression, k: Int, seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig_long"
  override protected def nullSafeEval(in: Any): Any =
    TextOps.minhashSigFromHashes(in.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.minhashSigFromHashes($c, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSigLongExpr = copy(child = c)
}

case class MinHashSigExpr(child: Expression, k: Int, seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(in: Any): Any =
    TextOps.minhashSig(in.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.minhashSig($c, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(in: Any): Any =
    TextOps.simhash64(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHashExpr = copy(child = c)
}

case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"
  override protected def nullSafeEval(in: Any): Any =
    TextOps.rollingHash(in.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHashExpr = copy(child = c)
}

object TextFunctions {
  /** k-long MinHash signature column over an `array<string>` tokens column. */
  def minhash_sig(tokens: Column, k: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(tokens), k, seed))

  /** MinHash signature over pre-hashed (array<long>) token/shingle sets. */
  def minhash_sig_long(hashes: Column, k: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSigLongExpr(ColumnBridge.expression(hashes), k, seed))

  /** Distinct hashed word-n-gram shingles, single pass over the text bytes. */
  def shingle_hashes(text: Column, n: Int = 5): Column =
    ColumnBridge.column(ShingleHashesExpr(ColumnBridge.expression(text), n))

  /** All n-gram shingle strings (non-distinct), one O(bytes) pass. */
  def shingle_strings(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleStringsExpr(ColumnBridge.expression(text), n))

  /** All hashed shingles in position order (non-distinct), one O(bytes) pass. */
  def shingle_hash_seq(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSeqExpr(ColumnBridge.expression(text), n))

  /** k-long MinHash signature straight from text (scan-stage, zero shuffle). */
  def minhash_doc(text: Column, n: Int = 5, k: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashDocExpr(ColumnBridge.expression(text), n, k, seed))

  /** 64-bit simhash over shingle features, straight from text. */
  def simhash_doc(text: Column, n: Int = 5): Column =
    ColumnBridge.column(SimHashDocExpr(ColumnBridge.expression(text), n))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokens)))

  def rolling_hash(tokens: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(tokens)))

  /** First 8 bytes of MD5 as signed big-endian long — cross-engine-reproducible base hash. */
  def md5lo64(s: Column): Column =
    ColumnBridge.column(Md5Lo64Expr(ColumnBridge.expression(s)))

  /** 64-bit simhash over md5lo64 feature hashes (verification-grade variant). */
  def simhash_md5(features: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(features)))

  /** Single-pass md5 simhash over word-n-gram shingles of an already-lowercased text. */
  def simhash_md5_doc(loweredText: Column, n: Int = 5): Column =
    ColumnBridge.column(SimHashMd5DocExpr(ColumnBridge.expression(loweredText), n))

  /** Distinct winnowing fingerprints of an already-lowercased text, one pass. */
  def winnow_md5_doc(loweredText: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowMd5DocExpr(ColumnBridge.expression(loweredText), k, w))

  /** Order-sensitive md5-based polynomial fingerprint mod 2^31-1. */
  def poly_fingerprint(tokens: Column): Column =
    ColumnBridge.column(PolyFingerprintMd5Expr(ColumnBridge.expression(tokens)))

  /** BPE segmentation of an already-lowercased text by a rank-ordered merge table. */
  def bpe_segment(loweredText: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegmentExpr(ColumnBridge.expression(loweredText), merges))

  /** Mean per-token score from a driver-built table; misses take `dflt`. */
  def token_score_mean(tokens: Column, scores: collection.Map[String, Double],
      dflt: Double): Column = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](scores.size * 2)
    scores.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Double.valueOf(v)) }
    ColumnBridge.column(TokenScoreMeanExpr(ColumnBridge.expression(tokens), m, dflt))
  }
}
