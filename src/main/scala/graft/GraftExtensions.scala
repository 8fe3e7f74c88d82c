package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/**
 * SQL surface of the engine: registers every custom Catalyst
 * expression in the session's FunctionRegistry so `spark.sql(...)`
 * and `expr(...)` users get the same operators as the Scala API.
 *
 * Two deployment paths (both idiomatic Spark):
 *  - config: `spark.sql.extensions=graft.GraftExtensions`
 *  - code:   `GraftExtensions.register(spark)` on an existing session.
 *
 * Literal-argument convention: the sketch parameters (k, n, seed) are
 * plan-time constants — they must be foldable literals, mirroring how
 * the reference bakes step args into the serialized execution
 * (reference: src/mr.c:191-195,1259-1277).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // operator-optimization placement: pruning lands before scan
    // planning, so segment skipping also feeds size estimates (join
    // strategy, AQE) — the config-path advantage over ensure()
    ext.injectOptimizerRule(s => graft.plans.SegmentPruneRule(s))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be an integer literal, got $other")
  }

  private def longArg(e: Expression, name: String, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $name must be a long literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** name -> (info, builder). Arity-checked builders over the custom expressions. */
  val functions: Seq[(String, (ExpressionInfo, Seq[Expression] => Expression))] = Seq(
    "crc16_slot" -> (info("crc16_slot",
      "crc16_slot(key) - Redis-cluster slot (CRC16(hashtag) mod 16384) of a string key"),
      (args: Seq[Expression]) => args match {
        case Seq(k) => Crc16SlotExpr(k)
        case _ => throw new IllegalArgumentException("crc16_slot(key)")
      }),
    "cosine_sim" -> (info("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float/double array columns"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSimExpr(a, b)
        case _ => throw new IllegalArgumentException("cosine_sim(a, b)")
      }),
    "rand_proj_bits" -> (info("rand_proj_bits",
      "rand_proj_bits(vec[, k[, seed]]) - k-bit random-hyperplane LSH sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(v) => RandomProjExpr(v, 16, 42L)
        case Seq(v, k) => RandomProjExpr(v, intArg(k, "k", "rand_proj_bits"), 42L)
        case Seq(v, k, s) => RandomProjExpr(v, intArg(k, "k", "rand_proj_bits"),
          longArg(s, "seed", "rand_proj_bits"))
        case _ => throw new IllegalArgumentException("rand_proj_bits(vec[, k[, seed]])")
      }),
    "minhash_sig" -> (info("minhash_sig",
      "minhash_sig(tokens[, k[, seed]]) - k-long MinHash signature of a token array"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MinHashSigExpr(t, 64, 42L)
        case Seq(t, k) => MinHashSigExpr(t, intArg(k, "k", "minhash_sig"), 42L)
        case Seq(t, k, s) => MinHashSigExpr(t, intArg(k, "k", "minhash_sig"),
          longArg(s, "seed", "minhash_sig"))
        case _ => throw new IllegalArgumentException("minhash_sig(tokens[, k[, seed]])")
      }),
    "minhash_doc" -> (info("minhash_doc",
      "minhash_doc(text[, n[, k[, seed]]]) - scan-stage MinHash signature over word n-grams"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MinHashDocExpr(t, 5, 64, 42L)
        case Seq(t, n) => MinHashDocExpr(t, intArg(n, "n", "minhash_doc"), 64, 42L)
        case Seq(t, n, k) => MinHashDocExpr(t, intArg(n, "n", "minhash_doc"),
          intArg(k, "k", "minhash_doc"), 42L)
        case Seq(t, n, k, s) => MinHashDocExpr(t, intArg(n, "n", "minhash_doc"),
          intArg(k, "k", "minhash_doc"), longArg(s, "seed", "minhash_doc"))
        case _ => throw new IllegalArgumentException("minhash_doc(text[, n[, k[, seed]]])")
      }),
    "shingle_hashes" -> (info("shingle_hashes",
      "shingle_hashes(text[, n]) - distinct hashed word n-gram shingles, one pass"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => ShingleHashesExpr(t, 5)
        case Seq(t, n) => ShingleHashesExpr(t, intArg(n, "n", "shingle_hashes"))
        case _ => throw new IllegalArgumentException("shingle_hashes(text[, n])")
      }),
    "shingle_strings" -> (info("shingle_strings",
      "shingle_strings(text, n) - all word n-gram shingle strings (non-distinct), one pass"),
      (args: Seq[Expression]) => args match {
        case Seq(t, n) => ShingleStringsExpr(t, intArg(n, "n", "shingle_strings"))
        case _ => throw new IllegalArgumentException("shingle_strings(text, n)")
      }),
    "simhash_doc" -> (info("simhash_doc",
      "simhash_doc(text[, n]) - 64-bit simhash over word n-gram shingle features"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashDocExpr(t, 5)
        case Seq(t, n) => SimHashDocExpr(t, intArg(n, "n", "simhash_doc"))
        case _ => throw new IllegalArgumentException("simhash_doc(text[, n])")
      }),
    "simhash64" -> (info("simhash64",
      "simhash64(tokens) - 64-bit simhash of a token array"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashExpr(t)
        case _ => throw new IllegalArgumentException("simhash64(tokens)")
      }),
    "rolling_hash" -> (info("rolling_hash",
      "rolling_hash(tokens) - order-sensitive polynomial fingerprint of a token array"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => RollingHashExpr(t)
        case _ => throw new IllegalArgumentException("rolling_hash(tokens)")
      }),
    "md5lo64" -> (info("md5lo64",
      "md5lo64(str) - first 8 bytes of MD5 as signed big-endian long (cross-engine base hash)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => Md5Lo64Expr(s)
        case _ => throw new IllegalArgumentException("md5lo64(str)")
      }),
    "simhash_md5" -> (info("simhash_md5",
      "simhash_md5(features) - 64-bit simhash over md5lo64 hashes of a string array"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashMd5Expr(t)
        case _ => throw new IllegalArgumentException("simhash_md5(features)")
      }),
    "poly_fingerprint" -> (info("poly_fingerprint",
      "poly_fingerprint(tokens) - order-sensitive md5-based polynomial fingerprint mod 2^31-1"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => PolyFingerprintMd5Expr(t)
        case _ => throw new IllegalArgumentException("poly_fingerprint(tokens)")
      }),
    "simhash_md5_doc" -> (info("simhash_md5_doc",
      "simhash_md5_doc(text[, n]) - fused single-pass md5 simhash over word n-gram shingles"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => SimHashMd5DocExpr(t, 5)
        case Seq(t, n) => SimHashMd5DocExpr(t, intArg(n, "n", "simhash_md5_doc"))
        case _ => throw new IllegalArgumentException("simhash_md5_doc(text[, n])")
      }),
    "md5_proj_bits" -> (info("md5_proj_bits",
      "md5_proj_bits(vec, k, table) - k-bit md5-plane LSH sketch (cross-engine-reproducible)"),
      (args: Seq[Expression]) => args match {
        case Seq(v, k, t) => Md5ProjExpr(v, intArg(k, "k", "md5_proj_bits"),
          intArg(t, "table", "md5_proj_bits"))
        case _ => throw new IllegalArgumentException("md5_proj_bits(vec, k, table)")
      }),
    "byte_embed" -> (info("byte_embed",
      "byte_embed(payload, dim) - modular byte-sum pseudo-embedding of a binary payload"),
      (args: Seq[Expression]) => args match {
        case Seq(p, d) => ByteEmbedExpr(p, intArg(d, "dim", "byte_embed"))
        case _ => throw new IllegalArgumentException("byte_embed(payload, dim)")
      }),
    "byte_stride" -> (info("byte_stride",
      "byte_stride(payload, k) - every k-th byte of a binary payload (resize/downsample stub)"),
      (args: Seq[Expression]) => args match {
        case Seq(p, k) => ByteStrideExpr(p, intArg(k, "k", "byte_stride"))
        case _ => throw new IllegalArgumentException("byte_stride(payload, k)")
      }),
    "phash64" -> (info("phash64",
      "phash64(payload) - 64-bit block-mean perceptual hash of a binary payload"),
      (args: Seq[Expression]) => args match {
        case Seq(p) => PHash64Expr(p)
        case _ => throw new IllegalArgumentException("phash64(payload)")
      }),
    "winnow_md5_doc" -> (info("winnow_md5_doc",
      "winnow_md5_doc(text[, k[, w]]) - MOSS winnowing fingerprints (md5 k-grams, window w)"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => WinnowMd5DocExpr(t, 4, 5)
        case Seq(t, k) => WinnowMd5DocExpr(t, intArg(k, "k", "winnow_md5_doc"), 5)
        case Seq(t, k, w) => WinnowMd5DocExpr(t, intArg(k, "k", "winnow_md5_doc"),
          intArg(w, "w", "winnow_md5_doc"))
        case _ => throw new IllegalArgumentException("winnow_md5_doc(text[, k[, w]])")
      }),
    "shingle_hash_seq" -> (info("shingle_hash_seq",
      "shingle_hash_seq(text, n) - positional (non-distinct) hashed word n-gram sequence"),
      (args: Seq[Expression]) => args match {
        case Seq(t, n) => ShingleHashSeqExpr(t, intArg(n, "n", "shingle_hash_seq"))
        case _ => throw new IllegalArgumentException("shingle_hash_seq(text, n)")
      }),
    "minhash_sig_long" -> (info("minhash_sig_long",
      "minhash_sig_long(hashes[, k[, seed]]) - k-long MinHash signature over a long-hash array"),
      (args: Seq[Expression]) => args match {
        case Seq(h) => MinHashSigLongExpr(h, 64, 42L)
        case Seq(h, k) => MinHashSigLongExpr(h, intArg(k, "k", "minhash_sig_long"), 42L)
        case Seq(h, k, s) => MinHashSigLongExpr(h, intArg(k, "k", "minhash_sig_long"),
          longArg(s, "seed", "minhash_sig_long"))
        case _ => throw new IllegalArgumentException("minhash_sig_long(hashes[, k[, seed]])")
      }),
    "bucket_pairs" -> (info("bucket_pairs",
      "bucket_pairs(xs[, maxBucket]) - stream refine-not-drop candidate pairs from a " +
        "collected array<struct<id: long, rk: long>> bucket (generator)"),
      (args: Seq[Expression]) => args match {
        case Seq(x) => BucketPairsExpr(x, 10000)
        case Seq(x, m) => BucketPairsExpr(x, intArg(m, "maxBucket", "bucket_pairs"))
        case _ => throw new IllegalArgumentException("bucket_pairs(xs[, maxBucket])")
      }),
    // composed from built-ins (pure bit arithmetic), exposed by name so
    // SQL users can z-order a layout without the Scala API; built as a
    // catalyst tree directly — Column composition can't cross the
    // injectFunction boundary (it stays an unresolved ColumnNode)
    "z_value" -> (info("z_value",
      "z_value(x, y) - Morton interleave of two integer columns' low 16 bits (z-order key)"),
      (args: Seq[Expression]) => args match {
        case Seq(x, y) => zValueExpr(x, y)
        case _ => throw new IllegalArgumentException("z_value(x, y)")
      }),
  )

  /** Catalyst tree of FileIO.zvalue's bit arithmetic (same constants). */
  private def zValueExpr(x0: Expression, y0: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, ShiftLeft, Literal => L}
    import org.apache.spark.sql.types.LongType
    def spread(c0: Expression): Expression = {
      var x: Expression = BitwiseAnd(Cast(c0, LongType), L(0xffffL))
      x = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, L(8))), L(0x00FF00FFL))
      x = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, L(4))), L(0x0F0F0F0FL))
      x = BitwiseAnd(BitwiseOr(x, ShiftLeft(x, L(2))), L(0x33333333L))
      BitwiseAnd(BitwiseOr(x, ShiftLeft(x, L(1))), L(0x55555555L))
    }
    BitwiseOr(spread(x0), ShiftLeft(spread(y0), L(1)))
  }

  /** Register on an already-built session (alternative to spark.sql.extensions). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, (_, builder)) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    graft.plans.SegmentPrune.ensure(spark)
  }
}
