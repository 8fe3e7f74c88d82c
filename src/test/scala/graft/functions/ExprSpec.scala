package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.Slots
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Custom Catalyst expressions: values, nulls, and codegen-path execution. */
class ExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("crc16_slot matches the pure-Scala Slots.slot under codegen") {
    val keys = Seq("a", "key:1", "foo{bar}", "123456789", "")
    val got = keys.toDF("k").select(col("k"), crc16_slot(col("k")).as("s")).collect()
    got.foreach(r => assert(r.getInt(1) === Slots.slot(r.getString(0))))
  }

  test("cosine_sim on float arrays: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
      (Array(3f, 4f), Array(3f, 4f), 1.0)
    ).toDF("a", "b", "want")
    df.select(cosine_sim(col("a"), col("b")).as("got"), col("want")).collect()
      .foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }


  test("proj sketches: float and double inputs of equal values give identical buckets") {
    // the dtype dispatch (getFloat vs getDouble on ArrayData) must not
    // change the sketch — a planted-near-dup corpus mixes both
    val vals = Seq(Array(0.5f, -1.25f, 3.75f, 0.125f), Array(-2f, 2f, -2f, 2f))
    val df = vals.map(v => (v, v.map(_.toDouble))).toDF("vf", "vd")
    df.select(
        rand_proj_bits(col("vf"), 12, 7L).as("rf"),
        rand_proj_bits(col("vd"), 12, 7L).as("rd"),
        md5_proj_bits(col("vf"), 8, 3).as("mf"),
        md5_proj_bits(col("vd"), 8, 3).as("md"))
      .collect().foreach { r =>
        assert(r.getLong(0) === r.getLong(1), "rand_proj float/double diverge")
        assert(r.getLong(2) === r.getLong(3), "md5_proj float/double diverge")
      }
  }

  test("byte_embed: modular byte sums; empty payload gives a zero vector") {
    val df = Seq("abcd", "", "a").toDF("t")
      .select(col("t"), byte_embed(encode(col("t"), "UTF-8"), 2).as("e"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("abcd") === Seq(97L + 99L, 98L + 100L))
    assert(m("") === Seq(0L, 0L))
    assert(m("a") === Seq(97L, 0L))
  }

  test("byte_stride: every k-th byte, short and empty payloads included") {
    val df = Seq("abcdefg", "ab", "").toDF("t")
      .select(col("t"), decode(byte_stride(encode(col("t"), "UTF-8"), 3), "UTF-8").as("s"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("abcdefg") === "adg")
    assert(m("ab") === "a")
    assert(m("") === "")
  }

  test("cosine_sim null propagates") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(cosine_sim(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("minhash signature: deterministic, k-long, permutation-invariant on token order") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("c", "b", "a")),   // same set, different order
      (3L, Seq("x", "y", "z"))
    ).toDF("id", "toks").select(col("id"), minhash_sig(col("toks"), k = 32).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).size === 32)
    assert(rows(1L) === rows(2L))     // set semantics
    assert(rows(1L) !== rows(3L))
  }

  test("simhash of identical token lists is equal; near lists are hamming-close") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("id", "toks").select(col("id"), simhash64(col("toks")).as("h"))
    val h = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    assert(TextOps.hamming64(h(1L), h(3L)) <= 12)
    assert(TextOps.hamming64(h(1L), h(4L)) > 12)
  }

  test("rolling_hash is order-sensitive, unlike minhash") {
    val df = Seq((1L, Seq("a", "b")), (2L, Seq("b", "a"))).toDF("id", "toks")
      .select(col("id"), rolling_hash(col("toks")).as("h"))
    val h = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) !== h(2L))
  }

  test("fused simhash_md5_doc equals simhash_md5 over composed shingle strings") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a b c d e f g"),
      (3L, "exactly five tokens right here"),      // 5 tokens → 1 window
      (4L, "double  space  tokens  here  survive  splitting"),
      (5L, "Mixed CASE Words Should Lower The Same Way Everywhere"))
    val df = texts.toDF("id", "text").select(col("id"),
      graft.functions.TextFunctions.simhash_md5_doc(lower(col("text")), 5).as("fused"),
      graft.functions.TextFunctions.simhash_md5(
        graft.operators.Dedup.shingleStringsAll(col("text"), 5)).as("composed"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id=${r.getLong(0)}")
    }
  }

  test("rand_proj_bits: deterministic and similar vectors share more bits") {
    val v = Array.tabulate(64)(i => math.sin(i).toFloat)
    val nearV = v.clone(); nearV(0) = v(0) + 0.01f
    val farV = Array.tabulate(64)(i => math.cos(i * 3).toFloat)
    val df = Seq((1L, v), (2L, v), (3L, nearV), (4L, farV)).toDF("id", "v")
      .select(col("id"), rand_proj_bits(col("v"), k = 16).as("b"))
    val b = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) === b(2L))
    assert(TextOps.hamming64(b(1L), b(3L)) <= TextOps.hamming64(b(1L), b(4L)))
  }

  test("HIndex aggregator: law-equal to the brute-force h-index over random multisets") {
    def brute(xs: Seq[Long]): Long = {
      val s = xs.sorted(Ordering[Long].reverse)
      s.zipWithIndex.map { case (v, i) => math.min(v, i + 1L) }
        .foldLeft(0L)(math.max)
    }
    val agg = Aggregators.HIndex
    val rnd = new scala.util.Random(42)
    // hand cases first: ties, all-equal, zeros/negatives skipped, empty
    val hand = Seq(
      Seq[Long]() -> 0L,
      Seq(5L, 5L, 5L) -> 3L,
      Seq(1L, 1L, 1L, 1L) -> 1L,
      Seq(10L, 8L, 5L, 4L, 3L) -> 4L,
      Seq(0L, -3L, 2L, 2L) -> 2L)
    for ((xs, want) <- hand) {
      val direct = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(direct === want, s"hand case $xs")
    }
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40)
      val xs = Seq.fill(n)(rnd.nextInt(12).toLong - 1L)   // incl. 0/-1
      val want = brute(xs.filter(_ > 0L))
      // reduce path
      assert(agg.finish(xs.foldLeft(agg.zero)(agg.reduce)) === want)
      // merge path: random split into 3 partials, merged pairwise
      val parts = xs.grouped(math.max(1, n / 3 + 1)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) === want)
    }
    // through Spark's partial/final split, as coreness uses it
    val spark2 = spark
    import spark2.implicits._
    val hAgg = udaf(agg)
    val rows = (1 to 500).map(i => (i % 7, (i % 23).toLong))
    val got = rows.toDF("g", "v").groupBy("g").agg(hAgg(col("v")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> brute(vs.map(_._2).filter(_ > 0L))
    }
    assert(got === want)
  }
}
