package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Slots

/** SQL surface: every custom expression callable from spark.sql after registration. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("crc16_slot from SQL matches the Scala implementation") {
    val r = spark.sql("SELECT crc16_slot('foo{bar}') AS s, crc16_slot('123456789') AS v").head()
    assert(r.getInt(0) === Slots.slot("bar"))
    assert(r.getInt(1) === (0x31c3 & 16383))
  }

  test("cosine_sim and rand_proj_bits from SQL") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "rand_proj_bits(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), 8, 7) AS b").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) >= 0)
  }

  test("text sketches from SQL: minhash_doc, simhash_doc, shingle_hashes, rolling_hash") {
    val r = spark.sql(
      "SELECT size(minhash_doc('a b c d e f g', 3, 16)) AS mk, " +
        "simhash_doc('a b c d e f g', 3) AS sh, " +
        "size(shingle_hashes('a b c d e f g', 3)) AS nsh, " +
        "rolling_hash(array('a','b')) AS rh").head()
    assert(r.getInt(0) === 16)
    assert(r.getInt(2) === 5)   // 7 tokens -> 5 trigram shingles
    assert(r.getLong(3) !== 0L)
  }

  test("binary/vector stages from SQL: byte_embed, byte_stride, md5_proj_bits, simhash_md5_doc") {
    val r = spark.sql(
      "SELECT byte_embed(encode('abcd', 'UTF-8'), 2) AS e, " +
        "decode(byte_stride(encode('abcdef', 'UTF-8'), 2), 'UTF-8') AS s, " +
        "md5_proj_bits(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 8, 0) AS p, " +
        "simhash_md5_doc('a b c d e f g', 3) AS sh").head()
    // 'abcd' = 97 98 99 100 → even idx 97+99, odd 98+100
    assert(r.getSeq[Long](0) === Seq(196L, 198L))
    assert(r.getString(1) === "ace")
    assert(r.getLong(2) >= 0 && r.getLong(2) < 256)
    assert(r.getLong(3) !== 0L)
  }

  test("z_value from SQL matches the Scala column and interleaves bits") {
    val r = spark.sql("SELECT z_value(3L, 1L) AS a, z_value(65535L, 0L) AS b").head()
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === 0x55555555L)
  }

  test("round-6 registrations from SQL: phash64, winnow_md5_doc, shingle_hash_seq, minhash_sig_long, bucket_pairs") {
    val r = spark.sql(
      "SELECT phash64(encode('abcdefghij', 'UTF-8')) AS ph, " +
        "size(winnow_md5_doc('a b c d e f g h', 3, 2)) AS nw, " +
        "size(shingle_hash_seq('a b a b', 2)) AS ns, " +
        "size(minhash_sig_long(array(1L, 2L, 3L), 8)) AS nm").head()
    assert(r.getLong(0) !== 0L)
    assert(r.getInt(1) > 0)
    assert(r.getInt(2) === 3)   // positional: repeats kept
    assert(r.getInt(3) === 8)
    // the streaming pair generator from pure SQL: one oversized
    // bucket (cap 2), rk groups {1:(10,11)},{2:(12)} -> star 10-11 +
    // rep pair 10-12
    val pairs = spark.sql(
      "SELECT p.* FROM (SELECT array(struct(10L AS id, 1L AS rk), " +
        "struct(11L AS id, 1L AS rk), struct(12L AS id, 2L AS rk)) AS xs) " +
        "LATERAL VIEW bucket_pairs(xs, 2) p AS a_id, b_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs === Set((10L, 11L), (10L, 12L)))
  }

  test("bucket_pairs from ad-hoc SQL skips null elements and null struct fields instead of NPEing") {
    val pairs = spark.sql(
      "SELECT p.* FROM (SELECT array(struct(10L AS id, 1L AS rk), " +
        "CAST(NULL AS struct<id: bigint, rk: bigint>), " +
        "struct(CAST(NULL AS bigint) AS id, 1L AS rk), " +
        "struct(11L AS id, CAST(NULL AS bigint) AS rk), " +
        "struct(12L AS id, 1L AS rk)) AS xs) " +
        "LATERAL VIEW bucket_pairs(xs, 10) p AS a_id, b_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs === Set((10L, 12L)))
    // all-null input degenerates to no pairs, not a task failure
    val empty = spark.sql(
      "SELECT p.* FROM (SELECT array(CAST(NULL AS struct<id: bigint, rk: bigint>), " +
        "CAST(NULL AS struct<id: bigint, rk: bigint>)) AS xs) " +
        "LATERAL VIEW bucket_pairs(xs, 10) p AS a_id, b_id").collect()
    assert(empty.isEmpty)
  }

  test("sketch parameters must be literals") {
    val docsView = spark.range(3).selectExpr("CAST(id AS INT) AS n", "'a b c' AS t")
    docsView.createOrReplaceTempView("ext_docs")
    val ex = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(t, n) FROM ext_docs").collect()
    }
    assert(ex.getMessage.contains("literal"))
  }

  test("Graft.info: engine/function/strategy census plus index tombstone freshness") {
    import graft.operators.Dedup
    val s = Graft.attach(SparkTestSession.spark)
    import s.implicits._
    val rows = Graft.info(s).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val bySec = rows.groupBy(_._1)
    // engine identity/topology
    assert(rows.contains(("engine", "slots", "16384")))
    assert(rows.contains(("engine", "spark_version", s.version)))
    // full function census, all registered after attach
    val fnRows = bySec("function")
    assert(fnRows.length === GraftExtensions.functions.length)
    assert(fnRows.forall(_._3 == "registered"))
    assert(rows.contains(("strategy", "topk_per_key", "injected")))
    // index freshness: a maintained index with one tombstoned doc
    // surfaces as an index row with its tombstone count
    val corpus = (0L until 6L).map(i => (i, s"alpha beta gamma doc$i word"))
      .toDF("doc_id", "text")
    Dedup.writeMinhashIndex(corpus, "graft_info_idx", k = 8, bands = 2)
    Dedup.deleteFromMinhashIndex(Seq(Tuple1(3L)).toDF("doc_id"), "graft_info_idx")
    val rows2 = Graft.info(s).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows2.contains(("index", "graft_info_idx", "tombstones=1")))
    assert(rows2.exists(r => r._1 == "table" && r._2 == "graft_info_idx_bands"))
  }

  test("Graft.info: writer leases surface with owner and heartbeat age") {
    val s = Graft.attach(SparkTestSession.spark)
    import s.implicits._
    graft.sources.Bucketing.writeBucketed(
      Seq((1L, "a")).toDF("id", "v"), "graft_info_lease", "id", 2)
    try {
      val rows = Graft.info(s).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val lease = rows.filter(r => r._1 == "lease" && r._2 == "graft_info_lease")
      assert(lease.length === 1, rows.filter(_._1 == "lease").mkString(","))
      assert(lease.head._3.contains("this driver"), lease.head._3)
      assert(lease.head._3.contains("heartbeat"), lease.head._3)
    } finally graft.sources.Bucketing.dropLogical(s, "graft_info_lease")
  }

  test("Graft.info: a corrupt tombstone table degrades its row, not the facade") {
    val s = Graft.attach(SparkTestSession.spark)
    s.sql("CREATE TABLE graft_sick_tombstones USING parquet AS SELECT 1L AS doc_id")
    try {
      // smash every data file so the count genuinely fails at read
      val loc = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_sick_tombstones")).location
      java.nio.file.Paths.get(loc).toFile.listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val w = new java.io.FileOutputStream(f)
          w.write("this is not a parquet footer".getBytes); w.close()
        }
      intercept[Exception] { s.table("graft_sick_tombstones").count() }
      val rows = Graft.info(s).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      // the sick index reports itself...
      assert(rows.contains(("index", "graft_sick", "error=unreadable")))
      // ...and every other section still answers (INFOCLUSTER contract)
      assert(rows.contains(("engine", "slots", "16384")))
      assert(rows.exists(_._1 == "function"))
    } finally s.sql("DROP TABLE IF EXISTS graft_sick_tombstones")
  }

  test("Graft.attach wires functions and the TopK strategy onto an existing session") {
    val s = Graft.attach(SparkTestSession.spark)
    assert(s.sql("SELECT crc16_slot('x') AS s").head().getInt(0) === graft.core.Slots.slot("x"))
    assert(s.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
    Graft.attach(s) // idempotent
    assert(s.experimental.extraStrategies.count(_ == graft.plans.TopKStrategy) === 1)
  }

  test("extensions class wires the same functions via injectFunction") {
    // builder-path smoke: the class applies cleanly to a fresh extensions object
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)   // must not throw
    assert(GraftExtensions.functions.map(_._1).distinct.size === GraftExtensions.functions.size)
  }
}
