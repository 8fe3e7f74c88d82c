package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/**
 * Algebraic laws of the curation operators, checked with ScalaCheck
 * over random corpora through the REAL Spark operators: coverage /
 * conservation / bound properties that must hold at any scale.
 */
class CurationLawsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, s"$name: $res")
  }

  private val vocab = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val docGen: Gen[String] =
    Gen.chooseNum(1, 90).flatMap(n => Gen.listOfN(n, vocab)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] = Gen.chooseNum(1, 12)
    .flatMap(n => Gen.listOfN(n, docGen))

  test("chunk law: stripping the overlap from chunks reconstructs the token stream") {
    check("chunkReconstruct", Prop.forAll(docGen) { text =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = Curation.chunk(df, size = 16, overlap = 4)
        .orderBy("chunk_id").collect()
        .map(_.getAs[String]("chunk_text").split(" ").toList)
      val rebuilt = chunks.head ++ chunks.tail.flatMap(_.drop(4))
      rebuilt == text.split(" ").toList
    })
  }

  test("shard-manifest law: counts conserve, checksum is order-invariant and drop-sensitive") {
    check("shardManifest", Prop.forAll(corpusGen) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = rows.toDF("doc_id", "text")
      val m = Curation.shardManifest(df, nShards = 4).collect()
        .map(r => r.getAs[Long]("shard") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("id_checksum"))).toMap
      // partition layout can't change the manifest
      val m2 = Curation.shardManifest(df.repartition(7), nShards = 4).collect()
        .map(r => r.getAs[Long]("shard") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("id_checksum"))).toMap
      // dropping the first doc flips exactly its shard's checksum
      val dropped = Curation.shardManifest(df.filter(col("doc_id") =!= 0L), nShards = 4)
        .collect().map(r => r.getAs[Long]("shard") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("id_checksum"))).toMap
      val conserved = m.values.map(_._1).sum == texts.length.toLong
      val changedShards = m.keySet.union(dropped.keySet)
        .count(s => m.get(s).map(_._2) != dropped.get(s).map(_._2))
      conserved && m == m2 && changedShards == 1
    })
  }

  test("pack law: token and doc counts are conserved; every sequence is within budget+maxdoc") {
    check("packConserves", Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, s"s${i % 2}") }
        .toDF("doc_id", "text", "source")
      val seqs = Curation.packSequences(df, budget = 64).collect()
      val totalTokens = texts.map(_.split(" ").length.toLong).sum
      val nDocs = seqs.map(_.getAs[Long]("n_docs")).sum
      val nToks = seqs.map(_.getAs[Long]("n_tokens")).sum
      // a doc starting inside a sequence may overflow it by at most
      // its own length - 1; with ≤90-token docs the bound is 64+89
      nDocs == texts.length.toLong && nToks == totalTokens &&
        seqs.forall(_.getAs[Long]("n_tokens") <= 64L + 89L)
    })
  }

  test("sample law: kept rows are a subset; rate 1.0 keeps everything; deterministic") {
    check("sampleSubset", Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") }
        .toDF("doc_id", "text", "lang")
      val all = Curation.stratifiedSample(df, Map.empty, defaultRate = 1.0).count()
      val half = Curation.stratifiedSample(df, Map.empty, defaultRate = 0.5)
        .select("doc_id").as[Long].collect().toSet
      val again = Curation.stratifiedSample(df, Map.empty, defaultRate = 0.5)
        .select("doc_id").as[Long].collect().toSet
      all == texts.length.toLong && half == again &&
        half.subsetOf((0 until texts.length).map(_.toLong).toSet)
    })
  }

  test("decontaminate law: flagged ∪ clean partitions the training set") {
    check("deconPartition", Prop.forAll(corpusGen, corpusGen) { (train, eval) =>
      val trainDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val evalDf = eval.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val flagged = Curation.contaminationReport(trainDf, evalDf)
        .select("doc_id").as[Long].collect().toSet
      val clean = Curation.decontaminate(trainDf, evalDf)
        .select("doc_id").as[Long].collect().toSet
      val ids = (0 until train.length).map(_.toLong).toSet
      (flagged & clean).isEmpty && (flagged | clean) == ids
    })
  }

  test("quantize law: max |q| is exactly 127 and dequantization error ≤ scale/2") {
    check("quantBounds", Prop.forAll(Gen.listOfN(16,
        Gen.chooseNum(-100, 100).map(_ / 25.0f)).suchThat(_.exists(_ != 0f))) { vs =>
      val df = Seq((1L, vs.toArray)).toDF("vec_id", "embedding")
      val r = Curation.quantizeEmbeddings(df).head()
      val scale = vs.map(v => math.abs(v.toDouble)).max / 127.0
      // recompute q the way the operator defines it and check bounds
      val q = vs.map(v => math.floor(v / scale + 0.5))
      q.map(math.abs).max == 127.0 &&
        vs.zip(q).forall { case (v, qi) => math.abs(qi * scale - v) <= scale / 2 + 1e-12 } &&
        r.getAs[Long]("sum_abs_q") == q.map(x => math.abs(x).toLong).sum
    })
  }

  test("bpe law: segmentation conserves tokens; a reference greedy fold agrees") {
    import graft.operators.TextAnalysis
    // reference implementation: rank-ordered, left-to-right,
    // non-overlapping merges over a unit list
    def refSegment(text: String, merges: Seq[(String, String)]): List[List[String]] = {
      var units = text.split(" ", -1).toList.map(List(_))
      merges.foreach { case (x, y) =>
        val out = scala.collection.mutable.ListBuffer.empty[List[String]]
        var rest = units
        while (rest.nonEmpty) rest match {
          case u1 :: u2 :: tail if u1 == List(x) && u2 == List(y) =>
            out += (u1 ++ u2); rest = tail
          case u :: tail => out += u; rest = tail
          case Nil => ()
        }
        units = out.toList
      }
      units
    }
    val mergeGen = Gen.listOfN(4, Gen.zip(vocab, vocab))
    check("bpeRef", Prop.forAll(docGen, mergeGen) { (text, merges) =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val row = TextAnalysis.bpeApply(df, merges.distinct).head()
      val ref = refSegment(text, merges.distinct)
      val refSeg = ref.map(_.mkString(" ")).mkString("|")
      row.getAs[Long]("n_units") == ref.length.toLong &&
        row.getAs[Long]("n_tokens") == ref.map(_.length).sum.toLong &&
        row.getAs[String]("seg") == refSeg
    })
  }

  test("pq law: codes are in range and identical vectors quantize with zero error") {
    import graft.operators.Similarity
    val vecGen = Gen.chooseNum(0, 3)
    check("pqRange", Prop.forAll(Gen.listOfN(30, vecGen)) { classes =>
      val embs = classes.zipWithIndex.map { case (c, i) =>
        (i.toLong, (0 until 64).map(d => math.cos(c * 64 + d)).toArray)
      }.toDF("vec_id", "embedding")
      val out = Similarity.productQuantize(embs, m = 8, k = 4).collect()
      out.forall { r =>
        val codes = (1 to 8).map(r.getLong)
        codes.forall(c => c >= 0 && c < 4) && r.getDouble(9) >= 0.0
      }
    })
  }

  test("index-dedup law: the persistent-index path equals the broadcast path") {
    import graft.operators.Dedup
    val seedGen = Gen.chooseNum(0, 1000)
    check("indexEqBroadcast", Prop.forAll(seedGen) { seed =>
      val mk = (id: Long, s: Long) =>
        (id, (0 until 30).map(j => s"t${(s * 31 + j * 7) % 400}").mkString(" "))
      val corpus = (0L until 60L).map(i => mk(i, i + seed)).toDF("doc_id", "text")
      val batch = ((200L until 205L).map(i => mk(i, i + seed + 500)) :+
        mk(299L, seed + 10L)) // 299 duplicates corpus doc 10's text
        .toDF("doc_id", "text")
      Dedup.writeMinhashIndex(corpus, "graft_law_idx", buckets = 8)
      val viaIdx = Dedup.indexedNearDupPairs(batch, "graft_law_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaBc = Dedup.incrementalNearDupPairs(batch, corpus)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      viaIdx == viaBc && viaIdx.contains((299L, 10L))
    })
  }

  test("index-append law: build(A) + append(B) answers exactly like build(A ∪ B)") {
    import graft.operators.Dedup
    val seedGen = Gen.chooseNum(0, 1000)
    check("appendEqRebuild", Prop.forAll(seedGen) { seed =>
      val mk = (id: Long, s: Long) =>
        (id, (0 until 30).map(j => s"t${(s * 31 + j * 7) % 400}").mkString(" "))
      val partA = (0L until 40L).map(i => mk(i, i + seed)).toDF("doc_id", "text")
      val partB = (40L until 60L).map(i => mk(i, i + seed)).toDF("doc_id", "text")
      // probe: one dup of an A doc, one dup of an APPENDED B doc, one fresh
      val batch = Seq(mk(300L, seed + 10L), mk(301L, seed + 50L),
        mk(302L, seed + 5000L)).toDF("doc_id", "text")
      Dedup.writeMinhashIndex(partA, "graft_law_app", buckets = 8)
      Dedup.appendToMinhashIndex(partB, "graft_law_app")
      val maintained = Dedup.indexedNearDupPairs(batch, "graft_law_app")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Dedup.writeMinhashIndex(partA.union(partB), "graft_law_reb", buckets = 8)
      val rebuilt = Dedup.indexedNearDupPairs(batch, "graft_law_reb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      maintained == rebuilt &&
        maintained.contains((300L, 10L)) && maintained.contains((301L, 50L))
    })
  }

  test("index-delete law: tombstones ≡ rebuild-without; purge invisible; re-ingest revives") {
    import graft.operators.Dedup
    val mk = (id: Long, s: Long) =>
      (id, (0 until 30).map(j => s"t${(s * 31 + j * 7) % 400}").mkString(" "))
    val corpus = (0L until 60L).map(i => mk(i, i)).toDF("doc_id", "text")
    // batch: dups of corpus docs 10, 50, 20 — 10 and 50 get deleted
    val batch = Seq(mk(300L, 10L), mk(301L, 50L), mk(302L, 20L)).toDF("doc_id", "text")
    Dedup.writeMinhashIndex(corpus, "graft_law_del", buckets = 8)
    Dedup.deleteFromMinhashIndex(Seq(10L, 50L).toDF("doc_id"), "graft_law_del")
    val afterDelete = Dedup.indexedNearDupPairs(batch, "graft_law_del")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // tombstoned docs vanish; everything else answers as before
    Dedup.writeMinhashIndex(corpus.filter(!col("doc_id").isin(10L, 50L)),
      "graft_law_delr", buckets = 8)
    val rebuilt = Dedup.indexedNearDupPairs(batch, "graft_law_delr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterDelete === rebuilt)
    assert(afterDelete.contains((302L, 20L)))
    assert(!afterDelete.exists(p => p._2 == 10L || p._2 == 50L))
    // physical purge changes nothing observable and clears the markers
    Dedup.purgeMinhashIndex(spark, "graft_law_del")
    assert(!spark.catalog.tableExists("graft_law_del_tombstones"))
    val afterPurge = Dedup.indexedNearDupPairs(batch, "graft_law_del")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterPurge === afterDelete)
    Dedup.purgeMinhashIndex(spark, "graft_law_del") // idempotent no-op
    // a takedown is not forever: re-appending the content revives it
    Dedup.appendToMinhashIndex(Seq(mk(400L, 10L)).toDF("doc_id", "text"),
      "graft_law_del")
    val revived = Dedup.indexedNearDupPairs(batch, "graft_law_del")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(revived.contains((300L, 400L)))
  }

  test("tombstone revocation: re-appending a deleted id revives it BEFORE any purge") {
    import graft.operators.Dedup
    val mk = (id: Long, s: Long) =>
      (id, (0 until 30).map(j => s"t${(s * 31 + j * 7) % 400}").mkString(" "))
    val corpus = (0L until 60L).map(i => mk(i, i)).toDF("doc_id", "text")
    val probe = Seq(mk(300L, 10L)).toDF("doc_id", "text") // dup of corpus doc 10
    Dedup.writeMinhashIndex(corpus, "graft_law_rev", buckets = 8)
    Dedup.deleteFromMinhashIndex(Seq(10L).toDF("doc_id"), "graft_law_rev")
    assert(!Dedup.indexedNearDupPairs(probe, "graft_law_rev")
      .collect().exists(_.getLong(1) == 10L), "tombstone not applied")
    // the takedown ends: doc 10 is re-ingested with the SAME content
    Dedup.appendToMinhashIndex(corpus.filter(col("doc_id") === 10L), "graft_law_rev")
    val revived = Dedup.indexedNearDupPairs(probe, "graft_law_rev")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(revived.contains((300L, 10L)),
      s"re-appended id still hidden by its stale tombstone: $revived")
    // and the next purge must NOT destroy the re-ingested rows
    Dedup.purgeMinhashIndex(spark, "graft_law_rev")
    val afterPurge = Dedup.indexedNearDupPairs(probe, "graft_law_rev")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterPurge.contains((300L, 10L)))
  }

  test("ann revocation: re-ingest after delete revives without duplicating code rows") {
    import graft.operators.Similarity
    val vecs = (0L until 100L).map(i =>
      (i, (0 until 64).map(j => ((i * 64 + j) % 2000) / 1000.0 - 1.0)))
      .toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(vecs, "graft_law_annrev")
    val queries = vecs.filter(col("vec_id") < 3)
    val before = Similarity.annIndexTopK(queries, "graft_law_annrev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val victim = before.find(t => t._1 == 0L && t._2 == 1L).get._3
    Similarity.deleteFromAnnIndex(Seq(victim).toDF("vec_id"), "graft_law_annrev")
    assert(!Similarity.annIndexTopK(queries, "graft_law_annrev")
      .collect().exists(_.getLong(2) == victim))
    // re-ingest the victim through the idempotent streaming append path
    Similarity.appendNovelToAnnIndex(vecs.filter(col("vec_id") === victim),
      "graft_law_annrev")
    val after = Similarity.annIndexTopK(queries, "graft_law_annrev")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === before, "revoked delete should restore the original answers")
    // exactly one code row for the victim — no duplicate from the revival
    assert(spark.table("graft_law_annrev_codes")
      .filter(col("id") === victim).count() === 1L)
    assert(!spark.catalog.tableExists("graft_law_annrev_tombstones") ||
      spark.table("graft_law_annrev_tombstones").count() === 0L)
  }

  test("ann-delete law: tombstones ≡ candidate filter; purge invisible; never resurrected") {
    import graft.operators.Similarity
    val vecs = (0L until 100L).map(i =>
      (i, (0 until 64).map(j => ((i * 64 + j) % 2000) / 1000.0 - 1.0)))
      .toDF("vec_id", "embedding")
    Similarity.writeAnnIndex(vecs, "graft_law_annd")
    val queries = vecs.filter(col("vec_id") < 3)
    val before = Similarity.annIndexTopK(queries, "graft_law_annd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // delete query 0's top neighbor
    val victim = before.find(t => t._1 == 0L && t._2 == 1L).get._3
    Similarity.deleteFromAnnIndex(Seq(victim).toDF("vec_id"), "graft_law_annd")
    val afterDelete = Similarity.annIndexTopK(queries, "graft_law_annd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(!afterDelete.exists(_._3 == victim))
    // tombstone path ≡ explicit candidate exclusion on a clean index
    Similarity.writeAnnIndex(vecs, "graft_law_annd_clean")
    val viaFilter = Similarity.annIndexTopK(queries, "graft_law_annd_clean",
        candidateFilter = Some(col("id") =!= victim))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(afterDelete === viaFilter)
    Similarity.purgeAnnIndex(spark, "graft_law_annd")
    assert(!spark.catalog.tableExists("graft_law_annd_tombstones"))
    val afterPurge = Similarity.annIndexTopK(queries, "graft_law_annd")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(afterPurge === afterDelete)
  }

  test("unit-index law: incremental paragraph rewrite ≡ global rewrite; replay + append hold") {
    import graft.operators.Dedup
    val mkDoc = (id: Long, s: Long) =>
      (id, (0 until 9).map(j => s"u${(s * 9 + j) % 200}").mkString(" ")) // 3 units of 3
    val corpus = (0L until 40L).map(i => mkDoc(i, i)).toDF("doc_id", "text")
    // batch 1: one full copy of corpus doc 7, one fresh doc, one doc
    // whose first unit duplicates the fresh doc's (intra-batch dup)
    val b1 = Seq(mkDoc(100L, 7L), mkDoc(101L, 9000L),
      (102L, mkDoc(101L, 9000L)._2.split(" ").take(3).mkString(" ") + " zz zz zz")
    ).toDF("doc_id", "text")
    Dedup.writeUnitIndex(corpus, "graft_law_unit", width = 3)
    val incr = Dedup.paragraphDedupIncremental(b1, "graft_law_unit", width = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val global = Dedup.paragraphDedup(corpus.unionByName(b1), width = 3)
      .filter(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(incr === global)
    assert(incr.exists(r => r._1 == 100L && r._3 == 0L)) // full copy emptied
    // replay: same batch again, BEFORE any append — identical output
    val replay = Dedup.paragraphDedupIncremental(b1, "graft_law_unit", width = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(replay === incr)
    // append b1's kept units; replaying b1 AFTER the append still
    // reproduces itself (self-owned index hits are kept), and a later
    // batch duplicating b1's fresh doc comes back empty
    Dedup.appendToUnitIndex(b1, "graft_law_unit", width = 3)
    val replayAfter = Dedup.paragraphDedupIncremental(b1, "graft_law_unit", width = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(replayAfter === incr)
    val b2 = Seq(mkDoc(200L, 9000L)).toDF("doc_id", "text")
    val out2 = Dedup.paragraphDedupIncremental(b2, "graft_law_unit", width = 3)
      .collect().head
    assert(out2.getLong(2) === 0L && out2.getString(3) === "")
    // and appending is idempotent: replaying the append changes nothing
    Dedup.appendToUnitIndex(b1, "graft_law_unit", width = 3)
    val out2b = Dedup.paragraphDedupIncremental(b2, "graft_law_unit", width = 3)
      .collect().head
    assert(out2b.getLong(2) === 0L)
  }

  test("span-index law: incremental span rewrite ≡ global rewrite; replay + append hold") {
    import graft.operators.Dedup
    // 12-token docs; span=6 so any shared half-doc run dedups
    val mkDoc = (id: Long, s: Long) =>
      (id, (0 until 12).map(j => s"w${(s * 12 + j) % 300}").mkString(" "))
    val corpus = (0L until 30L).map(i => mkDoc(i, i)).toDF("doc_id", "text")
    // batch: a full copy of corpus doc 5, a fresh doc, and a doc whose
    // first 6 tokens duplicate the fresh doc's (intra-batch dup)
    val fresh = mkDoc(101L, 7000L)
    val b1 = Seq(mkDoc(100L, 5L), fresh,
      (102L, fresh._2.split(" ").take(6).mkString(" ") + " q1 q2 q3 q4 q5 q6")
    ).toDF("doc_id", "text")
    Dedup.writeSpanIndex(corpus, "graft_law_span", span = 6)
    def run(b: org.apache.spark.sql.DataFrame) =
      Dedup.spanRewriteIncremental(b, "graft_law_span", span = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val incr = run(b1)
    val global = Dedup.spanRewrite(corpus.unionByName(b1), span = 6)
      .filter(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(incr === global)
    assert(incr.exists(r => r._1 == 100L && r._3 == 0L)) // full copy emptied
    assert(incr.exists(r => r._1 == 102L && r._3 == 6L)) // shared half dropped
    // replay BEFORE append: identical
    assert(run(b1) === incr)
    // append, then replay AFTER append still reproduces itself
    // (self-owned index hits are kept), and a later batch duplicating
    // b1's fresh doc comes back empty
    Dedup.appendToSpanIndex(b1, "graft_law_span", span = 6)
    assert(run(b1) === incr)
    val b2 = Seq((200L, fresh._2)).toDF("doc_id", "text")
    val out2 = run(b2).head
    assert(out2._3 === 0L)
    // append idempotence
    Dedup.appendToSpanIndex(b1, "graft_law_span", span = 6)
    assert(run(b2).head._3 === 0L)
  }

  test("gated-collect law: over-threshold backfill stays distributed and equals the global rewrite") {
    import graft.operators.Dedup
    // A backfill batch whose hash sets CROSS the boundedCollect gates
    // (>4096 unit/span hashes, >1024 band hashes, >4096 candidate
    // ids) must take the distributed path (plain scan / left-semi
    // join) and still equal the global-rewrite law — the same law the
    // under-threshold batches above pin on the pruned path.
    val mkDoc = (id: Long, s: Long) =>
      (id, (0 until 9).map(j => s"u${(s * 9 + j) % 200}").mkString(" "))
    val corpus = (0L until 40L).map(i => mkDoc(i, i)).toDF("doc_id", "text")
    // 1400 filler docs with corpus-disjoint units → 4200+ distinct
    // unit hashes; plus a full copy of corpus doc 7
    val filler = spark.range(1000L, 2400L).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(8)), i => concat(lit("f"), col("doc_id") * 9 + i))))
    val batch = filler.unionByName(Seq(mkDoc(100L, 7L)).toDF("doc_id", "text"))
      .localCheckpoint()
    Dedup.writeUnitIndex(corpus, "graft_law_unit_big", width = 3)
    val incr = Dedup.paragraphDedupIncremental(batch, "graft_law_unit_big", width = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    val global = Dedup.paragraphDedup(corpus.unionByName(batch), width = 3)
      .filter(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(incr === global)
    assert(incr.exists(r => r._1 == 100L && r._2 == 0L)) // corpus copy emptied

    // span path: 12-token docs, span=6 → 7 windows/doc; 700 fillers
    // cross the 4096 gate
    val mkSpanDoc = (id: Long, s: Long) =>
      (id, (0 until 12).map(j => s"w${(s * 12 + j) % 300}").mkString(" "))
    val spanCorpus = (0L until 30L).map(i => mkSpanDoc(i, i)).toDF("doc_id", "text")
    val spanFiller = spark.range(1000L, 1700L).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(11)), i => concat(lit("g"), col("doc_id") * 12 + i))))
    val spanBatch = spanFiller
      .unionByName(Seq(mkSpanDoc(100L, 5L)).toDF("doc_id", "text"))
      .localCheckpoint()
    Dedup.writeSpanIndex(spanCorpus, "graft_law_span_big", span = 6)
    val sIncr = Dedup.spanRewriteIncremental(spanBatch, "graft_law_span_big", span = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    val sGlobal = Dedup.spanRewrite(spanCorpus.unionByName(spanBatch), span = 6)
      .filter(col("doc_id") >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(sIncr === sGlobal)
    assert(sIncr.exists(r => r._1 == 100L && r._2 == 0L))
  }

  test("gated-collect law: minhash index probe over both thresholds takes the semi-join path correctly") {
    import graft.operators.Dedup
    // corpus: 4300 identical docs → ANY matching probe proposes 4300
    // candidate ids (> the 4096 inSet gate); batch: 1050 distinct-text
    // docs → >1024 distinct band hashes (> the bucket-pruning gate).
    // Both collects must return None and the distributed path must
    // still find every true pair.
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val corpus = spark.range(4300L).toDF("doc_id").withColumn("text", lit(shared))
    Dedup.writeMinhashIndex(corpus, "graft_law_mh_big")
    val probe = spark.range(10000L, 11050L).toDF("doc_id")
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(0), lit(11)), i => concat(lit("z"), col("doc_id") * 12 + i))))
      .unionByName(Seq((99999L, shared)).toDF("doc_id", "text"))
    val pairs = Dedup.indexedNearDupPairs(probe, "graft_law_mh_big")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.length === 4300)
    assert(pairs.forall(p => p._1 == 99999L && p._3 == 1.0))
    assert(pairs.map(_._2).toSet === (0L until 4300L).toSet)
  }

  test("rewrite-index takedown law: deleted owners revive content; purge invisible; re-append revokes") {
    import graft.operators.Dedup
    val mkDoc = (id: Long, s: Long) =>
      (id, (0 until 12).map(j => s"v${s * 12 + j} ".trim).mkString(" "))
    val corpus = (0L until 20L).map(i => mkDoc(i, i)).toDF("doc_id", "text")
    Dedup.writeSpanIndex(corpus, "graft_law_span_del", span = 6)
    def rw(b: org.apache.spark.sql.DataFrame) =
      Dedup.spanRewriteIncremental(b, "graft_law_span_del", span = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val copyOf5 = Seq(mkDoc(100L, 5L)).toDF("doc_id", "text")
    assert(rw(copyOf5)(100L) === 0L, "baseline: corpus copy should empty")
    // takedown doc 5: its windows lose their owner, the copy revives
    Dedup.deleteFromSpanIndex(Seq(Tuple1(5L)).toDF("doc_id"), "graft_law_span_del")
    assert(rw(copyOf5)(100L) === 12L, "deleted owner must revive the content")
    // the revived batch appends and becomes the NEW owner
    Dedup.appendToSpanIndex(copyOf5, "graft_law_span_del", span = 6)
    val copyOf5Again = Seq(mkDoc(200L, 5L)).toDF("doc_id", "text")
    assert(rw(copyOf5Again)(200L) === 0L, "new owner must dedup later copies")
    // purge is invisible to queries and idempotent
    Dedup.purgeSpanIndex(spark, "graft_law_span_del")
    assert(rw(copyOf5Again)(200L) === 0L)
    Dedup.purgeSpanIndex(spark, "graft_law_span_del")
    assert(rw(copyOf5Again)(200L) === 0L)
    // re-append of a tombstoned id revokes the takedown (unit index
    // shares the same contract via the same helpers)
    Dedup.writeUnitIndex(corpus, "graft_law_unit_del", width = 3)
    Dedup.deleteFromUnitIndex(Seq(Tuple1(7L)).toDF("doc_id"), "graft_law_unit_del")
    val copyOf7 = Seq(mkDoc(300L, 7L)).toDF("doc_id", "text")
    val revived = Dedup.paragraphDedupIncremental(copyOf7, "graft_law_unit_del", width = 3)
      .collect().head
    assert(revived.getLong(2) === 4L, s"unit takedown must revive: $revived")
    Dedup.appendToUnitIndex(corpus.filter(col("doc_id") === 7L), "graft_law_unit_del", width = 3)
    val deduped = Dedup.paragraphDedupIncremental(copyOf7, "graft_law_unit_del", width = 3)
      .collect().head
    assert(deduped.getLong(2) === 0L, s"re-append must revoke the takedown: $deduped")
  }

  test("redact law: redacted text has no residual matches and is idempotent") {
    val pii = Gen.oneOf(
      "write to a.user@host.org now", "ping 192.168.0.7 twice", "dial 555-0199 today")
    check("redactClean", Prop.forAll(Gen.listOfN(3, pii)) { parts =>
      val text = parts.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val red = df.select(Curation.redact(col("text")).as("r")).as[String].head()
      val redTwice = df.select(Curation.redact(Curation.redact(col("text"))).as("r"))
        .as[String].head()
      val residual = Curation.redactionReport(
        Seq((1L, red)).toDF("doc_id", "text")).head()
      red == redTwice &&
        residual.getAs[Long]("n_emails") == 0L &&
        residual.getAs[Long]("n_ips") == 0L &&
        residual.getAs[Long]("n_phones") == 0L
    })
  }

  test("bottom-k law: exact size min(k,|s|), growth-stable, merge = pool-and-recut") {
    check("bottomK", Prop.forAll(Gen.chooseNum(1L, 40L), Gen.chooseNum(1, 6)) { (n, k) =>
      val docs = (1L to n).map(i => (i, if (i % 2 == 0) "a" else "b"))
        .toDF("doc_id", "source")
      def sample(df: org.apache.spark.sql.DataFrame) =
        Curation.bottomKSample(df, k)
          .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
      val s = sample(docs)
      val sizes = s.groupBy(_._1).map { case (src, xs) => src -> xs.size }
      val counts = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // exact per-source size; sample of a grown corpus keeps membership
      // decisions consistent: the halves' samples pooled and re-cut give
      // the whole corpus's sample (bottom-k mergeability)
      val half1 = docs.filter(col("doc_id") <= n / 2)
      val half2 = docs.filter(col("doc_id") > n / 2)
      val pooled = (sample(half1).toSeq ++ sample(half2).toSeq)
      val recut = Curation.bottomKSample(
          pooled.toDF("source", "doc_id").select(col("doc_id"), col("source")), k)
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
      sizes.forall { case (src, sz) => sz == math.min(k.toLong, counts(src)) } &&
        recut == s
    })
  }

  test("incremental-stats law: merged view equals direct aggregation of next") {
    check("incrStats", Prop.forAll(corpusGen, corpusGen) { (as, bs) =>
      val prev = as.zipWithIndex
        .map { case (txt, i) => (i.toLong, if (i % 2 == 0) "x" else "y", txt) }
        .toDF("doc_id", "source", "text")
      // next: drop every 5th, rewrite every 3rd, append bs as new docs
      val next = as.zipWithIndex.collect {
        case (txt, i) if i % 5 != 0 =>
          (i.toLong, if (i % 2 == 0) "x" else "y",
            if (i % 3 == 0) txt + " changed" else txt)
      }.++(bs.zipWithIndex.map { case (txt, i) =>
        (1000L + i, if (i % 2 == 0) "x" else "y", txt)
      }).toDF("doc_id", "source", "text")
      def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(lower(col("text")), " "))).cast("long").as("n_tokens"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val incr = rows(Curation.incrementalStats(prev, next))
      // the deployment path: the base view is stored, not recomputed
      val stored = rows(Curation.incrementalStats(prev, next,
        baseView = Some(agg(prev))))
      val direct = rows(agg(next))
      incr == direct && stored == direct
    })
  }

  test("apply-delta law: a diff-derived delta applied to prev reproduces next exactly") {
    check("applyDelta", Prop.forAll(corpusGen, corpusGen) { (as, bs) =>
      val prev = as.zipWithIndex
        .map { case (txt, i) => (i.toLong, if (i % 2 == 0) "x" else "y", txt) }
        .toDF("doc_id", "source", "text")
      // next: drop every 5th, rewrite every 3rd, append bs as new docs
      val nextRows = as.zipWithIndex.collect {
        case (txt, i) if i % 5 != 0 =>
          (i.toLong, if (i % 2 == 0) "x" else "y",
            if (i % 3 == 0) txt + " changed" else txt)
      } ++ bs.zipWithIndex.map { case (txt, i) =>
        (1000L + i, if (i % 2 == 0) "x" else "y", txt)
      }
      val next = nextRows.toDF("doc_id", "source", "text")
      // the CDC shape: diff classifies, the delta carries D rows for
      // removed ids and the NEXT payload for added/changed ids
      val diff = Curation.snapshotDiff(prev, next, "doc_id", Seq("text"))
      val dels = prev.join(diff.filter(col("status") === "removed")
          .select("doc_id"), "doc_id")
        .select(col("doc_id"), col("source"), col("text"), lit("D").as("op"))
      val ups = next.join(diff.filter(col("status").isin("added", "changed"))
          .select("doc_id"), "doc_id")
        .select(col("doc_id"), col("source"), col("text"), lit("U").as("op"))
      val merged = Curation.applyDelta(prev, dels.unionByName(ups))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      merged == nextRows.toSet
    })
  }

  test("epoch-shuffle law: total assignment, contiguous in-shard positions, epochs reorder") {
    check("epochShuffle", Prop.forAll(Gen.chooseNum(2, 40)) { n =>
      val docs = (0 until n).map(i => (i.toLong, s"d$i"))
        .toDF("doc_id", "text")
      val rows = Curation.epochShuffle(docs, epochs = 2, shards = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // total: every (epoch, doc) assigned exactly once
      val total = rows.length == 2 * n &&
        rows.map(r => (r._1, r._4)).toSet.size == 2 * n
      // contiguity: within each (epoch, shard) positions are 1..k
      val contiguous = rows.groupBy(r => (r._1, r._2)).values.forall { g =>
        g.map(_._3).sorted.toSeq == (1L to g.length).toSeq
      }
      // reproducible: a second run is bit-identical
      val again = Curation.epochShuffle(docs, epochs = 2, shards = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      total && contiguous && again.toSet == rows.toSet
    })
  }

  test("upsample law: per-doc copy counts match the reference formula; copies indexed 0..n-1") {
    check("upsampleMix", Prop.forAll(Gen.chooseNum(4, 40), Gen.chooseNum(100L, 4000L)) { (n, budget) =>
      val docs = (0 until n).map { i =>
        (i.toLong, (0 to i % 7).map(j => s"w$j").mkString(" "), s"s${i % 3}")
      }.toDF("doc_id", "text", "source")
      val out = Curation.upsampleMix(docs, budgetTokens = budget)
        .collect().map(r => (r.getLong(1), r.getLong(3))) // (id, copy)
      // reference: per-source totals -> rate -> floor + md5-gate remainder
      val ntok = (0 until n).map(i => i.toLong -> (i % 7 + 1).toLong).toMap
      val srcOf = (0 until n).map(i => i.toLong -> s"s${i % 3}").toMap
      val totals = ntok.groupBy { case (id, _) => srcOf(id) }
        .view.mapValues(_.values.sum).toMap
      def round6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val per = budget.toDouble / totals.size
      def md5lo14(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        val hi = (0 until 8).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
        hi & 16383L
      }
      val expected = (0 until n).flatMap { i =>
        val r = round6(per / totals(s"s${i % 3}"))
        val base = math.floor(r).toLong
        val thr = math.floor(round6(r - math.floor(r)) * 16384).toLong
        val nc = base + (if (md5lo14(s"ups:$i") < thr) 1L else 0L)
        (0L until nc).map(c => (i.toLong, c))
      }.toSet
      out.toSet == expected
    })
  }

  test("stratified-split law: per-stratum allocation exact to ±1, total, reproducible") {
    check("stratifiedSplit", Prop.forAll(Gen.chooseNum(3, 60)) { n =>
      val docs = (0 until n).map(i => (i.toLong, s"doc $i", s"s${i % 3}"))
        .toDF("doc_id", "text", "source")
      val split = Curation.stratifiedSplit(docs, col("source"),
        md5(concat(lit("law:"), col("doc_id").cast("string"))),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val rows = split.select("doc_id", "source", "split").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // total: every doc assigned exactly one split
      val total = rows.length == n && rows.map(_._1).toSet.size == n
      // exactness: each stratum's train share is ⌊0.8·n_g⌋ exactly,
      // val is ⌊0.9·n_g⌋−⌊0.8·n_g⌋, test takes the remainder
      val exact = rows.groupBy(_._2).forall { case (_, g) =>
        val ng = g.length
        val byS = g.groupBy(_._3).view.mapValues(_.length).toMap
        byS.getOrElse("train", 0) == math.floor(0.8 * ng).toInt &&
        byS.getOrElse("val", 0) ==
          math.floor(0.9 * ng).toInt - math.floor(0.8 * ng).toInt &&
        byS.getOrElse("test", 0) == ng - math.floor(0.9 * ng).toInt
      }
      // reproducible: a second run is identical per doc
      val again = Curation.stratifiedSplit(docs, col("source"),
        md5(concat(lit("law:"), col("doc_id").cast("string"))),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "source", "split").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      total && exact && again.toSet == rows.toSet
    })
  }

  test("partition-invariance law: stratified split and upsample ignore physical layout") {
    check("layoutInvariance", Prop.forAll(Gen.chooseNum(5, 50)) { n =>
      val docs = (0 until n).map { i =>
        (i.toLong, (0 to i % 5).map(j => s"w$j").mkString(" "), s"s${i % 3}")
      }.toDF("doc_id", "text", "source")
      def splitOf(df: org.apache.spark.sql.DataFrame) =
        Curation.stratifiedSplit(df, col("source"),
          md5(concat(lit("pi:"), col("doc_id").cast("string"))),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
          .select("doc_id", "split").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
      def upsOf(df: org.apache.spark.sql.DataFrame) =
        Curation.upsampleMix(df, budgetTokens = 200L)
          .select("id", "copy").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      splitOf(docs) == splitOf(docs.repartition(7)) &&
        upsOf(docs) == upsOf(docs.repartition(5))
    })
  }

  test("skew-safe law: grouped prefix sums equal the per-group window for pack and interleave") {
    check("skewSafe", Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (txt, i) => (i.toLong, if (i % 3 == 0) "x" else "y", txt) }
        .toDF("doc_id", "source", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      val packEq = rows(Curation.packSequences(docs, budget = 40)) ==
        rows(Curation.packSequences(docs, budget = 40, skewSafe = true))
      val ivEq = rows(Curation.interleaveBySource(docs)) ==
        rows(Curation.interleaveBySource(docs, skewSafe = true))
      packEq && ivEq
    })
  }

  test("token-cap law: equals the reference greedy fill per source, partition-invariant") {
    check("domainTokenCap", Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (txt, i) => (i.toLong, if (i % 3 == 0) "x" else "y", txt) }
        .toDF("doc_id", "source", "text")
      def run(df: org.apache.spark.sql.DataFrame) =
        Curation.domainTokenCap(df, budgetTokens = 30L)
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = run(docs)
      // reference: per source, sort by (md5 pri, id), admit while the
      // EXCLUSIVE running token total is under budget
      val rows = docs
        .withColumn("pri", graft.functions.TextFunctions.md5lo64(
          concat(lit("cap:"), col("doc_id").cast("string"))).bitwiseAND(lit(16383L)))
        .withColumn("ntok", size(split(lower(col("text")), " ")).cast("long"))
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("pri"), r.getAs[Long]("ntok")))
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (src, g) =>
        var acc = 0L
        g.sortBy(r => (r._3, r._2)).takeWhile { r =>
          val admit = acc < 30L; acc += r._4; admit
        }.map(r => (src, r._2)).toSeq
      }.toSet
      got == expect && run(docs.repartition(7)) == expect
    })
  }

  test("weighted-sample law: exact size, partition-invariant, weight-monotone") {
    check("weightedSample", Prop.forAll(Gen.chooseNum(5L, 40L), Gen.chooseNum(1, 5)) { (n, k) =>
      val docs = (1L to n).map(i => (i, "s", 1.0 + (i % 7)))
        .toDF("doc_id", "source", "w")
      def ids(df: org.apache.spark.sql.DataFrame, wc: org.apache.spark.sql.Column) =
        Curation.weightedSample(df, k, wc)
          .collect().map(_.getAs[Long]("doc_id")).toSet
      val s = ids(docs, col("w"))
      // selection is a deterministic function of the data, not its layout
      val repart = ids(docs.repartition(7), col("w"))
      // A-ES monotonicity: raising one sampled doc's weight 100x keeps it
      // sampled (its key ln(u)/w only moves toward 0)
      val boosted = s.headOption.forall { kept =>
        ids(docs.withColumn("w",
          when(col("doc_id") === kept, col("w") * 100).otherwise(col("w"))),
          col("w")).contains(kept)
      }
      s.size == math.min(k.toLong, n) && repart == s && boosted
    })
  }
}
