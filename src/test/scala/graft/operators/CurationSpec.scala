package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Behavioral fixtures for the curation + assembly operators: the
  * decontamination probe flags exactly the planted copy, the
  * repetition signals separate uniform from degenerate text, and the
  * packing layout is a valid concat-and-chunk assignment. (Value
  * correctness against DuckDB is the Verify oracle's job — these pin
  * the semantics on crafted inputs where the right answer is known by
  * construction.)
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*): String = {
    val d = SparkTestSession.fixtureDir("curation-fix")
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val evalText = (0 until 40).map(i => s"alpha$i").mkString(" ")
  private val otherText = (0 until 40).map(i => s"beta$i").mkString(" ")

  test("decon1 flags the doc that copies eval text, not the disjoint one") {
    // doc 0 is in the eval slice (0 % 97 == 0); doc 1 copies it
    // verbatim; doc 2 shares nothing.
    val d = docs(0L -> evalText, 1L -> evalText, 2L -> otherText)
    val out = Curation.queries("decon1_ngram_overlap")(spark, d).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    // 40 tokens, all distinct → 36 distinct 5-grams, all shared
    assert(out.head.getLong(1) == 36L)
  }

  test("txt7 separates all-distinct text from a degenerate repeat") {
    val uniform = (0 until 20).map(i => s"w$i").mkString(" ")
    val degenerate = Seq.fill(20)("spam").mkString(" ")
    val d = docs(1L -> uniform, 2L -> degenerate)
    val rows = Curation.queries("txt7_repetition")(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (uTop, uDup) = rows(1L)
    val (gTop, gDup) = rows(2L)
    assert(uTop == 1.0 / 20 && uDup == 0.0)
    // all tokens identical: top fraction 1, 18 trigrams but 1 distinct
    assert(gTop == 1.0 && gDup == 1.0 - 1.0 / 18)
  }

  test("pipe1 assigns the first failing rule in precedence order") {
    val d = docs(
      // 5 tokens → too_short (even though 'spam spam…' also trips
      // top_word: precedence picks the first rule)
      1L -> "spam spam spam spam spam",
      // 20 long tokens → word_length (mean 12 chars)
      2L -> (0 until 20).map(i => f"verylongtoken$i%03d").mkString(" "),
      // 20 tokens, half 'spam' → top_word (mean_len fine)
      3L -> ((0 until 10).map(_ => "spam") ++
        (0 until 10).map(i => s"ok$i")).mkString(" "),
      // healthy: 20 distinct medium tokens → kept
      4L -> (0 until 20).map(i => s"word$i").mkString(" "))
    val out = Curation.queries("pipe1_corpus_filter")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(out == Map(1L -> "too_short", 2L -> "word_length",
      3L -> "top_word", 4L -> "kept"))
    val funnel = Curation.queries("pipe1_filter_funnel")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel == Map("too_short" -> 1L, "word_length" -> 1L,
      "top_word" -> 1L, "kept" -> 1L))
  }

  test("ds4 shard write: per-shard accounting survives the roundtrip " +
      "and maxRecordsPerFile splits a big shard into bounded files") {
    // 120 kept-quality docs, all in shard 0 (doc_id multiples of 8):
    // with maxRecordsPerFile=50 the writer MUST split shard 0 into
    // ≥3 parquet files — the size bound is the point of the operator
    val rows = (0 until 120).map { i =>
      (i * 8L) -> (0 until 20).map(j => s"tok${i}x$j").mkString(" ")
    }
    val d = docs(rows: _*)
    val outDir = SparkTestSession.fixtureDir("ds4-out") + "/data"
    val out = DatasetOps.shardWrite(spark, d, outDir,
      maxRecordsPerFile = 50).collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L)
    assert(out.head.getLong(1) == 120L)
    assert(out.head.getLong(2) == 120L * 20)
    val parts = new java.io.File(outDir, "shard=0")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 3, s"expected >=3 bounded files in shard 0, got $parts")
  }

  test("pipe2 quantile cut keeps exactly the docs above the p10 score") {
    // 10 docs, doc i has i 'the' among 20 tokens → score i/20, all
    // distinct. quantile_cont(0.1) over 10 values interpolates at
    // rank 0.9: thr = v0 + 0.9·(v1−v0) = 0.045, strictly between
    // doc 0 (0.0) and doc 1 (0.05) → exactly docs 1..9 survive.
    val rows = (0 until 10).map { i =>
      i.toLong -> (Seq.fill(i)("the") ++
        (0 until (20 - i)).map(j => s"w${i}x$j")).mkString(" ")
    }
    val d = docs(rows: _*)
    val out = Curation.queries("pipe2_quantile_cut")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == (1L to 9L))
    assert(out.forall { case (_, score, p10) => score >= p10 })
    assert(math.abs(out.head._3 - 0.045) < 1e-12)
  }

  test("ds5 mixture: realized per-source fraction tracks its target") {
    // sf0.1 has 250 docs per source: the md5-uniform keep decision
    // should realize each source's target fraction within ~3σ
    // (σ = sqrt(w(1−w)/250) ≈ 0.03) — and the hashes are fixed, so
    // this is a deterministic property of the corpus, not a flake.
    val rows = DatasetOps.queries("ds5_mixture_sample")(
        spark, "/root/testdata/sf0.1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length == 20)
    rows.foreach { case (src, nIn, nKept, target, realized) =>
      assert(nIn == 250L, s"$src: n_in $nIn")
      assert(nKept >= 0 && nKept <= nIn)
      assert(math.abs(realized - target) < 0.1,
        s"$src: realized $realized vs target $target")
    }
  }

  test("ds6 length batching: audit is exact and sorting beats doc order") {
    // recompute the batching independently from ds3's (doc, tokens)
    // rows and assert the query's padding audit matches exactly; then
    // the point of the operator: length-sorted batches waste less
    // padding than doc_id-ordered batches on this corpus
    val toks = DatasetOps.queries("ds3_sequence_pack")(
        spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def padding(order: Seq[(Long, Long, Long)] => Seq[Long]): Long =
      toks.groupBy(_._1).map { case (_, rs) =>
        order(rs.toSeq).grouped(32)
          .map(b => b.max * b.size - b.sum).sum
      }.sum
    val sortedPad = padding(_.sortBy(r => (r._3, r._2)).map(_._3))
    val docOrderPad = padding(_.sortBy(_._2).map(_._3))
    val out = DatasetOps.queries("ds6_length_batching")(
        spark, SparkTestSession.Sf0001).collect()
    assert(out.map(_.getLong(5)).sum == sortedPad,
      "query padding audit differs from independent recomputation")
    assert(sortedPad < docOrderPad,
      s"sorted padding $sortedPad not below doc-order $docOrderPad")
  }

  test("ds3 packing is a valid concat-and-chunk layout per shard") {
    val out = DatasetOps.queries("ds3_sequence_pack")(
        spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(_._2)
      // first doc of a shard starts at offset 0; every next doc starts
      // exactly where the previous one ended (concat, no gaps)
      assert(ordered.head._4 == 0L, s"shard $shard does not start at 0")
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(b._4 == a._4 + a._3,
          s"shard $shard: doc ${b._2} offset not contiguous")
      }
      // block span is exactly the chunk arithmetic over the offsets
      ordered.foreach { case (_, id, n, off, sb, eb) =>
        assert(sb == off / 512 && eb == (off + n - 1) / 512,
          s"doc $id block span wrong")
        assert(sb <= eb)
      }
    }
  }

  test("pipe5: uniform mixture scores ln k / k / k; skew scores lower") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = SparkTestSession.fixtureDir("pipe5-fix")
    // lang 'u': 4 sources × 3 docs (uniform); lang 'v': 9+1+1+1 (skew)
    val docs =
      (0 until 12).map(i => ("u", s"s${i % 4}")) ++
      (0 until 12).map(i => ("v", if (i < 9) "s0" else s"s${i - 8}"))
    docs.zipWithIndex.map { case ((l, src), i) =>
      (i.toLong, s"doc $i text", l, src, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Curation.queries("pipe5_mixture_diversity")(spark, d)
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("u")
    assert(u.getLong(1) == 12 && u.getLong(2) == 4)
    assert(math.abs(u.getDouble(3) - math.log(4.0)) < 1e-6, "H = ln k")
    assert(math.abs(u.getDouble(4) - 4.0) < 1e-5, "effective = k")
    assert(math.abs(u.getDouble(6) - 4.0) < 1e-5, "inv Simpson = k")
    val v = out("v")
    assert(v.getLong(2) == 4 && v.getDouble(4) < u.getDouble(4),
      "skewed mixture must score fewer effective sources")
    assert(v.getDouble(3) < u.getDouble(3))
  }

  test("pipe7 triage rows agree with every parent query; one keeper per cluster") {
    val sf = SparkTestSession.Sf0001
    val triage = Curation.queries("pipe7_graph_triage")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4),
         r.getLong(5))).toMap
    assert(triage.nonEmpty)
    val cc = Dedup.queries("d10_cc_corpus")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val core = Dedup.queries("d21_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val harm = Dedup.queries("d23_harmonic")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // exactly the graph members appear, and every column equals its
    // parent query's value — the composition adds joins, not logic
    assert(triage.keySet == harm.keySet)
    triage.foreach { case (id, (can, cr, h, _, _)) =>
      assert(can == cc(id) && cr == core(id) && h == harm(id), s"doc $id")
    }
    // every cluster in the output elects exactly ONE keeper, and the
    // keeper is a longest member (n_chars ties broken by min id)
    triage.groupBy(_._2._1).foreach { case (can, ms) =>
      val keepers = ms.filter(_._2._4)
      assert(keepers.size == 1, s"cluster $can: ${keepers.size} keepers")
      val (kid, krow) = keepers.head
      val best = ms.toSeq.map { case (id, r) => (-r._5, id) }.min
      assert((-krow._5, kid) == best, s"cluster $can keeper not longest")
    }
  }

  test("pipe8 edge audit agrees with d25/d26/d10; bridge flag is the zero-common verdict") {
    val sf = SparkTestSession.Sf0001
    val audit = Curation.queries("pipe8_edge_audit")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getDouble(7), r.getDouble(8), r.getBoolean(9)))
      .toMap
    assert(audit.nonEmpty)
    val strength = Dedup.queries("d25_edge_strength")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val jac = Dedup.queries("d26_edge_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getDouble(6))).toMap
    val cc = Dedup.queries("d10_cc_corpus")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly the verified edge set, and every column equals its
    // parent query's value — the composition adds joins, not logic
    assert(audit.keySet == strength.keySet && audit.keySet == jac.keySet)
    audit.foreach { case (e @ (da, _),
        (comp, dgA, dgB, cn, un, aa, nj, bridge)) =>
      val (scn, saa) = strength(e)
      val (jda, jdb, jun, jj) = jac(e)
      assert(comp == cc(da), s"edge $e component")
      assert(cn == scn && aa == saa, s"edge $e strength")
      assert(dgA == jda && dgB == jdb && un == jun && nj == jj,
        s"edge $e jaccard cells")
      assert(bridge == (cn == 0L), s"edge $e bridge verdict")
    }
  }

  test("pipe9: both strategies audit the same graph; the component fix is leak-free") {
    val sf = SparkTestSession.Sf0001
    val got = Curation.queries("pipe9_split_contrast")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("doc_hash", "component_hash"))
    val (npDoc, leakDoc, rateDoc) = got("doc_hash")
    val (npCc, leakCc, rateCc) = got("component_hash")
    // same verified edge set under both strategies
    assert(npDoc == npCc, "strategies must audit the same pair total")
    // cross-anchor against DS22: the doc-hash leak count is exactly
    // the sum of DS22's is_leak cells over the same graph
    val ds22 = graft.operators.DatasetOps.queries("ds22_leakage_audit")(
      spark, sf).collect()
      .map(r => (r.getLong(2), r.getBoolean(3)))
    assert(npDoc == ds22.map(_._1).sum, "pair total vs ds22 partition")
    assert(leakDoc == ds22.filter(_._2).map(_._1).sum,
      "doc-hash leaks vs ds22 is_leak mass")
    // the operator's point, both directions
    assert(leakDoc > 0, "vacuous: the naive split must leak here")
    assert(leakCc == 0L && rateCc == 0.0,
      "component split must be structurally leak-free")
    assert(rateDoc == leakDoc.toDouble / npDoc)
  }

  test("pipe10: both mixtures normalize, duplication shifts mass away") {
    val sf = graft.SparkTestSession.Sf0001
    val rows = Curation.queries("pipe10_effective_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length > 1)
    // r6'd shares must still sum to 1 within the rounding grid
    val sumRaw = rows.map(_._4).sum; val sumEff = rows.map(_._5).sum
    assert(math.abs(sumRaw - 1.0) < 1e-4 && math.abs(sumEff - 1.0) < 1e-4)
    rows.foreach { case (src, n, eff, qr, qe, shift) =>
      assert(eff <= n + 1e-9, s"$src effective mass bound")
      assert(qr > 0 && qe > 0, src)
      assert(shift == qe - qr, s"$src shift identity")
    }
    // the composition's point: the mixtures must actually DIFFER
    // (the corpus has uneven duplication across sources), and the
    // shifts must balance to ~0 (mass is conserved)
    assert(rows.exists(_._6 != 0.0), "vacuous: identical mixtures")
    assert(math.abs(rows.map(_._6).sum) < 1e-4, "shift mass conservation")
  }
}
