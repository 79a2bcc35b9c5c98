package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Fixtures for the multimodal plumbing: binary payload metadata and
  * the deterministic decode-stub feature extractor (8-bin byte
  * histogram — known bytes → known bins).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(rows: (Long, String)*): String = {
    val d = SparkTestSession.fixtureDir("mm-fix")
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("mm1: byte length, md5 content hash, magic prefix") {
    val d = docs(1L -> "GIF8whatever", 2L -> "ab")
    val rows = Multimodal.queries("mm1_binary_meta")(spark, d).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getString(2), r.getString(3))).toMap
    assert(byId(1L)._1 == 12L)
    assert(byId(1L)._3 == "GIF8")
    assert(byId(2L)._1 == 2L)
    assert(byId(2L)._3 == "ab")
    // md5 of "ab" (well-known vector)
    assert(byId(2L)._2 == "187ef4436122d1cc2f40dc2b92f0eba0")
  }

  test("mm2: known bytes land in known histogram bins, rows normalized") {
    // 'A' = 65 → bin 65>>5 = 2; 'a' = 97 → bin 3; ' ' = 32 → bin 1.
    val d = docs(1L -> "AAAA", 2L -> "Aa", 3L -> "A a")
    val rows = Multimodal.queries("mm2_feature_extract")(spark, d).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (0 until 8).map(i => r.getDouble(i + 1))).toMap
    assert(byId(1L) == Seq(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert(byId(2L) == Seq(0.0, 0.0, 0.5, 0.5, 0.0, 0.0, 0.0, 0.0))
    assert(byId(3L)(1) > 0.33 && byId(3L)(1) < 0.34) // the space byte
    // histogram always sums to 1 for non-empty payloads
    rows.foreach { r =>
      val s = (0 until 8).map(i => r.getDouble(i + 1)).sum
      assert(math.abs(s - 1.0) < 1e-5)
    }
  }

  test("mm3: every 4th 16-byte frame sampled, exact frame means") {
    // 80 bytes = 5 frames (0..4); sampled: 0 and 4. Frame 0 is all 'A'
    // (mean 65), frame 4 all 'B' (mean 66). Partial tail discarded.
    val text = "A" * 16 + "x" * 48 + "B" * 16 + "zzz"
    val d = docs(1L -> text, 2L -> "short")
    val rows = Multimodal.queries("mm3_frame_sample")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, 0L, 65.0), (1L, 4L, 66.0)))
    // doc 2 (< one frame) emits nothing — no empty-frame rows
  }

  test("mm4: area resize — exact block means, uneven blocks, short docs dropped") {
    // "abcdefghijkl" (L=12, codes 97..108) over 8 blocks: sizes
    // alternate 1,2 via integer division → means 97, 98.5, 100, 101.5,
    // 103, 104.5, 106, 107.5. "ABABABAB" (L=8) maps byte-per-block.
    val d = docs(1L -> "abcdefghijkl", 2L -> "ABABABAB", 3L -> "tiny")
    val rows = Multimodal.queries("mm4_resize")(spark, d).collect()
      .map(r => r.getLong(0) -> (0 until 8).map(i => r.getDouble(i + 1))).toMap
    assert(rows.keySet == Set(1L, 2L)) // doc 3 (< 8 bytes) excluded
    assert(rows(1L) == Seq(97.0, 98.5, 100.0, 101.5, 103.0, 104.5, 106.0, 107.5))
    assert(rows(2L) == Seq(65.0, 66.0, 65.0, 66.0, 65.0, 66.0, 65.0, 66.0))
  }

  test("mm5: identical payloads collide at hamming 0, banding finds them") {
    // docs 1/2 share one 128-byte payload → identical aHashes → the
    // banded pair search MUST emit (1,2) at distance 0; doc 3 is a
    // different byte pattern. Also pin the hash's shape: 64 bits,
    // non-constant (the global-mean threshold splits blocks both ways
    // whenever the signal isn't flat).
    val payload = ("A" * 8 + "z" * 8) * 8       // 128 bytes, alternating
    val other = ("qX" * 32) + ("m" * 64)        // 128 bytes, different
    val d = docs(1L -> payload, 2L -> payload, 3L -> other)
    val hashes = Multimodal.queries("mm5_percept_hash")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    assert(hashes(1L).length == 64 &&
      hashes(1L).forall(c => c == '0' || c == '1'))
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L).contains('0') && hashes(1L).contains('1'))
    val pairs = Multimodal.queries("mm5_phash_pairs")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((1L, 2L, 0L)), s"identical pair missing: ${pairs.toSeq}")
  }

  test("mm5: banded pairs equal an exhaustive search on the corpus") {
    // 16 bands × 4 bits are pigeonhole-complete through Hamming 15, so
    // over the ≤ 11 predicate the banded join must reproduce the
    // all-pairs answer exactly — same guarantee D8 proves for simhash,
    // here over the oracle-checked perceptual hash.
    val sf = "/root/testdata/sf0.01"
    val hs = Multimodal.queries("mm5_percept_hash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val exact = (for {
      (da, sa) <- hs; (db, sb) <- hs
      if da < db && ham(sa, sb) <= 11
    } yield (da, db, ham(sa, sb).toLong)).toSet
    assert(exact.nonEmpty, "vacuous: no pair at hamming <= 11 at sf0.01")
    val banded = Multimodal.queries("mm5_phash_pairs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == exact,
      s"missed=${exact.diff(banded)} extra=${banded.diff(exact)}")
  }

  /** Independent pure-Scala aHash (the MM5 contract): None when the
    * payload is shorter than 64 bytes or non-ASCII. */
  private def ahash(text: String): Option[String] = {
    val bytes = text.getBytes("UTF-8")
    val L = bytes.length
    if (L < 64 || L != text.length) None
    else {
      val gmean = bytes.map(_ & 0xFF).map(_.toLong).sum.toDouble / L
      Some((0 until 64).map { k =>
        val lo = k * L / 64; val hi = (k + 1) * L / 64
        val m = (lo until hi).map(bytes(_) & 0xFF).map(_.toLong).sum.toDouble /
          (hi - lo)
        if (m > gmean) '1' else '0'
      }.mkString)
    }
  }

  test("mm5 tight: planted pairs all surface; banding equals exhaustive") {
    // the production-radius query plants its own near-dups (first/last
    // char swap per 17th hashable doc). Recompute the ENTIRE pipeline
    // independently in plain Scala — planting, aHash, exhaustive
    // Hamming scan at radius 7 — and assert the banded 8×8 query
    // reproduces it exactly, plus the two headline guarantees: every
    // planted pair is found, and each sits at Hamming ≤ 2 (the
    // swap-two-chars construction bound).
    val sf = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def swap(t: String) =
      s"${t.last}${t.substring(1, t.length - 1)}${t.head}"
    val planted = base.collect {
      case (id, t) if ahash(t).isDefined && id % 17 == 0 =>
        (id + 100000000L) -> swap(t)
    }
    val hs = (base ++ planted).flatMap { case (id, t) =>
      ahash(t).map(id -> _) }
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val exact = (for {
      (da, sa) <- hs; (db, sb) <- hs
      if da < db && ham(sa, sb) <= 7
    } yield (da, db, ham(sa, sb).toLong)).toSet
    val got = Multimodal.queries("mm5_phash_pairs_tight")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact,
      s"missed=${exact.diff(got)} extra=${got.diff(exact)}")
    // non-vacuous by construction: every planted (src, src + 10⁸)
    // pair must be in the result, at the construction's distance bound
    val plantedPairs = planted.map { case (pid, _) =>
      (pid - 100000000L, pid) }.toSet
    assert(plantedPairs.nonEmpty)
    for ((src, pid) <- plantedPairs) {
      val hit = got.find(p => p._1 == src && p._2 == pid)
      assert(hit.isDefined, s"planted pair ($src,$pid) missing")
      assert(hit.get._3 <= 2L, s"planted pair past the swap bound: $hit")
    }
  }

  test("mm12: bucket is the true nearest aspect; batches are bounded") {
    val ladder = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16),
      (3, 2), (2, 3), (2, 1), (1, 2))
    val rows = graft.operators.Multimodal.queries("mm12_aspect_buckets")(
        spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, h, bucket, _, _) =>
      assert(w >= 256 && w <= 960 && (w - 256) % 64 == 0, s"doc $id w=$w")
      assert(h >= 256 && h <= 960 && (h - 256) % 64 == 0, s"doc $id h=$h")
      // independent exact-rational argmin (cross-multiplication, no
      // 3456 common-scale constant): |w/h − a/b| < |w/h − c/d| ⟺
      // |w·b − h·a|·d < |w·d − h·c|·b. Exact ties keep the earlier
      // ladder entry, like the query (448×384 = 7:6 IS equidistant
      // from 1:1 and 4:3 — a float comparator misorders that tie)
      val best = ladder.reduceLeft { (a, b) =>
        val na = BigInt((w * a._2 - h * a._1).abs) * b._2
        val nb = BigInt((w * b._2 - h * b._1).abs) * a._2
        if (nb < na) b else a
      }
      assert(bucket == s"${best._1}:${best._2}",
        s"doc $id ${w}x$h: $bucket vs $best")
    }
    // every (bucket, shard, batch) cell holds at most 8 docs, all of
    // one bucket, and batch ids are contiguous from 0 per cell
    rows.groupBy(r => (r._4, r._5)).foreach { case ((b, sh), rs) =>
      val byBatch = rs.groupBy(_._6)
      assert(byBatch.keySet == (0L until byBatch.size).toSet, s"$b/$sh ids")
      byBatch.foreach { case (bt, xs) =>
        assert(xs.size <= 8, s"$b/$sh batch $bt size ${xs.size}")
        if (bt < byBatch.size - 1)
          assert(xs.size == 8, s"$b/$sh non-trailing batch $bt underfull")
      }
    }
  }

  test("mm13 byte chi2 matches a sequential 16-slot fold; separates regimes") {
    val sf = graft.SparkTestSession.Sf0001
    val got = Multimodal.queries("mm13_byte_chi2")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.getBytes("UTF-8").nonEmpty)
    assert(got.keySet == docs.map(_._1).toSet && got.nonEmpty)
    docs.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val hist = new Array[Long](16)
      bytes.foreach(b => hist((b & 0xF0) >> 4) += 1)
      val e = bytes.length.toDouble / 16
      var chi2 = 0.0
      (0 until 16).foreach { c =>
        chi2 += (hist(c).toDouble - e) * (hist(c).toDouble - e) / e
      }
      assert(got(id) == ((bytes.length.toLong, chi2)), s"doc $id chi2")
    }
    // regime separation: ASCII text concentrates in nibble classes
    // 2/6/7 → chi2 far above the uniform expectation (~15 = df);
    // a uniform-ish synthetic blob must score far lower
    assert(got.values.forall(_._2 > 100.0),
      "text should be wildly non-uniform in byte classes")
  }

  test("mm14 byte autocorrelation matches a sequential recompute") {
    val sf = graft.SparkTestSession.Sf0001
    val got = Multimodal.queries("mm14_byte_autocorr")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val exp = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter { case (_, t) => t.length >= 2 && t.forall(_ < 128) }
      .flatMap { case (id, t) =>
        val b = t.map(_.toLong)
        val np = (b.length - 1).toLong
        val x = b.dropRight(1); val y = b.drop(1)
        val sx = x.sum; val sy = y.sum
        val sxx = x.map(v => v * v).sum
        val syy = y.map(v => v * v).sum
        val sxy = x.zip(y).map { case (a, c) => a * c }.sum
        val vx = np * sxx - sx * sx
        val vy = np * syy - sy * sy
        if (vx > 0 && vy > 0)
          Some(id -> ((np, (np * sxy - sx * sy).toDouble /
            (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))))
        else None
      }.toMap
    assert(got.keySet == exp.keySet, "doc coverage")
    assert(got.nonEmpty)
    exp.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id autocorr")
      assert(got(id)._2 >= -1.0 && got(id)._2 <= 1.0, s"doc $id bound")
    }
    // the word-stream corpus has real serial structure (letters
    // predict letters; spaces recur) — a shuffled-byte blob would sit
    // near 0. Non-degeneracy: correlations must not all collapse to
    // one sign/magnitude cell.
    assert(got.values.map(_._2).toSet.size > 1, "vacuous: constant r")
  }

  test("mm15 conditional entropy on planted docs matches hand values") {
    import spark.implicits._
    val d = SparkTestSession.fixtureDir("mm15-fix")
    // "aA0a": high nibbles 6,4,3,6 -> 3 distinct pairs (each p=1/3)
    //   H_pair = ln 3 from the r6'd-term sum; prev marginal also
    //   uniform over 3 -> H_cond = 0
    // "aaaa": one pair class -> everything 0
    // "aA": a single pair -> everything 0
    Seq((1L, "aA0a", "en", "wiki", 4L), (2L, "aaaa", "en", "wiki", 4L),
      (3L, "aA", "en", "wiki", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = Multimodal.queries("mm15_byte_cond_entropy")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val lnTerm = BigDecimal(-(1.0 / 3) * math.log(1.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val h3 = BigDecimal(3 * lnTerm).setScale(10,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 == 3L && got(1L)._2 == h3 && got(1L)._4 == 0.0)
    assert(got(2L) == ((3L, 0.0, 0.0, 0.0)))
    assert(got(3L) == ((1L, 0.0, 0.0, 0.0)))
  }

  test("mm15 corpus: h_cond in [0, h_pair], text scores below uniform") {
    val rows = Multimodal.queries("mm15_byte_cond_entropy")(
      spark, SparkTestSession.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hp, hprev, hc) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // information-theoretic bounds (up to the 1e-6 term rounding):
      // 0 <= H(next|prev) <= H(pairs), H(prev) <= H(pairs)
      assert(hc >= -1e-4 && hc <= hp + 1e-4, s"doc ${r.getLong(0)}")
      assert(hprev <= hp + 1e-4)
    }
    // real text is serially predictable: conditional entropy must sit
    // strictly below the marginal for most docs (not a constant-0 or
    // equal-to-marginal degenerate)
    val below = rows.count(r => r.getDouble(4) < r.getDouble(3))
    assert(below * 2 > rows.length, "vacuous: no serial structure")
  }
}
