package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus-curation operators a training-data pipeline runs between
  * ingest and assembly: benchmark decontamination (DECON1), the
  * composed static-rule cleaning filter with its drop funnel (PIPE1),
  * the adaptive percentile-threshold cut (PIPE2), and repetition
  * scoring (TXT7). All builder-brief training-pipeline extensions
  * (the reference dashboard has no corpus-curation story); all FULLY
  * oracle-checked — every computation is count arithmetic + pure
  * IEEE division/percentile, which hashes bit-identically across
  * engines.
  *
  * Scale notes: DECON1's eval side is tiny by construction (a
  * benchmark suite is MBs against a 100 TB corpus), so the membership
  * probe is a broadcast semi-join — the corpus never shuffles except
  * the final partial-aggregated count by doc (plan-asserted in
  * PlanShapeSpec). PIPE1/TXT7 are one corpus pass: per-row shingle
  * arithmetic plus a hash agg on doc_id; the word histogram goes
  * through (doc_id, word) partial aggregation, so no reducer sees
  * more than a doc's distinct vocabulary. PIPE2's threshold is one
  * percentile row broadcast onto the corpus (the a13 bounds pattern).
  */
object Curation {

  private def toks: Column = TextAnalysis.toks

  /** Distinct word n-gram shingles of the token array `t` (the D2
    * 3-gram shape generalized to n). */
  private def shingleCol(n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), size(col("t")) - n),
      i => concat_ws(" ", (1 to n).map(k => element_at(col("t"), i + k)): _*)))

  /** Eval-set membership: every 97th doc stands in for the held-out
    * benchmark suite a real pipeline decontaminates against. */
  private val EvalMod = 97

  /** Per-doc quality signals + the first failing cleaning rule
    * (precedence: too_short → word_length → top_word → dup_trigram),
    * 'kept' if none fail. Shared by pipe1 and its funnel, and by the
    * DS4 shard writer (the kept set is what gets written). */
  private[operators] def filterDecisions(s: SparkSession, d: String): DataFrame = {
    // no length guard: split() yields at least [""] for any input, so
    // a whitespace-only doc flows through as 1 zero-length token and
    // lands in too_short — same in the oracle (no dead filter on
    // either side)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("t"))
    val words = docs.select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        max(col("c")).as("mx"), sum(col("c")).as("n"),
        sum(col("c") * length(col("w"))).as("chars"))
    // guard: sequence(0, n) DESCENDS when n < 0, so the shingle
    // transform is only evaluated for docs with ≥3 tokens
    val tri = docs.select(col("doc_id"),
      greatest(size(col("t")) - 2, lit(0)).cast("long").as("ntri"),
      when(size(col("t")) >= 3, size(shingleCol(3)))
        .otherwise(lit(0)).cast("long").as("ndis"))
    // no join hint: BOTH sides are per-doc aggregates (corpus-sized at
    // 100 TB), so the strategy must stay adaptive — AQE broadcasts at
    // test SF and sort-merge-joins on doc_id at scale; forcing either
    // would be wrong at the other end
    words.join(tri, Seq("doc_id"))
      .withColumn("mean_len", col("chars").cast("double") / col("n"))
      .withColumn("top_frac", col("mx").cast("double") / col("n"))
      .withColumn("dup_frac",
        when(col("ntri") > 0,
          lit(1.0) - col("ndis").cast("double") / col("ntri"))
          .otherwise(lit(0.0)))
      .withColumn("verdict",
        when(col("n") < 10, "too_short")
          .when(col("mean_len") < 3.0 || col("mean_len") > 10.0,
            "word_length")
          .when(col("top_frac") > 0.2, "top_word")
          .when(col("dup_frac") > 0.2, "dup_trigram")
          .otherwise("kept"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("mean_len"), col("top_frac"), col("dup_frac"), col("verdict"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DECON1: benchmark decontamination — flag training docs sharing
    // any 5-gram with the eval slice, with the shared-shingle count as
    // evidence. The classic eval-leakage guard (per GPT-3 §C / PaLM
    // app.: n-gram overlap against benchmark text); n=5 on this
    // small-vocabulary corpus plays the role 13-grams play on natural
    // text. Eval shingles broadcast; the corpus side is one scan.
    "decon1_ngram_overlap" -> ((s, d) => {
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(shingleCol(5)).as("sh"))
      val ev = sh.filter(col("doc_id") % EvalMod === 0)
        .select(col("sh")).distinct()
      sh.filter(col("doc_id") % EvalMod =!= 0)
        .join(broadcast(ev), Seq("sh"))
        .groupBy("doc_id")
        .agg(countDistinct(col("sh")).as("n_shared"))
        .orderBy("doc_id")
    }),

    // DECON2: FUZZY benchmark decontamination — the second leg of the
    // production decon stack (GPT-3 §C removes exact n-gram overlaps;
    // the Llama/PaLM-era pipelines pair that with near-duplicate
    // detection, because a paraphrased or lightly-edited benchmark
    // item sails through an exact 5-gram probe). Reuses the D3/D6
    // machinery end-to-end: corpus MinHash signatures (memoized
    // build), banded candidate join restricted to eval↔corpus
    // crossings, then exact-Jaccard verification over candidates
    // only — contaminated = corpus docs whose verified trigram
    // Jaccard vs some eval doc ≥ 0.5. Eval membership doc_id % 5
    // (mod chosen so the planted near-dup pairs actually cross the
    // eval/corpus boundary — % 97 never does at test SF; a real
    // suite is an external table joined the same way). Rows-only
    // (MinHash has no SQL twin); DedupSpec anchors precision exactly
    // (every true_jaccard ≡ the D2-style exact recomputation) and
    // recall ≥ 0.7 against the exhaustive exact crossing pairs.
    // Signature dump as in d3/d6 (byte-identical content — the same
    // memoized table), so the DuckDB twin replays banding, the
    // eval↔corpus crossing filter, and the exact shingle verify —
    // flipped from rows-only in round 12 (the precision/recall
    // anchors vs decon1 stay in CurationSpec).
    "decon2_fuzzy_overlap" -> ((s, d) => {
      Dumps.writeOnce(s, Dedup.D3SigDump(d)) {
        Dedup.signatures(s, d).write.mode("overwrite")
          .parquet(Dedup.D3SigDump(d))
      }
      val crossings = Dedup
        .minhashPairs(s.read.parquet(Dedup.D3SigDump(d)), 0.5)
        .filter((col("da") % 5 === 0) =!= (col("db") % 5 === 0))
      Dedup.verifyPairs(s, d, crossings)
        .filter(col("true_jaccard") >= 0.5)
        .select(
          when(col("da") % 5 === 0, col("db")).otherwise(col("da"))
            .as("corpus_doc"),
          when(col("da") % 5 === 0, col("da")).otherwise(col("db"))
            .as("eval_doc"),
          col("est_jaccard"), col("true_jaccard"))
        .orderBy("corpus_doc", "eval_doc")
    }),

    // PIPE10: dedup-corrected temperature mixture — the composition
    // DS21 exists to feed: DS12's temperature reweighting applied to
    // EFFECTIVE source masses (Σ 1/|cluster|) instead of raw row
    // counts, because temperature sampling on raw counts double-pays
    // sources whose volume is internal duplication. Per source both
    // mixtures (q_raw from n_docs^α/Z, q_eff from n_effective^α/Z,
    // α = 0.7 — DS12's constant) and dup_shift = q_eff − q_raw, the
    // signed correction the naive mixture needs. Float discipline is
    // DS12's: both Z sums decimal-pinned (libm pow accumulation must
    // not move with order), q's r6'd off the pinned renders, the
    // shift one subtraction. Fully hash-checked — the DuckDB twin
    // replays the DS21 closure chain AND both mixture formulas.
    "pipe10_effective_mix" -> ((s, d) => {
      val alpha = 0.7
      val eff = DatasetOps.queries("ds21_dedup_weights")(s, d)
        .select(col("source"), col("n_docs"), col("n_effective"))
      val tot = eff.agg(
        sum(pow(col("n_docs").cast("double"), lit(alpha))
          .cast("decimal(30,12)")).cast("double").as("z_raw"),
        sum(pow(col("n_effective"), lit(alpha))
          .cast("decimal(30,12)")).cast("double").as("z_eff"))
      eff.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_effective"),
          round(pow(col("n_docs").cast("double"), lit(alpha)) /
            col("z_raw"), 6).as("q_raw"),
          round(pow(col("n_effective"), lit(alpha)) /
            col("z_eff"), 6).as("q_eff"))
        .withColumn("dup_shift", col("q_eff") - col("q_raw"))
        .orderBy("source")
    }),

    // PIPE1: the composed corpus filter — the C4/Gopher-style cleaning
    // decision a training-data pipeline applies before assembly. Every
    // doc gets its quality signals (token count, mean token length,
    // top-word fraction, duplicate-trigram fraction) and the FIRST
    // failing rule in precedence order becomes its drop reason. One
    // corpus pass + one (doc, word) partial agg; the decision is pure
    // integer/IEEE arithmetic so the oracle hash-matches exactly.
    "pipe1_corpus_filter" -> ((s, d) =>
      filterDecisions(s, d).orderBy("doc_id")),

    // PIPE1 funnel: docs dropped per reason + kept — the summary a
    // cleaning job reports. Same plan as pipe1 under one more agg.
    "pipe1_filter_funnel" -> ((s, d) =>
      filterDecisions(s, d)
        .groupBy("verdict").agg(count(lit(1)).as("n_docs"))
        .orderBy("verdict")),

    // PIPE2: adaptive quantile cut — "keep the top 90% by quality"
    // rather than a fixed threshold (corpora drift; percentile
    // thresholds self-calibrate). Score = stopword ratio (the txt2
    // quality family); the p10 threshold is ONE exact-percentile row
    // broadcast onto the corpus (the a13 bounds pattern), so the
    // corpus scans twice and never shuffles beyond the percentile
    // agg. Raw doubles; `percentile` ≡ DuckDB `quantile_cont`
    // (linear interpolation, parity proven by a17).
    "pipe2_quantile_cut" -> ((s, d) => {
      val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
      val nTok = size(col("t")).cast("double")
      val stopN = size(filter(col("t"), t => t.isInCollection(stop)))
        .cast("double")
      val scored = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"), (stopN / nTok).as("score"))
      val thr = scored.agg(expr("percentile(score, 0.1)").as("p10"))
      scored.crossJoin(broadcast(thr))
        .filter(col("score") >= col("p10"))
        .select(col("doc_id"), col("score"), col("p10"))
        .orderBy("doc_id")
    }),

    // PIPE3: the assembly line END-TO-END — exact dedup (D1) →
    // quality filter (PIPE1) → benchmark decontamination (DECON1) →
    // train split (DS1), reported as the cumulative survival funnel a
    // curation job publishes (each stage applies to the previous
    // stage's survivors; precedence is the pipeline order, so a doc
    // failing dedup never re-counts as a quality drop). ONE plan:
    // per-doc stage flags fold into a last-surviving-stage int, the
    // funnel is a ≤5-row agg joined to a literal stage spine, and the
    // share is long/long division (exact IEEE). Scale: the flag
    // builders are the SAME plans as their standalone operators
    // (hash-window dedup, one (doc, word) partial agg, broadcast eval
    // shingles) — the funnel adds one tiny agg on top, nothing else.
    "pipe3_assembly_funnel" -> ((s, d) => {
      import s.implicits._
      val canon = Tables.documents(s, d)
        .select(col("doc_id"),
          md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("h"))
        .withColumn("rn",
          row_number().over(Window.partitionBy("h").orderBy("doc_id")))
        .select(col("doc_id"), (col("rn") === 1).as("is_canonical"))
      val quality = filterDecisions(s, d)
        .select(col("doc_id"), (col("verdict") === "kept").as("q"))
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) >= 5)
        .select(col("doc_id"), explode(shingleCol(5)).as("sh"))
      val ev = sh.filter(col("doc_id") % EvalMod === 0)
        .select(col("sh")).distinct()
      val contaminated = sh.filter(col("doc_id") % EvalMod =!= 0)
        .join(broadcast(ev), Seq("sh"))
        .select(col("doc_id")).distinct()
        .withColumn("bad", lit(true))
      val flags = Tables.documents(s, d).select(col("doc_id"))
        .join(canon, Seq("doc_id"))
        .join(quality, Seq("doc_id"))
        .join(contaminated, Seq("doc_id"), "left")
        .withColumn("last_stage",
          when(!col("is_canonical"), 0L)
            .when(!col("q"), 1L)
            .when(col("doc_id") % EvalMod === 0 || col("bad").isNotNull, 2L)
            .when(DatasetOps.split(col("doc_id")) =!= "train", 3L)
            .otherwise(4L))
      val counts = flags.groupBy("last_stage").agg(count(lit(1)).as("c"))
      val total = flags.agg(count(lit(1)).as("n_total"))
      val spine = Seq((0L, "1_ingest"), (1L, "2_exact_dedup"),
        (2L, "3_quality"), (3L, "4_decontamination"),
        (4L, "5_train_split")).toDF("stage_id", "stage")
      spine.join(counts, counts("last_stage") >= spine("stage_id"), "left")
        .groupBy(col("stage_id"), col("stage"))
        .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("n_docs"))
        .crossJoin(broadcast(total))
        .select(col("stage_id"), col("stage"), col("n_docs"),
          (col("n_docs").cast("double") / col("n_total")).as("frac"))
        .orderBy("stage_id")
    }),

    // PIPE4: the corpus DATASHEET — the one-row report a data-curation
    // run publishes next to its output (Gebru et al.'s "datasheets
    // for datasets", reduced to the machine-computable vitals):
    // volume (docs, tokens, chars), exact-duplication rate, language
    // mix (count, dominant share), mean quality (TXT2's
    // oracle-checked per-doc score, decimal-mean'd), and vocabulary
    // size. Two corpus passes (doc-level projection+agg; token
    // distinct), both map-side-combinable; the four 1-row partials
    // broadcast into the final row. Deterministic dominant-language
    // tiebreak via max(struct(n, lang)).
    "pipe4_corpus_datasheet" -> ((s, d) => {
      def dmean(c: Column) =
        sum(c.cast("decimal(30,12)")).cast("double") / count(lit(1))
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
            .as("h"),
          size(toks).cast("long").as("n_tok"),
          length(col("text")).cast("long").as("n_chars"))
      val docAgg = base.agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_unique"),
        sum(col("n_tok")).as("total_tokens"),
        dmean(col("n_tok")).as("mean_tokens"),
        dmean(col("n_chars")).as("mean_chars"),
        countDistinct(col("lang")).as("n_langs"))
      val topLang = base.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(max(struct(col("n"), col("lang"))).as("top"))
        .select(col("top.lang").as("top_lang"), col("top.n").as("top_n"))
      val quality = TextAnalysis.queries("txt2_quality_score")(s, d)
        .agg(dmean(col("quality")).as("mean_quality"))
      val vocab = Tables.documents(s, d)
        .select(explode(toks).as("w"))
        .agg(countDistinct(col("w")).as("vocab_size"))
      docAgg.crossJoin(broadcast(topLang))
        .crossJoin(broadcast(quality)).crossJoin(broadcast(vocab))
        .select(col("n_docs"), col("n_unique"),
          round((col("n_docs") - col("n_unique")).cast("double") /
            col("n_docs"), 6).as("dup_rate"),
          col("total_tokens"), round(col("mean_tokens"), 6)
            .as("mean_tokens"),
          round(col("mean_chars"), 6).as("mean_chars"),
          round(col("mean_quality"), 6).as("mean_quality"),
          col("n_langs"), col("top_lang"),
          round(col("top_n").cast("double") / col("n_docs"), 6)
            .as("top_lang_share"),
          col("vocab_size"))
    }),

    // PIPE5: mixture diversity block — the one-glance answer to "is
    // this corpus dominated by a handful of sources?" that mixture
    // designers check before weighting (PIPE4 reports sizes; this
    // reports CONCENTRATION): per lang over its source distribution,
    // Shannon entropy H = −Σ p·ln p (nats), the effective source
    // count e^H (the interpretable form — "this lang effectively
    // draws from 12.3 sources"), Simpson index Σp² and its inverse
    // (A76's HHI, probability-scaled). Counts exact; p = one
    // division; p·ln p and p² terms on a 1e-12 grid then
    // decimal-summed (TXT20's discipline); e^H = one exp at the
    // end. One (lang, source) hash agg — the frame after it is
    // ≤ langs × sources. Fully oracle-checked.
    "pipe5_mixture_diversity" -> ((s, d) => {
      val ls = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("c"))
      val lt = ls.groupBy(col("lang")).agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_sources"))
      ls.join(lt, Seq("lang"))
        .withColumn("p", col("c").cast("double") / col("n"))
        .withColumn("hterm", round(-col("p") * log(col("p")), 12))
        .withColumn("sterm", round(col("p") * col("p"), 12))
        .groupBy(col("lang"))
        .agg(max(col("n")).as("n_docs"),
          max(col("n_sources")).as("n_sources"),
          sum(col("hterm").cast("decimal(24,14)")).cast("double")
            .as("h"),
          sum(col("sterm").cast("decimal(24,14)")).cast("double")
            .as("simpson"))
        .select(col("lang"), col("n_docs"), col("n_sources"),
          round(col("h"), 6).as("entropy"),
          round(exp(col("h")), 6).as("effective_sources"),
          round(col("simpson"), 6).as("simpson"),
          round(lit(1.0d) / col("simpson"), 6).as("inv_simpson"))
        .orderBy("lang")
    }),

    // PIPE6: the assembled story end to end — "build a training mix
    // from deduped clusters" as ONE plan, chaining three fully
    // hash-checked stages: D10b's full-corpus near-dup clusters
    // (banded LSH → exact verify at J ≥ 0.5 → CC) → D20's keep-best
    // representative election (longest per cluster, doc_id tiebreak)
    // → DS17's seeded-md5 stratified 80/10/10 split per (lang,
    // source) → DS19's round-robin source interleave of the train
    // slice into one deterministic global_pos stream. What PIPE3
    // proved for the filter funnel, this proves for the dedup →
    // split → interleave composition: the stages compose without a
    // driver round-trip, and the DuckDB oracle replays the WHOLE
    // chain (the d10_cc_corpus exhaustive graph + window replays),
    // so the hash match certifies the composition, not just the
    // parts. Scale shape: each stage keyed on its own key (cluster
    // id → stratum → source), the only single-partition frame is the
    // ≤|sources| spine (DS19's documented bound).
    "pipe6_dedup_mix" -> ((s, d) => {
      val clusters = Dedup.queries("d10_cc_corpus")(s, d)
      val kept = clusters
        .join(Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars")), Seq("doc_id"))
        .withColumn("pick", row_number().over(
          Window.partitionBy("canonical_id")
            .orderBy(col("n_chars").desc, col("doc_id"))))
        .filter(col("pick") === 1)
        .select(col("doc_id"), col("lang"), col("source"))
      val base = kept
        .withColumn("k", md5(concat_ws(":", lit("pipe6"), col("doc_id"))))
        .withColumn("bucket",
          conv(substring(col("k"), 1, 2), 16, 10).cast("long"))
      val bcnt = base.groupBy("lang", "source", "bucket")
        .agg(count(lit(1)).as("c"))
        .withColumn("below", coalesce(sum(col("c")).over(
          Window.partitionBy("lang", "source").orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val n = bcnt.groupBy("lang", "source").agg(sum(col("c")).as("n"))
      val train = base
        .withColumn("wrn", row_number().over(
          Window.partitionBy("lang", "source", "bucket")
            .orderBy("k", "doc_id")).cast("long"))
        .join(bcnt.select(col("lang"), col("source"), col("bucket"),
          col("below")), Seq("lang", "source", "bucket"))
        .join(n, Seq("lang", "source"))
        .filter(col("below") + col("wrn") <= expr("div(n * 8, 10)"))
        .select(col("doc_id"), col("source"))
      val tb = train
        .withColumn("k", md5(concat_ws(":", lit("pipe6i"), col("doc_id"))))
        .withColumn("shard",
          conv(substring(col("k"), 1, 2), 16, 10).cast("long"))
      val hist = tb.groupBy("source", "shard").agg(count(lit(1)).as("c"))
        .withColumn("before", coalesce(sum(col("c")).over(
          Window.partitionBy("source").orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("source"), col("shard"), col("before"))
      val ranked = tb.join(broadcast(hist), Seq("source", "shard"))
        .withColumn("rank", col("before") + row_number().over(
          Window.partitionBy("source", "shard")
            .orderBy(col("k"), col("doc_id"))))
      val srcs = ranked.groupBy("source").agg(count(lit(1)).as("n_src"))
        .withColumn("source_idx",
          row_number().over(Window.orderBy("source")).cast("long"))
        .withColumn("mn", min(col("n_src")).over(Window.partitionBy()))
        .withColumn("n_sources",
          count(lit(1)).over(Window.partitionBy()))
        .select(col("source"), col("source_idx"), col("mn"),
          col("n_sources"))
      ranked.join(broadcast(srcs), Seq("source"))
        .filter(col("rank") <= col("mn"))
        .select(col("doc_id"), col("source"), col("rank"),
          ((col("rank") - 1) * col("n_sources") + col("source_idx") - 1)
            .as("global_pos"))
        .orderBy("global_pos")
    }),

    // PIPE7: graph TRIAGE — the dedup dashboard the graph family's
    // pieces exist to feed, as ONE oracle-checked table: for every
    // doc in the verified corpus dup graph, its cluster id (D10's
    // corpus CC), its density rung (D21's coreness), its
    // neighborhood centrality (D23's truncated harmonic), and the
    // keep/drop verdict (D20's longest-wins election generalized to
    // the full corpus). The composition is three keyed joins over
    // doc-count frames — each input is itself a fully hash-checked
    // query, and the composed DuckDB twin replays all four chains
    // over ONE shared exhaustive-graph CTE spine, so the hash match
    // certifies the JOINS compose correctly, not just the parts.
    "pipe7_graph_triage" -> ((s, d) => {
      val cc = Dedup.queries("d10_cc_corpus")(s, d)
      // the materialized coreness table directly (round 14): the d21
      // query is the same rows + an orderBy this join would discard
      val core = Dedup.coreness(s, d)
      val harm = Dedup.queries("d23_harmonic")(s, d)
        .select(col("doc_id"), col("harmonic"))
      val keep = cc
        .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          Seq("doc_id"))
        .withColumn("pick", row_number().over(
          Window.partitionBy("canonical_id")
            .orderBy(col("n_chars").desc, col("doc_id"))))
      keep.join(core, Seq("doc_id")).join(harm, Seq("doc_id"))
        .select(col("doc_id"), col("canonical_id"), col("coreness"),
          col("harmonic"), (col("pick") === 1).as("keep"),
          col("n_chars"))
        .orderBy("doc_id")
    }),

    // PIPE8: per-EDGE triage table — PIPE7's per-node election
    // paired with the edge-level evidence an auditor acts on: for
    // every verified pair, its component, the D25 redundancy
    // evidence (common neighbors + Adamic–Adar), the D26 normalized
    // strength, and the is_bridge verdict (zero common neighbors —
    // the false-merge suspects to inspect before collapsing). One
    // composition plan over the shared materialized corpus_pairs;
    // the DuckDB twin replays all three chains over ONE
    // exhaustive-graph spine, so the hash certifies the composed
    // export end to end (PIPE7's contract, edge-side).
    "pipe8_edge_audit" -> ((s, d) => {
      val strength = Dedup.queries("d25_edge_strength")(s, d)
      val jac = Dedup.queries("d26_edge_jaccard")(s, d)
        .select(col("da"), col("db"), col("deg_a"), col("deg_b"),
          col("union_cnt"), col("nbr_jaccard"))
      val cc = Dedup.queries("d10_cc_corpus")(s, d)
        .select(col("doc_id").as("da"), col("canonical_id").as("component"))
      strength.join(jac, Seq("da", "db")).join(cc, Seq("da"))
        .select(col("da"), col("db"), col("component"), col("deg_a"),
          col("deg_b"), col("common_cnt"), col("union_cnt"),
          col("aa_score"), col("nbr_jaccard"),
          (col("common_cnt") === 0).as("is_bridge"))
        .orderBy("da", "db")
    }),

    // PIPE9: the split-strategy A/B audit — DS22 measures the leak,
    // DS13 prescribes the fix; this runs BOTH strategies over the
    // SAME full-corpus near-dup graph and emits the two-row verdict
    // a pipeline review reads: per strategy (md5 on the doc id vs
    // md5 on the D10 component id), the verified-pair total, how
    // many pairs straddle the split, and the leak rate. The
    // component row's n_leaks = 0 is STRUCTURAL (both endpoints of
    // a verified pair share a component, hence a split) — and the
    // DuckDB twin re-derives that zero from the exhaustive graph +
    // recursive closure, so the guarantee is hash-certified rather
    // than asserted. One composition plan over the shared
    // materialized corpus_pairs + the D10 labels; exact integers,
    // one division.
    "pipe9_split_contrast" -> ((s, d) => {
      val pairs = Dedup.corpusPairs(s, d).select(col("da"), col("db"))
      val sp = Dedup.queries("d10_cc_corpus")(s, d)
        .withColumn("naive", DatasetOps.split(col("doc_id")))
        .withColumn("cluster", DatasetOps.split(col("canonical_id")))
      def audit(strategy: String, c: String) = pairs
        .join(sp.select(col("doc_id").as("da"), col(c).as("sa")),
          Seq("da"))
        .join(sp.select(col("doc_id").as("db"), col(c).as("sb")),
          Seq("db"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
            .as("n_leaks"))
        .select(lit(strategy).as("strategy"), col("n_pairs"),
          col("n_leaks"),
          (col("n_leaks").cast("double") / col("n_pairs").cast("double"))
            .as("leak_rate"))
      audit("doc_hash", "naive")
        .unionAll(audit("component_hash", "cluster"))
        .orderBy("strategy")
    }),

    // TXT7: repetition signals (Gopher §A.1.1-style filters, adapted
    // to this corpus's line-less word-soup text): the fraction of
    // tokens that are the single most frequent token, and the
    // fraction of 3-grams that are duplicates of an earlier 3-gram.
    // Raw doubles (pure division of counts) — no rounding, so the
    // hash compare is exact across engines.
    "txt7_repetition" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), toks.as("t"))
        .filter(size(col("t")) >= 3)
      val words = docs.select(col("doc_id"), explode(col("t")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("mx"), sum(col("c")).as("n"))
      val tri = docs.select(col("doc_id"),
        (size(col("t")) - 2).cast("long").as("ntri"),
        size(shingleCol(3)).cast("long").as("ndis"))
      words.join(tri, Seq("doc_id"))
        .select(col("doc_id"),
          col("n").as("n_tokens"),
          (col("mx").cast("double") / col("n")).as("top_word_frac"),
          (lit(1.0) - col("ndis").cast("double") / col("ntri"))
            .as("dup_trigram_frac"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // PIPE10: the DS21 closure chain + both temperature formulas,
    // decimal-pinned Z sums, r6'd q renders, one raw subtraction
    "pipe10_effective_mix" ->
      """WITH RECURSIVE
           docs AS (
             SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             FROM documents),
           sh AS (
             SELECT doc_id, unnest(list_distinct(list_transform(
                      generate_series(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             FROM docs WHERE len(t) >= 3),
           sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
             FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           pairs AS (
             SELECT da, db FROM inter
             JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
             WHERE CAST(i AS DOUBLE) / (x.sz + y.sz - i) >= 0.5),
           edges AS (SELECT da AS src, db AS dst FROM pairs
                     UNION SELECT db AS src, da AS dst FROM pairs),
           reach AS (
             SELECT doc_id AS id, doc_id AS r FROM documents
             UNION
             SELECT reach.id, e.dst FROM reach
             JOIN edges e ON reach.r = e.src),
           cc AS (SELECT id AS doc_id, min(r) AS canonical_id
                  FROM reach GROUP BY id),
           cs AS (SELECT canonical_id, count(*) AS cs
                  FROM cc GROUP BY 1),
           w AS (SELECT cc.doc_id,
                        round(CAST(1.0 AS DOUBLE) / cs.cs, 6) AS w
                 FROM cc JOIN cs USING (canonical_id)),
           eff AS (
             SELECT dd.source, CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(CAST(sum(CAST(w.w AS DECIMAL(24,10))) AS VARCHAR)
                         AS DOUBLE) AS n_effective
             FROM documents dd JOIN w ON w.doc_id = dd.doc_id
             GROUP BY 1),
           tot AS (
             SELECT CAST(CAST(sum(CAST(pow(CAST(n_docs AS DOUBLE),
                      CAST(0.7 AS DOUBLE)) AS DECIMAL(30,12))) AS VARCHAR)
                      AS DOUBLE) AS z_raw,
                    CAST(CAST(sum(CAST(pow(n_effective,
                      CAST(0.7 AS DOUBLE)) AS DECIMAL(30,12))) AS VARCHAR)
                      AS DOUBLE) AS z_eff
             FROM eff)
         SELECT e.source, e.n_docs, e.n_effective,
                round(pow(CAST(e.n_docs AS DOUBLE), CAST(0.7 AS DOUBLE))
                      / t.z_raw, 6) AS q_raw,
                round(pow(e.n_effective, CAST(0.7 AS DOUBLE))
                      / t.z_eff, 6) AS q_eff,
                round(pow(e.n_effective, CAST(0.7 AS DOUBLE))
                      / t.z_eff, 6) -
                round(pow(CAST(e.n_docs AS DOUBLE), CAST(0.7 AS DOUBLE))
                      / t.z_raw, 6) AS dup_shift
         FROM eff e, tot t ORDER BY e.source""",
    // DECON2: d3's banding + estimate from the signature dump, the
    // eval↔corpus crossing filter, then the exact shingle verify (the
    // d6 SQL) with the ≥ 0.5 threshold on the ROUNDED true Jaccard
    // (mirroring the engine's filter on the r6'd column)
    "decon2_fuzzy_overlap" ->
      s"""WITH ${Dedup.d3CandCtes},
           cross0 AS (
             SELECT da, db, est_jaccard FROM cand
             WHERE (da % 5 = 0) <> (db % 5 = 0)),
           cdocs AS (SELECT da AS doc_id FROM cross0
                     UNION SELECT db FROM cross0),
           docs AS (
             SELECT dd.doc_id,
                    string_split_regex(lower(trim(dd.text)), '\\s+') AS t
             FROM documents dd JOIN cdocs USING (doc_id)),
           shg AS (
             SELECT doc_id, unnest(list_distinct(list_transform(
                      generate_series(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             FROM docs WHERE len(t) >= 3),
           sizes AS (SELECT doc_id, count(*) AS sz FROM shg GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
             FROM shg a JOIN shg b
               ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           verified AS (
             SELECT c.da, c.db, c.est_jaccard,
                    round(CAST(coalesce(i.i, 0) AS DOUBLE) /
                          (x.sz + y.sz - coalesce(i.i, 0)), 6)
                      AS true_jaccard
             FROM cross0 c
             JOIN sizes x ON c.da = x.doc_id
             JOIN sizes y ON c.db = y.doc_id
             LEFT JOIN inter i ON i.da = c.da AND i.db = c.db)
         SELECT CASE WHEN da % 5 = 0 THEN db ELSE da END AS corpus_doc,
                CASE WHEN da % 5 = 0 THEN da ELSE db END AS eval_doc,
                est_jaccard, true_jaccard
         FROM verified WHERE true_jaccard >= CAST(0.5 AS DOUBLE)
         ORDER BY corpus_doc, eval_doc""",
    // PIPE8: one shared exhaustive-graph spine feeding the d25 AA
    // cells, the d26 degree/union cells, and the recursive closure —
    // the composed edge-audit export certified by one hash
    "pipe8_edge_audit" ->
      """WITH RECURSIVE
           docs AS (
             SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             FROM documents),
           sh AS (
             SELECT doc_id, unnest(list_distinct(list_transform(
                      generate_series(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             FROM docs WHERE len(t) >= 3),
           sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
             FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           pairs AS MATERIALIZED (
             SELECT da, db FROM inter
             JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
             WHERE CAST(i AS DOUBLE) / (x.sz + y.sz - i) >= 0.5),
           dedges AS (SELECT da AS src, db AS dst FROM pairs
                      UNION ALL SELECT db AS src, da AS dst FROM pairs),
           deg AS (SELECT src AS v, count(*) AS deg FROM dedges
                   GROUP BY 1),
           cn AS (
             SELECT p.da, p.db, count(*) AS common_cnt,
                    CAST(CAST(sum(CAST(round(
                        CAST(1 AS DOUBLE) / ln(CAST(dg.deg AS DOUBLE)), 6)
                      AS DECIMAL(24,10))) AS VARCHAR) AS DOUBLE) AS aa
             FROM pairs p
             JOIN dedges ea ON ea.src = p.da
             JOIN dedges eb ON eb.src = p.db AND eb.dst = ea.dst
             JOIN deg dg ON dg.v = ea.dst
             GROUP BY 1, 2),
           uedges AS (SELECT da AS src, db AS dst FROM pairs
                      UNION SELECT db AS src, da AS dst FROM pairs),
           reach AS (
             SELECT doc_id AS id, doc_id AS r FROM documents
             UNION
             SELECT reach.id, e.dst FROM reach JOIN uedges e
               ON reach.r = e.src),
           cc AS (SELECT id AS doc_id, min(r) AS component FROM reach
                  GROUP BY id)
         SELECT p.da, p.db, cc.component,
                CAST(da_deg.deg AS BIGINT) AS deg_a,
                CAST(db_deg.deg AS BIGINT) AS deg_b,
                CAST(coalesce(cn.common_cnt, 0) AS BIGINT) AS common_cnt,
                CAST(da_deg.deg + db_deg.deg - 2
                     - coalesce(cn.common_cnt, 0) AS BIGINT) AS union_cnt,
                round(coalesce(cn.aa, 0), 6) AS aa_score,
                CASE WHEN da_deg.deg + db_deg.deg - 2
                          - coalesce(cn.common_cnt, 0) = 0
                     THEN CAST(0 AS DOUBLE)
                     ELSE CAST(coalesce(cn.common_cnt, 0) AS DOUBLE) /
                          CAST(da_deg.deg + db_deg.deg - 2
                               - coalesce(cn.common_cnt, 0) AS DOUBLE)
                END AS nbr_jaccard,
                coalesce(cn.common_cnt, 0) = 0 AS is_bridge
         FROM pairs p
         LEFT JOIN cn USING (da, db)
         JOIN deg da_deg ON da_deg.v = p.da
         JOIN deg db_deg ON db_deg.v = p.db
         JOIN cc ON cc.doc_id = p.da
         ORDER BY da, db""",
    // PIPE9: the exhaustive graph + recursive closure spine, then the
    // DS1 md5 CASE applied to BOTH keys (doc id, component id) and
    // the two strategy rows aggregated — the component row's zero is
    // re-derived, not assumed
    "pipe9_split_contrast" ->
      """WITH RECURSIVE
           docs AS (
             SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             FROM documents),
           sh AS (
             SELECT doc_id, unnest(list_distinct(list_transform(
                      generate_series(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             FROM docs WHERE len(t) >= 3),
           sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
             FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           pairs AS MATERIALIZED (
             SELECT da, db FROM inter
             JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
             WHERE CAST(i AS DOUBLE) / (x.sz + y.sz - i) >= 0.5),
           uedges AS (SELECT da AS src, db AS dst FROM pairs
                      UNION SELECT db AS src, da AS dst FROM pairs),
           reach AS (
             SELECT doc_id AS id, doc_id AS r FROM documents
             UNION
             SELECT reach.id, e.dst FROM reach JOIN uedges e
               ON reach.r = e.src),
           cc AS (SELECT id AS doc_id, min(r) AS component FROM reach
                  GROUP BY id),
           sp AS (
             SELECT doc_id,
                    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                              < 'd'
                         THEN 'train' ELSE 'val' END AS naive,
                    CASE WHEN substring(md5(CAST(component AS VARCHAR)),
                                        1, 1) < 'd'
                         THEN 'train' ELSE 'val' END AS cluster
             FROM cc),
           a AS (
             SELECT 'doc_hash' AS strategy,
                    CAST(count(*) AS BIGINT) AS n_pairs,
                    CAST(sum(CASE WHEN sa.naive <> sb.naive
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_leaks
             FROM pairs p
             JOIN sp sa ON sa.doc_id = p.da
             JOIN sp sb ON sb.doc_id = p.db),
           b AS (
             SELECT 'component_hash' AS strategy,
                    CAST(count(*) AS BIGINT) AS n_pairs,
                    CAST(sum(CASE WHEN sa.cluster <> sb.cluster
                                  THEN 1 ELSE 0 END) AS BIGINT) AS n_leaks
             FROM pairs p
             JOIN sp sa ON sa.doc_id = p.da
             JOIN sp sb ON sb.doc_id = p.db)
         SELECT strategy, n_pairs, n_leaks,
                CAST(n_leaks AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                  AS leak_rate
         FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
         ORDER BY strategy""",
    // PIPE7: one shared exhaustive-graph spine feeding all four
    // replayed chains (recursive CC, 8+8 materialized peel, 3
    // materialized harmonic shells, keep-best window)
    "pipe7_graph_triage" -> {
      def peelCtes(lvl: Int, k: Int, seed: String): String =
        (1 to 8).map { r =>
          val prev = if (r == 1) seed else s"e${lvl}_${r - 1}"
          s"""n${lvl}_$r AS MATERIALIZED (
             SELECT v FROM (SELECT da AS v FROM $prev
                            UNION ALL SELECT db AS v FROM $prev)
             GROUP BY v HAVING count(*) >= $k),
           e${lvl}_$r AS MATERIALIZED (
             SELECT da, db FROM $prev
             WHERE da IN (SELECT v FROM n${lvl}_$r)
               AND db IN (SELECT v FROM n${lvl}_$r))"""
        }.mkString(",\n           ")
      s"""WITH RECURSIVE
           docs AS (
             SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
             FROM documents),
           sh0 AS (
             SELECT doc_id, unnest(list_distinct(list_transform(
                      generate_series(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             FROM docs WHERE len(t) >= 3),
           sizes AS (SELECT doc_id, count(*) AS sz FROM sh0 GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
             FROM sh0 a JOIN sh0 b ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           pairs AS MATERIALIZED (
             SELECT da, db FROM inter
             JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
             WHERE CAST(i AS DOUBLE) / (x.sz + y.sz - i) >= 0.5),
           edges AS (SELECT da AS src, db AS dst FROM pairs
                     UNION SELECT db AS src, da AS dst FROM pairs),
           reach AS (
             SELECT doc_id AS id, doc_id AS r FROM documents
             UNION
             SELECT reach.id, e.dst FROM reach JOIN edges e
               ON reach.r = e.src),
           cc AS MATERIALIZED (
             SELECT id AS doc_id, min(r) AS canonical_id FROM reach
             GROUP BY id),
           ${peelCtes(2, 2, "pairs")},
           ${peelCtes(3, 3, "e2_8")},
           r1 AS MATERIALIZED (
             SELECT DISTINCT v, u FROM (
               SELECT da AS v, db AS u FROM pairs
               UNION ALL SELECT db AS v, da AS u FROM pairs)),
           r2 AS MATERIALIZED (
             SELECT DISTINCT a.v, b.u FROM r1 a JOIN r1 b ON a.u = b.v
             WHERE b.u <> a.v
               AND NOT EXISTS (SELECT 1 FROM r1 x
                               WHERE x.v = a.v AND x.u = b.u)),
           r3 AS MATERIALIZED (
             SELECT DISTINCT a.v, b.u FROM r2 a JOIN r1 b ON a.u = b.v
             WHERE b.u <> a.v
               AND NOT EXISTS (SELECT 1 FROM r2 x
                               WHERE x.v = a.v AND x.u = b.u)
               AND NOT EXISTS (SELECT 1 FROM r1 y
                               WHERE y.v = a.v AND y.u = b.u)),
           c1 AS (SELECT v, CAST(count(*) AS BIGINT) AS n1
                  FROM r1 GROUP BY 1),
           c2 AS (SELECT v, CAST(count(*) AS BIGINT) AS n2
                  FROM r2 GROUP BY 1),
           c3 AS (SELECT v, CAST(count(*) AS BIGINT) AS n3
                  FROM r3 GROUP BY 1),
           harm AS (
             SELECT c1.v AS doc_id,
                    CAST(c1.n1 AS DOUBLE) +
                      CAST(coalesce(c2.n2, 0) AS DOUBLE) / 2 +
                      CAST(coalesce(c3.n3, 0) AS DOUBLE) / 3 AS harmonic
             FROM c1 LEFT JOIN c2 ON c1.v = c2.v
                     LEFT JOIN c3 ON c1.v = c3.v),
           keepr AS (
             SELECT cc.doc_id, cc.canonical_id, d.n_chars,
                    row_number() OVER (PARTITION BY cc.canonical_id
                      ORDER BY d.n_chars DESC, cc.doc_id) AS pick
             FROM cc JOIN documents d USING (doc_id))
         SELECT k.doc_id, k.canonical_id,
                CAST(CASE WHEN k.doc_id IN (SELECT v FROM n3_8) THEN 3
                          WHEN k.doc_id IN (SELECT v FROM n2_8) THEN 2
                          ELSE 1 END AS BIGINT) AS coreness,
                h.harmonic, k.pick = 1 AS keep, k.n_chars
         FROM keepr k JOIN harm h ON k.doc_id = h.doc_id
         ORDER BY k.doc_id"""
    },
    // the full composition replayed: d10_cc_corpus's exhaustive
    // J >= 0.5 graph + recursive closure, keep-best window, md5
    // split ladder, md5 interleave — one CTE chain, so the hash
    // match certifies the composed pipeline end to end
    "pipe6_dedup_mix" ->
      """WITH RECURSIVE
           docs AS (
             SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
             FROM documents),
           sh AS (
             SELECT doc_id, unnest(list_distinct(list_transform(
                      generate_series(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS sh
             FROM docs WHERE len(t) >= 3),
           sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
             FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           prs AS (
             SELECT da, db FROM inter
             JOIN sizes x ON da = x.doc_id JOIN sizes y ON db = y.doc_id
             WHERE CAST(i AS DOUBLE) / (x.sz + y.sz - i) >= 0.5),
           edges AS (SELECT da AS src, db AS dst FROM prs
                     UNION SELECT db AS src, da AS dst FROM prs),
           reach AS (
             SELECT doc_id AS id, doc_id AS r FROM documents
             UNION
             SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
           comp AS (
             SELECT id AS doc_id, min(r) AS canonical_id FROM reach
             GROUP BY id),
           kept AS (
             SELECT doc_id, lang, source FROM (
               SELECT c.doc_id, d.lang, d.source,
                      row_number() OVER (PARTITION BY c.canonical_id
                        ORDER BY d.n_chars DESC, c.doc_id) AS pick
               FROM comp c JOIN documents d ON c.doc_id = d.doc_id)
             WHERE pick = 1),
           keyed AS (
             SELECT doc_id, lang, source,
                    md5('pipe6:' || CAST(doc_id AS VARCHAR)) AS k
             FROM kept),
           split AS (
             SELECT doc_id, source,
                    row_number() OVER (PARTITION BY lang, source
                                       ORDER BY k, doc_id) AS rnk,
                    count(*) OVER (PARTITION BY lang, source) AS n
             FROM keyed),
           train AS (
             SELECT doc_id, source,
                    md5('pipe6i:' || CAST(doc_id AS VARCHAR)) AS k
             FROM split WHERE rnk <= (n * 8) // 10),
           ranked AS (
             SELECT doc_id, source,
                    row_number() OVER (PARTITION BY source
                                       ORDER BY k, doc_id) AS rank
             FROM train),
           srcs AS (
             SELECT source, count(*) AS n_src,
                    row_number() OVER (ORDER BY source) AS source_idx
             FROM ranked GROUP BY 1),
           meta AS (
             SELECT source, source_idx,
                    min(n_src) OVER () AS mn,
                    count(*) OVER () AS n_sources
             FROM srcs)
         SELECT r.doc_id, r.source, CAST(r.rank AS BIGINT) AS rank,
                CAST((r.rank - 1) * m.n_sources + m.source_idx - 1
                     AS BIGINT) AS global_pos
         FROM ranked r JOIN meta m ON r.source = m.source
         WHERE r.rank <= m.mn
         ORDER BY global_pos""",
    // identical 1e-12 term grid + decimal-pinned sums, one exp/division
    "pipe5_mixture_diversity" ->
      """WITH ls AS (
           SELECT lang, source, count(*) AS c
           FROM documents GROUP BY 1, 2),
         lt AS (
           SELECT lang, CAST(sum(c) AS BIGINT) AS n,
                  CAST(count(*) AS BIGINT) AS n_sources
           FROM ls GROUP BY 1),
         t AS (
           SELECT ls.lang, lt.n, lt.n_sources,
                  CAST(ls.c AS DOUBLE) / lt.n AS p
           FROM ls JOIN lt ON ls.lang = lt.lang),
         g AS (
           SELECT lang, max(n) AS n_docs, max(n_sources) AS n_sources,
                  CAST(CAST(sum(CAST(round(-p * ln(p), 12)
                       AS DECIMAL(24,14))) AS VARCHAR) AS DOUBLE) AS h,
                  CAST(CAST(sum(CAST(round(p * p, 12)
                       AS DECIMAL(24,14))) AS VARCHAR) AS DOUBLE)
                    AS simpson
           FROM t GROUP BY 1)
         SELECT lang, n_docs, n_sources, round(h, 6) AS entropy,
                round(exp(h), 6) AS effective_sources,
                round(simpson, 6) AS simpson,
                round(1.0 / simpson, 6) AS inv_simpson
         FROM g ORDER BY lang""",
    "pipe4_corpus_datasheet" ->
      """WITH base AS (
           SELECT doc_id, lang,
                  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                    AS h,
                  CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                       AS BIGINT) AS n_tok,
                  CAST(length(text) AS BIGINT) AS n_chars
           FROM documents),
         da AS (
           SELECT count(*) AS n_docs,
                  count(DISTINCT h) AS n_unique,
                  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                  CAST(CAST(sum(CAST(n_tok AS DECIMAL(30,12))) AS VARCHAR)
                       AS DOUBLE) / count(*) AS mean_tokens,
                  CAST(CAST(sum(CAST(n_chars AS DECIMAL(30,12))) AS VARCHAR)
                       AS DOUBLE) / count(*) AS mean_chars,
                  count(DISTINCT lang) AS n_langs
           FROM base),
         lt AS (
           SELECT lang AS top_lang, n AS top_n
           FROM (SELECT lang, count(*) AS n FROM base GROUP BY 1)
           ORDER BY n DESC, lang DESC LIMIT 1),
         q AS (
           SELECT doc_id,
                  string_split_regex(lower(trim(text)), '\s+') AS toks,
                  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                    AS punct,
                  CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                    AS digit,
                  CAST(length(text) AS DOUBLE) AS len
           FROM documents),
         qs AS (
           SELECT round(CAST(0.5 AS DOUBLE) *
                    (CAST(len(list_filter(toks, x -> x IN
                       ('the','a','of','and','to','in','is','on')))
                      AS DOUBLE) / len(toks)) +
                  CAST(0.3 AS DOUBLE) * (CAST(1 AS DOUBLE) - punct / len) +
                  CAST(0.2 AS DOUBLE) * (CAST(1 AS DOUBLE) - digit / len),
                  6) AS quality
           FROM q),
         mq AS (
           SELECT CAST(CAST(sum(CAST(quality AS DECIMAL(30,12)))
                       AS VARCHAR) AS DOUBLE) / count(*) AS mean_quality
           FROM qs),
         v AS (
           SELECT count(DISTINCT w) AS vocab_size
           FROM (SELECT unnest(string_split_regex(lower(trim(text)),
                        '\s+')) AS w FROM documents))
         SELECT n_docs, n_unique,
                round(CAST(n_docs - n_unique AS DOUBLE) / n_docs, 6)
                  AS dup_rate,
                total_tokens, round(mean_tokens, 6) AS mean_tokens,
                round(mean_chars, 6) AS mean_chars,
                round(mean_quality, 6) AS mean_quality,
                n_langs, top_lang,
                round(CAST(top_n AS DOUBLE) / n_docs, 6)
                  AS top_lang_share,
                vocab_size
         FROM da, lt, mq, v""",
    "decon1_ngram_overlap" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(t) - 4),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                         t[i+3] || ' ' || t[i+4]))) AS sh
           FROM docs WHERE len(t) >= 5),
         ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
         SELECT s.doc_id, count(DISTINCT s.sh) AS n_shared
         FROM sh s JOIN ev USING (sh)
         WHERE s.doc_id % 97 <> 0
         GROUP BY 1 ORDER BY 1""",
    "pipe1_corpus_filter" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         d1 AS (SELECT * FROM docs),
         toks AS (SELECT doc_id, unnest(t) AS w FROM d1),
         wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
         tw AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(c * length(w)) AS BIGINT) AS chars
                FROM wc GROUP BY 1),
         tg AS (SELECT doc_id,
                       CAST(greatest(len(t) - 2, 0) AS BIGINT) AS ntri,
                       CAST(CASE WHEN len(t) >= 3 THEN
                         len(list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                         ELSE 0 END AS BIGINT) AS ndis
                FROM d1),
         sig AS (
           SELECT doc_id, n,
                  CAST(chars AS DOUBLE) / n AS mean_len,
                  CAST(mx AS DOUBLE) / n AS top_frac,
                  CASE WHEN ntri > 0
                       THEN 1.0 - CAST(ndis AS DOUBLE) / ntri
                       ELSE 0.0 END AS dup_frac
           FROM tw JOIN tg USING (doc_id))
         SELECT doc_id, n AS n_tokens, mean_len, top_frac, dup_frac,
                CASE WHEN n < 10 THEN 'too_short'
                     WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 'word_length'
                     WHEN top_frac > 0.2 THEN 'top_word'
                     WHEN dup_frac > 0.2 THEN 'dup_trigram'
                     ELSE 'kept' END AS verdict
         FROM sig ORDER BY doc_id""",
    "pipe1_filter_funnel" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         d1 AS (SELECT * FROM docs),
         toks AS (SELECT doc_id, unnest(t) AS w FROM d1),
         wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
         tw AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(c * length(w)) AS BIGINT) AS chars
                FROM wc GROUP BY 1),
         tg AS (SELECT doc_id,
                       CAST(greatest(len(t) - 2, 0) AS BIGINT) AS ntri,
                       CAST(CASE WHEN len(t) >= 3 THEN
                         len(list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                         ELSE 0 END AS BIGINT) AS ndis
                FROM d1),
         sig AS (
           SELECT doc_id, n,
                  CAST(chars AS DOUBLE) / n AS mean_len,
                  CAST(mx AS DOUBLE) / n AS top_frac,
                  CASE WHEN ntri > 0
                       THEN 1.0 - CAST(ndis AS DOUBLE) / ntri
                       ELSE 0.0 END AS dup_frac
           FROM tw JOIN tg USING (doc_id)),
         verdicts AS (
           SELECT CASE WHEN n < 10 THEN 'too_short'
                       WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 'word_length'
                       WHEN top_frac > 0.2 THEN 'top_word'
                       WHEN dup_frac > 0.2 THEN 'dup_trigram'
                       ELSE 'kept' END AS verdict
           FROM sig)
         SELECT verdict, count(*) AS n_docs
         FROM verdicts GROUP BY 1 ORDER BY 1""",
    "pipe2_quantile_cut" ->
      """WITH scored AS (
           SELECT doc_id,
                  CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    t -> t IN ('the','a','of','and','to','in','is','on')))
                    AS DOUBLE)
                  / len(string_split_regex(lower(trim(text)), '\s+'))
                    AS score
           FROM documents),
         thr AS (SELECT quantile_cont(score, 0.1) AS p10 FROM scored)
         SELECT doc_id, score, p10
         FROM scored, thr WHERE score >= p10 ORDER BY doc_id""",
    // the standalone stages' oracle CTEs composed into the funnel
    "pipe3_assembly_funnel" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         hashed AS (
           SELECT doc_id,
                  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
           FROM documents),
         canon AS (
           SELECT doc_id,
                  row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
                    AS is_canonical
           FROM hashed),
         toks AS (SELECT doc_id, unnest(t) AS w FROM docs),
         wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
         tw AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(c * length(w)) AS BIGINT) AS chars
                FROM wc GROUP BY 1),
         tg AS (SELECT doc_id,
                       CAST(greatest(len(t) - 2, 0) AS BIGINT) AS ntri,
                       CAST(CASE WHEN len(t) >= 3 THEN
                         len(list_distinct(list_transform(
                           generate_series(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                         ELSE 0 END AS BIGINT) AS ndis
                FROM docs),
         sig AS (
           SELECT doc_id, n,
                  CAST(chars AS DOUBLE) / n AS mean_len,
                  CAST(mx AS DOUBLE) / n AS top_frac,
                  CASE WHEN ntri > 0
                       THEN 1.0 - CAST(ndis AS DOUBLE) / ntri
                       ELSE 0.0 END AS dup_frac
           FROM tw JOIN tg USING (doc_id)),
         verd AS (
           SELECT doc_id,
                  (CASE WHEN n < 10 THEN 'too_short'
                        WHEN mean_len < 3.0 OR mean_len > 10.0
                          THEN 'word_length'
                        WHEN top_frac > 0.2 THEN 'top_word'
                        WHEN dup_frac > 0.2 THEN 'dup_trigram'
                        ELSE 'kept' END) = 'kept' AS q
           FROM sig),
         sh AS (
           SELECT doc_id, unnest(list_distinct(list_transform(
                    generate_series(1, len(t) - 4),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                         t[i+3] || ' ' || t[i+4]))) AS sh
           FROM docs WHERE len(t) >= 5),
         ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         cont AS (
           SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
           WHERE s.doc_id % 97 <> 0),
         ls AS (
           SELECT d.doc_id,
                  CASE WHEN NOT c.is_canonical THEN 0
                       WHEN NOT v.q THEN 1
                       WHEN d.doc_id % 97 = 0
                            OR cont.doc_id IS NOT NULL THEN 2
                       WHEN NOT (substring(md5(CAST(d.doc_id AS VARCHAR)),
                                 1, 1) < 'd') THEN 3
                       ELSE 4 END AS last_stage
           FROM documents d
           JOIN canon c USING (doc_id)
           JOIN verd v USING (doc_id)
           LEFT JOIN cont ON d.doc_id = cont.doc_id),
         tot AS (SELECT count(*) AS n_total FROM ls),
         spine AS (
           SELECT * FROM (VALUES (0, '1_ingest'), (1, '2_exact_dedup'),
             (2, '3_quality'), (3, '4_decontamination'),
             (4, '5_train_split')) AS v(stage_id, stage)),
         f AS (
           SELECT stage_id, stage,
                  (SELECT count(*) FROM ls WHERE last_stage >= stage_id)
                    AS n_docs
           FROM spine)
         SELECT CAST(stage_id AS BIGINT) AS stage_id, stage,
                CAST(n_docs AS BIGINT) AS n_docs,
                CAST(n_docs AS DOUBLE) / n_total AS frac
         FROM f, tot ORDER BY stage_id""",
    "txt7_repetition" ->
      """WITH docs AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
           FROM documents),
         d3 AS (SELECT * FROM docs WHERE len(t) >= 3),
         toks AS (SELECT doc_id, unnest(t) AS w FROM d3),
         wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
         tw AS (SELECT doc_id, max(c) AS mx, CAST(sum(c) AS BIGINT) AS n
                FROM wc GROUP BY 1),
         tg AS (SELECT doc_id, CAST(len(t) - 2 AS BIGINT) AS ntri,
                       CAST(len(list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
                         AS BIGINT) AS ndis
                FROM d3)
         SELECT doc_id, n AS n_tokens,
                CAST(mx AS DOUBLE) / n AS top_word_frac,
                1.0 - CAST(ndis AS DOUBLE) / ntri AS dup_trigram_frac
         FROM tw JOIN tg USING (doc_id)
         ORDER BY doc_id"""
  )
}
