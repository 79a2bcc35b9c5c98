package graft.operators

/** Materialized-intermediate dump paths (the D3SigDump pattern: a
  * query writes its non-SQL-expressible seed to /tmp parquet and the
  * DuckDB oracle replays everything downstream of it).
  *
  * Round-14 hardening: every dump path is keyed by the sf-dir
  * basename. The driver session interleaves the sf0.01 correctness
  * pass with the sf0.1 bench (which even re-runs "suspect" entries),
  * so a FIXED global path lets one execution overwrite the bytes a
  * pending oracle compare still needs — the round-13 `f7_vader_rules`
  * hash-FAIL was exactly that race. With the sf tag in the path,
  * executions at different scale factors can never clobber each
  * other; the write and its oracle read always agree because they
  * share the tag.
  *
  * Write side: queries receive the sf dir, so [[path]] is pure.
  * Oracle side: the `oracles` maps are static `val`s with no sf dir
  * in scope, so they embed [[SfTag]] and `graft.Verify` substitutes
  * the real tag (basename of its sfDir arg) when it dumps
  * oracle_sql.json — after the queries have run and written the
  * matching dumps.
  */
object Dumps {

  /** Placeholder embedded in oracle SQL; Verify replaces it with
    * [[tag]](sfDir) before writing oracle_sql.json. */
  val SfTag = "{GRAFT_SFTAG}"

  /** The sf-dir key: its basename (e.g. "sf0.01"). */
  def tag(d: String): String = new java.io.File(d).getName

  /** Concrete dump path for a query executing against sf dir `d`. */
  def path(name: String, d: String): String =
    s"/tmp/graft_${name}_${tag(d)}.parquet"

  /** Oracle-side path template for the same dump (tag unresolved). */
  def oraclePath(name: String): String =
    s"/tmp/graft_${name}_$SfTag.parquet"

  /** Write a dump ONCE per (session, path) — the Backtest.T7InDump
    * convention generalized (round 14). Every dump is deterministic
    * bytes-for-bytes given the (immutable) sf dir, but a REWRITE per
    * consuming query (a) re-runs the whole upstream job at every
    * DataFrame construction — D8's token-explode bit-sum corpus pass
    * ran nine times per bench sweep (3 queries × 3 reps) for
    * identical bytes — and (b) leaves a pending oracle read exposed
    * to a concurrent rewrite of the same path (the clobbered-
    * pending-read class the sf-keyed paths narrowed; write-once
    * closes it within a scale factor). Callers pass the producing
    * plan lazily; the first caller pays the write, everyone reads the
    * same bytes back. Keyed (session, path): a new session (fresh
    * /tmp contract) rewrites, tests with planted dirs under one
    * session key by dir via the path's sf tag.
    */
  private val written = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), Boolean]

  def writeOnce(s: org.apache.spark.sql.SparkSession, p: String)(
      write: => Unit): Unit = synchronized {
    written.getOrElseUpdate((s, p), { write; true })
  }

  /** Test hook: forget every (session, path) so the next writeOnce
    * re-executes (suites that rewrite planted corpora in place). */
  private[graft] def resetWriteOnce(): Unit = synchronized {
    written.clear()
  }
}
