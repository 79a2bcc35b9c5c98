package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memoization of an expensive derived table that
  * several queries consume (the MinHash signature table feeding D3 and
  * D6, the 20-cell lag grid feeding all three lag_grid selections).
  * The 100 TB analogue is persisting the table after the one expensive
  * corpus pass and running every downstream query against it.
  *
  * Mechanics: `persist(MEMORY_AND_DISK)` + an eager `count()` — the
  * build cost is paid (and measurable) at the first `apply`, lineage
  * is KEPT so blocks lost with an executor are recomputed instead of
  * failing the query (the reason this is persist, not
  * `localCheckpoint`), and `invalidate` gives a real release hook that
  * unpins the blocks.
  *
  * Lifecycle contract: an entry is valid for as long as the data under
  * its `dir` is immutable — true for the harness's read-only sf
  * directories, and the usual contract for immutable lake data. A
  * caller that rewrites data under a cached path in-session MUST call
  * [[invalidate]] first; the cache keys on (session, path) and cannot
  * see content changes behind the path.
  */
final class MaterializedTable(build: (SparkSession, String) => DataFrame) {

  private val cache = TrieMap.empty[(SparkSession, String), DataFrame]

  /** The materialized table for (session, dir), building it on first
    * use. The build is serialized under a lock: TrieMap's
    * getOrElseUpdate may run the supplier in two racing threads and
    * keep one result — the loser's persisted blocks would stay pinned
    * for the session with no handle to unpersist them. Builds are rare
    * (once per (session, dir)) and concurrent first use is exactly the
    * advertised sharing scenario, so a coarse lock is the right cost. */
  def apply(s: SparkSession, d: String): DataFrame = synchronized {
    cache.getOrElseUpdate((s, d), {
      val m = build(s, d).persist(StorageLevel.MEMORY_AND_DISK)
      m.count()
      m
    })
  }

  /** Drop the (session, dir) entry and unpin its blocks. Next `apply`
    * rebuilds from the current data under `dir`. */
  def invalidate(s: SparkSession, d: String): Unit =
    cache.remove((s, d)).foreach(_.unpersist(blocking = true))

  /** Drop every entry (e.g. between test suites sharing one session). */
  def invalidateAll(): Unit =
    cache.keys.foreach { case (s, d) => invalidate(s, d) }
}
