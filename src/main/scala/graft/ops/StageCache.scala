package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of materialized pipeline stages shared by
  * several registry queries — the generalization of the near-dup
  * band-candidate pinning in [[DedupOps]] (SURVEY.md "pipeline stage
  * sharing"). A stage is computed once per (session, dataset-version,
  * name) and pinned by its builder via EAGER `localCheckpoint`: RDD
  * checkpoint blocks are not CacheManager entries, so a harness
  * `spark.catalog.clearCache()` between queries leaves them alive, and
  * the consumer plans root at the materialized blocks (no lineage
  * growth, no recompute races between sibling subtrees of one action).
  *
  * Invalidation: the cache key carries a dataset VERSION — the max
  * last-modified timestamp over the dataset directory tree — so a
  * regenerated fixture under the same path can never serve stale pinned
  * candidates; the stale entry is unpersisted and evicted on the first
  * access under the new version. At cluster scale the version is a
  * catalog snapshot/table version and the boundary a temp parquet/Delta
  * table (the `DedupOps.incrementalDedup` store pattern); in-session
  * block pinning plus mtime versioning is the single-app equivalent.
  * Only SMALL derived tables belong here — candidate/edge/score tables
  * bounded well below the corpus — never a corpus-sized intermediate.
  *
  * Oracles of consuming queries stay standalone (full CTE chain from the
  * raw tables), so the correctness gate still verifies each query's
  * whole derivation.
  */
object StageCache {

  private final case class Key(
      s: SparkSession, d: String, version: Long, stage: String)

  /** At-most-once holder whose computation runs OUTSIDE any map
    * operation. Running the builder inside `computeIfAbsent` is a trap:
    * stage builders legitimately depend on OTHER stages (knn_edges →
    * ann_ivf_assign), and a nested `computeIfAbsent` on the same
    * ConcurrentHashMap throws "Recursive update" whenever the two keys
    * happen to share a hash bin — a dataset-dependent time bomb (it
    * fired at sf0.1 but not sf0.01). The map now stores cheap holders;
    * `force` synchronizes on the holder itself, so nested stage
    * dependencies lock DIFFERENT holders (the dependency graph is
    * acyclic — no deadlock) and the map is never re-entered mid-compute. */
  private final class Holder(compute: () => DataFrame) {
    private var df: DataFrame = _
    def force: DataFrame = synchronized {
      if (df == null) df = compute()
      df
    }
    /** The frame if already computed — eviction must never FORCE a
      * never-used stage just to unpersist it. */
    def peek: Option[DataFrame] = synchronized(Option(df))
  }

  private val cache = new ConcurrentHashMap[Key, Holder]()

  /** Dataset version = order-independent fold of (name, mtime, size)
    * over the directory tree. One shallow-recursive walk of ~10 table
    * dirs — metadata-only, no data read. NOT memoized: detecting
    * regeneration is the whole point. Folding sizes and names (not just
    * max mtime) hardens against coarse 1s-mtime filesystems where a
    * same-second regeneration would otherwise serve a stale pin; a null
    * `listFiles` (transient I/O / permission failure) degrades to an
    * empty child list instead of an NPE — worst case a spurious
    * recompute, never a crash or a stale serve. */
  def version(d: String): Long = {
    def entry(f: java.io.File): Long =
      scala.util.hashing.MurmurHash3.stringHash(f.getName).toLong ^
        java.lang.Long.rotateLeft(f.lastModified, 17) ^
        java.lang.Long.rotateLeft(f.length, 41)
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .foldLeft(entry(f))((acc, c) => acc ^ walk(c))
      else entry(f)
    val root = new java.io.File(d)
    if (root.exists()) walk(root) else 0L
  }

  /** The stage pinned for (session, dataset, current dataset version);
    * `compute` runs at most once per key and MUST return an already
    * materialized frame (eager `localCheckpoint` / persisted). Stale
    * entries for prior versions of the same (session, dataset, stage)
    * are unpersisted and evicted. */
  def getOrCompute(s: SparkSession, d: String, stage: String)
      (compute: => DataFrame): DataFrame = {
    val v = version(d)
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      if (k.s == s && k.d == d && k.stage == stage && k.version != v) {
        e.getValue.peek.foreach { df =>
          try df.unpersist(blocking = false)
          catch { case _: Exception => () }
        }
        it.remove()
      }
    }
    cache.computeIfAbsent(Key(s, d, v, stage),
      _ => new Holder(() => compute)).force
  }

  /** Drop ONE pinned stage for a dataset (any version) — the bench
    * re-derivation hook: stage units are timed min-of-N like queries,
    * which needs the pin evicted between iterations while sibling
    * stages (a stage's own upstream pins) stay live. */
  def clear(d: String, stage: String): Boolean = {
    var evicted = false
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.d == d && e.getKey.stage == stage) {
        e.getValue.peek.foreach { df =>
          try df.unpersist(blocking = false)
          catch { case _: Exception => () }
        }
        it.remove()
        evicted = true
      }
    }
    evicted
  }

  /** Drop every pinned stage (tests / sessions that mutate the
    * underlying tables between runs). */
  def clearAll(): Unit = {
    cache.forEach((_, h) => h.peek.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Exception => () }
    })
    cache.clear()
  }
}
