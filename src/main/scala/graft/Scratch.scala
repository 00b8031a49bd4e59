package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped scratch directories for queries that materialize
  * intermediate layouts (streaming landings/checkpoints, lake-table
  * fixtures, shard exports).
  *
  * The path is keyed by BOTH the sfDir hash and the Spark
  * application id (ADVICE r7): two concurrent sessions benching the
  * same sfDir previously shared a scratch root keyed only by
  * `sfDir.hashCode` and would `rm` each other's checkpoint/landing
  * dirs mid-query. The applicationId component gives each session its
  * own namespace — the same per-writer UUID discipline
  * [[graft.lake.Lake]] applies to data subdirs. Roots live on the
  * session tmpfs when available (same policy as [[LocalDirs]]), so
  * they vanish with the host's tmpfs rather than accreting on disk.
  */
object Scratch {

  def root: String =
    LocalDirs.tmpfs.getOrElse(System.getProperty("java.io.tmpdir"))

  /** `<root>/graft-<kind>-<appId>-<sfHash>` — stable within a session
    * (memoizable), disjoint across sessions and across SFs. */
  def dir(spark: SparkSession, kind: String, sfDir: String): java.io.File =
    new java.io.File(root,
      s"graft-$kind-${spark.sparkContext.applicationId}-" +
        java.lang.Integer.toHexString(sfDir.hashCode))

  /** Recursive delete (no symlink traversal concerns on the private
    * scratch namespace). */
  def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(); ()
  }

  /** One lazily-built memo slot: the expensive build runs inside the
    * slot's own lock, NOT inside `ConcurrentHashMap.computeIfAbsent`
    * — concurrent first calls whose keys collide on a map bin never
    * serialize behind each other's build, and a re-entrant build
    * (one fixture consuming another through the same map) cannot
    * deadlock on the bin lock. Same discipline as the x2 pair-set
    * memos ([[graft.ext.Dedup]]); shared here so every fixture family
    * (lake history, BPE training, stream source layouts) uses one
    * audited implementation. */
  final class Slot[T <: AnyRef](build: () => T) {
    @volatile private var cached: T = _
    def get: T = {
      val c = cached
      if (c != null) c
      else synchronized { if (cached == null) cached = build(); cached }
    }
    /** The value if already built — never triggers the build
      * (invalidation must not run the pipeline it is discarding). */
    def peek: Option[T] = Option(cached)
  }

  /** Generic landed-fixture memo: one [[Slot]] per (session, sfDir,
    * input fingerprint) — the disclosed-memo policy every shared
    * fixture family follows (BASELINE.md). A stale-fingerprint entry
    * (the testdata under an already-memoized path was rewritten) is
    * evicted WITH its teardown before the fresh build, and
    * [[FixtureMemo.invalidate]] is the single switch Bench's
    * cold-accounting pass flips: steady-state timings price the
    * consumer of the landed fixture, `cold_queries` re-prices the
    * full lifecycle. Factored in round 13 so the five write-lifecycle
    * queries (VERDICT r12 #1) share one audited implementation with
    * the lake-history/stat-table memos instead of a sixth copy of the
    * eviction dance. */
  final class FixtureMemo[T <: AnyRef](input: String => String,
      teardown: T => Unit) {
    private val m = new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String, String), Slot[T]]()
    def get(spark: SparkSession, sfDir: String)(build: () => T): T = {
      val fp = fingerprint(input(sfDir))
      import scala.jdk.CollectionConverters._
      m.keySet.asScala
        .filter(k => (k._1 eq spark) && k._2 == sfDir && k._3 != fp)
        .foreach(k => Option(m.remove(k)).foreach(_.peek.foreach(teardown)))
      m.computeIfAbsent((spark, sfDir, fp), _ => new Slot(build)).get
    }
    def invalidate(): Unit = {
      import scala.jdk.CollectionConverters._
      m.values.asScala.foreach(_.peek.foreach(teardown))
      m.clear()
    }
  }

  /** Cheap content fingerprint of an asset directory/file (name,
    * length, mtime of every file) — the memo-key component that makes
    * session-scoped fixtures self-invalidate when the data under an
    * already-memoized path is rewritten. Same device as the x2
    * pair-set memos ([[graft.ext.Dedup]]). */
  def fingerprint(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    val root = new java.io.File(path)
    if (!root.exists()) "absent"
    else walk(root).map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString(",")
  }
}
