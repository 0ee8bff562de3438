package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once parquet staging for derived indexes that several queries
  * share (shingle index, MinHash signatures).
  *
  * `QueryMemo` keeps such frames persisted *within* a session, but the
  * bench isolates queries with `spark.catalog.clearCache()` — each
  * dedup query then re-derives the interpreted higher-order-function
  * chain from scratch (4× for the signature pipeline). Staging is the
  * production answer at any scale: compute the index once per input
  * dataset, write it to columnar storage, and let every consumer scan
  * it back (at 100 TB that's a one-pass job writing to the object
  * store, after which dedup/clustering stages read a compact
  * hash-partitionable table instead of re-tokenizing the corpus).
  *
  * Layout: `{graft.stage.dir}/{md5(input-dir)[0..11]}/{name}` where
  * `name` embeds a version + constants fingerprint — a stale stage
  * from an older code version or different MinHash constants can never
  * be read back as current. Set `graft.stage.dir=off` to fall back to
  * the in-session QueryMemo path (oracle runs exercise both; results
  * are identical because the staged rows ARE the memoized rows).
  */
object StagedIndex {

  /** Per-path construction locks (bench and verify are sequential;
    * this guards ad-hoc concurrent sessions in one JVM). SCOPE: one
    * JVM only — two independent DRIVERS sharing a stage root are not
    * arbitrated here. That is safe-by-layout, not by locking: writes
    * go through parquet overwrite + marker files, `_COMPLETE` is
    * written last, and a loser's half-written dir is simply rebuilt
    * (never read — readers require `_COMPLETE` + the `_FILES`
    * inventory). Multi-driver deployments that want build-once
    * semantics should front the stage root with their own
    * coordination (the usual object-store job-commit pattern);
    * correctness does not depend on it.
    */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Content tokens memoized per (session, input set). Un-memoized,
    * EVERY stage access re-listed its input recursively — with 167
    * queries × several staged references each, thousands of
    * driver-side listings per suite, and on an object store at 100 TB
    * each listing is O(files) and billed. Within one session an input
    * snapshot is treated as immutable (exactly the bench/verify
    * contract, and the object-store layout discipline: a new snapshot
    * is a new path, not an in-place rewrite); after an in-place
    * rewrite call [[refreshTokens]]. A NEW session always re-lists,
    * so the cross-session staleness guarantee — a stale stage can
    * never serve a new input — is unchanged.
    */
  private val tokenCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  /** Drop every memoized content token: the next stage access
    * re-lists its inputs. For sessions that rewrite an input path
    * in place (tests; ad-hoc exploration). Also drops TextQueries'
    * BPE frame memo — it caches localCheckpointed frames derived from
    * the pre-rewrite input, and without the clear an orStage miss
    * under the NEW token would stage those stale frames as fresh.
    */
  def refreshTokens(): Unit = {
    tokenCache.clear()
    intactCache.clear()
    TextQueries.clearBpeMemo()
    // same staleness class for the derived-geometry corpus counts:
    // lsh.planes / kmeans.cells (and the plane/cell-suffixed stage
    // names) must re-derive after an in-place embeddings rewrite
    SimilarityQueries.clearEmbCountMemo()
  }

  /** Integrity verdicts memoized per session — whole-chain verdicts
    * under `c:{head}` keys, per-member verdicts under `m:{dir}` keys
    * (distinct key spaces: a head's own member verdict is not its
    * chain verdict). The tokenCache discipline: within a session,
    * stage dirs are immutable (a mid-session scratch cleanup is the
    * refreshTokens case), and a NEW session always re-checks, so the
    * cross-session staleness guarantee holds for integrity verdicts
    * too. A verified head costs one map lookup and zero FS calls on
    * later accesses; member keying lets the K heads built over a
    * session share their common ancestors' verdicts.
    */
  private val intactCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), java.lang.Boolean]()

  private def contentToken(s: SparkSession, inputs: Seq[String]): String = {
    // evict tokens of stopped sessions first (mirrors bpeMemo): a
    // ConcurrentHashMap key holds its SparkSession strongly, so
    // without this a long-lived JVM cycling sessions would retain
    // every stopped context for its lifetime
    val it = tokenCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    tokenCache.computeIfAbsent((s, inputs.sorted.mkString("|")),
      _ => listedToken(s, inputs))
  }

  /** Cheap input-content token: (name, length, mtime) of every file
    * under each input path. If the input dataset is rewritten — even
    * byte-identically — the token changes and the index restages.
    * One driver-side FS listing per input per session (memoized
    * above), no data read.
    */
  private def listedToken(s: SparkSession, inputs: Seq[String]): String = {
    val conf = s.sparkContext.hadoopConfiguration
    val parts = inputs.sorted.flatMap { in =>
      val p = new org.apache.hadoop.fs.Path(in)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq(s"$in:absent")
      else visibleFiles(fs, p)
        .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
        .sorted
    }
    md5hex(parts.mkString("|")).take(12)
  }

  /** Recursive file listing restricted to what Spark's own reader
    * sees: every path segment below `root` must be non-hidden (no
    * leading `_` or `.`). One shared traversal for the content token
    * AND the append manifest — if they disagreed, a marker rewrite or
    * a crashed write's `_temporary/.../part-*.parquet` (visible LEAF
    * name, hidden parent) would either force a pointless full restage
    * or, worse, be staged as a ghost delta the raw input never
    * returns.
    */
  private def visibleFiles(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path)
      : Seq[org.apache.hadoop.fs.LocatedFileStatus] = {
    val prefix = fs.makeQualified(root).toString
    val it = fs.listFiles(root, true)
    val b = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toString.stripPrefix(prefix).stripPrefix("/")
      if (rel.split("/").forall(g => !g.startsWith("_") && !g.startsWith(".")))
        b += f
    }
    b.result()
  }

  /** Names of the completed (_SUCCESS-marked) staged indexes for this
    * input across all content tokens — what the bench reports next to
    * `stage_build_sec` so the artifact states WHICH derivations the
    * per-query timings exclude. Driver-side FS listing only.
    */
  def stagedNames(s: SparkSession, sfDir: String): Seq[String] = {
    val root = s.conf.get("graft.stage.dir",
      sys.props("java.io.tmpdir") + "/graft-stage")
    if (root == "off") Seq.empty
    else {
      val base = new org.apache.hadoop.fs.Path(s"$root/${md5hex(sfDir).take(12)}")
      val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(base)) Seq.empty
      else
        fs.listStatus(base).filter(_.isDirectory).toSeq
          .flatMap(tok => fs.listStatus(tok.getPath).filter(_.isDirectory))
          .filter(d => fs.exists(
            new org.apache.hadoop.fs.Path(d.getPath, "_SUCCESS")))
          .map(_.getPath.getName).distinct.sorted
    }
  }

  /** Incremental variant of [[orStage]] for PER-ROW artifacts (each
    * output row derives from exactly one input row — content hashes,
    * shingle sets, signatures, quantized vectors): when the input
    * path GROWS append-only (every previously-listed file unchanged,
    * new files added — the object-store ingest pattern: a new crawl
    * lands as new part files), only the NEW files are passed to
    * `build`, and the delta chains onto the existing stage via a
    * `_BASE` pointer; the reader unions the chain. At 100 TB this is
    * the difference between re-deriving the whole corpus index per
    * snapshot and paying O(delta) per ingest. A rewritten or shrunk
    * input falls back to a full rebuild (a fresh chain root).
    *
    * REQUIREMENT on `build`: it must be row-wise in the input (build
    * over a file subset ∪ build over the rest == build over all) —
    * aggregations across input rows that span files would be wrong
    * here; those stay on [[orStage]].
    *
    * Layout per content token: `<dir>/_MANIFEST` (the file listing
    * this stage covers), optional `<dir>/_BASE` (absolute path of the
    * previous chain link), parquet part files (the delta), and
    * `<dir>/_COMPLETE` written LAST (readers require it — parquet's
    * own _SUCCESS only marks the delta write, not the metadata).
    *
    * Chain length is BOUNDED by `graft.stage.maxChain` (default
    * [[DefaultMaxChain]]): an append that would make the chain deeper
    * than the bound roots a fresh full build instead — amortized
    * compaction, the LSM discipline. Unbounded, a corpus ingesting
    * daily deltas for a year would leave every reader unioning 365
    * small stage dirs (the object-store small-file problem); bounded,
    * every K-th ingest pays one full re-derivation and reader fan-in
    * stays ≤ K dirs.
    */
  final val DefaultMaxChain = 8

  def orStageAppendable(s: SparkSession, name: String, sfDir: String,
      input: String)(build: DataFrame => DataFrame): DataFrame =
    // the per-row case IS the delta case: output rows for the new
    // input rows are computed from the new rows alone
    appendableCore(s, name, sfDir, input)(build)((newRows, _) => build(newRows))

  /** [[orStageAppendable]] for DERIVED-JOIN artifacts — outputs whose
    * rows are functions of row PAIRS (candidate pairs, posting
    * self-joins), which the row-wise contract can't cover: on
    * append-only growth the delta is every output row involving at
    * least one NEW input row, and the prior chain already holds all
    * rows among the old input. `full(allRows)` builds from scratch;
    * `delta(newRows, allRows)` must produce exactly the
    * ≥-one-new-side rows (new×old ∪ new×new for a pair artifact).
    * The chain/manifest/compaction/rewrite-falls-back-to-full
    * protocol is [[orStageAppendable]]'s verbatim — ONE core.
    *
    * REQUIREMENT on `delta`: rows_full(old ∪ new) ==
    * rows_full(old) ⊎ rows_delta(new, old ∪ new), disjointly — a
    * pair artifact satisfies it exactly when pairs are emitted once
    * under a canonical orientation (ida < idb) and old×old pairs
    * never appear in the delta.
    */
  def orStageAppendableDelta(s: SparkSession, name: String, sfDir: String,
      input: String)(full: DataFrame => DataFrame)(
      delta: (DataFrame, DataFrame) => DataFrame): DataFrame =
    appendableCore(s, name, sfDir, input)(full)(delta)

  private def appendableCore(s: SparkSession, name: String, sfDir: String,
      input: String)(build: DataFrame => DataFrame)(
      deltaBuild: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val root = s.conf.get("graft.stage.dir",
      sys.props("java.io.tmpdir") + "/graft-stage")
    if (root == "off")
      QueryMemo.cached(s, name, sfDir)(build(s.read.parquet(input)))
    else {
      val conf = s.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      def p(str: String) = new org.apache.hadoop.fs.Path(str)
      // per-file listing of the input as `len:mtime:path` (the path
      // goes LAST because URIs contain ':' — `split(":", 3)(2)`
      // recovers it unambiguously); the unit of append detection.
      // Restricted to [[visibleFiles]] (what Spark's reader sees) so
      // markers and hidden-dir temp files can neither defeat subset
      // detection nor be staged as a ghost delta.
      def listing(): Seq[String] = {
        val in = p(input)
        if (!fs.exists(in)) Seq.empty
        else visibleFiles(fs, in)
          .map(f => s"${f.getLen}:${f.getModificationTime}:${f.getPath}")
          .sorted
      }
      val token = contentToken(s, Seq(input))
      val base = s"$root/${md5hex(sfDir).take(12)}"
      val dir = s"$base/$token/$name"
      val lock = locks.computeIfAbsent(dir, _ => new Object)
      lock.synchronized {
        // a completed head whose chain was damaged (partial scratch
        // cleanup deleted an ancestor dir, a `_BASE` pointer, or data
        // files inside a chain dir): without the check, reads either
        // fail or — worse — silently serve a subset of rows until the
        // INPUT itself changes (the token only tracks the input).
        // Deleting the head falls through to the standard build below,
        // whose sibling filter also refuses broken chains — ONE copy
        // of the build/manifest protocol.
        var complete = fs.exists(p(s"$dir/_COMPLETE"))
        if (complete && !chainIntact(s, fs, dir)) {
          fs.delete(p(dir), true)
          evictVerdicts(dir)
          complete = false
        }
        if (!complete) {
          val cur = listing()
          val curSet = cur.toSet
          // find a completed sibling (same name, other token) whose
          // manifest is a strict subset of the current listing —
          // i.e. the input grew append-only since that stage
          val sibling: Option[(String, Set[String])] =
            if (!fs.exists(p(base))) None
            else fs.listStatus(p(base)).filter(_.isDirectory).toSeq
              .map(t => s"${t.getPath.toString}/$name")
              .filter(d => d != dir && fs.exists(p(s"$d/_COMPLETE")))
              .flatMap { d =>
                val m = readLines(fs, s"$d/_MANIFEST").toSet
                if (m.nonEmpty && m.subsetOf(curSet) && m != curSet)
                  Some((d, m))
                else None
              }
              // prefer the longest manifest = smallest delta; if THAT
              // sibling's chain already hit the bound, root a fresh
              // full build (compaction) rather than falling back to a
              // shallower ancestor — chaining onto an old root keeps
              // depth bounded but re-derives everything since it on
              // EVERY later ingest (a linearly growing delta), while
              // the full rebuild resets the chain and the next K
              // ingests are O(delta) again
              .sortBy(-_._2.size).headOption
              // the chain must be INTACT end to end: chaining onto a
              // sibling whose own ancestry was scratch-cleaned would
              // inherit the break
              .filter { case (d, _) =>
                chainDepth(fs, d) < maxChain(s) && chainIntact(s, fs, d) }
          val delta = sibling match {
            case Some((_, covered)) =>
              val newFiles = cur.filterNot(covered)
                .map(_.split(":", 3)(2)) // len:mtime:path — path last
              deltaBuild(s.read.parquet(newFiles: _*), s.read.parquet(input))
            case None => build(s.read.parquet(input))
          }
          delta.write.mode("overwrite").parquet(dir)
          sibling.foreach { case (d, _) => writeText(fs, s"$dir/_BASE", d) }
          if (sibling.isEmpty) writeText(fs, s"$dir/_FULL", "")
          // the stage dir's OWN file inventory, for integrity checks
          // (detects a cleaner deleting part files but not the dir)
          writeText(fs, s"$dir/_FILES", ownFiles(fs, dir).mkString("\n"))
          writeText(fs, s"$dir/_MANIFEST", cur.mkString("\n"))
          writeText(fs, s"$dir/_COMPLETE", "")
          evictVerdicts(dir)
        }
      }
      // read the whole chain (delta dirs back to the full-build root)
      s.read.parquet(chainDirs(fs, dir): _*)
    }
  }

  private def maxChain(s: SparkSession): Int =
    s.conf.get("graft.stage.maxChain", DefaultMaxChain.toString).toInt

  /** The stage dir plus its `_BASE` ancestry, delta-first — the ONE
    * chain walk (the reader unions it; [[chainDepth]] measures it).
    * Driver-side `_BASE` reads only — O(depth) tiny-file reads,
    * bounded by [[maxChain]] in practice (the 10000 cap is a
    * corrupted-pointer backstop, not a design bound).
    */
  private def chainDirs(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    var at = dir
    var hops = 0
    while (at != null && hops < 10000) {
      b += at
      val base = new org.apache.hadoop.fs.Path(s"$at/_BASE")
      at = if (fs.exists(base)) readLines(fs, s"$at/_BASE").headOption.orNull
      else null
      hops += 1
    }
    b.result()
  }

  /** Number of stage dirs a reader of `dir` unions. */
  private def chainDepth(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Int = chainDirs(fs, dir).length

  /** A stage dir's own visible data-file inventory as `name:len`
    * lines — recorded at build time (`_FILES`) and re-checked by
    * [[chainIntact]], so a cleaner that deletes SOME part files
    * (leaving the dir and `_COMPLETE`) is detected instead of the
    * stage silently serving a subset of rows.
    */
  private def ownFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[String] =
    visibleFiles(fs, new org.apache.hadoop.fs.Path(dir))
      .map(f => s"${f.getPath.getName}:${f.getLen}").sorted

  /** The chain is verifiably whole: every dir `_COMPLETE`, every
    * dir's data files matching its recorded `_FILES` inventory, and
    * the root (the dir with no `_BASE`) marked `_FULL` — a deleted
    * `_BASE` pointer otherwise silently truncates the walk and a
    * delta dir impersonates a root. A MISSING `_FILES` is broken, not
    * grandfathered: a cleaner that deleted the inventory is
    * indistinguishable from a pre-inventory dir, and the fail-safe
    * direction is a rebuild (dirs written before the inventory format
    * pay one rebuild; a persistent deployment migrating formats
    * should bump the stage-name version instead). The WHOLE-chain
    * verdict memoizes per (session, head) and member verdicts per
    * (session, member) in [[intactCache]] — a verified head is one
    * map lookup, zero FS calls — cleared by [[refreshTokens]] and,
    * for every session, by [[evictVerdicts]] on rebuild.
    */
  private def chainIntact(s: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Boolean = {
    // evict stopped sessions' verdicts (the tokenCache discipline)
    val it = intactCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    def memberIntact(d: String): Boolean =
      intactCache.computeIfAbsent((s, s"m:$d"), _ =>
        fs.exists(new org.apache.hadoop.fs.Path(s"$d/_COMPLETE")) &&
          readLines(fs, s"$d/_FILES") == ownFiles(fs, d)
      ).booleanValue()
    // get/put, NOT a computeIfAbsent wrapping memberIntact's: nested
    // computeIfAbsent on one ConcurrentHashMap throws "Recursive
    // update". The get/put race is benign — verdicts are idempotent.
    val key = (s, s"c:$dir")
    val cached = intactCache.get(key)
    if (cached != null) cached.booleanValue()
    else {
      val chain = chainDirs(fs, dir)
      val v = chain.forall(memberIntact) && fs.exists(
        new org.apache.hadoop.fs.Path(s"${chain.last}/_FULL"))
      intactCache.put(key, java.lang.Boolean.valueOf(v))
      v
    }
  }

  /** Drop EVERY session's cached verdicts for `dir` — a heal/rebuild
    * must be visible to concurrent sessions in the same JVM, or a
    * sibling session's stale FALSE would delete the freshly rebuilt
    * stage right back. Whole-chain (`c:`) verdicts are dropped for
    * ALL heads, not just `dir`'s own: a dependent head whose `_BASE`
    * ancestry includes the healed dir would otherwise keep a stale
    * chain verdict (a stale FALSE forces a pointless delete + full
    * rebuild of a still-valid head; a stale TRUE could mask the
    * heal). Chain verdicts cost O(depth) tiny-file reads to
    * recompute, so clearing them all beats tracking reverse
    * ancestry.
    */
  private def evictVerdicts(dir: String): Unit = {
    val member = s"m:$dir"
    val it = intactCache.keySet.iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._2 == member || k._2.startsWith("c:")) it.remove()
    }
  }

  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[String] = {
    val hp = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(hp)) Seq.empty
    else {
      val in = fs.open(hp)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList.filter(_.nonEmpty)
      finally in.close()
    }
  }

  private def writeText(fs: org.apache.hadoop.fs.FileSystem,
      path: String, text: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(text.getBytes("UTF-8"))
    finally out.close()
  }

  def orStage(s: SparkSession, name: String, sfDir: String,
      inputs: Seq[String])(build: => DataFrame): DataFrame = {
    val root = s.conf.get("graft.stage.dir",
      sys.props("java.io.tmpdir") + "/graft-stage")
    if (root == "off") QueryMemo.cached(s, name, sfDir)(build)
    else {
      val path =
        s"$root/${md5hex(sfDir).take(12)}/${contentToken(s, inputs)}/$name"
      val lock = locks.computeIfAbsent(path, _ => new Object)
      lock.synchronized {
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        // _SUCCESS is the completeness marker: a killed half-written
        // stage directory is rebuilt, never half-read
        if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")))
          build.write.mode("overwrite").parquet(path)
      }
      s.read.parquet(path)
    }
  }

  /** Bucketed variant of [[orStage]]: stages `build` as a parquet
    * table CLUSTERED BY `bucketCol` INTO `nBuckets` BUCKETS so that a
    * later equi-join (or aggregation) on that column needs NO shuffle
    * of the staged side — the scan itself reports the
    * `HashPartitioning` that the join requires. This is the
    * co-located-join scale story: at 100 TB the two fact tables are
    * bucketed once at ingest and every orderkey join afterwards is
    * exchange-free (only the bucket-local sort remains, and not even
    * that when each bucket is a single sorted file, which the
    * pre-write `repartition` below arranges in local mode).
    *
    * Bucket metadata lives in the session catalog, not in the parquet
    * footer, so a fresh session re-registers an external table over
    * the already-written files (bucket ids are recovered from the
    * `_00003`-style file-name suffix — the contract
    * `BucketingUtils.getBucketId` reads). With `graft.stage.dir=off`
    * the builder's frame is returned directly: identical rows, plain
    * (shuffled) join plan.
    */
  def orStageBucketed(s: SparkSession, name: String, sfDir: String,
      inputs: Seq[String], bucketCol: String, nBuckets: Int)(
      build: => DataFrame): DataFrame = {
    val root = s.conf.get("graft.stage.dir",
      sys.props("java.io.tmpdir") + "/graft-stage")
    if (root == "off") QueryMemo.cached(s, name, sfDir)(build)
    else {
      val path =
        s"$root/${md5hex(sfDir).take(12)}/${contentToken(s, inputs)}/$name"
      // table name carries the path hash: a new content token or code
      // version is a NEW catalog entry, never a stale rebind
      val table = s"graft_${name}_${md5hex(path).take(8)}"
      val lock = locks.computeIfAbsent(path, _ => new Object)
      lock.synchronized {
        val hPath = new org.apache.hadoop.fs.Path(path)
        val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS"))) {
          // repartition on the bucket column uses the SAME Murmur3
          // hash-partitioning as the bucketing spec, so every task
          // holds exactly one bucket -> one sorted file per bucket ->
          // the bucket-side Sort is elided too, not just the Exchange
          import org.apache.spark.sql.functions.col
          build.repartition(nBuckets, col(bucketCol))
            .write.mode("overwrite")
            .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
            .option("path", path).saveAsTable(table)
        } else if (!s.catalog.tableExists(table)) {
          val ddl = s.read.parquet(path).schema.toDDL
          s.sql(s"""CREATE TABLE $table ($ddl) USING PARQUET
                   |CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol)
                   |INTO $nBuckets BUCKETS
                   |LOCATION '$path'""".stripMargin)
        }
      }
      s.table(table)
    }
  }
}
