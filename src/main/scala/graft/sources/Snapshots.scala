package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Fs

/** Snapshot-isolated versioned tables — the transactional seat the
  * ACID dataflow family (`sink_merge_upsert`, `sink_acid_update_delete`,
  * `sink_drop_partition`) deliberately left open: those rewrite
  * partitions in place, correct for a single writer but giving a
  * concurrent reader a torn view mid-rewrite. This object supplies
  * the missing isolation with the commit-log protocol every public
  * object-store table format converges on (Delta's `_delta_log`,
  * Iceberg's metadata pointer, Hive ACID's base/delta + ValidTxnList):
  *
  *   - **Data is immutable.** Every commit stages its full snapshot
  *     under a fresh `data/<uuid>/` directory; nothing ever rewrites
  *     a published file.
  *   - **Commit = one atomic file creation.** `_commits/<N>` is
  *     created with create-exclusive semantics (O_CREAT|O_EXCL via
  *     `java.nio` on `file:`, `FileSystem.create(p, overwrite=false)`
  *     on `hdfs:`); its content names the staged data dir. The create
  *     either fully succeeds or fully fails — there is no pointer
  *     rename and therefore no window where readers see a half-swap.
  *   - **Readers resolve once, then read immutable files.** A reader
  *     resolves `latest` (max committed N) or `versionAsOf` to a data
  *     dir at DataFrame-construction time; concurrent commits create
  *     NEW dirs, so the resolved DataFrame keeps returning the same
  *     rows however long the query runs — snapshot isolation.
  *   - **Optimistic concurrency.** A writer declares the parent
  *     version its new snapshot was derived from and claims
  *     `parent+1`. If another writer won that number first, the
  *     create-exclusive fails, the staged dir is cleaned up, and
  *     [[SnapshotConflictException]] tells the caller to re-derive
  *     from the new latest — exactly Hive ACID's write-conflict
  *     abort, Delta's ConcurrentModificationException.
  *
  * At 100 TB nothing here touches data size: a commit is one
  * `listStatus` of `_commits` (O(#versions) names, bounded by
  * [[expire]]) plus one small file creation; the data write itself is
  * the same distributed parquet job any sink runs. On S3, create-
  * exclusive maps to conditional PUT (If-None-Match) — the same
  * primitive public formats document for their S3 commit service.
  */
object Snapshots {

  final class SnapshotConflictException(msg: String)
    extends RuntimeException(msg)

  private def commitsDir(root: String) = s"$root/_commits"
  private def dataRoot(root: String) = s"$root/data"

  /** All committed versions under `root`, ascending. One metadata
    * listing — never touches data files. */
  def versions(s: SparkSession, root: String): Seq[Long] = {
    val f = Fs.fs(s, root)
    val p = new Path(commitsDir(root))
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(_.isFile)
      .flatMap(st => st.getPath.getName.toLongOption)
      .sorted
  }

  /** Latest committed version, if any commit exists. */
  def latest(s: SparkSession, root: String): Option[Long] =
    versions(s, root).lastOption

  /** Atomically create `path` with `content`, failing if it already
    * exists. `java.nio.Files.createFile` gives true O_CREAT|O_EXCL on
    * local paths (the Hadoop LocalFileSystem emulates the check
    * non-atomically); remote schemes go through the FileSystem API,
    * where HDFS's namenode makes the create atomic. */
  private def createExclusive(
      s: SparkSession, path: String, content: String): Boolean = {
    val p = new Path(path)
    val f = Fs.fs(s, path)
    val uri = f.getUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      try {
        java.nio.file.Files.write(local, content.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      // only an already-exists failure is a CONFLICT; any other
      // IOException (write/close failing AFTER the namenode created
      // the marker) would otherwise leave an empty marker bricking
      // every later latest() — best-effort-remove it and rethrow so
      // the caller sees an error, not a phantom conflict
      try {
        val out = f.create(p, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          try f.delete(p, false) catch { case _: java.io.IOException => () }
          throw e
      }
    }
  }

  private def readSmall(s: SparkSession, path: String): String = {
    val f = Fs.fs(s, path)
    val in = f.open(new Path(path))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }

  /** Commit `df` as the snapshot FOLLOWING `expectedParent` (0 = the
    * table must be empty). Returns the committed version number.
    * Stages the data first — the expensive distributed write happens
    * with no lock held — then claims `_commits/<parent+1>` with one
    * atomic create. On conflict the staged dir is deleted and
    * [[SnapshotConflictException]] is thrown; the caller re-reads the
    * new latest, re-derives, and retries (see [[commitTransform]]). */
  def commit(s: SparkSession, root: String, df: DataFrame,
             expectedParent: Long,
             extraMeta: Map[String, String] = Map.empty): Long =
    commitDirs(s, root, df, expectedParent, Seq.empty, extraMeta)

  /** APPEND commit: the new version's manifest = the parent's data
    * dirs PLUS one fresh dir holding only `df`'s rows — no rewrite of
    * existing data, the additive file-manifest pattern every log/CDC
    * ingest needs (a 100 TB table appends a micro-batch by writing
    * just the batch and one marker, never touching standing files). */
  def appendCommit(s: SparkSession, root: String, df: DataFrame,
                   expectedParent: Long,
                   extraMeta: Map[String, String] = Map.empty): Long = {
    val parentDirs =
      if (expectedParent == 0L) Seq.empty
      else dataDirsOf(s, root, expectedParent)
        .map(_.stripPrefix(s"${dataRoot(root)}/"))
    commitDirs(s, root, df, expectedParent, parentDirs, extraMeta)
  }

  private def commitDirs(s: SparkSession, root: String, df: DataFrame,
                         expectedParent: Long, inheritDirs: Seq[String],
                         extraMeta: Map[String, String]): Long = {
    // a STALE parent is caught atomically by the marker claim below;
    // a parent AHEAD of latest would silently claim past a gap, so
    // reject it up front (racy-read is fine — the claim is the gate)
    val cur = latest(s, root).getOrElse(0L)
    if (expectedParent > cur)
      throw new IllegalArgumentException(
        s"expectedParent $expectedParent is ahead of latest $cur under $root")
    // the marker is parsed by string-split, so meta entries must not
    // smuggle quotes/braces, and the manifest's own fields are
    // reserved (a crafted earlier "data" occurrence would win the
    // first-match parse and redirect reads)
    extraMeta.foreach { case (k, x) =>
      require(k.matches("[A-Za-z0-9_-]+") && !Set("data", "parent")(k),
        s"invalid or reserved extraMeta key: $k")
      require(x.matches("[A-Za-z0-9_.: -]*"),
        s"extraMeta value for $k must stay in the JSON-safe charset")
    }
    val v = expectedParent + 1
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = s"${dataRoot(root)}/$uuid"
    df.write.mode("errorifexists").parquet(dataDir)
    val dirs = (inheritDirs :+ uuid).mkString(" ")
    val extras = extraMeta.map { case (k, x) => s""","$k":"$x"""" }.mkString
    val meta = s"""{"data":"$dirs","parent":$expectedParent$extras}"""
    if (!createExclusive(s, s"${commitsDir(root)}/$v", meta)) {
      Fs.deleteDir(s, dataDir)
      throw new SnapshotConflictException(
        s"version $v already committed under $root " +
          s"(expected parent $expectedParent is no longer latest)")
    }
    v
  }

  private def metaOf(s: SparkSession, root: String, v: Long): String = {
    val marker = s"${commitsDir(root)}/$v"
    val f = Fs.fs(s, root)
    if (!f.exists(new Path(marker)))
      throw new NoSuchElementException(
        s"snapshot version $v does not exist under $root " +
          s"(committed: ${versions(s, root).mkString(",")})")
    readSmall(s, marker)
  }

  /** One string field out of the marker's (self-written, flat) JSON. */
  private def metaField(meta: String, key: String): Option[String] =
    meta.split(s""""$key":"""").drop(1).headOption.map(_.split("\"")(0))

  private def dataDirsOf(s: SparkSession, root: String, v: Long): Seq[String] =
    metaField(metaOf(s, root, v), "data").get
      .split(" ").toSeq.map(u => s"${dataRoot(root)}/$u")

  /** The value a commit recorded under `key` in its marker, if any —
    * the exactly-once sink's replay ledger (see [[txnAppend]]). */
  def commitMeta(s: SparkSession, root: String, v: Long,
                 key: String): Option[String] =
    metaField(metaOf(s, root, v), key)

  /** Read snapshot `v` (time travel). The manifest is resolved NOW
    * and its dirs are immutable — the returned DataFrame yields the
    * same rows for its whole lifetime regardless of later commits.
    * `mergeSchema` makes appended columns visible: an append commit
    * may carry a WIDER schema than the standing dirs (schema
    * evolution), and old rows surface the new column as null — the
    * add-column semantics every public format ships. */
  def readAsOf(s: SparkSession, root: String, v: Long): DataFrame =
    s.read.option("mergeSchema", "true")
      .parquet(dataDirsOf(s, root, v): _*)

  /** Read the latest committed snapshot. */
  def read(s: SparkSession, root: String): DataFrame = {
    val v = latest(s, root).getOrElse(
      throw new NoSuchElementException(s"no committed snapshot under $root"))
    readAsOf(s, root, v)
  }

  /** Read-modify-write with OCC retry: derive the next snapshot from
    * the current latest via `f` (None input = empty table), commit
    * against that parent, and on conflict re-derive from the NEW
    * latest — never blind-retry the stale result. This is the
    * transactional UPDATE/DELETE/MERGE seat: `f` is the rewrite
    * (the same dataflows sink_acid_update_delete runs), and isolation
    * plus conflict detection come from the commit protocol. */
  def commitTransform(s: SparkSession, root: String,
                      maxAttempts: Int = 10)
                     (f: Option[DataFrame] => DataFrame): Long = {
    var attempt = 0
    while (true) {
      attempt += 1
      val parent = latest(s, root).getOrElse(0L)
      val cur = if (parent == 0L) None else Some(readAsOf(s, root, parent))
      val next = f(cur)
      try return commit(s, root, next, parent)
      catch {
        case e: SnapshotConflictException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    -1L // unreachable
  }

  /** Retire every committed version strictly older than
    * `latest - keepLast + 1`, plus any staged data dir no surviving
    * commit references (a crashed or conflicted writer's orphan).
    * Commit markers are removed FIRST, then data dirs — a concurrent
    * reader that already resolved an old version keeps reading its
    * immutable files until the dir deletion lands, the same
    * in-flight-plan grace the MV version rotation gives. Orphans are
    * only swept once older than `orphanGraceMs` — a writer that is
    * STILL STAGING (data written, marker not yet created) must never
    * lose its dir to a concurrent expire; this is the retention
    * window every public format's VACUUM documents. Returns the
    * retired versions. */
  def expire(s: SparkSession, root: String, keepLast: Int,
             orphanGraceMs: Long = 24L * 3600 * 1000): Seq[Long] = {
    // keepLast 0 would wipe the table AND let version numbers be
    // reused by the next commit — stale references would silently
    // resolve to unrelated data
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val vs = versions(s, root)
    if (vs.isEmpty) return Seq.empty
    val cutoff = vs.last - keepLast + 1
    val (dead, live) = vs.partition(_ < cutoff)
    // a dir stays alive while ANY surviving manifest references it —
    // append commits share their parents' dirs, so liveness is
    // manifest-union, not per-version (the same refcount-by-manifest
    // rule public formats' VACUUM applies)
    val liveDirs = live.flatMap(v => dataDirsOf(s, root, v)).toSet
    dead.foreach { v =>
      val dirs = dataDirsOf(s, root, v)
      Fs.deleteDir(s, s"${commitsDir(root)}/$v")
      dirs.filterNot(liveDirs.contains).foreach(Fs.deleteDir(s, _))
    }
    // orphan sweep: staged dirs never published by any live commit,
    // aged past the grace window (never an in-flight staging dir)
    val f = Fs.fs(s, root)
    val dr = new Path(dataRoot(root))
    val now = System.currentTimeMillis()
    // compare fully-qualified URIs: listStatus returns scheme-
    // qualified paths (file:/...), the live set holds raw strings
    val liveQualified = liveDirs.map(d => f.makeQualified(new Path(d)).toString)
    if (f.exists(dr)) f.listStatus(dr).toSeq
      .filter(st => st.isDirectory &&
        now - st.getModificationTime > orphanGraceMs)
      .map(_.getPath.toString)
      .filterNot(liveQualified.contains)
      .foreach(Fs.deleteDir(s, _))
    dead
  }

  /** Row-level change-data-capture between two snapshots, keyed on
    * `keys`: full-outer join the two immutable versions and classify
    * each key as insert (absent before), delete (absent after) or
    * update (any non-key column differs, null-safely); unchanged rows
    * are dropped. Output: `change_type`, the key columns, and every
    * non-key column twice as `old_`/`new_`. One shuffle per side on
    * the key — the row-level CDC plan; at 100 TB the join prunes to
    * the partitions the manifests say changed. */
  def cdc(s: SparkSession, root: String, fromV: Long, toV: Long,
          keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = readAsOf(s, root, fromV)
    val b = readAsOf(s, root, toV)
    val nonKey = a.columns.toSeq.filterNot(keys.contains)
    require(b.columns.toSeq.sorted == a.columns.toSeq.sorted,
      "cdc requires both snapshots to share a schema")
    val aP = nonKey.foldLeft(a)((df, c) => df.withColumnRenamed(c, s"old_$c"))
      .withColumn("_old_present", lit(true))
    val bP = nonKey.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"new_$c"))
      .withColumn("_new_present", lit(true))
    val changed = nonKey
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    aP.join(bP, keys, "full_outer")
      .withColumn("change_type",
        when(col("_old_present").isNull, lit("insert"))
          .when(col("_new_present").isNull, lit("delete"))
          .when(changed, lit("update"))
          .otherwise(lit("unchanged")))
      .filter(col("change_type") =!= "unchanged")
      .drop("_old_present", "_new_present")
  }

  /** Exactly-once transactional append for a streaming sink: commit
    * the micro-batch ONLY IF its `batchId` is beyond the last one the
    * table recorded — a replayed batch (foreachBatch re-delivery
    * after failure recovery) is detected from the commit ledger and
    * skipped, so the table never double-appends. The batch id rides
    * in the commit marker itself, so the ledger and the data are one
    * atomic unit (Delta's txn appId/version idempotence, Hive ACID's
    * write-id dedup). Returns true when the batch committed, false on
    * replay skip. Conflicts (another writer landing between read and
    * claim) re-check the ledger and retry. */
  def txnAppend(s: SparkSession, root: String, df: DataFrame,
                batchId: Long, maxAttempts: Int = 10): Boolean = {
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val parent = latest(s, root).getOrElse(0L)
      // the ledger is the most recent commit CARRYING a batch id, not
      // merely the latest commit — an interleaved non-batch commit
      // (compact, a manual transform) must not reset replay detection
      // and let a redelivered batch double-append. Walk back from the
      // newest marker; expire bounds the walk.
      val lastBatch = versions(s, root).reverseIterator
        .map(v => commitMeta(s, root, v, "batch"))
        .collectFirst { case Some(b) => b.toLong }
        .getOrElse(-1L)
      if (batchId <= lastBatch) return false
      try {
        appendCommit(s, root, df, parent, Map("batch" -> batchId.toString))
        return true
      } catch { case _: SnapshotConflictException => () }
    }
    throw new SnapshotConflictException(
      s"txnAppend gave up after $maxAttempts conflicts under $root")
  }

  /** OPTIMIZE: collapse an append-heavy manifest back to one data dir
    * — same rows, one commit whose manifest no longer inherits the
    * accumulated small dirs (the many-small-files tax appends build
    * up). Readers are unaffected throughout (they hold immutable
    * resolved manifests); the superseded dirs die at the next
    * [[expire]] once no live manifest references them. Semantics-
    * preserving by construction — it is literally `commitTransform`
    * of the identity. */
  def compact(s: SparkSession, root: String): Long =
    commitTransform(s, root) { cur =>
      cur.getOrElse(throw new NoSuchElementException(
        s"nothing to compact under $root"))
    }
}
