package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
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
  */
class SnapshotSource extends RelationProvider with DataSourceRegister {
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
