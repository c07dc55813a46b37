package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}

import java.nio.file.{Files, Paths, StandardCopyOption}

/** MANIFEST-BACKED parquet catalog for int-partitioned layouts — the
  * Iceberg/SnapshotTable pattern applied to a `col=<k>/` directory tree:
  * every leaf file (path, size) is recorded ONCE at write time in a single
  * JSON manifest, and reads plan from that one file instead of listing N
  * partition directories.
  *
  * Why: `spark.read.parquet` on a partitioned root performs a recursive
  * directory listing plus schema inference at EVERY plan — measured as the
  * dominant cost of small pruned reads over a 256-4096-bucket PageStore
  * (BASELINE.md round 4: tail epochs 5.3-11 s vs 3.3-4.5 s cached, almost
  * entirely listing). At a 100 TB store the listing is millions of S3
  * LIST calls per epoch; a manifest is one GET. This is exactly what a
  * table format's metadata layer does — built here on Spark's public-ish
  * `FileIndex` extension point so the read side stays a vanilla
  * `HadoopFsRelation` parquet scan: partition PRUNING arrives as Catalyst
  * partition filters into [[ManifestFileIndex.listFiles]] and costs an
  * in-memory filter over the manifest entries, zero filesystem calls.
  *
  * The manifest (`_graft_manifest.json`) is written atomically AFTER the
  * data files; a reader either sees it (and plans from it alone) or falls
  * back to directory listing. Layouts are write-once (PageStore overwrites
  * wholesale), so there is no staleness window.
  */
object ManifestParquet {

  private val ManifestName = "_graft_manifest.json"

  private def manifestPath(root: String) = Paths.get(root, ManifestName)

  def hasManifest(root: String): Boolean = Files.exists(manifestPath(root))

  /** Scan the partitioned layout at `root` ONCE (driver-side, write-time
    * cost) and record every parquet leaf under `partitionCol=<k>` with its size
    * and the data schema. One listing at write time buys zero listings on
    * every subsequent read. */
  def writeManifest(root: String, partitionCol: String,
      dataSchema: StructType): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = mapper.createObjectNode()
    doc.put("format", 1)
    doc.put("partition_col", partitionCol)
    doc.put("schema", dataSchema.json)
    val filesNode = doc.putArray("files")
    val dirs = Files.list(Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      dirs.iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.matches(s"$partitionCol=\\d+"))
        .sortBy(_.getFileName.toString)
        .foreach { dir =>
          val k = dir.getFileName.toString.split('=')(1).toInt
          val leaves = Files.list(dir)
          try leaves.iterator().asScala.toSeq
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .sortBy(_.getFileName.toString)
            .foreach { f =>
              val e = filesNode.addArray()
              e.add(k)
              e.add(s"${dir.getFileName}/${f.getFileName}")
              e.add(Files.size(f))
              e.add(Files.getLastModifiedTime(f).toMillis)
            }
          finally leaves.close()
        }
    } finally dirs.close()
    val tmp = Paths.get(root, s"$ManifestName.tmp")
    Files.write(tmp, mapper.writeValueAsBytes(doc))
    Files.move(tmp, manifestPath(root), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The layout as a DataFrame planned ENTIRELY from the manifest: data
    * columns in file order plus the int partition column appended (the same
    * shape `spark.read.parquet` gives), no directory listing, no schema
    * inference. A filter on the partition column prunes file groups
    * in-memory via [[ManifestFileIndex]]. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(manifestPath(root)))
    val partitionCol = node.get("partition_col").asText
    val dataSchema = DataType.fromJson(node.get("schema").asText)
      .asInstanceOf[StructType]
    import scala.jdk.CollectionConverters._
    val rootPath = new HPath(new java.io.File(root).toURI)
    val byPartition = node.get("files").elements().asScala.toSeq
      .map(e => (e.get(0).asInt,
        new FileStatus(e.get(2).asLong, false, 1, 128L * 1024 * 1024,
          e.get(3).asLong, new HPath(rootPath, e.get(1).asText))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toArray)
      .toSeq.sortBy(_._1)
    val partitionSchema =
      StructType(Seq(StructField(partitionCol, IntegerType, nullable = false)))
    val index = new ManifestFileIndex(rootPath, partitionCol, byPartition)
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    session.baseRelationToDataFrame(HadoopFsRelation(
      index, partitionSchema, dataSchema, bucketSpec = None,
      new ParquetFileFormat, options = Map.empty)(session))
  }
}

/** [[FileIndex]] over the in-memory manifest entries: `listFiles` evaluates
  * the pushed partition filters against each partition's int value and
  * returns only the surviving groups' pre-built [[FileStatus]]es — the
  * "file listing" is an array filter. */
private[graft] final class ManifestFileIndex(
    root: HPath,
    partitionCol: String,
    byPartition: Seq[(Int, Array[FileStatus])]) extends FileIndex {

  override def rootPaths: Seq[HPath] = Seq(root)

  override def partitionSchema: StructType =
    StructType(Seq(StructField(partitionCol, IntegerType, nullable = false)))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty) byPartition
      else {
        // the filters reference the single partition attribute — bind it to
        // ordinal 0 of a one-column row and evaluate per partition value
        val bound = partitionFilters.reduce(
          org.apache.spark.sql.catalyst.expressions.And(_, _)).transform {
          case a: Attribute if a.name == partitionCol =>
            BoundReference(0, IntegerType, nullable = false)
        }
        val pred = Predicate.create(bound)
        pred.initialize(0)
        byPartition.filter { case (k, _) => pred.eval(InternalRow(k)) }
      }
    kept.map { case (k, files) => PartitionDirectory(InternalRow(k), files) }
  }

  override def inputFiles: Array[String] =
    byPartition.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = () // write-once layout: nothing to refresh

  override def sizeInBytes: Long = byPartition.flatMap(_._2.map(_.getLen)).sum
}
