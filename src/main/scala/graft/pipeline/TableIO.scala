package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage seam for the extraction job (SURVEY §7.5): [[ExtractJob]] talks
  * to this trait only, so the deployment picks Parquet directories or
  * Iceberg tables by swapping a single format constant (`--format` /
  * `GRAFT_TABLE_FORMAT`) — no job-logic change.
  *
  * Contract: `root` is a Parquet directory root or an Iceberg table-name
  * prefix; a "pass" is the job's checkpoint unit (ExtractJob commits one
  * pass at a time and resumes at pass granularity).
  */
trait TableIO {

  /** Read the transcripts input table. */
  def readInput(spark: SparkSession, path: String): DataFrame

  /** Commit one completed pass of extracted turns (bucket-partitioned,
    * pre-sorted by the caller). Must be atomic-per-pass or idempotent on
    * retry: a re-run of the same pass replaces, never duplicates.
    */
  def writePass(df: DataFrame, root: String, pass: Int): Unit

  /** Read back one committed pass. */
  def readPass(spark: SparkSession, root: String, pass: Int): DataFrame

  /** Commit the per-partition lineage rows of one pass. */
  def writeLineage(df: DataFrame, root: String, pass: Int): Unit
}

object TableIO {

  /** Deployment default, overridable per-invocation with `--format`. */
  def defaultFormat: String = sys.env.getOrElse("GRAFT_TABLE_FORMAT", "parquet")

  def resolve(format: String): TableIO = format match {
    case "parquet" => ParquetTableIO
    case "iceberg" => IcebergTableIO
    case other =>
      throw new IllegalArgumentException(
        s"unknown table format '$other' (expected parquet or iceberg)")
  }
}

/** Directory-per-pass Parquet implementation (local/HDFS/object store). */
object ParquetTableIO extends TableIO {

  override def readInput(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  override def writePass(df: DataFrame, root: String, pass: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("_bucket")
      .parquet(s"$root/data/pass=$pass")

  override def readPass(spark: SparkSession, root: String, pass: Int): DataFrame =
    spark.read.parquet(s"$root/data/pass=$pass")

  override def writeLineage(df: DataFrame, root: String, pass: Int): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/_lineage/pass=$pass")
}

/** Iceberg implementation: `root` is a catalog-qualified table prefix (e.g.
  * `cat.db.extract`), passes live in `<root>_data` / `<root>_lineage`
  * partitioned by `_pass` (+ `_bucket` for data), and
  * `writeTo(...).overwritePartitions()` makes each pass commit one Iceberg
  * snapshot — replacing ExtractJob's marker files with snapshot-native
  * resumability. Uses only Spark's own DataFrameWriterV2/catalog API, so
  * this COMPILES without Iceberg on the classpath; at runtime it needs the
  * iceberg-spark-runtime jar and a configured catalog, and the tables
  * created as
  * `CREATE TABLE <root>_data (...) USING iceberg PARTITIONED BY (_pass, _bucket)`.
  */
object IcebergTableIO extends TableIO {

  override def readInput(spark: SparkSession, path: String): DataFrame =
    spark.table(path)

  override def writePass(df: DataFrame, root: String, pass: Int): Unit =
    df.withColumn("_pass", lit(pass))
      .writeTo(s"${root}_data")
      .overwritePartitions()

  override def readPass(spark: SparkSession, root: String, pass: Int): DataFrame =
    spark.table(s"${root}_data").filter(col("_pass") === pass).drop("_pass")

  override def writeLineage(df: DataFrame, root: String, pass: Int): Unit =
    df.withColumn("_pass", lit(pass))
      .writeTo(s"${root}_lineage")
      .overwritePartitions()
}
