package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** spark-submit entry point for the transcript extraction pipeline.
  *
  *   spark-submit --class graft.pipeline.ExtractJob <jar> \
  *     --input  <transcripts parquet/iceberg path> \
  *     --output <dest dir> \
  *     [--buckets 64] [--passes 1] [--resume] [--salt 0]
  *     [--format parquet|iceberg] [--main-content]
  *
  * Scale design:
  *  - rows are routed to `buckets` stable hash buckets of `conv_id`
  *    (`pmod(xxhash64(conv_id), buckets)`) and written with
  *    `partitionBy(_bucket)`; with `--passes P > 1` the job runs P
  *    sequential sub-jobs each covering `buckets/P` buckets and records a
  *    progress marker per completed pass — `--resume` skips completed
  *    passes, giving checkpointed restart at pass granularity;
  *  - storage goes through the [[TableIO]] seam: `--format parquet` writes
  *    directory-per-pass Parquet, `--format iceberg` commits each pass as
  *    an Iceberg snapshot via `writeTo(...).overwritePartitions()` (same
  *    control flow, snapshot-native resume);
  *  - extraction itself is shuffle-free; the only shuffle is the optional
  *    `repartition` that balances bucket passes, and skew from very long
  *    conversations is neutralized because routing hashes conv_id but
  *    repartitioning salts by (`conv_id`, `turn_idx` div salt) so one
  *    conversation can spread over `salt` tasks;
  *  - lineage rows (partition id, counts, digest) land next to the data in
  *    `<output>/_lineage`, metrics are printed as one JSON line.
  */
object ExtractJob {

  final case class Args(
      input: String = "",
      output: String = "",
      buckets: Int = 64,
      passes: Int = 1,
      resume: Boolean = false,
      salt: Int = 0,
      format: String = TableIO.defaultFormat,
      mainContent: Boolean = false
  )

  def parseArgs(argv: Array[String]): Args = {
    var a = Args()
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--input"   => a = a.copy(input = argv(i + 1)); i += 2
        case "--output"  => a = a.copy(output = argv(i + 1)); i += 2
        case "--buckets" => a = a.copy(buckets = argv(i + 1).toInt); i += 2
        case "--passes"  => a = a.copy(passes = argv(i + 1).toInt); i += 2
        case "--salt"    => a = a.copy(salt = argv(i + 1).toInt); i += 2
        case "--format"  => a = a.copy(format = argv(i + 1)); i += 2
        case "--resume"  => a = a.copy(resume = true); i += 1
        case "--main-content" => a = a.copy(mainContent = true); i += 1
        case other        => throw new IllegalArgumentException(s"unknown arg $other")
      }
    }
    require(a.input.nonEmpty && a.output.nonEmpty, "--input and --output are required")
    require(a.buckets % a.passes == 0, "--buckets must be divisible by --passes")
    a
  }

  def run(spark: SparkSession, args: Args): Unit = {
    import spark.implicits._
    val io = TableIO.resolve(args.format)
    val metrics = Extraction.Metrics.register(spark)
    // progress markers go through the Hadoop FileSystem resolved from the
    // output URI so --output may be local, HDFS, or an object store
    val progressDir = new HPath(args.output, "_progress")
    val fs = progressDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(progressDir)

    val bucketsPerPass = args.buckets / args.passes
    val t0 = System.nanoTime()
    for (pass <- 0 until args.passes) {
      val marker = new HPath(progressDir, s"pass-$pass.done")
      if (args.resume && fs.exists(marker)) {
        println(s"""{"event":"skip-pass","pass":$pass}""")
      } else {
        val lo = pass * bucketsPerPass
        val hi = lo + bucketsPerPass
        val turns = io.readInput(spark, args.input)
          .withColumn("_bucket", pmod(xxhash64(col("conv_id")), lit(args.buckets)))
          .filter(col("_bucket") >= lo && col("_bucket") < hi)

        val salted =
          if (args.salt > 1)
            turns.repartition(col("_bucket"),
              pmod(xxhash64(col("conv_id"), expr(s"turn_idx DIV ${args.salt}")), lit(args.salt)))
          else turns

        val bucketOf = salted.select(col("_bucket"),
          col("conv_id"), col("turn_idx"), col("role"), col("text"),
          col("tool"), col("ts"))
        val turnsDs = bucketOf.drop("_bucket").as[TranscriptTurn]
        val extracted =
          (if (args.mainContent) Extraction.extractMain(turnsDs, Some(metrics))
           else Extraction.extract(turnsDs, Some(metrics)))
            .withColumn("_bucket", pmod(xxhash64(col("conv_id")), lit(args.buckets)))

        // stable turn ordering inside every bucket file: repartition by
        // bucket then sort (conv_id, turn_idx) within each writer task
        io.writePass(
          extracted
            .repartition(col("_bucket"))
            .sortWithinPartitions(col("_bucket"), col("conv_id"), col("turn_idx")),
          args.output, pass)

        val lin = Extraction.lineage(
          io.readPass(spark, args.output, pass)
            .drop("_bucket")
            .select($"conv_id", $"turn_idx", $"role", $"extracted_text", $"spans",
              $"n_parse_errors", $"first_parse_error", $"budget_error",
              $"n_chars_in", $"n_chars_out").as[ExtractedTurn])
        io.writeLineage(lin.toDF(), args.output, pass)

        val mOut = fs.create(marker, true)
        try mOut.write(s"pass=$pass\n".getBytes("UTF-8")) finally mOut.close()
        println(s"""{"event":"pass-done","pass":$pass,"buckets":[$lo,$hi)}""".replace(")}", "]}"))
      }
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      s"""{"event":"job-done","sec":$secs,"turnsIn":${metrics.turnsIn.value},""" +
      s""""turnsOk":${metrics.turnsOk.value},"turnsFailed":${metrics.turnsFailed.value},""" +
      s""""parseErrors":${metrics.parseErrors.value},"bytesIn":${metrics.bytesIn.value},""" +
      s""""bytesOut":${metrics.bytesOut.value}}""")
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args) finally spark.stop()
  }
}
