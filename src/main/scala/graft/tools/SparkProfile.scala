package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.pipeline._

/** Stage-by-stage Spark overhead breakdown for the extraction pipeline. */
object SparkProfile {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("CORES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val in = "/tmp/graft-profile-input"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(in, "_SUCCESS"))) {
      Transcripts.generate(spark, 60000, seed = 42L, partitions = 64)
        .toDF().write.mode("overwrite").parquet(in)
    }
    def turns = spark.read.parquet(in)
      .withColumn("turn_idx", col("turn_idx").cast("int")).as[TranscriptTurn]
    val n = turns.count()
    println(s"rows=$n cores=$cores")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-44s ${sec}%7.2f s   ${n / sec}%9.0f rows/s")
    }

    time("read+deserialize only (foreach noop)") {
      turns.foreach(_ => ())
    }
    time("read+extractOne, discard result") {
      turns.mapPartitions { it =>
        it.foreach(t => Extraction.extractOne(t, Extraction.DefaultBudgets, VisibleTextOptions()))
        Iterator.empty[Int]
      }.foreach(_ => ())
    }
    time("extract -> tuple3 (no spans encode)") {
      turns.mapPartitions(_.map { t =>
        val e = Extraction.extractOne(t, Extraction.DefaultBudgets, VisibleTextOptions())
        (e.conv_id, e.turn_idx, e.extracted_text)
      }).foreach(_ => ())
    }
    time("full extract (ExtractedTurn encode)") {
      Extraction.extract(turns).foreach(_ => ())
    }
    time("full extract + digest reduce") {
      Extraction.extract(turns)
        .map(e => Extraction.rowDigest(e.conv_id, e.turn_idx, e.extracted_text))
        .reduce(_ ^ _)
    }
    spark.stop()
  }
}
