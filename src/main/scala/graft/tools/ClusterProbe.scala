package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline._

/** Probe: run extraction on local-cluster (separate executor JVMs). */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val execs = sys.env.getOrElse("EXECS", "2").toInt
    val coresPer = sys.env.getOrElse("CORES_PER", "1").toInt
    val memMb = sys.env.getOrElse("MEM_MB", "2048").toInt
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,$coresPer,$memMb]")
      .appName("graft-cluster-probe")
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions",
        s"-Xms${memMb}m -XX:+AlwaysPreTouch -XX:ParallelGCThreads=2 -XX:ConcGCThreads=1 -XX:CICompilerCount=2")
      .config("spark.rpc.io.threads", "2")
      .config("spark.shuffle.io.serverThreads", "2")
      .config("spark.shuffle.io.clientThreads", "2")
      .config("spark.sql.shuffle.partitions", execs * coresPer)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val in = "/tmp/graft-bench-input-60000"
    val turns = spark.read.parquet(in)
      .coalesce(32)
      .withColumn("turn_idx", col("turn_idx").cast("int")).as[TranscriptTurn]
    val kind = sys.env.getOrElse("KIND", "full")
    def job() = kind match {
      case "discard" =>
        turns.mapPartitions { it =>
          var n = 0L; var d = 0L
          it.foreach { t =>
            val e = Extraction.extractOne(t, Extraction.DefaultBudgets, graft.core.VisibleTextOptions())
            n += 1; d ^= Extraction.rowDigest(e.conv_id, e.turn_idx, e.extracted_text)
          }
          Iterator.single((n, d))
        }.reduce((a, b) => (a._1 + b._1, a._2 ^ b._2))
      case "nospans" =>
        turns.mapPartitions(_.map { t =>
          val e = Extraction.extractOne(t, Extraction.DefaultBudgets, graft.core.VisibleTextOptions())
          (e.conv_id, e.turn_idx, e.extracted_text)
        }).map(e => (1L, Extraction.rowDigest(e._1, e._2, e._3)))
          .reduce((a, b) => (a._1 + b._1, a._2 ^ b._2))
      case _ =>
        Extraction.extract(turns)
          .map(e => (1L, Extraction.rowDigest(e.conv_id, e.turn_idx, e.extracted_text)))
          .reduce((a, b) => (a._1 + b._1, a._2 ^ b._2))
    }
    job() // warm
    val t0 = System.nanoTime()
    val agg = job()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"EXECS=$execs coresPer=$coresPer rows=${agg._1} digest=${agg._2} sec=$sec%.2f thr=${agg._1 / sec}%.0f turns/s")
    spark.stop()
  }
}
