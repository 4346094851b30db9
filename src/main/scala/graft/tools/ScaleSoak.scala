package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.pipeline.{ExtractJob, TranscriptTurn, Transcripts}

/** Scale-soak tooling for the two VERDICT-r3 evidence gaps:
  *  - kill-and-resume soak (driven by scripts/soak_resume.sh, which runs
  *    [[GenTranscripts]] + ExtractJob as separate JVMs and SIGKILLs the
  *    driver mid-pass);
  *  - skew torture ([[SkewSoak]]): one 10^6-turn conversation inside an
  *    otherwise normal corpus, extraction run salted vs unsalted with a
  *    task-time listener to record the straggler ratio.
  */
object GenTranscripts {

  /** args: <nConvs> <outPath> [megaTurns]
    *
    * Writes the deterministic bench corpus (Transcripts.generate, seed 42);
    * with megaTurns > 0, appends ONE conversation of that many turns as a
    * SINGLE parquet file — the worst-case input shape for the north rule's
    * skewed-long-conversation clause (a giant conversation that arrives
    * co-located in one input split).
    */
  def main(args: Array[String]): Unit = {
    val nConvs = args(0).toLong
    val out = args(1)
    val megaTurns = if (args.length > 2) args(2).toLong else 0L
    val spark = SparkSession.builder()
      .appName("graft-gen-transcripts")
      .config("spark.master", sys.props.getOrElse("spark.master", "local[8]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      Transcripts.generate(spark, nConvs, seed = 42L, partitions = 256)
        .toDF().write.mode(SaveMode.Overwrite).parquet(out)
      if (megaTurns > 0L) {
        val mega = spark.range(megaTurns).map { t =>
          TranscriptTurn("cmega0000", t.toInt,
            if (t % 2L == 0L) "user" else "assistant",
            Transcripts.htmlFor(t * 0x9E3779B97F4A7C15L, t.toInt),
            "",
            new java.sql.Timestamp(1700000000000L + t))
        }
        mega.toDF().coalesce(1).write.mode(SaveMode.Append).parquet(out)
      }
      println(s"""{"event":"gen-done","convs":$nConvs,"megaTurns":$megaTurns,"rows":${spark.read.parquet(out).count()}}""")
    } finally spark.stop()
  }
}

object SkewSoak {

  /** Per-stage task wall-times, for straggler analysis. */
  private final class TaskTimes extends SparkListener {
    val byStage = new scala.collection.concurrent.TrieMap[Int, scala.collection.mutable.ArrayBuffer[Long]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val buf = byStage.getOrElseUpdate(t.stageId, scala.collection.mutable.ArrayBuffer.empty[Long])
      buf.synchronized { buf += t.taskInfo.duration }
    }
    def reset(): Unit = byStage.clear()
    /** (maxTaskMs, medianTaskMs, nTasks) of the stage holding the longest
      * single task — with a skewed corpus that is the extraction stage.
      */
    def straggler(): (Long, Long, Int) = {
      val stages = byStage.values.filter(_.nonEmpty).toSeq
      val worst = stages.maxBy(_.max)
      val sorted = worst.toSeq.sorted
      (sorted.last, sorted(sorted.length / 2), sorted.length)
    }
  }

  private def lineageDigest(spark: SparkSession, out: String): (Long, Long) = {
    val rows = spark.read.parquet(s"$out/_lineage/pass=0")
      .select("n_rows", "digest").collect()
    (rows.map(_.getLong(0)).sum, rows.map(_.getLong(1)).foldLeft(0L)(_ ^ _))
  }

  /** args: <inputParquet> <outBase> [salt]
    *
    * Runs the identical ExtractJob twice over the skewed corpus — unsalted,
    * then salted — and prints one JSON line with wall seconds, the
    * straggler task-time ratio (max/median of the heaviest stage) for both,
    * and digest equality.
    *
    * AQE partition coalescing is disabled here on purpose: the salted
    * shuffle's partitions are small in BYTES but heavy in parse CPU, and
    * size-based coalescing would silently merge them back into a straggler.
    * (At real 100 TB scale the bytes are proportionate and coalescing is
    * safe; for CPU-bound-small-byte stages the production setting is the
    * same flag or a larger advisoryPartitionSizeInBytes.)
    */
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val outBase = args(1)
    val salt = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .appName("graft-skew-soak")
      .config("spark.master", sys.props.getOrElse("spark.master", "local[8]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskTimes
    spark.sparkContext.addSparkListener(listener)
    try {
      def runOnce(tag: String, saltArg: Int): (Double, Long, Long, Int, Long, Long) = {
        listener.reset()
        val out = s"$outBase/$tag"
        val t0 = System.nanoTime()
        ExtractJob.run(spark, ExtractJob.Args(
          input = in, output = out, buckets = 8, passes = 1, salt = saltArg))
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are delivered asynchronously (listenerBus is
        // private[spark]); a short drain pause is enough at this scale
        Thread.sleep(3000)
        val (maxMs, medMs, nTasks) = listener.straggler()
        val (rows, digest) = lineageDigest(spark, out)
        (sec, maxMs, medMs, nTasks, rows, digest)
      }
      // warm pass on a normal-shaped prefix would perturb the listener —
      // instead run unsalted first (JIT warm-up penalizes the UNSALTED arm,
      // so any salted improvement is understated, never overstated)
      val (sec0, max0, med0, n0, rows0, dg0) = runOnce("unsalted", 0)
      val (sec1, max1, med1, n1, rows1, dg1) = runOnce(s"salted$salt", salt)
      val r0 = max0.toDouble / math.max(1L, med0)
      val r1 = max1.toDouble / math.max(1L, med1)
      println(
        s"""{"event":"skew-soak","salt":$salt,""" +
        s""""unsalted":{"sec":${f(sec0)},"straggler_max_ms":$max0,"straggler_med_ms":$med0,"tasks":$n0,"ratio":${f(r0)}},""" +
        s""""salted":{"sec":${f(sec1)},"straggler_max_ms":$max1,"straggler_med_ms":$med1,"tasks":$n1,"ratio":${f(r1)}},""" +
        s""""wall_speedup":${f(sec0 / sec1)},"ratio_improvement":${f(r0 / r1)},""" +
        s""""rows":$rows0,"digest_equal":${dg0 == dg1 && rows0 == rows1}}""")
      require(dg0 == dg1 && rows0 == rows1,
        s"digest mismatch: unsalted=($rows0,$dg0) salted=($rows1,$dg1)")
    } finally spark.stop()
  }

  private def f(d: Double): String = f"$d%.3f".replace(",", ".")
}
