package graft.tools

import graft.core._

/** Poor-man's sampling profiler for the core parse hot path: one thread
  * parses the reference-shaped bench doc in a loop; a sampler thread
  * snapshots its stack every ~2 ms and histograms the deepest graft frame.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val medium = "<div><h1>Title</h1><p>alpha beta gamma</p><ul><li>a</li><li>b</li><li>c</li></ul></div>" * 200
    val which = if (args.nonEmpty) args(0) else "parse"

    @volatile var running = true
    val worker = new Thread(() => {
      while (running) {
        which match {
          case "vt" => VisibleText.ofDocument(HtmlParser.parse(medium))
          case "extract" =>
            graft.pipeline.Extraction.extractOne(
              graft.pipeline.TranscriptTurn("c", 1, "user", medium, "",
                new java.sql.Timestamp(0L)),
              Budgets(maxInputBytes = Some(32 * 1024 * 1024)),
              VisibleTextOptions())
          case _    => HtmlParser.parse(medium)
        }
      }
    }, "profiled")
    worker.setDaemon(true)

    // warm up JIT first
    var i = 0
    while (i < 800) { HtmlParser.parse(medium); i += 1 }

    val counts = new java.util.HashMap[String, Integer]()
    val leafCounts = new java.util.HashMap[String, Integer]()
    worker.start()
    val t0 = System.nanoTime()
    var samples = 0
    while (System.nanoTime() - t0 < 8e9.toLong) {
      val st = worker.getStackTrace
      if (st.nonEmpty) {
        samples += 1
        // deepest graft frame (leaf attribution)
        st.find(f => f.getClassName.startsWith("graft")).foreach { f =>
          val line = if (f.getMethodName == "run") ":" + f.getLineNumber else ""
          val key = f.getClassName.replace("graft.core.", "") + "." + f.getMethodName + line
          leafCounts.merge(key, 1, (a, b) => a + b)
        }
        // every distinct graft frame on the stack (inclusive attribution)
        st.iterator.filter(_.getClassName.startsWith("graft"))
          .map(f => f.getClassName.replace("graft.core.", "") + "." + f.getMethodName)
          .distinct.foreach { key => counts.merge(key, 1, (a, b) => a + b) }
      }
      Thread.sleep(0, 500000)
    }
    running = false

    import scala.jdk.CollectionConverters._
    println(s"samples=$samples mode=$which")
    println("== leaf frames (self time) ==")
    leafCounts.asScala.toSeq.sortBy(-_._2).take(18).foreach { case (k, v) =>
      println(f"${v * 100.0 / samples}%6.2f%% $k")
    }
    println("== inclusive frames ==")
    counts.asScala.toSeq.sortBy(-_._2).take(14).foreach { case (k, v) =>
      println(f"${v * 100.0 / samples}%6.2f%% $k")
    }
  }
}

/** Quick single-thread core throughput check (same shapes as Bench). */
object CoreBenchProbe {
  def main(args: Array[String]): Unit = {
    val medium = "<div><h1>Title</h1><p>alpha beta gamma</p><ul><li>a</li><li>b</li><li>c</li></ul></div>" * 200
    val large = "<section><article><h2>x</h2><p>payload</p></article></section>" * 1200
    def run(html: String, iters: Int): Double = {
      def pass(k: Int): Double = {
        val t0 = System.nanoTime()
        var i = 0
        while (i < k) { HtmlParser.parse(html); i += 1 }
        (html.length.toLong * k / (1024.0 * 1024.0)) / ((System.nanoTime() - t0) / 1e9)
      }
      pass(iters); pass(iters)
      (1 to 3).map(_ => pass(iters)).max
    }
    println(f"parse_medium_mb_per_sec=${run(medium, 400)}%.2f")
    println(f"parse_large_mb_per_sec=${run(large, 80)}%.2f")
    // full extraction path (parse + provenance + spans), docs/sec
    val turn = graft.pipeline.TranscriptTurn("c", 1, "user", medium, "",
      new java.sql.Timestamp(0L))
    val budgets = Budgets(maxInputBytes = Some(32 * 1024 * 1024))
    def runExtract(iters: Int): Double = {
      def pass(k: Int): Double = {
        val t0 = System.nanoTime()
        var i = 0
        while (i < k) {
          graft.pipeline.Extraction.extractOne(turn, budgets, VisibleTextOptions())
          i += 1
        }
        k / ((System.nanoTime() - t0) / 1e9)
      }
      pass(iters); pass(iters)
      (1 to 3).map(_ => pass(iters)).max
    }
    println(f"extract_medium_docs_per_sec=${runExtract(300)}%.1f")
  }
}
