package graft.tools

import graft.core._
import graft.pipeline.{Extraction, TranscriptTurn, Transcripts}

/** Single-thread micro-profile of the per-turn extraction cost structure. */
object Profile {
  def time(name: String, n: Int)(f: Int => Unit): Unit = {
    var i = 0
    while (i < math.min(n, 2000)) { f(i); i += 1 } // JIT warm
    val t0 = System.nanoTime()
    i = 0
    while (i < n) { f(i); i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$name%-34s ${n / sec}%12.0f ops/s  (${sec * 1e6 / n}%8.1f us/op)")
  }

  def main(args: Array[String]): Unit = {
    val n = 20000
    val htmls = (0 until n).map(i => Transcripts.htmlFor(i.toLong * 2654435761L, i)).toArray
    val turns = (0 until n).map(i =>
      TranscriptTurn(f"c$i%06d", i, "user", htmls(i), "", new java.sql.Timestamp(0L))).toArray
    val avgLen = htmls.map(_.length).sum / n
    println(s"avg html len = $avgLen chars")

    time("parse", n)(i => HtmlParser.parse(htmls(i)))
    time("parse+captureSpans", n)(i => HtmlParser.parse(htmls(i), ParseOptions(captureSpans = true)))
    time("parse+visibleText", n) { i =>
      VisibleText.ofDocument(HtmlParser.parse(htmls(i)))
    }
    time("parse+vt+tokensWithProvenance", n) { i =>
      val t = HtmlParser.parse(htmls(i), ParseOptions(captureSpans = true))
      VisibleText.ofDocument(t)
      VisibleText.tokensWithProvenance(t.children)
    }
    time("extractOne (full)", n)(i =>
      Extraction.extractOne(turns(i), Extraction.DefaultBudgets, VisibleTextOptions()))

    // thread-per-batch overhead probe
    time("spawn 64MB-stack thread", 2000) { _ =>
      val t = new Thread(null, () => (), "probe", 64L * 1024 * 1024)
      t.start(); t.join()
    }
  }
}

/** Plain-thread scaling probe for extractOne (no Spark). */
object ThreadScale {
  def main(args: Array[String]): Unit = {
    import graft.pipeline.{Extraction, TranscriptTurn, Transcripts}
    import graft.core.VisibleTextOptions
    val n = 40000
    val turns = (0 until n).map(i =>
      TranscriptTurn(f"c$i%06d", i, "user",
        Transcripts.htmlFor(i.toLong * 2654435761L, i), "",
        new java.sql.Timestamp(0L))).toArray
    val mode = sys.env.getOrElse("MODE", "full")
    val work: Int => Unit = mode match {
      case "parse" => i => { graft.core.HtmlParser.parse(turns(i).text); () }
      case "parsevt" => i => {
        val t = graft.core.HtmlParser.parse(turns(i).text)
        graft.core.VisibleText.ofDocument(t); ()
      }
      case "prov" => i => {
        val t = graft.core.HtmlParser.parse(turns(i).text)
        graft.core.VisibleText.extractWithProvenance(t.children); ()
      }
      case _ => i => { Extraction.extractOne(turns(i), Extraction.DefaultBudgets, VisibleTextOptions()); () }
    }
    def run(threads: Int): Double = {
      val t0 = System.nanoTime()
      val ths = (0 until threads).map { t =>
        new Thread(null, () => {
          var i = t
          while (i < n) { work(i); i += threads }
        }, s"w$t", 64L * 1024 * 1024)
      }
      ths.foreach(_.start()); ths.foreach(_.join())
      n / ((System.nanoTime() - t0) / 1e9)
    }
    run(4) // warm
    println(s"mode=$mode")
    for (t <- Seq(1, 4, 8, 32))
      println(f"threads=$t%2d  ${run(t)}%9.0f docs/s")
  }
}
