package graft.tools

import graft.core._

/** Quick single-thread core parse throughput probe (same shapes as
  * Bench.coreBench) for A/B-ing tokenizer/tree-builder changes without
  * spinning up Spark.
  */
object CoreBenchOnly {
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
      pass(iters)
    }
    println(f"parse_medium_mb_per_sec=${run(medium, 400)}%.2f")
    println(f"parse_large_mb_per_sec=${run(large, 80)}%.2f")
  }
}
