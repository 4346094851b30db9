package graft.tools

import java.util.Base64

import graft.core.{Serializer, TreeBuilder}

/** Differential-oracle helper (Scala side of
  * scripts/conformance/ref_tree_dump.mjs): read one base64(html) per line
  * from the file in args(0), print one base64(normalized tree) per line.
  *
  * The select/option compat patch is intentionally NOT applied: the JS side
  * dumps raw vendored-parse5 semantics, and the patch (a fixture-compat
  * rewrite layered on top) is covered by the sbt conformance suite.
  */
object TreeDiffDump {
  def main(args: Array[String]): Unit = {
    val out = new java.lang.StringBuilder
    scala.io.Source.fromFile(args(0), "UTF-8").getLines().foreach { line =>
      if (line.nonEmpty) {
        val html = new String(Base64.getDecoder.decode(line), "UTF-8")
        val normalized =
          try {
            val builder = new TreeBuilder(html, true, false, (_, _, _) => ())
            Serializer.normalizeTree(builder.parseDocument())
          } catch { case e: Throwable => s"THREW: ${e.getMessage}" }
        out.append(Base64.getEncoder.encodeToString(normalized.getBytes("UTF-8"))).append('\n')
      }
    }
    print(out)
  }
}
