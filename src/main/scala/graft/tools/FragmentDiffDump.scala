package graft.tools

import java.util.Base64

import graft.core.{Serializer, TreeBuilder}

/** Differential-oracle helper (Scala side of
  * scripts/conformance/ref_fragment_dump.mjs): each input line is
  * base64("context html"); print base64(normalized fragment tree). The
  * select compat patch is bypassed, matching the raw-parse5 JS side.
  */
object FragmentDiffDump {
  def main(args: Array[String]): Unit = {
    val out = new java.lang.StringBuilder
    scala.io.Source.fromFile(args(0), "UTF-8").getLines().foreach { line =>
      if (line.nonEmpty) {
        val payload = new String(Base64.getDecoder.decode(line), "UTF-8")
        val sep = payload.indexOf(' ')
        val context = payload.substring(0, sep)
        val html = payload.substring(sep + 1)
        val normalized =
          try {
            val builder = new TreeBuilder(html, true, false, (_, _, _) => ())
            val root = builder.parseFragment(context.trim.toLowerCase)
            Serializer.normalizeTree(root)
          } catch { case e: Throwable => s"THREW: ${e.getMessage}" }
        val marked = if (normalized.isEmpty) "(EMPTY)" else normalized
        out.append(Base64.getEncoder.encodeToString(marked.getBytes("UTF-8"))).append('\n')
      }
    }
    print(out)
  }
}
