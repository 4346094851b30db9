package graft.tools

import graft.core._

/** Scratch probe: print the engine's exact visibleText / error output for
  * the adversarial templates used by the q_adversarial_* driver queries, so
  * the closed-form DuckDB oracles can be written (and audited) against real
  * behavior. Stand-ins: lang=alpha text="beta one two" source=gamma.
  */
object AdversarialProbe {
  def main(args: Array[String]): Unit = {
    val lang = "alpha"; val text = "beta one two"; val source = "gamma"

    def show(name: String, html: String): Unit = {
      val tree = HtmlParser.parse(html)
      val vt = VisibleText.ofDocument(tree)
      println(s"== $name")
      println(s"   html: $html")
      println(s"   vt  : ${vt.replace("\n", "\\n").replace("\t", "\\t")}")
      println(s"   errs: ${tree.errors.length} ${tree.errors.take(4).map(_.parseErrorId).mkString(",")}")
    }

    show("adoption", s"<p><b>$lang <i>$text</b> $source</i></p>")
    show("foster", s"<table>$lang<tr><td>$text</td></tr></table>")
    show("entities", s"<p>$text &#150; &#xA9; &#65; &amp</p>")
    show("soup", s"<p>$lang<p>$text<div>$source")
    show("comment-eof", s"<p>$lang</p><!-- $text")
    show("misnested-table", s"<b><table><td>$lang</td><tr><td>$text</table></b>$source")

    show("foreign-svg", s"<p>$lang</p><svg><title>$source</title><text>$text</text></svg><p>$source</p>")
    show("template", s"<p>$lang</p><template><p>$text</p></template><p>$source</p>")
    show("rawtext", s"<script>var x = '$text';</script><style>.a{}</style><p>$lang</p>")
    show("plaintext", s"<p>$lang</p><plaintext>$text<b>$source</b>")
    show("noscript", s"<p>$lang</p><noscript><p>$text</p></noscript><p>$source</p>")
    show("frameset", s"<frameset><frame></frameset><noframes>$text</noframes>")

    // utf-16 bytes path
    val html16 = s"<p>$text</p>"
    val le = Array[Byte](0xFF.toByte, 0xFE.toByte) ++ html16.getBytes("UTF-16LE")
    val be = Array[Byte](0xFE.toByte, 0xFF.toByte) ++ html16.getBytes("UTF-16BE")
    println("== utf16le vt: " + VisibleText.ofDocument(HtmlParser.parseBytes(le)))
    println("== utf16be vt: " + VisibleText.ofDocument(HtmlParser.parseBytes(be)))

    // budget trip: deep nesting
    val deep = "<div>" * 300 + text + "</div>" * 300
    try {
      val t = HtmlParser.parse(deep, ParseOptions(budgets = Some(Budgets(maxDepth = Some(256)))))
      println("== deep: no throw, errors=" + t.errors.map(_.parseErrorId).mkString(","))
    } catch {
      case e: BudgetExceededException =>
        println(s"== deep threw: budget=${e.payload.budget} limit=${e.payload.limit} actual=${e.payload.actual}")
    }
    val shallow = "<div>" * 10 + text + "</div>" * 10
    try {
      val t = HtmlParser.parse(shallow, ParseOptions(budgets = Some(Budgets(maxDepth = Some(256)))))
      println("== shallow ok vt=" + VisibleText.ofDocument(t))
    } catch {
      case e: BudgetExceededException => println("== shallow threw " + e.payload.budget)
    }

    // --- round-3 extraction corners (reference mod.ts:1233-1372) ---
    show("pre-nested",
      s"<pre><div>$lang\n$source</div></pre><div>$lang\n$source</div><p>$text</p>")
    show("textarea-table",
      s"<table><tr><td><textarea>$lang\n$source</textarea></td><td>$text</td></tr></table>")
    show("nested-table",
      s"<table><tr><td>$lang</td><td><table><tr><td>$source</td><td>$text</td></tr></table></td><td>$lang</td></tr></table>")
    show("aria-edge",
      s"""<p><span aria-hidden="">$source</span><span aria-hidden="false">$lang</span> <span aria-hidden="0">$source</span> <span aria-hidden=" TRUE ">$text</span><span aria-hidden="yes">$text</span><i style="display : none">$text</i><i style="CONTENT-VISIBILITY:Hidden">$text</i></p>""")

    val accHtml =
      s"""<p><input type="text" aria-label="$lang"> $text <input type="submit" value="$source" aria-label="zz"> <input type="hidden" aria-label="zz"> <input type="search" aria-label="  ">end</p>"""
    val accTree = HtmlParser.parse(accHtml)
    val accVt = VisibleText.ofDocument(accTree,
      VisibleTextOptions(includeAccessibleNameFallback = true))
    println(s"== accname vt: ${accVt.replace("\n", "\\n").replace("\t", "\\t")}")

    val provHtml = s"<h1>$lang</h1><p>$text</p><table><tr><td>$source</td><td>$lang</td></tr></table>"
    val provTree = HtmlParser.parse(provHtml)
    val (pvOut, pvToks) = VisibleText.extractWithProvenance(provTree.children)
    val degraded = pvToks.nonEmpty && pvToks.forall(_.sourceNodeId.isEmpty)
    println(s"== prov out: ${pvOut.replace("\n", "\\n").replace("\t", "\\t")}")
    println(s"== prov n_tokens=${pvToks.length} degraded=$degraded kinds=${pvToks.map(_.kind).mkString(",")}")
  }
}

object TraceProbe {
  def main(args: Array[String]): Unit = {
    val lang = "alpha"; val text = "beta one two"; val source = "gamma"
    def show(name: String, html: String): Unit = {
      val tree = graft.core.HtmlParser.parse(html,
        graft.core.ParseOptions(trace = true))
      val ev = tree.trace.get
      val trans = ev.collect { case t: graft.core.TraceInsertionModeTransitionEvent => t }
      val perr = ev.collect { case p: graft.core.TraceParseErrorEvent => p }
      val tok = ev.collect { case t: graft.core.TraceTokenEvent => t.count }.head
      println(s"$name: n_events=${ev.length} n_transitions=${trans.length} n_perr=${perr.length} n_tokens=$tok last_to=${trans.last.toMode}")
    }
    show("plain", s"<p>$text</p>")
    show("table", s"<table>$lang<tr><td>$text</td></tr></table>")
    show("misnest", s"<p><b>$lang <i>$text</b> $source</i></p>")
  }
}
