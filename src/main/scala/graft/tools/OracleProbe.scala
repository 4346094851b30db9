package graft.tools

import graft.core._

/** One-off probe: exact visibleText/serialize/span outputs for the HTML
  * templates used by SparkEntry oracle queries. Run:
  * sbt "runMain graft.tools.OracleProbe"
  */
object OracleProbe {
  def show(s: String): String =
    "[" + s.replace("\n", "\\n").replace("\t", "\\t").replace("\u00a0", "<NBSP>") + "]"

  def vt(html: String): String = VisibleText.ofDocument(HtmlParser.parse(html))

  def main(args: Array[String]): Unit = {
    val cases = Seq(
      "h1+2p"      -> "<h1>alpha</h1><p>b c</p><p>d</p>",
      "div p"      -> "<div><p>key agg row</p></div>",
      "table2x2"   -> "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>",
      "table th"   -> "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table>",
      "img inline" -> "<p>x <img alt=\"pic\"> y</p>",
      "img only"   -> "<p><img alt=\"pic\"></p>",
      "controls"   -> "<p><input type=\"submit\" value=\"go\"> <button value=\"v\">press</button></p>",
      "entities"   -> "<p>a &amp; b &#169; &copy; &copy &ampx</p>",
      "hidden"     -> "<p>a</p><div hidden><p>b</p></div><p aria-hidden=\"true\">c</p><p style=\"display:none\">d</p><p>e</p>",
      "pre"        -> "<pre>a  b\nc</pre>",
      "ul"         -> "<ul><li>a</li><li>b</li></ul>",
      "noscript"   -> "<p>a</p><noscript>&lt;b&gt;js off&lt;/b&gt;</noscript>",
      "br"         -> "<p>a<br>b</p>",
      "adoption"   -> "<p><b>x <i>y</b> z</i></p>",
      "select"     -> "<p>a</p><select><option>skip me</option></select><p>b</p>"
    )
    cases.foreach { case (n, h) => println(f"$n%-10s -> ${show(vt(h))}") }

    println("serialize <p>x</p> -> " + Serializer.serialize(HtmlParser.parse("<p>x</p>")))
    println("serialize h1+p     -> " + Serializer.serialize(HtmlParser.parse("<h1>a</h1><p>b</p>")))

    val src = "<p>word up</p>"
    val t = HtmlParser.parse(src, ParseOptions(captureSpans = true))
    Traversal.walk(t)((n, d) => println(s"  id=${n.id} kind=${n.kind} span=${n.span} prov=${n.spanProvenance}" +
      (n match { case e: ElementNode => " tag=" + e.tagName; case _ => "" })))

    println("outline: " + Traversal.outline(HtmlParser.parse("<h1>t</h1><section><h2>s</h2></section>").children))
    println("chunks: " + Traversal.chunk(HtmlParser.parse("<p>aaa</p><p>bbb</p>").children, ChunkOptions(maxChars = 4)))
    println("tokens <p>x</p>&copy: " + TokenizeApi.tokenize("<p>x</p>&copy").tokens)
    println("errors '<p><b>x': " + HtmlParser.parse("<p><b>x").errors.map(_.parseErrorId))
    println("errors '</br/>': " + HtmlParser.parse("</br/>").errors.map(_.parseErrorId))
    println("errors '<p>a<p>b': " + HtmlParser.parse("<p>a<p>b").errors.map(_.parseErrorId))
    println("errors '&copy x': " + HtmlParser.parse("<p>&copy x</p>").errors.map(_.parseErrorId))
    // vt tokens for "a\n\nb"
    println("vtTokens h1+2p: " + VisibleText.tokensOfDocument(HtmlParser.parse("<h1>alpha</h1><p>b c</p><p>d</p>")))
    // textContent (no normalization)
    println("textContent: " + show(Traversal.textContent(HtmlParser.parse("<div> a  b <span>c</span></div>").children)))
    // sniff
    println("sniff utf8 meta: " + EncodingSniff.sniffHtmlEncoding("<meta charset=utf-8><p>x</p>".getBytes("US-ASCII"), None))
    println("sniff default:   " + EncodingSniff.sniffHtmlEncoding("<p>x</p>".getBytes("US-ASCII"), None))
    println("sniff bom:       " + EncodingSniff.sniffHtmlEncoding(Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte, '<', 'p', '>'), None))
    // fragment
    println("fragment td: " + VisibleText.ofFragment(HtmlParser.parseFragment("a<td>b", "tr")))
    // patch
    val psrc = "<div id=\"a\">x</div>"
    val pt = HtmlParser.parse(psrc, ParseOptions(captureSpans = true))
    val divId = Traversal.findAllByTagName(pt.children, "div").next().id
    println("patch setattr: " + Patch.computePatch(psrc, Seq(SetAttr(divId, "id", "b"))).result)
    println("patch replace: " + Patch.computePatch(psrc, Seq(ReplaceText(divId + 0, "y"))).result) // may fail; target must be text
  }
}
