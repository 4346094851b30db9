package graft.tools

import graft.core._

/** Manual end-to-end smoke driver for the core library public API.
  * Run: sbt "runMain graft.tools.Smoke"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    // 1. realistic messy document through the public API
    val html = """<!DOCTYPE html><html><head><meta charset="utf-8"><title>My Page</title>
    <style>body{color:red}</style></head><body>
    <nav><ul><li><a href="/">Home</a></li><li hidden><a href="/x">Secret</a></li></ul></nav>
    <article><h1>Caf&eacute; &amp; Friends</h1><p>First &para; of text with <b>bold <i>and</b> italic</i> misnesting.</p>
    <table><tr><th>Name</th><th>Qty</th></tr><tr><td>Apples</td><td>3</td></tr></table>
    <pre>  spaced
      lines  </pre><img alt="A photo" src="x.jpg"><br><input type="submit" value="Send it">
    <script>var x = "<p>not text</p>";</script><noscript><b>Enable JS</b></noscript>
    </article></body></html>"""
    val tree = HtmlParser.parse(html)
    println("=== visibleText ===")
    println(VisibleText.ofDocument(tree))
    println("=== tokens (first 8) ===")
    println(VisibleText.tokensOfDocument(tree).take(8))
    println("=== provenance (first 5) ===")
    println(VisibleText.tokensWithProvenance(tree.children).take(5))
    println("=== errors: " + tree.errors.map(_.parseErrorId).mkString(","))
    // 2. probes
    println("=== unclosed/garbage ===")
    println(VisibleText.ofDocument(HtmlParser.parse("<div><p>a<p>b<table><td>cell")))
    println("=== entity legacy ===")
    println(VisibleText.ofDocument(HtmlParser.parse("<p>&notin; &notx &amp=1 &#x48;&#105 &#xD83D;&#xDE00;</p>")))
    println("=== CRLF ===")
    println(VisibleText.ofDocument(HtmlParser.parse("<pre>a b\r\nc\rd</pre>")).replace("\n","[NL]"))
    println("=== empty & whitespace only ===")
    println("[" + VisibleText.ofDocument(HtmlParser.parse("")) + "]")
    println("[" + VisibleText.ofDocument(HtmlParser.parse("   \n\t  ")) + "]")
    println("=== serialize roundtrip ===")
    val t2 = HtmlParser.parse("<p class=x data-y='2'>hi<br>there</p>")
    val ser = Serializer.serialize(t2)
    println(ser)
    println("fixpoint: " + (Serializer.serialize(HtmlParser.parse(ser)) == ser))
    println("=== spans ===")
    val src = "<div id=\"main\">Hello</div>"
    val sp = HtmlParser.parse(src, ParseOptions(captureSpans = true))
    val div = Traversal.findAllByTagName(sp.children, "div").next()
    println("div span=" + div.span + " slice=" + div.span.map(s => src.substring(s.start, s.end)))
    println("=== patch ===")
    val psrc = "<div id=\"a\">x</div>"
    val ptree = HtmlParser.parse(psrc, ParseOptions(captureSpans = true))
    Traversal.walk(ptree)((n, d) => println("  node id=" + n.id + " kind=" + n.kind))
    val divId = Traversal.findAllByTagName(ptree.children, "div").next().id
    val plan = Patch.computePatch(psrc, Seq(SetAttr(divId, "id", "b")))
    println(plan.result)
    println("=== parseBytes + sniff ===")
    val bytes = "<html><head><meta charset=\"utf-8\"><body><p>café".getBytes("UTF-8")
    println(VisibleText.ofDocument(HtmlParser.parseBytes(bytes)))
    val win = Array[Byte]('<','p','>', 0xE9.toByte, '<','/','p','>')
    println(VisibleText.ofDocument(HtmlParser.parseBytes(win)))
    println("=== budgets ===")
    try HtmlParser.parse("<div>" * 100, ParseOptions(budgets = Some(Budgets(maxNodes = Some(10)))))
    catch { case e: BudgetExceededException => println("budget threw: " + e.getMessage) }
    println("=== deep nesting (10k) on a 64MB-stack worker thread ===")
    val deep = "<div>" * 10000 + "x" + "</div>" * 10000
    @volatile var deepResult: String = null
    @volatile var deepError: Throwable = null
    val worker = new Thread(null, () => {
      try deepResult = VisibleText.ofDocument(HtmlParser.parse(deep))
      catch { case t: Throwable => deepError = t }
    }, "graft-deep", 64L * 1024 * 1024)
    worker.start(); worker.join()
    println(if (deepError != null) "FAILED: " + deepError else "ok: [" + deepResult.take(5) + "]")
    println("=== same on default stack (expected to overflow, caught) ===")
    try println("unexpected ok: " + VisibleText.ofDocument(HtmlParser.parse(deep)).take(3))
    catch { case _: StackOverflowError => println("StackOverflowError as expected -> pipeline must use big-stack worker threads") }
    println("=== tokenize API ===")
    println(TokenizeApi.tokenize("<a href=x>T</a>&copy").tokens)
    println("=== trace API ===")
    val traced = HtmlParser.parse("<table><tr><td>a</td></tr>x</table>",
      ParseOptions(trace = true))
    println("trace kinds: " + traced.trace.get.map(_.kind).distinct.mkString(","))
    println("trace events: " + traced.trace.get.length +
      ", first json: " + traced.trace.get.head.toJson)
    println("=== fixture serializer ===")
    import FixtureSerializer._
    println(FixtureSerializer.serialize(Seq(
      FixtureStartTag(None, "p", Vector(FixtureAttr(None, "z", "1"), FixtureAttr(None, "a", "2"))),
      FixtureCharacters("x"), FixtureEndTag(None, "p"),
      FixtureStartTag(None, "p", Vector.empty), FixtureCharacters("y"),
      FixtureEndTag(None, "p"))))
    println("=== tokens -> tree (parseTokens) ===")
    val viaTokens = HtmlParser.parseTokens(TokenizeApi.tokenize("<ul><li>1<li>2</ul>").tokens)
    println(Serializer.serialize(viaTokens))
    println("=== main-content selection (boilerplate strip) ===")
    val page = """<div class="nav"><a href="#">home</a> <a href="#">about</a> <a href="#">contact us</a></div>""" +
      """<article><h1>the headline</h1><p>the actual story body with enough characters to win</p></article>""" +
      """<div class="footer"><a href="#">privacy</a> copyright twenty twenty six</div>"""
    val main = MainContent.fromHtml(page, captureSpans = true).get
    println("winner=" + main.tagName + " score=" + main.score +
      " linkDensity=" + main.linkDensity + " span=" + main.span)
    println("text: " + main.text.replace("\n", "[NL]"))
    println("fallback (no candidate): [" +
      MainContent.extractOrDocument(HtmlParser.parse("<p>short</p>")) + "]")
    println("=== PDF parse + layout (classic xref / xref-stream+ObjStm) ===")
    for (id <- Seq(1L, 9L)) { // 1 = classic table, 9 = modern xref stream
      val pdf = graft.ops.Pdf.parse(graft.ops.PdfGen.syntheticPdf(id))
      val ok = pdf.text == graft.ops.PdfGen.expectedText(id)
      println(s"id=$id v=${pdf.version} pages=${pdf.pages.length} " +
        s"lines0=${pdf.pages.head.lines.length} " +
        s"y0=${pdf.pages.head.lines.head.y} closedFormMatch=$ok warn=${pdf.warnings}")
    }
    try graft.ops.Pdf.parse("not a pdf at all".getBytes)
    catch { case e: graft.ops.PdfParseException => println("poison payload -> " + e.getMessage) }
    println("=== audio decode (RIFF/WAVE PCM) ===")
    for (id <- Seq(2L, 3L)) { // 2 = 16-bit mono, 3 = 8-bit stereo + junk LIST
      val d = graft.ops.Audio.decodeOne(id, graft.ops.Audio.syntheticWav(id))
      println(s"id=$id fmt=${d.meta.format} c=${d.meta.channels} " +
        s"bits=${d.meta.bits} frames=${d.meta.nFrames} us=${d.duration_us} " +
        s"sum=${d.sample_sum} feat=${d.feature.length}")
    }
    println("non-wav payload -> " +
      graft.ops.Audio.decodeOne(0L, "just text".getBytes).meta.format)
    println("DONE")

  }
}