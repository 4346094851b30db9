package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Token post-normalizers (doubleEscaped / xmlViolation fixture modes,
  * reference tokenize.ts:28-66) and tokens→tree reconstruction
  * (buildTreeFromTokens, reference build.ts:579-582).
  */
class TokenApiSpec extends AnyFunSuite {

  test("doubleEscaped replaces NUL and literal \\u0000 in character data") {
    val toks = TokenizeApi.tokenize("a\u0000b", TokenizeOpts(doubleEscaped = true)).tokens
    assert(toks == Vector(CharsTok("a�b"), EofTok))
    val lit = TokenizeApi.tokenize("a\\u0000b", TokenizeOpts(doubleEscaped = true)).tokens
    assert(lit == Vector(CharsTok("a\\uFFFDb"), EofTok))
    // without the mode, NUL passes through (data state keeps it raw here)
    val plain = TokenizeApi.tokenize("a\u0000b").tokens
    assert(plain == Vector(CharsTok("a\u0000b"), EofTok))
  }

  test("xmlViolationMode maps noncharacters and form feeds") {
    val toks = TokenizeApi.tokenize("a￾b\fc",
      TokenizeOpts(xmlViolationMode = true)).tokens
    assert(toks == Vector(CharsTok("a�b c"), EofTok))
  }

  test("xmlViolationMode rewrites double hyphens inside comments") {
    val toks = TokenizeApi.tokenize("<!--a&b-->",
      TokenizeOpts(xmlViolationMode = true)).tokens
    assert(toks == Vector(CommentTok("a&b"), EofTok))
    val doubled = TokenizeApi.tokenize("x", TokenizeOpts()) // sanity
    assert(doubled.tokens.last == EofTok)
  }

  test("doubleEscaped NUL replacement applies to comment data") {
    val toks = TokenizeApi.tokenize("<!--a\u0000b-->",
      TokenizeOpts(doubleEscaped = true)).tokens
    assert(toks == Vector(CommentTok("a�b"), EofTok))
  }

  test("serializeForReparse renders all token kinds") {
    val html = TokenizeApi.serializeForReparse(Seq(
      DoctypeToken("html", None, None, false),
      StartTagTok("div", Vector("class" -> "x", "class" -> "dup", "id" -> "a\"b"), false),
      CharsTok("1 < 2 & 3"),
      CommentTok(" c "),
      StartTagTok("br", Vector.empty, true),
      EndTagTok("div"),
      EofTok))
    assert(html ==
      "<!DOCTYPE html><div class=\"x\" id=\"a&quot;b\">1 &lt; 2 &amp; 3<!-- c --><br/></div>")
  }

  test("serializeForReparse renders public/system doctypes") {
    val html = TokenizeApi.serializeForReparse(Seq(
      DoctypeToken("html", Some("pub"), Some("sys"), false)))
    assert(html == "<!DOCTYPE html \"pub\" \"sys\">")
  }

  test("parseTokens(tokenize(x)) equals parse(x) on non-rawtext documents") {
    val cases = Seq(
      "<p>hello</p>",
      "<div class=\"x\"><span id=y>a</span> b</div>",
      "<!DOCTYPE html><html><head></head><body><p>t</p></body></html>",
      "<table>x<tr><td>cell</td></tr></table>", // foster parenting
      "<p><b>a<i>b</b>c</i></p>",               // adoption agency
      "<ul><li>1<li>2</ul>",                     // implied end tags
      "<!--c--><p>after</p>",
      "<p>café &amp; more</p>"
    )
    cases.foreach { html =>
      val direct = HtmlParser.parse(html)
      val viaTokens = HtmlParser.parseTokens(TokenizeApi.tokenize(html).tokens)
      assert(Serializer.serialize(viaTokens) == Serializer.serialize(direct), html)
    }
  }

  test("parseTokens escapes rawtext content like the reference round trip") {
    // the serialize-and-reparse trick escapes `<` inside script text, so the
    // rebuilt tree holds the escaped form — reference-exact behavior
    val toks = Seq(StartTagTok("script", Vector.empty, false),
      CharsTok("a<b"), EndTagTok("script"), EofTok)
    val tree = HtmlParser.parseTokens(toks)
    val script = Traversal.findAllByTagName(tree.children, "script").next()
    assert(script.children.collect { case t: TextNode => t.value }.mkString == "a&lt;b")
  }
}
