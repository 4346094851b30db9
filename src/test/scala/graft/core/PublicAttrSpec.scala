package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Public-tree attribute normalization fidelity (reference:
  * src/internal/tree/build.ts:195-235 + formatAttributeName :145-150).
  *
  * parse5 adjusts foreign attributes by moving the `xlink:`/`xml:`/`xmlns:`
  * qualifier into a separate prefix field, so the reference's
  * formatAttributeName sees a colon-free name and surfaces the LOCAL name in
  * the public tree; post-format collisions keep the first occurrence; and
  * adjusted attributes carry no span because the reference's location lookup
  * is keyed by the tokenized (pre-adjustment) name.
  */
class PublicAttrSpec extends AnyFunSuite {

  private def firstElement(nodes: Vector[HtmlNode], tag: String): ElementNode = {
    def walk(ns: Vector[HtmlNode]): Option[ElementNode] = ns.collectFirst {
      case e: ElementNode if e.tagName == tag => e
    }.orElse(ns.collectFirst {
      case e: ElementNode if walk(e.children).isDefined => walk(e.children).get
    })
    walk(nodes).getOrElse(fail(s"no <$tag> in tree"))
  }

  test("adjusted foreign attrs surface under their local name") {
    val doc = HtmlParser.parse("<svg><use xlink:href='#a' xml:lang='en' xmlns:xlink='x' xmlns='s'/></svg>")
    val use = firstElement(doc.children, "use")
    assert(use.attributes.map(_.name) == Vector("href", "lang", "xlink", "xmlns"))
  }

  test("post-format collision keeps the first occurrence") {
    // `href` and `xlink:href` are distinct at tokenization, but both format
    // to `href` after adjustment; the reference keeps the first.
    val doc = HtmlParser.parse("<svg><use href='plain' xlink:href='#adj'/></svg>")
    val use = firstElement(doc.children, "use")
    assert(use.attributes.map(a => (a.name, a.value)) == Vector("href" -> "plain"))

    val doc2 = HtmlParser.parse("<svg><use xlink:href='#adj' href='plain'/></svg>")
    val use2 = firstElement(doc2.children, "use")
    assert(use2.attributes.map(a => (a.name, a.value)) == Vector("href" -> "#adj"))
  }

  test("adjusted attrs lose spans; unadjusted attrs keep them") {
    val doc = HtmlParser.parse(
      "<svg viewBox='0 0 1 1' id='k'><use xlink:href='#a'/></svg>",
      ParseOptions(captureSpans = true)
    )
    val svg = firstElement(doc.children, "svg")
    val byName = svg.attributes.map(a => a.name -> a.span).toMap
    assert(byName("viewBox").isEmpty) // case-adjusted -> lookup miss in reference
    assert(byName("id").isDefined)
    val use = firstElement(doc.children, "use")
    assert(use.attributes.map(_.name) == Vector("href"))
    assert(use.attributes.head.span.isEmpty)

    // plain xmlns is namespace-adjusted but NOT renamed -> span survives
    val doc2 = HtmlParser.parse("<svg xmlns='s'></svg>", ParseOptions(captureSpans = true))
    val svg2 = firstElement(doc2.children, "svg")
    assert(svg2.attributes.map(_.name) == Vector("xmlns"))
    assert(svg2.attributes.head.span.isDefined)
  }

  test("mathml definitionURL is case-adjusted and unprefixed") {
    val doc = HtmlParser.parse("<math definitionurl='d'><mi>x</mi></math>")
    val math = firstElement(doc.children, "math")
    assert(math.attributes.map(_.name) == Vector("definitionURL"))
  }

  // Regression (divergence #16, seed 0xF00DFACE): when _resetInsertionMode
  // lands on a FOREIGN-namespace <template> (tagID-based, namespace-blind)
  // with an empty template-mode stack, parse5's insertion mode becomes
  // literal `undefined`. From then on every HTML-rule token — INCLUDING
  // EOF — falls through the dispatch's `default: do nothing`, so stopParse
  // never runs and still-open elements keep their initial start-tag-only
  // spans (no EOF end-location walk). Expected spans captured from the
  // reference's public layer under node.
  test("undefined insertion mode at EOF: no end-location walk, tokens dropped") {
    val doc = HtmlParser.parse(
      "<svg style=a>alpha<template x=1>A<desc class=c>trail <template y=2>B</template><title hidden>z",
      ParseOptions(captureSpans = true))
    val svg = Traversal.findAllByTagName(doc.children, "svg").next()
    assert(svg.span.contains(Span(0, 13))) // start-tag span only, NOT EOF 95
    val templates = Traversal.findAllByTagName(doc.children, "template").toVector
    assert(templates.map(_.span) ==
      Vector(Some(Span(18, 32)), Some(Span(53, 79)))) // outer: start tag; inner: </template>
    val desc = Traversal.findAllByTagName(doc.children, "desc").next()
    assert(desc.span.contains(Span(33, 47)))
    // <title hidden> and the trailing z arrive in the undefined mode: dropped
    assert(!Traversal.findAllByTagName(doc.children, "title").hasNext)
    assert(!Traversal.textContent(doc.children).contains("z"))
  }

  // Contrast case: same shape WITHOUT the inner HTML template close, so the
  // mode stays defined — title IS inserted (RCDATA swallows the tail) and
  // at EOF parse5 pops it via eofInText with `currentToken` still the title
  // START tag (currentToken only updates on tag tokens), giving end =
  // that tag's START offset; the stopParse walk then stamps the rest.
  test("text-mode EOF: title end from the stale start-tag token, others EOF-stamped") {
    val in = "<svg style=a>alpha<template x=1>A<desc class=c>trail<title hidden>z"
    val doc = HtmlParser.parse(in, ParseOptions(captureSpans = true))
    val svg = Traversal.findAllByTagName(doc.children, "svg").next()
    assert(svg.span.contains(Span(0, in.length)))
    val title = Traversal.findAllByTagName(doc.children, "title").next()
    assert(title.span.contains(Span(52, 52)))
    val desc = Traversal.findAllByTagName(doc.children, "desc").next()
    assert(desc.span.contains(Span(33, in.length)))
  }

  test("unadjusted html-content attrs keep the qualified form") {
    // outside foreign content no adjustment runs: `xlink:href` stays verbatim
    val doc = HtmlParser.parse("<div xlink:href='u' data-x='1'>t</div>")
    val div = firstElement(doc.children, "div")
    assert(div.attributes.map(_.name) == Vector("xlink:href", "data-x"))
  }
}
