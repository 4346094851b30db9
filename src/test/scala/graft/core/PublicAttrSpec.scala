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

  test("unadjusted html-content attrs keep the qualified form") {
    // outside foreign content no adjustment runs: `xlink:href` stays verbatim
    val doc = HtmlParser.parse("<div xlink:href='u' data-x='1'>t</div>")
    val div = firstElement(doc.children, "div")
    assert(div.attributes.map(_.name) == Vector("xlink:href", "data-x"))
  }
}
