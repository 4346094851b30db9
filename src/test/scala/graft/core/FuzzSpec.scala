package graft.core

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property/fuzz layer mirroring the reference's seeded structured fuzzer
  * (reference: scripts/fuzz/run-fuzz.mjs:11-41 — element/attr vocabularies;
  * properties: total behavior except budget errors, determinism,
  * parse→serialize→parse fixpoint).
  */
class FuzzSpec extends AnyFunSuite {

  /** Run a ScalaCheck property with a fixed seed (deterministic fuzz). */
  private def check(prop: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(120)
      .withInitialSeed(org.scalacheck.rng.Seed(0x9e3779b9L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val tagGen = Gen.oneOf("div", "span", "p", "a", "section", "article",
    "ul", "li", "table", "tbody", "tr", "td", "dl", "dt", "dd", "b", "i",
    "pre", "select", "option", "noscript", "svg", "title", "script", "style")
  private val attrNameGen = Gen.oneOf("class", "id", "data-x", "data-y",
    "title", "lang", "dir", "style", "hidden", "aria-hidden")
  private val attrValGen = Gen.oneOf("v", "a b", "x\ny", "<unsafe>", "it's",
    "q\"q", "", "display:none")
  private val textGen = Gen.oneOf("hello", "a  b", "x & y < z", "&amp;",
    "&copy", "&#169;", "line1\nline2", "\t tab", "é中")

  // Tags WITHOUT rawtext/RCDATA or compat-patch semantics: the reference's
  // public serializer escapes text unconditionally (even inside
  // style/script, reference mod.ts:946-948), so parse→serialize→parse is
  // only a fixpoint outside rawtext containers — exactly like the
  // reference's own curated roundtrip fixtures (test/control/roundtrip).
  private val roundtripTagGen = Gen.oneOf("div", "span", "p", "a", "section",
    "article", "ul", "li", "table", "tbody", "tr", "td", "dl", "dt", "dd",
    "b", "i", "pre")

  private def mkFragmentGen(tags: Gen[String]): Gen[String] = {
    def node(depth: Int): Gen[String] =
      if (depth <= 0) textGen
      else Gen.frequency(
        3 -> textGen,
        1 -> Gen.const("<!-- c -->"),
        1 -> (for { t <- tags } yield s"<$t>"), // unclosed
        1 -> (for { t <- tags } yield s"</$t>"), // stray close
        4 -> (for {
          t <- tags
          an <- attrNameGen
          av <- attrValGen
          kids <- Gen.listOfN(2, node(depth - 1))
        } yield s"""<$t $an="${av.replace("\"", "")}">${kids.mkString}</$t>"""))
    Gen.listOfN(4, node(3)).map(_.mkString)
  }

  private val fragmentGen: Gen[String] = mkFragmentGen(tagGen)
  private val roundtripGen: Gen[String] = mkFragmentGen(roundtripTagGen)

  test("no-hang: seeded adversarial corpus parses + extracts within budget") {
    // mirror of the reference's fuzz no-hang gate (scripts/fuzz/run-fuzz.mjs:
    // ≤25 ms/doc over 600 seeded docs) with pathological-by-construction
    // inputs and a generous budget so a loaded CI host cannot flake it —
    // what it guards against is quadratic blowups (formatting towers,
    // adoption-agency pressure, attr floods, NUL floods), which show up as
    // seconds, not milliseconds
    val rng = new scala.util.Random(0x9e3779b9L)
    val pathological = Seq(
      "<b><i><u><s>" * 300 + "x",                    // reconstruct tower
      "<p>" * 1000 + "x",
      "<table>" * 200 + "x",
      "<a href=x>" * 500 + "y",                      // Noah's Ark pressure
      "</b>" * 2000,
      "<div " + (1 to 300).map(i => s"a$i=v").mkString(" ") + ">x</div>",
      "\u0000" * 2000, // NUL flood (batched tokens)
      "&" + "amp" * 1000 + ";",
      "<svg>" + "<![CDATA[x]]>" * 500,
      "<!--" + "x" * 10000,
      "<li>" * 800 + "</li>" * 800,
      "<b>" * 64 + "<div>" * 64 + "</b>" * 64 + "x") // adoption agency runs
    val vocab = Vector("<div>", "</div>", "<b>", "</i>", "<table>", "<td>",
      "</p>", "<svg>", "</math>", "x y ", "&amp;", "&#0;", "<!-- c -->",
      "\u0000", "<a href=1>", "</a>", "<template>", "<select>", "<option>")
    def randDoc(): String =
      (0 until (20 + rng.nextInt(60))).map(_ => vocab(rng.nextInt(vocab.length))).mkString
    val docs = pathological ++ Vector.fill(588)(randDoc())
    // deep towers need the pipeline's 64MB worker stack (see Extraction)
    var slow: Seq[(Int, Double)] = null
    var thrown: Throwable = null
    val worker = new Thread(null, () => {
      try {
        docs.take(30).foreach(d => VisibleText.ofDocument(HtmlParser.parse(d))) // JIT warm
        slow = docs.zipWithIndex.flatMap { case (d, i) =>
          val t0 = System.nanoTime()
          VisibleText.ofDocument(HtmlParser.parse(d))
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 500.0) Some(i -> ms) else None
        }
      } catch { case t: Throwable => thrown = t }
    }, "fuzz-nohang", 64L * 1024 * 1024)
    worker.start(); worker.join(120000L)
    assert(thrown == null, s"no-hang corpus threw: $thrown")
    assert(slow != null, "no-hang corpus did not finish within 120s")
    assert(slow.isEmpty, s"docs over 500ms budget: $slow")
  }

  test("parser is total: never throws on structured-fuzz inputs") {
    check(Prop.forAll(fragmentGen) { html =>
      val tree = HtmlParser.parse(html)
      VisibleText.ofDocument(tree)
      VisibleText.tokensOfDocument(tree)
      VisibleText.tokensWithProvenance(tree.children)
      Serializer.serialize(tree)
      true
    })
  }

  test("trace mode is total and well-formed on structured-fuzz inputs") {
    check(Prop.forAll(fragmentGen) { html =>
      val tree = HtmlParser.parse(html, ParseOptions(trace = true))
      val events = tree.trace.get
      // seq strictly increasing, events render to JSON, required kinds present
      events.zipWithIndex.forall { case (e, i) => e.seq == i + 1 } &&
        events.forall(_.toJson.nonEmpty) &&
        Set("decode", "token", "tree-mutation").subsetOf(events.map(_.kind).toSet) &&
        // trace must never change the parse result
        (tree.children == HtmlParser.parse(html).children)
    })
  }

  test("extraction is deterministic") {
    check(Prop.forAll(fragmentGen) { html =>
      VisibleText.ofDocument(HtmlParser.parse(html)) ==
        VisibleText.ofDocument(HtmlParser.parse(html))
    })
  }

  test("parse -> serialize -> parse is a fixpoint (serialization stabilizes)") {
    check(Prop.forAll(roundtripGen) { html =>
      val s1 = Serializer.serialize(HtmlParser.parse(html))
      val s2 = Serializer.serialize(HtmlParser.parse(s1))
      s1 == s2
    })
  }

  test("visible text is preserved by serialization round-trip") {
    check(Prop.forAll(roundtripGen) { html =>
      val t1 = HtmlParser.parse(html)
      val t2 = HtmlParser.parse(Serializer.serialize(t1))
      VisibleText.ofDocument(t2) == VisibleText.ofDocument(t1)
    })
  }

  test("budget violations throw BudgetExceededException and nothing else") {
    check(Prop.forAll(fragmentGen) { html =>
      try {
        HtmlParser.parse(html, ParseOptions(budgets =
          Some(Budgets(maxNodes = Some(4)))))
        true // small doc may legitimately fit
      } catch {
        case _: BudgetExceededException => true
        case _: Throwable => false
      }
    })
  }

  test("span fidelity: input-provenance element spans slice to re-parsable html") {
    check(Prop.forAll(fragmentGen) { html =>
      val tree = HtmlParser.parse(html, ParseOptions(captureSpans = true))
      var ok = true
      Traversal.walk(tree) { (n, _) =>
        if (ok && n.spanProvenance == "input") n.span.foreach { sp =>
          ok = sp.start >= 0 && sp.end <= html.length && sp.start <= sp.end
        }
      }
      ok
    })
  }
}
