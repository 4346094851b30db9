package graft.core

import org.scalatest.funsuite.AnyFunSuite

import FixtureSerializer._

/** html5lib serializer-fixture conformance, hand-written in the upstream
  * suite's spirit (the reference's vendor/html5lib-tests submodule is empty,
  * so cases are authored from the serializer spec semantics: attr sorting,
  * boolean minimization, optional-tag omission, rcdata, whitespace,
  * inject_meta_charset; reference: src/internal/serializer/serialize.ts).
  */
class SerializerConformanceSpec extends AnyFunSuite {

  private def st(name: String, attrs: (String, String)*): FixtureStartTag =
    FixtureStartTag(None, name, attrs.toVector.map { case (n, v) => FixtureAttr(None, n, v) })
  private def et(name: String): FixtureEndTag = FixtureEndTag(None, name)
  private def empty(name: String, attrs: (String, String)*): FixtureEmptyTag =
    FixtureEmptyTag(None, name, attrs.toVector.map { case (n, v) => FixtureAttr(None, n, v) })
  private def ch(data: String): FixtureCharacters = FixtureCharacters(data)

  test("attributes are sorted by name") {
    assert(serialize(Seq(st("span", "title" -> "t", "class" -> "c", "id" -> "i"),
      et("span"))) == "<span class=c id=i title=t></span>")
  }

  test("attribute sort matches localeCompare on case-only differences") {
    // Node's default-locale localeCompare orders lowercase first for equal
    // case-folded names: ["A","a","Ab","aB"] sorts to a, A, aB, Ab
    assert(serialize(Seq(st("span", "A" -> "1", "a" -> "2", "Ab" -> "3", "aB" -> "4"),
      et("span"))) == "<span a=2 A=1 aB=4 Ab=3></span>")
  }

  test("boolean attributes minimize when value equals name") {
    assert(serialize(Seq(empty("input", "checked" -> "checked"))) == "<input checked>")
    assert(serialize(Seq(empty("input", "checked" -> "CHECKED"))) == "<input checked>")
    assert(serialize(Seq(empty("input", "checked" -> "yes"))) == "<input checked=yes>")
    assert(serialize(Seq(empty("input", "checked" -> "checked")),
      FixtureOptions(minimizeBooleanAttributes = false)) == "<input checked=checked>")
  }

  test("attribute quoting: unquoted when safe, forced by specials") {
    assert(serialize(Seq(st("a", "href" -> "/x"), et("a"))) == "<a href=/x></a>")
    assert(serialize(Seq(st("a", "title" -> "two words"), et("a"))) ==
      "<a title=\"two words\"></a>")
    assert(serialize(Seq(st("a", "title" -> ""), et("a"))) == "<a title=\"\"></a>")
    // double quote inside -> single-quoted; single quote inside -> double
    assert(serialize(Seq(st("a", "title" -> "say \"hi\""), et("a"))) ==
      "<a title='say \"hi\"'></a>")
    assert(serialize(Seq(st("a", "title" -> "it's"), et("a"))) ==
      "<a title=\"it's\"></a>")
    // quote_attr_values forces quoting of safe values
    assert(serialize(Seq(st("a", "href" -> "/x"), et("a")),
      FixtureOptions(quoteAttrValues = true)) == "<a href=\"/x\"></a>")
    // quote_char applies
    assert(serialize(Seq(st("a", "href" -> "/x"), et("a")),
      FixtureOptions(quoteAttrValues = true, quoteChar = '\'')) == "<a href='/x'></a>")
  }

  test("escape_lt_in_attrs escapes < and forces quoting") {
    assert(serialize(Seq(st("a", "title" -> "a<b"), et("a"))) == "<a title=a<b></a>")
    assert(serialize(Seq(st("a", "title" -> "a<b"), et("a")),
      FixtureOptions(escapeLtInAttrs = true)) == "<a title=\"a&lt;b\"></a>")
  }

  test("trailing solidus applies only to void elements when enabled") {
    assert(serialize(Seq(empty("br"))) == "<br>")
    assert(serialize(Seq(empty("br")), FixtureOptions(useTrailingSolidus = true)) == "<br />")
    assert(serialize(Seq(empty("xx")), FixtureOptions(useTrailingSolidus = true)) == "<xx>")
  }

  test("html/head/body tags are omitted when allowed") {
    val tokens = Seq(st("html"), st("head"), et("head"), st("body"),
      ch("text"), et("body"), et("html"))
    assert(serialize(tokens) == "text")
    // a following comment blocks start-tag omission (the end tag is last,
    // so it still omits)
    assert(serialize(Seq(st("html"), FixtureComment("c"), et("html"))) ==
      "<html><!--c-->")
    // a comment after the end tag blocks end-tag omission
    assert(serialize(Seq(st("html"), FixtureComment("c"), et("html"),
      FixtureComment("d"))) == "<html><!--c--></html><!--d-->")
    // leading space in following characters blocks omission
    assert(serialize(Seq(st("body"), ch(" x"), et("body"))) == "<body> x")
    // attributes block start-tag omission
    assert(serialize(Seq(st("html", "lang" -> "en"), ch("x"), et("html"))) ==
      "<html lang=en>x")
  }

  test("head start tag omission requires a following tag") {
    assert(serialize(Seq(st("head"), ch("x"), et("head"))) == "<head>x")
    assert(serialize(Seq(st("head"), st("title"), ch("t"), et("title"), et("head"))) ==
      "<title>t</title>")
  }

  test("p end tag omission follows the spec sets") {
    assert(serialize(Seq(st("p"), ch("a"), et("p"), st("p"), ch("b"), et("p"))) ==
      "<p>a<p>b")
    // forbidden following end tag keeps </p>
    assert(serialize(Seq(st("a"), st("p"), ch("x"), et("p"), et("a"))) ==
      "<a><p>x</p></a>")
    // following phrasing start tag keeps </p>
    assert(serialize(Seq(st("p"), ch("x"), et("p"), st("span"), ch("y"), et("span"))) ==
      "<p>x</p><span>y</span>")
  }

  test("trailing optional dd end tag omits but dt end tag stays") {
    // reference holdout regression (test/control/holdout-regressions.test.js):
    // a bare </dd> at end-of-stream is omissible, a bare </dt> is not
    assert(serialize(Seq(et("dd"))) == "")
    assert(serialize(Seq(et("dt"))) == "</dt>")
  }

  test("list and table end tags omit before peers") {
    assert(serialize(Seq(st("ul"), st("li"), ch("a"), et("li"),
      st("li"), ch("b"), et("li"), et("ul"))) == "<ul><li>a<li>b</ul>")
    assert(serialize(Seq(st("dl"), st("dt"), ch("t"), et("dt"),
      st("dd"), ch("d"), et("dd"), et("dl"))) == "<dl><dt>t<dd>d</dl>")
    assert(serialize(Seq(st("table"), st("tr"), st("td"), ch("1"), et("td"),
      st("td"), ch("2"), et("td"), et("tr"), et("table"))) ==
      "<table><tr><td>1<td>2</table>")
    assert(serialize(Seq(st("select"), st("option"), ch("a"), et("option"),
      st("option"), ch("b"), et("option"), et("select"))) ==
      "<select><option>a<option>b</select>")
  }

  test("colgroup and tbody omission rules") {
    assert(serialize(Seq(st("table"), st("colgroup"), empty("col"), et("colgroup"),
      st("tbody"), st("tr"), st("td"), ch("x"), et("td"), et("tr"), et("tbody"),
      et("table"))) == "<table><col><tr><td>x</table>")
    // tbody start NOT omitted right after </tbody>
    assert(serialize(Seq(st("table"),
      st("tbody"), st("tr"), st("td"), ch("a"), et("td"), et("tr"), et("tbody"),
      st("tbody"), st("tr"), st("td"), ch("b"), et("td"), et("tr"), et("tbody"),
      et("table"))) == "<table><tr><td>a<tbody><tr><td>b</table>")
    // thead end omits only before tbody/tfoot/table
    assert(serialize(Seq(st("table"), st("thead"), st("tr"), st("th"), ch("h"),
      et("th"), et("tr"), et("thead"), st("tbody"), st("tr"), st("td"), ch("x"),
      et("td"), et("tr"), et("tbody"), et("table"))) ==
      "<table><thead><tr><th>h<tbody><tr><td>x</table>")
  }

  test("rcdata content is raw unless escape_rcdata") {
    val tokens = Seq(st("script"), ch("if (a < b) x();"), et("script"))
    assert(serialize(tokens) == "<script>if (a < b) x();</script>")
    assert(serialize(tokens, FixtureOptions(escapeRcdata = true)) ==
      "<script>if (a &lt; b) x();</script>")
    // text outside rawtext parents is always escaped (trailing </p> omits)
    assert(serialize(Seq(st("p"), ch("a<b & c"), et("p"))) ==
      "<p>a&lt;b &amp; c")
  }

  test("strip_whitespace collapses runs outside preserving parents") {
    val opts = FixtureOptions(stripWhitespace = true)
    assert(serialize(Seq(st("p"), ch("a \t\n b"), et("p")), opts) == "<p>a b")
    assert(serialize(Seq(st("pre"), ch("a \t\n b"), et("pre")), opts) ==
      "<pre>a \t\n b</pre>")
  }

  test("doctype serialization forms") {
    assert(serialize(Seq(FixtureDoctype("html"))) == "<!DOCTYPE html>")
    assert(serialize(Seq(FixtureDoctype("html", "-//W3C//DTD HTML 4.01//EN",
      "http://www.w3.org/TR/html4/strict.dtd"))) ==
      "<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 4.01//EN\" \"http://www.w3.org/TR/html4/strict.dtd\">")
    assert(serialize(Seq(FixtureDoctype("html", "-//W3C//DTD HTML 4.01//EN"))) ==
      "<!DOCTYPE html PUBLIC \"-//W3C//DTD HTML 4.01//EN\">")
    assert(serialize(Seq(FixtureDoctype("html", "", "about:legacy-compat"))) ==
      "<!DOCTYPE html SYSTEM \"about:legacy-compat\">")
  }

  test("comments pass through verbatim") {
    assert(serialize(Seq(FixtureComment(" note "))) == "<!-- note -->")
  }

  test("inject_meta_charset updates an existing meta charset") {
    val tokens = Seq(st("head"), empty("meta", "charset" -> "ascii"), et("head"))
    assert(serialize(tokens,
      FixtureOptions(injectMetaCharset = true, encoding = "utf-8")) ==
      "<meta charset=utf-8>")
  }

  test("inject_meta_charset rewrites http-equiv content-type") {
    val tokens = Seq(st("head"),
      empty("meta", "http-equiv" -> "Content-Type",
        "content" -> "text/html; charset=ascii"), et("head"))
    assert(serialize(tokens,
      FixtureOptions(injectMetaCharset = true, encoding = "utf-8")) ==
      "<meta content=\"text/html; charset=utf-8\" http-equiv=Content-Type>")
  }

  test("inject_meta_charset inserts a meta when none exists") {
    val tokens = Seq(st("head"), st("title"), ch("t"), et("title"), et("head"))
    assert(serialize(tokens,
      FixtureOptions(injectMetaCharset = true, encoding = "utf-8")) ==
      "<meta charset=utf-8><title>t</title>")
  }

  test("inject_meta_charset without encoding is a no-op") {
    val tokens = Seq(st("head"), et("head"))
    assert(serialize(tokens, FixtureOptions(injectMetaCharset = true)) == "")
  }
}
