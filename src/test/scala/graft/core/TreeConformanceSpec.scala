package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** html5lib-style tree-construction conformance (SURVEY.md §5.2).
  *
  * The reference runs the html5lib `.dat` suites with a normalizeTree
  * comparator (reference: scripts/conformance/run-tree-fixtures.mjs:28-128,
  * comparator src/internal/tree/normalize.ts). The upstream corpus is an
  * empty submodule in the reference snapshot, so these are hand-written
  * cases in the identical file format covering the load-bearing algorithms:
  * adoption agency, foster parenting, implied end tags, rawtext/rcdata,
  * foreign content (SVG/MathML + integration points), and fragments.
  */
class TreeConformanceSpec extends AnyFunSuite {

  private final case class DatCase(file: String, idx: Int, data: String,
                                   expected: String, fragment: Option[String])

  private def parseDat(name: String, content: String): Seq[DatCase] = {
    val chunks = content.split("\n\n#data\n").toSeq
    val normalized: Seq[String] =
      if (chunks.head.startsWith("#data\n")) chunks.head.drop("#data\n".length) +: chunks.tail
      else chunks
    normalized.zipWithIndex.map { case (chunk, i) =>
      val lines = chunk.split("\n", -1).toVector
      val errIdx = lines.indexOf("#errors")
      val fragIdx = lines.indexOf("#document-fragment")
      val docIdx = lines.indexOf("#document")
      require(errIdx >= 0 && docIdx >= 0, s"malformed case $i in $name")
      val data = lines.slice(0, errIdx).mkString("\n")
      val fragment = if (fragIdx >= 0) Some(lines(fragIdx + 1)) else None
      val expected = lines.drop(docIdx + 1).filter(_.nonEmpty).mkString("\n")
      DatCase(name, i, data, expected, fragment)
    }
  }

  private val cases: Seq[DatCase] = {
    val dir = Paths.get(getClass.getResource("/tree-construction").toURI)
    Files.list(dir).iterator.asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".dat"))
      .sortBy(_.getFileName.toString)
      .flatMap { p =>
        parseDat(p.getFileName.toString,
          new String(Files.readAllBytes(p), "UTF-8").stripTrailing())
      }
  }

  test("conformance corpus is present") {
    assert(cases.size >= 25)
  }

  test("null token drives the pre-body mode machine like parse5") {
    // distilled from the wild-profile differential sweep: a NUL character
    // token is never inserted outside foreign content, but in the pre-body
    // modes it triggers the same structural transitions as any other
    // character (quirks + html/head/body insertion), so a following comment
    // lands in BODY, not on the document (parser/index.js:770-824)
    assert(Serializer.normalizedParse("\u0000<!--c--><p>x") ==
      "| <html>\n|   <head>\n|   <body>\n|     <!-- c -->\n|     <p>\n|       \"x\"")
    // in-table NUL re-enters table-text buffering (pending reset, token
    // dropped) rather than foster-parenting anything
    assert(Serializer.normalizedParse("<table>\u0000<td>x</table>") ==
      "| <html>\n|   <head>\n|   <body>\n|     <table>\n|       <tbody>\n|         <tr>\n|           <td>\n|             \"x\"")
  }

  test("consecutive nulls batch into one token like parse5") {
    // the reference tokenizer accumulates adjacent NULs into ONE
    // NULL_CHARACTER token, so foreign content replaces the whole run with
    // a SINGLE U+FFFD (distilled from the wild-profile sweep, seed 0x0DDBA11)
    assert(Serializer.normalizedParse("<svg><![CDATA[a\u0000\u0000b]]></svg>") ==
      "| <html>\n|   <head>\n|   <body>\n|     <svg svg>\n|       \"a\uFFFDb\"")
    // non-adjacent NULs stay separate tokens: one replacement each
    assert(Serializer.normalizedParse("<svg><![CDATA[a\u0000x\u0000b]]></svg>") ==
      "| <html>\n|   <head>\n|   <body>\n|     <svg svg>\n|       \"a\uFFFDx\uFFFDb\"")
  }

  for (c <- cases) {
    test(s"tree ${c.file} #${c.idx}: ${c.data.take(48).replace("\n", "\\n")}") {
      val actual = c.fragment match {
        case Some(ctx) => Serializer.normalizedParseFragment(c.data, ctx)
        case None      => Serializer.normalizedParse(c.data)
      }
      assert(actual == c.expected,
        s"\n--- input ---\n${c.data}\n--- expected ---\n${c.expected}\n--- actual ---\n$actual")
    }
  }
}
