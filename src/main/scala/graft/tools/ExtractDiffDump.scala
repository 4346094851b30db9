package graft.tools

import java.util.Base64

import graft.core._

/** Differential-oracle helper (Scala side of
  * scripts/conformance/ref_extract_dump.mjs): read one base64(html) per line
  * from the file in args(0), print one base64(JSON record) per line, where
  * the record carries every public extraction surface (visibleText under
  * each option toggle, tokens, provenance tokens, textContent, outline,
  * chunk) in the exact field layout the node-side dump emits. The diff
  * driver parses both JSONs and compares structurally, so formatting
  * differences are irrelevant — only values count.
  *
  * Reference behavior: src/public/mod.ts:1035-1500 (extraction) and
  * :1616-1782 (traversal); the node side runs that file directly (type-
  * stripped), so this is a true second-opinion oracle for the layer the
  * parse5-only tree diff cannot reach.
  */
object ExtractDiffDump {

  private def esc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ =>
          if (c < 0x20 || (c >= 0xD800 && c <= 0xDFFF)) sb.append(f"\\u$c%04x")
          else sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  private def arr(sb: java.lang.StringBuilder, parts: Seq[java.lang.StringBuilder => Unit]): Unit = {
    sb.append('[')
    var first = true
    parts.foreach { p =>
      if (!first) sb.append(',')
      first = false
      p(sb)
    }
    sb.append(']')
  }

  private def record(html: String): String = {
    val tree = HtmlParser.parse(html)
    val sb = new java.lang.StringBuilder(html.length * 2 + 256)
    sb.append('{')
    def field(name: String)(body: => Unit): Unit = {
      if (sb.charAt(sb.length - 1) != '{') sb.append(',')
      esc(sb, name); sb.append(':'); body
    }
    field("vt_default")(esc(sb, VisibleText.ofDocument(tree)))
    field("vt_keep_hidden")(esc(sb,
      VisibleText.ofDocument(tree, VisibleTextOptions(skipHiddenSubtrees = false))))
    field("vt_no_controls")(esc(sb,
      VisibleText.ofDocument(tree, VisibleTextOptions(includeControlValues = false))))
    field("vt_accname")(esc(sb,
      VisibleText.ofDocument(tree, VisibleTextOptions(includeAccessibleNameFallback = true))))
    field("vt_no_trim")(esc(sb, VisibleText.ofDocument(tree, VisibleTextOptions(trim = false))))
    field("tokens")(arr(sb, VisibleText.tokensOfDocument(tree).map { t => (b: java.lang.StringBuilder) =>
      arr(b, Seq(x => esc(x, t.kind), x => esc(x, t.value)))
    }))
    field("prov")(arr(sb, VisibleText.tokensWithProvenance(tree.children).map { t => (b: java.lang.StringBuilder) =>
      arr(b, Seq[java.lang.StringBuilder => Unit](
        x => esc(x, t.kind),
        x => esc(x, t.value),
        x => t.sourceNodeId match {
          case Some(id) => x.append(id); ()
          case None => x.append("null"); ()
        },
        x => esc(x, t.sourceNodeKind),
        x => esc(x, t.sourceRole)
      ))
    }))
    field("text_content")(esc(sb, Traversal.textContent(tree.children)))
    field("outline")(arr(sb, Traversal.outline(tree.children).entries.map { e => (b: java.lang.StringBuilder) =>
      arr(b, Seq[java.lang.StringBuilder => Unit](
        x => { x.append(e.nodeId); () },
        x => { x.append(e.depth); () },
        x => esc(x, e.tagName),
        x => esc(x, e.text)
      ))
    }))
    def chunkArr(chunks: Vector[Chunk]): Unit =
      arr(sb, chunks.map { c => (b: java.lang.StringBuilder) =>
        arr(b, Seq[java.lang.StringBuilder => Unit](
          x => { x.append(c.index); () },
          x => { x.append(c.nodeId); () },
          x => { x.append(c.nodes); () },
          x => esc(x, c.content)
        ))
      })
    field("chunks")(chunkArr(Traversal.chunk(tree.children)))
    field("chunks_small")(chunkArr(Traversal.chunk(tree.children,
      ChunkOptions(maxChars = 48, maxNodes = 5, maxBytes = 200L))))
    field("serialize")(esc(sb, Serializer.serialize(tree)))
    field("frags")(arr(sb, Seq("div", "td", "p").map { ctx => (b: java.lang.StringBuilder) =>
      val ft = HtmlParser.parseFragment(html, ctx)
      arr(b, Seq[java.lang.StringBuilder => Unit](
        x => esc(x, VisibleText.ofFragment(ft)),
        x => arr(x, VisibleText.tokensOfFragment(ft).map { t => (y: java.lang.StringBuilder) =>
          arr(y, Seq(z => esc(z, t.kind), z => esc(z, t.value)))
        }),
        x => esc(x, Serializer.serialize(ft))
      ))
    }))
    // spans + parse-error parity (reference toPublicSpan/toSpanProvenance,
    // mod.ts:231-244): re-parse with captureSpans and dump per-node span
    // records plus the error list; same again for a td-context fragment
    // parse (table modes)
    def spanRec(node: HtmlNode, depth: Int): java.lang.StringBuilder => Unit = { b =>
        b.append('[').append(node.id).append(',').append(depth).append(',')
        esc(b, node.kind); b.append(',')
        node match {
          case e: ElementNode => esc(b, e.tagName)
          case _ => esc(b, "")
        }
        b.append(',')
        esc(b, node.spanProvenance); b.append(',')
        node.span match {
          case Some(s) => b.append(s.start).append(',').append(s.end)
          case None => b.append("null,null")
        }
        node match {
          case e: ElementNode =>
            b.append(",[")
            var first = true
            e.attributes.foreach { a =>
              if (!first) b.append(',')
              first = false
              b.append('[')
              esc(b, a.name); b.append(',')
              esc(b, a.value); b.append(',')
              a.span match {
                case Some(s) => b.append(s.start).append(',').append(s.end)
                case None => b.append("null,null")
              }
              b.append(']')
            }
            b.append(']')
          case _ =>
        }
        b.append(']')
        ()
    }
    def errRec(e: ParseError): java.lang.StringBuilder => Unit = { b =>
      arr(b, Seq[java.lang.StringBuilder => Unit](
        x => esc(x, e.code),
        x => esc(x, e.parseErrorId),
        x => e.span match {
          case Some(s) => { x.append(s.start); () }
          case None => { x.append("null"); () }
        },
        x => e.span match {
          case Some(s) => { x.append(s.end); () }
          case None => { x.append("null"); () }
        }
      ))
    }
    val st = HtmlParser.parse(html, ParseOptions(captureSpans = true))
    val spanRecs = Vector.newBuilder[java.lang.StringBuilder => Unit]
    Traversal.walk(st) { (node, depth) => spanRecs += spanRec(node, depth) }
    field("spans")(arr(sb, spanRecs.result()))
    field("errors")(arr(sb, st.errors.map(errRec)))
    val sf = HtmlParser.parseFragment(html, "td", ParseOptions(captureSpans = true))
    val fragRecs = Vector.newBuilder[java.lang.StringBuilder => Unit]
    Traversal.walk(sf) { (node, depth) => fragRecs += spanRec(node, depth) }
    field("frag_spans")(arr(sb, fragRecs.result()))
    field("frag_errors")(arr(sb, sf.errors.map(errRec)))
    // insertion-mode transition parity (trace events carry parse5's
    // currentToken context — the last START/END tag token only)
    val tt = HtmlParser.parse(html, ParseOptions(trace = true))
    val trans = tt.trace.toVector.flatten.collect {
      case t: TraceInsertionModeTransitionEvent => t
    }
    field("transitions")(arr(sb, trans.map { t => (b: java.lang.StringBuilder) =>
      def opt(v: Option[_]): Unit = v match {
        case Some(s: String) => esc(b, s)
        case Some(x)         => b.append(x.toString); ()
        case None            => b.append("null"); ()
      }
      b.append('[')
      esc(b, t.fromMode); b.append(',')
      esc(b, t.toMode); b.append(',')
      opt(t.tokenType); b.append(',')
      opt(t.tokenTagName); b.append(',')
      opt(t.tokenStartOffset); b.append(',')
      opt(t.tokenEndOffset)
      b.append(']')
      ()
    }))
    // tokenize facade parity: tokens + errors under option combos
    locally {
      val combos = Vector(
        TokenizeOpts(),
        TokenizeOpts(initialState = "RCDATA state", lastStartTag = "textarea"),
        TokenizeOpts(initialState = "RAWTEXT state", lastStartTag = "style"),
        TokenizeOpts(initialState = "Script data state", lastStartTag = "script"),
        TokenizeOpts(initialState = "PLAINTEXT state"),
        TokenizeOpts(initialState = "CDATA section state"),
        TokenizeOpts(maxTextBytes = Some(40), maxParseErrors = Some(2)),
        TokenizeOpts(maxTokenBytes = Some(60)),
        TokenizeOpts(doubleEscaped = true),
        TokenizeOpts(xmlViolationMode = true)
      )
      def tokRec(o: TokenizeOpts): java.lang.StringBuilder => Unit = { b =>
        try {
          val r = TokenizeApi.tokenize(html, o)
          arr(b, Seq[java.lang.StringBuilder => Unit](
            x => arr(x, r.tokens.map { t => (y: java.lang.StringBuilder) =>
              t match {
                case StartTagTok(n, attrs, sc) =>
                  arr(y, Seq[java.lang.StringBuilder => Unit](
                    z => esc(z, "S"), z => esc(z, n),
                    z => arr(z, attrs.map { case (k, v) => (w: java.lang.StringBuilder) =>
                      arr(w, Seq[java.lang.StringBuilder => Unit](
                        q => esc(q, k), q => esc(q, v)))
                    }),
                    z => { z.append(if (sc) "true" else "false"); () }))
                case EndTagTok(n) =>
                  arr(y, Seq[java.lang.StringBuilder => Unit](z => esc(z, "E"), z => esc(z, n)))
                case CharsTok(d) =>
                  arr(y, Seq[java.lang.StringBuilder => Unit](z => esc(z, "C"), z => esc(z, d)))
                case CommentTok(d) =>
                  arr(y, Seq[java.lang.StringBuilder => Unit](z => esc(z, "M"), z => esc(z, d)))
                case DoctypeToken(n, pid, sid, fq) =>
                  arr(y, Seq[java.lang.StringBuilder => Unit](
                    z => esc(z, "D"), z => esc(z, n),
                    z => pid match { case Some(s) => esc(z, s); case None => { z.append("null"); () } },
                    z => sid match { case Some(s) => esc(z, s); case None => { z.append("null"); () } },
                    z => { z.append(if (fq) "true" else "false"); () }))
                case EofTok =>
                  arr(y, Seq[java.lang.StringBuilder => Unit](z => esc(z, "F")))
              }
            }),
            x => arr(x, r.errors.map { e => (y: java.lang.StringBuilder) =>
              arr(y, Seq[java.lang.StringBuilder => Unit](
                z => esc(z, e.code), z => { z.append(e.index); () }))
            })
          ))
        } catch {
          case e: Exception =>
            arr(b, Seq[java.lang.StringBuilder => Unit](
              x => esc(x, "THREW"), x => esc(x, String.valueOf(e.getMessage))))
        }
      }
      field("tok_facade")(arr(sb, combos.map(tokRec)))
    }
    // budget-metrics parity: tight budgets — both engines must throw the
    // same (budget, limit, actual) or succeed with the same error pushes
    field("budget_probe")(
      try {
        val bt = HtmlParser.parse(html, ParseOptions(budgets = Some(Budgets(
          maxDepth = Some(6), maxNodes = Some(40),
          maxAttributesPerElement = Some(2), maxAttributeBytes = Some(40)))))
        arr(sb, Seq[java.lang.StringBuilder => Unit](
          x => esc(x, "ok"),
          x => arr(x, bt.errors.map { e => (y: java.lang.StringBuilder) =>
            arr(y, Seq[java.lang.StringBuilder => Unit](
              z => esc(z, e.parseErrorId),
              z => e.span match {
                case Some(s) => { z.append(s.start); () }
                case None    => { z.append("null"); () }
              }))
          })
        ))
      } catch {
        case e: BudgetExceededException =>
          arr(sb, Seq[java.lang.StringBuilder => Unit](
            x => esc(x, "budget"),
            x => esc(x, e.payload.budget),
            x => { x.append(e.payload.limit); () },
            x => { x.append(e.payload.actual); () }
          ))
      })
    // patch parity: deterministic edit script over the shared tree/node ids;
    // overlap-heavy on purpose so planning failures compare by code too
    locally {
      val cand = Vector.newBuilder[(Int, String, Vector[String])]
      Traversal.walk(tree) { (node, _) =>
        cand += ((node.id, node.kind, node match {
          case e: ElementNode => e.attributes.map(_.name)
          case _              => Vector.empty
        }))
      }
      val edits = Vector.newBuilder[Edit]
      cand.result().zipWithIndex.foreach { case ((id, kind, attrs), i) =>
        (i % 7) match {
          case 0 => if (kind == "element") edits += SetAttr(id, "data-x", "v&\"'<>")
          case 1 => if (kind == "text") edits += ReplaceText(id, "R & T")
          case 2 => if (kind == "element" && attrs.nonEmpty) edits += RemoveAttr(id, attrs.head)
          case 3 => if (kind == "element") edits += InsertHtmlBefore(id, "<i>b</i>")
          case 4 => if (kind == "element") edits += InsertHtmlAfter(id, "<i>a</i>")
          case 5 => if (kind == "element") edits += RemoveNode(id)
          case _ =>
        }
      }
      field("patch")(
        try {
          val plan = Patch.computePatch(html, edits.result())
          val roundtrip = Patch.applyPatchPlan(html, plan) == plan.result
          arr(sb, Seq[java.lang.StringBuilder => Unit](
            x => esc(x, "ok"),
            x => esc(x, plan.result),
            x => { x.append(if (roundtrip) "true" else "false"); () }
          ))
        } catch {
          case e: PatchPlanningException =>
            arr(sb, Seq[java.lang.StringBuilder => Unit](
              x => esc(x, "err"),
              x => esc(x, e.payload.code),
              x => e.payload.target match {
                case Some(t) => { x.append(t); () }
                case None    => { x.append("null"); () }
              }
            ))
          case e: Exception =>
            // the reference's generic JS catch surfaces e.message the same
            // way (both engines share the apply-plan validation strings)
            arr(sb, Seq[java.lang.StringBuilder => Unit](
              x => esc(x, "err"),
              x => esc(x, String.valueOf(e.getMessage)),
              x => { x.append("null"); () }
            ))
        })
    }
    sb.append('}')
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = new java.lang.StringBuilder
    scala.io.Source.fromFile(args(0), "UTF-8").getLines().foreach { line =>
      if (line.nonEmpty) {
        val html = new String(Base64.getDecoder.decode(line), "UTF-8")
        val json =
          try record(html)
          catch {
            case e: Throwable =>
              val s = new java.lang.StringBuilder("{\"error\":")
              esc(s, e.getClass.getSimpleName)
              s.append('}').toString
          }
        out.append(Base64.getEncoder.encodeToString(json.getBytes("UTF-8"))).append('\n')
      }
    }
    print(out)
  }
}
