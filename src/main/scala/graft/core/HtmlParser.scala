package graft.core

import scala.collection.mutable.ArrayBuffer

/** Public parsing façade: parse / parseFragment / parseBytes plus the
  * document-level conversion from the internal mutable DOM to the public
  * immutable tree with pre-assigned node ids.
  *
  * Mirrors the reference's public layer (reference: src/public/mod.ts:475-765):
  *  - node ids are assigned by a monotone counter with the document itself
  *    taking id 1 and each element receiving its id AFTER its children
  *    (reference convertTreeNode: children first, mod.ts:427-431);
  *  - the select/option compat patch runs post-parse
  *    (reference: src/internal/tree/build.ts:307-381);
  *  - maxNodes/maxDepth budgets THROW at this layer while the tree layer
  *    only records errors (asymmetry per mod.ts:541-546 / build.ts:117-127).
  */
object HtmlParser {

  private final class ErrRec(val code: String, val start: Int, val end: Int, val hasSpan: Boolean)

  private def normalizeParseErrorId(raw: String): String = {
    val trimmed = raw.trim
    if (trimmed.isEmpty) "vendor:unknown"
    else if (trimmed.matches("^[a-z0-9]+(?:-[a-z0-9]+)*$")) trimmed
    else s"vendor:$trimmed"
  }

  def parseErrorSpecRef(parseErrorId: String): String =
    "https://html.spec.whatwg.org/multipage/parsing.html#parse-errors"

  private def enforce(budget: String, limit: Option[Long], actual: Long): Unit =
    limit.foreach { l =>
      if (actual > l)
        throw new BudgetExceededException(BudgetExceededPayload(budget, l, actual))
    }

  private def enforceInt(budget: String, limit: Option[Int], actual: Long): Unit =
    enforce(budget, limit.map(_.toLong), actual)

  /** Shared trace plumbing for parse/parseFragment: pre-build events
    * (decode/input, maxInputBytes budget, token count) and the post-build
    * replay (tree-mutation, transitions, parse errors, node/depth budgets),
    * matching the reference's event order (mod.ts:475-588).
    */
  private final class TraceState(html: String, budgets: Option[Budgets]) {
    val buffer = new TraceBuffer(budgets)
    val transitions = new ArrayBuffer[TreeBuilder.ModeTransition]
    def onTransition: TreeBuilder.ModeTransition => Unit = transitions += _

    def pushPreBuild(): Unit = {
      buffer.push(seq => TraceDecodeEvent(seq, "input", "utf-8", "input"))
      buffer.pushBudget("maxInputBytes",
        budgets.flatMap(_.maxInputBytes).map(_.toLong), html.length.toLong)
      // the token-count event reflects the merged public token stream; the
      // extra tokenize pass runs only under trace (the reference always
      // double-tokenizes — mod.ts:492-498 — we pay it only when observing)
      val count = TokenizeApi.tokenize(html).tokens.length
      buffer.push(seq => TraceTokenEvent(seq, count))
    }

    def pushPostBuild(totalNodes: Int, maxDepth: Int, errors: ArrayBuffer[ErrRec]): Unit = {
      buffer.push(seq => TraceTreeMutationEvent(seq, totalNodes, errors.length))
      transitions.foreach { t =>
        buffer.push(seq => TraceInsertionModeTransitionEvent(seq, t.fromMode, t.toMode,
          Option(t.tokenType), Option(t.tokenTagName),
          if (t.tokenStart >= 0) Some(t.tokenStart) else None,
          if (t.tokenEnd >= 0) Some(t.tokenEnd) else None))
      }
      errors.foreach { e =>
        if (e.hasSpan)
          buffer.push(seq => TraceParseErrorEvent(seq,
            normalizeParseErrorId(e.code), Some(e.start), Some(e.end)))
      }
      buffer.pushBudget("maxNodes", budgets.flatMap(_.maxNodes).map(_.toLong), totalNodes.toLong)
      buffer.pushBudget("maxDepth", budgets.flatMap(_.maxDepth).map(_.toLong), maxDepth.toLong)
    }
  }

  // ------------------------------------------------------------------
  /** Parse a complete HTML document. */
  def parse(html: String, options: ParseOptions = ParseOptions()): DocumentTree = {
    val startedAt = System.currentTimeMillis()
    val budgets = options.budgets
    enforceInt("maxInputBytes", budgets.flatMap(_.maxInputBytes), html.length.toLong)
    val trace = if (options.trace) new TraceState(html, budgets) else null
    if (trace != null) trace.pushPreBuild()

    val errors = new ArrayBuffer[ErrRec]
    val builder = new TreeBuilder(
      html,
      options.scriptingEnabled,
      options.captureSpans,
      (code, s, e) => errors += new ErrRec(code, s, e, true),
      if (trace != null) trace.onTransition else null
    )
    val dom = builder.parseDocument()
    if (builder.sawSelect) CompatPatch.patchSelectAdoption(dom)

    val (children, _) = convertChildren(dom.children, options.captureSpans, budgets, errors)
    // metrics walk only when a budget or trace actually needs it
    val metrics =
      if (trace != null || budgets.exists(b => b.maxNodes.isDefined || b.maxDepth.isDefined)) {
        val m = collectMetrics(children)
        enforceInt("maxNodes", budgets.flatMap(_.maxNodes), m._1.toLong + 1L)
        enforceInt("maxDepth", budgets.flatMap(_.maxDepth), m._2.toLong)
        m
      } else (0, 0)
    enforce("maxTimeMs", budgets.flatMap(_.maxTimeMs),
      System.currentTimeMillis() - startedAt)

    if (trace != null) {
      trace.pushPostBuild(metrics._1 + 1, metrics._2, errors)
      DocumentTree(1, children, toParseErrors(errors), Some(trace.buffer.result()))
    } else DocumentTree(1, children, toParseErrors(errors))
  }

  /** Parse an HTML fragment in the given context tag name. */
  def parseFragment(
      html: String,
      contextTagName: String,
      options: ParseOptions = ParseOptions()
  ): FragmentTree = {
    val startedAt = System.currentTimeMillis()
    val budgets = options.budgets
    // JS trim (mod.ts:647) — an NBSP-padded context name still normalizes
    val normalizedContext = VisibleText.jsTrim(contextTagName).toLowerCase
    require(normalizedContext.nonEmpty, "contextTagName must be a non-empty tag name")
    enforceInt("maxInputBytes", budgets.flatMap(_.maxInputBytes), html.length.toLong)
    val trace = if (options.trace) new TraceState(html, budgets) else null
    if (trace != null) trace.pushPreBuild()

    val errors = new ArrayBuffer[ErrRec]
    val builder = new TreeBuilder(
      html,
      options.scriptingEnabled,
      options.captureSpans,
      (code, s, e) => errors += new ErrRec(code, s, e, true),
      if (trace != null) trace.onTransition else null
    )
    val root = builder.parseFragment(normalizedContext)
    if (builder.sawSelect) CompatPatch.patchSelectAdoption(builder.document)

    val (children, _) = convertChildren(root.children, options.captureSpans, budgets, errors)
    val metrics = collectMetrics(children)
    val totalNodes = metrics._1 + 1

    enforceInt("maxNodes", budgets.flatMap(_.maxNodes), totalNodes.toLong)
    enforceInt("maxDepth", budgets.flatMap(_.maxDepth), metrics._2.toLong)
    enforce("maxTimeMs", budgets.flatMap(_.maxTimeMs),
      System.currentTimeMillis() - startedAt)

    if (trace != null) {
      trace.pushPostBuild(totalNodes, metrics._2, errors)
      FragmentTree(1, normalizedContext, children, toParseErrors(errors),
        Some(trace.buffer.result()))
    } else FragmentTree(1, normalizedContext, children, toParseErrors(errors))
  }

  /** Sniff encoding, decode, parse (reference: src/public/mod.ts:600-634).
    * Under trace, a decode(sniff) event is appended after the parse events.
    */
  def parseBytes(bytes: Array[Byte], options: ParseOptions = ParseOptions()): DocumentTree = {
    enforceInt("maxInputBytes", options.budgets.flatMap(_.maxInputBytes), bytes.length.toLong)
    val decoded = EncodingSniff.decodeHtmlBytes(bytes, options.transportEncodingLabel)
    val parsed = parse(decoded._1, options)
    parsed.trace match {
      case Some(events) =>
        val buf = new TraceBuffer(options.budgets)
        events.foreach(e => buf.push(_ => e))
        buf.push(seq => TraceDecodeEvent(seq, "sniff",
          decoded._2.encoding, decoded._2.source))
        parsed.copy(trace = Some(buf.result()))
      case None => parsed
    }
  }

  /** Tokens → tree by serializing the stream back to HTML and re-parsing
    * (the reference's buildTreeFromTokens trick,
    * src/internal/tree/build.ts:579-582): the token serializer escapes text
    * and re-quotes attributes, so behavior matches the reference exactly —
    * including its escaping of rawtext content on the round trip.
    */
  def parseTokens(tokens: Seq[HtmlToken],
                  options: ParseOptions = ParseOptions()): DocumentTree =
    parse(TokenizeApi.serializeForReparse(tokens), options)

  // ------------------------------------------------------------------
  // conversion: internal DOM -> public immutable tree
  private final class IdAssigner { private var n = 1; def next(): Int = { n += 1; n } }

  private def convertChildren(
      nodes: ArrayBuffer[DomNode],
      captureSpans: Boolean,
      budgets: Option[Budgets],
      errors: ArrayBuffer[ErrRec]
  ): (Vector[HtmlNode], Int) = {
    val assigner = new IdAssigner
    val state = new ConvertState(captureSpans, budgets.orNull, errors)
    val out = Vector.newBuilder[HtmlNode]
    nodes.foreach { n =>
      val converted = convertNode(n, 0, assigner, state)
      if (converted != null) out += converted
    }
    (out.result(), state.nodeCount)
  }

  private final class ConvertState(
      val captureSpans: Boolean,
      val budgets: Budgets,
      val errors: ArrayBuffer[ErrRec]
  ) {
    var nodeCount = 0
    def checkBudgets(depth: Int): Unit = {
      if (budgets == null) return
      budgets.maxDepth.foreach { md =>
        if (depth > md) errors += new ErrRec("max-depth-exceeded", 0, 0, false)
      }
      budgets.maxNodes.foreach { mn =>
        if (nodeCount > mn) errors += new ErrRec("max-nodes-exceeded", 0, 0, false)
      }
    }
  }

  private def spanOf(n: DomNode, captureSpans: Boolean): Option[Span] =
    if (captureSpans && n.startOffset >= 0 && n.endOffset >= n.startOffset)
      Some(Span(n.startOffset, n.endOffset))
    else None

  private def provenanceOf(span: Option[Span], captureSpans: Boolean): String =
    if (!captureSpans) SpanProvenance.None
    else if (span.isDefined) SpanProvenance.Input
    else SpanProvenance.Inferred

  /** True when the tree builder's SVG/MathML attribute adjustment renamed
    * this attribute. Tokenized attribute names are ASCII-lowercased, so an
    * uppercase letter (`viewBox`, `definitionURL`) or the internal
    * `"prefix local"` space form (`xlink href`) proves an adjustment
    * happened (reference: parse5 foreign-content.js:29-90).
    */
  private def attrWasAdjusted(name: String): Boolean = {
    var i = 0
    while (i < name.length) {
      val c = name.charAt(i)
      if (c == ' ' || (c >= 'A' && c <= 'Z')) return true
      i += 1
    }
    false
  }

  /** Public name of an adjusted attribute — the LOCAL part. parse5 moves the
    * `xlink:`/`xml:`/`xmlns:` qualifier into a separate prefix field and the
    * reference's formatAttributeName (build.ts:145-150) never re-attaches it
    * (its `name.includes(":")` branch cannot fire post-adjustment), so the
    * reference's public tree names e.g. `xlink:href` in foreign content
    * plain `href`.
    */
  private def publicAttrName(name: String): String = {
    val sp = name.indexOf(' ')
    if (sp >= 0) name.substring(sp + 1) else name
  }

  private def convertNode(
      node: DomNode,
      depth: Int,
      assigner: IdAssigner,
      state: ConvertState
  ): HtmlNode = node match {
    case t: DomText =>
      state.nodeCount += 1
      state.checkBudgets(depth)
      val sp = spanOf(t, state.captureSpans)
      TextNode(assigner.next(), t.text, provenanceOf(sp, state.captureSpans), sp)
    case c: DomComment =>
      state.nodeCount += 1
      state.checkBudgets(depth)
      val sp = spanOf(c, state.captureSpans)
      CommentNode(assigner.next(), c.value, provenanceOf(sp, state.captureSpans), sp)
    case d: DomDoctype =>
      state.nodeCount += 1
      state.checkBudgets(depth)
      val sp = spanOf(d, state.captureSpans)
      DoctypeNode(
        assigner.next(),
        d.name,
        if (d.publicId.nonEmpty) Some(d.publicId) else None,
        if (d.systemId.nonEmpty) Some(d.systemId) else None,
        provenanceOf(sp, state.captureSpans),
        sp
      )
    case el: DomElement =>
      state.nodeCount += 1
      state.checkBudgets(depth)
      // NOTE: the attribute budgets (maxAttributesPerElement /
      // maxAttributeBytes) exist in the option surface but are silently
      // DROPPED by the reference's public parse — its
      // treeBudgetsFromParseOptions forwards only maxNodes/maxDepth to the
      // tree layer, so the build.ts:200-235 checks never run (verified
      // differentially); they are accepted-and-ignored here to match.
      // children are converted (and receive ids) BEFORE the element itself
      // (index loops: the closure-based foreach showed up in parse profiles)
      val kids =
        if (el.children.isEmpty) Vector.empty[HtmlNode]
        else if (el.children.length == 1) {
          // single-child fast path: skip the 32-slot VectorBuilder
          val c0 = convertNode(el.children(0), depth + 1, assigner, state)
          // Vector0 :+ x builds a Vector1 directly (no varargs wrapping)
          if (c0 == null) Vector.empty[HtmlNode] else Vector.empty[HtmlNode] :+ c0
        } else {
          val b = Vector.newBuilder[HtmlNode]
          var i = 0
          while (i < el.children.length) {
            val converted = convertNode(el.children(i), depth + 1, assigner, state)
            if (converted != null) b += converted
            i += 1
          }
          b.result()
        }
      val attrs =
        if (el.attrCount == 0) Vector.empty[Attr]
        else {
          // Mirrors the reference's public attribute normalization
          // (build.ts:195-235): the parser-adjusted attr surfaces under its
          // LOCAL name (parse5 moves the `xlink:`/`xml:`/`xmlns:` qualifier
          // into a separate prefix field, and formatAttributeName's
          // `name.includes(":")` branch never fires post-adjustment, so the
          // reference's public name for e.g. `xlink:href` in foreign content
          // is plain `href`); collisions after formatting keep the FIRST
          // occurrence; and adjusted attrs carry NO span (the reference's
          // location lookup is keyed by the tokenized name, which the
          // adjustment renamed away — build.ts:218).
          // fast pre-scan: only elements with at least one adjusted attr pay
          // for the rename/dedup path (tokenized names are ASCII-lowercased,
          // so dedup-by-exact-name already happened in the tokenizer)
          var anyAdjusted = false
          var j = 0
          while (j < el.attrCount && !anyAdjusted) {
            if (attrWasAdjusted(el.attrAt(j).name)) anyAdjusted = true
            j += 1
          }
          if (!anyAdjusted && el.attrCount == 1) {
            // single-attr fast path: skip the 32-slot VectorBuilder
            val a = el.attrAt(0)
            val sp =
              if (state.captureSpans && a.start >= 0 && a.end >= a.start)
                Some(Span(a.start, a.end))
              else None
            Vector.empty[Attr] :+ Attr(a.name, a.value, sp)
          } else {
          val b = Vector.newBuilder[Attr]
          val seen = if (anyAdjusted) new java.util.HashSet[String]() else null
          var i = 0
          while (i < el.attrCount) {
            val a = el.attrAt(i)
            val adjusted = anyAdjusted && attrWasAdjusted(a.name)
            val name = if (adjusted) publicAttrName(a.name) else a.name
            if (seen == null || seen.add(name)) {
              val sp =
                if (state.captureSpans && !adjusted && a.start >= 0 && a.end >= a.start)
                  Some(Span(a.start, a.end))
                else None
              b += Attr(name, a.value, sp)
            }
            i += 1
          }
          b.result()
          }
        }
      val elSpan = spanOf(el, state.captureSpans).orElse {
        if (state.captureSpans && el.startOffset >= 0 && el.startTagEnd >= el.startOffset)
          Some(Span(el.startOffset, el.startTagEnd))
        else None
      }
      ElementNode(
        assigner.next(),
        el.tagName, // public tag name: namespace prefix already absent
        attrs,
        kids,
        provenanceOf(elSpan, state.captureSpans),
        elSpan
      )
    case _ => null
  }

  /** Node/depth metrics over the public tree (reference: mod.ts:441-473).
    * Packed-long return (nodes << 32 | maxDepth): this runs once per parsed
    * document over every node — per-node tuple boxing showed up in the
    * allocation probe.
    */
  private def collectMetrics(children: Vector[HtmlNode]): (Int, Int) = {
    def walk(n: HtmlNode, depth: Int): Long = n match {
      case e: ElementNode =>
        var nodes = 1
        var maxDepth = depth
        var i = 0
        while (i < e.children.length) {
          val packed = walk(e.children(i), depth + 1)
          nodes += (packed >>> 32).toInt
          val cd = (packed & 0xffffffffL).toInt
          if (cd > maxDepth) maxDepth = cd
          i += 1
        }
        (nodes.toLong << 32) | maxDepth.toLong
      case _ => (1L << 32) | depth.toLong
    }
    var totalNodes = 0
    var maxDepth = 1
    var i = 0
    while (i < children.length) {
      val packed = walk(children(i), 2)
      totalNodes += (packed >>> 32).toInt
      val d = (packed & 0xffffffffL).toInt
      if (d > maxDepth) maxDepth = d
      i += 1
    }
    (totalNodes, maxDepth)
  }

  private def toParseErrors(errors: ArrayBuffer[ErrRec]): Vector[ParseError] =
    if (errors.isEmpty) Vector.empty
    else errors.iterator.map { e =>
      val span =
        if (e.hasSpan && e.start >= 0 && e.end >= e.start) Some(Span(e.start, e.end))
        else None
      ParseError("PARSER_ERROR", normalizeParseErrorId(e.code), e.code, span)
    }.toVector
}

/** Post-parse select/option compatibility rewrite carried over from the
  * reference (reference: src/internal/tree/build.ts:307-381): bare
  * `<select><option>` pairs that are adjacent children of `body` get their
  * option subtrees wrapped in `<b>` elements, preserving html5lib-fixture
  * expectations for a newer spec change in the vendored parser.
  */
object CompatPatch {
  def patchSelectAdoption(root: DomParent): Unit = {
    def walk(node: DomParent): Unit = {
      node.children.foreach {
        case p: DomParent => walk(p)
        case _            =>
      }
      node match {
        case el: DomElement if el.tagName == "body" && el.namespace == Ns.Html =>
          patchBody(el)
        case _ =>
      }
    }
    walk(root)
  }

  private def isBareElement(n: DomNode, tag: String): Boolean = n match {
    case e: DomElement => e.namespace == Ns.Html && e.tagName == tag
    case _             => false
  }

  private def patchBody(body: DomElement): Unit = {
    var index = 0
    while (index < body.children.length - 1) {
      val left = body.children(index)
      val right = body.children(index + 1)
      val applicable = isBareElement(left, "select") && isBareElement(right, "option") && {
        val sel = left.asInstanceOf[DomElement]
        val opt = right.asInstanceOf[DomElement]
        sel.attrCount == 0 && opt.attrCount == 0 &&
        sel.children.length == 1 && isBareElement(sel.children(0), "option") &&
        sel.children(0).asInstanceOf[DomElement].attrCount == 0
      }
      if (applicable) {
        val sel = left.asInstanceOf[DomElement]
        val opt = right.asInstanceOf[DomElement]
        val selOption = sel.children(0).asInstanceOf[DomElement]

        val leftWrapper = new DomElement("b", sel.namespace)
        leftWrapper.parent = sel
        selOption.parent = leftWrapper
        leftWrapper.children += selOption
        sel.children.clear()
        sel.children += leftWrapper

        val detachedText = opt.children.filter(_.isInstanceOf[DomText])
        val kept = opt.children.filterNot(_.isInstanceOf[DomText])
        opt.children.clear()
        opt.children ++= kept

        val rightWrapper = new DomElement("b", opt.namespace)
        rightWrapper.parent = body
        opt.parent = rightWrapper
        rightWrapper.children += opt
        body.children(index + 1) = rightWrapper

        if (detachedText.nonEmpty) {
          detachedText.foreach(_.parent = body)
          body.children.insertAll(index + 2, detachedText)
        }
      }
      index += 1
    }
  }
}
