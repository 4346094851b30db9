package graft.core

import scala.collection.mutable.ArrayBuffer

/** html5lib serializer-fixture semantics: attribute sorting, boolean-attr
  * minimization, optional-tag omission, rcdata escaping, whitespace
  * stripping, and `inject_meta_charset` rewriting over a token stream
  * (reference: src/internal/serializer/serialize.ts:132-877).
  *
  * This is the serializer the html5lib serializer conformance suite runs
  * against; the plain tree serializer lives in [[Serializer]].
  */
object FixtureSerializer {

  final case class FixtureAttr(namespace: Option[String], name: String, value: String)

  sealed trait FixtureToken
  final case class FixtureStartTag(namespace: Option[String], name: String,
                                   attributes: Vector[FixtureAttr]) extends FixtureToken
  final case class FixtureEmptyTag(namespace: Option[String], name: String,
                                   attributes: Vector[FixtureAttr]) extends FixtureToken
  final case class FixtureEndTag(namespace: Option[String], name: String) extends FixtureToken
  final case class FixtureCharacters(data: String) extends FixtureToken
  final case class FixtureComment(data: String) extends FixtureToken
  final case class FixtureDoctype(name: String, publicId: String = "",
                                  systemId: String = "") extends FixtureToken

  /** Fixture options with the reference's normalized defaults
    * (serialize.ts:366-379).
    */
  final case class FixtureOptions(
      quoteChar: Char = '"',
      quoteAttrValues: Boolean = false,
      minimizeBooleanAttributes: Boolean = true,
      useTrailingSolidus: Boolean = false,
      escapeLtInAttrs: Boolean = false,
      escapeRcdata: Boolean = false,
      stripWhitespace: Boolean = false,
      injectMetaCharset: Boolean = false,
      encoding: String = ""
  )

  private val VoidElements = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  private val RawtextParents = Set("script", "style")
  private val PreserveWhitespaceParents = Set("pre", "textarea", "script", "style")
  private val OmittableStartTags = Set("html", "head", "body", "colgroup", "tbody")
  private val PEndForbiddenFollowingEnd =
    Set("a", "audio", "del", "ins", "map", "noscript", "video")
  private val PEndFollowingStart = Set(
    "address", "article", "aside", "blockquote", "details", "datagrid",
    "dialog", "dir", "div", "dl", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup",
    "hr", "main", "menu", "nav", "ol", "p", "pre", "search", "section",
    "table", "ul")

  private def escapeText(value: String): String =
    value.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // html5lib space characters: [\t\n\f\r ] (serialize.ts:194-195)
  private def isSpaceChar(c: Char): Boolean =
    c == '\t' || c == '\n' || c == '\f' || c == '\r' || c == ' '

  private def startsWithSpaceCharacter(text: String): Boolean =
    text.nonEmpty && isSpaceChar(text.charAt(0))

  private def collapseSpaceRuns(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (isSpaceChar(c)) {
        sb.append(' ')
        while (i < text.length && isSpaceChar(text.charAt(i))) i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // /[\t\n\f\r "'=>]/ or empty forces quoting (serialize.ts:609-614)
  private def shouldQuoteAttributeValue(value: String): Boolean =
    value.isEmpty || value.exists(c => isSpaceChar(c) || c == '"' || c == '\'' || c == '=' || c == '>')

  private def escapeAttr(value: String, quoteChar: Char, escapeLt: Boolean): String = {
    var escaped = value.replace("&", "&amp;")
    if (escapeLt) escaped = escaped.replace("<", "&lt;")
    if (quoteChar == '"') escaped.replace("\"", "&quot;")
    else escaped.replace("'", "&#39;")
  }

  private def serializeAttributes(attributes: Vector[FixtureAttr],
                                  opts: FixtureOptions): String = {
    if (attributes.isEmpty) return ""
    // reference sorts with localeCompare (serialize.ts:626); ICU default
    // collation compares base letters first and, on a case-only difference,
    // puts LOWERCASE first — so tiebreak equal case-folded names by REVERSE
    // code-point order ('a' before 'A', 'aB' before 'Ab')
    val ordered = attributes.sortBy(a => (a.name.toLowerCase, a.name))(
      Ordering.Tuple2(Ordering.String, Ordering.String.reverse))
    val parts = new ArrayBuffer[String](ordered.length)
    ordered.foreach { attr =>
      val isBoolean = attr.namespace.isEmpty &&
        attr.value.toLowerCase == attr.name.toLowerCase
      if (isBoolean && opts.minimizeBooleanAttributes) parts += attr.name
      else {
        val forceQuote = opts.quoteAttrValues ||
          shouldQuoteAttributeValue(attr.value) ||
          (opts.escapeLtInAttrs && attr.value.contains("<"))
        if (!forceQuote) {
          parts += s"${attr.name}=${escapeAttr(attr.value, opts.quoteChar, opts.escapeLtInAttrs)}"
        } else {
          var quoteChar = opts.quoteChar
          if (!opts.quoteAttrValues && opts.quoteChar == '"') {
            if (attr.value.contains("\"") && !attr.value.contains("'")) quoteChar = '\''
            else if (attr.value.contains("'") && !attr.value.contains("\"")) quoteChar = '"'
          }
          parts += s"${attr.name}=$quoteChar${escapeAttr(attr.value, quoteChar, opts.escapeLtInAttrs)}$quoteChar"
        }
      }
    }
    " " + parts.mkString(" ")
  }

  private def nextTagName(token: FixtureToken): String = token match {
    case t: FixtureStartTag => t.name
    case t: FixtureEmptyTag => t.name
    case t: FixtureEndTag   => t.name
    case _                  => null
  }

  private def shouldOmitStartTag(token: FixtureStartTag, next: FixtureToken,
                                 previous: FixtureToken): Boolean = {
    val tagName = token.name
    if (!OmittableStartTags.contains(tagName) || token.attributes.nonEmpty) return false

    tagName match {
      case "html" | "body" =>
        next match {
          case null                    => true
          case _: FixtureComment       => false
          case c: FixtureCharacters if startsWithSpaceCharacter(c.data) => false
          case _                       => true
        }
      case "head" =>
        next match {
          case null                                  => false
          case _: FixtureComment | _: FixtureCharacters => false
          case e: FixtureEndTag if e.name != "head"  => false
          case _                                     => true
        }
      case "colgroup" =>
        next != null && nextTagName(next) == "col"
      case "tbody" =>
        if (next == null || nextTagName(next) != "tr") false
        else previous match {
          case e: FixtureEndTag
            if e.name == "tbody" || e.name == "thead" || e.name == "tfoot" => false
          case _ => true
        }
      case _ => false
    }
  }

  private def shouldOmitEndTag(token: FixtureEndTag, next: FixtureToken): Boolean = {
    val tagName = token.name
    val nextName = if (next == null) null else nextTagName(next)
    def nextIsEnd = next != null && next.isInstanceOf[FixtureEndTag]

    tagName match {
      case "html" | "head" | "body" =>
        next match {
          case null              => true
          case _: FixtureComment => false
          case c: FixtureCharacters if startsWithSpaceCharacter(c.data) => false
          case _                 => true
        }
      case "li" =>
        nextName == "li" || nextName == "ul" || nextName == "ol" ||
          nextName == "menu" || nextIsEnd || next == null
      case "dt" => nextName == "dt" || nextName == "dd" || nextName == "dl"
      case "dd" =>
        nextName == "dt" || nextName == "dd" || nextName == "dl" ||
          nextIsEnd || next == null
      case "p" =>
        next match {
          case null                                     => true
          case t: FixtureStartTag                       => PEndFollowingStart.contains(t.name)
          case t: FixtureEmptyTag                       => PEndFollowingStart.contains(t.name)
          case t: FixtureEndTag                         => !PEndForbiddenFollowingEnd.contains(t.name)
          case _                                        => false
        }
      case "rt" | "rp" =>
        nextName == "rt" || nextName == "rp" || nextName == "ruby" || next == null
      case "option" =>
        nextName == "option" || nextName == "optgroup" || nextName == "select" ||
          nextName == "datalist" || nextIsEnd || next == null
      case "optgroup" =>
        nextName == "optgroup" || nextName == "select" || nextIsEnd || next == null
      case "colgroup" =>
        next match {
          case null              => true
          case _: FixtureComment => false
          case c: FixtureCharacters if startsWithSpaceCharacter(c.data) => false
          case _ if nextName == "col" || nextName == "colgroup" => false
          case _                 => true
        }
      case "thead" =>
        nextName == "tbody" || nextName == "tfoot" || nextName == "table"
      case "tbody" =>
        nextName == "tbody" || nextName == "tfoot" || nextName == "table" ||
          nextIsEnd || next == null
      case "tfoot" =>
        nextName == "tbody" || nextName == "table" || nextIsEnd || next == null
      case "tr" =>
        nextName == "tr" || nextName == "tbody" || nextName == "thead" ||
          nextName == "tfoot" || nextName == "table" || nextIsEnd || next == null
      case "td" | "th" =>
        nextName == "td" || nextName == "th" || nextName == "tr" ||
          nextName == "tbody" || nextName == "thead" || nextName == "tfoot" ||
          nextName == "table" || nextIsEnd || next == null
      case _ => false
    }
  }

  private val CharsetRe =
    java.util.regex.Pattern.compile("charset\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s;]+)",
      java.util.regex.Pattern.CASE_INSENSITIVE)

  private def updateMetaEncoding(name: String, attributes: Vector[FixtureAttr],
                                 encoding: String): (Vector[FixtureAttr], Boolean) = {
    if (name != "meta") return (attributes, false)
    var touched = false
    var attrs = attributes.map { a =>
      if (a.name.toLowerCase == "charset") { touched = true; a.copy(value = encoding) }
      else a
    }
    val httpEquiv = attrs.find(_.name.toLowerCase == "http-equiv").map(_.value.toLowerCase)
    if (httpEquiv.contains("content-type")) {
      attrs = attrs.map { a =>
        if (a.name.toLowerCase == "content") {
          val m = CharsetRe.matcher(a.value)
          val updated = m.replaceFirst(
            java.util.regex.Matcher.quoteReplacement(s"charset=$encoding"))
          if (updated != a.value) { touched = true; a.copy(value = updated) } else a
        } else a
      }
    }
    (attrs, touched)
  }

  private def applyInjectMetaCharset(tokens: Seq[FixtureToken],
                                     opts: FixtureOptions): ArrayBuffer[FixtureToken] = {
    val out = ArrayBuffer.from(tokens)
    if (!opts.injectMetaCharset || opts.encoding.isEmpty) return out

    var tokenIndex = 0
    while (tokenIndex < out.length) {
      out(tokenIndex) match {
        case head: FixtureStartTag if head.name == "head" =>
          var depth = 1
          var endIndex = tokenIndex + 1
          while (endIndex < out.length && depth > 0) {
            out(endIndex) match {
              case t: FixtureStartTag if t.name == "head" => depth += 1
              case t: FixtureEndTag if t.name == "head"   => depth -= 1
              case _                                      =>
            }
            endIndex += 1
          }
          val headEnd = math.max(tokenIndex + 1, endIndex - 1)
          var hasCharsetMeta = false
          var cursor = tokenIndex + 1
          while (cursor < headEnd) {
            out(cursor) match {
              case t: FixtureStartTag =>
                val (attrs, touched) = updateMetaEncoding(t.name, t.attributes, opts.encoding)
                out(cursor) = t.copy(attributes = attrs)
                if (touched) hasCharsetMeta = true
              case t: FixtureEmptyTag =>
                val (attrs, touched) = updateMetaEncoding(t.name, t.attributes, opts.encoding)
                out(cursor) = t.copy(attributes = attrs)
                if (touched) hasCharsetMeta = true
              case _ =>
            }
            cursor += 1
          }
          if (!hasCharsetMeta) {
            out.insert(tokenIndex + 1, FixtureEmptyTag(
              Some("http://www.w3.org/1999/xhtml"), "meta",
              Vector(FixtureAttr(None, "charset", opts.encoding))))
            tokenIndex += 1
          }
        case _ =>
      }
      tokenIndex += 1
    }
    out
  }

  private def serializeCharacters(data: String, openStack: ArrayBuffer[String],
                                  opts: FixtureOptions): String = {
    val parentTagName = if (openStack.nonEmpty) openStack.last else null
    val preserveWhitespace = openStack.exists(PreserveWhitespaceParents.contains)
    var text = data
    if (opts.stripWhitespace && !preserveWhitespace) text = collapseSpaceRuns(text)
    if (parentTagName != null && RawtextParents.contains(parentTagName) && !opts.escapeRcdata)
      text
    else escapeText(text)
  }

  private def serializeDoctype(token: FixtureDoctype): String = {
    val hasPublic = token.publicId.nonEmpty
    val hasSystem = token.systemId.nonEmpty
    if (hasPublic && hasSystem)
      s"""<!DOCTYPE ${token.name} PUBLIC "${token.publicId}" "${token.systemId}">"""
    else if (hasPublic) s"""<!DOCTYPE ${token.name} PUBLIC "${token.publicId}">"""
    else if (hasSystem) s"""<!DOCTYPE ${token.name} SYSTEM "${token.systemId}">"""
    else s"<!DOCTYPE ${token.name}>"
  }

  /** Serialize a fixture token stream (reference
    * serializeFixtureTokenStream, serialize.ts:816-877).
    */
  def serialize(tokens: Seq[FixtureToken],
                options: FixtureOptions = FixtureOptions()): String = {
    val prepared = applyInjectMetaCharset(tokens, options)
    val chunks = new java.lang.StringBuilder
    val openStack = new ArrayBuffer[String]

    var index = 0
    while (index < prepared.length) {
      val token = prepared(index)
      val next = if (index + 1 < prepared.length) prepared(index + 1) else null
      val previous = if (index > 0) prepared(index - 1) else null

      token match {
        case t: FixtureStartTag =>
          if (!shouldOmitStartTag(t, next, previous))
            chunks.append(s"<${t.name}${serializeAttributes(t.attributes, options)}>")
          openStack += t.name
        case t: FixtureEmptyTag =>
          val attrs = serializeAttributes(t.attributes, options)
          if (options.useTrailingSolidus && VoidElements.contains(t.name))
            chunks.append(s"<${t.name}$attrs />")
          else chunks.append(s"<${t.name}$attrs>")
        case t: FixtureEndTag =>
          if (!shouldOmitEndTag(t, next)) chunks.append(s"</${t.name}>")
          // popMatching: drop from the last occurrence of the name onward
          val at = openStack.lastIndexOf(t.name)
          if (at >= 0) openStack.takeInPlace(at)
        case t: FixtureCharacters =>
          chunks.append(serializeCharacters(t.data, openStack, options))
        case t: FixtureComment =>
          chunks.append(s"<!--${t.data}-->")
        case t: FixtureDoctype =>
          chunks.append(serializeDoctype(t))
      }
      index += 1
    }
    chunks.toString
  }
}
