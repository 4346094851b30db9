package graft.tools

import java.util.Base64

import graft.core._

/** Differential-oracle helper (Scala side of
  * scripts/conformance/ref_token_dump.mjs): same canonical token rendering
  * over [[TokenizeApi.tokenize]]'s public stream.
  */
object TokenDiffDump {

  /** Minimal JSON string rendering matching JS JSON.stringify for BMP text
    * (quotes/backslash/controls escaped, everything else literal).
    */
  private def js(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"').toString
  }

  def canon(tokens: Seq[HtmlToken]): String =
    tokens.map {
      case StartTagTok(name, attrs, selfClosing) =>
        val seen = scala.collection.mutable.Set[String]()
        val rendered = attrs.collect {
          case (k, v) if seen.add(k) => s"$k=${js(v)}"
        }.mkString(",")
        s"StartTag($name)[$rendered]${if (selfClosing) "/" else ""}"
      case EndTagTok(name)  => s"EndTag($name)"
      case CharsTok(data)   => s"Chars(${js(data)})"
      case CommentTok(data) => s"Comment(${js(data)})"
      case DoctypeToken(name, publicId, systemId, forceQuirks) =>
        s"Doctype($name,${publicId.getOrElse("")},${systemId.getOrElse("")},$forceQuirks)"
      case EofTok => "EOF"
    }.mkString("\n")

  def main(args: Array[String]): Unit = {
    val out = new java.lang.StringBuilder
    scala.io.Source.fromFile(args(0), "UTF-8").getLines().foreach { line =>
      if (line.nonEmpty) {
        val html = new String(Base64.getDecoder.decode(line), "UTF-8")
        val rendered =
          try {
            val r = TokenizeApi.tokenize(html)
            val errs = r.errors.map(e => s"Err(${e.code},${e.index})")
            canon(r.tokens) + (if (errs.nonEmpty) "\n" + errs.mkString("\n") else "")
          }
          catch { case e: Throwable => s"THREW: ${e.getMessage}" }
        out.append(Base64.getEncoder.encodeToString(rendered.getBytes("UTF-8"))).append('\n')
      }
    }
    print(out)
  }
}
