package graft.tools

import java.util.Base64

import graft.core.EncodingSniff

/** Differential-oracle helper (Scala side of
  * scripts/conformance/ref_bytes_dump.mjs): decode each byte payload via
  * [[EncodingSniff.decodeHtmlBytes]] and print base64(JSON
  * [text, encoding, source]) per input line — the reference surface is
  * src/internal/encoding/sniff.ts:271-307.
  *
  * Input file: one JSON {"b": base64-bytes, "t": transportLabel|null} per
  * line (parsed with a minimal extractor — the fields are flat strings).
  */
object BytesDiffDump {

  private def js(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'           => sb.append("\\\"")
        case '\\'          => sb.append("\\\\")
        case '\b'          => sb.append("\\b")
        case '\f'          => sb.append("\\f")
        case '\n'          => sb.append("\\n")
        case '\r'          => sb.append("\\r")
        case '\t'          => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c             => sb.append(c)
      }
      i += 1
    }
    sb.append('"').toString
  }

  /** Extract a flat string field from a one-line JSON object; null when the
    * field is JSON null or absent. Values are base64/label strings with no
    * escapes, so a quote scan suffices.
    */
  private def field(line: String, name: String): String = {
    val key = "\"" + name + "\":"
    val k = line.indexOf(key)
    if (k < 0) return null
    var i = k + key.length
    while (i < line.length && line.charAt(i) == ' ') i += 1
    if (line.startsWith("null", i)) return null
    require(line.charAt(i) == '"', s"unexpected value for $name")
    val end = line.indexOf('"', i + 1)
    line.substring(i + 1, end)
  }

  def main(args: Array[String]): Unit = {
    val out = new java.lang.StringBuilder
    scala.io.Source.fromFile(args(0), "UTF-8").getLines().foreach { line =>
      if (line.trim.nonEmpty) {
        val bytes = Base64.getDecoder.decode(field(line, "b"))
        val transport = Option(field(line, "t"))
        val rendered =
          try {
            val (text, sniff) = EncodingSniff.decodeHtmlBytes(bytes, transport)
            s"[${js(text)},${js(sniff.encoding)},${js(sniff.source)}]"
          } catch { case e: Exception => s"""["THREW",${js(String.valueOf(e.getMessage))},""]""" }
        out.append(Base64.getEncoder.encodeToString(
          rendered.getBytes("UTF-8"))).append('\n')
      }
    }
    print(out)
  }
}
