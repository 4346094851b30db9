package graft.core

import scala.collection.mutable.ArrayBuffer

/** Public token model + standalone tokenize (reference:
  * src/internal/tokenizer/tokenize.ts:139-259 and the public token shape
  * src/public/types.ts:93-99). Adjacent character tokens are merged; the
  * stream always ends with an EOF token.
  */
sealed trait HtmlToken
final case class StartTagTok(
    name: String,
    attributes: Vector[(String, String)],
    selfClosing: Boolean
) extends HtmlToken
final case class EndTagTok(name: String) extends HtmlToken
final case class CharsTok(data: String) extends HtmlToken
final case class CommentTok(data: String) extends HtmlToken
final case class DoctypeToken(
    name: String,
    publicId: Option[String],
    systemId: Option[String],
    forceQuirks: Boolean
) extends HtmlToken
case object EofTok extends HtmlToken

final case class TokenizerError(code: String, index: Int)

final case class TokenizeOpts(
    initialState: String = "Data state",
    lastStartTag: String = "",
    cdata: Boolean = false,
    maxParseErrors: Option[Int] = None
)

final case class TokenizeResult(tokens: Vector[HtmlToken], errors: Vector[TokenizerError])

object TokenizeApi {

  private val StateByName: Map[String, Int] = Map(
    "Data state" -> TokenizerState.Data,
    "RCDATA state" -> TokenizerState.Rcdata,
    "RAWTEXT state" -> TokenizerState.Rawtext,
    "Script data state" -> TokenizerState.ScriptData,
    "PLAINTEXT state" -> TokenizerState.Plaintext,
    "CDATA section state" -> TokenizerState.CdataSection
  )

  private final class CollectingSink(opts: TokenizeOpts) extends TokenSink {
    val tokens = new ArrayBuffer[HtmlToken]
    val errors = new ArrayBuffer[TokenizerError]

    private def pushChars(data: String): Unit = {
      tokens.lastOption match {
        case Some(CharsTok(prev)) =>
          tokens(tokens.length - 1) = CharsTok(prev + data)
        case _ => tokens += CharsTok(data)
      }
    }

    override def onChars(data: String, start: Int, end: Int): Unit = pushChars(data)
    override def onWhitespace(data: String, start: Int, end: Int): Unit = pushChars(data)
    override def onNull(start: Int): Unit = pushChars("\u0000")
    override def onStartTag(tag: TagToken): Unit =
      tokens += StartTagTok(
        tag.name,
        tag.attrs.iterator.map(a => (a.name, a.value)).toVector,
        tag.selfClosing
      )
    override def onEndTag(tag: TagToken): Unit = tokens += EndTagTok(tag.name)
    override def onComment(data: String, start: Int, end: Int): Unit =
      tokens += CommentTok(data)
    override def onDoctype(d: DoctypeTok): Unit =
      tokens += DoctypeToken(
        if (d.name == null) "" else d.name,
        Option(d.publicId),
        Option(d.systemId),
        d.forceQuirks
      )
    override def onEof(pos: Int): Unit = tokens += EofTok
    override def onParseError(code: String, start: Int, end: Int): Unit = {
      if (opts.maxParseErrors.forall(errors.length < _))
        errors += TokenizerError(code, start)
    }
    override def cdataAllowed: Boolean =
      opts.cdata || opts.initialState == "CDATA section state"
  }

  def tokenize(input: String, opts: TokenizeOpts = TokenizeOpts()): TokenizeResult = {
    val sink = new CollectingSink(opts)
    val tokenizer = new Tokenizer(input, sink)
    tokenizer.state = StateByName.getOrElse(opts.initialState, TokenizerState.Data)
    tokenizer.lastStartTagName = opts.lastStartTag.toLowerCase
    tokenizer.run()
    TokenizeResult(sink.tokens.toVector, sink.errors.toVector)
  }

  /** Per-document byte-stream tokenization: chunked bytes are decoded after
    * a bounded-prescan encoding sniff, then tokenized once (the reference's
    * `tokenizeStream`, src/public/mod.ts:886-896 — per-document bounded
    * buffering, NOT dataflow streaming).
    */
  def tokenizeBytes(
      chunks: Iterator[Array[Byte]],
      transportEncodingLabel: Option[String] = None,
      opts: TokenizeOpts = TokenizeOpts()
  ): TokenizeResult = {
    val all = new java.io.ByteArrayOutputStream()
    chunks.foreach(c => all.write(c, 0, c.length))
    val (text, _) = EncodingSniff.decodeHtmlBytes(all.toByteArray, transportEncodingLabel)
    tokenize(text, opts)
  }
}
