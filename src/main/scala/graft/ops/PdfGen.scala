package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic synthetic PDF writer (oracle-friendly).
  *
  * Every decoded property of `syntheticPdf(id)` is CLOSED-FORM in the doc
  * id, so a SQL oracle can restate the extraction output without touching
  * the bytes:
  *
  *   nPages     = 1 + id mod 3
  *   nLines(p)  = 2 + (id + p) mod 3
  *   text(p, j) = "doc <id> page <p> line <j>"
  *   baseline y = 720 - 20*j   (x = 72, font size 12)
  *
  * and full-document text = pages joined by a blank line, page text = lines
  * joined by newline.
  *
  * The WRITER varies structurally with the id so one oracle covers every
  * structural path of [[Pdf.parse]]:
  *   - id % 9 == 0  -> PDF 1.5 layout: cross-reference STREAM + object
  *                     stream (catalog/pages/page/font objects compressed
  *                     into an ObjStm), content streams Flate-compressed;
  *   - otherwise    -> classic xref table; content streams Flate-compressed
  *                     unless id % 4 == 0 (raw); among the compressed ones
  *                     the WIRE filter varies: id % 13 == 1 -> LZWDecode,
  *                     id % 13 == 2 -> RunLengthDecode, id % 13 == 3 ->
  *                     [/ASCII85Decode /FlateDecode] chain (decoded text is
  *                     identical — only the encoding differs, so the same
  *                     closed-form oracle exercises every filter decoder);
  *   - id % 5 == 0  -> lines shown as TJ arrays with a small (-10) kern
  *                     split mid-string (no space: above the -200 word-break
  *                     threshold);
  *   - else id % 3 == 0 -> lines shown with the `'` next-line operator and
  *                     TL leading;
  *   - else         -> plain Td/Tj moves;
  *   - id % 11 == 0 (classic only) -> the font carries a /ToUnicode CMap
  *                     (identity bfrange over the ASCII codespace) and a
  *                     /Widths table of 500/1000 em — the SAME decoded text
  *                     and the same advances as the default path, so the
  *                     closed-form oracle also exercises CMap parsing and
  *                     width-table arithmetic.
  */
object PdfGen {

  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }

  def nPages(id: Long): Int = (1L + id % 3L).toInt
  def nLines(id: Long, p: Int): Int = (2L + (id + p) % 3L).toInt
  def lineText(id: Long, p: Int, j: Int): String = s"doc $id page $p line $j"

  /** The extraction text [[Pdf.extractText]] must produce for
    * `syntheticPdf(id)` — the Scala-side closed form (the DuckDB oracle
    * restates the same formulas independently).
    */
  def expectedText(docId: Long): String = {
    val id = docId & Long.MaxValue
    (0 until nPages(id)).map { p =>
      (0 until nLines(id, p)).map(j => lineText(id, p, j)).mkString("\n")
    }.mkString("\n\n")
  }

  private def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    try {
      d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream(b.length / 2 + 16)
      val buf = new Array[Byte](8192)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      out.toByteArray
    } finally d.end()
  }

  /** ASCII85 encoder (ISO 32000 7.4.3): 4 bytes -> 5 chars '!'..'u',
    * all-zero group -> 'z', final partial group of n bytes -> n+1 chars,
    * terminated by `~>`.
    */
  private[graft] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 5 / 4 + 8)
    def group(v0: Long, nOut: Int): Unit = {
      var v = v0
      val cs = new Array[Byte](5)
      var j = 4
      while (j >= 0) { cs(j) = ((v % 85L) + '!').toByte; v /= 85L; j -= 1 }
      out.write(cs, 0, nOut)
    }
    var i = 0
    while (i + 4 <= data.length) {
      val v = ((data(i) & 0xffL) << 24) | ((data(i + 1) & 0xffL) << 16) |
        ((data(i + 2) & 0xffL) << 8) | (data(i + 3) & 0xffL)
      if (v == 0L) out.write('z') else group(v, 5)
      i += 4
    }
    val rem = data.length - i
    if (rem > 0) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (if (j < rem) data(i + j) & 0xffL else 0L); j += 1 }
      group(v, rem + 1)
    }
    out.write('~'); out.write('>')
    out.toByteArray
  }

  /** RunLengthDecode encoder (ISO 32000 7.4.5): runs of >= 2 identical
    * bytes become (257-len, byte); literals are broken before the next
    * 2-run; 128 terminates.
    */
  private[graft] def runLengthEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + data.length / 64 + 8)
    var i = 0
    while (i < data.length) {
      var r = 1
      while (i + r < data.length && r < 128 && data(i + r) == data(i)) r += 1
      if (r >= 2) { out.write(257 - r); out.write(data(i)); i += r }
      else {
        var j = i + 1
        while (j < data.length && (j - i) < 128 &&
               !(j + 1 < data.length && data(j) == data(j + 1))) j += 1
        out.write(j - i - 1); out.write(data, i, j - i); i = j
      }
    }
    out.write(128)
    out.toByteArray
  }

  /** PDF/TIFF LZW encoder (ISO 32000 7.4.4): MSB-first variable-width codes
    * from 9 bits, 256 = clear, 257 = EOD. With `earlyChange = 1` (the PDF
    * default) the code width grows one entry early, exactly compensating a
    * decoder whose table lags the encoder's by one entry; a clear is
    * emitted before the 12-bit table fills.
    */
  private[graft] def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 32)
    var acc = 0L
    var nbits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      nbits += width
      while (nbits >= 8) { out.write(((acc >>> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
    }
    val table = new java.util.HashMap[Long, Integer]()
    var next = 258
    put(256)
    var w = -1 // current prefix code (-1: none yet / just cleared)
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (w < 0) w = c
      else {
        val key = (w.toLong << 8) | c
        val hit = table.get(key)
        if (hit != null) w = hit.intValue
        else {
          put(w)
          table.put(key, Integer.valueOf(next))
          next += 1
          // decoder's table lags one entry: bump when next - 1 + early hits 2^w
          if (width < 12 && next - 1 + earlyChange >= (1 << width)) width += 1
          if (next >= 4095) { put(256); table.clear(); next = 258; width = 9 }
          // after a clear, c is the decoder's hasPrev=false first code —
          // starting the next sequence from it is correct in both paths
          w = c
        }
      }
      i += 1
    }
    if (w >= 0) put(w)
    put(257)
    if (nbits > 0) out.write(((acc << (8 - nbits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Wire encoding for a compressed content stream: the id picks the
    * filter so the closed-form oracle exercises every decoder; the filter
    * array is in DECODE order (ASCII85 undone first, then Flate).
    */
  private def contentFilter(id: Long, raw: Array[Byte]): (Array[Byte], String) =
    (id % 13L) match {
      case 1L => (lzwEncode(raw), " /Filter /LZWDecode")
      case 2L => (runLengthEncode(raw), " /Filter /RunLengthDecode")
      case 3L => (ascii85Encode(deflateBytes(raw)), " /Filter [/ASCII85Decode /FlateDecode]")
      case _ => (deflateBytes(raw), " /Filter /FlateDecode")
    }

  /** Content stream for page `p` in the id-selected show-operator style. */
  private def contentBytes(id: Long, p: Int): Array[Byte] = {
    val n = nLines(id, p)
    val sb = new StringBuilder(256)
    sb.append("BT\n/F1 12 Tf\n")
    if (id % 5L == 0L) { // TJ arrays with a non-breaking kern split
      var j = 0
      while (j < n) {
        sb.append(if (j == 0) "72 720 Td\n" else "0 -20 Td\n")
        val t = lineText(id, p, j)
        val k = math.min(8, t.length - 1)
        sb.append(s"[(${esc(t.substring(0, k))}) -10 (${esc(t.substring(k))})] TJ\n")
        j += 1
      }
    } else if (id % 3L == 0L) { // ' next-line shows driven by TL
      sb.append("20 TL\n72 740 Td\n")
      var j = 0
      while (j < n) { sb.append(s"(${esc(lineText(id, p, j))}) '\n"); j += 1 }
    } else { // plain Td/Tj
      var j = 0
      while (j < n) {
        sb.append(if (j == 0) "72 720 Td\n" else "0 -20 Td\n")
        sb.append(s"(${esc(lineText(id, p, j))}) Tj\n")
        j += 1
      }
    }
    sb.append("ET\n")
    // paint the embedded DCT image: `Do` has no text effect, so the
    // closed-form expected text is unchanged — the point is that the
    // interpreter steps over it rather than poisoning
    if (hasDctImage(id)) sb.append("q 100 0 0 100 200 400 cm /Im0 Do Q\n")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** Deterministic JPEG-shaped binary payload for the DCT image XObject:
    * SOI/APP0 header, xorshift body bytes (full 0-255 range), a decoy
    * ASCII `endstream` spliced mid-body (the declared /Length must win
    * over any naive byte scan), EOI tail.
    */
  private def dctBytes(id: Long): Array[Byte] = {
    val n = 192 + (id % 64L).toInt
    val out = new Array[Byte](n)
    out(0) = 0xff.toByte; out(1) = 0xd8.toByte
    out(2) = 0xff.toByte; out(3) = 0xe0.toByte
    var x = id | 1L
    var i = 4
    while (i < n - 2) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(i) = (x & 0xff).toByte
      i += 1
    }
    val decoy = "endstream".getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(decoy, 0, out, 64, decoy.length)
    out(n - 2) = 0xff.toByte; out(n - 1) = 0xd9.toByte
    out
  }

  /** Whether `syntheticPdf(id)` emits the ENCRYPTED variant (a structurally
    * valid PDF whose trailer carries /Encrypt): the parser must refuse it
    * with the stable `encrypted` poison code, never attempt extraction.
    */
  def isEncrypted(docId: Long): Boolean = (docId & Long.MaxValue) % 19L == 5L

  /** Whether `syntheticPdf(id)` embeds a DCTDecode image XObject (binary
    * JPEG-shaped payload, including a decoy `endstream` inside the data)
    * referenced by a `Do` operator: extracted text must be unaffected —
    * image pixel data is stepped over via /Length, never decoded.
    */
  def hasDctImage(docId: Long): Boolean = {
    val id = docId & Long.MaxValue
    !isEncrypted(id) && id % 9L != 0L && id % 17L == 1L
  }

  def syntheticPdf(docId: Long): Array[Byte] = {
    val id = docId & Long.MaxValue
    if (isEncrypted(id)) encryptedPdf(id)
    else if (id % 9L == 0L) modernPdf(id) else classicPdf(id)
  }

  // ------------------------------------------------------------------
  // Classic layout: uncompressed object bodies + xref TABLE

  private def classicPdf(id: Long): Array[Byte] = {
    val np = nPages(id)
    val compress = id % 4L != 0L
    val withCMap = id % 11L == 0L
    val withImage = hasDctImage(id)
    val fontObj = 3 + 2 * np
    val cmapObjs = if (withCMap) 1 else 0 // ToUnicode stream
    val imgObj = fontObj + cmapObjs + 1
    val nObj = fontObj + cmapObjs + (if (withImage) 1 else 0)
    val bos = new ByteArrayOutputStream(2048)
    val offsets = new Array[Long](nObj + 1)
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def beginObj(n: Int): Unit = { offsets(n) = bos.size.toLong; w(s"$n 0 obj\n") }

    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w("<< /Type /Pages /Kids [" +
      (0 until np).map(p => s"${3 + 2 * p} 0 R").mkString(" ") +
      s"] /Count $np >>\nendobj\n")
    for (p <- 0 until np) {
      beginObj(3 + 2 * p)
      val xobjRes = if (withImage) s" /XObject << /Im0 $imgObj 0 R >>" else ""
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >>$xobjRes >> /Contents ${4 + 2 * p} 0 R >>\nendobj\n")
      beginObj(4 + 2 * p)
      val raw = contentBytes(id, p)
      val (data, filter) =
        if (compress) contentFilter(id, raw) else (raw, "")
      w(s"<< /Length ${data.length}$filter >>\nstream\n")
      bos.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontObj)
    if (withCMap) {
      // identity ToUnicode over ASCII + uniform 500/1000 em widths: decoded
      // text and advances equal the default path, so the closed-form oracle
      // holds while the CMap/Widths machinery is on the hot path
      w("<< /Type /Font /Subtype /TrueType /BaseFont /SubsetAA+Mono " +
        s"/FirstChar 32 /Widths [${Seq.fill(95)("500").mkString(" ")}] " +
        s"/ToUnicode ${fontObj + 1} 0 R >>\nendobj\n")
      beginObj(fontObj + 1)
      val cmap = "/CIDInit /ProcSet findresource begin\nbegincmap\n" +
        "1 begincodespacerange\n<00> <FF>\nendcodespacerange\n" +
        "1 beginbfrange\n<20> <7E> <0020>\nendbfrange\n" +
        "endcmap\nend"
      w(s"<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
    } else {
      w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n")
    }
    if (withImage) {
      val img = dctBytes(id)
      beginObj(imgObj)
      w(s"<< /Type /XObject /Subtype /Image /Width 16 /Height 16 " +
        s"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter /DCTDecode " +
        s"/Length ${img.length} >>\nstream\n")
      bos.write(img, 0, img.length)
      w("\nendstream\nendobj\n")
    }

    val xrefOff = bos.size.toLong
    w(s"xref\n0 ${nObj + 1}\n")
    w("0000000000 65535 f\r\n")
    for (n <- 1 to nObj) w(f"${offsets(n)}%010d 00000 n\r\n")
    w(s"trailer\n<< /Size ${nObj + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Encrypted variant: structurally valid classic PDF whose trailer carries
  // /Encrypt (standard security handler dict). The content stream bytes are
  // deterministic cipher-shaped garbage — the parser must refuse at the
  // trailer (stable `encrypted` poison code) and never reach them.

  private def encryptedPdf(id: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1024)
    val offsets = new Array[Long](6)
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def beginObj(n: Int): Unit = { offsets(n) = bos.size.toLong; w(s"$n 0 obj\n") }
    w("%PDF-1.4\n%âãÏÓ\n")
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2); w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    beginObj(3)
    w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\nendobj\n")
    beginObj(4)
    val junk = new Array[Byte](48 + (id % 32L).toInt)
    var x = id | 3L
    var i = 0
    while (i < junk.length) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      junk(i) = (x & 0xff).toByte
      i += 1
    }
    w(s"<< /Length ${junk.length} >>\nstream\n")
    bos.write(junk, 0, junk.length)
    w("\nendstream\nendobj\n")
    beginObj(5)
    val ou = (0 until 32).map(j => f"${(id * 31 + j * 7) % 256}%02x").mkString
    w("<< /Filter /Standard /V 2 /R 3 /P -44 " +
      s"/O <$ou> /U <$ou> >>\nendobj\n")
    val xrefOff = bos.size.toLong
    w("xref\n0 6\n")
    w("0000000000 65535 f\r\n")
    for (n <- 1 to 5) w(f"${offsets(n)}%010d 00000 n\r\n")
    w(s"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R " +
      s"/ID [<${ou.take(32)}> <${ou.take(32)}>] >>\nstartxref\n$xrefOff\n%%EOF\n")
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Modern layout (PDF 1.5+): object stream + cross-reference STREAM

  private def modernPdf(id: Long): Array[Byte] = {
    val np = nPages(id)
    val fontObj = 3 + 2 * np
    val objStmObj = fontObj + 1
    val xrefObj = fontObj + 2
    val bos = new ByteArrayOutputStream(2048)
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))

    w("%PDF-1.5\n%âãÏÓ\n")

    // content streams live directly in the file (streams cannot be in an ObjStm)
    val contentOffsets = new Array[Long](np)
    for (p <- 0 until np) {
      contentOffsets(p) = bos.size.toLong
      w(s"${4 + 2 * p} 0 obj\n")
      val data = deflateBytes(contentBytes(id, p))
      w(s"<< /Length ${data.length} /Filter /FlateDecode >>\nstream\n")
      bos.write(data, 0, data.length)
      w("\nendstream\nendobj\n")
    }

    // the compressed (non-stream) objects, in ObjStm index order
    val stmObjects: Vector[(Int, String)] =
      Vector(
        1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> ("<< /Type /Pages /Kids [" +
          (0 until np).map(p => s"${3 + 2 * p} 0 R").mkString(" ") +
          s"] /Count $np >>")) ++
        (0 until np).map(p => (3 + 2 * p) ->
          (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents ${4 + 2 * p} 0 R >>")) :+
        fontObj -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"

    val body = stmObjects.map(_._2).mkString("\n") + "\n"
    val offsetsInBody = {
      var off = 0
      stmObjects.map { case (num, s) => val o = (num, off); off += s.length + 1; o }
    }
    val header = offsetsInBody.map { case (num, off) => s"$num $off" }.mkString(" ") + "\n"
    val stmData = deflateBytes((header + body).getBytes(StandardCharsets.ISO_8859_1))

    val objStmOff = bos.size.toLong
    w(s"$objStmObj 0 obj\n<< /Type /ObjStm /N ${stmObjects.length} /First ${header.length} " +
      s"/Length ${stmData.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(stmData, 0, stmData.length)
    w("\nendstream\nendobj\n")

    // cross-reference stream: W = [1 4 2], Index = [0, Size]
    val size = xrefObj + 1
    val rows = new ByteArrayOutputStream(size * 7)
    def row(t: Int, f2: Long, f3: Int): Unit = {
      rows.write(t)
      rows.write(((f2 >> 24) & 0xff).toInt); rows.write(((f2 >> 16) & 0xff).toInt)
      rows.write(((f2 >> 8) & 0xff).toInt); rows.write((f2 & 0xff).toInt)
      rows.write((f3 >> 8) & 0xff); rows.write(f3 & 0xff)
    }
    val inStmIndex = stmObjects.map(_._1).zipWithIndex.toMap
    val xrefStreamOff = bos.size.toLong
    for (n <- 0 until size) {
      if (n == 0) row(0, 0L, 0xffff)
      else if (inStmIndex.contains(n)) row(2, objStmObj.toLong, inStmIndex(n))
      else if (n >= 4 && n <= 4 + 2 * (np - 1) && (n - 4) % 2 == 0) row(1, contentOffsets((n - 4) / 2), 0)
      else if (n == objStmObj) row(1, objStmOff, 0)
      else if (n == xrefObj) row(1, xrefStreamOff, 0)
      else row(0, 0L, 0)
    }
    val xrefData = deflateBytes(rows.toByteArray)
    w(s"$xrefObj 0 obj\n<< /Type /XRef /Size $size /W [1 4 2] /Root 1 0 R " +
      s"/Length ${xrefData.length} /Filter /FlateDecode >>\nstream\n")
    bos.write(xrefData, 0, xrefData.length)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefStreamOff\n%%EOF\n")
    bos.toByteArray
  }
}
