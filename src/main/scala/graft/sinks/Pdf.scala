package graft.sinks

import java.nio.charset.StandardCharsets.US_ASCII

/** Minimal dependency-free PDF 1.4 writer with the reference's document
  * layout (api.py:256-342): a bold 16 pt title line, an italic 12 pt
  * "Document ID: N" line, then the 12 pt word-wrapped body flowing over
  * as many A4 pages as needed. The three fonts are standard Type1
  * Helvetica faces (the PDF spec's 14 standard fonts need no embedding),
  * content streams are uncompressed ASCII, and the file carries a full
  * xref table + trailer — openable by any conforming reader.
  *
  * Non-ASCII codepoints are replaced with '_' exactly like the
  * reference's FPDF fallback (api.py:268-277, 317-321); upstream
  * normalization (WikirSource) has usually sanitized already.
  */
object Pdf {

  // A4 in points; margins/leading sized like FPDF's 10 mm defaults
  private val Margin = 28.35
  private val Leading = 14.0
  private val RowsPerPage = 56 // floor((841.89 - 2*28.35) / 14)
  private val BodyChars = 89   // ~538 pt usable width / ~6 pt avg Helvetica 12 glyph

  def render(title: String, docId: Long, body: String): Array[Byte] = {
    val rows: Vector[(String, Int, String)] =
      ("F1", 16, sanitize(title).take(80)) +:
      ("F2", 12, s"Document ID: $docId") +:
      wrap(sanitize(body).take(50000)).map(("F3", 12, _))
    val pages = rows.grouped(RowsPerPage).toVector
    val n = pages.length

    // object layout: 1 catalog, 2 page tree, 3-5 fonts, then per page i
    // (0-based): 6+2i = page node, 7+2i = its content stream
    val objs = Vector.newBuilder[String]
    objs += "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj"
    val kids = (0 until n).map(i => s"${6 + 2 * i} 0 R").mkString(" ")
    objs += s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj"
    objs += "3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >> endobj"
    objs += "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Oblique >> endobj"
    objs += "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj"
    pages.zipWithIndex.foreach { case (pageRows, i) =>
      val pageNum = 6 + 2 * i
      objs += (s"$pageNum 0 obj << /Type /Page /Parent 2 0 R " +
        "/MediaBox [0 0 595.28 841.89] " +
        "/Resources << /Font << /F1 3 0 R /F2 4 0 R /F3 5 0 R >> >> " +
        s"/Contents ${pageNum + 1} 0 R >> endobj")
      val stream = contentStream(pageRows)
      objs += s"${pageNum + 1} 0 obj << /Length ${stream.length} >> stream\n$stream\nendstream endobj"
    }
    assemble(objs.result())
  }

  /** Objects → header + bodies + byte-accurate xref + trailer. Every
    * emitted char is ASCII, so char offsets ARE byte offsets. */
  private def assemble(objs: Vector[String]): Array[Byte] = {
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o =>
      val off = sb.length
      sb.append(o).append('\n')
      off
    }
    val xref = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => sb.append("%010d 00000 n \n".format(o)))
    sb.append(s"trailer << /Size ${objs.length + 1} /Root 1 0 R >>\n")
    sb.append(s"startxref\n$xref\n%%EOF\n")
    sb.toString.getBytes(US_ASCII)
  }

  /** One text block: cursor to the top-left baseline, 14 pt leading,
    * each row `(font) Tj T*`; Tf emitted only on font changes. */
  private def contentStream(rows: Seq[(String, Int, String)]): String = {
    val sb = new StringBuilder("BT\n28.35 799.54 Td\n14 TL\n")
    var font = ""
    rows.foreach { case (f, size, text) =>
      val tf = s"/$f $size Tf"
      if (tf != font) { sb.append(tf).append('\n'); font = tf }
      sb.append('(').append(esc(text)).append(") Tj T*\n")
    }
    sb.append("ET").toString
  }

  private def sanitize(s: String): String =
    Option(s).getOrElse("").map(c => if (c < 128) c else '_')

  private def esc(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case c if c < ' ' => " "
      case c => c.toString
    }

  /** Greedy word wrap at [[BodyChars]]; hard-break longer words; blank
    * lines survive as empty rows (paragraph spacing). */
  private def wrap(text: String): Vector[String] =
    text.split("\n", -1).toVector.flatMap { line =>
      if (line.isEmpty) Vector("")
      else {
        val words = line.split("\\s+").toVector.filter(_.nonEmpty)
          .flatMap(_.grouped(BodyChars))
        val out = Vector.newBuilder[String]
        var cur = new StringBuilder
        words.foreach { w =>
          if (cur.isEmpty) cur.append(w)
          else if (cur.length + 1 + w.length <= BodyChars) cur.append(' ').append(w)
          else { out += cur.toString; cur = new StringBuilder(w) }
        }
        if (cur.nonEmpty) out += cur.toString
        val v = out.result()
        if (v.isEmpty) Vector("") else v
      }
    }
}
