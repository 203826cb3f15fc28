package graft.text

import scala.collection.mutable.ArrayBuffer

/**
 * Deterministic HTML -> text extraction plus reference-faithful
 * sentence/token handling.
 *
 * Requirements (BASELINE.json input_hint / north_star):
 *  - `extractText` is a pure function of the html bytes: no locale, no
 *    wall-clock, no regex backtracking nondeterminism; byte-identical output
 *    for identical input on any JVM / partition count.
 *  - Tokenization mirrors the reference's whitespace split
 *    (NeuralNERMono/utils/utilsLocal.py:212 `line.split(" ")`).
 *  - The devanagari-danda sentence rule mirrors utilsLocal.py:148-163: a
 *    token ending in '।' closes the sentence.
 *  - Character iteration is by Unicode code point, matching Python's
 *    `for c in str` (utilsLocal.py:139), not UTF-16 chars.
 */
object TextExtract {

  /** Tags whose entire content is dropped. `title` is head metadata, not
    * body text — the extraction contract is body-visible text only. */
  private val dropContent = Set("script", "style", "noscript", "template", "title")

  /** Tags that imply a line break when they open or close. */
  private val blockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "tr", "table", "h1", "h2", "h3",
    "h4", "h5", "h6", "blockquote", "pre", "section", "article", "header",
    "footer", "nav", "main", "aside", "figure", "figcaption", "hr", "title",
    "head", "body", "html")

  /** Decode the small set of named entities plus numeric character refs.
    * Unknown entities are left verbatim (deterministic, lossless). */
  def decodeEntities(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val rep: String = name match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ =>
              if (name.startsWith("#x") || name.startsWith("#X")) {
                try {
                  val cp = Integer.parseInt(name.substring(2), 16)
                  if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
                } catch { case _: NumberFormatException => null }
              } else if (name.startsWith("#")) {
                try {
                  val cp = Integer.parseInt(name.substring(1))
                  if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
                } catch { case _: NumberFormatException => null }
              } else null
          }
          if (rep != null) { out.append(rep); i = semi + 1 }
          else { out.append(c); i += 1 }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Escape text for safe embedding in generated HTML (corpus generator). */
  def escapeHtml(s: String): String = {
    val out = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => out.append("&amp;")
        case '<' => out.append("&lt;")
        case '>' => out.append("&gt;")
        case c   => out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /**
   * Extract visible body text from HTML bytes (UTF-8, malformed sequences
   * replaced — mirroring the reference's errors='ignore' tolerance,
   * utilsLocal.py:126). Single linear scan, no regex:
   *   1. drop script/style/comment content, strip all tags;
   *   2. block-level tags emit '\n';
   *   3. decode entities;
   *   4. per line: collapse [ \t]+ to one space, trim;
   *   5. drop blank lines; join with '\n'.
   */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    extractTextStr(s)
  }

  def extractTextStr(s: String): String = {
    val raw = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var skipUntil: String = null // closing tag name whose content we drop
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = s.indexOf('>', i + 1)
          if (close < 0) { i = n } // unterminated tag: drop remainder
          else {
            val inner = s.substring(i + 1, close)
            val isEnd = inner.startsWith("/")
            val body = if (isEnd) inner.substring(1) else inner
            val nameEnd = {
              val e = body.indexWhere(ch => ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '/')
              if (e < 0) body.length else e
            }
            val name = body.substring(0, nameEnd).toLowerCase(java.util.Locale.ROOT)
            if (skipUntil != null) {
              if (isEnd && name == skipUntil) skipUntil = null
            } else if (!isEnd && dropContent.contains(name) && !inner.endsWith("/")) {
              skipUntil = name
            }
            if (skipUntil == null && blockTags.contains(name)) raw.append('\n')
            i = close + 1
          }
        }
      } else {
        if (skipUntil == null) raw.append(c)
        i += 1
      }
    }
    val decoded = decodeEntities(raw.toString)
    // normalize: per line collapse spaces/tabs, trim; drop blank lines
    val sb = new java.lang.StringBuilder(decoded.length)
    var lineHasContent = false
    var pendingSpace = false
    var j = 0
    while (j < decoded.length) {
      val ch = decoded.charAt(j)
      if (ch == '\n' || ch == '\r') {
        if (lineHasContent) { lineHasContent = false; pendingSpace = false; sb.append('\n'); }
      } else if (ch == ' ' || ch == '\t' || ch == ' ') {
        if (lineHasContent) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(ch)
        lineHasContent = true
      }
      j += 1
    }
    // strip trailing newline
    var len = sb.length
    while (len > 0 && sb.charAt(len - 1) == '\n') len -= 1
    sb.substring(0, len)
  }

  /**
   * Split extracted text into sentences. Deterministic rules:
   *  - newline always ends a sentence (readUnlabeledData: one sentence per
   *    line, utilsLocal.py:207-218);
   *  - within a line, a token ending in '.', '!', '?' or the devanagari
   *    danda '।' ends the sentence (danda semantics from utilsLocal.py:148-163
   *    where a danda token closes the sentence).
   * Tokens are produced by Python-style `split(" ")` on each line — but
   * empty tokens (from repeated spaces) cannot occur because extractText
   * collapses runs of spaces.
   */
  def sentences(text: String): Seq[Seq[String]] = {
    if (text.isEmpty) return Nil
    val out = ArrayBuffer.empty[Seq[String]]
    var cur = ArrayBuffer.empty[String]
    for (line <- splitChar(text, '\n')) {
      if (line.nonEmpty) {
        for (tok <- splitChar(line, ' ')) {
          if (tok.nonEmpty) {
            cur += tok
            val last = tok.charAt(tok.length - 1)
            if (last == '.' || last == '!' || last == '?' || last == '।') {
              out += cur.toVector; cur = ArrayBuffer.empty[String]
            }
          }
        }
        if (cur.nonEmpty) { out += cur.toVector; cur = ArrayBuffer.empty[String] }
      }
    }
    if (cur.nonEmpty) out += cur.toVector
    out.toVector
  }

  /** Allocation-light single-char split (no regex). */
  def splitChar(s: String, sep: Char): Array[String] = {
    var cnt = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == sep) cnt += 1; i += 1 }
    val res = new Array[String](cnt)
    var start = 0
    var k = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { res(k) = s.substring(start, i); k += 1; start = i + 1 }
      i += 1
    }
    res(k) = s.substring(start)
    res
  }

  /** Code-point array of a token — the faithful analog of Python's
    * `for c in str` (utilsLocal.py:139,341): non-BMP characters are single
    * items, not surrogate pairs. Each entry is rendered back to a String so
    * char-vocab keys match Python's 1-codepoint strings. */
  def codePoints(token: String): Array[String] = {
    val n = token.codePointCount(0, token.length)
    val out = new Array[String](n)
    var i = 0
    var k = 0
    while (i < token.length) {
      val cp = token.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      k += 1
      i += Character.charCount(cp)
    }
    out
  }
}
