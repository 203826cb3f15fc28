package graft.ner

import scala.collection.mutable

/**
 * String-interning vocabularies with the reference's exact semantics.
 *
 * `Vocab` (words/tags): lowercases every token on add/get
 * (NeuralNERMono/utils/vocab.py:71,99,112), `<unk>` fallback lookup
 * (vocab.py:102-113), freeze flag (vocab.py:137-148), `trim()` keeps only
 * tokens with frequency > 10 re-indexing densely in iteration order
 * (vocab.py:169-184).
 *
 * `CharVocab` is identical but case-sensitive (vocab.py:243-262).
 *
 * JSON (de)serialization round-trips the reference artifact shape — the
 * `Vocab.__dict__` dump with string keys in `_ind_to_tok`
 * (NeuralNERMono/NeuralNER.py:203-233, vocab.py:157-167 `process()`).
 */
final class Vocab(val caseSensitive: Boolean = false) extends Serializable {
  val tokToInd: mutable.LinkedHashMap[String, Int] = mutable.LinkedHashMap.empty
  val indToTok: mutable.LinkedHashMap[Int, String] = mutable.LinkedHashMap.empty
  val tokCounts: mutable.LinkedHashMap[String, Long] = mutable.LinkedHashMap.empty
  private var frozen = false

  private def norm(w: String): String =
    if (caseSensitive) w else w.toLowerCase(java.util.Locale.ROOT)

  /** vocab.py:61-81 — insert-if-absent with frequency count. */
  def add(word: String): Int = {
    val w = norm(word)
    tokToInd.get(w) match {
      case Some(ind) =>
        tokCounts(w) = tokCounts(w) + 1
        ind
      case None =>
        val ind = tokToInd.size
        indToTok(ind) = w
        tokToInd(w) = ind
        tokCounts(w) = 1L
        ind
    }
  }

  def size: Int = tokToInd.size

  /** vocab.py:89-100 — index or None. */
  def getWord(word: String): Option[Int] = tokToInd.get(norm(word))

  /** vocab.py:102-113 — index or the index of "<unk>". -1 if neither. */
  def getWordTrain(word: String): Int =
    tokToInd.getOrElse(norm(word), tokToInd.getOrElse("<unk>", -1))

  /** vocab.py:115-125. */
  def getIndex(index: Int): Option[String] = indToTok.get(index)

  def isEmpty: Boolean = tokToInd.isEmpty
  def freeze(): Unit = { frozen = true }
  def isFrozen: Boolean = frozen

  /** vocab.py:169-184 — keep tokens with count > 10, dense re-index in
    * insertion order. Counts are intentionally NOT rebuilt (the reference
    * keeps `_tok_counts` untouched). */
  def trim(threshold: Long = 10L): Unit = {
    val keep = tokCounts.iterator.filter(_._2 > threshold).map(_._1).toVector
    tokToInd.clear(); indToTok.clear()
    keep.foreach { k =>
      val ind = tokToInd.size
      indToTok(ind) = k
      tokToInd(k) = ind
    }
  }

  /** Reference artifact JSON: the `Vocab.__dict__` shape with string keys. */
  def toJson: String = {
    def esc(s: String): String = {
      val b = new java.lang.StringBuilder(s.length + 8)
      s.foreach {
        case '"'  => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.toString
    }
    val t2i = tokToInd.iterator.map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ", ", "}")
    val i2t = indToTok.iterator.map { case (k, v) => s""""$k": "${esc(v)}"""" }.mkString("{", ", ", "}")
    val cnt = tokCounts.iterator.map { case (k, v) => s""""${esc(k)}": $v""" }.mkString("{", ", ", "}")
    s"""{"_tok_to_ind": $t2i, "_ind_to_tok": $i2t, "_tok_counts": $cnt, "_Vocab__freeze__": $frozen}"""
  }
}

object Vocab {

  /** Parse the reference JSON artifact (`char.vocab` / `output.vocab` /
    * `input.vocab`) including the `process()` int-key fixup
    * (vocab.py:157-167). Minimal recursive-descent parser: the artifact
    * grammar is flat {str: int|str|bool} maps. */
  def fromJson(json: String, caseSensitive: Boolean = false): Vocab = {
    val v = new Vocab(caseSensitive)
    val p = new JsonParser(json)
    val root = p.parseObject()
    root.get("_tok_to_ind").foreach {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].foreach {
        case (k, i: Long) => v.tokToInd(k) = i.toInt
        case _ => ()
      }
      case _ => ()
    }
    root.get("_ind_to_tok").foreach {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].foreach {
        case (k, s: String) => v.indToTok(k.toInt) = s // process(): int-key fixup
        case _ => ()
      }
      case _ => ()
    }
    root.get("_tok_counts").foreach {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].foreach {
        case (k, i: Long) => v.tokCounts(k) = i
        case _ => ()
      }
      case _ => ()
    }
    root.get("_Vocab__freeze__").foreach { case b: Boolean => if (b) v.freeze(); case _ => () }
    v
  }

  /** Build a char vocab seeded with the reference's sentence markers
    * (NeuralNER.py:171-173). */
  def newCharVocab(): Vocab = {
    val v = new Vocab(caseSensitive = true)
    v.add("<S>"); v.add("</S>")
    v
  }
}

/** Tiny JSON parser for the flat vocab artifacts (no external deps). */
private[ner] final class JsonParser(s: String) {
  private var i = 0
  private def ws(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
  private def expect(c: Char): Unit = { ws(); require(s.charAt(i) == c, s"expected $c at $i"); i += 1 }

  def parseObject(): Map[String, Any] = {
    expect('{'); ws()
    val b = Map.newBuilder[String, Any]
    if (s.charAt(i) == '}') { i += 1; return b.result() }
    var done = false
    while (!done) {
      ws()
      val k = parseString()
      expect(':')
      val v = parseValue()
      b += (k -> v)
      ws()
      if (s.charAt(i) == ',') i += 1
      else { expect('}'); done = true }
    }
    b.result()
  }

  def parseValue(): Any = {
    ws()
    s.charAt(i) match {
      case '{' => parseObject()
      case '"' => parseString()
      case 't' => i += 4; true
      case 'f' => i += 5; false
      case 'n' => i += 4; null
      case _ =>
        val start = i
        while (i < s.length && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) i += 1
        val tok = s.substring(start, i)
        if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble else tok.toLong
    }
  }

  def parseString(): String = {
    expect('"')
    val b = new java.lang.StringBuilder()
    while (s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\') {
        i += 1
        s.charAt(i) match {
          case '"'  => b.append('"')
          case '\\' => b.append('\\')
          case '/'  => b.append('/')
          case 'n'  => b.append('\n')
          case 'r'  => b.append('\r')
          case 't'  => b.append('\t')
          case 'b'  => b.append('\b')
          case 'f'  => b.append('\f')
          case 'u'  =>
            val hex = s.substring(i + 1, i + 5); i += 4
            b.append(Integer.parseInt(hex, 16).toChar)
          case other => b.append(other)
        }
      } else b.append(c)
      i += 1
    }
    i += 1
    b.toString
  }
}
