package graft.ner

import scala.collection.mutable.ArrayBuffer

/**
 * IOBES tag handling: span (chunk) extraction with the exact transition
 * semantics of the CoNLL-2003 evaluator the reference invokes on every
 * evaluation (NeuralNERMono/eval/conll03eval.v2:255-336 endOfChunk /
 * startOfChunk; invoked from NeuralNER.py:52).
 *
 * A tag is `PREFIX-TYPE` (e.g. `B-PER`) or bare (`O`, or raw types like
 * `LOC` in the reference's German data). Bare non-O tags are mapped here to
 * (prefix = "I", type = tag), so each maximal run of one raw tag becomes
 * one typed chunk. This is an INTENTIONAL improvement over conlleval, not
 * parity: the perl scorer parses a dashless tag as (prefix = tag,
 * type = "") and its transition tables then never start a chunk for
 * raw-type runs — raw-tag data would produce zero chunks there. The
 * pipeline's own output is always IOBES, where the two behaviors agree;
 * only direct raw-tag scoring diverges (deliberately, in favor of counting
 * the chunks the data clearly denotes). For scoring raw-tag corpora
 * IDENTICALLY to the reference scorer (both default and `-r` modes),
 * `conllCounts` below replicates the scorer's counting loop verbatim —
 * integer-exact parity is tested against the perl script itself.
 */
object Bioes {

  final case class Span(begin: Int, end: Int, tpe: String) // [begin, end)

  @inline def splitTag(tag: String): (String, String) = {
    val i = tag.indexOf('-')
    if (i < 0) {
      if (tag == "O" || tag == ".") (tag, "") else ("I", tag)
    } else (tag.substring(0, i), tag.substring(i + 1))
  }

  /** conll03eval.v2:255-292 */
  def endOfChunk(prevTag: String, tag: String, prevType: String, tpe: String): Boolean = {
    (prevTag == "B" && (tag == "B" || tag == "O" || tag == "S")) ||
    (prevTag == "I" && (tag == "B" || tag == "S" || tag == "O")) ||
    (prevTag == "E") ||
    (prevTag == "S") ||
    (prevTag != "O" && prevTag != "." && prevType != tpe) ||
    (prevTag == "[" || prevTag == "]") // conll03eval: length-1 bracket chunks
  }

  /** conll03eval.v2:300-336 */
  def startOfChunk(prevTag: String, tag: String, prevType: String, tpe: String): Boolean = {
    (tag == "B") ||
    (tag == "S") ||
    ((prevTag == "O" || prevTag == "S" || prevTag == "E") && tag == "I") ||
    ((prevTag == "S" || prevTag == "E" || prevTag == "O") && tag == "E") ||
    (tag != "O" && tag != "." && prevType != tpe) ||
    (tag == "[" || tag == "]") // conll03eval: length-1 bracket chunks
  }

  /** Note: conlleval's E rules list E->E/I/O/S/B all true, and S rules list
    * S->E/I/O/S/B all true — i.e. any transition out of E or S ends the
    * chunk; encoded above as (prevTag == "E") || (prevTag == "S"). */

  /** Extract spans from a tag sequence using startOfChunk/endOfChunk —
    * identical chunking to the perl evaluator. */
  def spans(tags: IndexedSeq[String]): Vector[Span] = {
    val out = ArrayBuffer.empty[Span]
    var inChunk = false
    var chunkStart = 0
    var chunkType = ""
    var prevTag = "O"
    var prevType = ""
    var i = 0
    while (i < tags.length) {
      val (t, tp) = splitTag(tags(i))
      if (inChunk && endOfChunk(prevTag, t, prevType, tp)) {
        out += Span(chunkStart, i, chunkType)
        inChunk = false
      }
      if (!inChunk && startOfChunk(prevTag, t, prevType, tp) && t != "O" && t != ".") {
        inChunk = true; chunkStart = i; chunkType = tp
      }
      prevTag = t; prevType = tp
      i += 1
    }
    if (inChunk) out += Span(chunkStart, tags.length, chunkType)
    out.toVector
  }

  /** conll03eval's OWN tag parse (conll03eval.v2:107-127): a dashless tag
    * is (prefix = tag, type = "") — NOT remapped to I-<tag>. */
  @inline def splitTagPerl(tag: String): (String, String) = {
    val i = tag.indexOf('-')
    if (i < 0) (tag, "") else (tag.substring(0, i), tag.substring(i + 1))
  }

  final case class ConllCounts(correctChunk: Long, foundCorrect: Long,
                               foundGuessed: Long, correctTags: Long, tokens: Long) {
    def precision: Double = if (foundGuessed > 0) 100.0 * correctChunk / foundGuessed else 0.0
    def recall: Double = if (foundCorrect > 0) 100.0 * correctChunk / foundCorrect else 0.0
    def fb1: Double =
      if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
  }

  /**
   * EXACT conll03eval COUNTING (conll03eval.v2:83-177, loop verbatim) — the
   * parity twin of span-based scoring for raw-tag (dashless) corpora.
   *
   * Span extraction is the wrong abstraction for the scorer's default-mode
   * handling of dashless tags: a bare tag parses as (prefix = tag,
   * type = "") and the scorer's phrase counting is EVENT-based — a
   * startOfChunk event increments foundGuessed even while a previous
   * ""-type chunk is still open, and ""-type chunks do not end at O (types
   * stay equal), so they can cross sentence boundaries. `spans` therefore
   * intentionally deviates on raw tags (maximal typed runs — see header);
   * this counter reproduces the scorer's integers exactly instead.
   *
   * `raw = true` mirrors the `-r` flag (conll03eval.v2:96-105): a bare tag
   * equal to `oTag` becomes O, any other non-O tag (even an already-dashed
   * one) gains a `B-` prefix — so every raw-tag token is its own chunk.
   * Sentence boundaries are processed as the scorer's synthesized
   * (boundary, O, O) line: they advance the transition state but do not
   * count as tokens.
   */
  def conllCounts(sentences: Iterable[IndexedSeq[(String, String)]],
                  raw: Boolean = false, oTag: String = "O"): ConllCounts = {
    def parse(tag0: String): (String, String) = {
      val tag =
        if (!raw || tag0 == "O") tag0
        else if (tag0 == oTag) "O"
        else "B-" + tag0
      splitTagPerl(tag)
    }
    // perl's $last* start undefined (compare as "")
    var lastCorrect = ""; var lastCorrectType = ""
    var lastGuessed = ""; var lastGuessedType = ""
    var inCorrect = false
    var correctChunk = 0L; var foundCorrect = 0L; var foundGuessed = 0L
    var correctTags = 0L; var tokens = 0L
    for (sent <- sentences;
         (goldPred, isBoundary) <- sent.iterator.map((_, false)) ++ Iterator((("O", "O"), true))) {
      val (correct, correctType) = parse(goldPred._1)
      val (guessed, guessedType) = parse(goldPred._2)
      if (inCorrect) {
        val endC = endOfChunk(lastCorrect, correct, lastCorrectType, correctType)
        val endG = endOfChunk(lastGuessed, guessed, lastGuessedType, guessedType)
        if (endC && endG && lastGuessedType == lastCorrectType) {
          inCorrect = false; correctChunk += 1
        } else if (endC != endG || guessedType != correctType) {
          inCorrect = false
        }
      }
      if (startOfChunk(lastCorrect, correct, lastCorrectType, correctType) &&
          startOfChunk(lastGuessed, guessed, lastGuessedType, guessedType) &&
          guessedType == correctType) inCorrect = true
      if (startOfChunk(lastCorrect, correct, lastCorrectType, correctType)) foundCorrect += 1
      if (startOfChunk(lastGuessed, guessed, lastGuessedType, guessedType)) foundGuessed += 1
      if (!isBoundary) {
        if (correct == guessed && guessedType == correctType) correctTags += 1
        tokens += 1
      }
      lastGuessed = guessed; lastCorrect = correct
      lastGuessedType = guessedType; lastCorrectType = correctType
    }
    if (inCorrect) correctChunk += 1
    ConllCounts(correctChunk, foundCorrect, foundGuessed, correctTags, tokens)
  }
}
