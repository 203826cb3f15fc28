package graft.golden

import graft.ner.Bioes.Span
import scala.collection.mutable.ArrayBuffer

/**
 * Chunk (span) assembly transcribed DIRECTLY from the CoNLL-2003 scorer's
 * transition tables — the independent golden twin of `graft.ner.Bioes`.
 *
 * `Bioes` condenses the scorer's per-pair rules into boolean algebra
 * (e.g. "prevTag == E" covers five listed pairs); this twin keeps the perl
 * source's literal (prevTag, tag) pair tables
 * (/root/reference/NeuralNERMono/eval/conll03eval.v2:255-292 endOfChunk,
 * :300-336 startOfChunk, including the 1998-12-22 "[ ]" corrections), so a
 * mistake in the condensation cannot pass both the production pipeline and
 * the golden fixtures. Property-tested equal to `Bioes.spans` in
 * GoldenTwinSpec.
 *
 * The bare-tag convention matches Bioes DELIBERATELY (a dashless non-O tag
 * parses as (prefix "I", type tag)) — that is the repo's documented,
 * intentional improvement over the scorer's (prefix = tag, type = "")
 * parse, under which raw-tag corpora yield zero chunks (Bioes scaladoc).
 */
object PerlChunker {

  /** conll03eval.v2:262-280 — every (prevTag, tag) pair listed as TRUE. */
  private val endPairs: Set[(String, String)] = Set(
    ("B", "B"), ("B", "O"), ("B", "S"),
    ("I", "B"), ("I", "S"), ("I", "O"),
    ("E", "E"), ("E", "I"), ("E", "O"), ("E", "S"), ("E", "B"),
    ("S", "E"), ("S", "I"), ("S", "O"), ("S", "S"), ("S", "B"))

  /** conll03eval.v2:310-326 — every (prevTag, tag) pair listed as TRUE. */
  private val startPairs: Set[(String, String)] = Set(
    ("B", "B"), ("I", "B"), ("O", "B"), ("S", "B"), ("E", "B"),
    ("B", "S"), ("I", "S"), ("O", "S"), ("S", "S"), ("E", "S"),
    ("O", "I"), ("S", "I"), ("E", "I"),
    ("S", "E"), ("E", "E"), ("O", "E"))

  def endOfChunk(prevTag: String, tag: String, prevType: String, tpe: String): Boolean =
    endPairs((prevTag, tag)) ||
      (prevTag != "O" && prevTag != "." && prevType != tpe) ||
      prevTag == "]" || prevTag == "["

  def startOfChunk(prevTag: String, tag: String, prevType: String, tpe: String): Boolean =
    startPairs((prevTag, tag)) ||
      (tag != "O" && tag != "." && prevType != tpe) ||
      tag == "[" || tag == "]"

  /** Same bare-tag convention as Bioes.splitTag (see object scaladoc). */
  def splitTag(tag: String): (String, String) = {
    val i = tag.indexOf('-')
    if (i < 0) {
      if (tag == "O" || tag == ".") (tag, "") else ("I", tag)
    } else (tag.substring(0, i), tag.substring(i + 1))
  }

  /** Spans via the literal perl tables — the scorer's own token loop shape
    * (conll03eval.v2:130-200: close the open chunk first, then maybe open). */
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
