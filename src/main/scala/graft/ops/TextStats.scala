package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data curation over `documents`:
 * language ID (n-gram/marker heuristic), quality scoring, token counting
 * (whitespace + BPE-ish subword estimate), and document fingerprinting
 * (rolling hash). All pure column expressions (codegen) except the rolling
 * hash, which is a deterministic Catalyst-registered Scala UDF.
 */
object TextStats {

  /** Marker lexicons per language for the heuristic classifier. The sets are
    * deterministic and intentionally tiny: the operator shape (per-lang
    * scores -> argmax with alphabetic tie-break) is the product; swap in
    * real char-n-gram profiles at deployment. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das", "ist"),
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "los", "es"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et"),
    "nl" -> Seq("de", "het", "een", "van", "en", "is")
  )

  private def toks(text: Column): Column = split(text, " ")

  /** Predicted language per doc: argmax of marker hit-counts, ties to the
    * alphabetically first language; "und" (undetermined) when no marker
    * hits at all. */
  def langId(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    // argmax with alphabetic tie-break: greatest over struct(score, negLangRank, lang)
    val structs = markers.map { case (lg, ms) =>
      struct(
        size(filter(t, x => x.isin(ms.map(_.asInstanceOf[Any]): _*))).as("score"),
        lit(-markers.indexWhere(_._1 == lg)).as("nrank"),
        lit(lg).as("lang"))
    }
    val best = greatest(structs: _*)
    docs.select(col("doc_id"),
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")).as("pred_lang"),
      best.getField("score").as("marker_hits"))
  }

  /** Quality counters (integers — exact, oracle-friendly): token count,
    * stopword hits, punctuation-ish chars, mean handled downstream. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def quality(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_uniq_tokens"),
      size(filter(t, x => x.isin(stopwords.map(_.asInstanceOf[Any]): _*))).as("n_stopwords"),
      length(col("text")).as("n_chars"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", ""))).as("n_punct"))
  }

  /** Whitespace token count plus a BPE-ish subword estimate: number of
    * 4-char subword units rounded up per token (a cheap deterministic proxy
    * for byte-pair tokenizers in data-budget accounting). */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("ws_tokens"),
      aggregate(t, lit(0L), (acc, x) => acc + ceil(length(x).cast("double") / 4.0).cast("long"))
        .as("bpe_units"))
  }

  /** Polynomial rolling-hash fingerprint (base 257 mod 2^61-1) over the raw
    * text bytes — stable across partitionings and JVMs. */
  def fingerprint64(text: String): Long = {
    val Mod = (1L << 61) - 1
    var h = 0L
    var i = 0
    while (i < text.length) {
      // multiply mod 2^61-1 without overflow: use math.multiplyHigh
      val x = h * 257L + text.charAt(i).toLong + 1L
      val hi = Math.multiplyHigh(h, 257L)
      // fold 128-bit (hi, x) into mod 2^61-1: (x & Mod) + (carry bits)
      h = ((x & Mod) + ((hi << 3) | (x >>> 61))) % Mod
      i += 1
    }
    h
  }

  val fingerprintUdf = udf(fingerprint64 _)

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.GraftFunctions.fingerprint64(col("text")).as("fingerprint"))
}
