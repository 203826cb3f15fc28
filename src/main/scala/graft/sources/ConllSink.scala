package graft.sources

import org.apache.spark.sql.Dataset
import graft.ner.SentenceNer

/**
 * K1 sink — the reference's prediction-file formats
 * (NeuralNERMono/NeuralNER.py:314-335):
 *  - plain: one `token gold PRED` line per token, blank line between
 *    sentences (dev/test eval loop, :373,444,516);
 *  - withProbs: `token p1..pK token gold PRED` with per-tag softmax
 *    probabilities (final test eval, :325-333).
 * Predictions are already uppercased by the tag stage (:331).
 * Output is conlleval-compatible: `perl conll03eval.v2 < file`.
 */
object ConllSink {

  def formatSentence(tokens: Seq[String], golds: Seq[String], preds: Seq[String],
                     probs: Option[Seq[Array[Float]]] = None): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < tokens.length) {
      probs match {
        case Some(ps) =>
          sb.append(tokens(i))
          ps(i).foreach(p => sb.append(' ').append(p.toString))
          sb.append(' ').append(tokens(i))
        case None =>
          sb.append(tokens(i))
      }
      sb.append(' ').append(golds(i)).append(' ').append(preds(i)).append('\n')
      i += 1
    }
    sb.toString
  }

  /** Write tagged sentences as conlleval-ready text (one file per partition;
    * `gold` empty string becomes "O" so the scorer still parses). */
  def write(ner: Dataset[SentenceNer], golds: Map[(String, Int), Seq[String]], path: String): Unit = {
    val spark = ner.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(golds)
    ner.map { s =>
      val g = bc.value.getOrElse((s.url, s.sentIdx), Seq.fill(s.tokens.length)("O"))
      formatSentence(s.tokens, g, s.preds)
    }.write.mode("overwrite").text(path)
  }

  /** The reference FINAL-TEST artifact: `token p1..pK token gold PRED`
    * (NeuralNER.py:325-333). Requires the tag stage to have run with
    * `withProbs = true`; still conlleval-compatible (the scorer reads the
    * last two fields). */
  def writeWithProbs(ner: Dataset[SentenceNer], golds: Map[(String, Int), Seq[String]],
                     path: String): Unit = {
    val spark = ner.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(golds)
    ner.map { s =>
      require(s.probs.length == s.tokens.length,
        s"no probs on ${s.url}#${s.sentIdx} — tag(withProbs = true) required")
      val g = bc.value.getOrElse((s.url, s.sentIdx), Seq.fill(s.tokens.length)("O"))
      formatSentence(s.tokens, g, s.preds, Some(s.probs.map(_.toArray)))
    }.write.mode("overwrite").text(path)
  }
}
