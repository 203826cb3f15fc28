package graft

import graft.core.Sentence
import graft.ner.{Kernel, Models, NerStage}
import graft.text.TextExtract

class VariantsSpec extends SparkSpec {

  private def corpus: Seq[Sentence] = {
    val rnd = new scala.util.Random(21)
    val vocab = Vector("uno", "dos", "tres", "vier", "fünf", "sechs")
    for (d <- 0 until 24) yield {
      val lang = if (d % 2 == 0) "es" else "de"
      Sentence(s"u$d", lang, 0, Vector.fill(2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))))
    }
  }

  test("Yang variant: shared char-CNN arrays, per-language everything else") {
    import spark.implicits._
    val m = Models.buildYang(spark, spark.createDataset(corpus))
    val (es, de) = (m("es"), m("de"))
    assert(es.weights.convW eq de.weights.convW) // same array refs = one broadcast copy
    assert(es.weights.convB eq de.weights.convB)
    assert(es.charVocab eq de.charVocab)
    assert(!(es.weights.fwIh eq de.weights.fwIh)) // per-lang LSTMs
    assert(!(es.weights.outW eq de.weights.outW))
  }

  test("AllShared variant: one network, identical tags for identical input across langs") {
    import spark.implicits._
    val m = Models.buildAllShared(spark, spark.createDataset(corpus))
    assert(m("es") eq m("de"))
    assert(m.contains("*"))
    val sent = Vector("uno", "dos", "tres")
    assert(NerStage.tagSentence(sent, m("es"), useViterbi = false) ==
      NerStage.tagSentence(sent, m("de"), useViterbi = false))
  }

  test("SharedEncoder variant: same BiLSTM states, per-language decode heads") {
    import spark.implicits._
    val m = Models.buildSharedEncoder(spark, spark.createDataset(corpus))
    val (es, de) = (m("es"), m("de"))
    assert(es.weights.fwIh eq de.weights.fwIh) // shared encoder
    assert(es.weights.embeddings eq de.weights.embeddings)
    assert(!(es.weights.outW eq de.weights.outW)) // per-lang head
    val sent = Vector("uno", "fünf")
    def hidden(mm: Models.LangModel) = Kernel.bilstmStates(sent,
      sent.map(mm.inputVocab.getWordTrain).toArray,
      sent.map(TextExtract.codePoints).toArray, mm.charVocab, mm.weights)
    val he = hidden(es); val hd = hidden(de)
    for (t <- he.indices) assert(he(t).toSeq == hd(t).toSeq)
    // heads differ -> decodes may differ; at minimum the logits differ
    val ge = Kernel.greedyDecode(he, es.weights)
    val gd = Kernel.greedyDecode(hd, de.weights)
    assert(ge.probs(0).toSeq != gd.probs(0).toSeq)
  }

  test("per-language tag vocabularies: disjoint tag sets route correctly") {
    import spark.implicits._
    // es tags PER/LOC, de raw-style tags only ORG/MISC — disjoint spaces
    // (Yang's separate aux tag vocab, NeuralNERYang.py:63-64,106,157;
    // NoOutput's per-language tag vocabs, modules.py:278-284)
    def mkTagVocab(types: Seq[String]): graft.ner.Vocab = {
      val v = new graft.ner.Vocab(caseSensitive = false)
      v.add("O")
      types.foreach(t => Seq("B-", "I-", "E-", "S-").foreach(p => v.add(p + t)))
      v.freeze()
      v
    }
    val tagVocabs = Map("es" -> mkTagVocab(Seq("PER", "LOC")),
                        "de" -> mkTagVocab(Seq("ORG", "MISC")))
    for (m <- Seq(Models.buildYang(spark, spark.createDataset(corpus), tagVocabs = tagVocabs),
                  Models.buildSharedEncoder(spark, spark.createDataset(corpus), tagVocabs = tagVocabs))) {
      val (es, de) = (m("es"), m("de"))
      assert(es.tagVocab.size == 9 && de.tagVocab.size == 9)
      assert(es.weights.tagCount == 9 && de.weights.tagCount == 9)
      assert(es.weights.outW.head.length == 2 * es.weights.hidden + 9)
      val esAllowed = (0 until es.tagVocab.size)
        .map(es.tagVocab.getIndex(_).get.toUpperCase(java.util.Locale.ROOT)).toSet
      val deAllowed = (0 until de.tagVocab.size)
        .map(de.tagVocab.getIndex(_).get.toUpperCase(java.util.Locale.ROOT)).toSet
      assert((esAllowed - "O").intersect(deAllowed - "O").isEmpty)
      corpus.foreach { s =>
        val model = m(s.lang)
        val allowed = if (s.lang == "es") esAllowed else deAllowed
        val tags = NerStage.tagSentence(s.tokens.toIndexedSeq, model, useViterbi = false)
        assert(tags.forall(allowed.contains), s"${s.lang}: $tags")
      }
    }
  }

  test("teacher-forced loss: matches direct computation and improves with correct gold") {
    import spark.implicits._
    val m = Models.build(spark, spark.createDataset(corpus))("es")
    val sent = Vector("uno", "dos", "tres", "vier")
    val hidden = Kernel.bilstmStates(sent, sent.map(m.inputVocab.getWordTrain).toArray,
      sent.map(TextExtract.codePoints).toArray, m.charVocab, m.weights)
    val greedy = Kernel.greedyDecode(hidden, m.weights)
    // loss with gold == greedy path equals mean of -log(prob of chosen tag)
    val direct = greedy.preds.indices.map { t =>
      -math.log(greedy.probs(t)(greedy.preds(t)).toDouble)
    }.sum / sent.length
    val loss = Kernel.teacherForcedLoss(hidden, greedy.preds, m.weights)
    assert(math.abs(loss - direct) < 1e-4, s"$loss vs $direct")
    // a wrong gold sequence has a strictly higher loss
    val wrong = greedy.preds.map(p => (p + 1) % m.tagVocab.size)
    assert(Kernel.teacherForcedLoss(hidden, wrong, m.weights) > loss)
  }
}
