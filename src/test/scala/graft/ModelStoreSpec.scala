package graft

import java.nio.file.Files
import graft.core.Sentence
import graft.ner.{Kernel, ModelStore, Models, NerStage}

/** S5 checkpoint parity: the on-disk registry (3 vocab JSONs + model.bin
  * per language, reference artifact names NeuralNER.py:203-233,277)
  * round-trips bit-identically and serves identically. */
class ModelStoreSpec extends SparkSpec {

  private def corpus = (0 until 24).map { i =>
    Sentence(s"u$i", if (i % 2 == 0) "en" else "de", 0,
      Vector.tabulate(3 + i % 4)(j => s"Tok${i}_$j"))
  }

  test("save/load round-trip: vocabs and every weight tensor bit-identical") {
    import spark.implicits._
    val models = Models.build(spark, spark.createDataset(corpus))
    val dir = Files.createTempDirectory("modelstore").toString
    ModelStore.save(dir, models)
    val loaded = ModelStore.load(dir)
    assert(loaded.keySet == models.keySet)
    models.keys.foreach { lg =>
      val a = models(lg); val b = loaded(lg)
      assert(a.inputVocab.tokToInd == b.inputVocab.tokToInd)
      assert(a.inputVocab.tokCounts == b.inputVocab.tokCounts)
      assert(a.charVocab.tokToInd == b.charVocab.tokToInd)
      assert(b.charVocab.caseSensitive && !b.inputVocab.caseSensitive)
      assert(a.tagVocab.indToTok == b.tagVocab.indToTok)
      assert(b.tagVocab.isFrozen == a.tagVocab.isFrozen)
      val (wa, wb) = (a.weights, b.weights)
      assert((wa.embedDim, wa.minWidth, wa.maxWidth, wa.numFilters, wa.hidden,
        wa.charVocabSize, wa.tagCount) ==
        (wb.embedDim, wb.minWidth, wb.maxWidth, wb.numFilters, wb.hidden,
          wb.charVocabSize, wb.tagCount))
      def bits(a: Array[Float]) = a.map(java.lang.Float.floatToRawIntBits)
      assert(bits(wa.embeddings.flatten).sameElements(bits(wb.embeddings.flatten)))
      assert(bits(wa.convW.flatten.flatten).sameElements(bits(wb.convW.flatten.flatten)))
      assert(bits(wa.convB.flatten).sameElements(bits(wb.convB.flatten)))
      Seq[(Kernel.NerWeights => Array[Float])](
        _.fwIh, _.fwHh, _.fbIh, _.fbHh, _.bwIh, _.bwHh, _.bbIh, _.bbHh)
        .foreach(f => assert(bits(f(wa)).sameElements(bits(f(wb)))))
      assert(bits(wa.outW.flatten).sameElements(bits(wb.outW.flatten)))
    }
  }

  test("a saved registry serves identically (greedy and Viterbi)") {
    import spark.implicits._
    val models = Models.build(spark, spark.createDataset(corpus))
    val dir = Files.createTempDirectory("modelstore2").toString
    ModelStore.save(dir, models)
    val loaded = ModelStore.load(dir)
    corpus.foreach { s =>
      val toks = s.tokens.toIndexedSeq
      assert(NerStage.tagSentence(toks, loaded(s.lang), useViterbi = false) ==
        NerStage.tagSentence(toks, models(s.lang), useViterbi = false))
      assert(NerStage.tagSentence(toks, loaded(s.lang), useViterbi = true) ==
        NerStage.tagSentence(toks, models(s.lang), useViterbi = true))
    }
  }
}
