package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.{Embeddings, Kernel, Vocab}
import graft.text.TextExtract

class KernelSpec extends AnyFunSuite {

  private def mkVocabs(tokens: Seq[String]): (Vocab, Vocab) = {
    val charV = Vocab.newCharVocab()
    tokens.foreach(t => TextExtract.codePoints(t).foreach(charV.add))
    charV.freeze()
    val lines = Embeddings.syntheticLines(tokens.map(_.toLowerCase).distinct, 16, 7L)
    val loaded = Embeddings.fromLines(lines.iterator)
    (Embeddings.toInputVocab(loaded), charV)
  }

  private def mkWeights(charSize: Int, mat: Array[Array[Float]], seed: Long) =
    Kernel.randomWeights(embedDim = 16, minWidth = 2, maxWidth = 4, numFilters = 5,
      hidden = 12, charVocabSize = charSize, tagCount = 7, embeddings = mat, seed = seed)

  private def weightsFor(tokens: Seq[String], seed: Long = 11L) = {
    val (inV, chV) = mkVocabs(tokens)
    val lines = Embeddings.syntheticLines(tokens.map(_.toLowerCase).distinct, 16, 7L)
    val loaded = Embeddings.fromLines(lines.iterator)
    (inV, chV, mkWeights(chV.size, loaded.matrix, seed))
  }

  test("charBits layout: <S> at 0, chars at k+1, </S> possibly sharing last position") {
    val chV = Vocab.newCharVocab() // <S>=0, </S>=1
    "ab".foreach(c => chV.add(c.toString)) // a=2, b=3
    // cMax=4, word "ab": <S>@0, a@1, b@2, </S>@2 (len 2 < 4 -> pos 2 shared!)
    val bits = Kernel.charBits(TextExtract.codePoints("ab"), chV, 4)
    assert(bits.toSeq == Seq(Kernel.CharBit(0, 0), Kernel.CharBit(1, 2),
      Kernel.CharBit(2, 3), Kernel.CharBit(2, 1)))
    // word of length cMax: char at k = cMax-1 dropped, no </S>
    val bits2 = Kernel.charBits(TextExtract.codePoints("abab"), chV, 4)
    assert(bits2.toSeq == Seq(Kernel.CharBit(0, 0), Kernel.CharBit(1, 2),
      Kernel.CharBit(2, 3), Kernel.CharBit(3, 2)))
    // unknown char skipped
    val bits3 = Kernel.charBits(TextExtract.codePoints("aX"), chV, 4)
    assert(bits3.toSeq == Seq(Kernel.CharBit(0, 0), Kernel.CharBit(1, 2), Kernel.CharBit(2, 1)))
  }

  test("charCnn (gather/add) == naive dense convolution") {
    val tokens = Seq("alpha", "be", "gamma9", "x")
    val (_, chV, w) = weightsFor(tokens)
    for (tok <- tokens; cMax <- Seq(w.maxWidth, 7, 10)) {
      val bits = Kernel.charBits(TextExtract.codePoints(tok), chV, cMax)
      val mine = new Array[Float](w.nWidths * w.numFilters)
      Kernel.charCnn(bits, cMax, w, mine, 0)
      val naive = graft.golden.NaiveKernel.charFeatures(tok, chV, cMax, w)
      for (i <- mine.indices)
        assert(math.abs(mine(i) - naive(i)) < 1e-5f, s"tok=$tok cMax=$cMax i=$i ${mine(i)} ${naive(i)}")
    }
  }

  test("full forward greedy: kernel == naive dense twin (preds exact, probs 1e-4)") {
    val sents = Seq(
      Vector("alpha", "be", "gamma9", "x", "alpha"),
      Vector("x"),
      Vector("be", "be", "be", "unseen", "gamma9"))
    val allToks = sents.flatten.distinct
    val (inV, chV, w) = weightsFor(allToks)
    for (sent <- sents) {
      val wordIds = sent.map(inV.getWordTrain).toArray
      val cps = sent.map(TextExtract.codePoints).toArray
      val hidden = Kernel.bilstmStates(sent, wordIds, cps, chV, w)
      val mine = Kernel.greedyDecode(hidden, w)
      val (nPreds, nProbs) = graft.golden.NaiveKernel.forward(sent, inV, chV, w)
      assert(mine.preds.toSeq == nPreds.toSeq, s"sent=$sent")
      for (t <- sent.indices; k <- 0 until w.tagCount)
        assert(math.abs(mine.probs(t)(k) - nProbs(t)(k)) < 1e-4f)
    }
  }

  test("greedy decode feeds back the PREDICTED previous tag (transition semantics)") {
    val (inV, chV, w) = weightsFor(Seq("aa", "bb"))
    val sent = Vector("aa", "bb")
    val hidden = Kernel.bilstmStates(sent, sent.map(inV.getWordTrain).toArray,
      sent.map(TextExtract.codePoints).toArray, chV, w)
    val tagged = Kernel.greedyDecode(hidden, w)
    // recompute step 1 logits by hand with the step-0 prediction's column
    val H2 = 2 * w.hidden
    val logits = Array.tabulate(w.tagCount) { y =>
      var a = 0.0f
      for (j <- 0 until H2) a += w.outW(y)(j) * hidden(1)(j)
      a + w.outW(y)(H2 + tagged.preds(0))
    }
    assert(logits.zipWithIndex.maxBy { case (v, i) => (v, -i) }._2 == tagged.preds(1))
  }

  test("viterbi achieves path log-prob >= greedy") {
    val tokens = Seq("one", "two", "three", "four", "five")
    val (inV, chV, w) = weightsFor(tokens, seed = 23L)
    def pathScore(hidden: Array[Array[Float]], preds: Array[Int]): Double = {
      val H2 = 2 * w.hidden
      var total = 0.0
      for (t <- preds.indices) {
        val logits = Array.tabulate(w.tagCount) { y =>
          var a = 0.0f
          for (j <- 0 until H2) a += w.outW(y)(j) * hidden(t)(j)
          if (t > 0) a += w.outW(y)(H2 + preds(t - 1))
          a
        }
        total += Kernel.logSoftmax(logits)(preds(t))
      }
      total
    }
    for (seed <- 1 to 5) {
      val sent = new scala.util.Random(seed).shuffle(tokens.toVector)
      val hidden = Kernel.bilstmStates(sent, sent.map(inV.getWordTrain).toArray,
        sent.map(TextExtract.codePoints).toArray, chV, w)
      val g = Kernel.greedyDecode(hidden, w)
      val v = Kernel.viterbiDecode(hidden, w)
      assert(pathScore(hidden, v.preds) >= pathScore(hidden, g.preds) - 1e-9)
    }
  }

  test("micro-batched BiLSTM is bit-identical to batch-of-1 (the reference's batch>1 bug cannot reoccur)") {
    val tokens = Seq("alpha", "be", "gamma9", "x", "longtokenword")
    val (inV, chV, w) = weightsFor(tokens, seed = 31L)
    val rnd = new scala.util.Random(4)
    val sents = (1 to 9).map(i => Vector.fill(1 + rnd.nextInt(8))(tokens(rnd.nextInt(tokens.size))))
    val encoded = sents.map { s =>
      graft.ner.Kernel.Encoded(s, s.map(inV.getWordTrain).toArray,
        s.map(graft.text.TextExtract.codePoints).toArray)
    }.toArray
    val batched = Kernel.bilstmStatesBatch(encoded, chV, w)
    for (k <- encoded.indices) {
      val single = Kernel.bilstmStatesBatch(Array(encoded(k)), chV, w)(0)
      for (t <- single.indices; j <- single(t).indices)
        assert(single(t)(j) == batched(k)(t)(j), s"sentence $k differs at ($t,$j) in a batch")
    }
  }

  test("viterbi == exhaustive best path over all tag sequences (brute-force oracle)") {
    val tokens = Seq("aa", "bb", "cc", "dd")
    val (inV, chV, w) = weightsFor(tokens, seed = 77L)
    val T = w.tagCount
    val H2 = 2 * w.hidden
    def stepLogProbs(hidden: Array[Array[Float]], t: Int, prev: Int): Array[Double] = {
      val logits = Array.tabulate(T) { y =>
        var a = 0.0f
        for (j <- 0 until H2) a += w.outW(y)(j) * hidden(t)(j)
        if (prev >= 0) a += w.outW(y)(H2 + prev)
        a
      }
      Kernel.logSoftmax(logits)
    }
    val rnd = new scala.util.Random(9)
    for (trial <- 1 to 4) {
      val sent = Vector.fill(3 + trial % 2)(tokens(rnd.nextInt(tokens.size)))
      val hidden = Kernel.bilstmStates(sent, sent.map(inV.getWordTrain).toArray,
        sent.map(graft.text.TextExtract.codePoints).toArray, chV, w)
      // exhaustive search
      var bestScore = Double.NegativeInfinity
      var bestPath: Seq[Int] = Nil
      def rec(t: Int, prev: Int, score: Double, path: List[Int]): Unit = {
        if (t == sent.length) {
          if (score > bestScore) { bestScore = score; bestPath = path.reverse }
        } else {
          val lp = stepLogProbs(hidden, t, prev)
          for (y <- 0 until T) rec(t + 1, y, score + lp(y), y :: path)
        }
      }
      rec(0, -1, 0.0, Nil)
      val vit = Kernel.viterbiDecode(hidden, w)
      val vitScore = {
        var s = 0.0; var prev = -1
        for (t <- sent.indices) { s += stepLogProbs(hidden, t, prev)(vit.preds(t)); prev = vit.preds(t) }
        s
      }
      assert(math.abs(vitScore - bestScore) < 1e-9,
        s"trial $trial: viterbi score $vitScore vs exhaustive $bestScore (paths ${vit.preds.toSeq} vs $bestPath)")
    }
  }

  test("weights are deterministic for a seed") {
    val (_, _, w1) = weightsFor(Seq("tok"), seed = 5L)
    val (_, _, w2) = weightsFor(Seq("tok"), seed = 5L)
    assert(w1.fwIh.toSeq == w2.fwIh.toSeq)
    assert(w1.convW(0)(0).toSeq == w2.convW(0)(0).toSeq)
    val (_, _, w3) = weightsFor(Seq("tok"), seed = 6L)
    assert(w1.fwIh.toSeq != w3.fwIh.toSeq)
  }
}
