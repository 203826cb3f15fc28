package graft.golden

import graft.ner.{Kernel, Vocab}
import graft.ner.Kernel.NerWeights

/**
 * Independent reference twin of the inference kernel, written the way the
 * PyTorch reference literally computes (NeuralNERMono/models/modules.py):
 * materialize the DENSE one-hot char matrix and run the convolution as a
 * full dot product over each window (modules.py:25-36), run the LSTM with
 * the textbook gate equations, decode greedily feeding back the previous
 * prediction (modules.py:306-361). Deliberately different code shape from
 * graft.ner.Kernel (gather/add vs dense dot) so agreement is meaningful.
 */
object NaiveKernel {

  /** Dense one-hot char matrix exactly as constructBatch builds it
    * (utilsLocal.py:327-353), then per-width conv + maxpool. */
  def charFeatures(word: String, charVocab: Vocab, cMax: Int, w: NerWeights): Array[Float] = {
    val V = w.charVocabSize
    val dense = new Array[Float](cMax * V)
    charVocab.getWord("<S>").foreach(id => dense(id) = 1.0f)
    val cps = graft.text.TextExtract.codePoints(word)
    var k = 0
    while (k < cps.length) {
      if (k < cMax - 1) {
        charVocab.tokToInd.get(cps(k)).foreach { id => dense((k + 1) * V + id) = 1.0f }
      }
      k += 1
    }
    if (cps.length < cMax)
      charVocab.getWord("</S>").foreach(id => dense(cps.length * V + id) = 1.0f)

    val out = new Array[Float](w.nWidths * w.numFilters)
    for (wi <- 0 until w.nWidths) {
      val n = w.minWidth + wi
      val kernelLen = n * V
      val nPos = (cMax * V - kernelLen) / V + 1
      for (f <- 0 until w.numFilters) {
        var best = Float.NegativeInfinity
        for (p <- 0 until nPos) {
          var acc = w.convB(wi)(f)
          var j = 0
          while (j < kernelLen) {
            acc += w.convW(wi)(f)(j) * dense(p * V + j)
            j += 1
          }
          if (acc > best) best = acc
        }
        out(wi * w.numFilters + f) = best
      }
    }
    out
  }

  def lstmCell(x: Array[Float], h: Array[Float], c: Array[Float],
               wIh: Array[Float], wHh: Array[Float], bIh: Array[Float], bHh: Array[Float],
               H: Int, D: Int): (Array[Float], Array[Float]) = {
    def gate(row: Int): Float = {
      var a = bIh(row) + bHh(row)
      for (j <- 0 until D) a += wIh(row * D + j) * x(j)
      for (j <- 0 until H) a += wHh(row * H + j) * h(j)
      a
    }
    val hN = new Array[Float](H)
    val cN = new Array[Float](H)
    for (k <- 0 until H) {
      val i = 1.0 / (1.0 + math.exp(-gate(k).toDouble))
      val f = 1.0 / (1.0 + math.exp(-gate(H + k).toDouble))
      val g = math.tanh(gate(2 * H + k).toDouble)
      val o = 1.0 / (1.0 + math.exp(-gate(3 * H + k).toDouble))
      val cv = (f * c(k) + i * g).toFloat
      cN(k) = cv
      hN(k) = (o * math.tanh(cv.toDouble)).toFloat
    }
    (hN, cN)
  }

  /** BiLSTM hidden states (L x 2H) via the textbook loops. */
  def hiddenStates(tokens: IndexedSeq[String], inputVocab: Vocab, charVocab: Vocab,
                   w: NerWeights): Array[Array[Float]] = {
    val L = tokens.length
    val cMax = math.max(w.maxWidth,
      if (L == 0) 0 else tokens.map(t => graft.text.TextExtract.codePoints(t).length).max)
    val D = w.inputDim
    val charLen = w.nWidths * w.numFilters
    val feats = Array.tabulate(L) { i =>
      val row = new Array[Float](D)
      System.arraycopy(charFeatures(tokens(i), charVocab, cMax, w), 0, row, 0, charLen)
      val wid = inputVocab.getWordTrain(tokens(i))
      val emb = w.embeddings(if (wid >= 0) wid else w.embeddings.length - 1)
      System.arraycopy(emb, 0, row, charLen, w.embedDim)
      row
    }
    val H = w.hidden
    val hidden = Array.fill(L)(new Array[Float](2 * H))
    var h = new Array[Float](H); var c = new Array[Float](H)
    for (t <- 0 until L) {
      val (hN, cN) = lstmCell(feats(t), h, c, w.fwIh, w.fwHh, w.fbIh, w.fbHh, H, D)
      h = hN; c = cN
      System.arraycopy(h, 0, hidden(t), 0, H)
    }
    h = new Array[Float](H); c = new Array[Float](H)
    for (t <- (L - 1) to 0 by -1) {
      val (hN, cN) = lstmCell(feats(t), h, c, w.bwIh, w.bwHh, w.bbIh, w.bbHh, H, D)
      h = hN; c = cN
      System.arraycopy(h, 0, hidden(t), H, H)
    }
    hidden
  }

  /** Greedy transition decode over precomputed hidden states. */
  def greedyFromHidden(hidden: Array[Array[Float]], w: NerWeights): (Array[Int], Array[Array[Float]]) = {
    val L = hidden.length
    val H = w.hidden
    val T = w.tagCount
    val preds = new Array[Int](L)
    val probs = new Array[Array[Float]](L)
    for (t <- 0 until L) {
      val input = new Array[Float](2 * H + T)
      System.arraycopy(hidden(t), 0, input, 0, 2 * H)
      if (t > 0) input(2 * H + preds(t - 1)) = 1.0f
      val logits = Array.tabulate(T) { y =>
        var a = 0.0f
        for (j <- 0 until 2 * H + T) a += w.outW(y)(j) * input(j)
        a
      }
      preds(t) = logits.zipWithIndex.maxBy { case (v, i) => (v, -i) }._2
      probs(t) = Kernel.softmax(logits)
    }
    (preds, probs)
  }

  /** Full forward + greedy decode for one sentence. Returns (preds, probs). */
  def forward(tokens: IndexedSeq[String], inputVocab: Vocab, charVocab: Vocab,
              w: NerWeights): (Array[Int], Array[Array[Float]]) =
    greedyFromHidden(hiddenStates(tokens, inputVocab, charVocab, w), w)

  /** Textbook Viterbi over the transition-conditioned scores: maximizes the
    * sum of per-step log-softmax(logits | prev tag); first-max tie-breaks,
    * like Kernel.viterbiDecode but written as the straightforward
    * prev-loop-inside-cur-loop DP (different code shape on purpose). */
  def viterbi(tokens: IndexedSeq[String], inputVocab: Vocab, charVocab: Vocab,
              w: NerWeights): Array[Int] =
    viterbiFromHidden(hiddenStates(tokens, inputVocab, charVocab, w), w)

  def viterbiFromHidden(hidden: Array[Array[Float]], w: NerWeights): Array[Int] = {
    val L = hidden.length
    val T = w.tagCount
    val H2 = 2 * w.hidden
    if (L == 0) return Array.empty
    def baseLogit(t: Int, y: Int): Float = {
      var a = 0.0f
      for (j <- 0 until H2) a += w.outW(y)(j) * hidden(t)(j)
      a
    }
    val base = Array.tabulate(L, T)(baseLogit)
    val delta = Array.ofDim[Double](L, T)
    val back = Array.ofDim[Int](L, T)
    val ls0 = Kernel.logSoftmax(base(0))
    for (y <- 0 until T) delta(0)(y) = ls0(y)
    for (t <- 1 until L) {
      // log-softmax of the current step's logits, conditioned on each prev
      val condLs = Array.tabulate(T) { p =>
        Kernel.logSoftmax(Array.tabulate(T)(y => base(t)(y) + w.outW(y)(H2 + p)))
      }
      for (cur <- 0 until T) {
        var bestP = 0
        var bestV = delta(t - 1)(0) + condLs(0)(cur)
        for (p <- 1 until T) {
          val v = delta(t - 1)(p) + condLs(p)(cur)
          if (v > bestV) { bestV = v; bestP = p }
        }
        delta(t)(cur) = bestV
        back(t)(cur) = bestP
      }
    }
    val preds = new Array[Int](L)
    preds(L - 1) = (0 until T).maxBy(y => (delta(L - 1)(y), -y))
    for (t <- L - 1 to 1 by -1) preds(t - 1) = back(t)(preds(t))
    preds
  }
}
