package graft

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

  /** Full forward + greedy decode for one sentence. Returns (preds, probs). */
  def forward(tokens: IndexedSeq[String], inputVocab: Vocab, charVocab: Vocab,
              w: NerWeights): (Array[Int], Array[Array[Float]]) = {
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
    // greedy transition decode
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
}
