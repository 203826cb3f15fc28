package graft.ner

import scala.collection.mutable

/**
 * GloVe-format embedding loading with the reference's exact semantics
 * (NeuralNERMono/utils/utilsLocal.py:16-83 `load_embeddings`):
 *
 *  - row 0 is a zero padding vector for the dummy token "</SSSSSSSSSSSS>";
 *  - keys are lowercased; the FIRST occurrence of a key wins;
 *  - dimension is inferred from the first data line and enforced;
 *  - a zero "<unk>" row is appended last;
 *  - resulting matrix row index == dictionary index.
 */
object Embeddings {

  final case class Loaded(
      matrix: Array[Array[Float]],     // [V+2][D], row 0 and row V+1 zero
      index: Map[String, Int],         // lowercased word -> row
      dim: Int
  ) {
    def vocabSize: Int = matrix.length
  }

  val PadToken = "</SSSSSSSSSSSS>"
  val UnkToken = "<unk>"

  /** Parse GloVe-format lines. Blank lines skipped; `word v1 .. vD`. */
  def fromLines(lines: Iterator[String]): Loaded = {
    val index = mutable.LinkedHashMap.empty[String, Int]
    index(PadToken) = 0
    val rows = mutable.ArrayBuffer.empty[Array[Float]]
    var dim = 0
    for (line0 <- lines) {
      val line = line0.trim
      if (line.nonEmpty) {
        val parts = graft.text.TextExtract.splitChar(line, ' ')
        val word = parts(0).toLowerCase(java.util.Locale.ROOT)
        if (!index.contains(word)) {
          if (dim == 0) dim = parts.length - 1
          require(dim == parts.length - 1,
            s"embedding dim mismatch: expected $dim got ${parts.length - 1} for '$word'")
          val v = new Array[Float](dim)
          var i = 0
          while (i < dim) { v(i) = parts(i + 1).toFloat; i += 1 }
          index(word) = index.size
          rows += v
        }
      }
    }
    require(dim > 0, "no embedding rows parsed")
    index(UnkToken) = index.size
    val mat = new Array[Array[Float]](rows.length + 2)
    mat(0) = new Array[Float](dim)
    var i = 0
    while (i < rows.length) { mat(i + 1) = rows(i); i += 1 }
    mat(rows.length + 1) = new Array[Float](dim)
    Loaded(mat, index.toMap, dim)
  }

  /** Build the input word Vocab from the embedding dictionary exactly like
    * NeuralNER.py:155-158 (iterate embedding vocab in insertion order,
    * `Vocab.add` each key — which lowercases, a no-op here). */
  def toInputVocab(loaded: Loaded): Vocab = {
    val v = new Vocab(caseSensitive = false)
    // LinkedHashMap insertion order was lost in `.toMap`; rebuild from row order.
    val byRow = loaded.index.toArray.sortBy(_._2)
    byRow.foreach { case (w, _) => v.add(w) }
    v.freeze()
    v
  }

  /**
   * Deterministic synthetic GloVe file content for a token set: one line per
   * token with hash-seeded values in (-0.5, 0.5). Used for tests/benchmarks
   * (no external embedding files in the sandbox); at production scale this
   * is replaced by the real GloVe/fastText file, which is a model artifact
   * (driver-loaded + broadcast), never a distributed table.
   */
  def syntheticLines(tokens: Seq[String], dim: Int, seed: Long): Seq[String] = {
    tokens.map { t =>
      var h = seed ^ fnv1a(t)
      val sb = new StringBuilder(t)
      var i = 0
      while (i < dim) {
        h = xorshift(h)
        val v = ((h >>> 11).toDouble / (1L << 53).toDouble) - 0.5
        sb.append(' ').append(f"$v%.6f")
        i += 1
      }
      sb.toString
    }
  }

  def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  def xorshift(x0: Long): Long = {
    var x = if (x0 == 0L) 0x9e3779b97f4a7c15L else x0
    x ^= x << 13; x ^= x >>> 7; x ^= x << 17
    x
  }
}
