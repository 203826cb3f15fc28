package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.{Embeddings, Vocab}

class VocabSpec extends AnyFunSuite {

  test("word vocab lowercases, counts, unk fallback (vocab.py semantics)") {
    val v = new Vocab(caseSensitive = false)
    assert(v.add("Apple") == 0)
    assert(v.add("apple") == 0) // same token after lowering; count bumps
    assert(v.add("<unk>") == 1)
    assert(v.tokCounts("apple") == 2L)
    assert(v.getWord("APPLE").contains(0))
    assert(v.getWord("pear").isEmpty)
    assert(v.getWordTrain("pear") == 1) // <unk> id
  }

  test("char vocab is case-sensitive with <S>/</S> seeds (NeuralNER.py:171-173)") {
    val v = Vocab.newCharVocab()
    assert(v.getWord("<S>").contains(0))
    assert(v.getWord("</S>").contains(1))
    assert(v.add("a") == 2)
    assert(v.add("A") == 3) // distinct from "a"
  }

  test("trim keeps count > threshold with dense re-index (vocab.py:169-184)") {
    val v = new Vocab()
    for (_ <- 1 to 12) v.add("common")
    for (_ <- 1 to 11) v.add("edge")
    for (_ <- 1 to 3) v.add("rare")
    v.trim(10)
    assert(v.size == 2)
    assert(v.getWord("common").contains(0))
    assert(v.getWord("edge").contains(1)) // 11 > 10 kept
    assert(v.getWord("rare").isEmpty)
  }

  test("JSON round-trip matches the reference artifact shape") {
    val v = new Vocab()
    v.add("O"); v.add("B-PER"); v.add("B-PER")
    val json = v.toJson
    assert(json.contains(""""_tok_to_ind": {"o": 0, "b-per": 1}"""))
    assert(json.contains(""""_ind_to_tok": {"0": "o", "1": "b-per"}"""))
    assert(json.contains(""""_Vocab__freeze__": false"""))
    val v2 = Vocab.fromJson(json)
    assert(v2.tokToInd == v.tokToInd)
    assert(v2.indToTok == v.indToTok) // process(): string keys -> int
    assert(v2.tokCounts == v.tokCounts)
  }

  test("embedding load: pad row 0, unk last, lowercase first-wins, dim enforced") {
    val lines = Seq(
      "Apple 1.0 2.0",
      "apple 9.0 9.0", // dup after lowercase: first wins
      "",
      "banana 3.5 -4.25")
    val l = Embeddings.fromLines(lines.iterator)
    assert(l.dim == 2)
    assert(l.matrix.length == 4) // pad + 2 words + unk
    assert(l.matrix(0).toSeq == Seq(0.0f, 0.0f))
    assert(l.index("apple") == 1)
    assert(l.matrix(1).toSeq == Seq(1.0f, 2.0f)) // Apple's vector, not apple's
    assert(l.index("banana") == 2)
    assert(l.matrix(3).toSeq == Seq(0.0f, 0.0f)) // <unk>
    assert(l.index(Embeddings.UnkToken) == 3)
    intercept[IllegalArgumentException] {
      Embeddings.fromLines(Seq("a 1.0 2.0", "b 1.0").iterator)
    }
  }

  test("input vocab from embeddings preserves row order (NeuralNER.py:155-158)") {
    val l = Embeddings.fromLines(Seq("zeta 1 2", "alpha 3 4").iterator)
    val v = Embeddings.toInputVocab(l)
    assert(v.getWord(Embeddings.PadToken.toLowerCase).contains(0))
    assert(v.getWord("zeta").contains(1))
    assert(v.getWord("alpha").contains(2))
    assert(v.getWordTrain("missing") == 3) // <unk> last
  }

  test("synthetic embedding lines are deterministic") {
    val a = Embeddings.syntheticLines(Seq("x", "y"), 4, 9L)
    val b = Embeddings.syntheticLines(Seq("x", "y"), 4, 9L)
    assert(a == b)
    assert(Embeddings.syntheticLines(Seq("x"), 4, 10L) != a.take(1))
  }
}
