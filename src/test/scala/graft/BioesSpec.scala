package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ner.Bioes
import java.nio.file.{Files, Paths}

class BioesSpec extends AnyFunSuite {

  test("clean IOBES spans") {
    val tags = Vector("O", "B-PER", "I-PER", "E-PER", "O", "S-LOC", "B-ORG", "E-ORG")
    assert(Bioes.spans(tags) == Vector(
      Bioes.Span(1, 4, "PER"), Bioes.Span(5, 6, "LOC"), Bioes.Span(6, 8, "ORG")))
  }

  test("malformed sequences chunk exactly like conlleval transitions") {
    // I without B starts a chunk (O->I startOfChunk true)
    assert(Bioes.spans(Vector("I-LOC", "I-LOC", "O")) == Vector(Bioes.Span(0, 2, "LOC")))
    // type change mid-chunk splits
    assert(Bioes.spans(Vector("B-PER", "I-LOC")) ==
      Vector(Bioes.Span(0, 1, "PER"), Bioes.Span(1, 2, "LOC")))
    // raw tags (German data style): maximal runs of same type
    assert(Bioes.spans(Vector("LOC", "LOC", "O", "PER")) ==
      Vector(Bioes.Span(0, 2, "LOC"), Bioes.Span(3, 4, "PER")))
    // trailing open chunk closes at sentence end
    assert(Bioes.spans(Vector("O", "B-ORG", "I-ORG")) == Vector(Bioes.Span(1, 3, "ORG")))
  }

  /** Oracle: the reference's own scorer (read-only invocation of
    * /root/reference/NeuralNERMono/eval/conll03eval.v2) on a synthetic
    * gold/pred tagging — phrase counts from our span extraction must
    * reproduce the perl script's precision/recall/FB1 exactly. */
  test("P/R/FB1 parity with the reference conll03eval.v2 perl scorer") {
    val scorer = "/root/reference/NeuralNERMono/eval/conll03eval.v2"
    assume(Files.exists(Paths.get(scorer)) && Files.exists(Paths.get("/usr/bin/perl")))
    val rnd = new scala.util.Random(123)
    val tagChoices = Vector("O", "O", "O", "B-PER", "I-PER", "E-PER", "S-LOC",
      "B-ORG", "E-ORG", "I-MISC", "S-MISC", "E-LOC", "B-LOC")
    val sentences = Vector.fill(60) {
      val n = 1 + rnd.nextInt(12)
      Vector.fill(n)(("tok" + rnd.nextInt(50),
        tagChoices(rnd.nextInt(tagChoices.length)),
        tagChoices(rnd.nextInt(tagChoices.length))))
    }
    // run the perl scorer
    val tmp = Files.createTempFile("conll", ".txt")
    val content = sentences.map(_.map { case (t, g, p) => s"$t $g $p" }.mkString("\n"))
      .mkString("\n\n") + "\n"
    Files.write(tmp, content.getBytes("UTF-8"))
    val out = new StringBuilder
    val proc = new ProcessBuilder("perl", scorer).redirectInput(tmp.toFile).start()
    scala.io.Source.fromInputStream(proc.getInputStream).getLines().foreach(l => out.append(l).append('\n'))
    proc.waitFor()
    val overall = """accuracy:\s+([0-9.]+)%; precision:\s+([0-9.]+)%; recall:\s+([0-9.]+)%; FB1:\s+([0-9.]+)""".r
    val m = overall.findFirstMatchIn(out.toString).getOrElse(fail(s"no scorer output: $out"))
    val (perlP, perlR, perlF) = (m.group(2).toDouble, m.group(3).toDouble, m.group(4).toDouble)

    // our span-based counts
    var correct = 0L; var guessed = 0L; var gold = 0L
    var correctTags = 0L; var tokens = 0L
    for (s <- sentences) {
      val g = Bioes.spans(s.map(_._2))
      val p = Bioes.spans(s.map(_._3))
      gold += g.size; guessed += p.size
      correct += g.toSet.intersect(p.toSet).size
      tokens += s.size
      correctTags += s.count { case (_, gt, pt) => gt == pt }
    }
    val prec = if (guessed > 0) 100.0 * correct / guessed else 0.0
    val rec = if (gold > 0) 100.0 * correct / gold else 0.0
    val fb1 = if (prec + rec > 0) 2 * prec * rec / (prec + rec) else 0.0
    assert(math.abs(prec - perlP) < 0.005, s"precision $prec vs perl $perlP\n$out")
    assert(math.abs(rec - perlR) < 0.005, s"recall $rec vs perl $perlR")
    assert(math.abs(fb1 - perlF) < 0.005, s"FB1 $fb1 vs perl $perlF")
    val acc = 100.0 * correctTags / tokens
    val perlAcc = m.group(1).toDouble
    assert(math.abs(acc - perlAcc) < 0.005, s"accuracy $acc vs perl $perlAcc")
  }

  test("raw-tag corpora: spansPerl == perl scorer in default AND -r modes") {
    val scorer = "/root/reference/NeuralNERMono/eval/conll03eval.v2"
    assume(Files.exists(Paths.get(scorer)) && Files.exists(Paths.get("/usr/bin/perl")))
    val rnd = new scala.util.Random(77)
    // bare German-style raw tags mixed with IOBES — stresses both the
    // dashless (prefix=tag, type="") parse and -r's unconditional B- rewrite
    val pool = Vector("O", "O", "LOC", "PER", "ORG", "MISC",
      "B-PER", "I-PER", "E-PER", "S-LOC")
    val sentences = Vector.fill(80) {
      val n = 1 + rnd.nextInt(10)
      Vector.fill(n)(("w" + rnd.nextInt(40),
        pool(rnd.nextInt(pool.length)), pool(rnd.nextInt(pool.length))))
    }
    val tmp = Files.createTempFile("conllraw", ".txt")
    val content = sentences.map(_.map { case (t, g, p) => s"$t $g $p" }.mkString("\n"))
      .mkString("\n\n") + "\n"
    Files.write(tmp, content.getBytes("UTF-8"))
    val header =
      """processed (\d+) tokens with (\d+) phrases; found: (\d+) phrases; correct: (\d+)\.""".r
    val overall =
      """accuracy:\s+([0-9.]+)%; precision:\s+([0-9.]+)%; recall:\s+([0-9.]+)%; FB1:\s+([0-9.]+)""".r
    for (raw <- Seq(false, true)) {
      val cmd = if (raw) Seq("perl", scorer, "-r") else Seq("perl", scorer)
      val proc = new ProcessBuilder(cmd: _*).redirectInput(tmp.toFile).start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      proc.waitFor()
      val h = header.findFirstMatchIn(out).getOrElse(fail(s"no scorer output (raw=$raw): $out"))
      val m = overall.findFirstMatchIn(out).getOrElse(fail(s"no overall line (raw=$raw): $out"))
      val got = Bioes.conllCounts(sentences.map(_.map { case (_, g, p) => (g, p) }), raw)
      // EXACT integer parity with the perl scorer's own counters
      assert(got.tokens == h.group(1).toLong, s"raw=$raw tokens: $got\n$out")
      assert(got.foundCorrect == h.group(2).toLong, s"raw=$raw foundCorrect: $got\n$out")
      assert(got.foundGuessed == h.group(3).toLong, s"raw=$raw foundGuessed: $got\n$out")
      assert(got.correctChunk == h.group(4).toLong, s"raw=$raw correctChunk: $got\n$out")
      assert(math.abs(100.0 * got.correctTags / got.tokens - m.group(1).toDouble) < 0.005)
      assert(math.abs(got.precision - m.group(2).toDouble) < 0.005, s"raw=$raw $got")
      assert(math.abs(got.recall - m.group(3).toDouble) < 0.005, s"raw=$raw $got")
      assert(math.abs(got.fb1 - m.group(4).toDouble) < 0.005, s"raw=$raw $got")
    }
    // the documented deviation, side by side: the scorer's default-mode
    // counting finds no phrase in a pure raw-tag run; Bioes.spans counts it
    val run = Vector(IndexedSeq(("LOC", "LOC"), ("LOC", "LOC"), ("O", "O")))
    assert(Bioes.conllCounts(run, raw = false).foundGuessed == 0L)
    assert(Bioes.conllCounts(run, raw = true).foundGuessed == 2L) // -r: per-token chunks
    assert(Bioes.spans(Vector("LOC", "LOC", "O")) == Vector(Bioes.Span(0, 2, "LOC")))
  }
}
