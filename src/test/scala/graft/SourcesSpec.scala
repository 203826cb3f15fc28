package graft

import java.nio.file.Files
import graft.sources.{ConllSink, ConllSource, LabeledSentence}
import graft.ner.{Embeddings, Models, NerStage}

class SourcesSpec extends SparkSpec {

  /** Sequential reference parse (mirrors readCoNLL control flow directly). */
  private def sequentialParse(lines: Seq[String], tagField: Int): Vector[(Vector[String], Vector[String])] = {
    val out = Vector.newBuilder[(Vector[String], Vector[String])]
    var buf = Vector.empty[(String, String)]
    def flush(): Unit = {
      if (buf.nonEmpty) ConllSource.dandaSplit(buf).foreach(out += _)
      buf = Vector.empty
    }
    lines.foreach { l0 =>
      val l = l0.trim
      if (l.isEmpty) flush()
      else if (!l.startsWith("#")) {
        val cols = l.split("\t")
        if (cols.length > tagField)
          buf :+= ((cols(0), cols(tagField).toUpperCase(java.util.Locale.ROOT)))
      }
    }
    flush()
    out.result()
  }

  private def fixtureLines: Seq[String] = {
    val rnd = new scala.util.Random(99)
    val toks = Vector("Melbourne", "el", "Abogado", "«", "García", "1997", "x", "कख।", "पूर्ण।")
    val tags = Vector("O", "B-PER", "I-PER", "E-PER", "S-LOC", "b-org", "e-org", "O")
    val lines = Vector.newBuilder[String]
    lines += "# comment at start"
    for (_ <- 1 to 150) {
      val n = 1 + rnd.nextInt(7)
      for (_ <- 1 to n)
        lines += s"${toks(rnd.nextInt(toks.size))}\t${tags(rnd.nextInt(tags.size))}"
      if (rnd.nextInt(10) == 0) lines += "# interleaved comment"
      lines += ""
      if (rnd.nextInt(7) == 0) lines += "" // double blank
    }
    lines.result()
  }

  test("ConllSource == sequential reference parse, at several partition counts") {
    val f = Files.createTempFile("conll", ".txt")
    val lines = fixtureLines
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    val expected = sequentialParse(lines, 1)
    for (parts <- Seq(1, 3, 7, 13)) {
      val got = ConllSource.read(spark, f.toString, tagField = 1, minPartitions = parts)
        .collect().sortBy(_.sentIdx)
        .map(s => (s.tokens.toVector, s.tags.toVector)).toVector
      assert(got.size == expected.size, s"parts=$parts")
      assert(got == expected, s"parts=$parts")
    }
  }

  test("danda rule: tag O closes the sentence, other tags do not") {
    val rows = Seq(("a", "O"), ("कख।", "O"), ("b", "O"), ("ग।", "B-LOC"), ("c", "O"))
    assert(ConllSource.dandaSplit(rows) == Vector(
      (Vector("a", "कख।"), Vector("O", "O")),
      (Vector("b", "ग।", "c"), Vector("O", "B-LOC", "O"))))
  }

  test("tag field selection (german-style column 2) and uppercase on read") {
    val f = Files.createTempFile("conll2", ".txt")
    Files.write(f, "word\tx\tloc\nzwei\ty\to\n\n".getBytes("UTF-8"))
    val got = ConllSource.read(spark, f.toString, tagField = 2).collect()
    assert(got.head.tags.toSeq == Seq("LOC", "O"))
  }

  test("ConllSink output is scored identically by the reference perl evaluator") {
    import spark.implicits._
    val scorer = "/root/reference/NeuralNERMono/eval/conll03eval.v2"
    assume(Files.exists(java.nio.file.Paths.get(scorer)))
    val sents = (0 until 30).map { i =>
      val toks = Vector.fill(3 + i % 5)("tok" + i)
      graft.core.Sentence(s"u$i", "en", 0, toks)
    }
    val models = Models.build(spark, spark.createDataset(sents))
    val bc = spark.sparkContext.broadcast(models)
    val tagged = NerStage.tag(spark.createDataset(sents), bc)
    // gold = a deterministic relabeling (so P/R is non-trivial)
    val golds = sents.map(s => (s.url, 0) ->
      s.tokens.indices.map(j => if (j % 3 == 0) "S-LOC" else "O")).toMap
    val dir = Files.createTempDirectory("conllsink").toString + "/out"
    ConllSink.write(tagged, golds, dir)
    // perl score of the written file
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    val all = files.flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    val tmp = Files.createTempFile("scored", ".txt")
    // conlleval needs a blank line between sentences; our format ends each
    // sentence's block without one (formatSentence per row) — rebuild blocks
    Files.write(tmp, all.mkString("\n").replace("\n\n\n", "\n\n").getBytes("UTF-8"))
    val proc = new ProcessBuilder("perl", scorer).redirectInput(tmp.toFile).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    proc.waitFor()
    assert(out.contains("accuracy:"), s"scorer failed: $out")
    // spark-side metrics from the same data agree with the scorer
    val overall = """precision:\s+([0-9.]+)%; recall:\s+([0-9.]+)%""".r
    val m = overall.findFirstMatchIn(out).get
    val goldMentions = spark.createDataset(sents.map { s =>
      (s.url, s.lang, 0, golds((s.url, 0)))
    }.flatMap { case (url, lang, si, tags) =>
      graft.ner.Bioes.spans(tags.toIndexedSeq).map(sp =>
        graft.core.Mention(url, lang, si, sp.begin, sp.end, "", sp.tpe))
    })
    val predMentions = NerStage.mentions(tagged)
      .map(mn => mn.copy(surface = "")) // surface not part of span identity
    val prf = graft.eval.SpanEval.prf(predMentions, goldMentions)
      .filter(org.apache.spark.sql.functions.col("entityType") === "ALL").head()
    val (p, r) = (prf.getAs[Double]("precision") * 100, prf.getAs[Double]("recall") * 100)
    assert(math.abs(p - m.group(1).toDouble) < 0.005, s"precision $p vs perl ${m.group(1)}")
    assert(math.abs(r - m.group(2).toDouble) < 0.005, s"recall $r vs perl ${m.group(2)}")
  }

  test("score_ artifact is byte-identical to the perl scorer's own report") {
    import spark.implicits._
    val scorer = "/root/reference/NeuralNERMono/eval/conll03eval.v2"
    assume(Files.exists(java.nio.file.Paths.get(scorer)))
    val sents = (0 until 40).map { i =>
      val toks = Vector.fill(3 + i % 6)("w" + i)
      graft.core.Sentence(s"s$i", "en", 0, toks)
    }
    val models = Models.build(spark, spark.createDataset(sents))
    val bc = spark.sparkContext.broadcast(models)
    val tagged = NerStage.tag(spark.createDataset(sents), bc)
    val golds = sents.map(s => (s.url, 0) ->
      s.tokens.indices.map(j => if (j % 4 == 0) "S-LOC" else if (j % 7 == 3) "S-PER" else "O")).toMap
    // perl's own report over the sink file
    val dir = Files.createTempDirectory("scorefile").toString + "/out"
    ConllSink.write(tagged, golds, dir)
    val lines = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    val tmp = Files.createTempFile("scorein", ".txt")
    Files.write(tmp, lines.mkString("\n").replace("\n\n\n", "\n\n").getBytes("UTF-8"))
    val proc = new ProcessBuilder("perl", scorer).redirectInput(tmp.toFile).start()
    val perlReport = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    proc.waitFor()
    // the same artifact from the distributed counters
    val goldMentions = spark.createDataset(sents.flatMap { s =>
      graft.ner.Bioes.spans(golds((s.url, 0)).toIndexedSeq).map(sp =>
        graft.core.Mention(s.url, s.lang, 0, sp.begin, sp.end, "", sp.tpe))
    })
    val predMentions = NerStage.mentions(tagged).map(_.copy(surface = ""))
    val predTags = NerStage.taggedTokens(tagged).toDF().select($"url", $"sentIdx", $"tokIdx", $"pred")
    val goldTags = sents.flatMap { s =>
      golds((s.url, 0)).zipWithIndex.map { case (g, j) => (s.url, 0, j, g) }
    }.toDF("url", "sentIdx", "tokIdx", "pred")
    val out = Files.createTempFile("scoreout", ".txt").toString
    graft.eval.SpanEval.writeScoreFile(out, predMentions, goldMentions, predTags, goldTags)
    val ours = new String(Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    assert(ours == perlReport, s"ours:\n$ours\nperl:\n$perlReport")
  }

  test("final-test probs format flows through the distributed path and perl-scores") {
    import spark.implicits._
    val scorer = "/root/reference/NeuralNERMono/eval/conll03eval.v2"
    assume(Files.exists(java.nio.file.Paths.get(scorer)))
    val sents = (0 until 12).map { i =>
      graft.core.Sentence(s"p$i", "en", 0, Vector.fill(2 + i % 4)("tok" + i))
    }
    val models = Models.build(spark, spark.createDataset(sents))
    val bc = spark.sparkContext.broadcast(models)
    val tagged = NerStage.tag(spark.createDataset(sents), bc, withProbs = true).collect()
    val T = models("en").tagVocab.size
    // per-token distributions present, full tag arity, normalized
    tagged.foreach { s =>
      assert(s.probs.length == s.tokens.length)
      s.probs.foreach { p =>
        assert(p.length == T)
        assert(math.abs(p.map(_.toDouble).sum - 1.0) < 1e-4)
      }
    }
    // bit-equal to the kernel's own per-sentence probs
    val one = tagged.minBy(_.url)
    val direct = NerStage.tagSentencesFull(
      Seq(one.tokens.toIndexedSeq), models("en"), useViterbi = false).head._2
    assert(one.probs == direct)
    // the written artifact is the reference final-test shape and the perl
    // scorer parses it (last two fields = gold, pred)
    val golds = sents.map(s => (s.url, 0) ->
      s.tokens.indices.map(j => if (j % 2 == 0) "S-LOC" else "O")).toMap
    val dir = Files.createTempDirectory("conllprobs").toString + "/out"
    ConllSink.writeWithProbs(NerStage.tag(spark.createDataset(sents), bc, withProbs = true), golds, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    val lines = files.flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    lines.filter(_.nonEmpty).foreach { ln =>
      val fields = ln.split(" ")
      assert(fields.length == T + 4, s"expected token p1..p$T token gold pred: $ln")
      assert(fields(0) == fields(T + 1)) // token repeated after the probs
    }
    val tmp = Files.createTempFile("scoredprobs", ".txt")
    Files.write(tmp, lines.mkString("\n").replace("\n\n\n", "\n\n").getBytes("UTF-8"))
    val proc = new ProcessBuilder("perl", scorer).redirectInput(tmp.toFile).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    proc.waitFor()
    assert(out.contains("accuracy:"), s"scorer failed on probs format: $out")
  }

  test("distributed GloVe load == driver fromLines (dedup, order, pad/unk)") {
    val lines = Seq("Apple 1.0 2.0", "apple 9.0 9.0", "Banana 3.5 -4.25", "cherry 0.5 0.25")
    val f = Files.createTempFile("glove", ".txt")
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    val a = Embeddings.fromLines(lines.iterator)
    val b = Embeddings.loadDistributed(spark, f.toString)
    assert(a.index == b.index)
    assert(a.dim == b.dim)
    assert(a.matrix.map(_.toSeq).toSeq == b.matrix.map(_.toSeq).toSeq)
  }
}
