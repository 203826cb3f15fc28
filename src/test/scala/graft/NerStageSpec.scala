package graft

import graft.core.{LineageRow, Sentence}
import graft.ner.{Models, NerStage}
import graft.text.TextExtract

class NerStageSpec extends SparkSpec {

  private def corpus(nDocs: Int, seed: Int): Seq[Sentence] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "theta", "kappa")
    val langs = Vector("en", "de")
    (0 until nDocs).flatMap { d =>
      val lang = langs(d % langs.length)
      (0 until 1 + rnd.nextInt(3)).map { si =>
        Sentence(s"https://t/$lang/doc$d", lang, si,
          Vector.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.length))))
      }
    }
  }

  test("tagging is partition-count invariant and deterministic") {
    import spark.implicits._
    val sents = corpus(30, 11)
    val models = Models.build(spark, spark.createDataset(sents))
    val bc = spark.sparkContext.broadcast(models)
    val r2 = NerStage.tag(spark.createDataset(sents).repartition(2), bc)
      .collect().map(s => (s.url, s.sentIdx) -> s.preds).toMap
    val r8 = NerStage.tag(spark.createDataset(sents).repartition(8), bc)
      .collect().map(s => (s.url, s.sentIdx) -> s.preds).toMap
    assert(r2 == r8)
    assert(r2.nonEmpty)
    // every pred is a legal uppercase tag
    val legal = Models.tagStrings.toSet
    assert(r2.values.flatten.forall(legal))
  }

  test("language routing uses the right model per sentence") {
    import spark.implicits._
    val sents = corpus(20, 13)
    val models = Models.build(spark, spark.createDataset(sents))
    assert(models.keySet == Set("en", "de"))
    val bc = spark.sparkContext.broadcast(models)
    val tagged = NerStage.tag(spark.createDataset(sents), bc).collect()
    // driver-side recomputation with the exact per-lang model must agree
    for (s <- tagged.take(20)) {
      val m = models(s.lang)
      val expected = NerStage.tagSentence(s.tokens.toIndexedSeq, m, useViterbi = false)
      assert(s.preds == expected, s"url=${s.url} lang=${s.lang}")
    }
    // and differ from the WRONG language's model for at least one sentence
    val crossDiffers = tagged.exists { s =>
      val other = models(if (s.lang == "en") "de" else "en")
      NerStage.tagSentence(s.tokens.toIndexedSeq, other, useViterbi = false) != s.preds
    }
    assert(crossDiffers, "per-lang models should not be interchangeable")
  }

  test("lineage accumulator records one row per partition with row counts") {
    import spark.implicits._
    val sents = corpus(16, 17)
    val models = Models.build(spark, spark.createDataset(sents))
    val bc = spark.sparkContext.broadcast(models)
    val acc = spark.sparkContext.collectionAccumulator[LineageRow]("lineage")
    val ds = NerStage.tag(spark.createDataset(sents).repartition(4), bc, lineage = Some(acc))
    val n = ds.count()
    val rows = scala.jdk.CollectionConverters.ListHasAsScala(acc.value).asScala.toSeq
    assert(rows.map(_.rowsIn).sum == sents.size)
    assert(rows.map(_.rowsOut).sum == n)
    assert(rows.forall(_.stage == "ner.tag"))
    assert(rows.map(_.partitionId).distinct.size == rows.size)
  }

  test("mentions/rawTriples derive consistently from tags") {
    import spark.implicits._
    val sents = corpus(25, 19)
    val models = Models.build(spark, spark.createDataset(sents))
    val bc = spark.sparkContext.broadcast(models)
    val tagged = NerStage.tag(spark.createDataset(sents), bc)
    val mentions = NerStage.mentions(tagged).collect()
    // every mention's surface equals the token slice
    val byKey = tagged.collect().map(s => (s.url, s.sentIdx) -> s).toMap
    for (m <- mentions) {
      val s = byKey((m.url, m.sentIdx))
      assert(m.surface == s.tokens.slice(m.begin, m.end).mkString(" "))
    }
    val lex = spark.sparkContext.broadcast(Set("beta"))
    val triples = NerStage.rawTriples(tagged, lex).collect()
    for (t <- triples) {
      assert(t.pred == "beta" || t.pred == "related_to")
      assert(t.subjSurface.nonEmpty && t.objSurface.nonEmpty)
    }
  }

  test("sentencesFromHtml == sentences on generated corpus (extraction invariant)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma. delta eps", "en", "s0"),
      (2L, "one two three four five six seven eight nine ten eleven twelve thirteen fourteen", "de", "s1"))
    val pages = docs.map { case (id, text, lang, src) =>
      graft.core.Page(s"u$id", new java.sql.Timestamp(0), gen.CorpusGen.htmlFor(id, text, lang, src),
        gen.CorpusGen.expectedText(text), lang)
    }
    val ds = spark.createDataset(pages)
    val a = NerStage.sentences(ds).collect().map(s => (s.url, s.sentIdx, s.tokens)).sortBy(x => (x._1, x._2))
    val b = NerStage.sentencesFromHtml(ds).collect().map(s => (s.url, s.sentIdx, s.tokens)).sortBy(x => (x._1, x._2))
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }
}
