package graft

import graft.core.Mention
import graft.link.EntityLink
import org.apache.spark.sql.functions._

class EntityLinkSpec extends SparkSpec {

  private def skewedMentions(n: Int): Seq[Mention] = {
    val rnd = new scala.util.Random(5)
    (0 until n).map { i =>
      // Zipfian-ish: 60% of mentions share one hot surface
      val surface = if (rnd.nextDouble() < 0.6) "hotkey"
                    else Vector("alpha", "beta", "gamma", "deltas")(rnd.nextInt(4))
      Mention(s"u${i % 97}", "en", i % 7, i % 5, i % 5 + 1, surface, "PER")
    }
  }

  test("salted join == broadcast join on heavily skewed surfaces") {
    import spark.implicits._
    val mentions = spark.createDataset(skewedMentions(3000))
    val dict = EntityLink.aliasDict(spark,
      spark.createDataset(Seq("hotkey", "alpha", "beta", "gamma", "deltas", "unused")))
    val a = EntityLink.linkBroadcast(mentions, dict).collect()
      .map(e => (e.url, e.sentIdx, e.begin, e.surface, e.entityId, e.score)).sorted
    val b = EntityLink.linkSalted(mentions, dict, salts = 8, hotThreshold = 100L).collect()
      .map(e => (e.url, e.sentIdx, e.begin, e.surface, e.entityId, e.score)).sorted
    assert(a.nonEmpty)
    assert(a.toSeq == b.toSeq)
  }

  test("top-1 candidate selection is deterministic: highest prior wins") {
    import spark.implicits._
    val mentions = spark.createDataset(Seq(Mention("u1", "en", 0, 0, 1, "deltas", "PER")))
    val dict = EntityLink.aliasDict(spark, spark.createDataset(Seq("deltas")))
    // "deltas" has candidates: self (1.0), stem "delta" (0.5), prefix "delt" (0.25)
    assert(dict.count() == 3)
    val linked = EntityLink.linkBroadcast(mentions, dict).collect()
    assert(linked.length == 1)
    assert(linked.head.entityId == EntityLink.entityId("deltas"))
    assert(linked.head.score == 1.0)
  }

  test("multi-word mentions link via head token") {
    import spark.implicits._
    val mentions = spark.createDataset(Seq(Mention("u1", "en", 0, 0, 2, "Alpha beta", "ORG")))
    val dict = EntityLink.aliasDict(spark, spark.createDataset(Seq("alpha", "beta")))
    val linked = EntityLink.linkBroadcast(mentions, dict).collect()
    assert(linked.length == 1)
    assert(linked.head.entityId == EntityLink.entityId("alpha"))
  }

  test("aliasProfile: dominant surface by (count, lexicographic), sorted signature") {
    import spark.implicits._
    val linked = Seq(
      (10L, "Beta"), (10L, "Beta"), (10L, "Alpha"), (10L, "Alpha"),
      (10L, "Gamma"),                       // count tie Beta/Alpha -> Alpha
      (20L, "Solo"),
      (30L, "Zed"), (30L, "Zed"), (30L, "Ab") // clear winner Zed
    ).toDF("entityId", "surface").repartition(3)
    val got = EntityLink.aliasProfile(linked).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getString(5)))).toMap
    assert(got === Map(
      10L -> ((5L, 3L, "Alpha", 2L, "Alpha|Beta|Gamma")),
      20L -> ((1L, 1L, "Solo", 1L, "Solo")),
      30L -> ((3L, 2L, "Zed", 2L, "Ab|Zed"))))
  }

  test("linkCoherent: KG coherence flips the prior-only winner") {
    import spark.implicits._
    val dict = EntityLink.aliasDict(spark,
      spark.createDataset(Seq("deltas", "other")))
    val emptyCanon = Seq.empty[(Long, Long)].toDF("id", "component")
    // the page-1 graph connects the STEM candidate "delta" to "other"'s
    // exact entity; "deltas" (prior 1.0) has no support
    val triples = Seq(
      (EntityLink.entityId("delta"), "p", EntityLink.entityId("other")))
      .toDF("subj", "pred", "obj")
    val page = spark.createDataset(Seq(
      Mention("u1", "en", 0, 0, 1, "deltas", "PER"),
      Mention("u1", "en", 0, 2, 3, "other", "ORG"),
      // a second page WITHOUT context keeps the prior-only winner
      Mention("u2", "en", 0, 0, 1, "deltas", "PER")))
    def rows(m: org.apache.spark.sql.Dataset[Mention]) =
      EntityLink.linkCoherent(m, dict, emptyCanon, triples).collect()
        .map(r => (r.getString(0), r.getInt(2), r.getInt(3),
          r.getLong(5), r.getDouble(6), r.getLong(7))).toSet
    val got = rows(page)
    assert(got.contains(("u1", 0, 0, EntityLink.entityId("delta"), 0.5, 1L)),
      got.toString) // coherence 1 beats prior 1.0 with coherence 0
    assert(got.contains(("u2", 0, 0, EntityLink.entityId("deltas"), 1.0, 0L)))
    // "other"'s own winner: no candidate reaches "deltas"' exact entity in
    // the graph except via "delta" — its exact match keeps the crown only
    // if no lower-prior candidate gets support; assert election ran
    assert(got.size == 3)
    assert(rows(page.repartition(5)) == got)
  }

  test("rerankCharCosine: NaiveKernel twin bit-equality, election, OOV tie") {
    import spark.implicits._
    import graft.ner.{Embeddings, Kernel, Models, Vocab}
    val chV = Vocab.newCharVocab()
    "abcdeghimnortw".foreach(c => chV.add(c.toString))
    val emb = Embeddings.fromLines(
      Embeddings.syntheticLines(Seq("x"), 8, 7L).iterator)
    val wts = Kernel.randomWeights(embedDim = 8, minWidth = 2, maxWidth = 4,
      numFilters = 5, hidden = 6, charVocabSize = chV.size, tagCount = 3,
      embeddings = emb.matrix, seed = 5L)
    val model = Models.LangModel("en", Embeddings.toInputVocab(emb), chV,
      Embeddings.toInputVocab(emb), wts)
    val pairs = Seq(("batc", "batch"), ("batc", "merge"),
      ("windw", "window"), ("windw", "merge"), ("tie", "ZZ"), ("tie", "QQ"))
    val got = EntityLink.rerankCharCosine(pairs.toDF("q", "c"), model)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    // independent dense-matrix double twin, bit-identical doubles
    def nv(s: String): Array[Double] = {
      val V = wts.charVocabSize
      val cMax = math.max(s.length, wts.maxWidth)
      val dense = new Array[Double](cMax * V)
      chV.getWord("<S>").foreach(id => dense(id) = 1.0)
      s.zipWithIndex.foreach { case (ch, k) =>
        if (k < cMax - 1)
          chV.tokToInd.get(ch.toString).foreach(id => dense((k + 1) * V + id) = 1.0)
      }
      if (s.length < cMax)
        chV.getWord("</S>").foreach(id => dense(s.length * V + id) = 1.0)
      val out = new Array[Double](wts.nWidths * wts.numFilters)
      for (wi <- 0 until wts.nWidths; f <- 0 until wts.numFilters) {
        val n = wts.minWidth + wi
        var best = Double.NegativeInfinity
        for (p <- 0 until cMax - n + 1) {
          var acc = wts.convB(wi)(f).toDouble
          for (j <- 0 until n * V) acc += wts.convW(wi)(f)(j).toDouble * dense(p * V + j)
          if (acc > best) best = acc
        }
        out(wi * wts.numFilters + f) = best
      }
      out
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val twin = pairs.groupBy(_._1).view.mapValues(cs =>
      cs.map { case (q, c) => (c, cos(nv(q), nv(c))) }
        .minBy { case (c, s) => (-s, c) }).toMap
    assert(got === twin)
    // like-string candidate out-scores the unrelated one
    assert(got("batc")._1 == "batch" && got("windw")._1 == "window")
    // all-OOV candidates have identical bias-only vectors: exact tie,
    // elected lexicographically
    assert(got("tie")._1 == "QQ")
  }

  test("linkCoherent: own canon never supports itself, ties to smaller id") {
    import spark.implicits._
    val dict = EntityLink.aliasDict(spark, spark.createDataset(Seq("solo")))
    val emptyCanon = Seq.empty[(Long, Long)].toDF("id", "component")
    // self-loop edge on solo's exact entity must NOT grant coherence
    val selfLoop = Seq((EntityLink.entityId("solo"), "p",
      EntityLink.entityId("solo"))).toDF("subj", "pred", "obj")
    val m = spark.createDataset(Seq(Mention("u1", "en", 0, 0, 1, "solo", "PER")))
    val got = EntityLink.linkCoherent(m, dict, emptyCanon, selfLoop).collect()
    assert(got.length == 1)
    assert(got(0).getLong(5) == EntityLink.entityId("solo"))
    assert(got(0).getLong(7) == 0L)
  }
}
