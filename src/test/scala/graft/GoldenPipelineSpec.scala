package graft

import graft.core.Triple
import graft.link.EntityLink
import graft.ner.NerStage
import graft.text.TextExtract

/**
 * End-to-end golden: the full Spark pipeline's (subj, pred, obj) triples vs
 * an INDEPENDENT sequential driver implementation — NaiveKernel (dense-math
 * forward), a straight scan-order sentence/mention/triple assembly, and a
 * union-find canonicalizer. north_rule acceptance: P/R >= 0.95 on the
 * emitted triples (expected ~1.0; the only admissible divergence is a
 * float-ulp argmax flip between the two kernel formulations).
 */
class GoldenPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def goldenTriples(models: Map[String, graft.ner.Models.LangModel]): Set[(Long, String, Long, String, String, Int)] = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    // sequential pipeline
    val allTokens = scala.collection.mutable.LinkedHashSet.empty[String]
    val sentences = docs.flatMap { case (id, text0, lang, source) =>
      val url = s"https://crawl.example.org/$lang/$source/doc$id"
      val text = TextExtract.extractText(gen.CorpusGen.htmlFor(id, text0, lang, source))
      TextExtract.sentences(text).zipWithIndex.map { case (toks, i) =>
        toks.foreach(t => allTokens += t.toLowerCase(java.util.Locale.ROOT))
        (url, lang, i, toks)
      }
    }
    // alias dictionary + canonicalization (independent union-find)
    val dict = allTokens.toSeq.flatMap { a =>
      val cands = scala.collection.mutable.LinkedHashMap(a -> 1.0)
      val st = EntityLink.stem(a)
      if (!cands.contains(st)) cands(st) = 0.5
      val pf = EntityLink.prefixStem(a)
      if (!cands.contains(pf)) cands(pf) = 0.25
      cands.map { case (c, p) => (a, EntityLink.entityId(c), p) }
    }
    val best = dict.groupBy(_._1).map { case (a, cs) =>
      a -> cs.maxBy(c => (c._3, -c._2))._2 // max prior, min entity id
    }
    val edges = dict.groupBy(_._1).values.flatMap { cs =>
      val ids = cs.map(_._2)
      if (ids.min != ids.max) Some((ids.min, ids.max)) else None
    }.toSeq
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min id of component:
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val compMin = nodes.groupBy(find).map { case (root, ns) => root -> ns.min }
    def canon(id: Long): Long = {
      if (parent.contains(id) || nodes.contains(id)) compMin(find(id)) else id
    }
    val lex = NerStage.defaultPredicateLexicon
    sentences.flatMap { case (url, lang, si, toks) =>
      val m = models(lang)
      val (predIds, _) = graft.golden.NaiveKernel.forward(toks.toIndexedSeq, m.inputVocab, m.charVocab, m.weights)
      val tags = predIds.toIndexedSeq.map(id =>
        m.tagVocab.getIndex(id).getOrElse("o").toUpperCase(java.util.Locale.ROOT))
      val spans = graft.ner.Bioes.spans(tags)
      (0 until math.max(0, spans.length - 1)).flatMap { i =>
        val a = spans(i); val b = spans(i + 1)
        if (b.begin - a.end > 10) None
        else {
          val between = toks.slice(a.end, b.begin)
          val pred = between.find(t => lex.contains(t.toLowerCase(java.util.Locale.ROOT)))
            .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("related_to")
          val subjAlias = toks.slice(a.begin, a.end).head.toLowerCase(java.util.Locale.ROOT)
          val objAlias = toks.slice(b.begin, b.end).head.toLowerCase(java.util.Locale.ROOT)
          Some((canon(best(subjAlias)), pred, canon(best(objAlias)), lang, url, si))
        }
      }
    }.toSet
  }

  test("Spark pipeline triples match the independent sequential golden (P/R >= 0.95)") {
    Pipeline.reset()
    val sparkTriples = Pipeline.triples(spark, sf).collect()
      .map(t => (t.subj, t.pred, t.obj, t.lang, t.url, t.sentIdx)).toSet
    val golden = goldenTriples(Pipeline.models(spark, sf))
    assert(golden.nonEmpty && sparkTriples.nonEmpty)
    val inter = sparkTriples.intersect(golden).size.toDouble
    val precision = inter / sparkTriples.size
    val recall = inter / golden.size
    info(f"triples: spark=${sparkTriples.size} golden=${golden.size} P=$precision%.4f R=$recall%.4f")
    assert(precision >= 0.95, f"precision $precision%.4f < 0.95")
    assert(recall >= 0.95, f"recall $recall%.4f < 0.95")
  }

  test("per-url extracted text is byte-identical between pipeline and golden path") {
    import spark.implicits._
    val fromPipeline = Pipeline.pages(spark, sf)
      .map(p => (p.url, p.text)).collect().toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source").as[(Long, String, String, String)].collect()
    docs.foreach { case (id, text0, lang, source) =>
      val url = s"https://crawl.example.org/$lang/$source/doc$id"
      val direct = TextExtract.extractText(gen.CorpusGen.htmlFor(id, text0, lang, source))
      assert(fromPipeline(url) == direct, s"url=$url")
    }
  }
}
