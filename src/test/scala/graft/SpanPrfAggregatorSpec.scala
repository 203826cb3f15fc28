package graft

import graft.eval.{SpanPrfAggregator, TagPair}
import graft.ner.Bioes

class SpanPrfAggregatorSpec extends SparkSpec {

  private def randomPairs(n: Int, seed: Int): Seq[TagPair] = {
    val rnd = new scala.util.Random(seed)
    val tags = Vector("O", "O", "B-PER", "I-PER", "E-PER", "S-LOC", "B-ORG", "E-ORG", "S-MISC")
    Seq.fill(n) {
      val len = 1 + rnd.nextInt(10)
      TagPair(Vector.fill(len)(tags(rnd.nextInt(tags.size))),
        Vector.fill(len)(tags(rnd.nextInt(tags.size))))
    }
  }

  test("single-pass aggregator == SpanEval's join-based metrics") {
    import spark.implicits._
    val pairs = randomPairs(120, 7)
    // aggregator result (typed select)
    val agg = spark.createDataset(pairs)
      .select(SpanPrfAggregator.toColumn)
      .head()
      .map(r => (r.entityType, r.correct, r.guessed, r.gold)).toSet
    // join-based result over materialized mentions
    val gold = spark.createDataset(pairs.zipWithIndex.flatMap { case (p, i) =>
      Bioes.spans(p.gold.toIndexedSeq).map(sp =>
        graft.core.Mention(s"u$i", "en", 0, sp.begin, sp.end, "", sp.tpe))
    })
    val pred = spark.createDataset(pairs.zipWithIndex.flatMap { case (p, i) =>
      Bioes.spans(p.pred.toIndexedSeq).map(sp =>
        graft.core.Mention(s"u$i", "en", 0, sp.begin, sp.end, "", sp.tpe))
    })
    val joined = graft.eval.SpanEval.prf(pred, gold).collect()
      .map(r => (r.getAs[String]("entityType"), r.getAs[Long]("correct"),
        r.getAs[Long]("guessed"), r.getAs[Long]("gold"))).toSet
    assert(agg == joined, s"\nagg   =$agg\njoined=$joined")
  }

  test("partial-merge correctness: repartitioned input gives identical counts") {
    import spark.implicits._
    val pairs = randomPairs(60, 11)
    def run(parts: Int) = spark.createDataset(pairs).repartition(parts)
      .select(SpanPrfAggregator.toColumn)
      .head()
      .map(r => (r.entityType, r.correct, r.guessed, r.gold)).toSet
    assert(run(1) == run(8))
  }
}
