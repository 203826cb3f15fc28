package graft

import graft.functions.Xxh64
import graft.kg.Embedding

class EmbeddingSpec extends SparkSpec {

  private val triples: Seq[(Long, String, Long)] = Seq(
    (1L, "p", 2L), (1L, "p", 3L), (2L, "q", 3L), (3L, "p", 4L),
    (4L, "q", 1L), (2L, "p", 4L), (1L, "p", 2L) // duplicate collapses
  )

  /** Inline brute-force restatement of the sampling rule. */
  private def brute(ts: Seq[(Long, String, Long)], k: Int, seed: Long)
      : Set[(Long, String, Long, Int, Long)] = {
    val t = ts.distinct
    val truth = t.toSet
    val ents = t.flatMap(x => Seq(x._1, x._3)).distinct.sorted
    val n = ents.length.toLong
    (for {
      (s, p, o) <- t
      slot <- 0 until k
      neg = ents(Math.floorMod(Xxh64.sparkChain(Seq[Any](s, p, o, slot, seed)), n).toInt)
      if !truth((s, p, neg))
    } yield (s, p, o, slot, neg)).toSet
  }

  private def df(parts: Int) = {
    import spark.implicits._
    triples.toDF("subj", "pred", "obj").repartition(parts)
  }

  test("negativeSamples: matches the brute-force rule at any partitioning") {
    for (parts <- Seq(1, 3); k <- Seq(1, 4); seed <- Seq(0L, 17L)) {
      val got = Embedding.negativeSamples(df(parts), k, seed).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3), r.getLong(4)))
        .toSet
      assert(got === brute(triples, k, seed), s"parts=$parts k=$k seed=$seed")
    }
  }

  test("negativeSamples: filtered — no corruption is a true triple; candidates come from the entity universe") {
    val truth = triples.distinct.toSet
    val ents = triples.flatMap(x => Seq(x._1, x._3)).toSet
    val got = Embedding.negativeSamples(df(3), k = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (s, p, _, slot, neg) =>
      assert(!truth((s, p, neg)))
      assert(ents(neg))
      assert(slot >= 0 && slot < 8)
    }
    // at most k rows per distinct triple
    val perTriple = got.groupBy(x => (x._1, x._2, x._3)).values.map(_.length)
    assert(perTriple.forall(_ <= 8))
  }
}
