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

  test("linkPredictionSplit: twin equality; test rows have full train signal; demotion grows train only") {
    def asTriples(ts: Seq[(Long, String, Long)]) =
      ts.map { case (s, p, o) => graft.core.Triple(s, p, o, "en", "u", 0) }
    // widen the fixture so the 1/3 test tag hits several rows
    val wide = (0 until 60).map { i =>
      (i.toLong % 9, Seq("p", "q", "r")(i % 3), (i.toLong * 5) % 11)
    }.filter(x => x._1 != x._3)
    for (parts <- Seq(1, 5); (num, den) <- Seq((1L, 3L), (1L, 5L))) {
      import spark.implicits._
      val d = wide.toDF("subj", "pred", "obj").repartition(parts)
      val got = Embedding.linkPredictionSplit(d, num, den)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      val want = graft.golden.SequentialTwin.q109LinkSplit(
        asTriples(wide), num, den)
      assert(got.toSet === want.toSet, s"parts=$parts num=$num den=$den")
      assert(got.length === wide.distinct.length) // every triple labeled once
      val train = got.filter(_._4 == "train")
      val ents = train.flatMap(x => Seq(x._1, x._3)).toSet
      val preds = train.map(_._2).toSet
      got.filter(_._4 == "test").foreach { case (s, p, o, _) =>
        assert(ents(s) && ents(o) && preds(p))
      }
      // the raw hash tag marks at least as many rows as survive as test
      val rawTest = wide.distinct.count { case (s, p, o) => Math.floorMod(
        Xxh64.sparkChain(Seq[Any](s, p, o, 0L)), den) < num }
      assert(got.count(_._4 == "test") <= rawTest)
    }
  }

  test("linkPredictionSplit: an entity appearing ONLY in a tagged row demotes it") {
    import spark.implicits._
    // find a seedless tag that puts the unique-entity row in test
    val base = Seq((1L, "p", 2L), (2L, "p", 3L), (3L, "p", 1L))
    // craft a row whose object 99 appears nowhere else and whose hash tags test
    val candidate = (0 until 200).map(i => (1L, "p", 90L + i))
      .find { case (s, p, o) => Math.floorMod(
        Xxh64.sparkChain(Seq[Any](s, p, o, 0L)), 2L) < 1L }.get
    val d = (base :+ candidate).toDF("subj", "pred", "obj")
    val got = Embedding.linkPredictionSplit(d, 1L, 2L)
      .collect().map(r => ((r.getLong(0), r.getString(1), r.getLong(2)), r.getString(3))).toMap
    assert(got(candidate) === "train") // demoted: obj unseen in train
  }

  // ---- transeScores ----

  /** sequential twin: quantize, per-pred diff sums, |rsum - cnt*diff| */
  private def seqTranse(ts: Seq[(Long, String, Long)],
                        vecs: Map[Long, Seq[Float]], scale: Long)
      : Map[(Long, String, Long), BigInt] = {
    val t = ts.distinct.filter(x => vecs.contains(x._1) && vecs.contains(x._3))
    def q(id: Long): Seq[Long] =
      vecs(id).map(x => math.floor(x.toDouble * scale).toLong)
    val byPred = t.groupBy(_._2)
    byPred.flatMap { case (p, xs) =>
      val cnt = xs.size.toLong
      val dim = q(xs.head._1).length
      val rsum = (0 until dim).map(i =>
        xs.map(x => q(x._3)(i) - q(x._1)(i)).sum)
      xs.map { case (s, _, o) =>
        val score = (0 until dim).map(i =>
          BigInt(rsum(i) - cnt * (q(o)(i) - q(s)(i))).abs).sum
        (s, p, o) -> score
      }
    }
  }

  test("transeScores: perfect-translation triples score zero under a pure predicate") {
    import spark.implicits._
    // e_o = e_s + (1, 2) exactly for every "p" triple -> every residual 0
    val vecs = Map(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(1.0f, 2.0f),
      3L -> Seq(2.0f, 4.0f), 4L -> Seq(3.0f, 6.0f))
    val t = Seq((1L, "p", 2L), (2L, "p", 3L), (3L, "p", 4L))
    val ev = vecs.toSeq.map { case (id, v) => (id, v) }.toDF("id", "vec")
    val got = Embedding.transeScores(t.toDF("subj", "pred", "obj"), ev)
      .collect().map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
        r.getLong(3))).toMap
    assert(got.size === 3)
    assert(got.values.forall(_ === 0L))
  }

  test("transeScores: the violating triple scores strictly highest") {
    import spark.implicits._
    val vecs = Map(
      1L -> Seq(0.0f, 0.0f), 2L -> Seq(1.0f, 2.0f),
      3L -> Seq(2.0f, 4.0f), 4L -> Seq(3.0f, 6.0f),
      9L -> Seq(-5.0f, 7.5f)) // way off the (1,2) translation
    val t = Seq((1L, "p", 2L), (2L, "p", 3L), (3L, "p", 4L), (1L, "p", 9L))
    val ev = vecs.toSeq.map { case (id, v) => (id, v) }.toDF("id", "vec")
    val got = Embedding.transeScores(t.toDF("subj", "pred", "obj"), ev)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getLong(3))).toMap
    val bad = got((1L, 9L))
    got.foreach { case (k, v) => if (k != ((1L, 9L))) assert(v < bad) }
  }

  test("transeScores: twin equality on pseudo-random vectors at any partitioning") {
    import spark.implicits._
    val ids = (0L until 12L)
    val vecs = ids.map(i => i -> (0 until 5).map(d =>
      (((i * 31 + d * 17 + 3) % 41) - 20).toFloat / 8.0f)).toMap
    val ts = (0 until 40).map(i =>
      ((i * 7L) % 12L, if (i % 3 == 0) "a" else "b", (i * i * 5L + 1L) % 12L))
    // entity 11 gets NO vector in one variant: its triples must drop
    for (drop <- Seq(false, true); parts <- Seq(1, 7)) {
      val vv = if (drop) vecs - 11L else vecs
      val want = seqTranse(ts, vv, 1024L)
      val ev = vv.toSeq.map { case (id, v) => (id, v) }.toDF("id", "vec")
        .repartition(parts)
      val got = Embedding.transeScores(
          ts.toDF("subj", "pred", "obj").repartition(parts), ev)
        .collect().map(r => ((r.getLong(0), r.getString(1), r.getLong(2)),
          BigInt(r.getLong(3)))).toMap
      assert(got === want, s"drop=$drop parts=$parts")
    }
  }
}
