package graft

import graft.eval.ClusterMetrics

class ClusterMetricsSpec extends SparkSpec {

  private def brute(items: Seq[(Long, Long, Long)]): (Long, Long, Long, Long) = {
    val pairs = for {
      Seq(x, y) <- items.combinations(2).toSeq
    } yield (x._2 == y._2, x._3 == y._3)
    (pairs.count(p => p._1 && p._2).toLong,
      pairs.count(_._1).toLong, pairs.count(_._2).toLong, items.size.toLong)
  }

  private def run(items: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val r = ClusterMetrics.pairConfusion(
      items.toDF("id", "a", "b"), "a", "b").collect()
    assert(r.length == 1)
    (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
  }

  test("pairConfusion: hand case") {
    // A: {1,2,3}{4,5}; B: {1,2}{3,4,5}
    // tp = C(2,2 in (a1,b1)) + C(2 in (a2,b2)) = 1 + 1
    val items = Seq((1L, 10L, 20L), (2L, 10L, 20L), (3L, 10L, 21L),
      (4L, 11L, 21L), (5L, 11L, 21L))
    assert(run(items) == ((2L, 4L, 4L, 5L)))
    assert(run(items) == brute(items))
  }

  test("pairConfusion: identical labelings give tp = a = b; singletons zero") {
    val same = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 6L, 6L))
    assert(run(same) == ((1L, 1L, 1L, 3L)))
    val single = Seq((1L, 1L, 9L), (2L, 2L, 8L))
    assert(run(single) == ((0L, 0L, 0L, 2L)))
  }

  test("pairConfusion: empty input reads as zeros, not a NULL row") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "a", "b")
    val r = ClusterMetrics.pairConfusion(empty, "a", "b").collect()
    assert(r.length == 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3)) == ((0L, 0L, 0L, 0L)))
  }

  test("pairConfusion: random labelings brute-force twin, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val items = (1L to 200L).map(i =>
      (i, rnd.nextInt(7).toLong, rnd.nextInt(5).toLong))
    assert(run(items) == brute(items))
    val df = items.toDF("id", "a", "b").repartition(9)
    val r = ClusterMetrics.pairConfusion(df, "a", "b").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == brute(items))
  }
}
