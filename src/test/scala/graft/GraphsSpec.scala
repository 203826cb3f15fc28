package graft

import org.apache.spark.sql.functions._
import graft.kg.Graphs

class GraphsSpec extends SparkSpec {

  // ---- sequential twins (brute force, no orientation / blocking) ----

  private def simple(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet

  private def seqTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = simple(edges)
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.distinct
    val adj = nodes.map(n =>
      n -> e.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }.toSet).toMap
    val counts = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach(n => counts(n) = 0L)
    for {
      Seq(x, y, z) <- nodes.sorted.combinations(3)
      if adj(x)(y) && adj(x)(z) && adj(y)(z)
    } { counts(x) += 1; counts(y) += 1; counts(z) += 1 }
    counts.toMap
  }

  private def seqJaccard(occ: Seq[(Long, String)], tauNum: Long, tauDen: Long)
      : Set[(Long, Long, Long, Long)] = {
    val sets = occ.distinct.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    (for {
      a <- sets.keys; b <- sets.keys; if a < b
      common = (sets(a) intersect sets(b)).size.toLong
      union = (sets(a) union sets(b)).size.toLong
      if common * tauDen >= tauNum * union && common > 0
    } yield (a, b, common, union)).toSet
  }

  private def seqBfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxDepth: Int)
      : Map[Long, Int] = {
    val es = edges.filter(e => e._1 != e._2).distinct
    val adj = es.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val dist = scala.collection.mutable.HashMap.empty[Long, Int]
    var frontier = seeds.distinct
    frontier.foreach(dist(_) = 0)
    var d = 0
    while (d < maxDepth && frontier.nonEmpty) {
      d += 1
      frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
        .distinct.filterNot(dist.contains)
      frontier.foreach(dist(_) = d)
    }
    dist.toMap
  }

  // deterministic pseudo-random digraph: 50 nodes, ~300 edges, skewed
  // (node 0 is a hub), with self-loops and duplicates the ops must drop
  private val graph: Seq[(Long, Long)] = (0 until 300).map { i =>
    val s = if (i % 5 == 0) 0L else ((i * 31L + 7L) % 50L)
    val t = (i * i * 17L + 3L) % 50L
    (s, t)
  } ++ Seq((1L, 1L), (2L, 3L), (2L, 3L))

  private def edgesDf(edges: Seq[(Long, Long)], parts: Int = 5) = {
    import spark.implicits._
    edges.toDF("src", "dst").repartition(parts)
  }

  test("triangles: K4 plus pendant — exact counts, zeros included") {
    // K4 on 1..4 (each corner in C(3,2)=3 triangles) + pendant node 9
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 9L))
    val got = Graphs.triangles(edgesDf(k4)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 9L -> 0L))
  }

  test("triangles: skewed graph matches brute-force twin at any partitioning") {
    val want = seqTriangles(graph)
    for (parts <- Seq(1, 7)) {
      val got = Graphs.triangles(edgesDf(graph, parts)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"parts=$parts")
    }
  }

  test("mergeCandidates: exact integer Jaccard vs twin; direction-blind") {
    import spark.implicits._
    val occ = Seq(
      (1L, "u1"), (1L, "u2"), (1L, "u3"),
      (2L, "u1"), (2L, "u2"), (2L, "u3"), (2L, "u4"), // J(1,2)=3/4
      (3L, "u3"), (3L, "u9"),                         // J(1,3)=1/4
      (4L, "zz"),                                     // no shared witness
      (1L, "u1")                                      // duplicate row (set semantics)
    ).toDF("node", "w").repartition(3)
    val got = Graphs.mergeCandidates(occ, 3, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === Set((1L, 2L, 3L, 4L)))
    val want = seqJaccard(Seq(
      (1L, "u1"), (1L, "u2"), (1L, "u3"), (2L, "u1"), (2L, "u2"), (2L, "u3"),
      (2L, "u4"), (3L, "u3"), (3L, "u9"), (4L, "zz")), 1, 4)
    val got14 = Graphs.mergeCandidates(occ, 1, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got14 === want)
  }

  test("mergeCandidates: hub witness cap drops LOUDLY and bounds common") {
    import spark.implicits._
    // witness "hub" is shared by all 6 nodes; "p" only by 1 and 2
    val occ = ((1L to 6L).map(n => (n, "hub")) ++ Seq((1L, "p"), (2L, "p")))
      .toDF("node", "w")
    Graphs.lastDropReport.remove("merge_candidates")
    val got = Graphs.mergeCandidates(occ, 1, 100, maxWitnessDegree = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // hub excluded: only (1,2) via "p" survives, with common=1 (lower bound)
    assert(got === Set((1L, 2L, 1L)))
    assert(Graphs.lastDropReport("merge_candidates") === ((1L, 6L)))
    // uncapped is exact and does not touch the report
    Graphs.lastDropReport.remove("merge_candidates")
    val exact = Graphs.mergeCandidates(occ, 1, 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(exact.size === 15 && exact.contains((1L, 2L, 2L, 2L)))
    assert(!Graphs.lastDropReport.contains("merge_candidates"))
  }

  test("bfs: twin equality, driver AND distributed paths, depth truncation") {
    import spark.implicits._
    val seeds = Seq(0L, 13L)
    for (depth <- Seq(0, 2, 6)) {
      val want = seqBfs(graph, seeds, depth)
      // threshold 0 forces the distributed frontier loop; default = driver
      for (threshold <- Seq(0L, Graphs.SmallGraphThreshold)) {
        val got = Graphs.bfs(edgesDf(graph), seeds.toDF("id"), depth, threshold)
          .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(got === want, s"depth=$depth threshold=$threshold")
      }
    }
  }

  test("bfs: unreachable nodes emit no row; seed at distance 0") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (7L, 8L)) // 7,8 unreachable from 1
    val got = Graphs.bfs(edgesDf(chain, 2), Seq(1L).toDF("id"), 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }
}
