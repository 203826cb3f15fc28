package graft

import org.apache.spark.sql.functions._
import graft.kg.Temporal

class TemporalSpec extends SparkSpec {

  private def obsDf(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("ent", "p", "us")
      .select(col("ent"), col("p"), timestamp_micros(col("us")).as("ts"))
      .repartition(3)
  }

  /** sequential gaps-and-islands twin */
  private def seqCoalesce(rows: Seq[(Long, String, Long)], gap: Long)
      : Set[(Long, String, Long, Long, Long)] =
    rows.distinct.groupBy(r => (r._1, r._2)).flatMap { case ((e, p), xs) =>
      val ts = xs.map(_._3).sorted
      val islands = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(ts.head))
      ts.tail.foreach { t =>
        if (t - islands.last.last > gap)
          islands += scala.collection.mutable.ArrayBuffer(t)
        else islands.last += t
      }
      islands.map(i => (e, p, i.head, i.last, i.length.toLong))
    }.toSet

  test("coalesceIntervals: hand case — gap closes, duplicate obs collapse") {
    // key (1,x): obs at 0, 5, 7, 20 with gap 10 -> [0,7]x3, [20,20]x1
    val rows = Seq(
      (1L, "x", 0L), (1L, "x", 5L), (1L, "x", 5L), (1L, "x", 7L),
      (1L, "x", 20L),
      (2L, "x", 3L), (1L, "y", 0L))
    val got = Temporal.coalesceIntervals(obsDf(rows), Seq("ent", "p"), "ts",
        maxGapMicros = 10L)
      .select(col("ent"), col("p"), unix_micros(col("valid_from")),
        unix_micros(col("valid_to")), col("n_obs"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === Set(
      (1L, "x", 0L, 7L, 3L), (1L, "x", 20L, 20L, 1L),
      (2L, "x", 3L, 3L, 1L), (1L, "y", 0L, 0L, 1L)))
  }

  test("coalesceIntervals: pseudo-random obs — twin equality, partition-invariant") {
    val rows = (0 until 500).map { i =>
      ((i * 7L) % 11L, "p" + (i % 3), (i * i * 131L + i * 17L) % 10000L)
    }
    val want = seqCoalesce(rows, 500L)
    for (parts <- Seq(1, 7)) {
      val got = Temporal.coalesceIntervals(
          obsDf(rows).repartition(parts), Seq("ent", "p"), "ts", 500L)
        .select(col("ent"), col("p"), unix_micros(col("valid_from")),
          unix_micros(col("valid_to")), col("n_obs"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(got === want)
    }
  }

  test("validAt: picks exactly the intervals covering the probe instant") {
    // key (1,x): islands [0,7] and [20,20] under gap 10
    val rows = Seq(
      (1L, "x", 0L), (1L, "x", 5L), (1L, "x", 7L), (1L, "x", 20L),
      (2L, "x", 3L))
    def at(t: Long) = Temporal.validAt(obsDf(rows), Seq("ent", "p"), "ts",
        maxGapMicros = 10L, atMicros = t)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(at(3L) === Set((1L, 3L), (2L, 1L)))   // inside [0,7] and [3,3]
    assert(at(5L) === Set((1L, 3L)))             // [3,3] closed by then
    assert(at(15L) === Set.empty)                // between (1,x)'s islands
    assert(at(20L) === Set((1L, 1L)))            // point island boundary
  }

  // ---- overlap join ----

  private def ivDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "f", "t")
      .select(col("k"), timestamp_micros(col("f")).as("valid_from"),
        timestamp_micros(col("t")).as("valid_to"))
      .repartition(3)
  }

  private def runOverlap(l: Seq[(Long, Long, Long)],
                         r: Seq[(Long, Long, Long)], cell: Long) =
    Temporal.overlapJoin(ivDf(l), ivDf(r), Seq("k"), cellMicros = cell)
      .select(col("k"), unix_micros(col("l_from")), unix_micros(col("l_to")),
        unix_micros(col("r_from")), unix_micros(col("r_to")),
        unix_micros(col("overlap_from")), unix_micros(col("overlap_to")))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getLong(6)))

  /** naive all-pairs twin of the inclusive overlap join */
  private def naiveOverlap(l: Seq[(Long, Long, Long)],
                           r: Seq[(Long, Long, Long)]) =
    (for {
      (k, lf, lt) <- l
      (k2, rf, rt) <- r
      if k == k2 && lf <= rt && rf <= lt
    } yield (k, lf, lt, rf, rt, math.max(lf, rf), math.min(lt, rt))).toSet

  test("overlapJoin: hand case — inclusive boundaries, cross-key excluded") {
    val l = Seq((1L, 0L, 10L), (1L, 20L, 30L), (2L, 0L, 5L))
    val r = Seq((1L, 10L, 15L), (1L, 16L, 19L), (2L, 6L, 9L), (3L, 0L, 99L))
    val got = runOverlap(l, r, cell = 7L).toSet
    // [0,10]x[10,15] touch at 10 (inclusive); [20,30] misses both right
    // intervals; key 2's intervals are adjacent-but-disjoint (5 < 6)
    assert(got === Set((1L, 0L, 10L, 10L, 15L, 10L, 10L)))
  }

  test("overlapJoin: exactly-once at ANY cell width — naive twin equality") {
    // pseudo-random interval sets incl. long spans crossing many cells
    val l = (0 until 40).map { i =>
      val k = (i % 4).toLong; val f = (i * 13L) % 90L
      (k, f, f + (i * 7L) % 25L)
    }
    val r = (0 until 40).map { i =>
      val k = (i % 5).toLong; val f = (i * 29L) % 90L
      (k, f, f + (i * 11L) % 40L)
    }
    val want = naiveOverlap(l, r)
    for (cell <- Seq(1L, 3L, 16L, 1000L))
      assert(runOverlap(l, r, cell).toSet === want,
        s"cellMicros=$cell diverged from the naive twin")
    // bag semantics too: no pair emitted twice
    assert(runOverlap(l, r, 3L).length === want.size)
  }

  test("coalesceIntervals: gap 0 splits every distinct timestamp") {
    val rows = Seq((1L, "x", 1L), (1L, "x", 2L), (1L, "x", 2L))
    val got = Temporal.coalesceIntervals(obsDf(rows), Seq("ent", "p"), "ts", 0L)
    assert(got.count() === 2L)
    assert(got.agg(sum("n_obs")).head().getLong(0) === 2L)
  }

  // ---- bursts ----

  private def evDf(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
      .repartition(3)
  }

  test("bursts: dense grid zeros, full-history gate, strict cross-multiplied test") {
    // bucket width 10us, trailing 3, burst iff cnt >= 2 and cnt*3 > 2*trail
    // key "a": counts per bucket 0..5 = [1, 2, 0(empty), 1, 6, 4]
    val rows =
      Seq.fill(1)(("a", 5L)) ++ Seq.fill(2)(("a", 15L)) ++
      Seq.fill(1)(("a", 35L)) ++ Seq.fill(6)(("a", 42L)) ++
      Seq.fill(4)(("a", 55L))
    val got = Temporal.bursts(evDf(rows), Seq("k"), "ts",
        bucketMicros = 10L, trailing = 3, numK = 2L, denK = 1L,
        minCount = 2L)
      .select(col("k"), unix_micros(col("bucket_start")).as("bs"),
        col("cnt"), col("trailing_total"), col("is_burst"))
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // buckets 0..2 lack a full 3-bucket history -> suppressed
    assert(got.keySet === Set(30L, 40L, 50L))
    // bucket 3: cnt 1, trail [1,2,0]=3 -> below minCount, not a burst
    assert(got(30L) === ((1L, 3L, false)))
    // bucket 4: cnt 6, trail [2,0,1]=3: 6*3=18 > 2*3=6 -> burst
    assert(got(40L) === ((6L, 3L, true)))
    // bucket 5: cnt 4, trail [0,1,6]=7: 12 > 14 false -> not a burst
    assert(got(50L) === ((4L, 7L, false)))
  }

  test("bursts: equality at the threshold is NOT a burst; empty-bucket baseline counts") {
    // key counts buckets 0..4 = [2, 2, 2, 0, 4]: bucket 4 trail [2,2,0]=4,
    // 4*3=12 > 2*4=8 -> burst; but at numK=3: 4*3=12 > 3*4=12 is FALSE
    val rows = Seq.fill(2)(("b", 1L)) ++ Seq.fill(2)(("b", 11L)) ++
      Seq.fill(2)(("b", 21L)) ++ Seq.fill(4)(("b", 41L))
    def run(numK: Long) = Temporal.bursts(evDf(rows), Seq("k"), "ts",
        10L, trailing = 3, numK = numK, denK = 1L, minCount = 1L)
      .select(unix_micros(col("bucket_start")).as("bs"), col("is_burst"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(run(2L) === Map(30L -> false, 40L -> true))
    assert(run(3L) === Map(30L -> false, 40L -> false))
  }

  test("funnel: order, window anchor, strict succession, greedy exactness") {
    import spark.implicits._
    def ev(rows: (Long, Long, String)*) = rows.toSeq.toDF("k", "us", "st")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("st"))
    def run(df: org.apache.spark.sql.DataFrame, w: Long) =
      graft.kg.Temporal.funnel(df, "k", "ts", "st",
          Seq("A", "B", "C"), windowMicros = w)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val log = ev(
      (1L, 0L, "A"), (1L, 5L, "B"), (1L, 9L, "C"),    // completes
      (2L, 0L, "A"), (2L, 5L, "C"), (2L, 9L, "B"),    // C before B: depth B
      (3L, 0L, "A"), (3L, 5L, "B"), (3L, 30L, "C"),   // C outside window
      (4L, 0L, "B"), (4L, 5L, "C"),                   // never entered
      (5L, 0L, "A"), (5L, 0L, "B"))                   // same-ts: not AFTER
    assert(run(log, 10L) === Map("A" -> 4L, "B" -> 3L, "C" -> 1L))
    // the window anchors at the FIRST A — a second, later A cannot re-arm
    val reArm = ev((1L, 0L, "A"), (1L, 100L, "A"), (1L, 101L, "B"))
    assert(run(reArm, 10L) === Map("A" -> 1L, "B" -> 0L, "C" -> 0L))
    // greedy exactness: the EARLIEST qualifying B (5) leaves room for the
    // C at 7; choosing the later B (8) would miss it — greedy must count
    val greedy = ev((1L, 0L, "A"), (1L, 5L, "B"), (1L, 8L, "B"), (1L, 7L, "C"))
    assert(run(greedy, 10L) === Map("A" -> 1L, "B" -> 1L, "C" -> 1L))
    // brute-force twin on pseudo-random logs, partition-invariant
    val rnd = new scala.util.Random(13)
    val rows = (1 to 400).map(_ => (rnd.nextInt(25).toLong + 1L,
      rnd.nextInt(60).toLong, Vector("A", "B", "C", "X")(rnd.nextInt(4))))
    val w = 20L
    val twin: Map[String, Long] = {
      val byK = rows.groupBy(_._1)
      def depth(es: Seq[(Long, Long, String)]): Int = {
        val sorted = es.sortBy(e => (e._2, e._3))
        sorted.filter(_._3 == "A").map(_._2).minOption match {
          case None => 0
          case Some(t0) =>
            var t = t0; var d = 1
            for (st <- Seq("B", "C")) {
              val nxt = sorted.filter(e =>
                e._3 == st && e._2 > t && e._2 <= t0 + w).map(_._2)
              if (d == Seq("B", "C").indexOf(st) + 1 && nxt.nonEmpty) {
                t = nxt.min; d += 1
              }
            }
            d
        }
      }
      val depths = byK.values.map(depth).toSeq
      Map("A" -> depths.count(_ >= 1).toLong,
        "B" -> depths.count(_ >= 2).toLong,
        "C" -> depths.count(_ >= 3).toLong)
    }
    assert(run(ev(rows: _*), w) === twin)
    assert(run(ev(rows: _*).repartition(7), w) === twin)
  }

  test("funnelTimes: per-key depth/times agree with funnel counts") {
    import spark.implicits._
    def ev(rows: (Long, Long, String)*) = rows.toSeq.toDF("k", "us", "st")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("st"))
    val log = ev(
      (1L, 0L, "A"), (1L, 5L, "B"), (1L, 9L, "C"),
      (2L, 2L, "A"), (2L, 5L, "C"), (2L, 9L, "B"),
      (3L, 0L, "B"), (3L, 5L, "C"))
    val got = graft.kg.Temporal.funnelTimes(log, "k", "ts", "st",
        Seq("A", "B", "C"), windowMicros = 10L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // key 1 completes: depth 3, anchor 0, last 9, elapsed 9
    // key 2 reaches B only (C precedes B): depth 2, anchor 2, last 9
    // key 3 never enters (no A): absent
    assert(got === Map(1L -> ((3L, 0L, 9L, 9L)), 2L -> ((2L, 2L, 9L, 7L))))
    // counts derived from depths == funnel's stage counts
    val counts = graft.kg.Temporal.funnel(log, "k", "ts", "st",
        Seq("A", "B", "C"), windowMicros = 10L)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts === Map(
      "A" -> got.values.count(_._1 >= 1L).toLong,
      "B" -> got.values.count(_._1 >= 2L).toLong,
      "C" -> got.values.count(_._1 >= 3L).toLong))
  }

  // ---- earliestReach (time-respecting reachability) ----

  private def tedges(rows: Seq[(Long, Long, Long)], parts: Int = 3) = {
    import spark.implicits._
    rows.toDF("src", "dst", "ts").repartition(parts)
  }

  private def seedsDf(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("id")
  }

  /** sequential brute force: enumerate time-respecting walks up to
    * maxHops by hop-indexed DP over the FULL table each round (no
    * frontier machinery). */
  private def seqReach(rows: Seq[(Long, Long, Long)], seeds: Seq[Long],
                       startTs: Long, maxHops: Int): Map[Long, Long] = {
    val es = rows.filter(e => e._1 != e._2 && e._3 >= startTs).distinct
    var arr = seeds.distinct.map(_ -> startTs).toMap
    (1 to maxHops).foreach { _ =>
      val next = es.flatMap { case (u, v, ts) =>
        arr.get(u).filter(ts >= _).map(_ => v -> ts)
      }.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
      arr = (arr.keySet ++ next.keySet).map { v =>
        v -> math.min(arr.getOrElse(v, Long.MaxValue),
          next.getOrElse(v, Long.MaxValue))
      }.toMap
    }
    arr
  }

  test("earliestReach: chronology respected — a static path with decreasing timestamps does not count") {
    // a -(5)-> b -(3)-> c: static BFS reaches c, temporal does not;
    // the later b -(7)-> c edge does
    val e1 = Seq((1L, 2L, 5L), (2L, 3L, 3L))
    val g1 = Temporal.earliestReach(tedges(e1), seedsDf(Seq(1L)), startTs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 === Map(1L -> 0L, 2L -> 5L))
    val g2 = Temporal.earliestReach(tedges(e1 :+ (2L, 3L, 7L)),
        seedsDf(Seq(1L)), startTs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 === Map(1L -> 0L, 2L -> 5L, 3L -> 7L))
    // edges strictly before startTs are unusable
    val g3 = Temporal.earliestReach(tedges(e1), seedsDf(Seq(1L)), startTs = 6L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g3 === Map(1L -> 6L))
  }

  test("earliestReach: a later slow edge beats an earlier blocked one (min over paths, not hops)") {
    // two routes to 4: direct at ts=9, and 1->2->4 arriving at 6
    val es = Seq((1L, 4L, 9L), (1L, 2L, 2L), (2L, 4L, 6L))
    val got = Temporal.earliestReach(tedges(es), seedsDf(Seq(1L)), startTs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(4L) === 6L)
  }

  test("earliestReach: distributed loop == driver fallback == brute force on a skewed temporal graph") {
    // pseudo-random temporal digraph with a hub, duplicate edges at
    // different timestamps, self-loops to drop
    val es: Seq[(Long, Long, Long)] = (0 until 400).map { i =>
      val s = if (i % 5 == 0) 0L else (i * 31L + 7L) % 40L
      val d = (i * i * 17L + 3L) % 40L
      (s, d, (i * 73L + 11L) % 100L)
    }
    val seeds = Seq(0L, 17L)
    val want = seqReach(es, seeds, startTs = 0L, maxHops = 12)
    val drv = Temporal.earliestReach(tedges(es), seedsDf(seeds), startTs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Temporal.earliestReach(tedges(es, 7), seedsDf(seeds),
        startTs = 0L, maxHops = 12, smallGraphThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv === want)
    assert(dist === want)
  }
}
