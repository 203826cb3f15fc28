package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.Sketches
import graft.ops.Sketches.{KmvAgg, KmvMergeAgg}

class SketchesSpec extends SparkSpec {

  /** Naive reference: full distinct set, BigInt-unsigned sort, take k. */
  private def naive(values: Seq[Long], k: Int): (Long, Int, Long) = {
    val mask = (BigInt(1) << 64) - 1
    val kept = values.toSet.toArray.sortBy(h => BigInt(h) & mask).take(k)
    val est =
      if (kept.length < k) kept.length.toLong
      else ((BigInt(k - 1) << 64) / (BigInt(kept(k - 1)) & mask).max(BigInt(1)))
        .min(BigInt(Long.MaxValue)).toLong
    (est, kept.length, kept.last)
  }

  private def aggAll(agg: KmvAgg, values: Seq[Long]): graft.ops.KmvResult =
    agg.finish(values.foldLeft(agg.zero)(agg.reduce))

  test("KmvAgg matches the naive bottom-k on both sides of saturation") {
    val k = 8
    val agg = new KmvAgg(k)
    // deterministic pseudo-random longs incl. negatives (top-bit set)
    val vals = (0 until 200).map(i => i * -7046029254386353131L + 11L)
    for (n <- Seq(0, 1, 5, 8, 9, 50, 200)) {
      val vs = vals.take(n)
      val r = aggAll(agg, vs)
      if (n > 0) {
        val (est, kept, kth) = naive(vs, k)
        assert((r.est, r.n_kept, r.sketch.last) == ((est, kept, kth)), s"n=$n")
        assert(r.sketch.toSeq == vs.toSet.toArray
          .sortBy(h => (BigInt(h) & ((BigInt(1) << 64) - 1))).take(k).toSeq)
      } else assert(r.est == 0L && r.n_kept == 0)
    }
  }

  test("duplicates never change the sketch") {
    val k = 8
    val agg = new KmvAgg(k)
    val vs = (0 until 40).map(i => i * 2654435761L - 17L)
    val withDups = vs ++ vs ++ vs.take(10)
    assert(aggAll(agg, withDups).sketch.toSeq == aggAll(agg, vs).sketch.toSeq)
  }

  test("merge is associative-equivalent to sketching the concatenation") {
    val k = 8
    val agg = new KmvAgg(k)
    val a = (0 until 60).map(i => i * 2654435761L - 17L)
    val b = (0 until 60).map(i => i * -7046029254386353131L + 3L)
    val whole = a.foldLeft(agg.zero)(agg.reduce)
    val direct = agg.finish(
      agg.merge(whole, b.foldLeft(agg.zero)(agg.reduce)))
    val concat = aggAll(agg, a ++ b)
    assert(direct.sketch.toSeq == concat.sketch.toSeq)
    assert(direct.est == concat.est)
  }

  test("KmvMergeAgg over per-group sketches equals the direct global sketch") {
    val k = 8
    val agg = new KmvAgg(k)
    val ma = new KmvMergeAgg(k)
    val groups = (0 until 5).map(g =>
      (0 until 30).map(i => (g * 1000 + i) * 2654435761L + g))
    val sketches = groups.map(vs => aggAll(agg, vs).sketch)
    val merged = ma.finish(sketches.foldLeft(ma.zero)(ma.reduce))
    val direct = aggAll(agg, groups.flatten)
    assert(merged.sketch.toSeq == direct.sketch.toSeq)
    assert(merged.est == direct.est && merged.n_kept == direct.n_kept)
  }

  test("estimate is exact below saturation and within 3-sigma above it") {
    val k = 64
    val agg = new KmvAgg(k)
    // exact path
    assert(aggAll(agg, (1L to 50L).map(i => graft.functions.Xxh64.hashLong(i, 42L))).est == 50L)
    // estimation path: 20k distinct xxhash64 keys; RSE ~ 1/sqrt(k-2) = 12.7%
    val n = 20000
    val hs = (1 to n).map(i => graft.functions.Xxh64.hashLong(i.toLong, 42L))
    val est = aggAll(agg, hs).est
    assert(math.abs(est - n.toDouble) / n < 0.38, s"est=$est for n=$n")
  }

  test("distinctSketch: distributed result matches the sequential twin and is partition-invariant") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      (i.toLong, s"text-${i % 157}-${i % 3}", s"lang${i % 4}")
    }
    val expected = {
      // twin-shaped reference over the same rows (k=16 to saturate)
      val docs = rows.map { case (id, t, l) => (t, l) }
      val mask = (BigInt(1) << 64) - 1
      def row(g: String, n: Long, hs: Set[Long], k: Int) = {
        val kept = hs.toArray.sortBy(h => BigInt(h) & mask).take(k)
        val est = if (kept.length < k) kept.length.toLong
          else ((BigInt(k - 1) << 64) / (BigInt(kept(k - 1)) & mask).max(BigInt(1)))
            .min(BigInt(Long.MaxValue)).toLong
        (g, n, est, kept.length, kept.last)
      }
      val perLang = docs.groupBy(_._2).toSeq.map { case (l, ds) =>
        row(l, ds.size.toLong,
          ds.map(d => graft.functions.Xxh64.hashString(d._1, 42L)).toSet, 16)
      }
      (perLang :+ row("ALL", docs.size.toLong,
        docs.map(d => graft.functions.Xxh64.hashString(d._1, 42L)).toSet, 16)).toSet
    }
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("doc_id", "text", "lang").repartition(parts)
      val got = Sketches.distinctSketch(df, "lang", "text", k = 16)
        .as[(String, Long, Long, Int, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  // ---- Misra–Gries / heavy hitters / Count-Min ----

  /** Zipf-ish deterministic token stream: token "t<i>" appears ~N/i
    * times, shuffled by a fixed permutation so MG sees adversarial
    * interleaving rather than sorted runs. */
  private def zipfTokens(n: Int): Seq[String] = {
    val raw = (1 to 40).flatMap(i => Seq.fill(n / i)(s"t$i"))
    // deterministic shuffle: sort by a hash of (token, position)
    raw.zipWithIndex.sortBy { case (t, p) =>
      graft.functions.Xxh64.sparkChain(Seq[Any](t, p)) }.map(_._1)
  }

  test("MgAgg superset guarantee holds under any reduce/merge split") {
    val k = 10
    val toks = zipfTokens(400)
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = toks.size.toLong
    val mustSurvive = exact.filter(_._2 * (k + 1) > n).keySet
    val agg = new Sketches.MgAgg(k)
    // three merge shapes: single fold, halves, 7-way chunks
    val shapes = Seq(Seq(toks), toks.grouped(toks.size / 2 + 1).toSeq,
      toks.grouped(toks.size / 7 + 1).toSeq)
    shapes.foreach { chunks =>
      val merged = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val r = agg.finish(merged)
      assert(r.tokens.length <= k)
      mustSurvive.foreach(t => assert(r.tokens.contains(t),
        s"token $t (> N/(k+1)) dropped by MG — guarantee broken"))
      // lower-bound property: surviving count <= true count
      r.tokens.zip(r.lbs).foreach { case (t, lb) =>
        assert(lb >= 1L && lb <= exact(t)) }
    }
  }

  test("heavyHitters: exact output, partition-invariant, matches definition") {
    import spark.implicits._
    val toks = zipfTokens(300)
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = toks.size.toLong
    for (k <- Seq(5, 20); parts <- Seq(1, 7)) {
      val want = exact.filter { case (_, c) => c * k > n }.toSet
      val got = Sketches.heavyHitters(
          toks.toDF("token").repartition(parts), k)
        .as[(String, Long)].collect().toSet
      assert(got === want, s"k=$k parts=$parts")
    }
  }

  test("CmAgg sketch is bit-identical at any partitioning; estimates always over") {
    import spark.implicits._
    val toks = zipfTokens(300)
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val seqCells = {
      val agg = new Sketches.CmAgg(3, 64)
      toks.foldLeft(agg.zero)(agg.reduce).toSeq
    }
    var firstDf: Seq[(String, Long, Long)] = null
    for (parts <- Seq(1, 5)) {
      val cm = udaf(new Sketches.CmAgg(3, 64))
      val cells = toks.toDF("token").repartition(parts)
        .agg(cm(col("token"))).head().getSeq[Long](0)
      assert(cells.toSeq === seqCells, s"parts=$parts — CM not order-free")
      val est = Sketches.cmTopEstimates(
          toks.toDF("token").repartition(parts), depth = 3, width = 64,
          topK = 10)
        .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
      est.foreach { case (t, c, e) =>
        assert(c === exact(t)); assert(e >= c, s"CM under at $t") }
      if (firstDf == null) firstDf = est else assert(est === firstDf)
    }
  }

  test("cmTopEstimates: tight width makes estimates EXACT (no collisions forced)") {
    import spark.implicits._
    // 3 distinct tokens, width 64, depth 4: collisions possible but the
    // overestimate can only come from the other two tokens; with exact
    // counts known, est - cnt is a sum of colliding counts >= 0
    val toks = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val got = Sketches.cmTopEstimates(toks.toDF("token"), depth = 4,
        width = 64, topK = 3)
      .as[(String, Long, Long)].collect()
    assert(got.map(_._1).toSet === Set("a", "b", "c"))
    got.foreach { case (t, c, e) =>
      val want = Map("a" -> 30L, "b" -> 20L, "c" -> 10L)(t)
      assert(c === want)
      assert(e >= c && e <= 60L)
    }
  }

  test("sketchOverlap: EXACT below saturation — estimates are true distincts, n_common the true intersection") {
    import spark.implicits._
    // three slices with known overlap, all under k=64 distinct keys
    val rows =
      (1 to 30).map(i => ("a", s"k$i")) ++        // a: k1..k30
      (21 to 50).map(i => ("b", s"k$i")) ++       // b: k21..k50 (|a∩b|=10)
      (1 to 5).map(i => ("c", s"k$i")) ++         // c: k1..k5 (⊂ a, |b∩c|=0)
      Seq(("a", "k1"), ("b", "k21"))              // duplicates collapse
    var first: Seq[(String, String, Long, Long, Long, Long, Long, Long, Long)] = null
    for (parts <- Seq(1, 7)) {
      val got = Sketches.sketchOverlap(
          rows.toDF("g", "key").repartition(parts), "g", "key", k = 64)
        .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
      assert(got.map(r => (r._1, r._2)) === Seq(("a", "b"), ("a", "c"), ("b", "c")))
      val m = got.map(r => (r._1, r._2) -> r).toMap
      // (g1, g2, est1, est2, estU, unionKept, nCommon, jacPm, estI)
      assert(m(("a", "b")) === (("a", "b", 30L, 30L, 50L, 50L, 10L, 200L, 10L)))
      assert(m(("a", "c")) === (("a", "c", 30L, 5L, 30L, 30L, 5L, 166L, 5L)))
      assert(m(("b", "c")) === (("b", "c", 30L, 5L, 35L, 35L, 0L, 0L, 0L)))
      if (first == null) first = got else assert(got === first)
    }
  }

  test("sketchOverlap: saturated sketches stay deterministic and pair math bounds hold") {
    import spark.implicits._
    // two big overlapping slices, k=16 well below their cardinality
    val rows = (1 to 400).map(i => ("x", s"v$i")) ++
      (201 to 600).map(i => ("y", s"v$i"))
    var first: Seq[Row] = null
    for (parts <- Seq(1, 5)) {
      val got = Sketches.sketchOverlap(
        rows.toDF("g", "key").repartition(parts), "g", "key", k = 16).collect().toSeq
      assert(got.size === 1)
      val r = got.head
      assert(r.getLong(5) === 16L)                  // union kept = k
      assert(r.getLong(6) <= 16L)                   // common ⊆ union sample
      assert(r.getLong(7) === r.getLong(6) * 1000L / 16L)
      if (first == null) first = got else assert(got === first)
    }
  }
}
