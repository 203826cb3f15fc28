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

  test("coalesceIntervals: gap 0 splits every distinct timestamp") {
    val rows = Seq((1L, "x", 1L), (1L, "x", 2L), (1L, "x", 2L))
    val got = Temporal.coalesceIntervals(obsDf(rows), Seq("ent", "p"), "ts", 0L)
    assert(got.count() === 2L)
    assert(got.agg(sum("n_obs")).head().getLong(0) === 2L)
  }
}
