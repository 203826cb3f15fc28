package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // driver-side naive as-of: argmax over the full theta-match (independent
  // of the union-tag/window formulation under test)
  private def naive(left: Seq[(Long, Long)], right: Seq[(Long, Long, String)])
      : Map[(Long, Long), Option[(Long, String)]] =
    left.map { case (k, lt) =>
      val m = right.filter(r => r._1 == k && r._2 <= lt)
      (k, lt) -> (if (m.isEmpty) None
                  else { val r = m.maxBy(_._2); Some((r._2, r._3)) })
    }.toMap

  test("backward as-of matches the naive argmax incl. equal-ts inclusivity and unmatched rows") {
    val left = Seq((1L, 10L), (1L, 5L), (1L, 4L), (2L, 100L), (3L, 7L))
    val right = Seq((1L, 5L, "a"), (1L, 9L, "b"), (2L, 100L, "c"), (2L, 101L, "d"))
    val l = left.map { case (k, t) => (k, ts(t)) }.toDF("k", "lts")
    val r = right.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rts", "v")
    val got = AsOf.joinBackward(l, r, Seq("k"), "lts", "rts")
      .collect().map(row => ((row.getLong(0), row.getTimestamp(1).getTime / 1000),
        Option(row.getTimestamp(2)).map(t => (t.getTime / 1000, row.getString(3))))).toMap
    assert(got == naive(left, right))
    // spot the semantics the map encodes: ts=5 matches the ts=5 right row
    // (inclusive), ts=4 matches nothing, key 3 has no right rows at all
    assert(got((1L, 5L)) == Some((5L, "a")))
    assert(got((1L, 4L)).isEmpty)
    assert(got((3L, 7L)).isEmpty)
  }

  test("fuzz: 400 random rows x 5 keys equal the naive argmax") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(400)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val right = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(9).toString))
      // enforce the (key, ts) uniqueness contract
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val l = left.map { case (k, t) => (k, ts(t)) }.toDF("k", "lts")
    val r = right.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rts", "v")
    val got = AsOf.joinBackward(l, r, Seq("k"), "lts", "rts")
      .collect().map(row => ((row.getLong(0), row.getTimestamp(1).getTime / 1000),
        Option(row.getTimestamp(2)).map(t => (t.getTime / 1000, row.getString(3)))))
    val want = naive(left, right)
    assert(got.length == left.length)
    got.foreach { case (lk, m) => assert(m == want(lk), s"left=$lk") }
  }

  test("row-consistency: a null field in the newest right row is NOT spliced over by an older row") {
    val l = Seq((1L, ts(10))).toDF("k", "lts")
    val r = Seq((1L, ts(1), Option("old"), Option(100L)),
                (1L, ts(9), None, Option(200L))).toDF("k", "rts", "v", "w")
    val row = AsOf.joinBackward(l, r, Seq("k"), "lts", "rts").collect().head
    assert(row.getTimestamp(2).getTime == 9000L)
    assert(row.isNullAt(3), "v must be the newest row's null, not 'old'")
    assert(row.getLong(4) == 200L)
  }

  test("latestPerTs collapses (key, ts) ties under the explicit ordering") {
    val r = Seq((1L, ts(5), 7L, "x"), (1L, ts(5), 9L, "y"), (1L, ts(6), 1L, "z"))
      .toDF("k", "rts", "seq", "v")
    val got = AsOf.latestPerTs(r, Seq("k"), "rts", col("seq").desc)
      .orderBy("rts").collect().map(x => (x.getLong(2), x.getString(3))).toSeq
    assert(got == Seq((9L, "y"), (1L, "z")))
  }

  test("plan: merge shape — window over one exchange per side, no nested-loop/cartesian join") {
    val l = Seq((1L, ts(1))).toDF("k", "lts")
    val r = Seq((1L, ts(1), "a")).toDF("k", "rts", "v")
    val plan = AsOf.joinBackward(l, r, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(plan.contains("Window"), plan)
  }
}
