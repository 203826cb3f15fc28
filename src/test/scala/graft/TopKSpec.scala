package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TopK

/** Bounded top-k aggregation: equality with the window formulation it
  * replaces (including ties and rank-order), partition invariance, and
  * the entity-card fact ranking against its own window twin. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("rankTopK == row_number window on tied, skewed data at several partitionings") {
    // keys collide on purpose (score = id mod 7 as double) so the id-asc
    // tie-break is exercised; group 0 is a mega-group (fan-out 400)
    val rows = (0L until 500L).map(i => (if (i < 400) 0L else i % 5, i, (i % 7).toDouble)) ++
      Seq((0L, 10_000L, 6.0), (1L, 10_001L, Double.NaN)) // NaN ranks first (desc)
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("query_id", "neighbor_id", "score").repartition(parts)
      val got = TopK.rankTopK(df, "query_id", "neighbor_id", col("score"), 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      val want = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === want, s"parts=$parts")
    }
  }

  test("rankTopK with k larger than any group returns every row, ranks dense") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 12L, 0.1))
      .toDF("query_id", "neighbor_id", "score")
    val got = TopK.rankTopK(df, "query_id", "neighbor_id", col("score"), 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 11L, 1), (1L, 10L, 2), (2L, 12L, 1)))
  }

  test("entityCard (k-heap fact rank) == its window formulation, mega-subject included") {
    // subject 0 fans out 300 facts; predicate rarity + utf8 tie-breaks
    val triples = ((0 until 300).map(i => (0L, s"p${i % 9}", s"o$i")) ++
      Seq((1L, "p0", "oA"), (1L, "p1", "oA"), (1L, "p1", "oB"), (2L, "rare", "x")))
      .toDF("subj", "pred", "obj")
    val got = graft.kg.Triples.entityCard(triples, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    val t = triples.distinct()
    val pdf = t.groupBy(col("pred")).agg(count(lit(1)).as("pred_df"))
    val w = Window.partitionBy(col("subj"))
      .orderBy(col("pred_df").asc, col("pred").asc, col("obj").asc)
    val want = t.join(pdf, Seq("pred"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("subj"), col("pred"), col("obj"), col("pred_df"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
  }
}
