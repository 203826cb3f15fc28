package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.Mention

/**
 * conlleval-equivalent span metrics as a distributed aggregation — the
 * Spark twin of the CoNLL-2003 perl scorer the reference shells out to on
 * every evaluation (NeuralNERMono/NeuralNER.py:52; counters
 * eval/conll03eval.v2:28-61,230-247). Chunks are produced by
 * `graft.ner.Bioes.spans` with the scorer's own transition tables, so a
 * chunk here is exactly a chunk there.
 *
 * Output: one row per entity type plus an "ALL" row (the scorer's per-type
 * + overall report — A5's grouping-sets analog), with integer counters and
 * rounded P/R/F1.
 */
object SpanEval {

  def prf(pred: Dataset[Mention], gold: Dataset[Mention]): DataFrame = {
    val keyCols = Seq("url", "sentIdx", "begin", "end", "entityType")
    val p = pred.toDF().select(keyCols.map(col): _*)
    val g = gold.toDF().select(keyCols.map(col): _*)
    val correct = p.join(g, keyCols, "inner")
      .groupBy(col("entityType")).agg(count(lit(1)).as("correct"))
    val guessed = p.groupBy(col("entityType")).agg(count(lit(1)).as("guessed"))
    val goldCnt = g.groupBy(col("entityType")).agg(count(lit(1)).as("gold"))
    val perType = guessed
      .join(goldCnt, Seq("entityType"), "full_outer")
      .join(correct, Seq("entityType"), "full_outer")
      .na.fill(0L, Seq("correct", "guessed", "gold"))
    val overall = perType.agg(
      sum(col("correct")).as("correct"),
      sum(col("guessed")).as("guessed"),
      sum(col("gold")).as("gold"))
      .withColumn("entityType", lit("ALL"))
      .select(col("entityType"), col("correct"), col("guessed"), col("gold"))
    val all = perType.select(col("entityType"), col("correct"), col("guessed"), col("gold"))
      .unionByName(overall)
    withPrf(all)
  }

  /** precision/recall/FB1 exactly as conll03eval.v2:236-242 (0 when the
    * denominator is 0), rounded for stable comparison. */
  def withPrf(counts: DataFrame): DataFrame = {
    val p = when(col("guessed") > 0, col("correct") / col("guessed")).otherwise(0.0)
    val r = when(col("gold") > 0, col("correct") / col("gold")).otherwise(0.0)
    counts
      .withColumn("precision", round(p, 6))
      .withColumn("recall", round(r, 6))
      .withColumn("f1", round(when(p + r > 0, lit(2) * p * r / (p + r)).otherwise(0.0), 6))
  }

  /** Token-level accuracy (the scorer's `correctTags/tokenCounter`). */
  def tokenAccuracy(pred: DataFrame, gold: DataFrame): DataFrame = {
    val keys = Seq("url", "sentIdx", "tokIdx")
    pred.select((keys.map(col) :+ col("pred").as("p")): _*)
      .join(gold.select((keys.map(col) :+ col("pred").as("g")): _*), keys)
      .agg(
        sum(when(col("p") === col("g"), 1L).otherwise(0L)).as("correct_tags"),
        count(lit(1)).as("token_count"))
      .withColumn("accuracy", round(col("correct_tags") / col("token_count"), 6))
  }
}
