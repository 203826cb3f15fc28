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

  /**
   * The reference's only tracked eval artifact: the conll03eval report (the
   * `score_` file, e.g. NeuralNERYang/tmp/score_a470ed), reproduced
   * byte-for-byte from the same counters (printf formats
   * conll03eval.v2:188-220; zero-denominator rules :196-215).
   *
   * @param counts (entityType, correct, guessed, gold) per type — the
   *               non-ALL rows of `prf`'s output; types print in ascending
   *               order like the perl `sort keys`.
   */
  def scoreReport(tokenCounter: Long, correctTags: Long,
                  counts: Seq[(String, Long, Long, Long)]): String = {
    val correct = counts.map(_._2).sum
    val guessed = counts.map(_._3).sum
    val gold = counts.map(_._4).sum
    def p(c: Long, g: Long): Double = if (g > 0) 100.0 * c / g else 0.0
    def fb1(pr: Double, rc: Double): Double = if (pr + rc > 0) 2 * pr * rc / (pr + rc) else 0.0
    val sb = new StringBuilder
    sb.append(s"processed $tokenCounter tokens with $gold phrases; ")
    sb.append(s"found: $guessed phrases; correct: $correct.\n")
    if (tokenCounter > 0) {
      val (pr, rc) = (p(correct, guessed), p(correct, gold))
      sb.append(f"accuracy: ${100.0 * correctTags / tokenCounter}%6.2f%%; ")
      sb.append(f"precision: $pr%6.2f%%; ")
      sb.append(f"recall: $rc%6.2f%%; ")
      sb.append(f"FB1: ${fb1(pr, rc)}%6.2f%n")
    }
    counts.sortBy(_._1).foreach { case (tpe, c, g, go) =>
      val (pr, rc) = (p(c, g), p(c, go))
      sb.append(f"$tpe%17s: ")
      sb.append(f"precision: $pr%6.2f%%; ")
      sb.append(f"recall: $rc%6.2f%%; ")
      sb.append(f"FB1: ${fb1(pr, rc)}%6.2f  $g%d%n")
    }
    sb.toString
  }

  /** Compute and write the score_ artifact for a (pred, gold) mention pair
    * plus the token-level tag frames (for the accuracy line). */
  def writeScoreFile(path: String, pred: Dataset[Mention], gold: Dataset[Mention],
                     predTags: DataFrame, goldTags: DataFrame): Unit = {
    val counts = prf(pred, gold).filter(col("entityType") =!= "ALL")
      .select("entityType", "correct", "guessed", "gold")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val acc = tokenAccuracy(predTags, goldTags).head()
    val report = scoreReport(acc.getAs[Long]("token_count"), acc.getAs[Long]("correct_tags"), counts)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), report.getBytes("UTF-8"))
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
