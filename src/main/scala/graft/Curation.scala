package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextStats}

/**
 * The production-shaped CURATION pipeline — the training-data side of the
 * engine, one spark-submit from raw documents to a curated, packed,
 * PII-redacted corpus (the KG side's analog is `RunPipeline`). Stages, each
 * an operator oracled on the query board:
 *
 *   1. quality FILTER (Gopher/C4 integer rules, q37)
 *   2. EXACT dedup, hash-keyed (q21)
 *   3. transitive NEAR-dup clustering keep-list (MinHash-LSH -> CC, q36)
 *   4. benchmark DECONTAMINATION vs a holdout set (q53)
 *   5. REPETITION filter (top-ngram profile, q55)
 *   6. PII REDACTION (q57) + LM-rarity annotation (q56)
 *   7. deterministic SEQUENCE PACKING by token budget (q51)
 *   8. crash-atomic resumable write partitioned by lang (TableIO snapshots)
 *
 * Each surviving stage is localCheckpoint'ed: the stage boundaries are the
 * chain's natural materialization points, stage counts then cost nothing
 * extra, and downstream stages never recompute upstream operators. The
 * whole chain is deterministic — rerunning into the same root writes no
 * new partitions (resumability, tested).
 */
object Curation {

  final case class Report(docsIn: Long, afterQuality: Long, afterExact: Long,
                          afterNearDup: Long, afterDecontam: Long,
                          afterRepetition: Long, langsWritten: Seq[String])

  /** The curated corpus as a DataFrame:
    * (doc_id, lang, source, n_tokens, lm_logprob, bucket, pack_id, text)
    * with `text` already PII-redacted. Also returns per-stage counts.
    *
    * Shuffle budget: the per-row stages (quality, repetition, redaction)
    * are in-place predicate FILTERS — no join against a keep-set, no
    * shuffle. Only the inherently relational stages join: the two dedups
    * (hash/LSH aggregations) and decontamination (broadcast benchmark
    * grams), plus the final rarity/packing annotations (one combine
    * aggregation and one bucketed window). */
  def curatedWithCounts(spark: SparkSession, sfDir: String,
                        budget: Long = 512L): (DataFrame, Report) =
    curatedWithCounts(spark.read.parquet(s"$sfDir/documents.parquet"), budget)

  /** DataFrame-input core (the overload above reads the sf dir). */
  def curatedWithCounts(docsIn0: DataFrame, budget: Long): (DataFrame, Report) = {
    val docs = docsIn0.localCheckpoint()
    val docsIn = docs.count()

    val quality = docs.filter(TextStats.keepPredicate(col("text"))).localCheckpoint()
    val nQuality = quality.count()

    val exactKeep = quality.join(
      Dedup.exact(quality).select(col("keep_id").as("doc_id")), Seq("doc_id"))
      .localCheckpoint()
    val nExact = exactKeep.count()

    val nearKeep = exactKeep.join(
      Dedup.dedupClusters(exactKeep).filter(col("doc_id") === col("keep_id"))
        .select(col("doc_id")), Seq("doc_id"))
      .localCheckpoint()
    val nNear = nearKeep.count()

    // holdout: the stand-in benchmark set (doc_id % 97 == 0, as q53)
    val benchmark = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val clean = nearKeep.join(
      Dedup.decontaminate(nearKeep, benchmark, k = 8)
        .filter(!col("contaminated")).select(col("doc_id")), Seq("doc_id"))
      .localCheckpoint()
    val nClean = clean.count()

    val unrepetitive = clean
      .filter(!TextStats.repetitivePredicate(col("text"))).localCheckpoint()
    val nUnrep = unrepetitive.count()

    val rarity = TextStats.lmRarity(unrepetitive)
      .select(col("doc_id"), col("lm_logprob"))
    val packed = TextStats.packByTokenBudget(unrepetitive, budget)
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("pack_id"))
    val out = unrepetitive
      .select(col("doc_id"), col("lang"), col("source"),
        TextStats.redactedText(col("text")).as("text"))
      .join(packed, Seq("doc_id"))
      .join(rarity, Seq("doc_id"))

    (out, Report(docsIn, nQuality, nExact, nNear, nClean, nUnrep, Nil))
  }

  def runAndWrite(spark: SparkSession, sfDir: String, outRoot: String,
                  budget: Long = 512L): Report = {
    val (out, report) = curatedWithCounts(spark, sfDir, budget)
    val langs = graft.core.TableIO.writeResumable(out, outRoot, "lang")
    report.copy(langsWritten = langs)
  }
}

object RunCuration {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunCuration <sfDir> <outRoot> [budget]")
    val Array(sfDir, outRoot) = args.take(2)
    val budget = if (args.length > 2) args(2).toLong else 512L
    val spark = SparkSession.builder()
      .appName("graft-curation-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val r = Curation.runAndWrite(spark, sfDir, outRoot, budget)
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = graft.core.TableIO.read(spark, outRoot, "lang").count()
    println(
      s"""{"metric":"curation_run","seconds":${f"$secs%.2f"},"docs_in":${r.docsIn},""" +
      s""""after_quality":${r.afterQuality},"after_exact":${r.afterExact},""" +
      s""""after_neardup":${r.afterNearDup},"after_decontam":${r.afterDecontam},""" +
      s""""after_repetition":${r.afterRepetition},"rows_written":$rows,""" +
      s""""langs":${r.langsWritten.size},"out":"$outRoot"}""")
    spark.stop()
  }
}
