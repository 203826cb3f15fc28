package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SHACL-style shape validation over the materialized triple table — the
 * QUALITY GATE of a production KG build. Extraction pipelines emit noisy
 * triples; a deployed KG enforces a schema ("every process entity merges
 * into at most 2 targets", "stream edges may only point at registered
 * sinks"), and the validation report — not an exception — is the
 * artifact downstream curation consumes. This is the W3C SHACL core
 * re-expressed relationally (shapes target every subject node), the way
 * a Spark engine should run it: constraints are a broadcast-sized shape
 * graph, violations are a tiny outer output, and the corpus-sized triple
 * table is touched exactly twice with nothing wider than (subj, pred)
 * counters ever shuffling.
 *
 * Two constraint families, each the lowering of a SHACL core component:
 *
 *  - CARDINALITY (`sh:minCount` / `sh:maxCount` per predicate): for
 *    every (subject, constrained predicate), the DISTINCT-object count
 *    must lie in [min, max]. A subject lacking the predicate entirely
 *    counts 0 — that is precisely what makes minCount a
 *    required-property check, and why the evaluation is
 *    subjects × constraints (a broadcast nested loop over the
 *    human-written shape table, NOT a corpus self-join) left-joined
 *    against the counts.
 *  - VALUE SET (`sh:in` per predicate): every (subj, pred, obj) whose
 *    predicate is constrained must draw obj from the allowed set — a
 *    broadcast anti-join probe.
 *
 * Scale shape at 10^12 triples: the counts aggregation shuffles
 * (subj, pred) — the triple table's natural key, partial-aggregated
 * map-side; the constraint tables (thousands of rows at most — shape
 * graphs are written by people) broadcast; the subjects relation reuses
 * the counts aggregation's own distinct subjects (no second corpus
 * scan). Violations stream out without ever materializing the compliant
 * majority.
 */
object Shacl {

  /**
   * Validate the triple table against cardinality + value-set shapes.
   *
   * @param triples     rows with (subj, pred, obj) — mention-level bag
   * @param cardinality (pred, min_count, max_count): bounds on the
   *                    DISTINCT objects per subject for that predicate
   * @param allowed     (pred, obj): the permitted object values for
   *                    value-constrained predicates (`sh:in`); a
   *                    predicate absent from this table is unconstrained
   * @return violations (subj, pred, code, observed, bound) where code is
   *         'minCount' | 'maxCount' (observed = distinct-object count,
   *         bound = the violated bound) or 'valueNotAllowed'
   *         (observed = the offending object id, bound = null)
   */
  def validate(triples: DataFrame, cardinality: DataFrame,
               allowed: DataFrame): DataFrame = {
    val t = triples.select(col("subj").cast("long"), col("pred"),
      col("obj").cast("long"))

    // one corpus aggregation: distinct objects per (subj, pred) — the
    // map-side-combinable shuffle this whole validator rides on
    val counts = t.groupBy(col("subj"), col("pred"))
      .agg(countDistinct(col("obj")).as("n"))
      .localCheckpoint(true)
    val subjects = counts.select(col("subj")).distinct()

    val card = broadcast(cardinality.select(col("pred"),
      col("min_count").cast("long"), col("max_count").cast("long")))
    val paired = subjects.crossJoin(card)
      .join(counts, Seq("subj", "pred"), "left")
      .withColumn("n0", coalesce(col("n"), lit(0L)))
    val cardViolations = paired
      .filter(col("n0") < col("min_count") || col("n0") > col("max_count"))
      .select(col("subj"), col("pred"),
        when(col("n0") < col("min_count"), lit("minCount"))
          .otherwise(lit("maxCount")).as("code"),
        col("n0").as("observed"),
        when(col("n0") < col("min_count"), col("min_count"))
          .otherwise(col("max_count")).as("bound"))

    val allow = allowed.select(col("pred"), col("obj").cast("long"))
    val constrainedPreds = broadcast(allow.select(col("pred")).distinct())
    val valueViolations = t
      .join(constrainedPreds, Seq("pred"), "left_semi")
      .join(broadcast(allow), Seq("pred", "obj"), "left_anti")
      .select(col("subj"), col("pred"), lit("valueNotAllowed").as("code"),
        col("obj").as("observed"), lit(null).cast("long").as("bound"))
      .distinct()

    cardViolations.unionByName(valueViolations)
  }
}
