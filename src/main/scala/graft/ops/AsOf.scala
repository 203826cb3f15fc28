package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Temporal AS-OF join in the distributed MERGE shape.
 *
 * `joinBackward(left, right, keys, lts, rts)` attaches to every left row the
 * single right row with the greatest `rts <= lts` for the same key (the
 * "backward" / "at-or-before" as-of of kdb, DuckDB `ASOF JOIN`, pandas
 * `merge_asof`). Left rows with no prior right row keep null right fields
 * (LEFT as-of semantics).
 *
 * Plan shape — and why it scales: the naive formulation is a theta-join
 * (`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark can only execute
 * as a per-key nested loop — O(|L|·|R|) per key and quadratic on a 100 TB
 * event log. Instead both sides are UNION-tagged and carried through ONE
 * window: partition by key, order by (ts, side) with right rows sorting
 * before left rows at equal timestamps (so an exactly-tied right row IS
 * matched, the at-or-INCLUSIVE-before contract), then
 * `last(right_payload, ignoreNulls) over rowsBetween(-inf, current)` is the
 * running most-recent right row. That is exactly the textbook sequential
 * merge algorithm, distributed: one hash exchange per side + one sort, no
 * candidate explosion, no per-row probe structure, spill-safe (Spark's
 * window sort spills; a per-key HashMap probe would not).
 *
 * The whole right row rides as a single STRUCT so the carried fields are
 * row-consistent: per-column `last(ignoreNulls)` would skip a legitimately
 * null column of the newest right row and splice in an OLDER row's value.
 *
 * 100 TB notes: key cardinality (users / urls / entities) >> partitions, so
 * the exchange spreads; a single pathological hot key serializes only its
 * own sorted run — for that shape, range-bucket the timeline (join on
 * (key, ts_bucket) with the previous bucket's closing row replicated
 * forward) rather than salting, since carry-forward state crosses salt
 * boundaries. Determinism contract: right must be unique per (key, ts) —
 * [[latestPerTs]] collapses ties under an explicit ordering first — so the
 * matched row is well-defined on any engine.
 *
 * Reference anchor: the reference pipeline has no temporal join (it
 * processes static CoNLL splits); this operator is part of the
 * training-data-curation surface (e.g. join each crawled page to the most
 * recent robots/license snapshot at-or-before its warc_ts).
 */
object AsOf {

  /** Collapse right-side (key, ts) ties deterministically: keep the first
    * row under `tie` ordering within each (keys..., ts) group. One shuffle
    * (window + filter), partial-agg-free but rank-pruned at scale by AQE. */
  def latestPerTs(right: DataFrame, keys: Seq[String], ts: String,
                  tie: Column*): DataFrame = {
    require(tie.nonEmpty, "latestPerTs needs an explicit tie ordering")
    val w = Window.partitionBy((keys :+ ts).map(col): _*).orderBy(tie: _*)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /**
   * @param left   probe side; all its columns pass through unchanged
   * @param right  reference side; must be unique per (keys, rts)
   * @param keys   equi-join key columns (present on both sides)
   * @param lts    left timestamp column name
   * @param rts    right timestamp column name; kept in the output as the
   *               matched row's timestamp (null when unmatched)
   */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   lts: String, rts: String): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val clash = left.columns.toSet.intersect(payloadCols.toSet)
    require(clash.isEmpty, s"left/right column clash: ${clash.mkString(",")}")

    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rts).as("__asof_ts"),
        lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__payload")): _*)
    val payloadType = rTagged.schema("__payload").dataType.asInstanceOf[StructType]
    val lTagged = left.withColumn("__asof_ts", col(lts))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
