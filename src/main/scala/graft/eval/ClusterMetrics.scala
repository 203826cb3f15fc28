package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exact pairwise agreement between two clusterings of the same items — the
 * standard entity-resolution / dedup evaluation (pairwise precision,
 * recall, Rand): treat every unordered item pair as a binary decision
 * ("same cluster?") and confuse labeling A against labeling B.
 *
 * NEVER materializes pairs: with n_ab = |items labeled (a, b)|,
 *   tp_pairs = Σ_cells C(n_ab, 2)       (pairs both clusterings co-cluster)
 *   a_pairs  = Σ_a C(n_a, 2)            (pairs A co-clusters)
 *   b_pairs  = Σ_b C(n_b, 2)            (pairs B co-clusters)
 * so a 10^9-member cluster costs one counter, not 10^18 rows. Pairwise
 * precision of A against B = tp/a_pairs, recall = tp/b_pairs — the
 * division is the caller's; the operator returns the exact integer
 * ingredients (engine-exact, no float summation order).
 *
 * Plan: ONE partial-aggregated count keyed (a, b) — the contingency table,
 * bounded by min(|A-clusters|, |B-clusters|, |items|) rows — then three
 * one-row aggregates broadcast-stitched. Long arithmetic holds up to
 * ~4.3e9-member clusters (C(n,2) < 2^63); beyond that cast the counts to
 * decimal(38,0) at the call site.
 */
object ClusterMetrics {

  /** @param items one row per item with the two cluster labels
    * @return one row (tp_pairs, a_pairs, b_pairs, n_items) */
  def pairConfusion(items: DataFrame, aCol: String, bCol: String): DataFrame = {
    // n*(n-1) is even, so a right shift is the exact integer halving
    // (Column./ is DOUBLE division — exactness would die past 2^53).
    // UNSIGNED shift: for n in [~3.04e9, ~4.3e9] the product n*(n-1)
    // wraps negative in signed Long, but the wrapped bit pattern is the
    // correct value mod 2^64 and C(n,2) < 2^63, so the unsigned halving
    // recovers it exactly — a signed (sign-extending) shift would not.
    def c2(n: org.apache.spark.sql.Column) = shiftrightunsigned(n * (n - lit(1L)), 1)
    val cells = items.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    // coalesce: zero input rows must read as (0,0,0,0), not one NULL row
    val tp = cells.agg(coalesce(sum(c2(col("n"))), lit(0L)).as("tp_pairs"),
      coalesce(sum(col("n")), lit(0L)).as("n_items"))
    val ap = cells.groupBy(col("a")).agg(sum(col("n")).as("n"))
      .agg(coalesce(sum(c2(col("n"))), lit(0L)).as("a_pairs"))
    val bp = cells.groupBy(col("b")).agg(sum(col("n")).as("n"))
      .agg(coalesce(sum(c2(col("n"))), lit(0L)).as("b_pairs"))
    tp.crossJoin(ap).crossJoin(bp)
      .select(col("tp_pairs").cast("long").as("tp_pairs"),
        col("a_pairs").cast("long").as("a_pairs"),
        col("b_pairs").cast("long").as("b_pairs"),
        col("n_items").cast("long").as("n_items"))
  }
}
