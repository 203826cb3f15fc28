package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV sketch aggregation result: the cardinality estimate, how many
  * minima the sketch holds, and the minima themselves (original xxhash64
  * values in unsigned-ascending order) so sketches can be re-merged. */
final case class KmvResult(est: Long, n_kept: Int, sketch: Array[Long])

/**
 * Mergeable distinct-count sketches: K-Minimum-Values (Bar-Yossef et al.
 * 2002, the bottom-k estimator) over `xxhash64` keys.
 *
 * Why KMV and not HyperLogLog: Spark's `approx_count_distinct` is HLL++,
 * but its binary sketch is engine-internal — it cannot be cross-checked
 * against an independent sequential implementation bit-for-bit, and its
 * estimate depends on float bias-correction tables. KMV is all-integer:
 * the sketch is literally the k smallest distinct hash values (a set — no
 * order dependence), and the estimator `(k-1) * 2^64 / kth_min` computed
 * in BigInt is exactly reproducible anywhere. That makes it the one
 * distinct-count sketch a golden twin can verify EXACTLY, while keeping
 * the properties that matter at 100 TB:
 *
 *  - O(k) state per group (k longs), independent of cardinality — a
 *    distinct-url count over 10^12 pages costs 512 bytes per group at
 *    k = 64, vs an unbounded `count_distinct` hash table;
 *  - fully mergeable (union + truncate), so map-side partial aggregation
 *    applies and sketches persisted per snapshot/partition can be
 *    combined later without touching raw data (the incremental-KG use:
 *    a fact table carries a sketch column instead of a url set);
 *  - relative standard error ~ 1/sqrt(k-2) (~12.7% at k = 64), and EXACT
 *    below saturation: until a group has seen k distinct keys the
 *    estimate IS the true distinct count.
 *
 * Internal buffer representation: hashes are stored FLIPPED
 * (`h ^ Long.MinValue`) so signed ascending order equals unsigned order
 * of the originals; the buffer is a sorted, duplicate-free Array[Long]
 * of at most k elements. `finish` unflips.
 *
 * Registered via `functions.udaf` (a TypedImperativeAggregate under
 * ObjectHashAggregate): partial reduce runs map-side, only k-long buffers
 * shuffle.
 */
object Sketches {

  /** Unsigned value of an original hash as BigInt (flipped f = h ^ MinValue
    * satisfies unsigned(h) = f + 2^63). */
  private def unsignedOfFlipped(f: Long): BigInt = BigInt(f) + (BigInt(1) << 63)

  /** KMV estimate from a flipped, sorted, deduped sketch of size n:
    * exact n below saturation, else (k-1) * 2^64 / kth_min, floored —
    * all-integer, clamped to Long range. */
  private[ops] def estimate(flipped: Array[Long], k: Int): Long =
    if (flipped.length < k) flipped.length.toLong
    else {
      val kth = unsignedOfFlipped(flipped(k - 1)).max(BigInt(1))
      ((BigInt(k - 1) << 64) / kth).min(BigInt(Long.MaxValue)).toLong
    }

  private def finishFlipped(buf: Array[Long], k: Int): KmvResult =
    KmvResult(estimate(buf, k), buf.length, buf.map(_ ^ Long.MinValue))

  /** Insert one flipped value into a sorted bounded buffer (skip if
    * duplicate or not below the current kth minimum). O(k) copy per
    * ACCEPTED insert — accepts become rare once the sketch saturates
    * (probability ~ k/n for the n-th distinct key). */
  private def insertFlipped(buf: Array[Long], f: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, f)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // not among the k smallest
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = f
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Sorted-merge two flipped buffers, dedup (equal values emerge
    * consecutively from the merge order), truncate to k. */
  private def mergeFlipped(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length) { val x = a(i); i += 1; x }
        else if (i >= a.length) { val x = b(j); j += 1; x }
        else if (a(i) <= b(j)) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Sketch raw 64-bit hash keys (one per row). */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], KmvResult] {
    require(k >= 2, "k must be >= 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      insertFlipped(buf, h ^ Long.MinValue, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeFlipped(a, b, k)
    override def finish(buf: Array[Long]): KmvResult = finishFlipped(buf, k)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
  }

  /** Merge already-built sketches (arrays of ORIGINAL hash values, as
    * KmvResult.sketch emits) — the snapshot-combination path. */
  final class KmvMergeAgg(k: Int) extends Aggregator[Array[Long], Array[Long], KmvResult] {
    require(k >= 2, "k must be >= 2")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], sketch: Array[Long]): Array[Long] = {
      val flipped = sketch.map(_ ^ Long.MinValue)
      java.util.Arrays.sort(flipped)
      mergeFlipped(buf, flipped, k)
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      mergeFlipped(a, b, k)
    override def finish(buf: Array[Long]): KmvResult = finishFlipped(buf, k)
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
  }

  /**
   * Per-group distinct-count estimates for `keyCol` (any expression;
   * hashed with xxhash64 seed 42) plus a global "ALL" row computed BY
   * MERGING the per-group sketches — never re-reading the data. The
   * equality of that merged row with a direct global sketch is the
   * mergeability proof (SketchesSpec); the board oracle checks both
   * levels against the independent sequential twin.
   *
   * Output: (group, n_rows, est_distinct, n_kept, kth_hash) — scalar
   * columns only, so the fixture diff is engine-neutral.
   */
  def distinctSketch(df: DataFrame, groupCol: String, keyCol: String,
                     k: Int = 64): DataFrame = {
    val kmv = udaf(new KmvAgg(k))
    val kmvMerge = udaf(new KmvMergeAgg(k))
    val perGroup = df
      .withColumn("__h", xxhash64(col(keyCol)))
      .groupBy(col(groupCol).as("group"))
      .agg(count(lit(1)).as("n_rows"), kmv(col("__h")).as("r"))
    val persisted = perGroup.persist()
    val global = persisted
      .agg(sum(col("n_rows")).as("n_rows"), kmvMerge(col("r.sketch")).as("r"))
      .select(lit("ALL").as("group"), col("n_rows"), col("r"))
    val out = persisted.select(col("group"), col("n_rows"), col("r"))
      .unionByName(global)
      .select(col("group"), col("n_rows"),
        col("r.est").as("est_distinct"), col("r.n_kept").as("n_kept"),
        element_at(col("r.sketch"), col("r.n_kept")).as("kth_hash"))
      .localCheckpoint(true)
    persisted.unpersist()
    out
  }
}
