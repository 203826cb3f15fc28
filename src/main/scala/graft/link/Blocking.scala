package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Blocking strategies for entity resolution beyond the alias-equality join
 * ([[EntityLink]]) and the LSH families (`ops.Dedup`): candidate-pair
 * generation that bounds the quadratic comparison space by a cheap global
 * structure instead of a hash family.
 */
object Blocking {

  /**
   * SORTED-NEIGHBORHOOD candidate pairs (Hernández & Stolfo 1995, the
   * merge/purge method): impose the total order (key, id), slide a window
   * of `w` records over it, and emit every pair that co-occurs in some
   * window — i.e. all (r1, r2) with 0 < rank(r2) - rank(r1) < w. Where
   * equality blocking misses near-misses ("acme corp" vs "acme corp.")
   * because they hash apart, the sort places them adjacent; the window
   * bounds the work at |R| * (w-1) pairs regardless of key skew (a block
   * of a million identical keys costs w-1 pairs per record, not the
   * quadratic block join).
   *
   * Distributed shape: the rank is a range-partitioned sort (Spark's
   * TeraSort machinery — no single-partition window, no driver
   * materialization) plus `zipWithIndex`'s one extra count job; pairing is
   * ONE keyed equi-join on the window bucket floor(rank/w), each record
   * registering under its own bucket and the previous one so cross-boundary
   * neighbors meet without replicating the whole table. Output is exact and
   * partitioning-invariant because (key, id) is a total order.
   *
   * Returns (id1, id2, key1, key2, dist) with rank(id1) < rank(id2),
   * dist = rank difference in [1, w-1].
   */
  def sortedNeighborhood(records: DataFrame, keyCol: String, idCol: String,
                         w: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val spark = records.sparkSession
    val ranked0 = records
      .select(col(keyCol).cast("string").as("k"), col(idCol).cast("long").as("id"))
      .rdd.map(r => (r.getString(0), r.getLong(1)))
      .sortBy(identity) // range-partitioned total order (k, id)
      .zipWithIndex()
      .map { case ((k, id), r) => (k, id, r) }
    import spark.implicits._
    val ranked = ranked0.toDF("k", "id", "rank")
    val b1 = ranked.withColumn("bucket", floor(col("rank") / w))
    val b2 = ranked
      .select(col("k").as("k2"), col("id").as("id2"), col("rank").as("rank2"))
      .withColumn("bucket", explode(array(
        floor(col("rank2") / w), floor(col("rank2") / w) - 1)))
    b1.join(b2, Seq("bucket"))
      .filter(col("rank2") > col("rank") && col("rank2") - col("rank") < w)
      .select(col("id").as("id1"), col("id2"),
        col("k").as("key1"), col("k2").as("key2"),
        (col("rank2") - col("rank")).as("dist"))
  }
}
