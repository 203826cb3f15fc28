package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Bloom-filter deduplication — the Dolma-style incremental dedup primitive
 * (Soldaini et al. 2024, arXiv:2402.00159 §"Deduplication": a Bloom filter
 * over paragraphs dedups each new crawl snapshot against the already-
 * processed corpus). Complements the exact operators in [[Dedup]]:
 *
 *  - `Dedup.dedupParagraphs` is exact but pays a corpus-wide shuffle keyed
 *    on paragraph (hash); every snapshot re-shuffles the WHOLE corpus.
 *  - Bloom dedup trades a deterministic false-positive rate for a probe
 *    that never shuffles at all: the filter is built ONCE from the base
 *    corpus (one shuffle of bit-word indices, output m/64 longs), persists
 *    beside the corpus as an m/8-byte artifact, and each new snapshot is a
 *    pure codegen'd per-row `filter()` against the broadcast bit array.
 *    At 10^10 base paragraphs and 1% FPR, m ≈ 10^11 bits = 12 GB — at that
 *    point shard the filter by `xxhash64(key) % nShards` and probe each
 *    shard's snapshot slice; below it (every per-language or per-source
 *    partition in practice) the single array broadcasts.
 *
 * Semantics here are ORDER-FREE on the incoming side: a snapshot is
 * deduplicated against the base filter only, not against itself (parallel
 * batch has no deterministic "earlier document" — self-dedup is
 * `Dedup.dedupParagraphs`' job, composable after this). False positives
 * over-drop (a novel paragraph can be excised); false negatives cannot
 * happen — every base paragraph always drops.
 *
 * Hash formula (BloomHash, shared with the native expressions and
 * re-derived by the sequential twin): Kirsch–Mitzenmacher double hashing
 * over xxhash64(key, seed) / xxhash64(key, seed+1).
 */
object Bloom {

  /** Build the m-bit filter from `keys.col(keyCol)` (strings; nulls
    * ignored). One codegen'd pass: k positions per key -> (word, bitmask)
    * -> `bit_or` aggregation (map-side partial, shuffle carries at most
    * m/64 rows per partition) -> driver array of m/64 longs. Driver memory
    * is m/8 bytes — size m for the base-corpus cardinality, not the data
    * volume. */
  def build(keys: DataFrame, keyCol: String, mBits: Long, k: Int, seed: Long): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0 && mBits / 64 <= Int.MaxValue,
      "mBits must be a positive multiple of 64 with mBits/64 an Int")
    val words = keys
      .filter(col(keyCol).isNotNull)
      .select(explode(GraftFunctions.bloom_positions(col(keyCol), mBits, k, seed)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        expr("shiftleft(1L, cast(pos & 63 as int))").as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("bits"))
      .collect()
    val arr = new Array[Long]((mBits / 64).toInt)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate against a built filter (broadcast-constant bit
    * array inside a codegen'd expression; m = bits.length * 64). */
  def contains(key: Column, bits: Array[Long], k: Int, seed: Long): Column =
    GraftFunctions.bloom_contains(key, bits, k, seed)

  /**
   * Paragraph-level Bloom dedup of `incoming` against `base` (both
   * documents-shaped with \n-joined paragraphs). Builds the filter from
   * every base paragraph, then excises each incoming paragraph whose k bits
   * are all set. Returns (doc_id, n_paras, n_dropped, text_clean) for every
   * incoming doc — the same shape as `Dedup.dedupParagraphs`.
   *
   * The probe side is shuffle-free: paragraphs are split, tested and
   * reassembled within the row. Documents whose text survives intact never
   * move. Defaults (m = 2^22, k = 7) hold the FPR below 1e-5 up to ~10^5
   * base paragraphs — the test-scale corpora; production sizes m to the
   * base cardinality as in the object scaladoc.
   */
  def dedupAgainst(base: DataFrame, incoming: DataFrame,
                   mBits: Long = 1L << 22, k: Int = 7, seed: Long = 42L): DataFrame = {
    val paras = split(col("text"), "\n")
    val bits = build(
      base.select(explode(paras).as("p")), "p", mBits, k, seed)
    incoming
      .withColumn("paras", paras)
      .withColumn("kept", filter(col("paras"), p => !contains(p, bits, k, seed)))
      .select(col("doc_id"),
        size(col("paras")).cast("long").as("n_paras"),
        (size(col("paras")) - size(col("kept"))).cast("long").as("n_dropped"),
        concat_ws("\n", col("kept")).as("text_clean"))
  }
}
