package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deduplication operators over a `documents`-shaped table
 * (doc_id long, text string, lang string, ...): the standard large-corpus
 * training-data pipeline family — exact, MinHash+LSH, SimHash, exact n-gram
 * Jaccard. All are shuffle-on-key DataFrame plans (map-side partial aggs,
 * no driver collection) that scale linearly with executors.
 */
object Dedup {

  /** Exact dedup: one representative (min doc_id) per identical text.
    * At 100 TB hash first (`sha2`) so the shuffle carries 32-byte keys
    * instead of document bodies. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Exact dedup keyed on raw text (oracle-friendly variant). */
  def exactByText(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select(col("keep_id"), col("dup_cnt"))

  /** Word n-gram shingles of a text column, as a distinct array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // sliding n-gram join: transform over indices 0..len-n
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => when(i + n <= size(toks), concat_ws("", slice(toks, i + 1, lit(n))))),
        x => x.isNotNull))
  }

  /**
   * MinHash + banded LSH near-duplicate detection:
   *  1. shingle -> 64-bit hash;
   *  2. `numHashes` universal-hash minima form the signature (computed as
   *     min over (a_i * h + b_i) — one groupBy-free pass with higher-order
   *     array functions, fully codegen'd);
   *  3. signature split into `bands` bands; band-hash buckets;
   *  4. docs sharing a bucket are candidates; candidates verified with
   *     exact shingle-set Jaccard (array_intersect/union sizes).
   * Returns verified pairs (doc1, doc2, jaccard) with jaccard >= threshold.
   * Scale: the only shuffles are the bucket groupBy and the pair distinct;
   * hot buckets are capped at `maxBucket` docs (logged drop, standard LSH
   * practice) so one degenerate bucket cannot quadratically explode.
   */
  def minhashLsh(docs: DataFrame, shingleSize: Int = 3, numHashes: Int = 32,
                 bands: Int = 8, threshold: Double = 0.5,
                 maxBucket: Int = 64): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val withShingles = docs.select(col("doc_id"), shingles(col("text"), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    // signature(i) = min over shingles of xxhash64(i, shingle) — seeded hash
    // family; no multiplicative arithmetic (ANSI-safe, no overflow).
    val sig = withShingles.withColumn("sig",
      transform(sequence(lit(0), lit(numHashes - 1)), i =>
        aggregate(col("sh"), lit(Long.MaxValue),
          (acc, s) => least(acc, xxhash64(i, s)))))
    val banded = sig.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws("_", lit("band"), b,
          concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))).as(Seq("band", "bucket")))
    val buckets = banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(struct(col("doc_id"), col("sh"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val pairs = buckets.select(explode(expr(
      "filter(transform(flatten(transform(members, a -> transform(members, b -> struct(a, b)))), " +
        "p -> p), p -> p.a.doc_id < p.b.doc_id)")).as("p"))
      .select(col("p.a.doc_id").as("doc1"), col("p.b.doc_id").as("doc2"),
        col("p.a.sh").as("sh1"), col("p.b.sh").as("sh2"))
      .dropDuplicates("doc1", "doc2")
    pairs.withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", size(array_union(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc1"), col("doc2"), col("inter"), col("uni"), col("jaccard"))
  }

  /** 64-bit SimHash per document: per-token hash bits vote +1/-1; the sign
    * vector is the fingerprint. Computed with array expressions (codegen),
    * no UDF. Returns (doc_id, simhash). */
  def simhash(docs: DataFrame): DataFrame = {
    // bit b of the final hash = sign of sum over tokens of (bit set ? 1 : -1)
    docs
      .select(col("doc_id"),
        expr("transform(split(text, ' '), t -> xxhash64(t))").as("hs"))
      .select(col("doc_id"), expr(
        "aggregate(transform(sequence(0, 63), b -> " +
          "IF(aggregate(hs, 0L, (acc, h) -> acc + IF((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0, " +
          "shiftleft(1L, b), 0L)), 0L, (a, v) -> a | v)").as("simhash"))
  }

  /** SimHash near-dup candidates: docs sharing any of the four 16-bit
    * chunks (guaranteed to catch hamming distance <= 3), verified by true
    * hamming distance <= `maxHamming`. */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 64): DataFrame = {
    val sh = simhash(docs)
    val chunked = sh.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
        .as(Seq("chunk", "ckey")))
    val buckets = chunked.groupBy(col("chunk"), col("ckey"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    buckets.select(explode(expr(
        "filter(flatten(transform(members, a -> transform(members, b -> struct(a, b)))), " +
          "p -> p.a.doc_id < p.b.doc_id)")).as("p"))
      .select(col("p.a.doc_id").as("doc1"), col("p.b.doc_id").as("doc2"),
        col("p.a.simhash").as("h1"), col("p.b.simhash").as("h2"))
      .dropDuplicates("doc1", "doc2")
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc1"), col("doc2"), col("hamming"))
  }

  /**
   * Exact n-gram Jaccard similarity >= threshold via an inverted index
   * (shingle -> docs) join — the oracle-checkable exact twin of minhashLsh.
   * `docFilter` bounds the candidate universe (pairwise work is inherently
   * quadratic in bucket size; production uses minhashLsh and verifies).
   */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 2, minJaccardPct: Int = 50): DataFrame = {
    val grams = docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("g"))
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val g2 = grams.withColumnRenamed("doc_id", "doc2")
    val inter = grams.join(g2, Seq("g"))
      .filter(col("doc_id") < col("doc2"))
      .groupBy(col("doc_id"), col("doc2")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes, Seq("doc_id"))
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("sz", "sz2"), Seq("doc2"))
      .withColumn("uni", col("sz") + col("sz2") - col("inter"))
      .filter(col("inter") * 100 >= col("uni") * minJaccardPct)
      .select(col("doc_id").as("doc1"), col("doc2"), col("inter"), col("uni"))
  }

  /** Embedding near-duplicates: pairs with cosine >= threshold. Exact
    * all-pairs within hash-sign LSH buckets (random-hyperplane signs over
    * deterministic pseudo-planes), verified by true cosine. */
  def embeddingNearDup(emb: DataFrame, threshold: Double = 0.95,
                       planes: Int = 8, maxBucket: Int = 256): DataFrame = {
    val sigBits = transform(sequence(lit(0), lit(planes - 1)), p =>
      when(aggregate(zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          // deterministic pseudo-plane: sin-free integer hash -> ±1 weights
          (x, i) => x * (pmod(xxhash64(concat(lit("plane"), p, lit(":"), i)), lit(2)) * 2 - 1).cast("float")),
        lit(0.0d), (acc, v) => acc + v) > 0, lit(1)).otherwise(lit(0)))
    val withSig = emb
      .select(col("vec_id"), col("embedding"), sigBits.as("bits"))
      .select(col("vec_id"), col("embedding"), expr(
        s"aggregate(zip_with(bits, sequence(0, ${planes - 1}), " +
          "(b, i) -> shiftleft(CAST(b AS BIGINT), i)), 0L, (a, v) -> a | v)").as("sig"))
    val buckets = withSig.groupBy(col("sig"))
      .agg(collect_list(struct(col("vec_id"), col("embedding"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val pairs = buckets.select(explode(expr(
        "filter(flatten(transform(members, a -> transform(members, b -> struct(a, b)))), " +
          "p -> p.a.vec_id < p.b.vec_id)")).as("p"))
      .select(col("p.a.vec_id").as("v1"), col("p.b.vec_id").as("v2"),
        col("p.a.embedding").as("e1"), col("p.b.embedding").as("e2"))
      .dropDuplicates("v1", "v2")
    pairs.withColumn("cosine", Similarity.cosine(col("e1"), col("e2")))
      .filter(col("cosine") >= threshold)
      .select(col("v1"), col("v2"), col("cosine"))
  }
}
