package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`embeddings` table:
 * vec_id long, embedding array<float>, label int).
 *
 * - `bruteForceTopK`: exact cosine top-k — broadcast the (small) query set
 *   against the full table; one scan, no shuffle except the final per-query
 *   top-k. The correctness baseline.
 * - `ivfTopK`: IVF-style approximate search — k-means-free deterministic
 *   coarse quantizer (centroids = a fixed stride of the data itself),
 *   vectors assigned to nearest centroid once (a fact table write at scale),
 *   queries probe `nProbe` nearest centroids and scan only those buckets:
 *   the 100 TB plan (scan cost / nlist * nProbe).
 *
 * All dot products run through codegen'd higher-order functions
 * (zip_with + aggregate) — no Scala UDF in the hot path.
 */
object Similarity {

  /** Cosine similarity of two array<float> columns (double accumulation). */
  def cosine(a: Column, b: Column): Column = {
    // cast BEFORE multiplying: float32*float32 rounds to float32, while the
    // DuckDB oracle (CAST(... AS DOUBLE[])) multiplies in double — operand
    // cast makes both sides bit-identical.
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (s, v) => s + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0d), (s, v) => s + v))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector (query ids given by
    * `queryFilter` over the same table). Returns
    * (query_id, neighbor_id, rank) — rank 1 = most similar, self excluded. */
  def bruteForceTopK(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val queries = emb.filter(queryFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 9).desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic coarse centroids: every `stride`-th vector by id order. */
  def centroids(emb: DataFrame, nList: Int): DataFrame = {
    val n = emb.count()
    val stride = math.max(1L, n / nList)
    emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .limit(nList)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
  }

  /** IVF approximate top-k: assign to nearest centroid, probe nProbe lists.
    * Output schema matches bruteForceTopK. */
  def ivfTopK(emb: DataFrame, queryFilter: Column, k: Int,
              nList: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = centroids(emb, nList)
    // assignment: nearest centroid per vector (broadcast centroids; one scan)
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("csim"), 9).desc, col("centroid_id").asc)
    val assigned = emb.join(broadcast(cents))
      .withColumn("csim", cosine(col("embedding"), col("cv")))
      .withColumn("crank", row_number().over(assignW))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("list_id"))
    // query side: top nProbe centroid lists per query
    val queries = emb.filter(queryFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(round(col("qsim"), 9).desc, col("centroid_id").asc)
    val probes = queries.join(broadcast(cents))
      .withColumn("qsim", cosine(col("qv"), col("cv")))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("list_id"))
    // scan only probed lists
    val scored = assigned.join(probes, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cosine"), 9).desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }
}
