package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Product quantization: twin equality, code shape/compression,
  * partition invariance, recall against the exact scan, loud dim
  * mismatch. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def asTuples(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("distributed PQ top-k matches the sequential twin") {
    val got = asTuples(SparkEntry.queries("q78_ann_pq")(spark, sfDir))
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val twin = golden.SequentialTwin.q78PqTopK(vecs).toSet
    assert(got === twin)
  }

  test("codes are m one-byte sub-indices below nCodes; ranking is partition-invariant") {
    val books = Similarity.pqCodebooks(emb, m = 8, nCodes = 16)
    assert(books.length === 8 && books.forall(_.length === 16) &&
      books.forall(_.forall(_.length === 8)))
    val codes = emb.select(
      graft.functions.GraftFunctions.pq_encode(col("embedding"), books).as("code"))
      .as[Array[Byte]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(b => (b & 0xFF) < 16)))

    val a = asTuples(Similarity.pqTopK(emb.repartition(1), col("vec_id") < 20, 10))
    val b = asTuples(Similarity.pqTopK(emb.repartition(7), col("vec_id") < 20, 10))
    assert(a === b)
  }

  test("planted near-duplicates rank in the ADC top-10 (recall on real structure)") {
    // The sf corpus embeddings are near-iid — cosine gaps between arbitrary
    // vectors are tiny there, and sub-centroid reconstruction can't rank a
    // contest the exact scores barely decide (measured recall@10 ~0.27 on
    // that noise floor). PQ's job is finding GENUINELY close neighbors, so
    // plant one per query: a copy of each query vector with its first
    // component nudged 1%. Its code is (almost always) the query's own
    // code — the top achievable ADC score.
    val planted = emb.select(col("vec_id"), col("embedding"))
      .unionByName(
        emb.filter(col("vec_id") < 20).select(
          (col("vec_id") + 10000L).as("vec_id"),
          concat(
            array((element_at(col("embedding"), 1) * lit(1.01f)).cast("float")),
            slice(col("embedding"), 2, 63)).as("embedding")))
    val top = asTuples(Similarity.pqTopK(planted, col("vec_id") < 20, 10))
    val hits = (0L until 20L).count(q => top.contains((q, q + 10000L, 1)) ||
      top.exists(t => t._1 == q && t._2 == q + 10000L))
    assert(hits >= 18, s"planted twin found for only $hits/20 queries")
  }

  test("fused multi-quantizer training is bit-identical to standalone runs") {
    // the fusion changes SCHEDULING only (one corpus pass per iteration
    // for all quantizers): every per-quantizer codebook must equal the
    // one kmeansCodebook trains alone over the sliced column, float for
    // float — coarse cosine level and L2 sub-books alike
    import Similarity.SubQ
    val fused = Similarity.kmeansCodebooksFused(emb, Seq(
      SubQ(-1, 0, 64, 16, l2 = false),
      SubQ(0, 0, 8, 16, l2 = true),
      SubQ(5, 40, 8, 16, l2 = true)), iters = 3, fanout = 16)
    val coarse = Similarity.kmeansCodebook(emb, 16, 3, 16)
    assert(fused(-1).map(_.id).toSeq === coarse.map(_.id).toSeq)
    assert(fused(-1).map(_.v.toSeq).toSeq === coarse.map(_.v.toSeq).toSeq)
    for (s <- Seq(0, 5)) {
      val sub = emb.select(col("vec_id"),
        slice(col("embedding"), s * 8 + 1, 8).as("embedding"))
      val alone = Similarity.kmeansCodebook(sub, 16, 3, 16, metric = "l2")
      assert(fused(s).map(_.id).toSeq === alone.map(_.id).toSeq, s"sub $s ids")
      assert(fused(s).map(_.v.toSeq).toSeq === alone.map(_.v.toSeq).toSeq,
        s"sub $s centroids diverge from the standalone training")
    }
  }

  test("dimension mismatch fails loudly") {
    val books = Similarity.pqCodebooks(emb, m = 8, nCodes = 16)
    val ragged = Seq((1L, Array.fill(32)(0.5f))).toDF("vec_id", "embedding")
    // LocalRelation inputs constant-fold driver-side, so the throw may
    // surface raw rather than wrapped in a SparkException
    val ex = intercept[Exception] {
      ragged.select(graft.functions.GraftFunctions.pq_encode(col("embedding"), books)).collect()
    }
    assert(ex.toString.contains("pq_encode") ||
      Option(ex.getCause).exists(_.toString.contains("pq_encode")), ex.toString)
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(emb, m = 7)
    }
  }
}
