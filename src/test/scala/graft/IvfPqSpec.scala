package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Composed IVF-PQ: twin equality, recall vs the exact scan AND vs flat
  * PQ (the probe-miss decomposition), partition invariance, plan shape. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def asTuples(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("distributed IVF-PQ matches the sequential twin; partition-invariant") {
    val got = asTuples(SparkEntry.queries("q173_ann_ivf_pq")(spark, sfDir))
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val twin = golden.SequentialTwin.q173IvfPqTopK(vecs).toSet
    assert(got === twin)
    val repart = asTuples(Similarity.ivfPqTopK(emb.repartition(7), col("vec_id") < 20, 10))
    assert(repart === got)
  }

  test("IVF-PQ results are a probe-filtered subset of flat PQ; recall vs exact reported") {
    // every IVF-PQ hit must also be a flat-PQ candidate with the SAME ADC
    // score (same codes, no residual re-encoding) — so the neighbor set is
    // a subset of what the flat scan would admit; ranks can only move up
    val flat = asTuples(Similarity.pqTopK(emb, col("vec_id") < 20, 10))
    val ivf = asTuples(Similarity.ivfPqTopK(emb, col("vec_id") < 20, 10))
    val flatPairs = flat.map(t => (t._1, t._2))
    val recallVsFlat = ivf.count(t => flatPairs.contains((t._1, t._2))).toDouble / ivf.size
    val exact = asTuples(Similarity.bruteForceTopK(emb, col("vec_id") < 20, 10))
      .map(t => (t._1, t._2))
    val ivfPairs = ivf.map(t => (t._1, t._2))
    val recallVsExact = exact.count(ivfPairs.contains).toDouble / exact.size
    val flatVsExact = exact.count(flatPairs.contains).toDouble / exact.size
    info(f"recall@10 vs exact: ivf-pq $recallVsExact%.3f, flat pq $flatVsExact%.3f; " +
      f"ivf-pq pairs also in flat pq: $recallVsFlat%.3f")
    // flat PQ's recall on this near-iid corpus is itself the quantization
    // floor; the coarse probe should cost little beyond it
    assert(recallVsExact >= flatVsExact - 0.25,
      f"probe miss rate too high: ivf-pq $recallVsExact%.3f vs flat $flatVsExact%.3f")
    assert(ivf.nonEmpty && ivf.map(_._1).size == 20)
  }

  test("plan: no window, no exchange on list_id, probes broadcast, partial k-heap agg") {
    val p = Similarity.ivfPqTopK(emb, col("vec_id") < 20, 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.linesIterator.exists(_.trim.matches("\\(\\d+\\) Window")), p.take(3000))
    assert(!p.contains("hashpartitioning(list_id"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2, p.take(3000))
  }

  test("empty input returns empty result with the ANN schema") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Similarity.ivfPqTopK(emptyEmb, col("vec_id") < 5, 10)
    assert(out.columns.toSeq == Seq("query_id", "neighbor_id", "rank") && out.count() == 0)
  }
}
