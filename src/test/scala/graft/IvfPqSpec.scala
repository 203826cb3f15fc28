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

  // ---- residual IVF-PQ ----

  test("residual IVF-PQ matches the sequential residual twin; partition-invariant") {
    val got = asTuples(SparkEntry.queries("q196_ann_ivf_pq_residual")(spark, sfDir))
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val twin = golden.SequentialTwin.q196IvfPqResidual(vecs).toSet
    assert(got === twin)
    val repart = asTuples(Similarity.ivfPqResidualTopK(emb.repartition(7),
      col("vec_id") < 20, 10))
    assert(repart === got)
  }

  test("residual codes beat raw codes: recall vs exact reported for both encodings") {
    val exact = asTuples(Similarity.bruteForceTopK(emb, col("vec_id") < 20, 10))
      .map(t => (t._1, t._2))
    val raw = asTuples(Similarity.ivfPqTopK(emb, col("vec_id") < 20, 10))
      .map(t => (t._1, t._2))
    val res = asTuples(Similarity.ivfPqResidualTopK(emb, col("vec_id") < 20, 10))
      .map(t => (t._1, t._2))
    val rRaw = exact.count(raw.contains).toDouble / exact.size
    val rRes = exact.count(res.contains).toDouble / exact.size
    info(f"recall@10 vs exact: residual ivf-pq $rRes%.3f, raw-code ivf-pq $rRaw%.3f")
    // residual coding spends the byte budget on within-list detail; it
    // must not lose to raw codes by more than noise on this corpus
    assert(rRes >= rRaw - 0.05,
      f"residual coding should not trail raw codes: $rRes%.3f vs $rRaw%.3f")
    assert(res.nonEmpty && res.map(_._1).size == 20)
  }

  test("residual plan: no window, no exchange on list_id, probes broadcast, partial k-heap agg") {
    val p = Similarity.ivfPqResidualTopK(emb, col("vec_id") < 20, 10)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.linesIterator.exists(_.trim.matches("\\(\\d+\\) Window")), p.take(3000))
    assert(!p.contains("hashpartitioning(list_id"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2, p.take(3000))
  }

  test("residual empty input returns empty result with the ANN schema") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Similarity.ivfPqResidualTopK(emptyEmb, col("vec_id") < 5, 10)
    assert(out.columns.toSeq == Seq("query_id", "neighbor_id", "rank") && out.count() == 0)
  }

  // ---- mutual-kNN graph ----

  private def asPairs(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet

  test("mutualize hand case: asymmetric top-k pairs (the hub) drop, mutual pairs keep both ranks") {
    val ranked = Seq(
      (1L, 2L, 1), (2L, 1L, 2), // mutual, asymmetric ranks
      (2L, 3L, 1), (3L, 2L, 1), // mutual
      (4L, 2L, 1)               // 4 ranks the hub 2, hub never ranks 4 back
    ).toDF("query_id", "neighbor_id", "rank")
    assert(asPairs(Similarity.mutualize(ranked)) ===
      Set((1L, 2L, 1, 2), (2L, 3L, 1, 1)))
  }

  test("mutual-kNN at full probes == mutualize(bruteForceTopK); partition-invariant; salt-invariant") {
    val full = asPairs(Similarity.mutualKnn(emb, k = 10, nList = 16, nProbe = 16))
    val brute = asPairs(Similarity.mutualize(
      Similarity.bruteForceTopK(emb, lit(true), 10)))
    assert(full === brute)
    assert(full.nonEmpty)
    assert(full.forall(t => t._1 < t._2 &&
      t._3 >= 1 && t._3 <= 10 && t._4 >= 1 && t._4 <= 10))
    val repart = asPairs(Similarity.mutualKnn(emb.repartition(7), 10, 16, 16))
    assert(repart === full)
    val salted = asPairs(Similarity.mutualKnn(emb, 10, 16, 16, saltIn = 5))
    assert(salted === full)
  }

  test("pruned mutual-kNN pairs are mutual within their OWN ranked relation") {
    // nProbe < nList trades recall; the output must still be internally
    // consistent: every emitted pair is mutual under the pruned ranker
    val pruned = asPairs(Similarity.mutualKnn(emb, 10, 16, 4))
    assert(pruned.forall(t => t._1 < t._2))
    // recall vs the exact mutual graph, reported (coarse-quantizer loss)
    val exact = asPairs(Similarity.mutualKnn(emb, 10, 16, 16))
      .map(t => (t._1, t._2))
    val prunedPairs = pruned.map(t => (t._1, t._2))
    val recall = exact.count(prunedPairs.contains).toDouble / math.max(1, exact.size)
    info(f"mutual-kNN recall at nProbe=4/16: $recall%.3f (${pruned.size} of ${exact.size} pairs)")
  }

  test("plan: mutual-kNN has no window, no cartesian, every list_id exchange salted") {
    val p = Similarity.mutualKnn(emb, 10, 16, 4)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.linesIterator.exists(_.trim.matches("\\(\\d+\\) Window")), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the candidate join may key on list_id only WITH the salt slice —
    // never on the nList-valued list_id alone (parallelism cap + skew)
    val listParts = p.linesIterator.filter(_.contains("hashpartitioning(list_id")).toSeq
    assert(listParts.forall(_.contains("slice")), listParts.mkString("\n"))
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2, p.take(3000))
  }
}
