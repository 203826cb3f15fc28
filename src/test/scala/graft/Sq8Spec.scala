package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class Sq8Spec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala twin of the SQ8 encode: same op order (x·127/a, floor). */
  private def twinCode(v: Array[Float]): Option[(Array[Long], Long)] = {
    val d = v.map(_.toDouble)
    val a = d.map(math.abs).max
    if (a == 0.0) None
    else {
      val c = d.map(x => math.floor(x * 127.0 / a).toLong)
      Some((c, c.map(x => x * x).sum))
    }
  }

  /** Sequential twin of the full sq8TopK ranking (round-9 DESC, id ASC). */
  private def twinTopK(vs: Seq[(Long, Array[Float])], qIds: Set[Long],
                       k: Int): Set[(Long, Long, Int)] = {
    val enc = vs.flatMap { case (id, v) => twinCode(v).map(id -> _) }.toMap
    enc.keys.filter(qIds.contains).flatMap { q =>
      val (qc, qs) = enc(q)
      enc.toSeq.filter(_._1 != q).map { case (n, (nc, ns)) =>
        val dot = qc.zip(nc).map { case (a, b) => a * b }.sum
        val sim = dot.toDouble / (math.sqrt(qs.toDouble) * math.sqrt(ns.toDouble))
        val r9 = BigDecimal(sim).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        (n, r9)
      }.sortBy { case (n, r9) => (-r9, n) }.take(k).zipWithIndex
        .map { case ((n, _), i) => (q, n, i + 1) }
    }.toSet
  }

  private val dim = 16
  // deterministic pseudo-random float vectors (incl. negatives)
  private def vec(seed: Long): Array[Float] =
    Array.tabulate(dim) { i =>
      val h = (seed * 31 + i) * -7046029254386353131L + 11L
      ((h % 1000L) / 250.0f)
    }
  private val vectors: Seq[(Long, Array[Float])] =
    (0L until 60L).map(i => i -> vec(i)) :+ (60L -> Array.fill(dim)(0.0f))

  test("sq8Encode == the plain-Scala twin at several partitionings; zero vector excluded") {
    val want = vectors.flatMap { case (id, v) =>
      twinCode(v).map { case (c, s) => (id, c.toSeq, s) }
    }.toSet
    for (parts <- Seq(1, 5)) {
      val df = vectors.toDF("vec_id", "embedding").repartition(parts)
      val got = Similarity.sq8Encode(df).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toSet
      assert(got === want, s"parts=$parts")
      assert(!got.exists(_._1 == 60L), "zero vector must be excluded")
    }
  }

  test("sq8TopK == the sequential ranking twin (both sides of the quantization)") {
    val qIds = (0L until 5L).toSet
    val want = twinTopK(vectors, qIds, 7)
    for (parts <- Seq(1, 4)) {
      val df = vectors.toDF("vec_id", "embedding").repartition(parts)
      val got = Similarity.sq8TopK(df, col("vec_id") < 5, 7).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got === want, s"parts=$parts")
    }
  }

  test("sq8 recall: on separated clusters every quantized neighbor is an exact-cluster member") {
    // three tight clusters far apart: the quantization step (amax/127 ≈
    // 0.08 here) can reshuffle WITHIN-cluster order but cannot flip the
    // cross-cluster gap — every sq8 neighbor must share the query's
    // cluster, exactly like the exact scan's
    val clustered = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val base = Array.tabulate(dim)(j => if (j % 3 == c) 10.0f else 0.1f)
      i -> base.zipWithIndex.map { case (x, j) =>
        x + ((i * 17 + j) % 5) * 0.01f
      }
    }
    val df = clustered.toDF("vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(df, col("vec_id") < 6, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sq8 = Similarity.sq8TopK(df, col("vec_id") < 6, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sq8.length == exact.length)
    assert(exact.forall { case (q, n) => n % 3 == q % 3 }) // fixture sanity
    assert(sq8.forall { case (q, n) => n % 3 == q % 3 },
      "a quantized neighbor crossed clusters")
  }

  // ---- Matryoshka two-stage ANN ----

  test("matryoshka with a corpus-wide shortlist == bruteForceTopK exactly") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Similarity.matryoshkaTopK(emb, col("vec_id") < 10, 5,
      prefixDims = 16, shortlist = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full === exact, "a corpus-wide shortlist must reduce to the exact scan")
  }

  test("matryoshka recall at prefix 16 / shortlist 50 reported; partition-invariant") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 20, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mrl = Similarity.matryoshkaTopK(emb, col("vec_id") < 20, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pairs = mrl.map(t => (t._1, t._2))
    val recall = exact.count(pairs.contains).toDouble / exact.size
    info(f"matryoshka recall@10 (prefix 16/64 dims, shortlist 50): $recall%.3f")
    assert(mrl.map(_._1).size == 20 && recall > 0.2,
      f"prefix ranker collapsed: recall $recall%.3f")
    val repart = Similarity.matryoshkaTopK(emb.repartition(7), col("vec_id") < 20, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(repart === mrl)
  }

  test("matryoshka plan: no Window, two k-heap stages, query sides broadcast") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = Similarity.matryoshkaTopK(emb, col("vec_id") < 5, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ranking must not use a window")
    assert(plan.contains("ObjectHashAggregate"), "k-heap aggregates expected")
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      "query sides must broadcast")
  }

  test("sq8 plan: no Window, k-heap aggregate, query side broadcast") {
    val dir = java.nio.file.Files.createTempDirectory("sq8plan").toString
    vectors.toDF("vec_id", "embedding").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val plan = Similarity.sq8TopK(df, col("vec_id") < 5, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "ranking must not use a window")
    assert(plan.contains("ObjectHashAggregate"), "k-heap aggregate expected")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "query side must broadcast")
  }
}
