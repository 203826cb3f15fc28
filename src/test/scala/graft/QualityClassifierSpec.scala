package graft

import org.apache.spark.sql.functions._

import graft.ops.TextStats

/** Hashed-gram linear quality classifier: value parity of the native
  * one-pass expression against an independent Spark-built-in construction
  * (explode + weight-table join + per-doc sum), gram-count arithmetic, and
  * twin equality. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("native expression matches the explode + join + sum formulation") {
    val F = 1024
    val weights = Array.tabulate(F)(j => ((j * 37) % 2001) - 1000)
    val native = TextStats.qualityClassifier(docs, weights).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    val wdf = weights.zipWithIndex.map { case (w, j) => (j.toLong, w.toLong) }
      .toSeq.toDF("bucket", "w")
    val toksDf = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val want = toksDf
      .select(col("doc_id"),
        explode(when(size(col("toks")) >= 2,
          concat(col("toks"),
            expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i+1]))")))
          .otherwise(col("toks"))).as("g"))
      .select(col("doc_id"), pmod(xxhash64(col("g")), lit(F.toLong)).as("bucket"))
      .join(wdf, Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w")).as("logit"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(2) > 0))).toMap
    assert(native === want)
    // sanity: real work happened and both classes occur
    assert(native.nonEmpty)
    assert(native.values.exists(_._3) && native.values.exists(!_._3))
  }

  test("n_grams is 2 * n_tokens - 1") {
    val joined = TextStats.qualityClassifier(docs, TextStats.classifierWeights(1 << 10))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt")), Seq("doc_id"))
    assert(joined.filter(col("n_grams") =!= col("nt") * 2 - 1).count() === 0L)
  }

  test("edge cases: empty text and single token") {
    val w = Array.tabulate(64)(j => j - 32)
    val out = TextStats.qualityClassifier(
      Seq((1L, ""), (2L, "solo")).toDF("doc_id", "text"), w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def wt(g: String): Long =
      w(Math.floorMod(functions.Xxh64.hashString(g, functions.Xxh64.SparkSeed), 64L).toInt).toLong
    assert(out(1L) === ((1L, wt(""))))
    assert(out(2L) === ((1L, wt("solo"))))
  }

  test("distributed query matches the sequential twin") {
    val got = SparkEntry.queries("q77_quality_classifier")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    val twin = golden.SequentialTwin.q77QualityClassifier(
      docs.select("doc_id", "text", "lang", "source")
        .as[(Long, String, String, String)].collect().sortBy(_._1)
        .map { case (id, t, l, s) => golden.SequentialTwin.Doc(id, t, l, s) }.toSeq)
    assert(got === twin)
  }
}
