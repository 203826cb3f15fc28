package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.gen.CorpusGen
import graft.ops.TextStats
import graft.text.TextExtract

class FunctionsSpec extends SparkSpec {

  test("ExtractText expression == TextExtract.extractText, null-safe") {
    import spark.implicits._
    val html1 = CorpusGen.htmlFor(1L, "alpha beta & <gamma>", "en", "s")
    val df = Seq((1L, html1), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "html")
      .select(col("id"), GraftFunctions.extract_text(col("html")).as("txt"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getString(1) == TextExtract.extractText(html1))
    assert(rows(1).isNullAt(1))
  }

  test("Fingerprint64 expression == TextStats.fingerprint64") {
    import spark.implicits._
    val texts = Seq("hello world", "", "x", "the fast key order")
    val got = texts.toDF("text")
      .select(col("text"), GraftFunctions.fingerprint64(col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach(t => assert(got(t) == TextStats.fingerprint64(t), t))
  }

  test("SQL registration: extract_text / fingerprint64 callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT fingerprint64('abc') AS fp, extract_text(encode('<p>hi</p>', 'UTF-8')) AS txt").head()
    assert(r.getLong(0) == TextStats.fingerprint64("abc"))
    assert(r.getString(1) == "hi")
  }

  test("CosineSim expression == HOF cosine, bit-identical, inside codegen") {
    import spark.implicits._
    val rng = new scala.util.Random(99)
    val vecs = (1L to 50L).map(i =>
      (i, Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat),
          Array.fill(64)((rng.nextDouble() * 2 - 1).toFloat)))
    val df = vecs.toDF("id", "a", "b")
    val rows = df.select(col("id"),
        graft.ops.Similarity.cosine(col("a"), col("b")).as("native"),
        graft.ops.Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"id=${r.getLong(0)}")
    }
    // and it participates in whole-stage codegen from a file-backed source
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select(graft.ops.Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .filter(col("c") > 0.5)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p.take(800))
    assert(p.contains("cosine_sim"), p.take(800))
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(800))
  }

  test("native expressions stay inside whole-stage codegen (no ScalaUDF)") {
    // parquet-backed source so ConvertToLocalRelation can't constant-fold
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.fingerprint64(col("text")).as("fp"))
      .filter(col("fp") =!= 0L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p)
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(800))
    assert(p.contains("fingerprint64"), p.take(800))
  }

  test("type checking rejects wrong input types") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(GraftFunctions.extract_text(col("x"))).collect()
    }
    assert(err.getMessage.contains("extract_text") || err.getMessage.contains("DATATYPE"),
      err.getMessage.take(300))
  }
}
