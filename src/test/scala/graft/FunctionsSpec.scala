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

  test("MinhashSigs expression == transform/aggregate HOF signatures") {
    import spark.implicits._
    val numHashes = 32
    val texts = Seq("a b c d e f g", "w1 w2 w3 w4 w5 w6 w7 w8 w9",
      "same same same same", "ünïcödé danda। tokens here x")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", graft.ops.Dedup.shinglesFromTokens(col("toks"), 3))
      .filter(size(col("sh")) > 0)
    val rows = df.select(col("id"),
        GraftFunctions.minhash_sigs(col("sh"), numHashes).as("native"),
        transform(sequence(lit(0), lit(numHashes - 1)), i =>
          aggregate(col("sh"), lit(Long.MaxValue),
            (acc, s) => least(acc, xxhash64(i, s)))).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("WordShingles expression == HOF transform/concat_ws/array_distinct") {
    import spark.implicits._
    val texts = Seq("a b c d e f g", "a b", "a b c", "same same same same same",
      "ünï danda। x y z", "one", "", "p q p q p q p q")
    for (n <- Seq(2, 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .withColumn("toks", split(col("text"), " "))
      val hof = array_distinct(
        when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws("", (0 until n).map(k => element_at(col("toks"), i + k)): _*)))
          .otherwise(array().cast("array<string>")))
      val rows = df.select(col("id"),
          GraftFunctions.word_shingles(col("toks"), n).as("native"), hof.as("hof"))
        .collect()
      rows.foreach(r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"n=$n id=${r.getLong(0)}"))
    }
  }

  test("Simhash64 expression == HOF bit-vote simhash (incl. empty tokens)") {
    import spark.implicits._
    val texts = Seq("a b c", "", "one", "x  y", "trailing ", (1 to 40).map("t" + _).mkString(" "))
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"),
        GraftFunctions.simhash64(col("text")).as("native"),
        expr("aggregate(transform(sequence(0, 63), b -> " +
          "IF(aggregate(transform(split(text, ' '), t -> xxhash64(t)), 0L, " +
          "(acc, h) -> acc + IF((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0, " +
          "shiftleft(1L, b), 0L)), 0L, (a, v) -> a | v)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }

  test("SignLshBits expression == per-plane zip_with/aggregate HOF bits") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val dim = 16
    val planeW: Array[Array[Float]] = Array.tabulate(8)(p =>
      Array.tabulate(dim)(i => if ((p + i) % 2 == 0) 1f else -1f))
    val vecs = (1L to 40L).map(i => (i, Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)))
    val hofBits = array(planeW.toSeq.map { w =>
      when(aggregate(zip_with(col("v"), typedLit(w.toSeq), (x, wv) => x * wv),
        lit(0.0d), (acc, x) => acc + x) > 0, lit(1)).otherwise(lit(0))
    }: _*)
    val rows = vecs.toDF("id", "v")
      .select(col("id"),
        GraftFunctions.signlsh_bits(col("v"), planeW).as("native"), hofBits.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id=${r.getLong(0)}"))
  }

  test("SignLshBits fails loudly on a ragged embedding table (dim != plane width)") {
    import spark.implicits._
    val planeW: Array[Array[Float]] = Array.tabulate(4)(p => Array.fill(8)(if (p % 2 == 0) 1f else -1f))
    val vecs = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(5)(0.5f))) // row 2 is ragged
    val err = intercept[Exception] {
      vecs.toDF("id", "v").select(GraftFunctions.signlsh_bits(col("v"), planeW)).collect()
    }
    // Spark wraps executor exceptions; the root message must name the mismatch
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m => m.contains("signlsh_bits") && m.contains("5")), messages(err))
  }

  test("ExcisePositions expression == per-token filter/array_contains HOF") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 60L).map { id =>
      val n = rnd.nextInt(30)
      val toks = Array.tabulate(n)(i => s"t$i")
      // sorted positions incl. duplicates and out-of-range entries
      val rem = (Seq.fill(rnd.nextInt(8))(rnd.nextInt(n + 4) - 2) ++
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(math.max(1, n)))).sorted
      (id, toks.toSeq, rem)
    }
    val got = rows.toDF("id", "toks", "removed")
      .select(col("id"),
        GraftFunctions.excise_positions(col("toks"), col("removed")).as("native"),
        filter(col("toks"), (_, i) => !array_contains(col("removed"), i)).as("hof"))
      .collect()
    got.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getLong(0)}"))
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

  test("CharNgrams expression == HOF transform/substring (non-distinct, in order)") {
    import spark.implicits._
    val texts = Seq("abcdef", "ab", "abc", "aaaa", "ünïcödé±", "", "x")
    for (n <- Seq(2, 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val hof2 = when(length(col("text")) >= n,
        transform(sequence(lit(1), length(col("text")) - (n - 1)),
          i => col("text").substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
      val rows = df.select(col("id"),
          GraftFunctions.char_ngrams(col("text"), n).as("native"), hof2.as("hof"))
        .collect()
      rows.foreach(r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"n=$n id=${r.getLong(0)}"))
    }
  }

  test("WordNgrams expression == HOF transform/slice/concat_ws (all occurrences, in order)") {
    import spark.implicits._
    val texts = Seq("a b c a b c", "x", "", " ", "a  b", "  ", "single",
      "é ü 漢 字 test", "w1 w2 w3 w4 w5", "a b a b a b")
    for (n <- Seq(1, 2, 3, 5)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val toks = split(col("text"), " ")
      val hof = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val rows = df.select(col("id"),
        GraftFunctions.word_ngrams(col("text"), n).as("native"), hof.as("hof"))
        .collect()
      rows.foreach(r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)}: ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}"))
    }
  }

  test("TopNgramCount expression == explode/groupBy/max formulation") {
    import spark.implicits._
    val texts = Seq("a b a b a", "x", "", "s s s s", "p q r", "a a b b a a b b")
    for (n <- Seq(1, 2, 3)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .withColumn("toks", split(col("text"), " "))
      val native = df.select(col("id"),
        GraftFunctions.top_ngram_count(col("toks"), n).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val grams = df.select(col("id"), explode(
        when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(k => element_at(col("toks"), i + k)): _*)))
          .otherwise(array().cast("array<string>"))).as("g"))
      val viaAgg = grams.groupBy(col("id"), col("g")).count()
        .groupBy(col("id")).agg(max(col("count")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.indices.foreach { i =>
        assert(native(i.toLong) == viaAgg.getOrElse(i.toLong, 0L), s"n=$n id=$i")
      }
    }
  }

  test("char_ngrams/top_ngram_count stay inside whole-stage codegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(GraftFunctions.top_ngram_count(split(col("text"), " "), 2).as("c"),
        size(GraftFunctions.char_ngrams(col("text"), 3)).as("g"))
      .filter(col("c") >= 0L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p.take(800))
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(800))
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
