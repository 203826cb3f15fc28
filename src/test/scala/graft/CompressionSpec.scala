package graft

import graft.ops.TextStats

class CompressionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the " * 500),                                   // pure template
    (1L, (0 until 400).map(i => s"w${i * 7919 % 9973}").mkString(" ")), // high-entropy prose proxy
    (2L, ""),                                             // empty: defined incompressible
    (3L, "short text"))

  test("compressionProfile == the twin's own Deflater walk at 2 partitionings") {
    val want = golden.SequentialTwin.q199CompressionProfile(
      docs.map { case (id, t) => golden.SequentialTwin.Doc(id, t, "en", "s") }).toSet
    for (parts <- Seq(1, 3)) {
      val got = TextStats.compressionProfile(
        docs.toDF("doc_id", "text").repartition(parts)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).toSet
      assert(got === want, s"parts=$parts")
    }
  }

  test("the template doc is flagged, the high-entropy doc survives, empty is incompressible") {
    val got = TextStats.compressionProfile(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    assert(!got(0L)._2 && got(0L)._1 < 100L,
      s"'the'x500 must compress to under 10%: ${got(0L)}")
    assert(got(1L)._2, s"high-entropy text must survive: ${got(1L)}")
    assert(got(2L) === ((1000L, true)), "empty text: ratio 1000 by definition")
  }

  test("plan: zero shuffle — one codegen'd projection pass") {
    val dir = java.nio.file.Files.createTempDirectory("cmp_plan").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val plan = TextStats.compressionProfile(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "no shuffle expected")
    assert(plan.contains("deflate_len"), "native expression expected")
  }
}
