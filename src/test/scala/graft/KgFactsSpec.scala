package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.kg.Triples

class KgFactsSpec extends SparkSpec {

  private def rawTriples(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong % 7, s"p${i % 3}", (i.toLong % 5) + 100L, s"lang${i % 2}",
        s"http://host${i % 11}/page${i % 29}", i % 4)
    }.toDF("subj", "pred", "obj", "lang", "url", "sentIdx")
  }

  private def collectFacts(df: DataFrame): Map[(Long, String, Long, String), (Long, Long)] = {
    import spark.implicits._
    df.select(col("subj"), col("pred"), col("obj"), col("lang"),
        col("n_mentions"), col("est_urls"))
      .as[(Long, String, Long, String, Long, Long)].collect()
      .map { case (s, p, o, l, n, u) => (s, p, o, l) -> ((n, u)) }.toMap
  }

  test("upsert of two snapshots equals aggregating the union (exact regime)") {
    val tr = rawTriples(500)
    val a = tr.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val b = tr.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val merged = collectFacts(Triples.upsertFacts(Triples.facts(a), Triples.facts(b)))
    val direct = collectFacts(Triples.facts(tr))
    assert(merged == direct)
  }

  test("est_urls is the exact distinct-url count below saturation") {
    import spark.implicits._
    val got = collectFacts(Triples.facts(rawTriples(500)))
    val expected = rawTriples(500)
      .groupBy("subj", "pred", "obj", "lang")
      .agg(count(lit(1)).as("n"), countDistinct(col("url")).as("u"))
      .as[(Long, String, Long, String, Long, Long)].collect()
      .map { case (s, p, o, l, n, u) => (s, p, o, l) -> ((n, u)) }.toMap
    assert(got == expected)
  }

  test("snapshot merge stays consistent PAST saturation (tiny k): sketches equal the direct sketch") {
    import spark.implicits._
    val tr = rawTriples(600)
    val a = tr.filter(col("sentIdx") < 2)
    val b = tr.filter(col("sentIdx") >= 2)
    val k = 4
    def sketches(df: DataFrame) =
      df.select(col("subj"), col("pred"), col("obj"), col("lang"),
          col("n_mentions"), col("est_urls"), col("url_sketch"))
        .as[(Long, String, Long, String, Long, Long, Array[Long])].collect()
        .map(r => (r._1, r._2, r._3, r._4) -> ((r._5, r._6, r._7.toSeq))).toMap
    val merged = sketches(Triples.upsertFacts(Triples.facts(a, k), Triples.facts(b, k), k))
    val direct = sketches(Triples.facts(tr, k))
    assert(merged == direct)
  }

  test("upsert is order-insensitive") {
    val tr = rawTriples(300)
    val a = tr.filter(pmod(xxhash64(col("url")), lit(2)) === 0)
    val b = tr.filter(pmod(xxhash64(col("url")), lit(2)) === 1)
    val ab = collectFacts(Triples.upsertFacts(Triples.facts(a), Triples.facts(b)))
    val ba = collectFacts(Triples.upsertFacts(Triples.facts(b), Triples.facts(a)))
    assert(ab == ba)
  }
}
