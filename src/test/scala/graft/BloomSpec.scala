package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomHash, GraftFunctions, Xxh64}
import graft.ops.{Bloom, Dedup}

/** Bloom-filter dedup: formula parity, no-false-negatives, exactness at
  * large m, and deterministic (partition-invariant) false positives at
  * tiny m. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("bloom_positions matches the documented double-hashing formula") {
    val keys = Seq("", "a", "hello world", "danda।token", "é世界")
    val m = 1L << 12
    val got = keys.toDF("k")
      .select(GraftFunctions.bloom_positions(col("k"), m, 5, 42L))
      .as[Seq[Long]].collect()
    keys.zip(got).foreach { case (s, ps) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h1 = Xxh64.hashBytes(b, 42L)
      val h2 = Xxh64.hashBytes(b, 43L)
      val want = (0 until 5).map(i => java.lang.Math.floorMod(h1 + i.toLong * h2, m))
      assert(ps === want, s"key '$s'")
      assert(ps === BloomHash.positions(b, m, 5, 42L).toSeq)
    }
  }

  test("no false negatives: every inserted key is contained") {
    val keys = (0 until 2000).map(i => s"key-$i-${i * i}").toDF("k")
    val bits = Bloom.build(keys, "k", mBits = 1L << 16, k = 5, seed = 42L)
    val missed = keys.filter(!Bloom.contains(col("k"), bits, 5, 42L)).count()
    assert(missed === 0L)
  }

  test("dedupAgainst at large m equals the exact anti-membership dedup") {
    val base = Dedup.syntheticParagraphs(docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0))
    val incoming = Dedup.syntheticParagraphs(docs.filter(pmod(col("doc_id"), lit(3L)) === 0))
    val got = Bloom.dedupAgainst(base, incoming).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

    // Independent exact construction: paragraph set membership via collect.
    val baseParas = base.select(explode(split(col("text"), "\n")).as("p"))
      .as[String].collect().toSet
    val want = incoming.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, text) =>
        val ps = text.split("\n", -1).toSeq
        val kept = ps.filterNot(baseParas.contains)
        id -> ((ps.size.toLong, (ps.size - kept.size).toLong, kept.mkString("\n")))
      }.toMap
    assert(got === want)
    // the split must actually drop something for this to be a real test
    assert(got.values.map(_._2).sum > 0L)
  }

  test("tiny-m false positives are deterministic and partition-invariant") {
    val base = Dedup.syntheticParagraphs(docs.filter(pmod(col("doc_id"), lit(3L)) =!= 0))
    val incoming = Dedup.syntheticParagraphs(docs.filter(pmod(col("doc_id"), lit(3L)) === 0))
    def run(parts: Int): Map[Long, (Long, Long, String)] =
      Bloom.dedupAgainst(base.repartition(parts), incoming.repartition(parts),
        mBits = 1L << 13, k = 3).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val a = run(1)
    val b = run(7)
    assert(a === b)
    // with m = 8192 bits the base load forces real false positives: the
    // tiny-m run must over-drop strictly more than the exact-equivalent run
    val exact = Bloom.dedupAgainst(base, incoming).collect()
      .map(r => r.getLong(2)).sum
    assert(a.values.map(_._2).sum > exact)
  }

  test("distributed query matches the sequential twin") {
    val got = SparkEntry.queries("q76_bloom_dedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    val twin = golden.SequentialTwin.q76BloomDedup(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .as[(Long, String, String, String)].collect().sortBy(_._1)
        .map { case (id, t, l, s) => golden.SequentialTwin.Doc(id, t, l, s) }.toSeq)
    assert(got === twin)
  }
}
