package graft

import graft.golden.SequentialTwin
import graft.functions.Xxh64
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/**
 * The sequential-twin equivalences the golden fixtures rest on:
 *  - Xxh64 (independent XXH64 from the public spec) == Spark's xxhash64
 *    for strings / ints / longs / chained args;
 *  - SequentialTwin.sparkRound == Spark's round(col, n);
 *  - twin simhash / sign-LSH == the distributed operators on a live corpus;
 *  - multi-band embeddingNearDup recall >= 0.95 on PLANTED near-duplicates;
 *  - idPairsFromBuckets drops degenerate hot buckets loudly and boundedly.
 */
class GoldenTwinSpec extends SparkSpec {

  private val rng = new scala.util.Random(20260816L)

  test("Xxh64 matches Spark xxhash64: strings of every length class") {
    import spark.implicits._
    val strings = Seq("", "a", "abc", "abcdefg", "abcdefgh", "12345678901234567890123456789012",
      "x" * 100, "danda।mixed ünïcödé € text", "plane3:17") ++
      (1 to 50).map(_ => rng.alphanumeric.take(rng.nextInt(80)).mkString)
    val sparkHashes = strings.toDF("s").select(col("s"), xxhash64(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strings.foreach { s =>
      assert(Xxh64.hashString(s, Xxh64.SparkSeed) == sparkHashes(s), s"string '$s'")
    }
  }

  test("Xxh64 matches Spark xxhash64: ints, longs, chained multi-arg") {
    import spark.implicits._
    val pairs = (1 to 40).map(_ => (rng.nextInt(), rng.nextLong()))
    val rows = pairs.toDF("i", "l")
      .select(xxhash64(col("i")), xxhash64(col("l")), xxhash64(col("i"), col("l")),
        xxhash64(lit("seed"), col("i")))
      .collect()
    pairs.zip(rows).foreach { case ((i, l), r) =>
      assert(Xxh64.hashInt(i, Xxh64.SparkSeed) == r.getLong(0))
      assert(Xxh64.hashLong(l, Xxh64.SparkSeed) == r.getLong(1))
      // Seq[Any]: Seq(i, l) would numerically widen the Int to Long
      assert(Xxh64.sparkChain(Seq[Any](i, l)) == r.getLong(2))
      assert(Xxh64.sparkChain(Seq[Any]("seed", i)) == r.getLong(3))
    }
  }

  test("perl-table chunker == production Bioes.spans (property + adversarial)") {
    import graft.golden.PerlChunker
    import graft.ner.Bioes
    val prefixes = Seq("B", "I", "E", "S", "O")
    val types = Seq("PER", "LOC", "ORG")
    def randomTag(): String = {
      val p = prefixes(rng.nextInt(prefixes.length))
      if (p == "O") "O"
      else if (rng.nextInt(10) == 0) types(rng.nextInt(types.length)) // bare raw tag
      else s"$p-${types(rng.nextInt(types.length))}"
    }
    // random sequences cover the transition space; exhaustive pairs cover
    // every table row (incl. same/different type on each side)
    for (_ <- 1 to 300) {
      val tags = IndexedSeq.fill(1 + rng.nextInt(12))(randomTag())
      assert(PerlChunker.spans(tags) == Bioes.spans(tags), tags)
    }
    val allTags = (for (p <- prefixes.filterNot(_ == "O"); t <- types) yield s"$p-$t") ++
      types ++ Seq("O")
    for (a <- allTags; b <- allTags; c <- Seq("O", "I-PER")) {
      val tags = IndexedSeq(a, b, c)
      assert(PerlChunker.spans(tags) == Bioes.spans(tags), tags)
    }
  }

  test("independent generated-page extractor == production on corpus + adversarial text") {
    import spark.implicits._
    import graft.gen.CorpusGen
    import graft.text.TextExtract
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (id, text, lang, source) =>
      val html = CorpusGen.htmlFor(id, text, lang, source)
      assert(SequentialTwin.extractGeneratedPage(html) == TextExtract.extractText(html),
        s"doc $id diverged")
    }
    // adversarial source texts: escaped entities, entity-lookalikes,
    // tabs/NBSP whitespace, danda, unicode
    val nasty = Seq(
      "a < b & c > d", "&lt; literal entity text &amp;amp;", "x &#65; y",
      "tab\tseparated stays one line", "nbsp run  collapses",
      "danda। sentence ünïcödé €", "trailing space ", " leading", "&",
      "a  double  spaced")
    nasty.zipWithIndex.foreach { case (t, i) =>
      val html = CorpusGen.htmlFor(9000L + i, t, "en", "s")
      assert(SequentialTwin.extractGeneratedPage(html) == TextExtract.extractText(html),
        s"adversarial '$t'")
    }
  }

  test("independent sentence splitter == production on corpus + adversarial text") {
    import spark.implicits._
    import graft.gen.CorpusGen
    import graft.text.TextExtract
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect()
    assert(docs.nonEmpty)
    docs.foreach { case (id, text, lang, source) =>
      val extracted = TextExtract.extractText(CorpusGen.htmlFor(id, text, lang, source))
      assert(SequentialTwin.twinSentences(extracted) == TextExtract.sentences(extracted),
        s"doc $id diverged")
    }
    val nasty = Seq(
      "", "one", "a b. c", "ends mid sentence", "two. lines.\nmore here",
      "bang! quest? dot. danda। mix", "..", "multi.\n\n\nblank lines", "!",
      "a.b.c inside stays", "\n\nleading blanks", "trail.\n", "token.। both",
      "only। danda", "a ?  b", "x!")
    nasty.foreach { t =>
      assert(SequentialTwin.twinSentences(t) == TextExtract.sentences(t),
        s"adversarial '$t'")
    }
  }

  test("twin alias machinery and stub codec == production (spec re-derivations)") {
    import graft.golden.SequentialTwin
    import graft.link.EntityLink
    import graft.ops.Multimodal
    // strings: corpus tokens + adversarial (empty, unicode, exactly-4/5,
    // trailing-s, surrogate pair)
    val strings = Seq("", "s", "ss", "cats", "catss", "words", "word",
      "élèves", "😀abc", "abcd", "abcde", "a b",
      "danda।") ++
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text").collect().flatMap(_.getString(0).split(' ')).distinct.take(200)
    strings.foreach { s =>
      assert(SequentialTwin.twinStem(s) == EntityLink.stem(s), s"stem($s)")
      assert(SequentialTwin.twinPrefixStem(s) == EntityLink.prefixStem(s), s"prefixStem($s)")
      assert(SequentialTwin.twinEntityId(s) == EntityLink.entityId(s), s"entityId($s)")
    }
    // stub codec: adversarial blobs (empty, all 0x00, all 0xFF — the
    // sign-extension case — and corpus-derived bytes)
    val blobs = Seq(Array.empty[Byte], Array.fill(8)(0.toByte),
      Array.fill(8)(0xFF.toByte), Array.tabulate(255)(_.toByte)) ++
      strings.take(40).map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    for (blob <- blobs; mt <- Seq("video/mp4", "audio/wav", "image/jpeg")) {
      val (w, h, f, _) = Multimodal.decodeStub(mt, blob)
      assert(SequentialTwin.twinStubDims(mt, blob) == ((w, h, f)), s"dims($mt)")
      for (box <- Seq(64, 256, 4096)) {
        val (ow, oh, thumb) = Multimodal.resizeStub(blob, w, h, box)
        val (tw, th, tt) = SequentialTwin.twinStubResize(blob, w, h, box)
        assert(tw == ow && th == oh && tt.toSeq == thumb.toSeq, s"resize($mt,$box)")
      }
    }
  }

  test("fingerprint: independent BigInt twin == production, incl. carry-wrap states") {
    import graft.ops.TextStats
    // random + structured strings
    val strings = Seq("", "a", "the fast key order", "ünïcödé danda। €", "￿" * 40) ++
      (1 to 100).map(_ => rng.alphanumeric.take(rng.nextInt(120)).mkString)
    strings.foreach { s =>
      assert(SequentialTwin.fingerprintBigInt(s) == TextStats.fingerprint64(s), s.take(30))
    }
    // adversarial step states where h*257 + c + 1 wraps past 2^64 (the
    // pre-round-3 fold silently dropped the 2^64 ≡ 8 carry there): solve
    // h = (2^64 - delta) * 257^-1 mod 2^64 and keep the ones < 2^61-1
    val M = BigInt(2).pow(61) - 1
    val two64 = BigInt(2).pow(64)
    val inv = BigInt(257).modInverse(two64)
    var wrapsExercised = 0
    for (delta <- 1 to 200000 if wrapsExercised < 20) {
      val h = ((two64 - delta) * inv).mod(two64)
      if (h < M) {
        for (c <- Seq(0, 'z'.toInt, 0xffff)) {
          val expected = ((h * 257 + c + 1).mod(M)).toLong
          assert(TextStats.fpStep(h.toLong, c) == expected, s"h=$h c=$c")
          if (h * 257 % two64 + c + 1 >= two64) wrapsExercised += 1
        }
      }
    }
    assert(wrapsExercised >= 10, s"only $wrapsExercised wrap states exercised")
  }

  test("sparkRound matches Spark round() at scales 6 and 9") {
    import spark.implicits._
    val xs = (1 to 200).map(_ => (rng.nextDouble() * 2 - 1) * math.pow(10, rng.nextInt(6) - 3))
    val rows = xs.toDF("x").select(round(col("x"), 6), round(col("x"), 9)).collect()
    xs.zip(rows).foreach { case (x, r) =>
      assert(SequentialTwin.sparkRound(x, 6) == r.getDouble(0), s"round6($x)")
      assert(SequentialTwin.sparkRound(x, 9) == r.getDouble(1), s"round9($x)")
    }
  }

  test("twin simhash == distributed simhash; twin near-dup == distributed") {
    import spark.implicits._
    val docs = (1L to 60L).map { i =>
      val toks = (0 until 20).map(k => s"w${(i * 7 + k * 3) % 40}")
      SequentialTwin.Doc(i, toks.mkString(" "), "en", "s")
    }
    val df = docs.map(d => (d.docId, d.text)).toDF("doc_id", "text")
    val sparkSim = Dedup.simhash(df).as[(Long, Long)].collect().toMap
    docs.foreach(d => assert(SequentialTwin.simhash(d.text) == sparkSim(d.docId)))
    val sparkPairs = Dedup.simhashNearDup(df).select("doc1", "doc2", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(SequentialTwin.q29SimhashNearDup(docs).toSet == sparkPairs)
  }

  test("multi-band embeddingNearDup: recall >= 0.95 on planted near-dups, twin-identical") {
    import spark.implicits._
    val dim = 16
    def randVec(): Array[Float] = Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)
    // 40 planted pairs (cosine ~ 0.99+) + 120 background vectors
    val planted = (0 until 40).map { k =>
      val v = randVec()
      val nearDup = v.map(x => x + (rng.nextDouble() * 0.02 - 0.01).toFloat)
      (2000L + 2 * k, v, 2001L + 2 * k, nearDup)
    }
    val background = (0 until 120).map(k => (3000L + k, randVec()))
    val rows = planted.flatMap { case (i1, v1, i2, v2) => Seq((i1, v1), (i2, v2)) } ++ background
    val df = rows.toDF("vec_id", "embedding")
    val found = Dedup.embeddingNearDup(df, threshold = 0.95)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count { case (i1, _, i2, _) => found.contains((i1, i2)) }.toDouble / planted.size
    info(f"planted near-dup recall: $recall%.3f (${found.size} pairs found)")
    assert(recall >= 0.95, f"recall $recall%.3f < 0.95")
    // and the sequential twin reproduces the operator exactly (incl. cosine rounding)
    val sparkExact = Dedup.embeddingNearDup(df, threshold = 0.95)
      .select(col("v1"), col("v2"), round(col("cosine"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val twin = SequentialTwin.q32EmbeddingNearDup(
      rows.map { case (id, v) => (id, v) }, threshold = 0.95).toSet
    assert(twin == sparkExact)
  }

  test("embeddingNearDup at 50k vectors: 64/4 geometry keeps recall >= 0.95 with ZERO drops; old 16/4 drops everything") {
    import spark.implicits._
    // the round-4 scale defect: 16 planes / 4 bands = 16 bucket values per
    // band, so past ~4k vectors EVERY band-bucket exceeds maxBucket=256 and
    // the operator loudly drops all of them — while the 64/4 default (2^16
    // buckets per band) stays drop-free well past this size
    val dim = 32
    val rng2 = new scala.util.Random(4242)
    def randVec(): Array[Float] = Array.fill(dim)((rng2.nextDouble() * 2 - 1).toFloat)
    val planted = (0 until 100).map { k =>
      val v = randVec()
      val nearDup = v.map(x => x + (rng2.nextDouble() * 0.02 - 0.01).toFloat)
      (1_000_000L + 2 * k, v, 1_000_001L + 2 * k, nearDup)
    }
    val background = (0 until 50_000).map(k => (k.toLong, randVec()))
    val rows = planted.flatMap { case (i1, v1, i2, v2) => Seq((i1, v1), (i2, v2)) } ++ background
    val df = rows.toDF("vec_id", "embedding").repartition(16)

    val found = Dedup.embeddingNearDup(df, threshold = 0.95) // 64/4 default
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = planted.count { case (i1, _, i2, _) => found.contains((i1, i2)) }.toDouble / planted.size
    info(f"50k-vector recall at 64/4: $recall%.3f (${found.size} pairs, drops=${Dedup.lastDropReport("embeddingNearDup")})")
    assert(recall >= 0.95, f"recall $recall%.3f < 0.95 at 50k vectors")
    assert(Dedup.lastDropReport("embeddingNearDup") == ((0L, 0L)),
      s"64/4 must not drop any bucket at 50k vectors: ${Dedup.lastDropReport("embeddingNearDup")}")

    // negative control: the retired 16/4 geometry saturates every bucket
    val old = Dedup.embeddingNearDup(df, threshold = 0.95, planes = 16, bands = 4)
    assert(old.count() == 0, "16/4 at 50k vectors should drop every bucket and find nothing")
    val (dropped, covered) = Dedup.lastDropReport("embeddingNearDup")
    assert(dropped > 0 && covered > 0, s"expected loud drops from 16/4: ($dropped, $covered)")
  }

  test("twin minhash pairs == distributed minhashLsh; dedup clusters are transitive") {
    import spark.implicits._
    // A~B and B~C are near-dups; A~C differs in 2 tokens (may or may not
    // pair) — the CLUSTER must still hold all three; D is unrelated
    val base = (1 to 40).map(i => s"t$i")
    val docs = Seq(
      SequentialTwin.Doc(1L, base.mkString(" "), "en", "s"),
      SequentialTwin.Doc(2L, (base.dropRight(1) :+ "x1").mkString(" "), "en", "s"),
      SequentialTwin.Doc(3L, (base.dropRight(2) :+ "x1" :+ "x2").mkString(" "), "en", "s"),
      SequentialTwin.Doc(4L, (100 to 140).map(i => s"z$i").mkString(" "), "en", "s"))
    val df = docs.map(d => (d.docId, d.text)).toDF("doc_id", "text")
    val sparkPairs = graft.ops.Dedup.minhashLsh(df)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(SequentialTwin.minhashPairs(docs).toSet == sparkPairs)
    val clusters = graft.ops.Dedup.dedupClusters(df).as[(Long, Long)].collect().toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L,
      s"transitive cluster broken: $clusters")
    assert(clusters(4L) == 4L)
    assert(SequentialTwin.q36DedupClusters(docs).toMap == clusters)
  }

  test("twin hash sample == distributed sampleByHash") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => SequentialTwin.Doc(i, s"text $i", "en", "s"))
    val df = docs.map(d => (d.docId, d.text)).toDF("doc_id", "text")
    val sampled = graft.ops.TextStats.sampleByHash(df, col("doc_id"), 37)
      .select("doc_id").as[Long].collect().toSet
    assert(SequentialTwin.q38HashSample(docs, 37).toSet == sampled)
    // deterministic nesting: the 10% sample is a subset of the 37% sample
    val ten = graft.ops.TextStats.sampleByHash(df, col("doc_id"), 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ten.subsetOf(sampled))
    assert(sampled.nonEmpty && sampled.size < 300)
  }

  test("degenerate hot bucket: bounded pair-gen, loud drop, others unaffected") {
    import spark.implicits._
    // 3000 identical docs -> one degenerate bucket per band; plus one cold
    // duplicate pair (shared simhash bucket) that must survive
    val degenerate = (1L to 3000L).map(i => (i, "same same same same same same"))
    val base = (1 to 30).map(i => s"u$i").mkString(" ")
    val df = (degenerate ++ Seq((9001L, base), (9002L, base))).toDF("doc_id", "text")
    var dropped = (0L, 0L)
    val banded = Dedup.simhash(df).select(col("doc_id"), lit(0).as("band"),
      col("simhash").as("bucket"))
    val pairs = Dedup.idPairsFromBuckets(banded, maxBucket = 64,
        dropLabel = "spec-degenerate", onDrop = (b, d) => dropped = (b, d))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dropped._1 >= 1, "hot bucket not reported dropped")
    assert(dropped._2 >= 3000L, "dropped doc-slot count missing")
    assert(Dedup.lastDropReport("spec-degenerate") == dropped)
    assert(pairs.contains((9001L, 9002L)), "cold pair lost")
    assert(!pairs.exists(p => p._1 <= 3000L), "degenerate bucket expanded into pairs")
  }
}
