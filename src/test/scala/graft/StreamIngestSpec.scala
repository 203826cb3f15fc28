package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.core.Page
import graft.gen.CorpusGen
import graft.ner.Models
import graft.streaming.StreamIngest

class StreamIngestSpec extends SparkSpec {

  private def mkPages(n: Int): Seq[Page] = (0 until n).map { i =>
    val text = s"alpha beta gamma doc$i delta"
    val lang = if (i % 2 == 0) "en" else "de"
    Page(s"https://s/$lang/doc$i", new java.sql.Timestamp(CorpusGen.BaseEpochMs + i * 60000L),
      CorpusGen.htmlFor(i.toLong, text, lang, "s"), CorpusGen.expectedText(text), lang)
  }

  test("streaming mention detection == batch on the same rows") {
    import spark.implicits._
    val pages = mkPages(20)
    val models = Models.build(spark, graft.ner.NerStage.sentences(spark.createDataset(pages)))
    val bc = spark.sparkContext.broadcast(models)
    // batch result
    val batch = graft.ner.NerStage.mentions(
      graft.ner.NerStage.tag(graft.ner.NerStage.sentences(spark.createDataset(pages)), bc))
      .collect().map(m => (m.url, m.sentIdx, m.begin, m.end, m.entityType)).sorted
    // streaming result via MemoryStream + available-now trigger
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Page]
    stream.addData(pages)
    val q = StreamIngest.mentionStream(stream.toDS(), bc)
      .writeStream.format("memory").queryName("mentions_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("mentions_stream")
      .collect().map(r => (r.getString(0), r.getInt(2), r.getInt(3), r.getInt(4), r.getString(6)))
      .sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("windowed ingest counts with watermark aggregate by crawl hour") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Page]
    stream.addData(mkPages(10))
    val q = StreamIngest.windowedCounts(stream.toDS(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("win_counts").collect()
    assert(rows.map(_.getAs[Long]("n_pages")).sum == 10)
    assert(rows.map(_.getAs[String]("lang")).toSet == Set("en", "de"))
  }

  test("streaming end-to-end triples == batch triples on the same pages") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pages = mkPages(20)
    val sents = graft.ner.NerStage.sentences(spark.createDataset(pages))
    val models = Models.build(spark, sents)
    val bc = spark.sparkContext.broadcast(models)
    val lex = spark.sparkContext.broadcast(graft.ner.NerStage.defaultPredicateLexicon)
    val dict = graft.link.EntityLink.aliasDict(spark, sents.flatMap(_.tokens).distinct())
      .localCheckpoint(true)
    val canon = graft.canon.ConnectedComponents.run(graft.kg.Triples.aliasEdges(dict))
      .localCheckpoint(true)
    val batch = graft.kg.Triples.canonicalTriples(
      graft.ner.NerStage.rawTriples(
        graft.ner.NerStage.tag(sents, bc), lex), dict, canon)
      .collect().map(t => (t.subj, t.pred, t.obj, t.url, t.sentIdx)).sorted
    val stream = MemoryStream[Page]
    stream.addData(pages.take(11))
    stream.addData(pages.drop(11)) // two micro-batches
    val q = StreamIngest.tripleStream(stream.toDS(), bc, lex, dict, canon)
      .writeStream.format("memory").queryName("triples_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("triples_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(4), r.getInt(5)))
      .sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming exact dedup: first-seen wins across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def page(url: String, text: String) =
      Page(url, new java.sql.Timestamp(CorpusGen.BaseEpochMs),
        Array.empty[Byte], text, "en")
    val stream = MemoryStream[Page]
    val q = StreamIngest.firstSeenPages(stream.toDS())
      .writeStream.format("memory").queryName("first_seen").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: a duplicate pair (smallest url must win) + one distinct
    stream.addData(page("u/a1", "same text"), page("u/a2", "same text"), page("u/c", "other"))
    q.processAllAvailable()
    // batch 2: a later duplicate of batch 1's text is DROPPED; a new one passes
    stream.addData(page("u/d", "same text"), page("u/e", "fresh"))
    q.processAllAvailable()
    val urls = spark.table("first_seen").collect().map(_.getString(0)).sorted
    assert(urls.toSeq == Seq("u/a1", "u/c", "u/e"), urls.mkString(", "))
    q.stop()
    // and the state key matches the batch operator's hash column exactly
    val sparkHash = Seq("same text").toDF("text")
      .select(org.apache.spark.sql.functions.sha2(org.apache.spark.sql.functions.col("text"), 256))
      .head().getString(0)
    assert(StreamIngest.sha256Hex("same text") == sparkHash)
  }

  test("streaming near-dup (foreachBatch + TableIO state): drops within and across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (100 to 130).map(i => s"v$i").mkString(" ")
    val fresh = (200 to 230).map(i => s"z$i").mkString(" ")
    val stateRoot = java.nio.file.Files.createTempDirectory("neardup_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("neardup_out").toString + "/kept"
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.nearDupBatchStep(b, stateRoot, id)
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: docs 1+2 identical (transitive within-batch: keep 1), 3 distinct
    stream.addData((1L, base), (2L, base), (3L, other))
    q.processAllAvailable()
    // batch 2: doc 4 duplicates batch 1's KEPT rep (cross-batch drop via the
    // state table); doc 5 is new
    stream.addData((4L, base), (5L, fresh))
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(outDir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L), kept.mkString(", "))
    // single-batch processing agrees on this (direct-radius) corpus
    val oneRoot = java.nio.file.Files.createTempDirectory("neardup_one").toString
    val oneShot = StreamIngest.nearDupBatchStep(
      Seq((1L, base), (2L, base), (3L, other), (4L, base), (5L, fresh)).toDF("doc_id", "text"),
      oneRoot, 0L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(oneShot == Seq(1L, 3L, 5L), oneShot.mkString(", "))
    // REPLAY of batch 1 with its ORIGINAL rows (the foreachBatch crash
    // contract: state committed, sink write lost, batch re-runs): must
    // return the SAME kept rows — doc 5 may not match its own batch-1
    // state hash (the round-3 defect dropped the whole replayed batch)
    val replayed = StreamIngest.nearDupBatchStep(
      Seq((4L, base), (5L, fresh)).toDF("doc_id", "text"), stateRoot, 1L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(replayed == Seq(5L), s"replay must re-emit the kept rows, got: $replayed")
    // ...and is idempotent (writeResumable skips the committed partition)
    val before = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    StreamIngest.nearDupBatchStep(Seq((9L, base)).toDF("doc_id", "text"), stateRoot, 1L)
    val after = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    assert(before == after, s"replay must not grow state: $before -> $after")
    // state is PRE-BANDED: 4 band rows per kept hash, stored (not derived)
    val state = graft.core.TableIO.read(spark, stateRoot, "batch_id")
    assert(Seq("band", "bucket", "simhash", "doc_id", "batch_id")
      .forall(state.columns.contains), state.columns.mkString(","))
    val perDoc = state.groupBy("doc_id", "batch_id").count().collect()
    assert(perDoc.nonEmpty && perDoc.forall(_.getLong(2) == 4L),
      perDoc.take(3).mkString(","))
    // the read side joins stored bands: no Generate (band explode) and no
    // re-hash of history in the state-scan plan, and prior-batch pruning
    val seenPlan = StreamIngest.priorBandedState(spark, stateRoot, 1L)
      .queryExecution.optimizedPlan.toString
    assert(!seenPlan.contains("Generate"), seenPlan.take(1500))
    assert(!seenPlan.contains("simhash64"), seenPlan.take(1500))
    // compaction housekeeping keeps rows intact (re-read after the rewrite:
    // the pre-compaction DataFrame's file listing is stale by design)
    val rowsBefore = state.count()
    StreamIngest.compactState(spark, stateRoot, maxFilesPerPartition = 0)
    val rowsAfter = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    assert(rowsAfter == rowsBefore, s"compaction changed row count: $rowsBefore -> $rowsAfter")
  }

  test("streaming paragraph dedup (foreachBatch + TableIO state): history-wide first occurrence, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stateRoot = java.nio.file.Files.createTempDirectory("paradedup_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("paradedup_out").toString + "/clean"
    val b1 = Seq((1L, "a b\nc d\ne f"), (2L, "c d\ng h"))
    val b2 = Seq((3L, "a b\nz z"), (4L, "z z\nz z\nq r"))
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.paragraphDedupBatchStep(b, stateRoot, id)
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val got = rows(spark.read.parquet(outDir))
    // batch order == doc_id order here, so streaming == the batch operator
    // over the full history
    val want = rows(graft.ops.Dedup.dedupParagraphs((b1 ++ b2).toDF("doc_id", "text")))
    assert(got == want, s"streaming vs batch: ${got diff want} / ${want diff got}")
    // cross-batch drop: doc 3 loses "a b" to batch 1; within-batch: doc 4's
    // "z z"s lose to doc 3's
    assert(got.contains((3L, 2L, 1L, "z z")) && got.contains((4L, 3L, 2L, "q r")), got.toString)
    // REPLAY of batch 1 (state committed, sink lost): same rows back,
    // and the state append is a no-op
    val replayed = rows(StreamIngest.paragraphDedupBatchStep(
      b2.toDF("doc_id", "text"), stateRoot, 1L))
    assert(replayed == got.filter(r => r._1 == 3L || r._1 == 4L),
      s"replay must re-emit the same rows: $replayed")
    val before = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    StreamIngest.paragraphDedupBatchStep(
      Seq((9L, "a b")).toDF("doc_id", "text"), stateRoot, 1L)
    val after = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    assert(before == after, s"replay must not grow state: $before -> $after")
    // state carries 8-byte hashes + batch ids only — never paragraph text
    val state = graft.core.TableIO.read(spark, stateRoot, "batch_id")
    assert(state.columns.sorted.toSeq == Seq("batch_id", "h"), state.columns.mkString(","))
  }

  test("streaming Bloom dedup (foreachBatch + TableIO state): prior-batch probe, bounded state, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stateRoot = java.nio.file.Files.createTempDirectory("bloomdedup_state").toString
    val outDir = java.nio.file.Files.createTempDirectory("bloomdedup_out").toString + "/clean"
    val b1 = Seq((1L, "a b\nc d\ne f"), (2L, "c d\ng h"))
    val b2 = Seq((3L, "a b\nz z"), (4L, "z z\nz z\nq r"))
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDS().toDF("doc_id", "text")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.bloomDedupBatchStep(b, stateRoot, id)
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val got = rows(spark.read.parquet(outDir))
    // batch 0 probes an empty filter: everything survives (within-batch
    // dups "c d" included — order-free semantics)
    assert(got.contains((1L, 3L, 0L, "a b\nc d\ne f")) &&
      got.contains((2L, 2L, 0L, "c d\ng h")), got.toString)
    // batch 1 == the batch operator probing batch 0 as base (m large
    // enough that no FP fires on 7 paragraphs); doc 4's "z z" twins both
    // survive — novel to the PRIOR state
    val want2 = rows(graft.ops.Bloom.dedupAgainst(
      b1.toDF("doc_id", "text"), b2.toDF("doc_id", "text")))
    assert(got.filter(r => r._1 >= 3L) == want2,
      s"streaming vs batch operator: $got vs $want2")
    assert(got.contains((3L, 2L, 1L, "z z")) &&
      got.contains((4L, 3L, 0L, "z z\nz z\nq r")), got.toString)
    // REPLAY of batch 1 (state committed, sink lost): same rows back, no
    // state growth (idempotent bit-word append)
    val replayed = rows(StreamIngest.bloomDedupBatchStep(
      b2.toDF("doc_id", "text"), stateRoot, 1L))
    assert(replayed == got.filter(_._1 >= 3L), s"replay rows: $replayed")
    val state = graft.core.TableIO.read(spark, stateRoot, "batch_id")
    val before = state.count()
    StreamIngest.bloomDedupBatchStep(Seq((9L, "a b")).toDF("doc_id", "text"), stateRoot, 1L)
    val after = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    assert(before == after, s"replay must not grow state: $before -> $after")
    // state carries bit WORDS only (bounded by m/64 rows per batch), never text
    assert(state.columns.sorted.toSeq == Seq("b", "batch_id", "w"), state.columns.mkString(","))
    assert(before <= 2L * 7L * 7L, s"state rows must be bounded by paras*k: $before")
  }

  test("streaming KG fact upsert (foreachBatch + TableIO delta log): fold == batch facts over the union, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stateRoot = java.nio.file.Files.createTempDirectory("facts_state").toString
    val cols = Seq("subj", "pred", "obj", "lang", "url", "sentIdx")
    val b1 = Seq((1L, "p0", 2L, "en", "http://a/1", 0), (1L, "p0", 2L, "en", "http://a/2", 1),
                 (1L, "p1", 3L, "en", "http://a/1", 2), (4L, "p0", 2L, "de", "http://b/1", 0))
    val b2 = Seq((1L, "p0", 2L, "en", "http://a/1", 5), (1L, "p0", 2L, "en", "http://c/9", 0),
                 (7L, "p2", 8L, "fr", "http://d/1", 0))
    val stream = MemoryStream[(Long, String, Long, String, String, Int)]
    val q = stream.toDS().toDF(cols: _*)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.factUpsertBatchStep(b, stateRoot, id)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def factMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("subj"), col("pred"), col("obj"), col("lang"),
        col("n_mentions"), col("est_urls"), col("url_sketch"))
      .as[(Long, String, Long, String, Long, Long, Array[Long])].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> ((r._5, r._6, r._7.toSeq))).toMap
    val folded = factMap(StreamIngest.currentFacts(spark, stateRoot))
    val direct = factMap(graft.kg.Triples.facts((b1 ++ b2).toDF(cols: _*)))
    assert(folded == direct)
    // the (1,p0,2,en) fact accumulated across batches: 4 mentions, 3 urls
    assert(folded((1L, "p0", 2L, "en"))._1 == 4L)
    assert(folded((1L, "p0", 2L, "en"))._2 == 3L)
    // REPLAY of batch 1 (state committed, sink lost): write is a no-op —
    // no double counting, fold unchanged
    val before = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    StreamIngest.factUpsertBatchStep(b2.toDF(cols: _*), stateRoot, 1L)
    val after = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    assert(before == after, s"replay must not grow state: $before -> $after")
    assert(factMap(StreamIngest.currentFacts(spark, stateRoot)) == direct)
    // RE-BASE into a fresh generation: one base partition, same fold;
    // the stream continues there and a third batch lands on top
    val gen2 = java.nio.file.Files.createTempDirectory("facts_gen2").toString
    StreamIngest.rebaseFactState(spark, stateRoot, gen2, baseBatchId = 1L)
    assert(factMap(StreamIngest.currentFacts(spark, gen2)) == direct)
    assert(graft.core.TableIO.completedPartitions(gen2) == Set("1"))
    val b3 = Seq((1L, "p0", 2L, "en", "http://e/1", 0), (9L, "p0", 9L, "en", "http://e/2", 0))
    StreamIngest.factUpsertBatchStep(b3.toDF(cols: _*), gen2, 2L)
    assert(factMap(StreamIngest.currentFacts(spark, gen2)) ==
      factMap(graft.kg.Triples.facts((b1 ++ b2 ++ b3).toDF(cols: _*))))
  }

  test("streaming incremental canonicalization (foreachBatch + TableIO snapshots): fold == full CC, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stateRoot = java.nio.file.Files.createTempDirectory("canon_state").toString
    // batch 1: two components; batch 2: bridge + new node; batch 3: new
    // component only (prior components must pass through untouched)
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val b2 = Seq((3L, 10L), (11L, 40L))
    val b3 = Seq((70L, 71L))
    val stream = MemoryStream[(Long, Long)]
    val q = stream.toDS().toDF("src", "dst")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.canonUpsertBatchStep(b, stateRoot, id)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    Seq(b1, b2, b3).foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toMap
    val full = labelMap(graft.canon.ConnectedComponents.run(
      (b1 ++ b2 ++ b3).toDF("src", "dst")))
    assert(labelMap(StreamIngest.currentLabels(spark, stateRoot)) == full)
    assert(full(40L) == 1L && full(71L) == 70L)
    // REPLAY of batch 1 (0-indexed: the b2 step): prior read excludes the
    // batch's own committed snapshot, so the rewrite is a no-op
    val before = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    StreamIngest.canonUpsertBatchStep(b2.toDF("src", "dst"), stateRoot, 1L)
    assert(graft.core.TableIO.read(spark, stateRoot, "batch_id").count() == before)
    assert(labelMap(StreamIngest.currentLabels(spark, stateRoot)) == full)
    // beforeBatch is exclusive: as-of batch 1 the bridge has not happened
    val asOf1 = labelMap(StreamIngest.currentLabels(spark, stateRoot, beforeBatch = 1L))
    assert(asOf1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // empty state: currentLabels on a fresh root is an empty labeling
    val fresh = java.nio.file.Files.createTempDirectory("canon_fresh").toString
    assert(StreamIngest.currentLabels(spark, fresh).isEmpty)
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[graft.core.Sentence]
    val q = StreamIngest.runningTotals(stream.toDS())
      .writeStream.format("memory").queryName("totals").outputMode("update")
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(graft.core.Sentence("u1", "en", 0, Seq("a", "b")))
    q.processAllAvailable()
    stream.addData(graft.core.Sentence("u2", "en", 0, Seq("c")))
    q.processAllAvailable()
    val rows = spark.table("totals").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    // update mode emits one row per batch; the LAST en row carries the running total
    assert(rows.contains(("en", 2L, 3L)), rows.mkString(", "))
    q.stop()
  }

  test("streaming burst detection (foreachBatch + TableIO count log): fold == batch bursts, late data re-votes, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.timestamp_micros
    val stateRoot = java.nio.file.Files.createTempDirectory("burst_state").toString
    // bucket width 10us, trailing 2, burst iff cnt*2 > 3*trail, min 2
    val b1 = Seq(("a", 5L), ("a", 15L), ("a", 15L), ("a", 25L))
    val b2 = Seq(("a", 35L), ("a", 36L), ("a", 37L), ("a", 38L),
                 ("b", 5L), ("b", 15L))
    def evDf(rows: Seq[(String, Long)]) = rows.toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
    val stream = MemoryStream[(String, Long)]
    val q = stream.toDS().toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.burstCountBatchStep(b, stateRoot, id,
          keys = Seq("k"), tsCol = "ts", bucketMicros = 10L)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def burstMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), org.apache.spark.sql.functions
        .unix_micros(col("bucket_start")).as("bs"), col("cnt"),
        col("trailing_total"), col("is_burst"))
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val folded = burstMap(StreamIngest.currentBursts(spark, stateRoot,
      keys = Seq("k"), bucketMicros = 10L, trailing = 2, numK = 3L,
      denK = 2L, minCount = 2L))
    val direct = burstMap(graft.kg.Temporal.bursts(evDf(b1 ++ b2),
      Seq("k"), "ts", 10L, trailing = 2, numK = 3L, denK = 2L,
      minCount = 2L))
    assert(folded === direct)
    // bucket 3 for key a: cnt 4, trail [2,1]=3 -> 8 > 9 false? no:
    // numK/denK = 3/2 -> 4*2*2=16 > 3*3=9 -> burst
    assert(folded(("a", 30L)) === ((4L, 3L, true)))
    // LATE data re-votes a CLOSED bucket: batch 3 adds 3 events to
    // a's bucket 1 -> bucket 2's baseline inflates, bucket 3 recounts
    val b3 = Seq(("a", 16L), ("a", 17L), ("a", 18L))
    StreamIngest.burstCountBatchStep(evDf(b3), stateRoot, 2L,
      Seq("k"), "ts", 10L)
    val withLate = burstMap(StreamIngest.currentBursts(spark, stateRoot,
      Seq("k"), 10L, 2, 3L, 2L, 2L))
    assert(withLate === burstMap(graft.kg.Temporal.bursts(
      evDf(b1 ++ b2 ++ b3), Seq("k"), "ts", 10L, 2, 3L, 2L, 2L)))
    assert(withLate(("a", 30L)) === ((4L, 6L, false))) // baseline grew
    // REPLAY: rewriting batch 1's delta is a no-op; as-of read excludes
    // the late batch and reproduces the pre-late table exactly
    val before = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    StreamIngest.burstCountBatchStep(evDf(b2), stateRoot, 1L,
      Seq("k"), "ts", 10L)
    assert(graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
      === before)
    assert(burstMap(StreamIngest.currentBursts(spark, stateRoot,
      Seq("k"), 10L, 2, 3L, 2L, 2L, uptoBatch = 1L)) === folded)
  }

  test("streaming embedding near-dup: cross-batch drops, replay, first-kept") {
    import spark.implicits._
    def emb(rows: (Long, Seq[Float])*) = rows.toSeq.toDF("vec_id", "embedding")
    // batch 0: 1 and 2 are near-identical (within-batch cluster, rep 1);
    // 10 is orthogonal and kept
    val b0 = emb(1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0.999f, 0.012f, 0f, 0f),
      10L -> Seq(0f, 1f, 0f, 0f))
    // batch 1: 3 near kept-1 (drop), 11 near kept-10 (drop), 20 new (keep)
    val b1 = emb(3L -> Seq(0.998f, 0.02f, 0f, 0f),
      11L -> Seq(0f, 0.99f, 0.1f, 0f), 20L -> Seq(0f, 0f, 1f, 0f))
    val root = java.nio.file.Files.createTempDirectory("embdedup_state").toString
    def step(b: org.apache.spark.sql.DataFrame, id: Long) =
      StreamIngest.embeddingNearDupBatchStep(b, root, id)
        .select("vec_id").as[Long].collect().toSet
    assert(step(b0, 0L) === Set(1L, 10L))
    assert(step(b1, 1L) === Set(20L))
    // crash replay: same kept set, state append is a no-op
    val before = graft.core.TableIO.read(spark, root, "batch_id").count()
    assert(step(b1, 1L) === Set(20L))
    assert(graft.core.TableIO.read(spark, root, "batch_id").count() === before)
    // state is pre-banded with the vector riding the band rows
    val cols = graft.core.TableIO.read(spark, root, "batch_id").columns.toSet
    assert(Set("band", "bucket", "vec_id", "embedding").subsetOf(cols))
  }

  test("streaming funnel == batch funnel; late re-anchor; replay; rebase") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val stages = Seq("A", "B", "C")
    def ev(rows: (Long, Long, String)*) = rows.toSeq.toDF("k", "us", "st")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("st"),
        lit("noise").as("extra"))
    def fm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val b0 = ev((1L, 10L, "A"), (1L, 12L, "B"), (2L, 0L, "A"), (9L, 1L, "X"))
    val b1 = ev((1L, 14L, "C"), (2L, 3L, "B"))
    // LATE batch: an earlier A for key 1 re-anchors its window to t0=1 —
    // deadline 1+8=9, so the B@12/C@14 completions RETRACT
    val b2 = ev((1L, 1L, "A"))
    val all = Seq(b0, b1, b2)
    val stateRoot = java.nio.file.Files.createTempDirectory("funnel_state").toString
    all.zipWithIndex.foreach { case (b, i) =>
      StreamIngest.funnelEventBatchStep(b, stateRoot, i.toLong,
        "k", "ts", "st", stages)
    }
    val w = 8L
    def batchFunnel(dfs: Seq[org.apache.spark.sql.DataFrame]) =
      fm(graft.kg.Temporal.funnel(dfs.reduce(_ unionAll _),
        "k", "ts", "st", stages, w))
    // stream fold == batch operator over the union, at every as-of point
    assert(fm(StreamIngest.currentFunnel(spark, stateRoot, stages, w))
      === batchFunnel(all))
    assert(fm(StreamIngest.currentFunnel(spark, stateRoot, stages, w,
      uptoBatch = 1L)) === batchFunnel(all.take(2)))
    // the late A really retracted key 1's depth (B@12 > deadline 9)
    assert(batchFunnel(all) === Map("A" -> 2L, "B" -> 1L, "C" -> 0L))
    assert(batchFunnel(all.take(2)) === Map("A" -> 2L, "B" -> 2L, "C" -> 1L))
    // crash replay: re-running a committed batch is a no-op
    val before = graft.core.TableIO.read(spark, stateRoot, "batch_id").count()
    StreamIngest.funnelEventBatchStep(b1, stateRoot, 1L, "k", "ts", "st", stages)
    assert(graft.core.TableIO.read(spark, stateRoot, "batch_id").count() === before)
    // rebase prunes rows past their key's deadline without changing the
    // funnel; key 1's A@10/B@12/C@14 (> 1+8) drop — a later-than-anchor
    // stage-1 event can never re-become the min — key 2 keeps everything
    val newRoot = java.nio.file.Files.createTempDirectory("funnel_rebase").toString
    StreamIngest.rebaseFunnelState(spark, stateRoot, newRoot, stages, w,
      baseBatchId = 10L)
    assert(fm(StreamIngest.currentFunnel(spark, newRoot, stages, w))
      === batchFunnel(all))
    val keptRows = graft.core.TableIO.read(spark, newRoot, "batch_id")
      .select("k", "us", "stage").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(keptRows === Set((1L, 1L, "A"), (2L, 0L, "A"), (2L, 3L, "B")))
  }

  test("streaming Count-Min (foreachBatch + TableIO sketch log): linear fold == one-pass batch sketch, as-of read, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stateRoot = java.nio.file.Files.createTempDirectory("cm_state").toString
    val depth = 3; val width = 32
    val b1 = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val b2 = Seq.fill(5)("alpha") ++ Seq.fill(9)("delta") ++ Seq("beta")
    val stream = MemoryStream[String]
    val q = stream.toDS().toDF("token")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.cmBatchStep(b, stateRoot, id, depth, width)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    // linearity: the fold of per-batch sketches IS the one-pass sketch
    def batchSketch(toks: Seq[String]): Seq[Long] = {
      val agg = new graft.ops.Sketches.CmAgg(depth, width)
      agg.finish(toks.foldLeft(agg.zero)(agg.reduce)).toSeq
    }
    val folded = StreamIngest.currentCmSketch(spark, stateRoot, depth, width)
    assert(folded.toSeq === batchSketch(b1 ++ b2))
    // as-of read reproduces the batch-0-only sketch exactly
    assert(StreamIngest.currentCmSketch(spark, stateRoot, depth, width,
      uptoBatch = 0L).toSeq === batchSketch(b1))
    // probe estimates: deterministic overestimates of the true counts
    val est = StreamIngest.cmEstimate(
        Seq("alpha", "beta", "delta", "unseen").toDF("token"),
        folded, depth, width)
      .as[(String, Long)].collect().toMap
    val exact = Map("alpha" -> 12L, "beta" -> 4L, "delta" -> 9L, "unseen" -> 0L)
    exact.foreach { case (t, c) =>
      assert(est(t) >= c, s"CM under at $t")
      assert(est(t) <= (b1 ++ b2).size.toLong, s"CM above stream size at $t")
    }
    // replay: re-writing batch 1's delta is a no-op (same fold after)
    StreamIngest.cmBatchStep(b2.toDF("token"), stateRoot, 1L, depth, width)
    assert(StreamIngest.currentCmSketch(spark, stateRoot, depth, width).toSeq
      === folded.toSeq)
  }

  test("streaming KMV distinct sketches (foreachBatch + TableIO sketch log): fold == one-pass batch sketch, as-of read, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stateRoot = java.nio.file.Files.createTempDirectory("kmv_state").toString
    val k = 8
    // two slices; slice "en" crosses saturation (>8 distinct), "de" stays
    // exact; batch 2 repeats keys from batch 1 (set semantics must hold)
    val b1 = (1 to 6).map(i => ("en", s"u$i")) ++ Seq(("de", "x1"), ("de", "x2"))
    val b2 = (4 to 12).map(i => ("en", s"u$i")) ++ Seq(("de", "x2"), ("de", "x3"))
    val stream = MemoryStream[(String, String)]
    val q = stream.toDS().toDF("g", "key")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.kmvBatchStep(b, stateRoot, id, "g", "key", k)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def sketchMap(df: org.apache.spark.sql.DataFrame) = df
      .select("group", "n_rows", "est_distinct", "n_kept", "kth_hash")
      .as[(String, Long, Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // fold == the batch operator's per-group rows on the same history
    def batchRows(rows: Seq[(String, String)]) = sketchMap(
      graft.ops.Sketches.distinctSketch(rows.toDF("g", "key"), "g", "key", k)
        .filter(col("group") =!= "ALL"))
    val folded = sketchMap(StreamIngest.currentKmvSketches(spark, stateRoot, k))
    assert(folded === batchRows(b1 ++ b2))
    assert(folded("de") === ((4L, 3L, 3, folded("de")._4))) // exact below saturation
    assert(folded("en")._3 === 8) // saturated: n_kept == k
    // as-of read reproduces the batch-0-only state exactly
    assert(sketchMap(StreamIngest.currentKmvSketches(spark, stateRoot, k,
      uptoBatch = 0L)) === batchRows(b1))
    // replay: re-writing batch 1's delta is a no-op
    StreamIngest.kmvBatchStep(b2.toDF("g", "key"), stateRoot, 1L, "g", "key", k)
    assert(sketchMap(StreamIngest.currentKmvSketches(spark, stateRoot, k))
      === folded)
  }

  test("streaming Misra-Gries summaries (foreachBatch + TableIO summary log): mergeable bounds + superset guarantee, as-of read, exact replay") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val stateRoot = java.nio.file.Files.createTempDirectory("mg_state").toString
    val k = 3
    // batch 1: a x 8, b x 5, four singletons (n1 = 17); batch 2: g x 6,
    // a x 4, b once (n2 = 11) — crosses the k-counter capacity both times
    val b1 = Seq.fill(8)("a") ++ Seq.fill(5)("b") ++ Seq("c", "d", "e", "f")
    val b2 = Seq.fill(6)("g") ++ Seq.fill(4)("a") ++ Seq("b")
    val stream = MemoryStream[String]
    val q = stream.toDS().toDF("key")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.mgBatchStep(b, stateRoot, id, "key", k)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(b1: _*)
    q.processAllAvailable()
    stream.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def checkBounds(rows: Seq[(String, Long, Long, Long)],
                    history: Seq[String]): Unit = {
      val exact = history.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val n = history.size.toLong
      rows.foreach { case (tok, lb, nTot, err) =>
        assert(nTot === n && err === n / (k + 1))
        assert(lb >= 1L && lb <= exact(tok), s"$tok lb=$lb exact=${exact(tok)}")
        assert(exact(tok) <= lb + err, s"$tok exact=${exact(tok)} lb=$lb err=$err")
      }
      // guaranteed superset: every token with true count > N/(k+1) present
      val present = rows.map(_._1).toSet
      exact.filter(_._2 > n / (k + 1)).keys
        .foreach(t => assert(present(t), s"heavy token $t missing"))
    }
    def current(upto: Long = Long.MaxValue) =
      StreamIngest.currentMgSummary(spark, stateRoot, k, upto)
        .as[(String, Long, Long, Long)].collect().toSeq
    val both = current()
    checkBounds(both, b1 ++ b2)
    assert(both.size <= k) // merged summary never exceeds k counters
    // as-of read: batch-0-only bounds against batch-1's history
    checkBounds(current(upto = 0L), b1)
    // replay: re-writing batch 1's delta is a no-op
    StreamIngest.mgBatchStep(b2.toDF("key"), stateRoot, 1L, "key", k)
    assert(current().toSet === both.toSet)
  }
}
