package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import graft.core.{Mention, Page, Sentence}
import graft.ner.{Models, NerStage}

/**
 * Structured-Streaming twin of the batch ingest: the same typed transforms
 * (extract -> sentences -> language-routed NER -> mentions) applied to a
 * streaming Dataset[Page] — `readStream` on a crawl landing directory at
 * deployment. The batch pipeline remains the primary contract
 * (BASELINE.json: batch with snapshot checkpoints); this twin exists so a
 * continuously-landing crawl can reuse the operators unchanged.
 */
object StreamIngest {

  /** Identical row-level semantics to the batch path — NerStage's typed
    * operators are stateless, so they bind to a streaming Dataset as-is. */
  def mentionStream(pages: Dataset[Page],
                    bcModels: Broadcast[Map[String, Models.LangModel]]): Dataset[Mention] =
    NerStage.mentions(NerStage.tag(NerStage.sentences(pages), bcModels))

  /** Tumbling-window ingest statistics on crawl time with a late-record
    * watermark (late WARC records are dropped after the horizon). */
  def windowedCounts(pages: Dataset[Page], window: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    pages.toDF()
      .withWatermark("warc_ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("warc_ts"), window), col("lang"))
      .agg(count(lit(1)).as("n_pages"), sum(length(col("text"))).as("n_chars"))
  }

  /** End-to-end STREAMING KG construction: pages stream -> extract ->
    * language-routed NER -> surface triples -> stream-static joins against
    * the (static, broadcast) alias dictionary and canonical map -> typed
    * Dataset[Triple]. Every operator is the batch pipeline's own — the
    * stateless stages bind to a streaming Dataset unchanged, and the
    * entity/canonical joins are stream-static inner joins (append-mode
    * safe). Row-level results are identical to the batch pipeline on the
    * same pages (tested). */
  def tripleStream(pages: Dataset[Page],
                   bcModels: Broadcast[Map[String, Models.LangModel]],
                   bcLex: Broadcast[Set[String]],
                   dict: DataFrame, canonMap: DataFrame): Dataset[graft.core.Triple] =
    graft.kg.Triples.canonicalTriples(
      NerStage.rawTriples(NerStage.tag(NerStage.sentences(pages), bcModels), bcLex),
      dict, canonMap)

  /** Streaming EXACT dedup — the streaming twin of `Dedup.exact`: emit a
    * page only the FIRST time its text is seen, across micro-batches
    * (flatMapGroupsWithState keyed on the SHA-256 of the text; within one
    * micro-batch the smallest url wins, deterministically). A continuously-
    * landing crawl thus produces an already-deduplicated stream. At
    * deployment, bound the state with a GroupStateTimeout TTL sized to the
    * crawl revisit horizon; NoTimeout here keeps the test semantics exact. */
  def firstSeenPages(pages: Dataset[Page]): Dataset[Page] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.groupByKey(p => sha256Hex(p.text))
      .flatMapGroupsWithState[Boolean, Page](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Page], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(rows.minBy(_.url))
          }
      }
  }

  /**
   * Streaming NEAR-dup — the production `foreachBatch` pattern (a stateful
   * one-pass operator cannot decide "any of my 4 simhash bands matched"
   * inside a single per-key group, so the batch step runs real batch
   * operators against a persistent state table instead). Per micro-batch:
   *
   *  1. within-batch TRANSITIVE clustering over verified simhash near-dup
   *     pairs (connected components); representative = min doc_id;
   *  2. representatives whose simhash lies within `maxHamming` of any hash
   *     kept by a PRIOR batch are dropped — a 16-bit-band equi-join against
   *     the state table (pigeonhole: hamming <= 3 shares >= 1 of 4 bands),
   *     verified by true hamming distance. The state is stored PRE-BANDED
   *     (band, bucket, simhash, doc_id, batch_id — 4 rows per kept hash),
   *     so a micro-batch joins on (band, bucket) WITHOUT re-computing the
   *     band explode over the entire kept history (the round-3 form
   *     re-banded the full state every batch — per-batch transform cost
   *     grew with corpus age); only rows with `batch_id < batchId` are
   *     read (partition-pruned), which also makes a CRASH REPLAY exact:
   *     a re-run batch can never match its own previously-committed
   *     hashes (which would drop every row and lose the batch at the sink);
   *  3. the surviving representatives' banded hashes append to the state
   *     table CRASH-ATOMICALLY (`TableIO.writeResumable` partitioned by
   *     batch_id: re-running a failed/replayed micro-batch is idempotent —
   *     same kept set, same state partition — the exactly-once contract
   *     foreachBatch needs). Long-lived streams bound the state file count
   *     with `compactState` (TableIO.compact over the banded table).
   *
   * Returns the kept rows of this batch. Deterministic (min-id reps,
   * set-based drops). Documented divergence vs single-batch processing: a
   * transitive chain crossing a batch boundary collapses only when the
   * later doc lies within the radius of a KEPT representative — the
   * standard incremental-dedup semantics.
   */
  def nearDupBatchStep(batch: DataFrame, stateRoot: String, batchId: Long,
                       maxHamming: Int = 3): DataFrame = {
    import graft.ops.Dedup
    import graft.core.TableIO
    val spark = batch.sparkSession
    val sh = Dedup.simhash(batch).localCheckpoint()
    val pairs = Dedup.simhashNearDup(batch, maxHamming)
      .select(col("doc1").as("src"), col("doc2").as("dst"))
    val comp = graft.canon.ConnectedComponents.run(pairs)
    val reps = batch.select(col("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .filter(coalesce(col("component"), col("doc_id")) === col("doc_id"))
      .select(col("doc_id"))
    val repsH = sh.join(reps, Seq("doc_id"))
    val stateExists = java.nio.file.Files.exists(java.nio.file.Paths.get(stateRoot, "data"))
    val kept =
      if (!stateExists) repsH
      else {
        val seen = priorBandedState(spark, stateRoot, batchId)
          .select(col("band"), col("bucket"), col("simhash").as("seen_hash"))
        val dropped = bandExplode(repsH, col("doc_id"), col("simhash").as("h"))
          .join(seen, Seq("band", "bucket"))
          .filter(bit_count(col("h").bitwiseXOR(col("seen_hash"))) <= maxHamming)
          .select(col("doc_id")).distinct()
        repsH.join(dropped, Seq("doc_id"), "left_anti")
      }
    val keptC = kept.localCheckpoint()
    TableIO.writeResumable(
      bandExplode(keptC, col("doc_id"), col("simhash"))
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
    batch.join(keptC.select(col("doc_id")), Seq("doc_id"))
  }

  /** The 4 x 16-bit band rows of each (id..., simhash) row — computed ONCE
    * at state-write time; reads join the stored bands directly. */
  private def bandExplode(df: DataFrame, idCols: org.apache.spark.sql.Column*): DataFrame =
    df.select(idCols :+ posexplode(expr(
      "transform(sequence(0, 3), c -> shiftright(simhash, c * 16) & 65535)"))
      .as(Seq("band", "bucket")): _*)

  /** Snapshot-consistent read of the banded dedup state as visible to
    * `batchId`: PRIOR batches only (replay exactness), no re-banding
    * transform — the plan is a pruned scan of the stored band rows
    * (asserted in StreamIngestSpec). */
  def priorBandedState(spark: SparkSession, stateRoot: String, batchId: Long): DataFrame =
    graft.core.TableIO.read(spark, stateRoot, "batch_id")
      .filter(col("batch_id") < batchId)

  /**
   * Streaming PARAGRAPH dedup — the foreachBatch twin of
   * `Dedup.dedupParagraphs` for a continuously-landing crawl: a paragraph
   * survives only at its corpus-HISTORY-wide first occurrence (prior
   * batches' kept hashes take priority, then this batch's (doc_id, pos)
   * order). Per micro-batch:
   *
   *  1. within-batch winners: min (doc_id, pos) per paragraph hash; every
   *     other occurrence is excised;
   *  2. winners whose hash a PRIOR batch kept are excised too — the state
   *     read is partition-pruned to `batch_id < batchId`, so a crash
   *     REPLAY recomputes the same kept set (it can never match its own
   *     committed hashes);
   *  3. hashes NEW to the state append crash-atomically
   *     (`TableIO.writeResumable` partitioned by batch_id — a replayed
   *     batch's write is a no-op);
   *  4. pages reassemble in place via the sorted-merge `excise_positions`.
   *
   * The state stores the 8-byte xxhash64 of each kept paragraph (the
   * `hashKeys` trade of the batch operator: a 64-bit collision can only
   * OVER-drop) — text never enters the state table, so state size is
   * 8 bytes + ids per DISTINCT paragraph ever kept; bound file counts
   * with `compactState`. Returns (doc_id, n_paras, n_dropped, text_clean)
   * for this batch's rows.
   */
  def paragraphDedupBatchStep(batch: DataFrame, stateRoot: String,
                              batchId: Long): DataFrame = {
    import graft.core.TableIO
    val spark = batch.sparkSession
    val paras = split(col("text"), "\n")
    val ex = batch
      .select(col("doc_id"), posexplode(paras).as(Seq("pos", "p0")))
      .select(col("doc_id"), col("pos"), xxhash64(col("p0")).as("h"))
      .localCheckpoint()
    val keepers = ex.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("keep"))
      .localCheckpoint()
    val stateExists = java.nio.file.Files.exists(java.nio.file.Paths.get(stateRoot, "data"))
    val prior =
      if (!stateExists) null
      else TableIO.read(spark, stateRoot, "batch_id")
        .filter(col("batch_id") < batchId).select(col("h"))
    // batch-internal non-winners
    val losers = ex.join(keepers, Seq("h"))
      .filter(!(col("doc_id") === col("keep.doc_id") && col("pos") === col("keep.pos")))
      .select(col("doc_id"), col("pos"))
    // winners of hashes the history already kept
    val dropped0 =
      if (prior == null) losers
      else losers.union(
        keepers.join(prior, Seq("h"), "left_semi")
          .select(col("keep.doc_id").as("doc_id"), col("keep.pos").as("pos")))
    // materialize BEFORE the state append below (the lazy state scan's
    // file listing would go stale once this batch's partition lands)
    val droppedPos = dropped0
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("pos"))).as("removed"))
      .localCheckpoint()
    val newKept0 = keepers.select(col("h"))
    val newKept = if (prior == null) newKept0
                  else newKept0.join(prior, Seq("h"), "left_anti")
    TableIO.writeResumable(newKept.withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
    batch.withColumn("paras", paras)
      .join(droppedPos, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("paras")).cast("long").as("n_paras"),
        coalesce(size(col("removed")), lit(0)).cast("long").as("n_dropped"),
        when(col("removed").isNull, col("text"))
          .otherwise(concat_ws("\n",
            graft.functions.GraftFunctions.excise_positions(col("paras"), col("removed"))))
          .as("text_clean"))
  }

  /**
   * Streaming BLOOM dedup — the foreachBatch twin of `Bloom.dedupAgainst`
   * for a continuously-landing crawl (the Dolma ingestion shape): each
   * micro-batch's paragraphs are probed against the Bloom filter of every
   * PRIOR batch's paragraphs, and the batch then adds its own bits to the
   * state. Versus `paragraphDedupBatchStep` (exact), the state is BOUNDED:
   * at most m/64 longs ever, regardless of corpus age — the trade is the
   * filter's deterministic false-positive rate (over-drop only).
   *
   *  - State table: (w int, b long, batch_id) — the bit WORDS each batch
   *    sets (bit_or-folded on read; the OR is idempotent and order-free).
   *    Appended crash-atomically (`TableIO.writeResumable`); a replayed
   *    batch's write is a no-op.
   *  - The probe reads `batch_id < batchId` only, so a crash replay
   *    recomputes the same kept set (it never matches its own bits).
   *  - Within-batch duplicates are NOT dropped (order-free semantics, as
   *    in the batch operator); compose `paragraphDedupBatchStep` upstream
   *    when self-dedup is wanted.
   *
   * Returns (doc_id, n_paras, n_dropped, text_clean) for this batch.
   */
  def bloomDedupBatchStep(batch: DataFrame, stateRoot: String, batchId: Long,
                          mBits: Long = 1L << 22, k: Int = 7,
                          seed: Long = 42L): DataFrame = {
    import graft.core.TableIO
    import graft.functions.GraftFunctions
    require(mBits > 0 && mBits % 64 == 0 && mBits / 64 <= Int.MaxValue,
      "mBits must be a positive multiple of 64 with mBits/64 an Int")
    val spark = batch.sparkSession
    val paras = split(col("text"), "\n")
    val stateExists = java.nio.file.Files.exists(java.nio.file.Paths.get(stateRoot, "data"))
    val bits = new Array[Long]((mBits / 64).toInt)
    if (stateExists)
      TableIO.read(spark, stateRoot, "batch_id")
        .filter(col("batch_id") < batchId)
        .groupBy(col("w")).agg(bit_or(col("b")).as("bits"))
        .collect()
        .foreach(r => bits(r.getInt(0)) = r.getLong(1))
    // this batch's word contributions (all its paragraphs — the OR makes
    // re-adding known ones idempotent), appended crash-atomically
    val words = batch
      .select(explode(paras).as("p"))
      .select(explode(
        GraftFunctions.bloom_positions(col("p"), mBits, k, seed)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        expr("shiftleft(1L, cast(pos & 63 as int))").as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("b"))
    TableIO.writeResumable(words.withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
    batch.withColumn("paras", paras)
      .withColumn("kept",
        filter(col("paras"), p => !GraftFunctions.bloom_contains(p, bits, k, seed)))
      .select(col("doc_id"),
        size(col("paras")).cast("long").as("n_paras"),
        (size(col("paras")) - size(col("kept"))).cast("long").as("n_dropped"),
        concat_ws("\n", col("kept")).as("text_clean"))
  }

  /**
   * Streaming INCREMENTAL KG MAINTENANCE — the foreachBatch twin of
   * `Triples.facts`/`upsertFacts` for a continuously-landing crawl: each
   * micro-batch of canonical triples is aggregated to its OWN fact
   * snapshot (counts + KMV url sketch) and appended as a delta partition;
   * the current fact table is the FOLD of all deltas (merge-on-read, the
   * Iceberg/LSM shape — exactly what `Triples.foldFacts`'s associative +
   * commutative algebra licenses).
   *
   *  - State table: the [[graft.kg.Triples.facts]] schema + batch_id.
   *    Appends are crash-atomic (`TableIO.writeResumable` partitioned by
   *    batch_id): a replayed micro-batch recomputes the same delta and
   *    its write is a no-op — no double counting, the foreachBatch
   *    exactly-once contract.
   *  - Per-batch cost is ONE aggregation over the batch's triples —
   *    never a join against accumulated state (contrast a read-modify-
   *    write upsert, whose per-batch cost grows with KG age); the read-
   *    side fold is deferred to queries and bounded by periodic
   *    compaction: fold cost is O(total delta rows), so long-lived
   *    streams re-base in a single-writer maintenance window (the
   *    `compactState` pattern) by folding old partitions into one.
   *
   * Correctness contract (StreamIngestSpec): after any number of
   * batches, `currentFacts` == `Triples.facts` over the union of all
   * batches' raw triples — including the sketch columns bit-for-bit.
   */
  def factUpsertBatchStep(triples: DataFrame, stateRoot: String, batchId: Long,
                          k: Int = 256): Unit =
    graft.core.TableIO.writeResumable(
      graft.kg.Triples.facts(triples, k).withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")

  /** The current fact table: fold every delta partition (merge-on-read). */
  def currentFacts(spark: SparkSession, stateRoot: String, k: Int = 256): DataFrame =
    graft.kg.Triples.foldFacts(
      graft.core.TableIO.read(spark, stateRoot, "batch_id").drop("batch_id"), k)

  /** RE-BASE the fact delta log (the LSM/Iceberg rewrite): fold every
    * committed delta of `oldRoot` into ONE base partition of a FRESH
    * generation root, written crash-atomically. Afterwards the stream
    * continues `factUpsertBatchStep` against `newRoot` with batch ids
    * > `baseBatchId`, and fold cost restarts from one partition instead
    * of growing with corpus age. Generation rollover is operational
    * (single-writer maintenance window, like [[compactState]]): the old
    * root stays intact — and readable — until the operator switches the
    * stream over and deletes it, so a crash anywhere in the rebase
    * leaves both generations consistent (`writeResumable` makes the
    * rebase itself idempotent). `baseBatchId` must be >= the largest
    * delta batch id folded, so later batch ids never collide with the
    * base partition. */
  def rebaseFactState(spark: SparkSession, oldRoot: String, newRoot: String,
                      baseBatchId: Long, k: Int = 256): Unit =
    graft.core.TableIO.writeResumable(
      currentFacts(spark, oldRoot, k).withColumn("batch_id", lit(baseBatchId)),
      newRoot, "batch_id")

  /**
   * Streaming incremental CANONICALIZATION (foreachBatch): fold each
   * micro-batch's link/alias edges into the running node -> component
   * labeling via [[graft.canon.ConnectedComponents.upsertLabels]] and
   * write the updated labeling as this batch's crash-atomic snapshot
   * partition.
   *
   * Unlike the fact log (pure merge-on-read deltas), labels are
   * MATERIALIZED per batch: the upsert already touches only the delta's
   * components, and readers need the labeling without a fold chain (each
   * fold would be a CC run — O(batches) at read time). State is one row
   * per entity per generation — the entity vocabulary, orders of
   * magnitude below the edge history — and old generations are prunable
   * between batches (only the latest committed partition is ever read;
   * [[compactState]] handles small files).
   *
   * Exactly-once: the prior labeling is read STRICTLY from partitions
   * `batch_id < batchId` (never the batch's own committed partition —
   * the nearDup replay lesson), so a replayed batch recomputes the
   * identical labeling and `writeResumable` makes the rewrite a no-op.
   */
  def canonUpsertBatchStep(deltaEdges: DataFrame, stateRoot: String,
                           batchId: Long): Unit = {
    val spark = deltaEdges.sparkSession
    val prior = currentLabels(spark, stateRoot, beforeBatch = batchId)
    graft.core.TableIO.writeResumable(
      graft.canon.ConnectedComponents.upsertLabels(prior, deltaEdges)
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
  }

  /** The labeling as of the newest committed snapshot with
    * `batch_id < beforeBatch` (exclusive — pass the current batch id from
    * inside a batch step; the default sees everything). Empty (id,
    * component) frame when no snapshot qualifies. */
  def currentLabels(spark: SparkSession, stateRoot: String,
                    beforeBatch: Long = Long.MaxValue): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id", "component")
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(stateRoot, "data")))
      return empty
    // partition-path values may be re-inferred as int — normalize to long
    val st = graft.core.TableIO.read(spark, stateRoot, "batch_id")
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") < beforeBatch)
    val latest = st.agg(max(col("batch_id"))).head()
    if (latest.isNullAt(0)) empty
    else st.filter(col("batch_id") === latest.getLong(0))
      .select(col("id"), col("component"))
  }

  /**
   * Streaming BURST DETECTION (foreachBatch) — the trending monitor of
   * [[graft.kg.Temporal.bursts]] fed by micro-batches: each batch logs
   * its per-(key, bucket) event counts as a crash-atomic delta partition
   * (the [[factUpsertBatchStep]] merge-on-read shape — per-batch cost is
   * ONE partial aggregation of the batch itself, never a join against
   * accumulated state; counts from disjoint batches SUM, so the fold is
   * exact regardless of how events split across batches, INCLUDING late
   * events landing in an old bucket — a re-vote the fixed-window
   * streaming aggregation can't do once the watermark passed).
   *
   * Exactly-once: the delta is a pure function of the batch rows
   * ([[graft.core.TableIO.writeResumable]] makes a replayed write a
   * no-op), and [[currentBursts]] is a deterministic read of committed
   * deltas — a replayed batch re-emits the identical burst table. State
   * is bounded by |keys| · lifetime buckets (counts, never events);
   * [[compactState]] folds small files between batches.
   */
  def burstCountBatchStep(events: DataFrame, stateRoot: String,
                          batchId: Long, keys: Seq[String], tsCol: String,
                          bucketMicros: Long): Unit =
    graft.core.TableIO.writeResumable(
      graft.kg.Temporal.bucketCounts(events, keys, tsCol, bucketMicros)
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")

  /** The burst table as of the committed count deltas (optionally only
    * those with batch_id <= `uptoBatch` — the replay / as-of read). */
  def currentBursts(spark: SparkSession, stateRoot: String,
                    keys: Seq[String], bucketMicros: Long, trailing: Int,
                    numK: Long, denK: Long, minCount: Long = 1L,
                    uptoBatch: Long = Long.MaxValue): DataFrame =
    graft.kg.Temporal.burstsFromCounts(
      graft.core.TableIO.read(spark, stateRoot, "batch_id")
        .withColumn("batch_id", col("batch_id").cast("long"))
        .filter(col("batch_id") <= uptoBatch).drop("batch_id"),
      keys, bucketMicros, trailing, numK, denK, minCount)

  /**
   * Streaming COUNT-MIN frequency sketch (foreachBatch) — the streaming
   * twin of [[graft.ops.Sketches.CmAgg]], and the one dedup/monitoring
   * state machine whose fold needs NO merge logic at read time beyond
   * addition: Count-Min is a LINEAR sketch (cells are sums of per-token
   * indicator vectors), so the per-batch sketches written here sum
   * counterwise to EXACTLY the sketch one [[graft.ops.Sketches.CmAgg]]
   * pass over the full history would build — bit-identical, regardless
   * of how tokens split across batches or how batches were partitioned.
   * That linearity is why the token-frequency monitor can run at ingest
   * with depth·width longs per batch of state and still answer
   * "estimated count of token t over the stream so far" with the exact
   * same deterministic overestimate the batch engine reports.
   *
   * Exactly-once: the delta is a pure function of the batch rows
   * ([[graft.core.TableIO.writeResumable]] makes a replayed write a
   * no-op); [[currentCmSketch]] folds committed deltas only, and an
   * as-of read (`uptoBatch`) reproduces any past sketch exactly.
   */
  def cmBatchStep(tokens: DataFrame, stateRoot: String, batchId: Long,
                  depth: Int = 4, width: Int = 512): Unit = {
    val cm = udaf(new graft.ops.Sketches.CmAgg(depth, width))
    graft.core.TableIO.writeResumable(
      tokens.select(col("token").cast("string"))
        .agg(cm(col("token")).as("cells"))
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
  }

  /**
   * Streaming AMS/CountSketch F2 maintenance (foreachBatch) — the
   * second-moment (self-join size) sketch per group, the last linear
   * sketch in the family beside Count-Min: each batch appends its
   * per-group depth·width cell array plus the batch row count. Cells
   * are plain integer sums, so the counterwise fold equals the one-pass
   * batch sketch EXACTLY at any batch split (the [[cmBatchStep]]
   * property, spec-asserted); state is |groups|·depth·width longs
   * forever, the raw stream is never retained. Replay is a
   * [[graft.core.TableIO.writeResumable]] no-op; `uptoBatch` gives
   * exact as-of reads.
   */
  def amsBatchStep(rows: DataFrame, stateRoot: String, batchId: Long,
                   groupCol: String, keyCol: String,
                   depth: Int = 5, width: Int = 256): Unit = {
    val ams = udaf(new graft.ops.Sketches.AmsAgg(depth, width))
    graft.core.TableIO.writeResumable(
      rows.groupBy(col(groupCol).cast("string").as("group"))
        .agg(count(lit(1)).as("n_rows"),
          ams(col(keyCol).cast("string")).as("cells"))
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
  }

  /** Per-group F2 estimates as of the committed deltas: counterwise fold
    * of the per-batch cell arrays (posexplode + (group, pos) partial
    * aggs — only cell rows shuffle, never tokens), then the same
    * median-of-row-estimates math as the batch
    * [[graft.ops.Sketches.f2Profile]] (exact_f2 is absent by design —
    * the raw stream is gone; that absence is the state bound). */
  def currentF2Profile(spark: SparkSession, stateRoot: String,
                       depth: Int = 5, width: Int = 256,
                       uptoBatch: Long = Long.MaxValue): DataFrame = {
    import spark.implicits._
    val st = graft.core.TableIO.read(spark, stateRoot, "batch_id")
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") <= uptoBatch)
      .localCheckpoint(true)
    val nRows = st.groupBy(col("group")).agg(sum(col("n_rows")).as("n_rows"))
    val folded = st
      .select(col("group"), posexplode(col("cells")).as(Seq("pos", "v")))
      .groupBy(col("group"), col("pos")).agg(sum(col("v")).as("v"))
      .groupBy(col("group"))
      .agg(map_from_arrays(collect_list(col("pos")), collect_list(col("v")))
        .as("cellmap"))
      .as[(String, Map[Int, Long])]
      .map { case (g, m) =>
        val cs = new Array[Long](depth * width)
        m.foreach { case (pos, v) => cs(pos) = v }
        (g, 0L, cs)
      }.toDF("group", "n_ignored", "cells")
    graft.ops.Sketches.amsMedianEstimates(
      folded.select(col("group"), col("n_ignored").as("n_rows"), col("cells")),
      depth, width)
      .select(col("group"), col("est_str").cast("decimal(38,0)").as("est_f2"))
      .join(nRows, "group")
      .select(col("group"), col("n_rows"), col("est_f2"))
  }

  /** The Count-Min sketch as of the committed deltas (optionally only
    * batch_id <= `uptoBatch` — the replay / as-of read): counterwise sum
    * of the per-batch sketches, returned as the bounded driver-side
    * artifact (depth·width longs — the codebook convention) ready for
    * map-only probe evaluation. */
  def currentCmSketch(spark: SparkSession, stateRoot: String,
                      depth: Int = 4, width: Int = 512,
                      uptoBatch: Long = Long.MaxValue): Array[Long] = {
    val folded = graft.core.TableIO.read(spark, stateRoot, "batch_id")
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") <= uptoBatch)
      .select(posexplode(col("cells")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(sum(col("v")).as("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val out = new Array[Long](depth * width)
    folded.foreach { case (pos, v) => out(pos) = v }
    out
  }

  /** Point estimates for `probes` (a `token` column) against a folded
    * sketch: min over the depth hash cells, evaluated as codegen'd
    * expressions with the sketch inlined as a literal — map-only, the
    * [[graft.ops.Sketches.cmTopEstimates]] probe shape. Estimates are
    * deterministic overestimates of the true stream count. */
  def cmEstimate(probes: DataFrame, sketch: Array[Long],
                 depth: Int = 4, width: Int = 512): DataFrame = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth*width ${depth * width}")
    val cells = (0 until depth).map { d =>
      element_at(typedlit(sketch),
        (lit(d * width) + pmod(xxhash64(col("token"), lit(d)),
          lit(width.toLong)) + lit(1)).cast("int"))
    }
    probes.select(col("token").cast("string"))
      .withColumn("cm_est", least(cells: _*))
  }

  /**
   * Streaming KMV DISTINCT sketches (foreachBatch) — the streaming twin
   * of [[graft.ops.Sketches.distinctSketch]]'s per-group bottom-k state:
   * each batch appends its per-group k-minimum-hash sketch to the
   * TableIO delta log (k longs per group per batch). KMV merge is SET
   * union + truncate — associative, commutative, idempotent on
   * duplicates — so [[currentKmvSketches]]'s fold equals the one-pass
   * batch sketch over the full history BIT-FOR-BIT at any batch split:
   * the distinct-cardinality monitor ("unique urls/tokens per slice so
   * far") runs at ingest with bounded state and zero drift from its
   * batch twin. Replay is a [[graft.core.TableIO.writeResumable]] no-op;
   * `uptoBatch` gives exact as-of reads.
   */
  def kmvBatchStep(rows: DataFrame, stateRoot: String, batchId: Long,
                   groupCol: String, keyCol: String, k: Int = 64): Unit = {
    val kmv = udaf(new graft.ops.Sketches.KmvAgg(k))
    graft.core.TableIO.writeResumable(
      rows.withColumn("__h", xxhash64(col(keyCol)))
        .groupBy(col(groupCol).cast("string").as("group"))
        .agg(count(lit(1)).as("n_rows"), kmv(col("__h")).as("r"))
        .select(col("group"), col("n_rows"), col("r.sketch").as("sketch"))
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
  }

  /** Per-group distinct estimates as of the committed deltas: re-merge
    * the per-batch sketches ([[graft.ops.Sketches.KmvMergeAgg]] — one
    * partial-aggregated fold, k-long buffers only), emitting the same
    * (est_distinct, n_kept, kth_hash) surface as the batch operator. */
  def currentKmvSketches(spark: SparkSession, stateRoot: String,
                         k: Int = 64,
                         uptoBatch: Long = Long.MaxValue): DataFrame = {
    val merge = udaf(new graft.ops.Sketches.KmvMergeAgg(k))
    graft.core.TableIO.read(spark, stateRoot, "batch_id")
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") <= uptoBatch)
      .groupBy(col("group"))
      .agg(sum(col("n_rows")).as("n_rows"), merge(col("sketch")).as("r"))
      .select(col("group"), col("n_rows"),
        col("r.est").as("est_distinct"), col("r.n_kept").as("n_kept"),
        element_at(col("r.sketch"), col("r.n_kept")).as("kth_hash"))
  }

  /**
   * Streaming MISRA–GRIES frequent-items summaries (foreachBatch) — the
   * streaming side of [[graft.ops.Sketches.heavyHitters]]'s pass 1: each
   * batch appends its <= k-counter MG summary (token/count arrays, one
   * row per batch) plus the batch row count to the TableIO delta log.
   * State per batch is O(k) forever; the raw token stream is never
   * retained. [[currentMgSummary]] folds the deltas with the mergeable-
   * summaries rule (Agarwal et al., PODS 2012): counterwise sum, then
   * subtract the (k+1)-th largest combined count — every unit ever
   * subtracted from a token (batch decrements AND the merge cut) retires
   * k+1 units of total mass, so across the whole history
   * `true - lb <= N/(k+1)`: every token with true count > N/(k+1) is
   * GUARANTEED present with a positive lower bound. Counts are LOWER
   * BOUNDS, not estimates (the MgAgg contract — order-dependent within a
   * batch, committed once); exactness needs the heavyHitters recount,
   * which requires the raw stream. Replay is a
   * [[graft.core.TableIO.writeResumable]] no-op; `uptoBatch` gives exact
   * as-of reads.
   */
  def mgBatchStep(rows: DataFrame, stateRoot: String, batchId: Long,
                  keyCol: String, k: Int = 64): Unit = {
    val mg = udaf(new graft.ops.Sketches.MgAgg(k))
    graft.core.TableIO.writeResumable(
      rows.agg(mg(col(keyCol).cast("string")).as("c"),
          count(lit(1)).as("n_rows"))
        .select(col("c.tokens").as("tokens"), col("c.lbs").as("lbs"),
          col("n_rows"))
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
  }

  /** Frequent-items lower bounds as of the committed deltas: counterwise
    * sum of the per-batch MG summaries, minus the (k+1)-th largest sum
    * when more than k tokens survive (TakeOrdered(k+1), never a sort of
    * the token table). Emits (token, lb, n_total, err_bound) with
    * err_bound = N div (k+1): lb <= true <= lb + err_bound, and every
    * token with true > err_bound is present. */
  def currentMgSummary(spark: SparkSession, stateRoot: String,
                       k: Int = 64,
                       uptoBatch: Long = Long.MaxValue): DataFrame = {
    val st = graft.core.TableIO.read(spark, stateRoot, "batch_id")
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") <= uptoBatch)
      .localCheckpoint(true)
    val total = st.agg(coalesce(sum(col("n_rows")), lit(0L)).as("n_total"))
    val summed = st
      .select(explode(arrays_zip(col("tokens"), col("lbs"))).as("e"))
      .select(col("e.tokens").as("token"), col("e.lbs").as("cnt"))
      .groupBy(col("token")).agg(sum(col("cnt")).as("cnt"))
      .localCheckpoint(true)
    // merge cut: the (k+1)-th largest combined count (0 when <= k tokens
    // survive). TakeOrdered over a <= k+1-row result — bounded heap per
    // partition, no full sort.
    val top = summed.orderBy(desc("cnt")).limit(k + 1)
      .collect().map(_.getLong(1))
    val cut = if (top.length <= k) 0L else top.min
    summed.filter(col("cnt") > lit(cut))
      .select(col("token"), (col("cnt") - lit(cut)).as("lb"))
      .crossJoin(broadcast(total)) // one-row total
      .withColumn("err_bound", expr(s"n_total div ${k + 1}"))
  }

  /**
   * Streaming FULL-TEXT INDEX maintenance (foreachBatch) — the streaming
   * side of [[graft.ops.Retrieval.bm25TopK]]: each batch of NEWLY-ingested
   * documents appends its inverted-postings delta ((doc_id, term, tf, dl)
   * rows — one explode + one partial-agg groupBy, exactly the batch
   * operator's postings pass over just this batch) plus ONE corpus-scalar
   * row (n_docs, n_tokens) to two TableIO delta logs. Because the doc
   * stream is append-only (re-crawls deduplicate UPSTREAM via the
   * exact-hash / Bloom ingest steps), postings from disjoint batches are
   * disjoint row sets and corpus scalars SUM — the fold is exact: the
   * index as of batch B equals the one-pass batch index over those
   * documents BIT-FOR-BIT at any batch split (spec-asserted). Replay of a
   * crashed batch is a [[graft.core.TableIO.writeResumable]] no-op on
   * both logs; `uptoBatch` on the read side gives exact as-of retrieval
   * (what WOULD this query have returned yesterday — the eval-leak
   * forensics question).
   */
  def postingsBatchStep(docs: DataFrame, stateRoot: String, batchId: Long): Unit = {
    graft.core.TableIO.writeResumable(
      graft.ops.Retrieval.postings(docs).withColumn("batch_id", lit(batchId)),
      s"$stateRoot/postings", "batch_id")
    graft.core.TableIO.writeResumable(
      docs.select(split(col("text"), " ").as("ts"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(size(col("ts")).cast("long")), lit(0L)).as("n_tokens"))
        .withColumn("batch_id", lit(batchId)),
      s"$stateRoot/scalars", "batch_id")
  }

  /** BM25 top-k as of the committed postings deltas: fold the scalar rows
    * (integer sums), read the postings union, and run the SAME
    * [[graft.ops.Retrieval.bm25FromPostings]] core the batch operator
    * uses — scores and ranks identical to a from-scratch batch index
    * over the same documents. */
  def currentBm25TopK(spark: SparkSession, stateRoot: String,
                      queries: DataFrame, k: Int,
                      uptoBatch: Long = Long.MaxValue): DataFrame = {
    val upto = (df: DataFrame) => df
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") <= uptoBatch)
    val sc = upto(graft.core.TableIO.read(spark, s"$stateRoot/scalars", "batch_id"))
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("s")).head()
    val post = upto(graft.core.TableIO.read(spark, s"$stateRoot/postings", "batch_id"))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))
    graft.ops.Retrieval.bm25FromPostings(post, sc.getLong(0), sc.getLong(1),
      queries, k)
  }

  /**
   * Streaming EXACT triangle counting (foreachBatch) — incremental graph
   * maintenance: each batch appends its genuinely-new undirected edges
   * (canonicalized a < b, self-loops dropped, duplicates against all
   * history anti-joined away) plus ONE delta row to a counts log, where
   * the delta is the EXACT number of triangles the batch completed.
   *
   * New-edge-centered enumeration (the incremental bound: per-batch cost
   * is proportional to the new edges' neighborhoods, NEVER a recount of
   * the graph): for each new edge (a, b), every common neighbor c in the
   * union graph closes a candidate triangle; classifying its two side
   * edges as old/new gives the triangle's new-edge count k ∈ {1,2,3},
   * and since a triangle with k new edges is discovered exactly k times
   * (once per new edge), delta = n1 + n2/2 + n3/3 — with the
   * divisibility REQUIRED loudly (any violation means the enumeration
   * lost a case, not a rounding choice). Deltas from disjoint batches
   * SUM to the one-pass batch count at ANY batch split and any arrival
   * order (spec-asserted against [[graft.kg.Graphs.triangles]]); replay
   * is a [[graft.core.TableIO.writeResumable]] no-op on both logs;
   * `uptoBatch` gives exact as-of counts.
   */
  def triangleBatchStep(edges: DataFrame, stateRoot: String, batchId: Long): Unit = {
    val spark = edges.sparkSession
    val canon = edges
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    import spark.implicits._
    val prior =
      if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(stateRoot, "edges", "data")))
        Seq.empty[(Long, Long)].toDF("a", "b")
      else graft.core.TableIO.read(spark, s"$stateRoot/edges", "batch_id")
        .withColumn("batch_id", col("batch_id").cast("long"))
        .filter(col("batch_id") < batchId)
        .select(col("a"), col("b"))
    val newE = canon.join(prior, Seq("a", "b"), "left_anti").localCheckpoint(true)
    graft.core.TableIO.writeResumable(
      newE.withColumn("batch_id", lit(batchId)), s"$stateRoot/edges", "batch_id")
    val union = prior.unionAll(newE).localCheckpoint(true)
    val adj = union.select(col("a").as("x"), col("b").as("y"))
      .unionAll(union.select(col("b").as("x"), col("a").as("y")))
    // candidates: common neighbors of each new edge in the union graph
    val cand = newE
      .join(adj.select(col("x").as("a"), col("y").as("c")), Seq("a"))
      .filter(col("c") =!= col("b"))
      .join(adj.select(col("x").as("b"), col("y").as("c")), Seq("b", "c"))
    val mark = newE.withColumn("is_new", lit(1L))
    def side(u: String, v: String, name: String) = mark.select(
      least(col("a"), col("b")).as(u), greatest(col("a"), col("b")).as(v),
      col("is_new").as(name))
    val classified = cand
      .join(side("s1a", "s1b", "n1"),
        least(col("a"), col("c")) === col("s1a") &&
          greatest(col("a"), col("c")) === col("s1b"), "left")
      .join(side("s2a", "s2b", "n2"),
        least(col("b"), col("c")) === col("s2a") &&
          greatest(col("b"), col("c")) === col("s2b"), "left")
      .select((lit(1L) + coalesce(col("n1"), lit(0L)) +
        coalesce(col("n2"), lit(0L))).as("k"))
    val ks = classified.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (c1, c2, c3) = (ks.getOrElse(1L, 0L), ks.getOrElse(2L, 0L), ks.getOrElse(3L, 0L))
    require(c2 % 2 == 0 && c3 % 3 == 0,
      s"triangle delta multiplicity broken: k=2 rows $c2, k=3 rows $c3 — " +
        "a lost enumeration case, not a rounding choice")
    val nNew = newE.count()
    import spark.implicits._
    graft.core.TableIO.writeResumable(
      Seq((nNew, c1 + c2 / 2 + c3 / 3, batchId))
        .toDF("n_new_edges", "delta_triangles", "batch_id"),
      s"$stateRoot/counts", "batch_id")
  }

  /** Edge and triangle totals as of the committed deltas: two integer
    * sums over the counts log — O(batches) rows, the graph itself never
    * re-enumerates. */
  def currentTriangleCount(spark: SparkSession, stateRoot: String,
                           uptoBatch: Long = Long.MaxValue): DataFrame =
    graft.core.TableIO.read(spark, s"$stateRoot/counts", "batch_id")
      .withColumn("batch_id", col("batch_id").cast("long"))
      .filter(col("batch_id") <= uptoBatch)
      .agg(coalesce(sum(col("n_new_edges")), lit(0L)).as("n_edges"),
        coalesce(sum(col("delta_triangles")), lit(0L)).as("n_triangles"))

  /** Periodic state housekeeping for long-lived streams: rewrite state
    * partitions that accumulated many small files (one per executor per
    * batch). Run between batches (single-writer maintenance window). */
  def compactState(spark: SparkSession, stateRoot: String,
                   maxFilesPerPartition: Int = 8): Seq[String] =
    graft.core.TableIO.compact(spark, stateRoot, "batch_id", maxFilesPerPartition)

  /**
   * Streaming EMBEDDING near-dup — completes the streaming dedup family
   * (exact sha / simhash text / paragraph / Bloom / embedding) for the
   * continuously-landing embedding column (SemDeDup-style semantic
   * dedup at ingest). The [[nearDupBatchStep]] shape exactly:
   *
   *  1. within-batch transitive clustering over verified cosine
   *     near-dup pairs (`Dedup.embeddingNearDup` -> connected
   *     components), representative = min vec_id;
   *  2. representatives sharing a sign-LSH band bucket with ANY vector
   *     kept by a PRIOR batch (state PRE-BANDED; `batch_id < current`
   *     partition-pruned — exact crash replay) are cosine-verified
   *     against those kept vectors and dropped at >= `threshold`;
   *  3. survivors' banded rows — (band, bucket, vec_id, embedding) —
   *     append crash-atomically (`TableIO.writeResumable`). The verify
   *     needs the vector, so it rides the state's band rows (`bands`×
   *     per kept vector; int8 quantization halves deployment footprint,
   *     kept exact here). `compactState` bounds the file count.
   *
   * The cross-batch probe is HOT-BUCKET GUARDED: prior-state buckets
   * holding more than `maxSeenBucket` vectors are excluded from the
   * join LOUDLY (`Dedup.lastDropReport("embeddingNearDupStream")`) —
   * without it a degenerate bucket accumulating over the stream's
   * lifetime turns every batch's verify join quadratic. Default
   * geometry is 64 planes / 4 bands = 16-bit buckets (the simhash band
   * width), so unrelated vectors spread over 65k buckets per band.
   *
   * Returns the kept rows of this batch. Same documented incremental
   * semantics as text near-dup: a chain crossing batches collapses only
   * through kept representatives.
   */
  def embeddingNearDupBatchStep(batch: DataFrame, stateRoot: String,
                                batchId: Long, threshold: Double = 0.95,
                                planes: Int = 64, bands: Int = 4,
                                maxBucket: Int = 256,
                                maxSeenBucket: Int = 1024): DataFrame = {
    import graft.ops.{Dedup, Similarity}
    import graft.core.TableIO
    val spark = batch.sparkSession
    val pairs = Dedup.embeddingNearDup(batch, threshold, planes, bands, maxBucket)
      .select(col("v1").as("src"), col("v2").as("dst"))
    val comp = graft.canon.ConnectedComponents.run(pairs)
    val reps = batch.select(col("vec_id"), col("embedding"))
      .join(comp.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .filter(coalesce(col("component"), col("vec_id")) === col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val stateExists = java.nio.file.Files.exists(
      java.nio.file.Paths.get(stateRoot, "data"))
    val kept =
      if (!stateExists) reps
      else {
        val seen0 = priorBandedState(spark, stateRoot, batchId)
          .select(col("band"), col("bucket"), col("embedding").as("seen_vec"))
          .localCheckpoint()
        // size every prior bucket first (one counter per bucket), drop
        // the hot ones loudly — the idPairsFromBuckets contract applied
        // to the cross-batch state
        val sizes = seen0.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("bsz")).localCheckpoint()
        val dropRow = sizes.filter(col("bsz") > maxSeenBucket)
          .agg(count(lit(1)), coalesce(sum(col("bsz")), lit(0L))).head()
        Dedup.lastDropReport("embeddingNearDupStream") =
          (dropRow.getLong(0), dropRow.getLong(1))
        val seen = seen0.join(
          sizes.filter(col("bsz") <= maxSeenBucket)
            .select(col("band"), col("bucket")), Seq("band", "bucket"))
        val dropped = Dedup.signlshBanded(reps, planes, bands)
          .join(reps, Seq("vec_id"))
          .join(seen, Seq("band", "bucket"))
          .withColumn("cos", Similarity.cosine(col("embedding"), col("seen_vec")))
          .filter(col("cos") >= threshold)
          .select(col("vec_id")).distinct()
        reps.join(dropped, Seq("vec_id"), "left_anti")
      }
    val keptC = kept.localCheckpoint()
    TableIO.writeResumable(
      Dedup.signlshBanded(keptC, planes, bands)
        .join(keptC, Seq("vec_id"))
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")
    batch.join(keptC.select(col("vec_id")), Seq("vec_id"))
  }

  /**
   * Streaming ORDERED FUNNEL (merge-on-read, the [[factUpsertBatchStep]]
   * shape): each micro-batch appends its DISTINCT relevant
   * (key, stage, us) rows as a crash-atomic delta — per-batch cost is ONE
   * stage-filtered scan + ONE map-side distinct, no state read — and the
   * funnel is computed ON READ by the batch operator
   * ([[graft.kg.Temporal.funnel]]) over the folded log. Exact by
   * construction: funnel(union of batches) IS the definition, so LATE
   * events are handled for free — a late stage-1 event re-anchors the
   * key's window and can retract a previously counted completion, a
   * correction no watermark-evicting streaming aggregation can make.
   * Replay of a crashed batch is a `writeResumable` no-op; `uptoBatch`
   * gives as-of reads.
   *
   * State is bounded by [[rebaseFunnelState]] (maintenance window, the
   * [[rebaseFactState]] convention): a row past its key's current
   * deadline (anchor + window) can NEVER qualify later — the anchor only
   * moves earlier, deadlines only shrink — so the rebase drops it,
   * leaving per key only in-window events (for keys not yet entered the
   * funnel, later-stage rows are kept: an earlier anchor may still
   * arrive and qualify them).
   */
  def funnelEventBatchStep(events: DataFrame, stateRoot: String,
                           batchId: Long, keyCol: String, tsCol: String,
                           stageCol: String, stages: Seq[String]): Unit =
    graft.core.TableIO.writeResumable(
      events.filter(col(stageCol).isin(stages: _*))
        .select(col(keyCol).as("k"),
          unix_micros(col(tsCol).cast("timestamp")).as("us"),
          col(stageCol).as("stage"))
        .distinct()
        .withColumn("batch_id", lit(batchId)),
      stateRoot, "batch_id")

  /** The funnel as of the committed deltas (optionally only batch_id <=
    * `uptoBatch` — the replay / as-of read). */
  def currentFunnel(spark: SparkSession, stateRoot: String,
                    stages: Seq[String], windowMicros: Long,
                    uptoBatch: Long = Long.MaxValue): DataFrame =
    graft.kg.Temporal.funnel(
      graft.core.TableIO.read(spark, stateRoot, "batch_id")
        .withColumn("batch_id", col("batch_id").cast("long"))
        .filter(col("batch_id") <= uptoBatch)
        .select(col("k"), timestamp_micros(col("us")).as("ts"), col("stage")),
      "k", "ts", "stage", stages, windowMicros)

  /** Prune + re-base the funnel event log into a fresh generation:
    * drops every row past its key's current deadline (exactness proven
    * in [[funnelEventBatchStep]]'s scaladoc) and folds the survivors
    * into ONE base partition. Single-writer maintenance window;
    * `baseBatchId` must be >= the largest folded batch id. */
  def rebaseFunnelState(spark: SparkSession, oldRoot: String,
                        newRoot: String, stages: Seq[String],
                        windowMicros: Long, baseBatchId: Long): Unit = {
    val log = graft.core.TableIO.read(spark, oldRoot, "batch_id")
      .drop("batch_id").distinct()
    val anchors = log.filter(col("stage") === stages.head)
      .groupBy(col("k")).agg(min(col("us")).as("t0"))
    val kept = log.join(anchors, Seq("k"), "left")
      .filter(col("t0").isNull || col("us") <= col("t0") + windowMicros)
      .drop("t0")
    graft.core.TableIO.writeResumable(
      kept.withColumn("batch_id", lit(baseBatchId)), newRoot, "batch_id")
  }

  def sha256Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** Running per-language totals — custom streaming state via
    * mapGroupsWithState (the micro-batching state hook). */
  final case class LangTotals(lang: String, docs: Long, sentences: Long, tokens: Long)

  def runningTotals(sents: Dataset[Sentence]): Dataset[LangTotals] = {
    val spark = sents.sparkSession
    import spark.implicits._
    sents.groupByKey(_.lang)
      .mapGroupsWithState[LangTotals, LangTotals](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[Sentence], state: GroupState[LangTotals]) =>
          val prev = state.getOption.getOrElse(LangTotals(lang, 0L, 0L, 0L))
          var docs = scala.collection.mutable.Set.empty[String]
          var nSents = 0L
          var nToks = 0L
          rows.foreach { s => docs += s.url; nSents += 1; nToks += s.tokens.size }
          val next = LangTotals(lang, prev.docs + docs.size, prev.sentences + nSents,
            prev.tokens + nToks)
          state.update(next)
          next
      }
  }
}
