package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-data preparation for KG-embedding models (TransE / DistMult
 * family, Bordes et al. 2013): deterministic FILTERED negative sampling —
 * for every true triple, k corrupted twins whose object is replaced by a
 * hash-picked entity, with corruptions that happen to be true triples
 * removed (the "filtered" setting every published benchmark uses; an
 * unfiltered negative that is actually true teaches the model to reject
 * facts). The reference pipeline stops at NER output; embedding-training
 * prep is part of this engine's KG-construction surface, the same way the
 * curation chain prepares LLM text.
 *
 * Determinism: the candidate for (triple, slot) is
 * `entity[ pmod(xxhash64(subj, pred, obj, slot, seed), |E|) ]` over the
 * id-sorted entity universe — a pure function of the triple set, so any
 * two runs (and the sequential golden twin) agree bit-for-bit; no RNG
 * state, no partition sensitivity.
 *
 * 100 TB shape: the entity universe gets dense indices via ONE sort +
 * zipWithIndex (the canonical dense-rank-at-scale construction — a
 * row_number window with no partition key would collapse the table to a
 * single partition; the entity table is orders of magnitude smaller than
 * the triple table, so this RDD hop is the cheap side). Candidates are
 * map-side hashing + one 8-byte-key equi-join against the entity index +
 * one anti-join against the true-triple set — linear in k·|triples|,
 * every shuffle on integer keys, no driver state.
 */
object Embedding {

  /**
   * @param triplesIn rows with (subj, pred, obj); duplicates collapse
   * @param k    corruption slots per true triple (slot = 0..k-1)
   * @param seed chain seed mixed into the candidate hash
   * @return (subj, pred, obj, slot, neg_obj) — one row per surviving
   *         corruption; slots whose candidate equals a TRUE triple are
   *         filtered out, so a triple can emit fewer than k rows (the
   *         filtered-sampling contract — callers wanting exactly k
   *         resample with a different seed).
   */
  /**
   * Deterministic FILTERED link-prediction holdout (the FB15k/WN18 split
   * discipline): tag ~testNum/testDen of the distinct triples as test by
   * `pmod(xxhash64(subj, pred, obj, seed), testDen) < testNum`, then
   * DEMOTE back to train every test triple whose subject, object or
   * predicate never appears in the train partition — an embedding model
   * cannot score an entity it has no training signal for, so an
   * unfiltered holdout silently measures noise on those rows. Demotion
   * only ADDS rows to train, so the kept test rows stay valid against
   * the final train set (one pass suffices; no fixpoint).
   *
   * Purely hash-driven: the split is a function of the triple set alone —
   * bit-identical at any partitioning, any run, and in the sequential
   * golden twin. Shape: one hash tag over the scan, the train
   * entity/predicate universes (small sides), three semi-joins + one
   * anti-join on the test MINORITY — the full corpus shuffles once (the
   * distinct); everything else is keyed joins on the test slice.
   *
   * @return (subj, pred, obj, split) with split in {"train", "test"}
   */
  def linkPredictionSplit(triplesIn: DataFrame, testNum: Long, testDen: Long,
                          seed: Long = 0L): DataFrame = {
    require(testDen >= 1 && testNum >= 0 && testNum <= testDen,
      "need 0 <= testNum <= testDen, testDen >= 1")
    val t = triplesIn.select(col("subj").cast("long"), col("pred"),
      col("obj").cast("long")).distinct().localCheckpoint(true)
    val tagged = t.withColumn("__t",
      pmod(xxhash64(col("subj"), col("pred"), col("obj"), lit(seed)),
        lit(testDen)) < lit(testNum))
    val train0 = tagged.filter(!col("__t")).drop("__t").localCheckpoint(true)
    val test0 = tagged.filter(col("__t")).drop("__t")
    val ents = train0.select(col("subj").as("id"))
      .unionAll(train0.select(col("obj").as("id"))).distinct()
      .localCheckpoint(true)
    val preds = train0.select(col("pred")).distinct().localCheckpoint(true)
    val kept = test0
      .join(ents.select(col("id").as("subj")), Seq("subj"), "left_semi")
      .join(ents.select(col("id").as("obj")), Seq("obj"), "left_semi")
      .join(preds, Seq("pred"), "left_semi")
      .select(col("subj"), col("pred"), col("obj"))
    val demoted = test0.join(kept, Seq("subj", "pred", "obj"), "left_anti")
    train0.unionAll(demoted).withColumn("split", lit("train"))
      .unionAll(kept.withColumn("split", lit("test")))
      .select(col("subj"), col("pred"), col("obj"), col("split"))
  }

  def negativeSamples(triplesIn: DataFrame, k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = triplesIn.sparkSession
    val t = triplesIn.select(col("subj").cast("long"), col("pred"),
      col("obj").cast("long")).distinct().localCheckpoint(true)
    // dense 0..n-1 index over the id-sorted entity universe
    val ents = t.select(col("subj").as("id")).unionAll(t.select(col("obj").as("id")))
      .distinct()
    val indexed = {
      import spark.implicits._
      ents.orderBy(col("id")).rdd.map(_.getLong(0)).zipWithIndex()
        .map { case (id, idx) => (idx, id) }.toDF("cand_idx", "neg_obj")
        .localCheckpoint(true)
    }
    val n = indexed.count()
    val cands = t
      .select(col("subj"), col("pred"), col("obj"),
        explode(sequence(lit(0), lit(k - 1))).as("slot"))
      .withColumn("cand_idx",
        pmod(xxhash64(col("subj"), col("pred"), col("obj"), col("slot"),
          lit(seed)), lit(n)))
    cands.join(indexed, Seq("cand_idx"))
      // filtered setting: drop corruptions that are themselves true triples
      // (covers neg_obj == obj, since (subj, pred, obj) is in t)
      .join(t.withColumnRenamed("obj", "neg_obj"),
        Seq("subj", "pred", "neg_obj"), "left_anti")
      .select(col("subj"), col("pred"), col("obj"), col("slot"), col("neg_obj"))
  }

  /**
   * TransE-style triple plausibility scoring (Bordes et al. 2013) in
   * EXACT integer arithmetic — embedding-based KG ERROR DETECTION: rank
   * each extracted triple by how badly it violates its predicate's
   * translation vector, so the worst offenders surface for audit. The
   * serving-side complement of [[negativeSamples]]/[[linkPredictionSplit]]
   * (which PREPARE embedding training data): here a trained entity table
   * scores the graph itself.
   *
   * Closed-form relation fit: TransE wants e_s + r_p ≈ e_o, whose
   * least-squares r_p is the MEAN translation mean(q_o − q_s) over the
   * predicate's triples. To keep every number an integer (engine-exact,
   * shuffle-order invariant, oracle-replayable bit-for-bit) the residual
   * is scaled by the predicate count — no division ever happens:
   *
   *   score(s,p,o) = Σ_i | Σ_(s',o')∈p (q_o'[i] − q_s'[i])
   *                        − cnt_p · (q_o[i] − q_s[i]) |
   *                = cnt_p · Σ_i | q_s[i] + r_p[i] − q_o[i] |
   *
   * — the same PER-PREDICATE ranking as the float L1 residual.
   * Embeddings quantize as floor(x · scale): float32→double is exact and
   * multiplication by a power of two is exact, so any two engines see
   * identical integers. Sums stay in longs; under ANSI mode an overflow
   * (scale · dim · cnt_p beyond 2^63 — requires ~10^14 triples on one
   * predicate at the default scale) fails LOUDLY rather than wrapping.
   *
   * 100 TB shape: the entity-vector table joins the triple table twice
   * on 8-byte ids (the big-side shuffles Spark plans as sort-merge or,
   * when the vector table fits, broadcast); the model is ONE
   * posexplode + partial-aggregated (pred, dim) sum — state bounded by
   * |preds| · dim — rebuilt into arrays with a bounded collect_list; the
   * scoring pass is map-only against the broadcast model. Triples whose
   * entity has no vector are DROPPED (inner join) — score what the
   * embedding can see, loudly countable by the caller as in − out.
   *
   * @param entVecsIn (id, vec: array<float|double>) — one vector per
   *                  entity; duplicate ids are a caller error (they
   *                  would double-score triples)
   * @return (subj, pred, obj, score) — score ≥ 0, larger = less
   *         plausible under the predicate's translation model
   */
  def transeScores(triplesIn: DataFrame, entVecsIn: DataFrame,
                   scale: Long = 1024L): DataFrame = {
    require(scale > 0, "scale must be > 0")
    val t = triplesIn.select(col("subj").cast("long"), col("pred"),
      col("obj").cast("long")).distinct()
    // quantized integer embeddings — materialized (localCheckpoint)
    // because HOF lambdas inline their argument expression per use
    val q = entVecsIn.select(col("id").cast("long"),
      transform(col("vec"), x => floor(x.cast("double") * scale)).as("q"))
      .localCheckpoint(true)
    val joined = t
      .join(q.select(col("id").as("subj"), col("q").as("qs")), Seq("subj"))
      .join(q.select(col("id").as("obj"), col("q").as("qo")), Seq("obj"))
      .withColumn("diff", zip_with(col("qo"), col("qs"), (o, s) => o - s))
      .localCheckpoint(true) // feeds the model agg AND the scoring pass
    // per-predicate translation: Σ(q_o − q_s) per dimension, rebuilt as
    // an array ordered by dimension (collect_list state bounded by dim)
    val rsum = joined
      .select(col("pred"), posexplode(col("diff")).as(Seq("i", "d")))
      .groupBy(col("pred"), col("i")).agg(sum(col("d")).as("s"))
      .groupBy(col("pred"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("s")))),
        x => x.getField("s")).as("rsum"))
    val cnt = joined.groupBy(col("pred")).agg(count(lit(1)).as("cnt"))
    joined
      .join(broadcast(rsum), Seq("pred"))
      .join(broadcast(cnt), Seq("pred"))
      .withColumn("resid", zip_with(col("rsum"), col("diff"),
        (r, d) => abs(r - col("cnt") * d)))
      .select(col("subj"), col("pred"), col("obj"),
        aggregate(col("resid"), lit(0L), (acc, x) => acc + x).as("score"))
  }
}
