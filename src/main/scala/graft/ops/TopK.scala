package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One ranked neighbor of a top-k result (rank 1 = best). */
final case class RankedId(neighbor_id: Long, rank: Int)

/** Bounded top-k buffer: parallel arrays sorted best-first by
  * (key DESC, id ASC); length <= k always. */
final case class TopKBuf(keys: Array[Double], ids: Array[Long])

/**
 * Bounded top-k-per-group aggregation — the scale replacement for
 * `row_number() over (partition by group order by key desc, id asc)`:
 * a window moves EVERY candidate row of a group into one task and sorts
 * it (a 10^10-row candidate list per query exchanges to ONE task in the
 * ANN scan family), while this typed Aggregator (the `Sketches.KmvAgg`
 * pattern — a TypedImperativeAggregate under ObjectHashAggregate) keeps
 * an O(k) sorted buffer per group, reduces MAP-SIDE, and shuffles only
 * k-entry buffers. Cost per group: O(n log k) reduce + O(p·k) merge.
 *
 * ORDER CONTRACT (identical to the windows it replaces AND to the
 * sequential twins): best first by key DESC then id ASC, ranks 1..k.
 * Key comparison is `java.lang.Double.compare` — a TOTAL order (NaN
 * sorts largest, i.e. first under DESC, exactly as Spark's window
 * ordering treats NaN; the -0.0 < 0.0 distinction matches the twins'
 * `Ordering.Double.TotalOrdering`). Rounding is the CALLER's choice:
 * pass `round(score, 9)` (the oracle contract of the ANN rankers) or a
 * raw column — the aggregator ranks exactly what it is given.
 */
final class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, Array[RankedId]] {
  require(k >= 1, "k must be >= 1")

  /** true iff (ka, ia) ranks strictly before (kb, ib). */
  private def better(ka: Double, ia: Long, kb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(ka, kb)
    c > 0 || (c == 0 && ia < ib)
  }

  override def zero: TopKBuf = TopKBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = {
    val (key, id) = in
    val n = b.keys.length
    // insertion point = number of existing entries that rank before (key, id)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(b.keys(mid), b.ids(mid), key, id)) lo = mid + 1 else hi = mid
    }
    if (lo >= k) b // not among the k best
    else {
      val m = math.min(n + 1, k)
      val ks = new Array[Double](m); val vs = new Array[Long](m)
      System.arraycopy(b.keys, 0, ks, 0, lo)
      System.arraycopy(b.ids, 0, vs, 0, lo)
      ks(lo) = key; vs(lo) = id
      System.arraycopy(b.keys, lo, ks, lo + 1, m - lo - 1)
      System.arraycopy(b.ids, lo, vs, lo + 1, m - lo - 1)
      TopKBuf(ks, vs)
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    if (b.keys.isEmpty) return a
    if (a.keys.isEmpty) return b
    val m = math.min(a.keys.length + b.keys.length, k)
    val ks = new Array[Double](m); val vs = new Array[Long](m)
    var i = 0; var j = 0; var n = 0
    while (n < m) {
      val takeA = j >= b.keys.length ||
        (i < a.keys.length && better(a.keys(i), a.ids(i), b.keys(j), b.ids(j)))
      if (takeA) { ks(n) = a.keys(i); vs(n) = a.ids(i); i += 1 }
      else { ks(n) = b.keys(j); vs(n) = b.ids(j); j += 1 }
      n += 1
    }
    TopKBuf(ks, vs)
  }

  override def finish(b: TopKBuf): Array[RankedId] =
    Array.tabulate(b.keys.length)(i => RankedId(b.ids(i), i + 1))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Array[RankedId]] =
    ExpressionEncoder[Array[RankedId]]()
}

/** One ranked fact of an entity card (rank 1 = most informative); the
  * object column keeps its source type `O` (entity id Long in the
  * canonical KG, String for literal objects). */
final case class RankedFact[O](pred: String, obj: O, pred_df: Long, rank: Long)

/** Bounded fact-rank buffer: parallel arrays sorted best-first by
  * (pred_df ASC, pred ASC, obj ASC); length <= k always. */
final case class FactBuf[O](dfs: Array[Long], preds: Array[String], objs: Array[O])

/** UTF-8 byte-wise string order — the binary collation BOTH Spark and the
  * DuckDB oracle sort strings by (Java's String.compareTo is UTF-16
  * code-unit order, which disagrees above the BMP). */
private[ops] object Utf8Ordering extends Ordering[String] {
  def compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0; val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }
}

/**
 * Bounded top-k fact ranking per subject — [[graft.kg.Triples.entityCard]]'s
 * (pred_df ASC, pred ASC, obj ASC) election as an O(k)-state Aggregator,
 * replacing the per-subject `row_number` window: a celebrity entity with
 * 10^7 facts previously sorted them all in one task; now each map-side
 * partial keeps only k facts. Generic in the object column's type `O`
 * (Long entity ids order numerically, String literals byte-wise UTF-8 —
 * each matching the window/oracle ordering of that column type).
 */
final class FactRankAgg[O: Ordering: scala.reflect.ClassTag](k: Int)(
    implicit bufEnc: Encoder[FactBuf[O]], outEnc: Encoder[Array[RankedFact[O]]])
  extends Aggregator[(Long, String, O), FactBuf[O], Array[RankedFact[O]]] {
  require(k >= 1, "k must be >= 1")

  private val objOrd = implicitly[Ordering[O]]

  /** true iff fact a ranks strictly before fact b. */
  private def better(dfA: Long, pA: String, oA: O,
                     dfB: Long, pB: String, oB: O): Boolean = {
    if (dfA != dfB) return dfA < dfB
    val cp = Utf8Ordering.compare(pA, pB)
    if (cp != 0) return cp < 0
    objOrd.compare(oA, oB) < 0
  }

  override def zero: FactBuf[O] =
    FactBuf(Array.emptyLongArray, Array.empty[String], Array.empty[O])

  override def reduce(b: FactBuf[O], in: (Long, String, O)): FactBuf[O] = {
    val (df, pred, obj) = in
    val n = b.dfs.length
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(b.dfs(mid), b.preds(mid), b.objs(mid), df, pred, obj)) lo = mid + 1
      else hi = mid
    }
    if (lo >= k) b
    else {
      val m = math.min(n + 1, k)
      val ds = new Array[Long](m)
      val ps = new Array[String](m)
      val os = new Array[O](m)
      System.arraycopy(b.dfs, 0, ds, 0, lo)
      System.arraycopy(b.preds, 0, ps, 0, lo)
      Array.copy(b.objs, 0, os, 0, lo)
      ds(lo) = df; ps(lo) = pred; os(lo) = obj
      System.arraycopy(b.dfs, lo, ds, lo + 1, m - lo - 1)
      System.arraycopy(b.preds, lo, ps, lo + 1, m - lo - 1)
      Array.copy(b.objs, lo, os, lo + 1, m - lo - 1)
      FactBuf(ds, ps, os)
    }
  }

  override def merge(a: FactBuf[O], b: FactBuf[O]): FactBuf[O] = {
    if (b.dfs.isEmpty) return a
    if (a.dfs.isEmpty) return b
    val m = math.min(a.dfs.length + b.dfs.length, k)
    val ds = new Array[Long](m)
    val ps = new Array[String](m)
    val os = new Array[O](m)
    var i = 0; var j = 0; var n = 0
    while (n < m) {
      val takeA = j >= b.dfs.length || (i < a.dfs.length &&
        better(a.dfs(i), a.preds(i), a.objs(i), b.dfs(j), b.preds(j), b.objs(j)))
      if (takeA) { ds(n) = a.dfs(i); ps(n) = a.preds(i); os(n) = a.objs(i); i += 1 }
      else { ds(n) = b.dfs(j); ps(n) = b.preds(j); os(n) = b.objs(j); j += 1 }
      n += 1
    }
    FactBuf(ds, ps, os)
  }

  override def finish(b: FactBuf[O]): Array[RankedFact[O]] =
    Array.tabulate(b.dfs.length)(i => RankedFact(b.preds(i), b.objs(i), b.dfs(i), i + 1L))

  override def bufferEncoder: Encoder[FactBuf[O]] = bufEnc
  override def outputEncoder: Encoder[Array[RankedFact[O]]] = outEnc
}

/** One ranked integer-scored result (rank 1 = best, score exact Long). */
final case class RankedScored(neighbor_id: Long, score: Long, rank: Int)

/** Bounded integer-keyed top-k buffer: parallel arrays sorted best-first
  * by (score DESC, id ASC); length <= k always. */
final case class TopKLongBuf(scores: Array[Long], ids: Array[Long])

/**
 * [[TopKAgg]] with EXACT Long keys — for integer-scored rankings (the
 * scaled-rational BM25 scores, any cross-multiplied fixed-point score)
 * where a Double key would silently lose exactness past 2^53. Same
 * bounded O(k)-state / map-side-partial discipline; the score rides the
 * output so callers need no rejoin to recover it.
 */
final class TopKLongAgg(k: Int)
  extends Aggregator[(Long, Long), TopKLongBuf, Array[RankedScored]] {
  require(k >= 1, "k must be >= 1")

  /** true iff (sa, ia) ranks strictly before (sb, ib). */
  private def better(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa > sb || (sa == sb && ia < ib)

  override def zero: TopKLongBuf =
    TopKLongBuf(Array.emptyLongArray, Array.emptyLongArray)

  override def reduce(b: TopKLongBuf, in: (Long, Long)): TopKLongBuf = {
    val (score, id) = in
    val n = b.scores.length
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(b.scores(mid), b.ids(mid), score, id)) lo = mid + 1 else hi = mid
    }
    if (lo >= k) b
    else {
      val m = math.min(n + 1, k)
      val ss = new Array[Long](m); val vs = new Array[Long](m)
      System.arraycopy(b.scores, 0, ss, 0, lo)
      System.arraycopy(b.ids, 0, vs, 0, lo)
      ss(lo) = score; vs(lo) = id
      System.arraycopy(b.scores, lo, ss, lo + 1, m - lo - 1)
      System.arraycopy(b.ids, lo, vs, lo + 1, m - lo - 1)
      TopKLongBuf(ss, vs)
    }
  }

  override def merge(a: TopKLongBuf, b: TopKLongBuf): TopKLongBuf = {
    if (b.scores.isEmpty) return a
    if (a.scores.isEmpty) return b
    val m = math.min(a.scores.length + b.scores.length, k)
    val ss = new Array[Long](m); val vs = new Array[Long](m)
    var i = 0; var j = 0; var n = 0
    while (n < m) {
      val takeA = j >= b.scores.length ||
        (i < a.scores.length && better(a.scores(i), a.ids(i), b.scores(j), b.ids(j)))
      if (takeA) { ss(n) = a.scores(i); vs(n) = a.ids(i); i += 1 }
      else { ss(n) = b.scores(j); vs(n) = b.ids(j); j += 1 }
      n += 1
    }
    TopKLongBuf(ss, vs)
  }

  override def finish(b: TopKLongBuf): Array[RankedScored] =
    Array.tabulate(b.scores.length)(i => RankedScored(b.ids(i), b.scores(i), i + 1))

  override def bufferEncoder: Encoder[TopKLongBuf] = Encoders.product[TopKLongBuf]
  override def outputEncoder: Encoder[Array[RankedScored]] =
    ExpressionEncoder[Array[RankedScored]]()
}

object TopK {

  /**
   * EXACT integer-keyed variant of [[rankTopK]]: rank the k best rows per
   * `queryCol` group by (`key` DESC, `idCol` ASC) where `key` is an
   * integral score (no 2^53 double-precision cliff), and keep the score
   * in the output. Returns (queryCol, neighbor_id, score, rank), rank
   * 1..k. Same plan shape as [[rankTopK]]: ObjectHashAggregate with a
   * map-side partial — only k-entry buffers shuffle, no Window.
   */
  def rankTopKLong(scored: DataFrame, queryCol: String, idCol: String,
                   key: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKLongAgg(k), ExpressionEncoder[(Long, Long)]())
    scored
      .groupBy(col(queryCol))
      .agg(agg(key.cast("long"), col(idCol).cast("long")).as("top"))
      .select(col(queryCol), explode(col("top")).as("p"))
      .select(col(queryCol), col("p.neighbor_id").as("neighbor_id"),
        col("p.score").as("score"), col("p.rank").as("rank"))
  }

  /**
   * Rank the k best rows per `queryCol` group by (`key` DESC, `idCol` ASC)
   * — the shared ranking tail of the ANN family (`bruteForceTopK`, IVF,
   * PQ, IVF-PQ). Returns (queryCol, neighbor_id, rank:int), rank 1..k.
   * Plan shape: ObjectHashAggregate with a map-side partial (only k-entry
   * buffers shuffle) + one explode — no Window, no per-group sort
   * (plan-tested in PlanSpec).
   */
  def rankTopK(scored: DataFrame, queryCol: String, idCol: String,
               key: Column, k: Int): DataFrame = {
    val agg = udaf(new TopKAgg(k), ExpressionEncoder[(Double, Long)]())
    scored
      .groupBy(col(queryCol))
      .agg(agg(key.cast("double"), col(idCol).cast("long")).as("top"))
      .select(col(queryCol), explode(col("top")).as("p"))
      .select(col(queryCol), col("p.neighbor_id").as("neighbor_id"),
        col("p.rank").as("rank"))
  }

  /**
   * Entity-card fact election over a (subj, pred, obj, pred_df) frame:
   * top-k facts per subj by (pred_df ASC, pred ASC, obj ASC) via the
   * bounded [[FactRankAgg]], dispatched on the obj column's type so each
   * type keeps its NATIVE ordering (integral ids numerically — an
   * integral obj is emitted as long; strings byte-wise UTF-8, the
   * Spark/DuckDB binary collation). Returns
   * (subj, pred, obj, pred_df, rank) with rank 1..k per subject.
   */
  def rankFacts(withDf: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val unpack = (df: DataFrame) => df
      .select(col("subj"), explode(col("card")).as("f"))
      .select(col("subj"), col("f.pred").as("pred"), col("f.obj").as("obj"),
        col("f.pred_df").as("pred_df"), col("f.rank").as("rank"))
    withDf.schema("obj").dataType match {
      case StringType =>
        val agg = udaf(
          new FactRankAgg[String](k)(Utf8Ordering,
            implicitly[scala.reflect.ClassTag[String]],
            ExpressionEncoder[FactBuf[String]](),
            ExpressionEncoder[Array[RankedFact[String]]]()),
          ExpressionEncoder[(Long, String, String)]())
        unpack(withDf.groupBy(col("subj"))
          .agg(agg(col("pred_df").cast("long"), col("pred"), col("obj")).as("card")))
      case LongType | IntegerType | ShortType | ByteType =>
        val agg = udaf(
          new FactRankAgg[Long](k)(implicitly[Ordering[Long]],
            implicitly[scala.reflect.ClassTag[Long]],
            ExpressionEncoder[FactBuf[Long]](),
            ExpressionEncoder[Array[RankedFact[Long]]]()),
          ExpressionEncoder[(Long, String, Long)]())
        unpack(withDf.groupBy(col("subj"))
          .agg(agg(col("pred_df").cast("long"), col("pred"),
            col("obj").cast("long")).as("card")))
      case other =>
        throw new IllegalArgumentException(
          s"rankFacts: unsupported obj column type $other (expected string or integral)")
    }
  }
}
