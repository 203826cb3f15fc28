package graft.eval

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.ner.Bioes

/** (gold tags, predicted tags) for one sentence. */
final case class TagPair(gold: Seq[String], pred: Seq[String])

/** conlleval counters per entity type: (correct, guessed, gold). */
final case class PrfCounts(counts: Map[String, (Long, Long, Long)]) {
  def merged(other: PrfCounts): PrfCounts = PrfCounts(
    (counts.keySet ++ other.counts.keySet).map { k =>
      val a = counts.getOrElse(k, (0L, 0L, 0L))
      val b = other.counts.getOrElse(k, (0L, 0L, 0L))
      k -> (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    }.toMap)
}

/** One result row per type plus the "ALL" total. */
final case class PrfRow(entityType: String, correct: Long, guessed: Long,
                        gold: Long, precision: Double, recall: Double, f1: Double)

/**
 * Single-pass span-metric aggregation (SURVEY §2.11's optional custom
 * aggregator): one typed Aggregator replaces the three-join formulation in
 * SpanEval for callers that hold (gold, pred) tag pairs per sentence —
 * map-side partial merge, one shuffle of a counts map instead of three
 * mention-level joins. Chunking = Bioes.spans (the conlleval transition
 * tables), so numbers equal SpanEval.prf and the reference perl scorer.
 */
object SpanPrfAggregator extends Aggregator[TagPair, PrfCounts, Seq[PrfRow]] {

  override def zero: PrfCounts = PrfCounts(Map.empty)

  override def reduce(buf: PrfCounts, row: TagPair): PrfCounts = {
    val g = Bioes.spans(row.gold.toIndexedSeq)
    val p = Bioes.spans(row.pred.toIndexedSeq)
    val gSet = g.toSet
    val m = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    def bump(k: String, c: Long, gu: Long, go: Long): Unit = {
      val cur = m.getOrElse(k, (0L, 0L, 0L))
      m(k) = (cur._1 + c, cur._2 + gu, cur._3 + go)
    }
    p.foreach(sp => bump(sp.tpe, if (gSet.contains(sp)) 1L else 0L, 1L, 0L))
    g.foreach(sp => bump(sp.tpe, 0L, 0L, 1L))
    buf.merged(PrfCounts(m.toMap))
  }

  override def merge(a: PrfCounts, b: PrfCounts): PrfCounts = a.merged(b)

  override def finish(buf: PrfCounts): Seq[PrfRow] = {
    def row(tpe: String, c: Long, gu: Long, go: Long): PrfRow = {
      val p = if (gu > 0) c.toDouble / gu else 0.0
      val r = if (go > 0) c.toDouble / go else 0.0
      val f = if (p + r > 0) 2 * p * r / (p + r) else 0.0
      PrfRow(tpe, c, gu, go,
        math.rint(p * 1e6) / 1e6, math.rint(r * 1e6) / 1e6, math.rint(f * 1e6) / 1e6)
    }
    val perType = buf.counts.toSeq.sortBy(_._1).map { case (t, (c, gu, go)) => row(t, c, gu, go) }
    val (tc, tg, tgo) = buf.counts.values.foldLeft((0L, 0L, 0L)) {
      case ((a, b, c2), (x, y, z)) => (a + x, b + y, c2 + z)
    }
    perType :+ row("ALL", tc, tg, tgo)
  }

  override def bufferEncoder: Encoder[PrfCounts] = Encoders.product[PrfCounts]
  override def outputEncoder: Encoder[Seq[PrfRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[PrfRow]]()
}
