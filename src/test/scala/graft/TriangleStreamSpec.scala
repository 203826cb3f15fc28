package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamIngest

class TriangleStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Total triangle count via the batch operator (per-node counts /3). */
  private def batchTotal(edges: Seq[(Long, Long)]): Long =
    if (edges.isEmpty) 0L
    else graft.kg.Graphs.triangles(edges.toDF("src", "dst"))
      .agg(org.apache.spark.sql.functions.sum(col("triangles"))).head().getLong(0) / 3

  // deterministic pseudo-random graph with real triangle density
  private val graph: Seq[(Long, Long)] = (0 until 120).map { i =>
    val h = i * -7046029254386353131L + 11L
    val a = math.floorMod(h, 25L); val b = math.floorMod(h >> 17, 25L)
    (a, b)
  }.filter(e => e._1 != e._2)

  private def run(batches: Seq[Seq[(Long, Long)]]): String = {
    implicit val sq = spark.sqlContext
    val stateRoot = java.nio.file.Files.createTempDirectory("tri_state").toString
    val stream = MemoryStream[(Long, Long)]
    val q = stream.toDS().toDF("a", "b")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamIngest.triangleBatchStep(b, stateRoot, id)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    q.stop()
    stateRoot
  }

  private def totals(root: String, upto: Long = Long.MaxValue): (Long, Long) = {
    val r = StreamIngest.currentTriangleCount(spark, root, upto).head()
    (r.getLong(0), r.getLong(1))
  }

  test("deltas sum to the one-pass batch count at several splits and arrival orders") {
    val want = batchTotal(graph)
    assert(want > 0, "fixture must contain triangles")
    for (splits <- Seq(Seq(graph), graph.grouped(40).toSeq,
      graph.grouped(40).toSeq.reverse, graph.grouped(7).toSeq)) {
      val root = run(splits)
      val (_, tris) = totals(root)
      assert(tris === want, s"splits=${splits.size}")
    }
  }

  test("hand case: a triangle arriving one edge per batch lands in the LAST delta; duplicates never recount") {
    val root = run(Seq(Seq((1L, 2L)), Seq((2L, 3L), (1L, 2L)), Seq((3L, 1L), (2L, 1L))))
    val counts = graft.core.TableIO.read(spark, s"$root/counts", "batch_id")
      .select(col("batch_id").cast("long"), col("n_new_edges"), col("delta_triangles"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts(0L) === ((1L, 0L)))
    assert(counts(1L) === ((1L, 0L)), "the duplicate (1,2) must not re-append")
    assert(counts(2L) === ((1L, 1L)), "closing edge completes exactly one triangle")
    assert(totals(root) === ((3L, 1L)))
  }

  test("as-of reads reproduce each prefix; replay is a no-op") {
    val splits = graph.grouped(40).toSeq
    val root = run(splits)
    for (k <- splits.indices) {
      val prefix = splits.take(k + 1).flatten
      assert(totals(root, upto = k.toLong)._2 === batchTotal(prefix), s"upto=$k")
    }
    val before = totals(root)
    StreamIngest.triangleBatchStep(
      splits.last.toDF("a", "b"), root, (splits.size - 1).toLong)
    assert(totals(root) === before, "replay must be a no-op")
  }

  test("an all-new triangle (k=3 discovery multiplicity) in one batch counts once") {
    val root = run(Seq(Seq((7L, 8L), (8L, 9L), (9L, 7L))))
    assert(totals(root) === ((3L, 1L)))
  }
}
