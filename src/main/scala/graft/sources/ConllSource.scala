package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** One labeled sentence from a CoNLL file, indexed in file order. */
final case class LabeledSentence(sentIdx: Long, tokens: Seq[String], tags: Seq[String])

/**
 * Distributed CoNLL reader with the reference's exact line semantics
 * (NeuralNERMono/utils/utilsLocal.py:85-182 `readCoNLL`):
 *  - lines stripped; `#`-prefixed lines skipped (:130);
 *  - token = column 0, tag = column `tagField` UPPERCASED (:132-133);
 *  - blank line ends a sentence (:143-146);
 *  - a token ending in the devanagari danda '।' with tag "O" also ends the
 *    sentence; with any other tag it is an ordinary token (:148-163).
 *
 * Two INTENTIONAL robustness deviations from readCoNLL (not parity bugs):
 *  - a file that does not end in a blank line still yields its final
 *    sentence (the reference flushes only on blank lines and silently drops
 *    an unterminated trailing sentence);
 *  - a row with fewer columns than `tagField` is skipped (the reference
 *    raises IndexError and aborts the read).
 * Parity tests against reference-dropped inputs must account for both.
 *
 * Scale shape: sentences can span input-split boundaries, so grouping needs
 * two passes (the classic distributed record-splitting pattern):
 *  pass 1 — per partition, emit only the head fragment (rows before the
 *    first blank), the tail fragment (rows after the last blank), and the
 *    count of fully-contained final sentences: O(numPartitions) data to the
 *    driver, never the corpus;
 *  pass 2 — per partition, re-parse and emit interior sentences with global
 *    indices from a broadcast offset table; the few boundary-spanning
 *    sentences are stitched on the driver and parallelized back in.
 */
object ConllSource {

  private final case class Frag(
      pid: Int,
      head: Vector[(String, String)],
      tail: Vector[(String, String)],
      sawBlank: Boolean,
      nFinalComplete: Long // post-danda-split count of interior sentences
  )

  /** Parse one line. Left(()) = blank (boundary); Right(None) = skip. */
  private def parseLine(line0: String, tagField: Int): Either[Unit, Option[(String, String)]] = {
    val line = line0.trim
    if (line.isEmpty) Left(())
    else if (line.startsWith("#")) Right(None)
    else {
      val cols = graft.text.TextExtract.splitChar(line, '\t')
      if (cols.length <= tagField) Right(None)
      else Right(Some((cols(0), cols(tagField).toUpperCase(java.util.Locale.ROOT))))
    }
  }

  /** Apply the danda rule to one raw (blank-delimited) sentence —
    * utilsLocal.py:146-176 splits it into 0..n final sentences. */
  def dandaSplit(rows: Seq[(String, String)]): Vector[(Vector[String], Vector[String])] = {
    val out = Vector.newBuilder[(Vector[String], Vector[String])]
    var toks = Vector.newBuilder[String]
    var tags = Vector.newBuilder[String]
    var n = 0
    rows.foreach { case (tok, tag) =>
      toks += tok; tags += tag; n += 1
      if (tok.endsWith("।") && tag == "O") {
        out += ((toks.result(), tags.result()))
        toks = Vector.newBuilder; tags = Vector.newBuilder; n = 0
      }
    }
    if (n > 0) out += ((toks.result(), tags.result()))
    out.result()
  }

  /** Interior raw sentences of one partition's line iterator. */
  private def interior(iter: Iterator[String], tagField: Int)(
      emit: Vector[(String, String)] => Unit): Frag = {
    var sawBlank = false
    val head = Vector.newBuilder[(String, String)]
    var cur = Vector.newBuilder[(String, String)]
    var curN = 0
    var nFinal = 0L
    iter.foreach { line =>
      parseLine(line, tagField) match {
        case Left(()) =>
          if (!sawBlank) sawBlank = true
          else if (curN > 0) {
            val s = cur.result()
            nFinal += dandaSplit(s).size
            emit(s)
          }
          cur = Vector.newBuilder; curN = 0
        case Right(Some(row)) =>
          if (!sawBlank) head += row else { cur += row; curN += 1 }
        case Right(None) => ()
      }
    }
    Frag(-1, head.result(), cur.result(), sawBlank, nFinal)
  }

  def read(spark: SparkSession, path: String, tagField: Int = 1,
           minPartitions: Int = 0): Dataset[LabeledSentence] = {
    import spark.implicits._
    val lines = if (minPartitions > 0) spark.sparkContext.textFile(path, minPartitions)
                else spark.sparkContext.textFile(path)
    // ---- pass 1: fragments + counts only
    val frags = lines.mapPartitionsWithIndex { (pid, iter) =>
      Iterator.single(interior(iter, tagField)(_ => ()).copy(pid = pid))
    }.collect().sortBy(_.pid)

    // ---- driver: stitch boundary-spanning sentences, build offset table
    val boundary = Vector.newBuilder[(Long, Vector[String], Vector[String])] // (sentIdx, toks, tags)
    val offsets = new Array[Long](frags.length)
    var pending = Vector.empty[(String, String)]
    var idx = 0L
    frags.foreach { f =>
      if (!f.sawBlank) {
        offsets(f.pid) = idx // partition emits no interior sentences
        pending = pending ++ f.head
      } else {
        val stitched = pending ++ f.head
        if (stitched.nonEmpty) dandaSplit(stitched).foreach { case (t, g) =>
          boundary += ((idx, t, g)); idx += 1
        }
        offsets(f.pid) = idx
        idx += f.nFinalComplete
        pending = f.tail
      }
    }
    if (pending.nonEmpty) dandaSplit(pending).foreach { case (t, g) =>
      boundary += ((idx, t, g)); idx += 1
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)

    // ---- pass 2: interior sentences with global indices (stays distributed)
    val interiorDs = lines.mapPartitionsWithIndex { (pid, iter) =>
      val buf = Vector.newBuilder[Vector[(String, String)]]
      interior(iter, tagField)(s => buf += s)
      var local = bcOffsets.value(pid)
      buf.result().iterator.flatMap(dandaSplit).map { case (t, g) =>
        val s = LabeledSentence(local, t, g)
        local += 1
        s
      }
    }
    val boundaryDs = spark.sparkContext.parallelize(
      boundary.result().map { case (i, t, g) => LabeledSentence(i, t, g) }, 1)
    spark.createDataset(interiorDs.union(boundaryDs))
  }

  /** Corpus stats printed by the reference on read (NeuralNER.py:190-201):
    * sentence count and max sentence length. */
  def stats(ds: Dataset[LabeledSentence]): (Long, Int) = {
    import org.apache.spark.sql.functions._
    val row = ds.toDF().agg(count(lit(1)), max(size(col("tokens")))).head()
    (row.getLong(0), if (row.isNullAt(1)) 0 else row.getInt(1))
  }
}
