package graft

import org.apache.spark.sql.functions._
import graft.core.TableIO
import graft.functions.ZOrder2

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 interleaves bits exactly (hand cases + random twin)") {
    assert(ZOrder2.compute(0L, 0L) == 0L)
    assert(ZOrder2.compute(1L, 0L) == 2L) // a's bit 0 -> z bit 1
    assert(ZOrder2.compute(0L, 1L) == 1L) // b's bit 0 -> z bit 0
    assert(ZOrder2.compute(3L, 1L) == 11L) // 0b1011
    def twin(a: Long, b: Long): Long =
      (0 until 32).foldLeft(0L) { (z, j) =>
        z | (((a >>> j) & 1L) << (2 * j + 1)) | (((b >>> j) & 1L) << (2 * j))
      }
    val rnd = (0 until 200).map(i => (i * 2654435761L & 0xffffffffL,
      (i * -7046029254386353131L) & 0xffffffffL))
    rnd.foreach { case (a, b) =>
      assert(ZOrder2.compute(a, b) == twin(a, b), s"($a,$b)") }
  }

  /** Per-file (min,max) of a column across the part files of a dir. */
  private def fileRanges(dir: String, c: String): Seq[(Long, Long)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      (r.getLong(0), r.getLong(1))
    }
  }

  test("z-ordered layout prunes a one-dimension band query that a linear sort cannot") {
    // 64x64 grid; buckets = 64 makes the bucket map the identity, so 16
    // files of 256 consecutive z codes are aligned 16x16 quadtree tiles
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = grid.toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    TableIO.clusterBy(df, "x", "y", zDir, nFiles = 16, buckets = 64)
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linDir)
    def intersecting(dir: String, c: String, lo: Long, hi: Long): Int =
      fileRanges(dir, c).count { case (mn, mx) => mx >= lo && mn <= hi }
    // band query: y in [16, 20), all x — the dimension the linear layout
    // ignores. Every x-sorted file spans the full y range; the z layout
    // confines the band to one 16-row tile stripe.
    val zFiles = intersecting(zDir, "y", 16L, 19L)
    val linFiles = intersecting(linDir, "y", 16L, 19L)
    assert(linFiles == 16, s"x-sorted layout must not prune y: $linFiles")
    assert(zFiles <= 6, s"z-ordered layout must confine the band: $zFiles files")
    // both layouts keep every row
    assert(spark.read.parquet(zDir).count() == 4096L &&
      spark.read.parquet(linDir).count() == 4096L)
    // and the x dimension still prunes under z too (square-box query)
    val zX = intersecting(zDir, "x", 0L, 15L)
    assert(zX <= 6, s"z layout must also prune x: $zX")
  }

  test("clusterBy handles constant and empty inputs") {
    val cDir = java.nio.file.Files.createTempDirectory("zc").toString + "/t"
    TableIO.clusterBy(Seq((1L, 5L), (2L, 5L)).toDF("x", "y"), "x", "y", cDir, 2)
    assert(spark.read.parquet(cDir).count() == 2L)
    val eDir = java.nio.file.Files.createTempDirectory("ze").toString + "/t"
    TableIO.clusterBy(Seq.empty[(Long, Long)].toDF("x", "y"), "x", "y", eDir, 2)
    assert(spark.read.parquet(eDir).count() == 0L)
  }
}
