package graft

import graft.core.{LineageRow, TableIO}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TableIOSpec extends SparkSpec {

  test("resumable write: second run skips committed partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("tableio").toString
    val df1 = Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
    val written1 = TableIO.writeResumable(df1, root, "lang")
    assert(written1 == Seq("de", "en"))
    // resume with one new partition: only "fr" is written
    val df2 = Seq((1L, "en"), (4L, "fr")).toDF("id", "lang")
    val written2 = TableIO.writeResumable(df2, root, "lang")
    assert(written2 == Seq("fr"))
    // a fully-covered rerun writes nothing
    assert(TableIO.writeResumable(df2, root, "lang").isEmpty)
    val back = TableIO.read(spark, root)
    assert(back.count() == 4) // 3 from run 1 + fr row (en row of df2 skipped)
    assert(TableIO.completedPartitions(root) == Set("en", "de", "fr"))
    assert(TableIO.listSnapshots(root).map(_.id) == Seq(0, 1))
  }

  test("crash between append and snapshot commit: resume rewrites, never duplicates") {
    import spark.implicits._
    val root = Files.createTempDirectory("tableio-crash").toString
    val df = Seq((1L, "en"), (2L, "en"), (3L, "de")).toDF("id", "lang")
    // simulate the failure window: files landed, snapshot commit never ran
    df.write.mode("append").partitionBy("lang").parquet(s"$root/data")
    assert(TableIO.completedPartitions(root).isEmpty)
    // snapshot-consistent read sees nothing of the half-written state
    assert(TableIO.read(spark, root, "lang").count() == 0)
    // resume: both partitions are still todo -> their leftover dirs are
    // deleted before the rewrite, so the data is NOT doubled
    val written = TableIO.writeResumable(df, root, "lang")
    assert(written == Seq("de", "en"))
    assert(TableIO.read(spark, root).count() == 3)
    assert(TableIO.read(spark, root, "lang").count() == 3)
    // second resume is a no-op
    assert(TableIO.writeResumable(df, root, "lang").isEmpty)
    assert(TableIO.read(spark, root, "lang").count() == 3)
  }

  test("time travel: readAt(snapshot) sees only that snapshot's partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("tableio-tt").toString
    TableIO.writeResumable(Seq((1L, "en"), (2L, "de")).toDF("id", "lang"), root, "lang")
    TableIO.writeResumable(Seq((3L, "fr")).toDF("id", "lang"), root, "lang")
    assert(TableIO.readAt(spark, root, "lang", 0).count() == 2)
    assert(TableIO.readAt(spark, root, "lang", 1).count() == 3)
    intercept[IllegalArgumentException](TableIO.readAt(spark, root, "lang", 9))
  }

  test("compaction rewrites many-file partitions without changing rows") {
    import spark.implicits._
    val root = Files.createTempDirectory("tableio-compact").toString
    // a fragmented partition: 12 separate appends -> 12 files under lang=en
    (1 to 12).foreach { i =>
      Seq((i.toLong, s"t$i", "en")).toDF("id", "v", "lang")
        .coalesce(1).write.mode("append").partitionBy("lang").parquet(s"$root/data")
    }
    TableIO.commitSnapshot(root, Seq("en"))
    val before = TableIO.read(spark, root, "lang").collect().map(_.toString).sorted
    def nFiles = Files.list(java.nio.file.Paths.get(root, "data", "lang=en"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(nFiles >= 12)
    val rewritten = TableIO.compact(spark, root, "lang", maxFilesPerPartition = 8, targetFiles = 1)
    assert(rewritten == Seq("en"))
    assert(nFiles == 1, s"expected 1 file after compaction, got $nFiles")
    val after = TableIO.read(spark, root, "lang").collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
    // idempotent: already-compacted partitions are left alone
    assert(TableIO.compact(spark, root, "lang", 8, 1).isEmpty)
  }

  test("compaction crash inside the rename swap heals on next read") {
    import spark.implicits._
    val root = Files.createTempDirectory("tableio-crash").toString
    Seq((1L, "a", "en"), (2L, "b", "en")).toDF("id", "v", "lang")
      .write.partitionBy("lang").parquet(s"$root/data")
    TableIO.commitSnapshot(root, Seq("en"))
    val before = TableIO.read(spark, root, "lang").collect().map(_.toString).sorted
    // simulate a crash between compact's two renames: the partition dir was
    // moved aside to .old, the rewritten tmp never landed
    val data = java.nio.file.Paths.get(root, "data")
    Files.move(data.resolve("lang=en"), data.resolve(".compact-lang=en.old"))
    Files.createDirectories(data.resolve(".compact-lang=en.tmp")) // orphan tmp
    // snapshot-consistent read heals: .old restored, orphan tmp removed
    val after = TableIO.read(spark, root, "lang").collect().map(_.toString).sorted
    assert(after.toSeq == before.toSeq)
    assert(Files.isDirectory(data.resolve("lang=en")))
    assert(!Files.exists(data.resolve(".compact-lang=en.old")))
    assert(!Files.exists(data.resolve(".compact-lang=en.tmp")))
    // stale .old NEXT TO a landed rewrite is garbage-collected, data kept
    Files.createDirectories(data.resolve(".compact-lang=en.old"))
    val again = TableIO.read(spark, root, "lang").collect().map(_.toString).sorted
    assert(again.toSeq == before.toSeq)
    assert(!Files.exists(data.resolve(".compact-lang=en.old")))
  }

  test("lineage rows persist as json") {
    val root = Files.createTempDirectory("lineage").toString
    TableIO.writeLineage(root, "ner.tag", Seq(LineageRow("ner.tag", 0, 10, 9, 42, "")))
    val files = Files.list(java.nio.file.Paths.get(root, "_lineage")).toArray
    assert(files.length == 1)
    val content = new String(Files.readAllBytes(files(0).asInstanceOf[java.nio.file.Path]), "UTF-8")
    assert(content.contains("\"rowsIn\":10"))
    assert(content.contains("\"stage\":\"ner.tag\""))
  }

  test("expireSnapshots: retention keeps reads + latest time travel, " +
      "expired ids die loudly, numbering continues") {
    import spark.implicits._
    val root = Files.createTempDirectory("tableio-expire").toString
    def batch(lang: String, v: Long) =
      Seq((v, lang)).toDF("v", "lang")
    TableIO.writeResumable(batch("en", 1L), root, "lang")   // snapshot 0
    TableIO.writeResumable(batch("de", 2L), root, "lang")   // snapshot 1
    TableIO.writeResumable(batch("hi", 3L), root, "lang")   // snapshot 2
    assert(TableIO.listSnapshots(root).map(_.id) == Seq(0, 1, 2))
    val expired = TableIO.expireSnapshots(root, keepLast = 1)
    assert(expired == Seq(0, 1))
    assert(TableIO.listSnapshots(root).map(_.id) == Seq(2))
    // live reads and the surviving snapshot unchanged
    assert(TableIO.read(spark, root, "lang").count() == 3L)
    assert(TableIO.readAt(spark, root, "lang", 2).count() == 3L)
    // expired time travel fails loudly
    val ex = intercept[IllegalArgumentException] {
      TableIO.readAt(spark, root, "lang", 0).count()
    }
    assert(ex.getMessage.contains("no snapshot 0"))
    // numbering continues past the expired range
    TableIO.writeResumable(batch("es", 4L), root, "lang")
    assert(TableIO.listSnapshots(root).map(_.id) == Seq(2, 3))
    assert(TableIO.read(spark, root, "lang").count() == 4L)
  }
}
