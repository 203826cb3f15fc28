package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.JsonlSource

/** JSONL source/sink: lossless round-trip of the documents table and the
  * three malformed-line modes (PERMISSIVE / DROPMALFORMED / FAILFAST). */
class JsonlSourceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("documents round-trips losslessly through JSONL") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(JsonlSource.schema.fieldNames.map(col): _*)
    val dir = Files.createTempDirectory("graft-jsonl").toString
    JsonlSource.write(docs, dir)

    val back = JsonlSource.read(spark, dir)
    assert(back.schema.fieldNames.toSeq === JsonlSource.schema.fieldNames.toSeq)

    // Set equality on every column, doc_id-keyed.
    val a = docs.collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val b = back.collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(b.size === a.size)
    assert(a === b)
  }

  test("malformed lines follow the mode contract") {
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    Files.write(dir.resolve("part-0.json"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}""",
        """this line is not json at all""",
        """{"doc_id": 2, "text": "also ok", "lang": "hi", "source": "web", "n_chars": 7}"""))
    val path = dir.toString

    // PERMISSIVE: corrupt line survives as an all-null row (no corrupt-record
    // column in the pinned schema), so one bad line cannot kill a crawl load.
    val perm = JsonlSource.read(spark, path).collect()
    assert(perm.length === 3)
    assert(perm.count(_.isNullAt(1)) === 1)

    // DROPMALFORMED: the bad line vanishes, good rows keep their values.
    val dropped = JsonlSource.read(spark, path, mode = "DROPMALFORMED")
    assert(dropped.count() === 2)
    assert(dropped.agg(sum("n_chars")).head.getLong(0) === 9L)

    // FAILFAST: the scan throws on the corrupt line.
    val ex = intercept[org.apache.spark.SparkException] {
      JsonlSource.read(spark, path, mode = "FAILFAST").count()
    }
    assert(ex.getMessage != null)
  }
}
