package graft

import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("curation pipeline: monotone stage counts, resumable, deterministic") {
    val sf = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("curation").toString + "/out"
    val r = Curation.runAndWrite(spark, sf, root)
    // every stage can only drop documents
    assert(r.docsIn >= r.afterQuality && r.afterQuality >= r.afterExact &&
      r.afterExact >= r.afterNearDup && r.afterNearDup >= r.afterDecontam &&
      r.afterDecontam >= r.afterRepetition, r.toString)
    assert(r.afterRepetition > 0, "curation must keep something")
    val written = graft.core.TableIO.read(spark, root, "lang")
    assert(written.count() == r.afterRepetition)
    // the output carries the full curated schema
    assert(written.columns.toSet ==
      Set("doc_id", "lang", "source", "n_tokens", "bucket", "pack_id",
        "lm_logprob", "text"))
    // PII was redacted in place: no raw injected emails survive
    assert(written.filter(col("text").rlike(graft.ops.TextStats.emailRe)).count() == 0)
    // resumable: a second run writes NO new partitions and changes nothing
    val before = written.collect().map(_.toString).sorted.toSeq
    val r2 = Curation.runAndWrite(spark, sf, root)
    assert(r2.langsWritten.isEmpty, s"rerun rewrote: ${r2.langsWritten}")
    val after = graft.core.TableIO.read(spark, root, "lang")
      .collect().map(_.toString).sorted.toSeq
    assert(before == after)
    // deterministic: a fresh run into a different root yields the same table
    val root2 = java.nio.file.Files.createTempDirectory("curation2").toString + "/out"
    Curation.runAndWrite(spark, sf, root2)
    val other = graft.core.TableIO.read(spark, root2, "lang")
      .collect().map(_.toString).sorted.toSeq
    assert(before == other)
  }
}
