package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/**
 * JSONL source/sink for the documents table — one JSON object per line,
 * the universal crawl-dump interchange format (Dolma, RedPajama, CCNet
 * and most public corpus releases ship this way), so a reference user's
 * existing dumps load without conversion.
 *
 * The schema is PINNED and must be passed explicitly on read: at 100 TB
 * Spark's schema inference would cost a full extra pass over the corpus
 * before the real scan. With the explicit schema the read is a single
 * streaming line scan with per-line JSON parsing; line-level corruption
 * follows Spark's standard `mode` contract (PERMISSIVE nulls the row's
 * fields, DROPMALFORMED drops it, FAILFAST throws) — pick per pipeline
 * stage, default PERMISSIVE so one bad line cannot kill a crawl load.
 */
object JsonlSource {

  /** The documents-table schema (TESTDATA.md): doc_id, text, lang,
    * source, n_chars. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", IntegerType, nullable = true)))

  def read(spark: SparkSession, path: String,
           mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(path)

  /** Write a documents DataFrame as JSONL (schema columns, one object per
    * line, gzip-free so downstream line-splitting parallelizes). */
  def write(df: DataFrame, path: String): Unit =
    df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").json(path)
}
