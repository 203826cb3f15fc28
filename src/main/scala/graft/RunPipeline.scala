package graft

import org.apache.spark.sql.SparkSession

/**
 * Production-shaped entry point: spark-submit --class graft.RunPipeline
 * <jar> <sfDir> <outRoot> [viterbi]. Resumable (snapshot manifests), writes
 * per-partition lineage, prints a one-line JSON report.
 */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunPipeline <sfDir> <outRoot> [viterbi]")
    val Array(sfDir, outRoot) = args.take(2)
    val useViterbi = args.length > 2 && args(2) == "viterbi"
    val spark = SparkSession.builder()
      .appName("graft-kg-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val report = Pipeline.runAndWrite(spark, sfDir, outRoot, useViterbi)
    val secs = (System.nanoTime() - t0) / 1e9
    val nTriples = graft.core.TableIO.read(spark, outRoot, "lang").count()
    println(
      s"""{"metric":"pipeline_run","seconds":${f"$secs%.2f"},"langs":${report.langsWritten.size},""" +
      s""""lineage_rows":${report.lineageRows},"tokens":${report.tokensSeen},""" +
      s""""oov":${report.unknownWords},"triples_total":$nTriples,""" +
      s""""decoder":"${if (useViterbi) "viterbi" else "greedy"}","out":"$outRoot"}""")
    spark.stop()
  }
}
