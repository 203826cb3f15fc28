package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query, one JSON line on stdout.
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports the
  * min — pass 1 warms JIT/codegen and the pipeline's model/tagged caches;
  * the host also shows multi-second hypervisor steal bursts (see BENCH.md),
  * which min-of-N partially absorbs. Cache hygiene: the dedup/similarity
  * operators self-clean their cached intermediates (Dedup eager mode), so
  * each timing starts from a storage pool holding only the pipeline's
  * deliberate model/tagged caches — the same methodology as BENCH.md's
  * min-merged numbers. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    // fail LOUD: a query that errors aborts the bench (a silent -1 would
    // drop it from the total and misreport the round)
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: $e")
        throw e
      }
      (System.nanoTime() - t0) / 1e9
    }
    val results = names.map { n =>
      n -> (1 to math.max(1, reps)).map(_ => timeOne(n)).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // reps + methodology ride in the JSON so a single driver capture is
    // self-describing (each per-query figure is already min-of-`reps`
    // within this process; BENCH.md's min-merged numbers additionally
    // min across processes)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""method":"min_of_reps_per_query","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout captures can truncate a ~170-query map (BENCH_r04.json kept
    // only a tail fragment); persist the full line beside the sources so
    // every per-query figure survives the run regardless of capture limits
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LAST.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] BENCH_LAST.json write failed: $e") }
    spark.stop()
  }
}
