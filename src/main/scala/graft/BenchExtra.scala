package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Diagnostic bench (guide §1.4): NOT the driver contract — `graft.Bench`
  * stays the frozen measurement harness. This main isolates individual
  * queries with the noop sink (times the computation, not the sink),
  * captures `.explain("formatted")` per query, and attaches a
  * SparkListener so each query's time decomposes into its Spark jobs
  * (count, per-job wall, task counts) — the instrument that separates
  * "the operator is slow" from "the query is 15 tiny driver-actions".
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.BenchExtra q170_image_phash q176_video_neardup"
  * Extra env:
  *   SPARK_GRAFT_PLANDIR  — if set, writes <plandir>/<query>.txt with the
  *                          formatted plan of the query's root DataFrame.
  *   SPARK_GRAFT_EXTRA_REPS — reps per query (default 2; reports each).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "2").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLANDIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", sys.env.getOrElse("SPARK_GRAFT_UI", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-job accounting: (jobId -> (description, submitMs, durMs, nTasks))
    case class JobRec(desc: String, var start: Long = 0L, var end: Long = 0L,
                      var tasks: Int = 0, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobs(js.jobId) = JobRec(d, start = js.time)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(je.jobId).foreach(_.end = je.time)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute the stage to the most recent open job (local mode:
          // queries here run sequentially, so this is accurate enough)
          jobs.lastOption.foreach { case (_, r) =>
            r.tasks += sc.stageInfo.numTasks; r.stages += 1
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      planDir.foreach { pd =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        new java.io.File(pd).mkdirs()
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$pd/$name.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      (1 to reps).foreach { rep =>
        jobs.synchronized(jobs.clear())
        spark.sparkContext.setJobDescription(s"$name rep$rep")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        // let async job-end events drain before reading the map
        Thread.sleep(150)
        val recs = jobs.synchronized(jobs.values.toList)
        val jobSum = recs.map(r => math.max(0L, r.end - r.start)).sum / 1e3
        println(f"$name rep$rep wall=$wall%.3f s jobs=${recs.size} " +
          f"jobTime=$jobSum%.3f s tasks=${recs.map(_.tasks).sum}")
        recs.zipWithIndex.foreach { case (r, i) =>
          val dur = math.max(0L, r.end - r.start) / 1e3
          if (dur >= 0.05)
            println(f"    job$i%3d ${dur}%8.3f s stages=${r.stages} tasks=${r.tasks} ${r.desc.take(60)}")
        }
      }
    }
    // SPARK_GRAFT_HOLD=1: keep the session (and UI) alive for REST inspection
    if (sys.env.contains("SPARK_GRAFT_HOLD")) Thread.sleep(600000)
    spark.stop()
  }
}
