package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-17 measurement loop (optimization guide §1): for each named query,
  * dump the formatted physical plan to `<planDir>/<name>_<tag>.txt`, then
  * time `count()` (the bench's action, for comparability) over warmup +
  * `passes` measured runs, reporting per-pass wall seconds plus aggregate
  * job/stage/task/shuffle counters from a listener — the Exchange count and
  * shuffle bytes are what the guide says to drive down.
  *
  * `runMain graft.Profile <q1,q2,...> [sfDir] [planDir] [tag] [passes]`
  */
/** Per-micro-batch phase printer (round 18): instantiated by every session
  * (cloned ones included) via spark.sql.streaming.streamingQueryListeners,
  * so the stream lifecycle's durationMs breakdown is observable per batch. */
class StreamPhaseListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    val keys = Seq("triggerExecution", "latestOffset", "queryPlanning",
      "getBatch", "walCommit", "commitOffsets", "addBatch")
    val parts = keys.map(k =>
      s"$k=${Option(dur.get(k)).getOrElse("-")}").mkString(" ")
    println(s"    [stream-batch] ${p.name} batch=${p.batchId} " +
      s"rows=${p.numInputRows} $parts")
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
}

object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val planDir = args.lift(2).getOrElse("plans/r17")
    val tag = args.lift(3).getOrElse("before")
    val passes = args.lift(4).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Streaming lifecycle attribution (round 18): under
    // SPARK_GRAFT_STREAM_PHASES, register the per-batch durationMs printer
    // through the CONF (not spark.streams.addListener) — parity queries
    // start on CLONED sessions (StreamParity.confSession) whose own
    // StreamingQueryManager instantiates the listener class from this
    // inherited conf; a listener added to the parent manager never sees
    // their events.
    val b0 = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
    val spark = (if (sys.env.contains("SPARK_GRAFT_STREAM_PHASES"))
      b0.config("spark.sql.streaming.streamingQueryListeners",
        "graft.StreamPhaseListener")
    else b0).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(planDir).mkdirs()

    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var jobs = 0
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    @volatile var spill = 0L
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new SparkListener {
      private val jobSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        jobStart.put(js.jobId, System.nanoTime())
        jobSite.put(js.jobId,
          js.stageInfos.lastOption.map(_.name).getOrElse("?").take(90) +
            " tasks=" + js.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStart.remove(je.jobId)
        if (t0 != 0L && sys.env.contains("SPARK_GRAFT_PROFILE_JOBS"))
          jobLines.add(f"    job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%6.3f s  ${jobSite.remove(je.jobId)}")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += sc.stageInfo.numTasks
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          shufRead += m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead
          spill += m.diskBytesSpilled
        }
        if (sys.env.contains("SPARK_GRAFT_PROFILE_JOBS")) {
          val wall = (for (s <- sc.stageInfo.submissionTime;
                           e <- sc.stageInfo.completionTime) yield e - s)
            .getOrElse(-1L)
          val cpu = if (m != null) m.executorCpuTime / 1000000 else -1L
          jobLines.add(f"      stage ${sc.stageInfo.stageId}%4d " +
            f"wall=${wall}%5d ms cpu=${cpu}%5d ms tasks=${sc.stageInfo.numTasks}%3d  " +
            sc.stageInfo.name.take(90))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)


    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // plan dump (pre-execution, AQE isFinalPlan=false — the shape audit)
      val planTxt = {
        val df = fn(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$planDir/${name}_$tag.txt"),
        planTxt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val ex = planTxt.linesIterator.count(_.contains("Exchange"))
      spark.sparkContext.setJobDescription(s"profile:$name warmup")
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(f"$name%-26s FAILED ${e.getMessage.take(120)}"); return }
      val times = (1 to passes).map { i =>
        stages = 0; tasks = 0; jobs = 0; shufWrite = 0L; shufRead = 0L; spill = 0L
        jobLines.clear()
        spark.sparkContext.setJobDescription(s"profile:$name pass$i")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      if (sys.env.contains("SPARK_GRAFT_PROFILE_JOBS"))
        jobLines.forEach(println(_))
      println(f"$name%-26s ${times.map(t => f"$t%6.3f").mkString(" ")}  " +
        f"jobs=$jobs%3d stages=$stages%3d tasks=$tasks%4d " +
        f"shufW=${shufWrite / 1024}%6d KB shufR=${shufRead / 1024}%6d KB " +
        f"spill=${spill / 1024}%d KB exch=$ex")
    }
    spark.stop()
  }
}
