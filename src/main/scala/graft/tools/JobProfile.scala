package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Where does a query's wall time go? Counts Spark jobs, stages, tasks
  * and sums job wall / task time for one query run (construct + noop
  * execute), so per-job fixed overhead vs real task work is separable:
  * `runMain graft.tools.JobProfile <sfDir> <name> [name...]`. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val b = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // match Bench's session (see GraftSession for both rationales)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_FC",
          "org.apache.hadoop.fs.local.RawLocalFs"))
    // ad-hoc conf experiments: JOBPROF_CONF="k=v;k2=v2"
    sys.env.get("JOBPROF_CONF").foreach(_.split(";").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val jobWallNs = new AtomicLong
    val taskMs = new AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(e.jobId, System.nanoTime())
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != 0L) jobWallNs.addAndGet(System.nanoTime() - s)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = e.stageInfo
        val ms = si.taskMetrics
        if (ms != null)
          stageLog.add(f"    stage ${si.stageId}%4d ${si.numTasks}%4dt " +
            f"exec ${ms.executorRunTime / 1e3}%7.2fs " +
            f"cpu ${ms.executorCpuTime / 1e9}%7.2fs " +
            f"deser ${ms.executorDeserializeTime / 1e3}%6.2fs " +
            f"gc ${ms.jvmGCTime / 1e3}%5.2fs " +
            f"fetch ${ms.shuffleReadMetrics.fetchWaitTime / 1e3}%5.2fs " +
            f"shW ${ms.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
            f"shR ${ms.shuffleReadMetrics.totalBytesRead / 1024}%8dKB  ${si.name.take(80)}")
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
      }
    })
    val verbose = sys.env.contains("JOBPROF_STAGES")
    for (n <- names; r <- 1 to 2) {
      jobs.set(0); stages.set(0); tasks.set(0); jobWallNs.set(0); taskMs.set(0)
      stageLog.clear()
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      // listener bus is async; give it a beat before reading counters
      Thread.sleep(300)
      println(f"JOBPROF $n r$r: total ${(t2 - t0) / 1e9}%.2f s (constr ${(t1 - t0) / 1e9}%.2f) " +
        f"jobs ${jobs.get} stages ${stages.get} tasks ${tasks.get} " +
        f"jobWall ${jobWallNs.get / 1e9}%.2f s taskTime ${taskMs.get / 1e3}%.2f s")
      if (verbose && r == 2) stageLog.forEach(s => println(s))
    }
    spark.stop()
  }
}
