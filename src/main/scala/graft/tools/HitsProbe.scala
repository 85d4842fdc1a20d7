package graft.tools

import org.apache.spark.sql.functions._
import graft.algo.{Hits, HitsConfig}
import graft.core.{GraphOps, PropertyGraph}

/** Dev probe: HITS wall time vs fusedSteps on the q_hits dense graph. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("TIMEQ_DIR", "/root/testdata/sf0.1")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val edges = o.select((col("o_orderkey") % 300).as("src"),
      ((col("o_orderkey") * 7 + col("o_custkey")) % 300).as("dst"))
    val g = PropertyGraph(GraphOps.verticesOf(edges), edges)
    g.edges.count() // warm the scan
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
        if (e.taskMetrics != null) {
          deserMs.addAndGet(e.taskMetrics.executorDeserializeTime)
          runMs.addAndGet(e.taskMetrics.executorRunTime)
          gcMs.addAndGet(e.taskMetrics.jvmGCTime)
          cpuMs.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
        }
      }
    })
    val stageInfo = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stageInfo.add(f"stage=${si.stageId} tasks=${si.numTasks} wallMs=$ms name=${si.name.take(90)}")
      }
    })
    for (rep <- 1 to 2; np <- Seq(32, 8, 4, 2); fs <- Seq(1)) {
      spark.conf.set("spark.sql.shuffle.partitions", np.toString)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); stageInfo.clear()
      deserMs.set(0); runMs.set(0); gcMs.set(0); cpuMs.set(0)
      val t0 = System.nanoTime()
      val n = Hits.run(g, HitsConfig(maxIterations = 3, fusedSteps = fs)).count()
      println(f"rep=$rep np=$np fusedSteps=$fs rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskMs=${taskMs.get} " +
        f"deser=${deserMs.get} run=${runMs.get} gc=${gcMs.get} cpu=${cpuMs.get}")
    }
    spark.stop()
  }
}
