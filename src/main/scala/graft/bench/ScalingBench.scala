package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{PageRank, PageRankConfig, Wcc, WccConfig, LabelPropagation, LpConfig, Schedule, TriangleCount}
import graft.core.PropertyGraph
import graft.io.Pages

/** Two-parallelism-level scaling harness (BASELINE.md contract).
  *
  * The sandbox has no multi-executor cluster, so per the driver's
  * instruction the north rule's N-vs-4N-executor criterion is evidenced by
  * running the SAME job on the SAME input at two local parallelism levels
  * (local[8] vs local[32]) and reporting throughput at both plus
  * `scaling_efficiency = (T_low / T_high) / (cores_high / cores_low)`.
  *
  * Input: the deterministic seeded synthetic web graph (Pages.synth) —
  * identical bytes at both levels. Metric: edges/sec per PageRank superstep
  * (plus WCC/LP/triangle secondary numbers).
  */
object ScalingBench {

  final case class RunStats(cores: Int, secs: Double, edges: Long, supersteps: Int) {
    def edgesPerSecPerSuperstep: Double = edges.toDouble * supersteps / secs
  }

  /** Executor-side classes for local-cluster mode: GRAFT_JAR wins, else the
    * compiled classes directory (always current after `sbt compile`; same
    * box, so a directory entry is a valid executor classpath), else the
    * sbt-packaged jar (may be stale — last resort). */
  private[bench] def executorClasses: Option[String] = {
    sys.env.get("GRAFT_JAR").orElse {
      val classes = new java.io.File("target/scala-2.13/classes")
      if (classes.isDirectory) Some(classes.getAbsolutePath) else None
    }.orElse {
      val dir = new java.io.File("target/scala-2.13")
      Option(dir.listFiles()).flatMap(_.collectFirst {
        case f if f.getName.endsWith(".jar") && !f.getName.endsWith("-tests.jar") =>
          f.getAbsolutePath
      })
    }
  }

  private def session(cores: Int, forceCluster: Boolean = false,
                      forceWorkerCores: Int = 0): SparkSession = {
    val localDir = sys.env.getOrElse("GRAFT_BENCH_LOCAL_DIR", "/dev/shm/spark-local")
    // GRAFT_BENCH_CLUSTER=1 (or forceCluster) runs real multi-executor JVMs
    // (local-cluster): cores/W workers x W cores (GRAFT_BENCH_WORKER_CORES,
    // default 4) — the honest "N executors vs 4N executors" shape of the
    // north rule; a single shared JVM otherwise (local[n]). W=1 with cores
    // 1 vs 4 keeps both legs in this box's unthrottled memory-bandwidth
    // regime while exercising genuinely separate executor JVMs (netty
    // shuffle, cross-process serialization).
    val cluster = forceCluster || sys.env.getOrElse("GRAFT_BENCH_CLUSTER", "0") == "1"
    val workerMem = sys.env.getOrElse("GRAFT_BENCH_WORKER_MB", "12288")
    val workerCores =
      if (forceWorkerCores > 0) forceWorkerCores
      else sys.env.getOrElse("GRAFT_BENCH_WORKER_CORES", "4").toInt
    val master =
      if (cluster) s"local-cluster[${math.max(1, cores / workerCores)},$workerCores,$workerMem]"
      else s"local[$cores]"
    // partitions sized by DATA, identical at both parallelism levels (the
    // cluster-honest shape: a 100 TB job would fix its partitioning by input
    // size, not executor count) — also keeps per-task memory constant and
    // map-side combine effectiveness comparable between the two legs
    // 32 (not 64): halving task launches cut the driver-serial component
    // enough to lift 2->8-core efficiency from 0.74 to 0.93 measured —
    // per-task overhead is pure Amdahl serial time at any cluster size
    val parts = sys.env.getOrElse("GRAFT_BENCH_PARTS", "32")
    val builder = SparkSession.builder()
      .master(master)
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // shuffle spill on tmpfs: benchmark supersteps are shuffle-latency
      // bound on slow block devices otherwise
      .config("spark.local.dir", localDir)
    // executors need the graft classes (shipped jar) and the full worker
    // memory (spark.executor.memory defaults to 1g regardless of worker size)
    // local-cluster executors are launched via the Spark launcher scripts,
    // which need SPARK_HOME and the scala suffix; the sandbox install is
    // /opt/spark. Passed via executorEnv/childEnv so the bench needs no
    // caller-side environment.
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    val withJar = executorClasses match {
      case Some(cp) if cluster =>
        val b = builder
          .config("spark.executor.memory", s"${workerMem}m")
          .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
          .config("spark.executorEnv.SPARK_HOME", sparkHome)
          // make each executor's NOMINAL core count its REAL parallelism:
          // without this, a "1-core" executor JVM's helper threads (GC,
          // netty shuffle, JIT) size themselves from the BOX's 32 cores and
          // borrow idle ones — a subsidy only the low leg of the N->4N pair
          // enjoys (the high leg's helpers contend with its own workers),
          // which biases the measured ratio DOWN on an idle box and makes
          // it load-dependent. ActiveProcessorCount sizes every internal
          // pool for the executor's own core budget, same as a real
          // cluster's per-node cgroup would.
          .config("spark.executor.extraJavaOptions",
            sys.env.getOrElse("GRAFT_BENCH_EXEC_OPTS",
              s"-XX:ActiveProcessorCount=$workerCores") +
              // executor JVMs must not flood the driver-captured output
              // window with startup INFO logs (see bench.Quiet)
              s" -Dlog4j2.configurationFile=file:${Quiet.executorConfigFile}")
        if (cp.endsWith(".jar")) b.config("spark.jars", cp)
        else b.config("spark.executor.extraClassPath", cp)
      case _ => builder
    }
    val s = withJar.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Build the bench graph: the synthetic corpus link structure as an edge
    * table (identical to html extraction — see Pages.synthEdges),
    * materialized (cached + counted) so algorithm timing excludes synthesis. */
  private def benchGraph(spark: SparkSession, nPages: Long,
                         density: Double): (PropertyGraph, Long) = {
    val edges = Pages.synthEdges(spark, nPages, density = density).persist()
    val e     = edges.count()
    val verts = graft.core.GraphOps.verticesOf(edges).persist()
    verts.count()
    (PropertyGraph(verts, edges), e)
  }

  private def benchConfig(supersteps: Int): PageRankConfig = {
    // Fixed-iteration run => fuse all supersteps into one lazily-chained
    // job (no per-superstep driver sync — LoopConfig.fusedSteps).
    val fused = sys.env.getOrElse("GRAFT_BENCH_FUSED", supersteps.toString).toInt
    // hub-split path: each superstep's hub-frontier broadcast serializes
    // the fused chain through the driver, so it only pays when a single
    // hub's adjacency would actually skew a partition. The synth bench
    // graph's forced hubs (degree 5000) are ~1% of a partition at the
    // default size — off by default; GRAFT_BENCH_HUB_THRESHOLD>0 enables
    // (the skew path itself is exercised by tools.HubSkewProbe at
    // hubDegree>=100k, where it wins).
    val hubT = sys.env.getOrElse("GRAFT_BENCH_HUB_THRESHOLD", "0").toDouble
    PageRankConfig(tolerance = 0.0, maxIterations = supersteps,
      fusedSteps = fused, hubThreshold = if (hubT > 0) Some(hubT) else None)
  }

  /** One session, one warm-up, one timed run. Returns (secs, edges). */
  private def oneTimedRun(cores: Int, nPages: Long, supersteps: Int,
                          density: Double, forceCluster: Boolean = false,
                          forceWorkerCores: Int = 0): (Double, Long) = {
    val spark = session(cores, forceCluster, forceWorkerCores)
    try {
      val (graph, e) = benchGraph(spark, nPages, density)
      val cfg = benchConfig(supersteps)
      // warm-up superstep machinery (JIT, codegen) on a short run
      PageRank.run(graph, cfg.copy(maxIterations = 2)).scores.count()
      val t0 = System.nanoTime()
      PageRank.run(graph, cfg).scores.count()
      ((System.nanoTime() - t0) / 1e9, e)
    } finally spark.stop()
  }

  def pageRankRun(cores: Int, nPages: Long, supersteps: Int,
                  density: Double = 8.0): RunStats = {
    val spark = session(cores)
    try {
      val (graph, e) = benchGraph(spark, nPages, density)
      val cfg = benchConfig(supersteps)
      // warm-up superstep machinery (JIT, codegen) on a tiny run
      PageRank.run(graph, cfg.copy(maxIterations = 2)).scores.count()
      // repeat the timed run and take the min: single-shot timings on a
      // shared box carry GC/OS noise that can swing the derived efficiency
      // by +-0.1; min-of-k is the standard noise-free estimator
      val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt
      val times = (1 to reps).map { rep =>
        val t0 = System.nanoTime()
        val r = PageRank.run(graph, cfg)
        r.scores.count()
        val secs = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scaling] cores=$cores rep=$rep secs=$secs%.2f")
        secs
      }
      RunStats(cores, times.min, e, supersteps)
    } finally spark.stop()
  }

  /** Interleaved scaling legs: reps alternate BETWEEN core counts
    * (c1,c2,...,c1,c2,...) so a slow-machine episode (GC, co-tenant load)
    * hits every leg equally instead of biasing one side of the ratio; min
    * per leg then drops the episodes. One fresh session per (cores, rep) —
    * graph build and warm-up excluded from timing as always. */
  def pageRankInterleaved(coresList: Seq[Int], nPages: Long, supersteps: Int,
                          density: Double = 8.0,
                          reps: Int = 3,
                          deadlineNanos: Long = Long.MaxValue): Map[Int, RunStats] = {
    var edges = 0L
    val all = scala.collection.mutable.Map.empty[Int, List[Double]]
    var pairCost = 0L // measured wall cost of one full rep round, for budgeting
    for (rep <- 1 to reps) {
      // budget check BETWEEN rounds (never mid-round: a partial round would
      // bias one leg of the ratio): skip remaining rounds when the last
      // round's measured cost no longer fits before the deadline. Degrades
      // to "fewer reps, per-rep arrays still emitted" instead of a killed
      // process with no artifact (BENCH_r04 failure mode).
      if (rep == 1 || System.nanoTime() + pairCost <= deadlineNanos) {
        val t0 = System.nanoTime()
        for (c <- coresList) {
          val (secs, e) = oneTimedRun(c, nPages, supersteps, density)
          edges = e
          System.err.println(f"[scaling] cores=$c rep=$rep secs=$secs%.2f")
          all(c) = all.getOrElse(c, Nil) :+ secs
        }
        pairCost = System.nanoTime() - t0
      } else System.err.println(s"[scaling] rep=$rep skipped (deadline)")
    }
    lastRepTimes = all.toMap
    coresList.map(c => c -> RunStats(c, all(c).min, edges, supersteps)).toMap
  }

  /** Per-rep raw seconds of the most recent interleaved run (keyed by
    * cores/executors, rep order preserved) — surfaced in the bench JSON so a
    * loaded-box episode is visible in the committed artifact instead of
    * masquerading as an engine regression. */
  @volatile var lastRepTimes: Map[Int, List[Double]] = Map.empty

  /** Multi-JVM scaling pair (BASELINE.md "Multi-JVM cross-check", now
    * machine-visible in the bench JSON): the SAME job on REAL separate
    * executor processes — local-cluster[cLow,1,mem] vs
    * local-cluster[cHigh,1,mem], i.e. literally cLow executors vs cHigh
    * executors with netty shuffle and cross-process serialization.
    * Interleaved reps, min per leg, fresh cluster per (executors, rep).
    * Returns executors -> RunStats; empty if no executor classpath exists. */
  def pageRankClusterInterleaved(executorsList: Seq[Int], nPages: Long,
                                 supersteps: Int,
                                 density: Double = 8.0,
                                 reps: Int = 3,
                                 deadlineNanos: Long = Long.MaxValue): Map[Int, RunStats] = {
    if (executorClasses.isEmpty) return Map.empty
    var edges = 0L
    val all = scala.collection.mutable.Map.empty[Int, List[Double]]
    // FIXED-rep protocol (round-4 review): the earlier variance-triggered
    // extension (extra pairs only while min-of-N efficiency sat under a
    // margin) was a one-sided optional-stopping rule that biased the gate
    // metric upward AND — on a busy window — blew the driver's wall budget
    // (BENCH_r04 rc:124). Now: exactly `reps` interleaved pairs, the gate
    // reported from the full fixed set, per-rep arrays emitted for context;
    // the only truncation is the hard deadline, which drops whole pairs from
    // the END (never one leg of a pair) and is reported as fewer reps.
    var pairCost = 0L
    for (rep <- 1 to reps) {
      if (rep == 1 || System.nanoTime() + pairCost <= deadlineNanos) {
        val t0 = System.nanoTime()
        for (n <- executorsList) {
          val (secs, e) = oneTimedRun(n, nPages, supersteps, density,
            forceCluster = true, forceWorkerCores = 1)
          edges = e
          System.err.println(f"[scaling-cluster] executors=$n rep=$rep secs=$secs%.2f")
          all(n) = all.getOrElse(n, Nil) :+ secs
        }
        pairCost = System.nanoTime() - t0
      } else System.err.println(s"[scaling-cluster] rep=$rep skipped (deadline)")
    }
    lastRepTimes = all.toMap
    executorsList.map(n => n -> RunStats(n, all(n).min, edges, supersteps)).toMap
  }

  /** Secondary metrics at one parallelism level. */
  def secondaryRun(cores: Int, nPages: Long, density: Double = 8.0): Map[String, Double] = {
    val spark = session(cores)
    try {
      val (graph, e) = benchGraph(spark, nPages, density)
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val wccT = time { Wcc.run(graph, WccConfig()).components.count() }
      val lpT  = time { LabelPropagation.run(graph,
        LpConfig(maxIterations = 5, schedule = Schedule.Sync)).labels.count() }
      val tcT  = time { TriangleCount.run(graph) }
      Map("edges" -> e.toDouble, "wcc_secs" -> wccT, "lp5_secs" -> lpT, "triangle_secs" -> tcT)
    } finally spark.stop()
  }

  /** Secondary-metric scaling: WCC-to-fixpoint, 5-iteration synchronous LP
    * and the triangle-count wedge join, each timed at BOTH parallelism
    * levels on the same input (interleaved reps, min per leg, fresh session
    * per rep, graph build + one warm-up run excluded) — the BASELINE.md
    * secondary numbers next to the PageRank headline. Returns
    * algo -> (secsLow, secsHigh, efficiency). */
  def secondaryScaling(coresLow: Int, coresHigh: Int, nPages: Long,
                       density: Double = 8.0,
                       reps: Int = 2): Map[String, (Double, Double, Double)] = {
    // GRAFT_SCALING_ALGOS selects a subset so each algorithm can be measured
    // at its own compute-dominated input size (triangles do ~10x the work of
    // a WCC round per edge; one shared size would leave the cheap algos
    // fixed-cost-bound or the expensive one hour-long at 1 core).
    val wanted = sys.env.getOrElse("GRAFT_SCALING_ALGOS", "wcc,lp5,triangle")
      .split(",").map(_.trim).toSet
    // wcc8/lp5 run a FIXED superstep count (like the PageRank headline):
    // "edges/sec per superstep" needs identical work at both legs, and a
    // to-fixpoint run's convergence tail (tiny frontiers, pure per-round
    // fixed cost) would measure scheduler latency, not the engine. wccfix
    // (to fixpoint) stays available for context.
    val algos: Seq[(String, PropertyGraph => Unit)] = Seq[(String, PropertyGraph => Unit)](
      "wcc8"     -> (g => Wcc.run(g, WccConfig(maxSteps = 8,
        localSolveThreshold = -1L, fusedSteps = 4)).components.count(): Unit),
      "wccfix"   -> (g => Wcc.run(g, WccConfig()).components.count(): Unit),
      "lp5"      -> (g => LabelPropagation.run(g,
        LpConfig(maxIterations = 5, schedule = Schedule.Sync)).labels.count(): Unit),
      "triangle" -> (g => TriangleCount.run(g): Unit))
      .filter { case (n, _) => wanted(n) }
    val best = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (rep <- 1 to reps; c <- Seq(coresLow, coresHigh)) {
      val spark = session(c)
      try {
        val (graph, _) = benchGraph(spark, nPages, density)
        // warm-up: the same algos on a small slice of the corpus (JIT+codegen)
        val (warm, _) = benchGraph(spark, math.max(1000L, nPages / 100), density)
        for ((name, run) <- algos) {
          run(warm)
          val t0 = System.nanoTime(); run(graph)
          val secs = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[scaling2] algo=$name cores=$c rep=$rep secs=$secs%.2f")
          val k = (name, c)
          if (!best.contains(k) || secs < best(k)) best(k) = secs
        }
      } finally spark.stop()
    }
    algos.map { case (name, _) =>
      val (lo, hi) = (best((name, coresLow)), best((name, coresHigh)))
      name -> (lo, hi, (lo / hi) / (coresHigh.toDouble / coresLow))
    }.toMap
  }

  /** Iterations-to-tolerance on the bench graph (tolerance 1e-6 / 1e-7). */
  def iterationsToTol(cores: Int, nPages: Long, density: Double = 8.0): (Int, Int) = {
    val spark = session(cores)
    try {
      val (graph, _) = benchGraph(spark, nPages, density)
      val a = PageRank.run(graph, PageRankConfig(tolerance = 1e-6, maxIterations = 150)).ranIterations
      val b = PageRank.run(graph, PageRankConfig(tolerance = 1e-7, maxIterations = 150)).ranIterations
      (a, b)
    } finally spark.stop()
  }

  def jsonLine(nPages: Long, supersteps: Int, low: RunStats, high: RunStats,
               iters: (Int, Int), secondary: Map[String, Double]): String = {
    val eff = (low.secs / high.secs) / (high.cores.toDouble / low.cores)
    val sec = secondary.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    s"""{"pages":$nPages,"edges":${low.edges},"supersteps":$supersteps,""" +
      s""""cores_low":${low.cores},"secs_low":${"%.3f".format(low.secs)},""" +
      s""""eps_low":${"%.0f".format(low.edgesPerSecPerSuperstep)},""" +
      s""""cores_high":${high.cores},"secs_high":${"%.3f".format(high.secs)},""" +
      s""""eps_high":${"%.0f".format(high.edgesPerSecPerSuperstep)},""" +
      s""""scaling_efficiency":${"%.3f".format(eff)},""" +
      s""""iters_to_1e6":${iters._1},"iters_to_1e7":${iters._2},$sec}"""
  }

  /** Usage: runMain graft.bench.ScalingBench [nPages] [density] [supersteps] [lowCores] [highCores] */
  def main(args: Array[String]): Unit = {
    val nPages     = if (args.length > 0) args(0).toLong else 200000L
    val density    = if (args.length > 1) args(1).toDouble else 8.0
    val supersteps = if (args.length > 2) args(2).toInt else 8
    val lowCores   = if (args.length > 3) args(3).toInt else 8
    val highCores  = if (args.length > 4) args(4).toInt else 32
    if (sys.env.get("GRAFT_SCALING_MODE").contains("secondary")) {
      val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "2").toInt
      val r = secondaryScaling(lowCores, highCores, nPages, density, reps)
      val body = r.toSeq.sortBy(_._1).map { case (k, (lo, hi, eff)) =>
        s""""$k":{"secs_low":${"%.3f".format(lo)},"secs_high":${"%.3f".format(hi)},""" +
          s""""scaling_efficiency":${"%.3f".format(eff)}}"""
      }.mkString(",")
      println(s"""SCALING2 {"pages":$nPages,"density":$density,""" +
        s""""cores_low":$lowCores,"cores_high":$highCores,$body}""")
      return
    }
    val low  = pageRankRun(lowCores, nPages, supersteps, density)
    val high = pageRankRun(highCores, nPages, supersteps, density)
    val full = sys.env.getOrElse("SCALING_FULL", "1") == "1"
    // iteration count is a property of the standard (density 1) corpus;
    // measured on a fixed 200k-page instance to keep wall time bounded
    val iters =
      if (full) iterationsToTol(highCores, math.min(nPages, 200000L), density = 1.0)
      else (0, 0)
    val secondary =
      if (full) secondaryRun(highCores, nPages, density) else Map("edges" -> low.edges.toDouble)
    println("SCALING " + jsonLine(nPages, supersteps, low, high, iters, secondary))
  }
}
