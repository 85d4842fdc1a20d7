package graft.tools

/** Drive ONLY the multi-JVM scaling leg (the Bench `pagerank_scaling_cluster`
  * object), including the variance-triggered extra reps — for validating the
  * estimator and re-measuring the cluster leg without the full bench. */
object ClusterLegProbe {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 1000000L
    val reps   = if (args.length > 1) args(1).toInt else 3
    val runs = graft.bench.ScalingBench.pageRankClusterInterleaved(
      Seq(1, 4), nPages, supersteps = 8, reps = reps)
    val (lo, hi) = (runs(1), runs(4))
    val eff = (lo.secs / hi.secs) / 4.0
    println(f"CLUSTER secs_low=${lo.secs}%.2f secs_high=${hi.secs}%.2f " +
      f"efficiency=$eff%.3f reps=${graft.bench.ScalingBench.lastRepTimes.mapValues(_.size).toMap}")
  }
}
