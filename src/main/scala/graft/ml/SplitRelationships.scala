package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `gds.alpha.ml.splitRelationships.mutate` (reference: alpha/alpha-proc/src/
  * main/java/org/neo4j/gds/ml/splitting/SplitRelationshipsMutateProc.java +
  * alpha/alpha-algo/.../ml/splitting/{EdgeSplitter,DirectedEdgeSplitter}.java):
  * split an edge set into a SELECTED (holdout) relationship set — positive
  * holdout edges labeled 1.0 plus negative-sampled non-edges labeled 0.0 at
  * `negativeSamplingRatio` per positive — and the REMAINING edge set.
  *
  * Spark-first, fully deterministic, and scale-shaped:
  *  - the holdout draw is a pure per-row expression (md5 of the edge key
  *    compared against a 16-bit hex threshold — fraction quantized to
  *    1/65536), so the split needs no RNG state, is resumable, and both the
  *    engine and a SQL oracle replay it bit-identically;
  *  - negative candidates are generated per holdout-positive edge from a
  *    bounded LCG of (src, per-src rank) — `row_number` partitioned by `src`
  *    (bounded by out-degree, never a global sort), one candidate batch per
  *    positive, deduped and anti-joined against the edge table. Like the
  *    reference (EdgeSplitter.java:125-137 samples without retrying across
  *    duplicates), collisions are dropped rather than re-drawn, so the
  *    negative count can undershoot `positives * ratio` — deterministic
  *    one-shot sampling is what keeps the operator a single distributed plan.
  *
  * All arithmetic stays below 2^63 with BIGINT-safe bounds (src folded mod
  * 1,000,003 before the multiply) so an ANSI-SQL oracle replays it without
  * overflow semantics diverging.
  */
object SplitRelationships {

  final case class SplitConfig(
      holdoutFraction: Double,
      negativeSamplingRatio: Double = 1.0,
      seed: Long = 42L,
      /** caller-supplied |V| (skips the broadcast count subquery — useful
        * when the caller splits repeatedly over the same node universe) */
      nodeCount: Option[Long] = None)

  /** 4-hex-digit lexicographic threshold for `fraction` (quantized 1/65536).
    * fraction >= 1 yields "g" which sorts above every hex digest. */
  def hexThreshold(fraction: Double): String = {
    val q = math.min(65536L, math.max(0L, (fraction * 65536.0).round))
    if (q >= 65536L) "g" else f"$q%04x"
  }

  /** Split `edges(src, dst, ...)` into holdout/remaining over the node id
    * universe of `nodes(id)`. Node ids are assumed dense in [0, nodeCount) —
    * the same contract as the reference, whose EdgeSplitter draws negative
    * targets from the internal (dense) id space; callers with sparse ids map
    * through an id table first. Returns (src, dst, label, split) where
    * split ∈ ('holdout', 'remaining'); remaining rows carry label 1.0. */
  def split(edges: DataFrame, nodes: DataFrame, cfg: SplitConfig): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val thr = hexThreshold(cfg.holdoutFraction)
    val draw = substring(md5(concat_ws(":", col("src"), col("dst"), lit(cfg.seed))), 1, 4)
    val tagged = e.withColumn("__hold", draw < lit(thr))

    val holdPos = tagged.filter(col("__hold"))
      .select(col("src"), col("dst"), lit(1.0).as("label"), lit("holdout").as("split"))
    val remaining = tagged.filter(!col("__hold"))
      .select(col("src"), col("dst"), lit(1.0).as("label"), lit("remaining").as("split"))

    val nNeg = math.max(0L, math.round(cfg.negativeSamplingRatio))
    val negatives =
      if (nNeg == 0L) holdPos.limit(0)
      else {
        import org.apache.spark.sql.expressions.Window
        // broadcast 1-row node count: candidate targets range over the full
        // id universe like the reference's randomNodeId(graph)
        val withN: DataFrame => DataFrame = cfg.nodeCount match {
          case Some(n) => _.withColumn("__n", lit(n))
          case None => _.crossJoin(broadcast(nodes.agg(count(lit(1)).as("__n"))))
        }
        val ranked = withN(holdPos
          .withColumn("__r",
            row_number().over(Window.partitionBy("src").orderBy("dst")).cast("long")))
        val cands = ranked
          .select(col("src"), explode(sequence(lit(1L), lit(nNeg))).as("__k"), col("__r"), col("__n"))
          .select(col("src"),
            (((col("src") % 1000003L) * 48271L + (col("__r") * nNeg + col("__k")) * 16807L
              + lit(cfg.seed)) % col("__n")).as("dst"))
          .filter(col("dst") =!= col("src"))
          .distinct()
        cands.join(e, Seq("src", "dst"), "left_anti")
          .select(col("src"), col("dst"), lit(0.0).as("label"), lit("holdout").as("split"))
      }

    holdPos.unionByName(negatives).unionByName(remaining)
  }
}
