package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ml.SplitRelationships.hexThreshold

/** Deterministic sampling for training-data pipelines.
  *
  * The draw is the same pure-expression md5 device [[graft.ml.SplitRelationships]]
  * uses: a 4-hex-digit prefix of md5(key:seed) compared against a threshold
  * (fraction quantized to 1/65536). No RNG state, no `rand()` — the sample is
  * a pure function of (row key, seed), so it is identical across retries,
  * partitionings, and engines (an ANSI-SQL oracle replays it bit-identically),
  * and a resumed 100-TB job re-selects exactly the same rows. Filters stay
  * inside whole-stage codegen and push down to the scan where the source
  * supports it.
  */
object Sampling {

  private def draw(keys: Seq[Column], seed: Long): Column =
    substring(md5(concat_ws(":", keys :+ lit(seed): _*)), 1, 4)

  /** Keep each row independently with probability `fraction` (quantized to
    * 1/65536), keyed by `keys` — deterministic Bernoulli sampling. */
  def hashSample(df: DataFrame, keys: Seq[Column], fraction: Double,
                 seed: Long = 42L): DataFrame =
    df.filter(draw(keys, seed) < lit(hexThreshold(fraction)))

  /** Stratified deterministic sampling: per-stratum fractions with a default
    * for unlisted strata (the Spark `sampleBy` contract, made reproducible).
    * The per-row threshold is one CASE expression — still a single
    * codegen'd filter, no per-stratum passes. */
  def stratifiedSample(df: DataFrame, strata: Column,
                       fractions: Map[String, Double], defaultFraction: Double,
                       keys: Seq[Column], seed: Long = 42L): DataFrame = {
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(hexThreshold(defaultFraction))) { case (acc, (value, frac)) =>
        when(strata === value, lit(hexThreshold(frac))).otherwise(acc)
      }
    df.filter(draw(keys, seed) < thr)
  }
}
