package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph

/** `gds.beta.graph.generate` analogue: deterministic seeded random graphs
  * with the reference's three degree/target distributions and property
  * producers (reference: core/src/main/java/org/neo4j/gds/beta/generator/
  * RandomGraphGenerator.java:78-100, RelationshipDistribution.java:34-75,
  * PropertyProducer.java).
  *
  * Reference semantics reproduced distribution-for-distribution:
  *  - UNIFORM:   out-degree = averageDegree exactly; targets uniform.
  *  - RANDOM:    out-degree ~ gaussian(averageDegree, averageDegree/2),
  *               clamped to [0, nodeCount]; targets uniform.
  *  - POWER_LAW: out-degree like RANDOM; targets power-law sampled over
  *               [1, nodeCount-1] with gamma = 1 + 1/averageDegree
  *               (inverse-transform), so the in-degree tail is the skew.
  *
  * The reference draws from a seeded java.util.Random; here every draw is a
  * pure column expression over xxhash64(seed, id, k) — same families,
  * byte-stable across runs AND parallelism levels (a per-thread Random
  * would not be), and generation is a single narrow pipeline: no shuffle
  * until the caller aggregates.
  */
object GraphGenerate {

  sealed trait Distribution
  object Distribution {
    case object Uniform  extends Distribution
    case object Random   extends Distribution
    case object PowerLaw extends Distribution
  }

  /** Property producers (reference PropertyProducer.java): deterministic
    * per-node columns appended to the generated vertices. */
  sealed trait PropertyProducer { def name: String }
  final case class FixedDouble(name: String, value: Double) extends PropertyProducer
  final case class RandomDouble(name: String, min: Double, max: Double) extends PropertyProducer
  final case class RandomLong(name: String, min: Long, max: Long) extends PropertyProducer
  final case class RandomEmbedding(name: String, dim: Int) extends PropertyProducer

  /** Uniform (0, 1] double from a 64-bit hash column — used where a zero
    * draw would be unsafe (Box-Muller's log). */
  private def unit(h: Column): Column =
    (shiftrightunsigned(h, 11) + lit(1L)).cast("double") / lit(9007199254740992.0)

  /** Uniform [0, 1) double — java.util.Random.nextDouble's range, so
    * RandomDouble spans [min, max) exactly like the reference producer. */
  private def unitCO(h: Column): Column =
    shiftrightunsigned(h, 11).cast("double") / lit(9007199254740992.0)

  /** Gaussian sample via Box-Muller over two hash draws, rounded and
    * clamped to [0, nodeCount] (reference DistributionHelper.gaussianSample). */
  private def gaussian(seed: Long, tag: Long, id: Column, mean: Long, n: Long): Column = {
    val u1 = unit(xxhash64(lit(seed), lit(tag), id, lit(1)))
    val u2 = unit(xxhash64(lit(seed), lit(tag), id, lit(2)))
    val g  = sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    greatest(lit(0L), least(lit(n),
      round(lit(mean.toDouble) + lit(mean / 2.0) * g).cast("long")))
  }

  /** Power-law inverse-transform sample over [min, max] with exponent
    * gamma (reference DistributionHelper.powerLawSample). */
  private def powerLaw(u: Column, min: Long, max: Long, gamma: Double): Column = {
    val e    = 1.0 - gamma
    val loPw = math.pow(min.toDouble, e)
    val hiPw = math.pow(max.toDouble, e)
    least(lit(max), greatest(lit(min),
      floor(pow(lit(hiPw) * u + lit(loPw) * (lit(1.0) - u), lit(1.0 / e))).cast("long")))
  }

  /** Generate the edge table: one row per (src, k < degree(src)). */
  def edges(spark: SparkSession, nodeCount: Long, averageDegree: Long,
            distribution: Distribution, seed: Long = 42L): DataFrame = {
    require(nodeCount >= 1 && averageDegree >= 1,
      "generate requires nodeCount >= 1 and averageDegree >= 1")
    val i = col("id")
    val deg = distribution match {
      case Distribution.Uniform => lit(averageDegree)
      case _                    => gaussian(seed, 1L, i, averageDegree, nodeCount)
    }
    val base = spark.range(nodeCount).select(i.as("src"), deg.as("deg"))
      .filter(col("deg") > 0L)
      .select(col("src"), explode(sequence(lit(0L), col("deg") - 1L)).as("k"))
    val u = unit(xxhash64(lit(seed), lit(2L), col("src"), col("k")))
    val dst = distribution match {
      case Distribution.PowerLaw =>
        powerLaw(u, 1L, math.max(1L, nodeCount - 1), 1.0 + 1.0 / averageDegree)
      case _ =>
        pmod(xxhash64(lit(seed), lit(3L), col("src"), col("k")), lit(nodeCount))
    }
    base.select(col("src"), dst.as("dst"))
  }

  /** Generate the full graph: all nodeCount vertices (isolated ones kept,
    * like the reference) with producer-defined property columns. */
  def graph(spark: SparkSession, nodeCount: Long, averageDegree: Long,
            distribution: Distribution, seed: Long = 42L,
            properties: Seq[PropertyProducer] = Seq.empty): PropertyGraph = {
    // The property NAME is mixed into every hash: the reference draws each
    // property independently from its shared seeded Random, so two producers
    // of the same type on one graph must not be affine transforms of the
    // same underlying draw.
    val verts = properties.foldLeft(spark.range(nodeCount).toDF("id")) { (df, p) =>
      def h(tag: Long, extra: Column*): Column =
        xxhash64(Seq(lit(seed), lit(100L + tag), lit(p.name), col("id")) ++ extra: _*)
      p match {
        case FixedDouble(nm, v)      => df.withColumn(nm, lit(v))
        case RandomDouble(nm, a, b)  =>
          df.withColumn(nm, lit(a) + unitCO(h(1)) * lit(b - a))
        case RandomLong(nm, a, b)    =>
          df.withColumn(nm, lit(a) + pmod(h(2), lit(math.max(1L, b - a))))
        case RandomEmbedding(nm, dim) =>
          df.withColumn(nm, transform(sequence(lit(0), lit(dim - 1)),
            d => unitCO(h(3, d)) * lit(2.0) - lit(1.0)))
      }
    }
    PropertyGraph(verts, edges(spark, nodeCount, averageDegree, distribution, seed))
  }
}
