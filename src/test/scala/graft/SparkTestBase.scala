package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.PropertyGraph

/** One SparkSession per test JVM (all suites fork into a single JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // tiny fixtures: minimize per-superstep scheduling overhead
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a long GC stall on a loaded box can fail enough consecutive
      // executor->driver heartbeats to self-kill the JVM (exit 56) even in
      // local mode, taking every later suite with it — relax the heartbeat
      // so only a genuinely wedged JVM dies
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase extends org.scalatest.BeforeAndAfterAll {
  this: org.scalatest.Suite =>
  lazy val spark: SparkSession = TestSpark.spark

  /** All suites share one JVM/session; operators deliberately leave
    * lazy-lifetime caches pinned (memoized mutate-mode vertices, candidate
    * tables). Dropping every cached block when a suite finishes keeps the
    * unified memory pool's storage side from starving execution in later
    * suites on a loaded box. */
  override def afterAll(): Unit = {
    try spark.catalog.clearCache() finally super.afterAll()
  }

  /** Graph from an explicit edge list over vertex ids 0 until n —
    * the analogue of the reference's GDL fixtures with declaration-order ids
    * (test-utils/src/main/java/org/neo4j/gds/TestSupport.java:133-155). */
  def graphOf(n: Int, edges: Seq[(Long, Long)]): PropertyGraph = {
    import spark.implicits._
    PropertyGraph(
      spark.range(n).toDF("id"),
      edges.toDF("src", "dst"))
  }

  def weightedGraphOf(n: Int, edges: Seq[(Long, Long, Double)]): PropertyGraph = {
    import spark.implicits._
    PropertyGraph(
      spark.range(n).toDF("id"),
      edges.toDF("src", "dst", "weight"))
  }

  def collectMap(df: DataFrame, key: String, value: String): Map[Long, Double] =
    df.select(col(key).cast("long"), col(value).cast("double"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  def collectLongMap(df: DataFrame, key: String, value: String): Map[Long, Long] =
    df.select(col(key).cast("long"), col(value).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  def assertRanks(actual: Map[Long, Double], expected: Map[Long, Double], tol: Double): Unit =
    expected.foreach { case (id, exp) =>
      val act = actual.getOrElse(id, Double.NaN)
      assert(math.abs(act - exp) <= tol,
        s"node $id: expected $exp, got $act (|diff| > $tol)")
    }
}
