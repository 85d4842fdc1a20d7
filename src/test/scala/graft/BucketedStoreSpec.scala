package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.io.BucketedGraphStore

class BucketedStoreSpec extends AnyFunSuite with SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed edge table: src aggregation runs with no exchange") {
    val rnd = new scala.util.Random(5L)
    val g = graphOf(100, Seq.fill(400)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong)))
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    // buckets == spark.sql.shuffle.partitions (2 in tests): the layout the
    // superstep loop's src-keyed shuffles produce
    BucketedGraphStore.save(spark, g, "bk", dir, buckets = 2)
    val loaded = BucketedGraphStore.load(spark, "bk")

    val agg = loaded.edges.groupBy("src").count()
    assert(!plan(agg).contains("Exchange"),
      s"bucketed scan must satisfy the aggregation's distribution:\n${plan(agg)}")
    // same values as the unbucketed path
    assert(collectLongMap(agg, "src", "count") ==
      collectLongMap(g.edges.groupBy("src").count(), "src", "count"))

    // a rank-message join on src shuffles ONLY the message side
    val msgs = spark.range(100).select(col("id").as("src"), lit(1.0).as("rank"))
    val joined = loaded.edges.join(msgs, "src")
    val exchanges = "Exchange".r.findAllIn(plan(joined)).size
    assert(exchanges <= 1, s"edge side must stay exchange-free:\n${plan(joined)}")

    BucketedGraphStore.drop(spark, "bk")
  }

  test("bucketed store round-trips vertices and edges exactly") {
    val g = graphOf(20, Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed2").toString
    BucketedGraphStore.save(spark, g, "bk2", dir, buckets = 2)
    val loaded = BucketedGraphStore.load(spark, "bk2")
    assert(loaded.vertices.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (0L until 20L).toSeq)
    assert(loaded.edges.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L), (2L, 3L), (3L, 1L)))
    BucketedGraphStore.drop(spark, "bk2")
  }
}
