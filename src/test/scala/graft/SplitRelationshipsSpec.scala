package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.SplitRelationships
import graft.ml.SplitRelationships.SplitConfig

class SplitRelationshipsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ring(n: Int) = {
    val edges = (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val nodes = spark.range(n).toDF("id")
    (edges, nodes)
  }

  test("split partitions edges exactly: holdout positives + remaining = input") {
    val (edges, nodes) = ring(200)
    val out = SplitRelationships.split(edges, nodes, SplitConfig(0.25, 1.0, 11L)).cache()
    val pos = out.filter(col("label") === 1.0)
    assert(pos.count() == 200) // every input edge appears exactly once with label 1
    val back = pos.select("src", "dst").except(edges)
    assert(back.count() == 0)
    val holdPos = out.filter(col("split") === "holdout" && col("label") === 1.0).count()
    // md5 draw at fraction 0.25 on 200 edges: binomial, expect ~50
    assert(holdPos > 25 && holdPos < 85, s"holdout positives $holdPos")
    assert(out.filter(col("split") === "remaining").count() == 200 - holdPos)
  }

  test("negatives are non-edges, non-self, inside the id universe") {
    val (edges, nodes) = ring(100)
    val out = SplitRelationships.split(edges, nodes, SplitConfig(0.3, 1.0, 5L))
    val negs = out.filter(col("label") === 0.0).cache()
    assert(negs.join(edges, Seq("src", "dst")).count() == 0)
    assert(negs.filter(col("src") === col("dst")).count() == 0)
    assert(negs.filter(col("dst") < 0 || col("dst") >= 100).count() == 0)
    // one-shot LCG sampling: count bounded by positives * ratio
    val holdPos = out.filter(col("split") === "holdout" && col("label") === 1.0).count()
    assert(negs.count() <= holdPos && negs.count() > 0)
  }

  test("deterministic across runs; fraction 0 and 1 degenerate correctly") {
    val (edges, nodes) = ring(60)
    val cfg = SplitConfig(0.2, 1.0, 42L)
    val a = SplitRelationships.split(edges, nodes, cfg).orderBy("split", "label", "src", "dst")
      .collect().toSeq
    val b = SplitRelationships.split(edges, nodes, cfg).orderBy("split", "label", "src", "dst")
      .collect().toSeq
    assert(a == b)
    val none = SplitRelationships.split(edges, nodes, SplitConfig(0.0, 1.0, 1L))
    assert(none.filter(col("split") === "holdout").count() == 0)
    assert(none.filter(col("split") === "remaining").count() == 60)
    val all = SplitRelationships.split(edges, nodes, SplitConfig(1.0, 0.0, 1L))
    assert(all.filter(col("split") === "remaining").count() == 0)
    assert(all.filter(col("label") === 1.0).count() == 60)
  }

  test("negativeSamplingRatio scales candidate count") {
    val (edges, nodes) = ring(150)
    val one = SplitRelationships.split(edges, nodes, SplitConfig(0.3, 1.0, 9L))
      .filter(col("label") === 0.0).count()
    val three = SplitRelationships.split(edges, nodes, SplitConfig(0.3, 3.0, 9L))
      .filter(col("label") === 0.0).count()
    assert(three > one, s"ratio 3 gave $three vs ratio 1 $one")
  }

  test("sameCommunity: equal -> 1, differ -> 0, missing -> 0") {
    import graft.functions.Similarity
    val df = Seq(
      (Some(1L), Some(1L)), (Some(1L), Some(2L)),
      (None: Option[Long], Some(1L)), (Some(3L), None: Option[Long])
    ).toDF("ca", "cb")
    val got = df.select(Similarity.sameCommunity(col("ca"), col("cb")).as("s"))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0, 0.0, 0.0))
  }
}
