package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.algo.AlphaSimilarity
import graft.algo.AlphaSimilarity.{Metric, SimConfig}

class AlphaSimilaritySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0, 0.0)),
    (2L, Array(1.0, 0.0)),
    (3L, Array(0.0, 1.0)),
    (4L, Array(1.0, 1.0))).toDF("id", "vec")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("pair stream (topK=0) emits each unordered pair once, cutoff filters") {
    val rows = collect(AlphaSimilarity.stream(vecs, "id", "vec", Metric.Cosine,
      SimConfig(similarityCutoff = 0.5)).orderBy("node1", "node2"))
    // qualifying pairs: (1,2)=1.0, (1,4)=.7071, (2,4)=.7071, (3,4)=.7071
    assert(rows.map(t => (t._1, t._2)) == Seq((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
    assert(rows.head._3 == 1.0)
    rows.tail.foreach(t => assert(math.abs(t._3 - math.sqrt(0.5)) < 1e-12))
  }

  test("topK streams per-source K in both directions, ties to smaller node2") {
    val rows = collect(AlphaSimilarity.stream(vecs, "id", "vec", Metric.Cosine,
      SimConfig(topK = 2)).orderBy("node1", "node2"))
    // every node emits exactly 2 rows
    assert(rows.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 2))
    // node 1's top-2: node2 (cos 1.0) then node4 (.7071); node 3: 4 then one
    // of the 0.0-ties -> smaller node2 = 1
    assert(rows.filter(_._1 == 1L).map(_._2).sorted == Seq(2L, 4L))
    assert(rows.filter(_._1 == 3L).map(_._2).sorted == Seq(1L, 4L))
    // node 4 ties between nodes 1 and 2 at .7071 -> both kept (K=2)
    assert(rows.filter(_._1 == 4L).map(_._2).sorted == Seq(1L, 2L))
  }

  test("euclidean streams ascending distance with an upper-bound cutoff") {
    val pairs = collect(AlphaSimilarity.stream(vecs, "id", "vec", Metric.Euclidean,
      SimConfig(similarityCutoff = 1.2)).orderBy("node1", "node2"))
    assert(pairs.map(t => (t._1, t._2)) == Seq((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
    assert(pairs.head._3 == 0.0 && pairs.tail.forall(_._3 == 1.0))
    val top1 = collect(AlphaSimilarity.stream(vecs, "id", "vec", Metric.Euclidean,
      SimConfig(topK = 1)))
    // nearest neighbor of 1 is its duplicate 2 (distance 0), and vice versa
    assert(top1.find(_._1 == 1L).get._2 == 2L)
    assert(top1.find(_._1 == 2L).get._2 == 1L)
    // node 3's nearest is 4 (distance 1 < sqrt(2))
    assert(top1.find(_._1 == 3L).get._2 == 4L)
  }

  test("overlap metric over category lists") {
    val cats = Seq(
      (1L, Array(1L, 2L)), (2L, Array(2L, 3L)),
      (3L, Array(9L)), (4L, Array(1L, 2L, 3L))).toDF("id", "cats")
    val rows = collect(AlphaSimilarity.stream(cats, "id", "cats", Metric.Overlap,
      SimConfig(similarityCutoff = 0.9)).orderBy("node1", "node2"))
    // full containment pairs: (1,4) and (2,4) at 1.0
    assert(rows.map(t => (t._1, t._2)) == Seq((1L, 4L), (2L, 4L)))
    assert(rows.forall(_._3 == 1.0))
  }
}
