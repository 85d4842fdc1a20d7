package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.algo.Node2Vec
import graft.algo.Node2Vec.Node2VecConfig

/** node2vec fixtures — structural assertions matching the reference's test
  * shapes (algo/src/test/java/org/neo4j/gds/embeddings/node2vec/
  * Node2VecTest.java asserts dimensions/coverage, not vector values: the
  * trainer is stochastic there too). */
class Node2VecSpec extends AnyFunSuite with SparkTestBase {

  // directed ring 0->1->...->9->0 plus shortcuts, so every node has out-degree
  private val ring = (0L until 10L).map(i => (i, (i + 1) % 10)) ++
    (0L until 10L by 2).map(i => (i, (i + 5) % 10))
  private def g = graphOf(10, ring)

  test("biased walks: every transition is a real edge, walks cover all nodes") {
    val cfg = Node2VecConfig(embeddingDimension = 8, walkLength = 6,
      walksPerNode = 2, returnFactor = 0.5, inOutFactor = 2.0,
      rejectionRounds = 4)
    val walks = Node2Vec.biasedWalks(g, cfg)
    // (walkId, step) -> nodeId transitions must all be edges
    val trans = walks.alias("a").join(walks.alias("b"),
        col("a.walkId") === col("b.walkId") &&
        col("a.step") + 1 === col("b.step"))
      .select(col("a.nodeId").as("src"), col("b.nodeId").as("dst"))
    import spark.implicits._
    val bad = trans.join(ring.toDF("src", "dst"), Seq("src", "dst"), "left_anti").count()
    assert(bad == 0, s"$bad invalid transitions")
    // 2 walks per node, every walk starts at its node and has full length
    assert(walks.filter(col("step") === 0).count() == 20)
    assert(walks.filter(col("step") === 5).count() == 20) // no sinks in ring
    // deterministic across runs
    val again = Node2Vec.biasedWalks(g, cfg)
    assert(walks.exceptAll(again).count() == 0)
  }

  test("walks stop at sinks") {
    val chain = graphOf(4, Seq((0L, 1L), (1L, 2L), (2L, 3L))) // 3 is a sink
    val walks = Node2Vec.biasedWalks(chain,
      Node2VecConfig(embeddingDimension = 4, walkLength = 8, walksPerNode = 1))
    // walk from 0 reaches 3 at step 3 and stops
    val w0 = walks.filter(col("walkId") === "0_0").orderBy("step")
      .select("nodeId").collect().map(_.getLong(0)).toSeq
    assert(w0 == Seq(0L, 1L, 2L, 3L))
  }

  test("run: embeddings have the right dimension and cover walked nodes") {
    val r = Node2Vec.run(g, Node2VecConfig(embeddingDimension = 16,
      walkLength = 8, walksPerNode = 4, windowSize = 3, minCount = 0))
    val emb = r.embeddings.persist()
    assert(emb.count() == 10) // every ring node appears in some walk
    assert(emb.filter(size(col("embedding")) =!= 16).count() == 0)
    assert(emb.filter(exists(col("embedding"), v => isnan(v))).count() == 0)
  }
}
