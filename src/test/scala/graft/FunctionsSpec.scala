package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Similarity
import graft.algo.Scaler

/** Degree-weighted link-prediction functions and the L1Norm scaler —
  * hand-computed fixtures (reference: alpha/alpha-proc/src/main/java/org/
  * neo4j/gds/functions/linkprediction/, algo-common/.../scaling/
  * ScalarScaler.java:55-122). */
class FunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Symmetric distinct adjacency table from an undirected edge list. */
  private def nbrOf(edges: Seq[(Long, Long)]) =
    edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct.toDF("id", "nb")

  test("adamicAdar on the square-with-diagonal fixture") {
    // 0-1-2-3-0 ring + 0-2 diagonal: deg(0)=deg(2)=3, deg(1)=deg(3)=2
    val nbr   = nbrOf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)))
    val pairs = Seq((1L, 3L), (0L, 2L), (0L, 1L)).toDF("a", "b")
    val aa = Similarity.adamicAdar(nbr, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(aa((1L, 3L)) - 2.0 / math.log(3.0)) < 1e-12) // common {0,2}
    assert(math.abs(aa((0L, 2L)) - 2.0 / math.log(2.0)) < 1e-12) // common {1,3}
    assert(math.abs(aa((0L, 1L)) - 1.0 / math.log(3.0)) < 1e-12) // common {2}
  }

  test("resourceAllocation on the same fixture; 0.0 without common neighbors") {
    val nbr   = nbrOf(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)))
    val pairs = Seq((1L, 3L), (0L, 2L), (0L, 1L)).toDF("a", "b")
    val ra = Similarity.resourceAllocation(nbr, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(ra((1L, 3L)) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(ra((0L, 2L)) - 1.0) < 1e-12)
    assert(math.abs(ra((0L, 1L)) - 1.0 / 3.0) < 1e-12)

    // path 0-1-2-3: (0,3) shares no neighbor -> explicit 0.0 row
    val path  = nbrOf(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    val far   = Seq((0L, 3L)).toDF("a", "b")
    assert(Similarity.resourceAllocation(path, far).collect()
      .head.getDouble(2) == 0.0)
    assert(Similarity.adamicAdar(path, far).collect().head.getDouble(2) == 0.0)
  }

  test("L1Norm scaler divides by the sum of absolute values") {
    val df  = Seq((0L, 2.0), (1L, -3.0), (2L, 5.0)).toDF("id", "v")
    val out = Scaler.apply(Scaler.L1Norm, df, "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) == 0.2 && out(1L) == -0.3 && out(2L) == 0.5)
  }

  test("L1Norm scaler leaves an all-zero column unchanged (guarded divisor)") {
    val df  = Seq((0L, 0.0), (1L, 0.0)).toDF("id", "v")
    val out = Scaler.apply(Scaler.L1Norm, df, "v").collect().map(_.getDouble(1))
    assert(out.forall(_ == 0.0))
  }
}
