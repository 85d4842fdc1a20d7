package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding:
  * `floor(x * 10^d + 0.5 + 1e-6) / 10^d`.
  *
  * Built-in `round` differs between engines on exact .5 boundaries (Spark:
  * HALF_UP on doubles; DuckDB: float-typed/HALF_EVEN), which breaks
  * value-hash oracle comparisons. The floor formulation is pure IEEE
  * arithmetic — identical in any engine. The 1e-6 nudge (in scaled space)
  * absorbs summation-order noise for values that land *exactly on* a
  * rounding boundary (e.g. dyadic rationals like 0.1765625 from weighted
  * PageRank): both engines then deterministically round such values up,
  * instead of flipping on ±1ulp aggregation-order differences. NaN passes
  * through. */
object Num {
  def roundTo(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * lit(p) + lit(0.5) + lit(1e-6)) / lit(p)
  }

  /** The same formula as a SQL fragment (DuckDB-compatible). */
  def roundSql(expr: String, digits: Int): String = {
    val p = "1" + ("0" * digits)
    s"floor(($expr) * $p.0 + 0.5 + 0.000001) / $p.0"
  }
}
