package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's utility function surface (`gds.util.*`, `gds.version`,
  * `gds.list` — reference: doc/asciidoc/operations-reference/
  * utility-operation-references.adoc; proc/.../NodePropertyFunc.java,
  * AsNodeFunc.java, one-liners in proc/common). All pure Catalyst
  * expressions or catalog lookups.
  */
object GdsUtil {

  val version: String = "graft 0.1.0 (gds-compat 1.x surface)"

  /** gds.util.NaN() / infinity() */
  def nan: Column = lit(Double.NaN)
  def infinity: Column = lit(Double.PositiveInfinity)

  /** gds.util.isFinite / isInfinite (reference semantics: NaN is NOT
    * finite and NOT infinite). */
  def isFinite(c: Column): Column =
    !isnan(c) && c =!= lit(Double.PositiveInfinity) && c =!= lit(Double.NegativeInfinity)
  def isInfinite(c: Column): Column =
    c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity)

  /** gds.util.asNode(s): join internal result ids back to the vertex table
    * (the reference resolves ids to Neo4j node entities; the Spark analogue
    * re-attaches the vertex property columns). */
  def asNodes(result: DataFrame, vertices: DataFrame,
              idCol: String = "id"): DataFrame =
    result.join(vertices.withColumnRenamed("id", idCol), idCol)

  /** gds.util.nodeProperty(graph, id, property): one property column for a
    * result id set. */
  def nodeProperty(result: DataFrame, vertices: DataFrame,
                   property: String, idCol: String = "id"): DataFrame =
    result.join(vertices.select(col("id").as(idCol), col(property)), idCol)
}
