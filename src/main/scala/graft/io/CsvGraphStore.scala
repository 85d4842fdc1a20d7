package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import java.nio.file.{Files, Paths}
import graft.core.PropertyGraph

/** Graph export/import with schema sidecars — the analogue of the
  * reference's `gds.beta.graph.export.csv` + CSV restore (reference:
  * csv/src/main/java/org/neo4j/gds/core/utils/io/file/csv/
  * GraphStoreToFileExporter.java, CsvGraphStoreImporter.java). Layout:
  *
  * {{{
  * <dir>/vertices/ and <dir>/edges/   (csv parts)
  * <dir>/vertices.schema.json, <dir>/edges.schema.json
  * }}}
  *
  * Schemas ride as Spark DDL JSON so the import round-trips types exactly.
  */
object CsvGraphStore {

  def export(graph: PropertyGraph, dir: String): Unit = {
    graph.vertices.write.mode("overwrite").option("header", "true")
      .csv(s"$dir/vertices")
    graph.edges.write.mode("overwrite").option("header", "true")
      .csv(s"$dir/edges")
    Files.writeString(Paths.get(dir, "vertices.schema.json"), graph.vertices.schema.json)
    Files.writeString(Paths.get(dir, "edges.schema.json"), graph.edges.schema.json)
  }

  def importGraph(spark: SparkSession, dir: String): PropertyGraph = {
    def read(name: String): DataFrame = {
      val schema = DataType.fromJson(
        Files.readString(Paths.get(dir, s"$name.schema.json"))).asInstanceOf[StructType]
      spark.read.schema(schema).option("header", "true").csv(s"$dir/$name")
    }
    PropertyGraph(read("vertices"), read("edges"))
  }

  /** Parquet variant with Iceberg-style snapshots (SnapshotStore): the
    * scale-appropriate export — columnar, compressed, atomic commit. */
  def exportSnapshot(graph: PropertyGraph, dir: String): Unit = {
    SnapshotStore.commit(graph.vertices, s"$dir/vertices", Map("kind" -> "vertices"))
    SnapshotStore.commit(graph.edges, s"$dir/edges", Map("kind" -> "edges"))
  }

  def importSnapshot(spark: SparkSession, dir: String): PropertyGraph =
    PropertyGraph(
      SnapshotStore.read(spark, s"$dir/vertices"),
      SnapshotStore.read(spark, s"$dir/edges"))
}
