package graft.io

import org.apache.spark.sql.SparkSession
import graft.core.PropertyGraph

/** Bucket-partitioned persistent graph storage.
  *
  * Edges are saved `bucketBy(n, "src")` (sorted within buckets) and vertices
  * `bucketBy(n, "id")`, so algorithms read the tables ALREADY hash-
  * distributed by their join keys: a `groupBy("src")` or a co-partitioned
  * superstep join needs no initial exchange of the edge table. At web scale
  * the first repartition of a 100-TB edge table is the single largest fixed
  * cost of EVERY algorithm run — bucketing pays that shuffle once at ingest
  * and amortizes it over all subsequent runs (the analogue of the
  * reference's pre-built CSR store, expressed as a Catalyst table layout;
  * reference: core/src/main/java/org/neo4j/gds/core/huge/HugeGraph.java's
  * persistent adjacency vs per-algorithm rebuilds).
  *
  * Match `buckets` to the shuffle-partition count the algorithms run with
  * and the bucketed side of every src-keyed join stays exchange-free.
  *
  * The data files and bucket spec live under `dir`; the table registration
  * is per-catalog (this sandbox runs the in-memory session catalog — a
  * production deployment registers the same layout in its shared metastore
  * and every session inherits it).
  */
object BucketedGraphStore {

  private def tableNames(name: String): (String, String) =
    (s"${name}_vertices", s"${name}_edges")

  /** Persist `graph` bucketed under `dir` and register `<name>_vertices` /
    * `<name>_edges` in the session catalog. */
  def save(spark: SparkSession, graph: PropertyGraph, name: String,
           dir: String, buckets: Int): Unit = {
    val (vt, et) = tableNames(name)
    spark.sql(s"DROP TABLE IF EXISTS $vt")
    spark.sql(s"DROP TABLE IF EXISTS $et")
    graph.vertices.write.mode("overwrite")
      .option("path", s"$dir/vertices")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(vt)
    graph.edges.write.mode("overwrite")
      .option("path", s"$dir/edges")
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(et)
  }

  /** The bucketed graph as registered tables: scans carry the bucket
    * distribution, so src/id-keyed aggregations and joins skip the initial
    * exchange. */
  def load(spark: SparkSession, name: String): PropertyGraph = {
    val (vt, et) = tableNames(name)
    PropertyGraph(spark.table(vt), spark.table(et))
  }

  /** Drop both tables AND their data files. saveAsTable with an explicit
    * path creates EXTERNAL tables, so DROP TABLE alone leaves every data
    * file on disk — the store owns its directory, so it deletes the table
    * locations too. */
  def drop(spark: SparkSession, name: String): Unit = {
    val (vt, et) = tableNames(name)
    for (t <- Seq(vt, et)) {
      val loc =
        try {
          val ident = spark.sessionState.sqlParser.parseTableIdentifier(t)
          if (spark.sessionState.catalog.tableExists(ident))
            Some(spark.sessionState.catalog.getTableMetadata(ident).location)
          else None
        } catch { case _: Exception => None }
      spark.sql(s"DROP TABLE IF EXISTS $t")
      loc.foreach(u =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(u.getPath)): Unit)
    }
  }
}
