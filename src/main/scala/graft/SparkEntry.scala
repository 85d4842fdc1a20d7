package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full web-graph pipeline — synthesize a Common-Crawl-style
    * page table, extract links into an edge table, run GDS-semantics PageRank,
    * return the top pages joined back to their urls. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = graft.io.Pages.synth(spark, 2000L)
    val graph = graft.io.Pages.toGraph(pages)
    val pr    = graft.algo.PageRank.run(graph,
      graft.algo.PageRankConfig(maxIterations = 10))
    pr.scores.join(graph.vertices, "id")
      .select(col("url"), col("score"))
      .orderBy(desc("score"), col("url"))
      .limit(20)
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
