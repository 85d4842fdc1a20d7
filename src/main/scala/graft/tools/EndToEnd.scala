package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo._
import graft.core._
import graft.io.Pages

/** End-to-end driver for manual verification: synthesize a Common-Crawl-style
  * page table, extract links, run all four north-star algorithms, exercise
  * checkpoint + resume, print summaries.
  *
  * Usage: sbt "runMain graft.tools.EndToEnd [nPages]"
  */
object EndToEnd {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000L
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
      .appName("graft-end-to-end")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = Pages.synth(spark, n).cache()
    println(s"pages: ${pages.count()} rows")
    pages.select("url", "warc_ts", "lang").show(3, truncate = false)
    println("sample text: " + pages.select("text").first().getString(0).take(120))

    // crawl-container leg: pages -> .warc.gz -> read back; the whole
    // pipeline downstream consumes the WARC-ingested table, so a parse
    // regression breaks every printed number below
    val warcDir = java.nio.file.Files.createTempDirectory("graft-warc-e2e").toString
    graft.io.Warc.write(pages, warcDir)
    val ingested = graft.io.Warc.read(spark, warcDir)
      .withColumn("text", Pages.extractText(col("html").cast("string")))
      .cache()
    // full outer join: a parser that DROPS records must fail this sentinel,
    // not shrink the comparison set
    val warcBad = pages.select(col("url"), col("html").as("h1"))
      .join(ingested.select(col("url"), col("html")), Seq("url"), "full_outer")
      .filter(col("h1").isNull || col("html").isNull || col("h1") =!= col("html"))
      .count()
    println(s"warc roundtrip html mismatches: $warcBad (expect 0)")

    val graph = Pages.toGraph(ingested)
    val edgeCount = graph.edges.count()
    println(s"edges extracted: $edgeCount")

    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val pr = PageRank.run(graph, PageRankConfig(
      maxIterations = 10, checkpointDir = Some(ckDir + "/pr")))
    println(s"pagerank: ranIterations=${pr.ranIterations} converged=${pr.didConverge}")
    pr.scores.orderBy(desc("score")).limit(5).show(truncate = false)

    // resume must reproduce the identical final state from the snapshot
    val prResumed = PageRank.resume(graph, PageRankConfig(
      maxIterations = 10, checkpointDir = Some(ckDir + "/pr")))
    val diff = pr.scores.withColumnRenamed("score", "a")
      .join(prResumed.scores.withColumnRenamed("score", "b"), "id")
      .filter(col("a") =!= col("b")).count()
    println(s"resume score mismatches: $diff (expect 0)")

    val wcc = Wcc.run(graph)
    println(s"wcc: iterations=${wcc.ranIterations} components=" +
      wcc.components.select("componentId").distinct().count())

    val lp = LabelPropagation.run(graph, LpConfig(maxIterations = 5, schedule = Schedule.Sync))
    println(s"labelprop: iterations=${lp.ranIterations} labels=" +
      lp.labels.select("label").distinct().count())

    val tc = TriangleCount.run(graph)
    println(s"triangles: global=${tc.globalTriangles}")
    println("plan of pagerank scores:")
    pr.scores.explain("simple")
    spark.stop()
    graft.io.Fs.deleteRecursively(warcDir)
    graft.io.Fs.deleteRecursively(ckDir)
  }
}
