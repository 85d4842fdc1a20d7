package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MhStreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.streaming.stateStore.numStateStorePartitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $tag: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val docsDf = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id","text")
    val docs = t("collect")(docsDf.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1))).sortBy(_._1))
    val input = MemoryStream[(Long, String)]
    val withTs = input.toDS().toDF("doc_id","text")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    val stream = t("start")(graft.streaming.StreamOps
      .minHashCandidateStream(withTs, "doc_id", "text", "ts", watermark = "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("mhp").start())
    val (a,b) = docs.splitAt(docs.length/2)
    t("batch1"){ input.addData(a.toSeq); stream.processAllAvailable() }
    t("batch2"){ input.addData(b.toSeq); stream.processAllAvailable() }
    stream.stop()
    val cands = t("cand collect")(spark.table("mhp").select("id_a","id_b").distinct()
      .as[(Long,Long)].collect().toSeq)
    println(s"[mh] candidates: ${cands.size}")
    val cdf = cands.toDF("id_a","id_b")
    t("verify")(graft.ops.Dedup.jaccardForPairs(docsDf, cdf, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.8).count())
    spark.stop()
  }
}
