package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Print the formatted physical plan of selected new ops at sf0.1. */
object PlanAuditProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val bench = docs.filter(col("doc_id") % 7 === 0).select("text")
    println("=== contamination ===")
    graft.ops.TextOps.contamination(docs, "doc_id", "text", bench, "text", n = 5)
      .explain("formatted")
    println("=== paragraphAudit ===")
    val w = split(col("text"), " ")
    val d = docs.select(col("doc_id"),
      array(concat_ws(" ", slice(w, 1, 8)), concat_ws(" ", slice(w, 9, 8))).as("pars"))
    graft.ops.Dedup.paragraphAudit(d, "doc_id", "pars").explain("formatted")
    spark.stop()
  }
}
