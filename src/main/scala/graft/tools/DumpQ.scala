package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump single SparkEntry queries to parquet for targeted oracle checks:
  * args = sfDir, outDir, query names. Writes outDir/<name>/ parquet. */
object DumpQ {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { q =>
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$q")
      println(s"DUMPED $q")
    }
    spark.stop()
  }
}
