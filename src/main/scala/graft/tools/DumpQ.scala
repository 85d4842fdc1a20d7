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
    // matching oracle subset so tools/compare_oracle.py works on the dump
    val sub = graft.SparkEntry.oracleSql.filter(kv => args.drop(2).contains(kv._1))
    val jsonStr = sub.map { case (k, v) =>
      "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().writeValueAsString(v)
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      jsonStr.getBytes("UTF-8"))
    spark.stop()
  }
}
