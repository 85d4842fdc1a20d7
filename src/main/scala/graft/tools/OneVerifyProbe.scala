package graft.tools
import org.apache.spark.sql.SparkSession
/** Dump one SparkEntry query result + its oracle to a directory (mini Verify). */
object OneVerifyProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1); val outDir = args(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    val sqls = graft.SparkEntry.oracleSql.filter(_._1 == name)
    val json = sqls.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\"" }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_one.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
