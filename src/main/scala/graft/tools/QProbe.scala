package graft.tools
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      try graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").show(5, false)
      catch { case e: Throwable => println(s"QFAIL $q: ${e}"); e.printStackTrace() }
    }
    spark.stop()
  }
}
