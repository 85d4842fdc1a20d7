package graft.tools
import org.apache.spark.sql.SparkSession
/** Run one SparkEntry query + print result and wall time; compares nothing. */
object OneQueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).show(50, false)
    println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
