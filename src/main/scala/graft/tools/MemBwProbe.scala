package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hardware-ceiling probe: an embarrassingly-parallel aggregation over a
  * cached in-memory table — zero shuffle, zero skew, no driver round-trips
  * beyond the single action — measured at two thread counts. Whatever
  * speedup THIS job gets from N -> 4N threads is the single-socket memory
  * machinery's ceiling for any data-traffic-bound job on this box; no
  * partitioning strategy can beat it. Used as the denominator context for
  * the PageRank scaling legs in BENCH/BASELINE.md. */
object MemBwProbe {
  def run(cores: Int, rows: Long): Double = {
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"membw-$cores")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = spark.range(0, rows, 1, 64)
        .select(col("id"), (col("id") % 97 * 1.000001).as("x"),
          (col("id") % 89 * 2.000002).as("y"), (col("id") % 83 * 3.000003).as("z"))
        .persist()
      df.agg(sum("x")).collect() // materialize cache
      def scan(): Double = {
        val t0 = System.nanoTime()
        df.agg(sum(col("x") * 1.5 + col("y") * 0.5 - col("z"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      scan() // warm
      Seq.fill(3)(scan()).min
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 200000000L
    for (c <- args.drop(1).headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 2, 4, 8, 16, 32))) {
      val secs = run(c, rows)
      println(f"MEMBW cores=$c rows=$rows secs=$secs%.3f rows_per_sec=${rows / secs}%.0f")
    }
  }
}
