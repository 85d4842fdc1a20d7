package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-2 dev probe: times the reworked ops on real sf data. */
object ProbeR2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").persist()
    println("docs=" + docs.count())
    t("minhash exact near-dups (warm 1)") {
      println("pairs=" + graft.ops.Dedup.minHashNearDuplicatesExact(
        docs, "doc_id", "text", threshold = 0.8).count())
    }
    t("minhash exact near-dups (warm 2)") {
      println("pairs=" + graft.ops.Dedup.minHashNearDuplicatesExact(
        docs, "doc_id", "text", threshold = 0.8).count())
    }
    t("minhash est near-dups") {
      println("pairs=" + graft.ops.Dedup.minHashNearDuplicates(
        docs, "doc_id", "text", threshold = 0.5).count())
    }
    t("simhash near-dups bands=8 maxHamming=7") {
      println("pairs=" + graft.ops.Dedup.simHashNearDuplicates(
        docs, "doc_id", "text", maxHamming = 7, bands = 8).count())
    }
    // hamming distribution of the exact j>=0.8 pairs (recall evidence)
    t("simhash hamming of true pairs") {
      val exact = graft.ops.Dedup.minHashNearDuplicatesExact(docs, "doc_id", "text", threshold = 0.8)
      val sh = graft.ops.Dedup.simHash(docs, "doc_id", "text")
      exact.join(sh.select(col("id").as("id_a"), col("simhash").as("ha")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("simhash").as("hb")), "id_b")
        .select(graft.ops.Dedup.hammingDistance(col("ha"), col("hb")).as("hd"))
        .groupBy("hd").count().orderBy("hd").show(50)
    }
    spark.stop()
  }
}
