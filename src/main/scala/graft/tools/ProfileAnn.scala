package graft.tools

import graft.functions.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: recall@k of the SRP-LSH ANN vs brute force, by config. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val k = 10
    val exact = Similarity.bruteForceTopK(emb, queries, k)
      .select("query_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((planes, bandBits) <- Seq((24, 4), (32, 4), (48, 4), (64, 4), (48, 6), (16, 2))) {
      val t0 = System.nanoTime()
      val got = Similarity.lshTopK(emb, queries, k, dim, planes, bandBits)
        .select("query_id", "nbr_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (exact & got).size.toDouble / exact.size
      println(f"ANN planes=$planes%2d bandBits=$bandBits%2d bands=${planes / bandBits}%2d recall@$k=${recall}%.3f  ${sec}%5.1f s")
    }
    spark.stop()
  }
}
