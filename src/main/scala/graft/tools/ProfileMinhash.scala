package graft.tools

import graft.functions.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the minhash pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    time("count")(d.count())
    val rep = d.repartition(32)
    time("tokens")(rep.select(TextAnalysis.tokens($"text")).write.format("noop").mode("overwrite").save())
    time("shingles")(rep.select(Dedup.shingles($"text", 3)).write.format("noop").mode("overwrite").save())
    time("shingles_distinct")(rep.select(array_distinct(Dedup.shingles($"text", 3))).write.format("noop").mode("overwrite").save())
    time("h1_only")(rep.select(transform(array_distinct(Dedup.shingles($"text", 3)), s => xxhash64(s))).write.format("noop").mode("overwrite").save())
    time("full_sig")(rep.select(Dedup.minhashSignature($"text", 3, 64)).write.format("noop").mode("overwrite").save())
    time("full_sig2")(rep.select(Dedup.minhashSignature($"text", 3, 64)).write.format("noop").mode("overwrite").save())
    val banded = time("banded_build")(Dedup.bandedSignatures(d, $"doc_id", $"text"))
    time("banded_noop")(banded.write.format("noop").mode("overwrite").save())
    time("banded_sorted")(Dedup.bandedSignatures(d, $"doc_id", $"text").orderBy("id", "band").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
