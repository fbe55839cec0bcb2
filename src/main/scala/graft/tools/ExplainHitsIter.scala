package graft.tools
import graft.sources.EdgeDerivation
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Plan shape of ONE fused HITS iteration under shipped conditions
  * (session partitions 32, barriers rekeyed to the adaptive count). */
object ExplainHitsIter {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val dedup0 = barrier(EdgeDerivation.customerSupplierDirected(spark, sfDir)
      .select($"src", $"dst").distinct())
    val n = dedup0.count()
    val p = graft.plans.Adaptive.forRows(spark, n)
    println(s"rows=$n adaptive p=$p")
    val eBySrc = barrier(dedup0.repartition(p, $"src"))
    val eByDst = barrier(dedup0.repartition(p, $"dst"))
    val hub = barrier(eBySrc.select($"src".as("id")).distinct()
      .select($"id", lit(1.0).as("v")).repartition(p, $"id"))
    val aPlan = eBySrc.as("e").join(hub.as("h"), $"e.src" === $"h.id")
      .crossJoin(broadcast(Seq(1.0).toDF("m")))
      .groupBy($"e.dst".as("id")).agg(sum($"h.v" / $"m").as("v"))
    val curH = eByDst.as("e").join(aPlan.as("a"), $"e.dst" === $"a.id")
      .groupBy($"e.src".as("id")).agg(sum($"a.v").as("v"))
    println("===== one fused HITS iteration =====")
    curH.explain("formatted")
    spark.stop()
  }
}
