package graft.tools
import graft.sources.EdgeDerivation
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainMismatch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")   // session conf 32
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    // replicate the shipped shape: barrier rekeyed to adaptive p=8
    val adj0 = barrier(graft.graph.GraphIO.bidirectional(graft.graph.GraphIO.canonical(
        EdgeDerivation.supplierCooccurrenceByNation(spark, sfDir)))
      .toDF("src", "dst").repartition(32, $"src"))
    val adj = barrier(adj0.repartition(8, $"src"))
    val z = barrier(adj.select($"src".as("id")).distinct()
      .select($"id", lit(1.0).as("v")).repartition(8, $"id"))
    val one = adj.as("e").join(z.as("x"), $"e.src" === $"x.id")
      .groupBy($"e.dst".as("id")).agg((lit(1.0) + lit(0.05) * sum($"x.v")).as("v"))
    println("===== iteration 1 (z is an 8-part barrier) =====")
    one.explain("formatted")
    val two = adj.as("e").join(one.as("x"), $"e.src" === $"x.id")
      .groupBy($"e.dst".as("id")).agg((lit(1.0) + lit(0.05) * sum($"x.v")).as("v"))
    println("===== iteration 2 chained (x is the in-plan agg) =====")
    two.explain("formatted")
    spark.stop()
  }
}
