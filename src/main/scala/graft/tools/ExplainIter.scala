package graft.tools

import graft.sources.EdgeDerivation
import org.apache.spark.sql.GraftLineage._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the physical plan of ONE iteration of the pinned loops (the part
  * `Explain` cannot see — barriers hide loop interiors). */
object ExplainIter {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val p = spark.sessionState.conf.numShufflePartitions
    val adj = graft.graph.GraphIO.bidirectional(graft.graph.GraphIO.canonical(
        EdgeDerivation.supplierCooccurrenceByNation(spark, sfDir)))
      .toDF("src", "dst").repartition(p, $"src").cutLineage()
    val z = barrier(
      adj.select($"src".as("id")).distinct()
        .select($"id", lit(1.0).as("v")).repartition(p, $"id"))
    println("========== one katz-style iteration ==========")
    val one = adj.as("e").join(z.as("x"), $"e.src" === $"x.id")
      .groupBy($"e.dst".as("id"))
      .agg((lit(1.0) + lit(0.05) * sum($"x.v")).as("v"))
    one.explain("formatted")
    println("========== two chained iterations ==========")
    val two = adj.as("e").join(one.as("x"), $"e.src" === $"x.id")
      .groupBy($"e.dst".as("id"))
      .agg((lit(1.0) + lit(0.05) * sum($"x.v")).as("v"))
    two.explain("formatted")
    spark.stop()
  }
}
