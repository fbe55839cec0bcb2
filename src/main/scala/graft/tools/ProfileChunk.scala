package graft.tools

import graft.sources.EdgeDerivation
import org.apache.spark.sql.SparkSession

/** One-JVM A/B for the pinned-iteration chunked unrolling: time
  * katz/eigencentrality/hits on the sf dir at several chunk sizes
  * (SPARK_GRAFT_ITER_CHUNK is read once per operator call via the
  * mutable knob below). Usage:
  *   sbt "runMain graft.tools.ProfileChunk <sfDir> <reps> <chunks...>"
  */
object ProfileChunk {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val chunks = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 4, 8)
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PARTS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    // warm the JVM/codegen once
    graft.operators.Centrality.katz(
      EdgeDerivation.supplierCooccurrenceByNation(spark, sfDir), 0.05, 2)
      .write.format("noop").mode("overwrite").save()
    sweep()
    for (rep <- 1 to reps; c <- chunks) {
      graft.operators.Centrality.iterChunkOverride = Some(c)
      def time(name: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        body.write.format("noop").mode("overwrite").save()
        println(f"CHUNK $c%2d rep $rep $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
        sweep()
      }
      time("katz")(graft.operators.Centrality.katz(
        EdgeDerivation.supplierCooccurrenceByNation(spark, sfDir), 0.05, 12))
      time("eigencentrality")(graft.operators.Centrality.eigenvector(
        EdgeDerivation.supplierCooccurrenceByNation(spark, sfDir), 20))
      time("hits")(graft.operators.Centrality.hits(
        EdgeDerivation.customerSupplierDirected(spark, sfDir), 12))
    }
    spark.stop()
  }
}
