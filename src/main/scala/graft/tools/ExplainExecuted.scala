package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev utility: run a SparkEntry query with a QueryExecutionListener and
  * dump EVERY executed physical plan — the plan evidence for operators
  * that materialize eagerly behind lineage barriers, where a final-frame
  * `explain` only shows the output stage (same listener pattern as
  * PlanSpec's broadcast guards). Usage:
  *   sbt "runMain graft.tools.ExplainExecuted <sfDir> <query> [query ...]"
  */
object ExplainExecuted {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("decontaminate")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain-executed")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val plans = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(String, String)]())
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          plans.add((funcName, qe.executedPlan.toString))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        // the listener bus is async — poll until the plan list stops
        // growing (2 s quiet period, 30 s ceiling), same deadline-loop
        // pattern as PlanSpec's broadcast guards
        val deadline = System.currentTimeMillis() + 30000
        var lastSize = -1
        var lastGrew = System.currentTimeMillis()
        while (System.currentTimeMillis() < deadline &&
               System.currentTimeMillis() - lastGrew < 2000) {
          if (plans.size() != lastSize) { lastSize = plans.size(); lastGrew = System.currentTimeMillis() }
          Thread.sleep(100)
        }
        println(s"\n========== $n (executed plans, in order) ==========")
        val arr = new java.util.ArrayList[(String, String)](plans)
        arr.forEach { case (fn, p) =>
          println(s"\n---------- action=$fn ----------")
          println(p)
        }
      } finally spark.listenerManager.unregister(listener)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
