package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regressions: the properties that make these queries viable
  * at 100 TB are visible in the physical plan — filters reaching the
  * parquet scan, column pruning, whole-stage codegen, map-side partial
  * aggregation, broadcast of the small join side. Catching a plan
  * regression here is much cheaper than re-discovering it in a bench. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.explainString(FormattedMode)

  test("ann_topk: query-side filter is pushed to the parquet scan and broadcast") {
    val plan = planOf(SparkEntry.queries("ann_topk")(spark, dir))
    plan should include("PushedFilters")
    plan should include regex "LessThan\\(vec_id,\\s*10\\)"
    plan should include("BroadcastNestedLoopJoin")
  }

  test("content_sha: column pruning — scan reads only doc_id and text") {
    val plan = planOf(SparkEntry.queries("content_sha")(spark, dir))
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    readSchemas should include("doc_id")
    readSchemas should include("text")
    readSchemas should not include "lang"    // present in the file, pruned
    readSchemas should not include "source"
  }

  test("text_stats: stays inside whole-stage codegen (no UDFs)") {
    // under AQE the pre-execution plan has no codegen subtrees yet —
    // inspect the statically-planned form
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("text_stats")(spark, dir)
      val codegen = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
      codegen should include regex "Found [1-9][0-9]* WholeStageCodegen subtrees"
      val plan = planOf(df)
      plan should not include "BatchEvalPython"
      plan should not include "ScalaUDF"
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("minhash candidate generation is a bucket equi-join, never a cross join") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val plan = planOf(graft.functions.Dedup.minhashCandidates(
      d, org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("text")))
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("vocab_topk: limit+sort plans as TakeOrdered, no global sort of the vocabulary") {
    val plan = planOf(SparkEntry.queries("vocab_topk")(spark, dir))
    plan should include("TakeOrderedAndProject")
    plan should include("partial_count") // map-side combine under the Zipf head
  }

  test("degrees: map-side partial aggregation before the shuffle") {
    val plan = planOf(SparkEntry.queries("degrees")(spark, dir))
    plan should include("partial_count")
  }

  test("edges_supplier: self-join keys pushed as IsNotNull to both scans") {
    val plan = planOf(SparkEntry.queries("edges_supplier")(spark, dir))
    plan should include regex "IsNotNull\\(l_orderkey\\)"
    // only the join keys + payload survive pruning
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    readSchemas should not include "l_extendedprice"
  }
}
