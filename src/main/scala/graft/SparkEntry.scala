package graft

import graft.graph.GraphIO
import graft.operators.{ConnectedComponents, GraphMetrics, TriangleCount}
import graft.operators.ConnectedComponents.{CCStrategy, Config}
import graft.sources.EdgeDerivation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query reads the driver-generated parquet under `sfDir` and has a
  * deterministic total output order (the driver hashes values after
  * sorting columns by name; rows are ordered identically in the Spark
  * query and the DuckDB oracle SQL to be safe).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * connected components of the supplier co-occurrence graph. */
  def entry(spark: SparkSession): DataFrame =
    ccLabels(spark, "/root/testdata/sf0.001", CCStrategy.HookAndContract)

  private def ccLabels(spark: SparkSession, dir: String, strategy: CCStrategy): DataFrame = {
    val edges = EdgeDerivation.supplierCooccurrence(spark, dir)
    ConnectedComponents.run(edges, None, Config(strategy = strategy))
      .labels.toDF().orderBy("id")
  }

  private def ccNationLabels(spark: SparkSession, dir: String): DataFrame = {
    val edges = EdgeDerivation.supplierCooccurrenceByNation(spark, dir)
    ConnectedComponents.run(edges, None, Config()).labels.toDF().orderBy("id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S2/P1/P3 + dedup — derived canonical edge table
    "edges_supplier" -> ((s, dir) =>
      EdgeDerivation.supplierCooccurrence(s, dir).toDF().orderBy("src", "dst")),
    // A5-adjacent per-vertex degree (groupBy-count agg)
    "degrees" -> ((s, dir) =>
      GraphMetrics.degrees(EdgeDerivation.supplierCooccurrence(s, dir))
        .orderBy("id")),
    // G2-G4+G10: full CC, reference-faithful hook/jump/contract strategy
    "cc_supplier" -> ((s, dir) => ccLabels(s, dir, CCStrategy.HookAndContract)),
    // same fixpoint via small-star/large-star (SoCC'14) — same oracle
    "cc_supplier_star" -> ((s, dir) => ccLabels(s, dir, CCStrategy.AlternatingStar)),
    // same fixpoint via PPoPP'18 sampled contraction — same oracle
    "cc_supplier_sampled" -> ((s, dir) => ccLabels(s, dir, CCStrategy.SampledContraction)),
    // multi-component CC (same-nation restriction)
    "cc_nation" -> ((s, dir) => ccNationLabels(s, dir)),
    // A4/A5: component count + sizes
    "cc_sizes" -> ((s, dir) => {
      val labels = ConnectedComponents.run(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir)).labels
      ConnectedComponents.componentSizes(labels).orderBy("label")
    }),
    // triangle count (wedge join + closing semi-join)
    "triangles" -> ((s, dir) =>
      TriangleCount.count(EdgeDerivation.supplierCooccurrenceByNation(s, dir))),
    // per-vertex triangle participation
    "triangles_per_vertex" -> ((s, dir) =>
      TriangleCount.perVertex(EdgeDerivation.supplierCooccurrenceByNation(s, dir))
        .orderBy("id")),
    // degree histogram (skew diagnostics)
    "degree_histogram" -> ((s, dir) =>
      GraphMetrics.degreeHistogram(EdgeDerivation.supplierCooccurrenceByNation(s, dir))),
    // PageRank (power iteration, damping .85, dangling redistribution);
    // iterative + floating point → rows-only driver check, allclose-tested
    // against a dense oracle in PageRankSpec
    "pagerank" -> ((s, dir) =>
      graft.operators.PageRank.run(EdgeDerivation.supplierCooccurrenceByNation(s, dir))
        .ranks.orderBy("id")),
    // deterministic synchronous label propagation (ties → min label);
    // iterative → rows-only check, oracle-tested in LpaTriangleSpec
    "lpa" -> ((s, dir) =>
      graft.operators.LabelPropagation.run(
        EdgeDerivation.supplierCooccurrenceByNation(s, dir))
        .labels.orderBy("id")),
    // north-rule per-row invariant: content sha256 across a derived view
    "content_sha" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), sha2(col("text"), 256).as("content_sha"))
        .orderBy("doc_id"))
  )

  // Shared SQL fragments for the DuckDB oracle (same parquet tables).
  private val supplierEdgesSql =
    """SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey""".stripMargin

  private val nationEdgesSql =
    """SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      |FROM lineitem a
      |JOIN supplier sa ON a.l_suppkey = sa.s_suppkey
      |JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |JOIN supplier sb ON b.l_suppkey = sb.s_suppkey
      |WHERE sa.s_nationkey = sb.s_nationkey AND a.l_suppkey < b.l_suppkey""".stripMargin

  /** Reachability-closure CC over an edge CTE named `e` (canonical src<dst):
    * label(v) = max id reachable from v = component max — the exact
    * canonical semantics of the engine (SURVEY.md §3.5). */
  private def ccOracleSql(edgesSql: String): String =
    s"""WITH RECURSIVE e AS ($edgesSql),
       |bidir AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
       |reach AS (
       |  SELECT src AS id, src AS lbl FROM bidir
       |  UNION
       |  SELECT r.id, b.dst AS lbl FROM reach r JOIN bidir b ON r.lbl = b.src
       |)
       |SELECT id, CAST(max(lbl) AS BIGINT) AS label
       |FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "edges_supplier" ->
      s"""SELECT src, dst FROM ($supplierEdgesSql) ORDER BY src, dst""",
    "degrees" ->
      s"""WITH e AS ($supplierEdgesSql)
         |SELECT id, CAST(count(*) AS BIGINT) AS degree
         |FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
         |GROUP BY id ORDER BY id""".stripMargin,
    "cc_supplier" -> ccOracleSql(supplierEdgesSql),
    "cc_supplier_star" -> ccOracleSql(supplierEdgesSql),
    "cc_supplier_sampled" -> ccOracleSql(supplierEdgesSql),
    "cc_nation" -> ccOracleSql(nationEdgesSql),
    "cc_sizes" ->
      s"""WITH RECURSIVE e AS ($nationEdgesSql),
         |bidir AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
         |reach AS (
         |  SELECT src AS id, src AS lbl FROM bidir
         |  UNION
         |  SELECT r.id, b.dst AS lbl FROM reach r JOIN bidir b ON r.lbl = b.src
         |),
         |labels AS (SELECT id, max(lbl) AS label FROM reach GROUP BY id)
         |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS size
         |FROM labels GROUP BY label ORDER BY label""".stripMargin,
    "triangles" ->
      s"""WITH e AS ($nationEdgesSql)
         |SELECT CAST(count(*) AS BIGINT) AS triangles
         |FROM e e1
         |JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
         |JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst""".stripMargin,
    "triangles_per_vertex" ->
      s"""WITH e AS ($nationEdgesSql),
         |tri AS (
         |  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM e e1
         |  JOIN e e2 ON e2.src = e1.dst
         |  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
         |)
         |SELECT id, CAST(count(*) AS BIGINT) AS triangles
         |FROM (SELECT unnest([a, b, c]) AS id FROM tri)
         |GROUP BY id ORDER BY id""".stripMargin,
    "degree_histogram" ->
      s"""WITH e AS ($nationEdgesSql),
         |d AS (
         |  SELECT id, CAST(count(*) AS BIGINT) AS degree
         |  FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)
         |  GROUP BY id)
         |SELECT degree, CAST(count(*) AS BIGINT) AS n_vertices
         |FROM d GROUP BY degree ORDER BY degree""".stripMargin,
    "content_sha" ->
      """SELECT doc_id, sha256(text) AS content_sha
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
