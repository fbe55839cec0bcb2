package graft.operators

import graft.graph.{Edge, GraphIO}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting over an undirected edge set (north-rule operator; no
  * reference implementation — spec is the classic E⋈E⋉E wedge-close count).
  *
  * Scale design: edges are oriented from lower to higher **(degree, id)**
  * rank before the wedge join — the standard degree-ordering trick that
  * bounds wedge count by O(m^1.5) instead of Σdeg² (a star hub generates
  * zero wedges instead of deg² of them). Both the total count and the
  * per-vertex counts build wedges on the SAME oriented table; each
  * triangle {a,b,c} with rank(a)<rank(b)<rank(c) is generated exactly
  * once, at apex a. The closing-edge probe is a left-semi join (no
  * payload materialized).
  */
object TriangleCount {

  /** Degree-oriented edge table: one row (lo, hi) per canonical edge with
    * rank(lo) < rank(hi), rank = (degree, id). */
  private[graft] def orient(canon: Dataset[Edge]): DataFrame = {
    val spark = canon.sparkSession
    import spark.implicits._
    val deg = GraphMetrics.degrees(canon)
    val withDeg = canon.as("e")
      .join(deg.as("ds"), $"e.src" === $"ds.id")
      .join(deg.as("dd"), $"e.dst" === $"dd.id")
      .select($"e.src".as("src"), $"e.dst".as("dst"),
        $"ds.degree".as("sdeg"), $"dd.degree".as("ddeg"))
    withDeg.select(
      when($"sdeg" < $"ddeg" || ($"sdeg" === $"ddeg" && $"src" < $"dst"), $"src")
        .otherwise($"dst").as("lo"),
      when($"sdeg" < $"ddeg" || ($"sdeg" === $"ddeg" && $"src" < $"dst"), $"dst")
        .otherwise($"src").as("hi"))
  }

  /** Wedges (a; u, v) from the low-rank apex of the oriented table —
    * |wedges| is O(m^1.5) regardless of hubs. */
  private[graft] def wedges(oriented: DataFrame): DataFrame = {
    val spark = oriented.sparkSession
    import spark.implicits._
    oriented.as("e1").join(oriented.as("e2"),
        $"e1.lo" === $"e2.lo" && $"e1.hi" < $"e2.hi")
      .select($"e1.lo".as("a"), $"e1.hi".as("u"), $"e2.hi".as("v"))
  }

  /** Total triangle count (one row, column `triangles`). */
  def count(edges: Dataset[Edge]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = GraphIO.canonical(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = orient(canon).persist(StorageLevel.MEMORY_AND_DISK)
    val closing = wedges(oriented).select(
      least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
    val n = closing.join(canon, Seq("src", "dst"), "left_semi").count()
    oriented.unpersist(); canon.unpersist()
    spark.createDataset(Seq(n)).toDF("triangles")
  }

  /** Per-vertex triangle participation counts. Vertices in no triangle are
    * absent (join with degrees for a dense view). Same oriented-wedge
    * bound as [[count]]: the triple (apex, u, v) is kept through the
    * closing semi-join, then each member is credited once. */
  def perVertex(edges: Dataset[Edge]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = GraphIO.canonical(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = orient(canon).persist(StorageLevel.MEMORY_AND_DISK)
    val tri = wedges(oriented)
      .select($"a", $"u", $"v",
        least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
      .join(canon, Seq("src", "dst"), "left_semi")
    // materialize while the persisted inputs are still cached (oriented
    // is scanned twice by the wedge self-join, canon twice) — a lazy
    // return would execute after the unpersists and recompute both
    val out = org.apache.spark.sql.GraftLineage.barrier(
      tri.select(explode(array($"a", $"u", $"v")).as("id"))
        .groupBy($"id")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles")))
    oriented.unpersist(); canon.unpersist()
    out
  }

  /** Per-vertex local clustering coefficient:
    * 2·tri(v) / (deg(v)·(deg(v)−1)), 0 for deg < 2; rounded to 6 dp.
    * One row per vertex (dense — vertices in no triangle get 0). */
  def clusteringCoefficient(edges: Dataset[Edge]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val deg = GraphMetrics.degrees(edges)
    val tri = perVertex(edges)
    val out = org.apache.spark.sql.GraftLineage.barrier(
      deg.join(tri, Seq("id"), "left")
        .select($"id",
          when($"degree" < 2, lit(0.0)).otherwise(
            round(coalesce($"triangles", lit(0L)) * 2.0 /
              ($"degree" * ($"degree" - 1)), 6)).as("clustering")))
    org.apache.spark.sql.GraftLineage.release(tri) // perVertex returns an eager barrier
    out
  }

  /** Common-neighbor count per canonical edge (u, v): |N(u) ∩ N(v)| =
    * the number of triangles through the edge — the basic link-prediction
    * feature. Edges in no triangle are reported with 0. Same O(m^1.5)
    * oriented wedge enumeration as [[count]]: each confirmed triangle
    * (a; u, v) credits its three edges once, in canonical (min, max)
    * orientation. */
  def commonNeighborsPerEdge(edges: Dataset[Edge]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = GraphIO.canonical(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = orient(canon).persist(StorageLevel.MEMORY_AND_DISK)
    val tri = wedges(oriented)
      .select($"a", $"u", $"v",
        least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
      .join(canon, Seq("src", "dst"), "left_semi")
    val perEdge = tri.select(explode(array(
        struct(least($"a", $"u").as("src"), greatest($"a", $"u").as("dst")),
        struct(least($"a", $"v").as("src"), greatest($"a", $"v").as("dst")),
        struct($"src", $"dst"))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
      .groupBy($"src", $"dst")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("common_neighbors"))
    val out = org.apache.spark.sql.GraftLineage.barrier(
      canon.toDF().join(perEdge, Seq("src", "dst"), "left")
        .select($"src", $"dst",
          coalesce($"common_neighbors", lit(0L)).as("common_neighbors")))
    oriented.unpersist(); canon.unpersist()
    out
  }
}
