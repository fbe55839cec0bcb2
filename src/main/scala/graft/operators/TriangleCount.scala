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
  * zero wedges instead of deg² of them). The closing-edge probe is a
  * left-semi join (no payload materialized).
  */
object TriangleCount {

  /** Total triangle count (one row, column `triangles`). */
  def count(edges: Dataset[Edge]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = GraphIO.canonical(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = GraphMetrics.degrees(canon)

    // Orient each edge toward the higher (degree, id) endpoint.
    val withDeg = canon.as("e")
      .join(deg.as("ds"), $"e.src" === $"ds.id")
      .join(deg.as("dd"), $"e.dst" === $"dd.id")
      .select($"e.src".as("src"), $"e.dst".as("dst"),
        $"ds.degree".as("sdeg"), $"dd.degree".as("ddeg"))
    val oriented = withDeg.select(
        when($"sdeg" < $"ddeg" || ($"sdeg" === $"ddeg" && $"src" < $"dst"), $"src")
          .otherwise($"dst").as("lo"),
        when($"sdeg" < $"ddeg" || ($"sdeg" === $"ddeg" && $"src" < $"dst"), $"dst")
          .otherwise($"src").as("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Wedges from the low-rank apex; close against the canonical edge set
    // (id-ordered) via semi-join.
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        $"e1.lo" === $"e2.lo" && $"e1.hi" < $"e2.hi")
      .select($"e1.hi".as("u"), $"e2.hi".as("v"))
    val closing = wedges.select(
      least($"u", $"v").as("src"), greatest($"u", $"v").as("dst"))
    val n = closing.join(canon, Seq("src", "dst"), "left_semi").count()
    oriented.unpersist(); canon.unpersist()
    spark.createDataset(Seq(n)).toDF("triangles")
  }

  /** Per-vertex triangle participation counts. Vertices in no triangle are
    * absent (join with degrees for a dense view). */
  def perVertex(edges: Dataset[Edge]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = GraphIO.canonical(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val tri = canon.as("e1")
      .join(canon.as("e2"), $"e1.dst" === $"e2.src" && $"e1.src" < $"e2.dst")
      .select($"e1.src".as("a"), $"e1.dst".as("b"), $"e2.dst".as("c"))
      .join(canon.as("e3"),
        $"a" === $"e3.src" && $"c" === $"e3.dst", "left_semi")
    val out = tri.select(explode(array($"a", $"b", $"c")).as("id"))
      .groupBy($"id")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
    canon.unpersist()
    out
  }
}
