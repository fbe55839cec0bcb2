package graft

import graft.operators.ConnectedComponents
import graft.sources.{EdgeDerivation, ReposFilesGen}
import org.apache.spark.sql.functions._

/** North-rule input shape: repos_files(repo,path,commit,lang,content) →
  * edge table → CC; per-row sha256 content invariant. */
class ReposFilesSpec extends SparkSpec {
  import spark.implicits._

  test("repo co-occurrence CC recovers the planted org clusters") {
    val rf = ReposFilesGen.generate(spark, nOrgs = 6, reposPerOrg = 5, filesPerRepo = 4)
    EdgeDerivation.assertNoIdCollisions(rf)
    val edges = EdgeDerivation.repoEdges(rf)
    val labels = ConnectedComponents.run(edges).labels

    // map hash-ids back to repo names, join with expected org
    val verts = EdgeDerivation.repoVertices(rf)
    val got = labels.as("l").join(verts.as("v"), $"l.id" === $"v.id")
      .select($"v.repo", $"l.label")
    val expected = ReposFilesGen.expectedComponents(spark, 6, 5)
    val joined = got.join(expected, "repo").collect()
      .map(r => (r.getAs[String]("repo"), r.getAs[Long]("label"), r.getAs[Long]("org")))

    joined.length shouldBe 30
    // partition equality: same label ⟺ same org
    val byLabel = joined.groupBy(_._2).values.map(_.map(_._3).toSet)
    byLabel.foreach(_.size shouldBe 1)
    joined.groupBy(_._3).values.map(_.map(_._2).toSet).foreach(_.size shouldBe 1)
    ConnectedComponents.componentCount(
      labels.as[graft.graph.VertexLabel]) shouldBe 6L
  }

  test("per-row sha256(content) invariant survives derived views") {
    val rf = ReposFilesGen.generate(spark, 3, 4, 3).localCheckpoint(true)
    val source = EdgeDerivation.contentSha(rf)
    // a derived view: project + re-join on the row key; invariant must hold
    val view = rf.select($"repo", $"path", $"commit", $"content")
      .withColumn("content_sha", sha2($"content", 256))
    val mismatches = source.as("s")
      .join(view.as("v"), Seq("repo", "path", "commit"))
      .filter($"s.content_sha" =!= $"v.content_sha")
      .count()
    mismatches shouldBe 0L
    // shas are real: 64 hex chars, deterministic across regeneration
    val rf2 = ReposFilesGen.generate(spark, 3, 4, 3)
    val sha1 = source.orderBy("repo", "path", "commit").select("content_sha")
      .collect().map(_.getString(0))
    val sha2x = EdgeDerivation.contentSha(rf2).orderBy("repo", "path", "commit")
      .select("content_sha").collect().map(_.getString(0))
    sha1 should contain theSameElementsInOrderAs sha2x
    all(sha1.map(_.length)) shouldBe 64
  }

  test("generator is deterministic across parallelism (repartition)") {
    val a = ReposFilesGen.generate(spark, 2, 3, 4).orderBy("repo", "path", "commit").collect()
    val b = ReposFilesGen.generate(spark, 2, 3, 4).repartition(7)
      .orderBy("repo", "path", "commit").collect()
    a should contain theSameElementsInOrderAs b
  }

  test("hot-key cap keeps per-path groups bounded") {
    // one path shared by all 20 repos; cap at 5 → the shared-path clique
    // is capped but the graph derivation still runs
    val rf = ReposFilesGen.generate(spark, 1, 20, 2)
    val edges = EdgeDerivation.repoEdges(rf, maxGroupSize = 5)
    // with cap 5, the shared path contributes C(5,2)=10 edges at most
    edges.count() should be <= 10L + 200L
  }
}
