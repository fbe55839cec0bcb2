package graft

import graft.graph.{Edge, UnionFind}
import graft.operators.ConnectedComponents
import graft.operators.ConnectedComponents.{CCStrategy, Config}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based CC (SURVEY.md §5.2.4): arbitrary dirty edge lists
  * (self-loops, duplicates, isolated ids, unnormalized order) ⇒ Spark
  * partition == oracle partition; invariance under permutation/reversal.
  * Drives scalacheck Gens directly with fixed seeds (the scalatest
  * bridge artifact is not on the offline classpath). */
class CCPropertySpec extends SparkSpec {
  import spark.implicits._

  private val edgeListGen: Gen[List[(Long, Long)]] =
    for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 70)
      edges <- Gen.listOfN(m, for {
        u <- Gen.choose(0L, n.toLong)
        v <- Gen.choose(0L, n.toLong)
      } yield (u, v))
    } yield edges

  private def samples(count: Int): Seq[List[(Long, Long)]] =
    (0 until count).map { i =>
      edgeListGen(Gen.Parameters.default, Seed(1000L + i)).get
    }

  private def run(edges: Seq[(Long, Long)], strategy: CCStrategy): Map[Long, Long] =
    ConnectedComponents.run(
      spark.createDataset(edges.map(e => Edge(e._1, e._2))), None,
      Config(strategy = strategy))
      .labels.collect().map(l => l.id -> l.label).toMap

  test("arbitrary dirty edge lists match the union-find oracle (hook strategy)") {
    for (edges <- samples(8)) {
      val oracle = UnionFind.components(edges).toMap
      withClue(s"edges=$edges") {
        run(edges, CCStrategy.HookAndContract) shouldBe oracle
      }
    }
  }

  test("edge order and orientation do not change the result") {
    for (edges <- samples(4)) {
      val reversed = edges.reverse.map(_.swap)
      run(edges, CCStrategy.HookAndContract) shouldBe
        run(reversed, CCStrategy.HookAndContract)
    }
  }

  test("strategies agree on arbitrary inputs") {
    for (edges <- samples(4)) {
      val a = run(edges, CCStrategy.HookAndContract)
      withClue(s"edges=$edges") {
        run(edges, CCStrategy.AlternatingStar) shouldBe a
        run(edges, CCStrategy.SampledContraction) shouldBe a
        run(edges, CCStrategy.RandomizedHook) shouldBe a
      }
    }
  }
}
