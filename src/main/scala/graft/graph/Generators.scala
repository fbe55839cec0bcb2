package graft.graph

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully distributed synthetic graph generators
  * (FIXTURES.md §3; north-star shapes random / chain / star / dense).
  *
  * All randomness is hash-derived (`xxhash64(seed, i, salt)`), never
  * `rand()`: results are bit-identical across runs, partitionings and
  * parallelism levels — required for the two-parallelism scaling benchmark
  * to run the *same* input at local[8] and local[32].
  *
  * Built on `spark.range` so generation itself is distributed — no
  * driver-side materialization at any size.
  */
object Generators {

  /** Path 0-1-2-…-(n-1): stresses diameter → pointer-jump depth. */
  def chain(spark: SparkSession, n: Long): Dataset[Edge] = {
    import spark.implicits._
    spark.range(0, n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst")).as[Edge]
  }

  /** Star with hub 0: stresses hot-vertex skew. */
  def star(spark: SparkSession, n: Long): Dataset[Edge] = {
    import spark.implicits._
    spark.range(1, n)
      .select(lit(0L).as("src"), col("id").as("dst")).as[Edge]
  }

  /** G(n, m)-style multigraph: m uniform pairs; self-loops and duplicates
    * allowed — exactly what the reference loaders tolerate. */
  def random(spark: SparkSession, n: Long, m: Long, seed: Long): Dataset[Edge] = {
    import spark.implicits._
    spark.range(0, m)
      .select(
        pmod(xxhash64(lit(seed), col("id"), lit("src")), lit(n)).as("src"),
        pmod(xxhash64(lit(seed), col("id"), lit("dst")), lit(n)).as("dst"))
      .as[Edge]
  }

  /** Dense-ish G(n, p) via expected-degree sampling: for each of the
    * n*(n-1)/2 candidate slots we cannot enumerate at scale, so sample
    * m = p * n * (n-1) / 2 uniform pairs (whp connected for p >> ln n / n,
    * matching the stripped `input/dense_graph.txt` role). */
  def dense(spark: SparkSession, n: Long, p: Double, seed: Long): Dataset[Edge] = {
    val m = math.max(1L, (p * n.toDouble * (n - 1).toDouble / 2.0).toLong)
    random(spark, n, m, seed)
  }

  /** k disjoint copies of a generated shape, each of size n, vertex ids
    * offset by copy index * n: known component count = k (assuming each
    * copy is connected). */
  def forest(spark: SparkSession, k: Int, n: Long,
             shape: (SparkSession, Long) => Dataset[Edge]): Dataset[Edge] = {
    import spark.implicits._
    (0 until k).map { i =>
      shape(spark, n).select(
        (col("src") + lit(i.toLong * n)).as("src"),
        (col("dst") + lit(i.toLong * n)).as("dst")).as[Edge]
    }.reduce(_ union _)
  }

  /** Benchmark composite (FIXTURES.md §3): a multi-component mix of the
    * four north-star shapes with disjoint id ranges — chain (diameter),
    * star (skew), random (genericity), dense (volume). Component count is
    * 3 + (components of the random part). */
  def benchSuite(spark: SparkSession, scale: Long, seed: Long): Dataset[Edge] = {
    import spark.implicits._
    val n = scale
    val off1 = n          // star offset
    val off2 = 2 * n      // random offset
    val off3 = 3 * n      // dense offset
    val shifted = Seq(
      chain(spark, n),
      star(spark, n).select((col("src") + off1).as("src"), (col("dst") + off1).as("dst")).as[Edge],
      random(spark, n, 2 * n, seed).select((col("src") + off2).as("src"), (col("dst") + off2).as("dst")).as[Edge],
      random(spark, n / 4, 4 * n, seed + 1).select((col("src") + off3).as("src"), (col("dst") + off3).as("dst")).as[Edge])
    shifted.reduce(_ union _)
  }
}
