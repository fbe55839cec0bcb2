package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Explicit skew handling (north rule: salted, hot-vertex-split,
  * two-phase broadcast+shuffle joins). AQE's skew-join covers sort-merge
  * cases at runtime; these utilities cover what AQE cannot: skewed
  * *aggregations* with non-algebraic combiners and join patterns where
  * the planner lacks key-frequency knowledge.
  *
  * No reference counterpart (the reference broadcasts the whole label
  * array to every process, `CSE613-MPI/my_MPI_cc.cpp:176` — the moral
  * ancestor of the broadcast leg here).
  */
object Skew {

  /** Keys of `df` whose row count exceeds `threshold` (the hot set —
    * expected tiny: power-law heads). */
  def hotKeys(df: DataFrame, key: Column, threshold: Long): DataFrame =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > threshold)
      .select(col("k"))

  /** Two-phase join of a skewed fact `big` against dim `small` on
    * big(bigKey) == small(smallKey):
    *   - hot keys (frequency > hotThreshold in `big`): broadcast the
    *     matching slice of `small` — hot rows never shuffle;
    *   - cold remainder: ordinary shuffle join (AQE-managed).
    * Union of the two legs ≡ the plain inner join. */
  def twoPhaseJoin(big: DataFrame, small: DataFrame,
                   bigKey: String, smallKey: String,
                   hotThreshold: Long = 1000000L): DataFrame = {
    val hot = hotKeys(big, col(bigKey), hotThreshold)
      .persist(StorageLevel.MEMORY_AND_DISK)
    hot.count() // materialize once; reused by both legs
    val hotB = broadcast(hot)
    val bigHot = big.join(hotB, big(bigKey) === hotB("k"), "left_semi")
    val bigCold = big.join(hotB, big(bigKey) === hotB("k"), "left_anti")
    val smallHot = broadcast(
      small.join(hotB, small(smallKey) === hotB("k"), "left_semi"))
    val joinedHot = bigHot.join(smallHot, bigHot(bigKey) === smallHot(smallKey))
    val joinedCold = bigCold.join(small, bigCold(bigKey) === small(smallKey))
    joinedHot.union(joinedCold)
  }

  /** Salted two-level aggregation for a skewed groupBy with a
    * reassociable aggregate (max/min/sum/count): groupBy (key, salt) →
    * partial, then groupBy key → final. Spark's map-side partial agg
    * already handles most skew; explicit salting additionally splits a
    * hot key across REDUCERS, for aggregates whose per-key state is
    * large or when partial agg is disabled. */
  def saltedAgg(df: DataFrame, key: Column, value: Column,
                agg: Column => Column, salts: Int = 16): DataFrame = {
    val salted = df.groupBy(key.as("k"), pmod(xxhash64(value), lit(salts)).as("salt"))
      .agg(agg(value).as("partial"))
    salted.groupBy(col("k")).agg(agg(col("partial")).as("agg"))
  }

  /** Hot-vertex split for adjacency processing: rows of hot vertices get
    * a salt column (`xxhash64(dst) % salts`), producing `(src, salt)`
    * sub-vertices whose partial results re-combine on `src`. Returns the
    * input with a `salt` column (0 for cold rows). */
  def splitHotVertices(edges: DataFrame, hotThreshold: Long, salts: Int = 16): DataFrame = {
    val hot = broadcast(hotKeys(edges, col("src"), hotThreshold))
    edges.join(hot, edges("src") === hot("k"), "left")
      .select(edges("src"), edges("dst"),
        when(col("k").isNotNull, pmod(xxhash64(edges("dst")), lit(salts)))
          .otherwise(lit(0L)).as("salt"))
  }
}
