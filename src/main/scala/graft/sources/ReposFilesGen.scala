package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic `repos_files(repo, path, commit, lang,
  * content)` table — the exact north-rule input shape (BASELINE.json
  * input_hint) at test/bench scale. Fully distributed (spark.range) and
  * hash-seeded: bit-identical at any parallelism.
  *
  * Planted structure (FIXTURES.md §2): repos within an org all touch a
  * shared per-org path, so the repo co-occurrence graph's connected
  * components are exactly the orgs; commits are unique per repo and never
  * bridge. This makes expected CC output computable without the engine.
  */
object ReposFilesGen {

  def generate(spark: SparkSession, nOrgs: Int, reposPerOrg: Int,
               filesPerRepo: Int, seed: Long = 42L): DataFrame = {
    val total = nOrgs.toLong * reposPerOrg * filesPerRepo
    val langs = array(lit("scala"), lit("java"), lit("py"), lit("rs"), lit("go"))
    spark.range(0, total)
      .withColumn("org", (col("id") / (reposPerOrg.toLong * filesPerRepo)).cast("long"))
      .withColumn("repoIdx",
        ((col("id") / filesPerRepo) % reposPerOrg).cast("long"))
      .withColumn("fileIdx", (col("id") % filesPerRepo).cast("long"))
      .select(
        concat(lit("org"), col("org"), lit("/repo"), col("repoIdx")).as("repo"),
        // file 0 of every repo is the org-shared path (plants the component);
        // the rest are repo-unique paths.
        when(col("fileIdx") === 0,
          concat(lit("shared/org"), col("org"), lit(".md")))
          .otherwise(concat(lit("src/pkg"), pmod(col("fileIdx"), lit(7)),
            lit("/File"), col("fileIdx"), lit("_"), col("org"),
            lit("_"), col("repoIdx"), lit(".scala"))).as("path"),
        // commits unique per repo (never bridge repos)
        lower(hex(xxhash64(lit(seed), lit("commit"), col("org"), col("repoIdx"),
          pmod(col("fileIdx"), lit(3))))).as("commit"),
        element_at(langs, (pmod(xxhash64(lit(seed), col("id")), lit(5)) + 1).cast("int"))
          .as("lang"),
        concat(lit("// deterministic content "),
          lower(hex(xxhash64(lit(seed), lit("content"), col("id")))),
          lit("\nobject X { def f = "), pmod(col("id"), lit(997)), lit(" }"))
          .as("content"))
  }

  /** Expected component for each repo = its org: every repo in an org
    * shares `shared/org<o>.md`. Returns (repo, org) for oracle checks. */
  def expectedComponents(spark: SparkSession, nOrgs: Int, reposPerOrg: Int): DataFrame = {
    spark.range(0, nOrgs.toLong * reposPerOrg)
      .select(
        concat(lit("org"), (col("id") / reposPerOrg).cast("long"),
          lit("/repo"), (col("id") % reposPerOrg).cast("long")).as("repo"),
        (col("id") / reposPerOrg).cast("long").as("org"))
  }
}
