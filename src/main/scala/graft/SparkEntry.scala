package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, EventQueries, LlmQueries, PigQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator (SURVEY.md §2 coverage);
  * each SQL-expressible entry has a DuckDB oracle in [[oracleSql]]
  * (differential correctness, same philosophy as the reference's e2e
  * harness diffing [R: test/e2e/pig/]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * PigMix-L3 analog: scan → join → join → group → aggregate (the spork
    * core loop, SURVEY.md §7.1).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q03_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ EventQueries.queries ++ LlmQueries.queries ++ PigQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables — every entry in [[queries]] has one.
    * q26_sample, q32_simhash and q42_ann_ivf emit their results'
    * deterministic PROPERTIES (count bounds + subset proof;
    * fingerprint invariances + kernel≡Column equality; k-per-query +
    * rank order + exact-cosine recompute) so even SAMPLE, seeded-hash
    * fingerprints and approximate ANN get hash-checked oracles.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ EventQueries.oracleSql ++ LlmQueries.oracleSql ++ PigQueries.oracleSql
}
