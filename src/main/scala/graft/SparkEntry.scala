package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + the
  * LLM-data-pipeline extensions); `oracleSql` carries a DuckDB-runnable
  * twin for every SQL-expressible query. Queries without an oracle
  * (hash-seeded LSH/MinHash/SimHash variants) get the driver's weaker
  * rows-only check and are instead verified in ScalaTest against their
  * exact oracle-checked counterparts.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesCore.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesText.queries ++ QueriesSim.queries ++
      QueriesStats.queries ++ QueriesEval.queries ++ QueriesData.queries ++
      QueriesCycle.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    OraclesCore.oracles ++ QueriesText.oracles ++ QueriesSim.oracles ++
      OraclesStats.oracles ++ OraclesEval.oracles ++ OraclesData.oracles ++
      OraclesCycle.oracles
}
