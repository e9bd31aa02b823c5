package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the TESTDATA.md fixture tables, with (where the
  * semantics are SQL-expressible) an equivalent DuckDB oracle the driver
  * hash-compares against.
  */
object SparkEntry {

  /** All registered query families. */
  private def registry: Seq[Q] =
    graft.queries.Relational.defs ++
      graft.queries.Protocol.defs ++
      graft.queries.Marine.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.StateQueries.defs ++
      graft.queries.DedupQueries.defs ++
      graft.queries.TextQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
