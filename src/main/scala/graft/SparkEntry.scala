package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.ReferenceQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 inventory) to DataFrame
  * builders over a scale-factor directory of parquet tables; `oracleSql`
  * holds the equivalent DuckDB SQL for the driver's correctness compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's core loop: classify + summarize a column
    * (structa analyzer.py:598-640 scalar ladder as one wide aggregation).
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("card"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        countDistinct(col("l_quantity")).as("n_distinct"))
      .orderBy(col("l_returnflag").asc_nulls_first)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql
}
