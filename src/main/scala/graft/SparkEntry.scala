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

  /** Flagship: run the distributed structure analyzer over every
    * sf0.001 table and emit one row per column with its inferred type
    * (the engine's core capability — structa's analyze+render lifecycle
    * as Spark aggregations; see graft.analyzer.SparkAnalyzer).
    */
  def entry(spark: SparkSession): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val analyzer = new graft.analyzer.SparkAnalyzer(
      graft.analyzer.AnalyzerConfig(extendedEpochUnits = true))
    val rows = tables.flatMap { t =>
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        analyzer.analyzeTable(df) match {
          case l: graft.core.SList => l.content match {
            case d: graft.core.SDict => d.content.map(f =>
              (t, f.key.asInstanceOf[graft.core.SField].value.toString,
                f.value.render))
            case other => Seq((t, "", other.render))
          }
          case other => Seq((t, "", other.render))
        }
      } catch {
        case e: Exception => Seq((t, "<error>", e.getMessage))
      }
    }
    import spark.implicits._
    rows.toDF("table_name", "column_name", "inferred")
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * beyond-reference pipeline operators (§7.5). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++ graft.queries.PipelineQueries.oracleSql
}
