package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 declared query set Q1–Q20 — the machine-checkable form of
  * the reference operator inventory (waveform80/structa; see citations per
  * query). Each query is expressed Spark-first (DataFrame API, codegen'd
  * built-ins, no UDFs) with a matching DuckDB oracle in [[oracleSql]].
  *
  * Determinism rules (SURVEY §2.2): total ORDER BY with explicit NULLS
  * FIRST; double aggregation through DECIMAL(18,2) then cast to DOUBLE;
  * integer lengths/sizes cast to BIGINT to match DuckDB's LENGTH/COUNT
  * result types; no approximate functions.
  */
object ReferenceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — S5/S6 scan + E1 count (reference analyzer.py:238-279 measure)
    "q01_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n_rows"))),

    // Q2 — E2 projection + E4 filter (reference analyzer.py:472-554)
    "q02_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey").asc_nulls_first,
                 col("l_linenumber").asc_nulls_first)),

    // Q3 — M2 scalar-classifier witness counts (analyzer.py:598-640)
    "q03_witness_counts" -> ((s, d) =>
      t(s, d, "orders").agg(
        count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_totalprice"),
        countDistinct(col("o_orderstatus")).as("n_status"))),

    // Q4 — A2 uniqueness: most-common count == 1 (types.py:93-95)
    "q04_uniqueness" -> ((s, d) =>
      t(s, d, "orders").agg(
        (count(lit(1)) === countDistinct(col("o_orderkey")))
          .as("is_unique"))),

    // Q5 — M3 field split + optionality (analyzer.py:603-613)
    "q05_field_split" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("event_type").asc_nulls_first)),

    // Q6 — A1 most_common top-K (collections.py:63-70)
    "q06_top_k" -> ((s, d) =>
      t(s, d, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("p_brand").asc_nulls_first)
        .limit(3)),

    // Q7 — A2 positional quartiles: min=x[0], q1=x[n/4], q2=x[n/2],
    // q3=x[3n/4], max=x[n-1], 0-based int div (types.py:182-207).
    // Guarded two-mode plan: columns under the distinct cap use the
    // reference's own counter walk (one small shuffle on the distinct
    // values); over the cap — the unbounded case an arbitrary column
    // hits at scale — the exact distributed rank lookup of
    // [[graft.operators.OrderStats]] runs instead, with NO driver
    // histogram, NO global sort, and NO float interpolation (results
    // stay bit-identical to the oracle). Force the scale path with
    // SPARK_GRAFT_DISTINCT_CAP.
    "q07_quartiles" -> ((s, d) => {
      import s.implicits._
      val df = t(s, d, "lineitem")
      val cap = graft.analyzer.SparkAnalyzer.defaultDistinctCap
      // bounded collect doubles as the cap check: TakeOrdered of at
      // most cap+1 distinct values — one job when under the cap, and
      // the scale path engages without ever collecting a full
      // histogram when over it
      val capped = df
        .groupBy(col("l_quantity").as("v"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("v"))
        .limit(math.min(cap, Int.MaxValue - 1L).toInt + 1)
        .collect()
      if (capped.length > cap)
        graft.operators.OrderStats
          .positionalQuartiles(df, "l_quantity").toDF("v")
      else {
        val counts = capped
        val n = counts.map(_.getAs[Long]("c")).sum
        val targets = Seq(0L, n / 4, n / 2, 3 * n / 4, n - 1)
        val values = Array.fill[Double](targets.length)(0d)
        var cum = 0L
        var ti = 0
        counts.foreach { r =>
          val hi = cum + r.getAs[Long]("c")
          // targets are ascending; each lands in the first bucket
          // whose cumulative upper bound exceeds it
          while (ti < targets.length && targets(ti) < hi) {
            values(ti) = r.getAs[Double]("v")
            ti += 1
          }
          cum = hi
        }
        values.toSeq.toDF("v")
      }
    }),

    // Q8 — A3 length stats (types.py:209-224)
    "q08_length_stats" -> ((s, d) =>
      t(s, d, "customer").agg(
        min(length(col("c_name")).cast("long")).as("min_len"),
        max(length(col("c_name")).cast("long")).as("max_len"),
        countDistinct(length(col("c_name")).cast("long"))
          .as("n_distinct_len"))),

    // Q9 — M12 null/blank discounting (analyzer.py:618-621, 650-654)
    "q09_null_blank" -> ((s, d) =>
      t(s, d, "events").agg(
        (count(lit(1)) - count(col("value"))).as("n_null_value"),
        count(when(col("event_type") === "", 1)).as("n_blank_type"))),

    // Q10 — M4 int-string witness (analyzer.py:722-740)
    "q10_int_witness" -> ((s, d) =>
      t(s, d, "orders").agg(
        count(when(expr(
          "try_cast(substr(o_orderpriority, 1, 1) AS INT)").isNotNull, 1))
          .as("n_int"),
        count(lit(1)).as("n_rows"))),

    // Q11 — M4 float-string witness (types.py:738-749)
    "q11_float_witness" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(when(expr(
          "try_cast(cast(l_extendedprice AS STRING) AS DOUBLE)").isNotNull,
          1)).as("n_float"))),

    // Q12 — M4 bool-pattern witness (conversions.py:57-69)
    "q12_bool_witness" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(when(lower(col("l_returnflag")).isin("n", "r", "a"), 1))
          .as("n_bool"),
        count(lit(1)).as("n_rows"))),

    // Q13 — M3 field threshold (default 20; ui/cli.py:96-100)
    "q13_field_threshold" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        (countDistinct(col("l_returnflag")) < 20).as("b_returnflag_under"),
        (countDistinct(col("l_orderkey")) < 20).as("b_orderkey_under"))),

    // Q14 — M5 fixed-length precondition (analyzer.py:671-720)
    "q14_fixed_length" -> ((s, d) =>
      t(s, d, "nation").agg(
        (min(length(col("n_name"))) === max(length(col("n_name"))))
          .as("is_fixed_len"))),

    // Q15 — M5 per-position char class, position 1 (chars.py:32-152)
    "q15_position_class" -> ((s, d) =>
      t(s, d, "orders")
        .select(substring(col("o_orderpriority"), 1, 1).as("c"))
        .groupBy(col("c"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("c").asc_nulls_first)),

    // Q16 — M10 epoch-range heuristic inputs (analyzer.py:742-770)
    "q16_epoch_range" -> ((s, d) =>
      t(s, d, "orders").agg(
        min(col("o_orderdate").cast("date")).as("min_date"),
        max(col("o_orderdate").cast("date")).as("max_date"))),

    // Q17 — M11 URL prefix detector (types.py:1257-1283)
    "q17_url_prefix" -> ((s, d) =>
      t(s, d, "documents").agg(
        count(when(col("source").startsWith("http"), 1)).as("n_url"),
        count(lit(1)).as("n_rows"))),

    // Q18 — G1 merge predicate: per-group structure stats
    // (analyzer.py:290-398)
    "q18_group_structure" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy(col("event_type").asc_nulls_first)),

    // Q19 — S9 union of sources (types.py:674-679)
    "q19_union_sources" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .unionAll(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .agg(count(lit(1)).as("n_rows"))),

    // Q20 — E2 nested/array extraction (analyzer.py:524-554)
    "q20_array_stats" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("label"),
                size(col("embedding")).cast("long").as("len"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_rows"),
             min(col("len")).as("min_len"),
             max(col("len")).as("max_len"))
        .orderBy(col("label").asc_nulls_first))
  )

  val oracleSql: Map[String, String] = Map(
    "q01_count" ->
      "SELECT COUNT(*) AS n_rows FROM lineitem",
    "q02_filter_project" ->
      ("SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_quantity > 45 " +
       "ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST"),
    "q03_witness_counts" ->
      ("SELECT COUNT(*) AS n_rows, COUNT(o_totalprice) AS n_totalprice, " +
       "COUNT(DISTINCT o_orderstatus) AS n_status FROM orders"),
    "q04_uniqueness" ->
      ("SELECT COUNT(*) = COUNT(DISTINCT o_orderkey) AS is_unique " +
       "FROM orders"),
    "q05_field_split" ->
      ("SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type " +
       "ORDER BY event_type NULLS FIRST"),
    "q06_top_k" ->
      ("SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand " +
       "ORDER BY cnt DESC, p_brand NULLS FIRST LIMIT 3"),
    "q07_quartiles" ->
      ("SELECT v FROM (SELECT l_quantity AS v, " +
       "ROW_NUMBER() OVER (ORDER BY l_quantity) AS rn, " +
       "COUNT(*) OVER () AS n FROM lineitem) " +
       "WHERE rn IN (1, n//4 + 1, n//2 + 1, 3*n//4 + 1, n) ORDER BY rn"),
    "q08_length_stats" ->
      ("SELECT MIN(LENGTH(c_name)) AS min_len, MAX(LENGTH(c_name)) AS " +
       "max_len, COUNT(DISTINCT LENGTH(c_name)) AS n_distinct_len " +
       "FROM customer"),
    "q09_null_blank" ->
      ("SELECT COUNT(*) - COUNT(value) AS n_null_value, " +
       "COUNT(CASE WHEN event_type = '' THEN 1 END) AS n_blank_type " +
       "FROM events"),
    "q10_int_witness" ->
      ("SELECT COUNT(CASE WHEN TRY_CAST(SUBSTR(o_orderpriority, 1, 1) AS " +
       "INTEGER) IS NOT NULL THEN 1 END) AS n_int, COUNT(*) AS n_rows " +
       "FROM orders"),
    "q11_float_witness" ->
      ("SELECT COUNT(CASE WHEN TRY_CAST(CAST(l_extendedprice AS VARCHAR) " +
       "AS DOUBLE) IS NOT NULL THEN 1 END) AS n_float FROM lineitem"),
    "q12_bool_witness" ->
      ("SELECT COUNT(CASE WHEN lower(l_returnflag) IN ('n','r','a') " +
       "THEN 1 END) AS n_bool, COUNT(*) AS n_rows FROM lineitem"),
    "q13_field_threshold" ->
      ("SELECT COUNT(DISTINCT l_returnflag) < 20 AS b_returnflag_under, " +
       "COUNT(DISTINCT l_orderkey) < 20 AS b_orderkey_under FROM lineitem"),
    "q14_fixed_length" ->
      ("SELECT MIN(LENGTH(n_name)) = MAX(LENGTH(n_name)) AS is_fixed_len " +
       "FROM nation"),
    "q15_position_class" ->
      ("SELECT SUBSTR(o_orderpriority, 1, 1) AS c, COUNT(*) AS cnt " +
       "FROM orders GROUP BY c ORDER BY c NULLS FIRST"),
    "q16_epoch_range" ->
      ("SELECT MIN(CAST(o_orderdate AS DATE)) AS min_date, " +
       "MAX(CAST(o_orderdate AS DATE)) AS max_date FROM orders"),
    "q17_url_prefix" ->
      ("SELECT COUNT(CASE WHEN source LIKE 'http%' THEN 1 END) AS n_url, " +
       "COUNT(*) AS n_rows FROM documents"),
    "q18_group_structure" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
       "FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"),
    "q19_union_sources" ->
      ("SELECT COUNT(*) AS n_rows FROM (SELECT c_nationkey AS k FROM " +
       "customer UNION ALL SELECT s_nationkey AS k FROM supplier)"),
    "q20_array_stats" ->
      ("SELECT label, COUNT(*) AS n_rows, MIN(len) AS min_len, " +
       "MAX(len) AS max_len FROM (SELECT label, " +
       "array_length(embedding) AS len FROM embeddings) " +
       "GROUP BY label ORDER BY label NULLS FIRST")
  )
}
