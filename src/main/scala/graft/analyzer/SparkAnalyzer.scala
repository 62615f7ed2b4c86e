package graft.analyzer

import java.time.Instant

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._

/** The distributed structure analyzer.
  *
  * Re-expresses the reference's whole-dataset recursion (structa
  * analyzer.py:400-770) as Spark aggregations with the execution shape
  * chosen for 100 TB (SURVEY.md §4.2):
  *
  *  - **One wide aggregation per nesting level** — every leaf column's
  *    count/nulls/min/max/approx-distinct plus ~26 string-ladder witness
  *    counts are conditional aggregates in a single codegen'd pass, not
  *    the reference's O(data × depth) per-path re-walks.
  *  - **Batched exact counters** — columns whose approx distinct count
  *    is under `exactDistinctCap` get their full value→frequency
  *    counters via ONE explode + groupBy job per JVM type group (longs /
  *    doubles / strings), instead of a shuffle per column. The counters
  *    feed the exact reference ladder ([[TreeAnalyzer]] internals), so
  *    low-cardinality columns are bit-for-bit reference-faithful.
  *  - **Summary path over the cap** — high-cardinality columns keep
  *    exact count/min/max plus positional quartiles computed by exact
  *    `percentile` at rank-aligned fractions (p = k/(n-1) hits x[k]
  *    exactly); uniqueness degrades to an approx-distinct comparison.
  *  - **Nested data = projections, not re-scans** — struct fields are
  *    analyzed in the parent's wide agg via dotted columns; arrays and
  *    maps cost one `explode` projection per level (filter/column
  *    pruning pushed to the parquet scan by Catalyst).
  *
  * Driver memory holds only config + counters under the cap + the
  * result ADT.
  */
final class SparkAnalyzer(val config: AnalyzerConfig = AnalyzerConfig(),
                          val exactDistinctCap: Long =
                            SparkAnalyzer.defaultDistinctCap,
                          /** Recurse into JSON-encoded string columns
                            * (beyond-reference; see assembleScalar). */
                          val parseJsonStrings: Boolean = true,
                          /** Over-cap columns keep a bounded top-K
                            * frequency sketch as their display sample
                            * (SURVEY §8); 0 disables the extra
                            * TakeOrdered job per summary column.
                            */
                          val sampleTopK: Int =
                            SparkAnalyzer.defaultSampleTopK) {

  private val tree = new TreeAnalyzer(config)

  /** Analyze a relation the way the reference analyzes a list of
    * records: returns `SList(SDict(record fields...))`.
    */
  def analyzeTable(df: DataFrame): SType = {
    val dict = analyzeLevel(df)
    SList(Stats.fromCounter(ValueCounter(Map((1L: Any) -> 1L))), dict)
  }

  /** Analyze one nesting level (a relation of records). */
  private def analyzeLevel(df: DataFrame,
                           jsonDepth: Int = 0): SType = {
    val schema = df.schema
    if (schema.isEmpty) return SDict(
      Stats.fromCounter(ValueCounter(Map((0L: Any) -> 1L))), Vector.empty)

    // -------- pass 1: one wide aggregation over every leaf column
    val leaves = collectLeaves(schema)
    val aggExprs = leaves.flatMap(l => wideAggExprs(l)) :+
      count(lit(1)).as("__total")
    val row = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val total = row.getAs[Long]("__total")

    // -------- pass 2: batched exact counters for under-cap columns
    val counterCols = leaves.filter { l =>
      row.getAs[Long](s"${l.id}__adist") <= exactDistinctCap &&
        isCounterable(l.dataType)
    }
    val counters = collectCounters(df, counterCols)

    // -------- assemble the record dict
    val fields = schema.fields.toVector.sortBy(_.name).map { f =>
      val t = analyzeField(df, Vector(f.name), f.dataType, row, counters,
        total, jsonDepth)
      SDictField(SField(f.name, total, optional = false), t)
    }
    SDict(Stats.fromCounter(ValueCounter(Map(
      (schema.fields.length.toLong: Any) -> total))), fields)
  }

  // ------------------------------------------------------------ schema

  private final case class Leaf(path: Vector[String], dataType: DataType) {
    def id: String = path.mkString("\u0000")
    def col: Column = path.tail.foldLeft(functions.col(
      quote(path.head)))((c, f) => c.getField(f))
    private def quote(n: String) = s"`${n.replace("`", "``")}`"
  }
  private val functions = org.apache.spark.sql.functions

  /** Leaf scalar columns, descending struct fields inline (no extra
    * job needed for structs — they're projections).
    */
  private def collectLeaves(schema: StructType): Vector[Leaf] = {
    def walk(prefix: Vector[String], dt: DataType): Vector[Leaf] =
      dt match {
        case s: StructType =>
          s.fields.toVector.flatMap(f => walk(prefix :+ f.name,
            f.dataType))
        case _: ArrayType | _: MapType => Vector.empty // next level
        case other => Vector(Leaf(prefix, other))
      }
    schema.fields.toVector.flatMap(f => walk(Vector(f.name), f.dataType))
  }

  private def isCounterable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => false
    case _ => true
  }

  // ----------------------------------------------------- wide agg pass

  /** Per-leaf aggregate expressions for the single wide pass. */
  private def wideAggExprs(l: Leaf): Seq[Column] = {
    val c = l.col
    val id = l.id
    val base = Seq(
      count(c).as(s"${id}__cnt"),
      approx_count_distinct(c).as(s"${id}__adist"))
    val ordered = l.dataType match {
      case _: NumericType | TimestampType | DateType | StringType |
           BooleanType =>
        Seq(min(c).as(s"${id}__min"), max(c).as(s"${id}__max"))
      case _ => Seq.empty
    }
    val stringy = l.dataType match {
      case StringType =>
        // Per-row length gate on the numeric/bool/datetime probes:
        // the ladder only consults these witnesses when the column's
        // GLOBAL lmax ≤ maxNumericLen (summaryStrLadder), so gating
        // each row changes no decision — but it lets codegen skip
        // ~20 regex/timestamp parses per row on long text columns
        // (conditional branches evaluate lazily), which is where the
        // wide agg spends its time on document corpora.
        val short = length(c) <= config.maxNumericLen
        def probe(cond: Column): Column = count(when(short && cond, 1))
        Seq(
          count(when(c === "", 1)).as(s"${id}__empty"),
          min(length(c)).as(s"${id}__lmin"),
          max(length(c)).as(s"${id}__lmax"),
          count(when(c.startsWith("http://")
            .or(c.startsWith("https://")), 1)).as(s"${id}__url"),
          count(when(c.rlike("^\\s*[\\[{]"), 1)).as(s"${id}__json")) ++
          TreeAnalyzer.BoolPatterns.zipWithIndex.map { case (p, i) =>
            val Array(f, t) = p.split("\\|", -1)
            probe(lower(trim(c)).isin(f, t)).as(s"${id}__b$i")
          } ++ Seq(
          probe(c.rlike("^[+-]?(0[oO])?[0-7]+$")).as(s"${id}__io"),
          probe(c.rlike("^[+-]?[0-9]+$")).as(s"${id}__id"),
          probe(c.rlike("^[+-]?(0[xX])?[0-9A-Fa-f]+$"))
            .as(s"${id}__ix"),
          probe(c.try_cast(DoubleType).isNotNull).as(s"${id}__f")) ++
          sparkDateTimeFormats.zipWithIndex.map { case ((_, fmt), i) =>
            probe(try_to_timestamp(c, lit(fmt)).isNotNull)
              .as(s"${id}__dt$i")
          }
      case _ => Seq.empty
    }
    base ++ ordered ++ stringy
  }

  /** strptime formats that translate cleanly to Spark patterns, in
    * reference probe order (fixed formats: analyzer.py:64-72).
    */
  private val sparkDateTimeFormats: Seq[(String, String)] =
    Conversions.FixedDateTimePatterns
      .flatMap(p => Conversions.strptimeToSpark.get(p).map(p -> _)) ++
      Conversions.VarDateTimePatterns
        .flatMap(p => Conversions.strptimeToSpark.get(p).map(p -> _))

  // ------------------------------------------------- counter batch pass

  /** ONE job per JVM type group: explode (name, value) structs and
    * groupBy — instead of a full-data shuffle per column.
    */
  private def collectCounters(df: DataFrame, cols: Vector[Leaf])
      : Map[String, ValueCounter] = {
    if (cols.isEmpty) return Map.empty
    def group(sel: Leaf => Option[Column]): Map[String, ValueCounter] = {
      val pairs = cols.flatMap(l => sel(l).map(v =>
        struct(lit(l.id).as("k"), v.as("v"))))
      if (pairs.isEmpty) return Map.empty
      val rows = df
        .select(explode(array(pairs: _*)).as("e"))
        .groupBy(col("e.k").as("k"), col("e.v").as("v"))
        .agg(count(lit(1)).as("c"))
        .collect()
      rows.groupBy(_.getAs[String]("k")).map { case (k, rs) =>
        k -> ValueCounter(rs.map(r =>
          (r.get(1): Any) -> r.getAs[Long]("c")).toMap)
      }
    }
    // longs (ints, bools as 0/1 kept separately, timestamps as micros)
    val longs = group { l =>
      l.dataType match {
        case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
          Some(l.col.cast(LongType))
        case _ => None
      }
    }
    val bools = group { l =>
      l.dataType match {
        case BooleanType => Some(l.col)
        case _ => None
      }
    }
    val times = group { l =>
      l.dataType match {
        case TimestampType | TimestampNTZType | DateType =>
          // NTZ/date need an explicit cast (session tz = UTC)
          Some(unix_micros(l.col.cast(TimestampType)))
        case _ => None
      }
    }.map { case (k, vc) =>
      k -> vc.mapKeys {
        case null => null
        case m: Long => Instant.ofEpochSecond(
          Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L)
      }
    }
    val doubles = group { l =>
      l.dataType match {
        case DoubleType | FloatType | _: DecimalType =>
          Some(l.col.cast(DoubleType))
        case _ => None
      }
    }
    val strings = group { l =>
      l.dataType match {
        case StringType => Some(l.col)
        case _ => None
      }
    }
    longs ++ bools ++ times ++ doubles ++ strings
  }

  // ------------------------------------------------------ per-field asm

  private def analyzeField(df: DataFrame, path: Vector[String],
                           dt: DataType, row: Row,
                           counters: Map[String, ValueCounter],
                           total: Long, jsonDepth: Int): SType =
    dt match {
    case s: StructType =>
      // struct = nested record; fields were analyzed in the same pass
      val leaf = Leaf(path, s)
      val cnt = total // struct presence not separately tracked
      val fields = s.fields.toVector.sortBy(_.name).map { f =>
        SDictField(SField(f.name, cnt, optional = false),
          analyzeField(df, path :+ f.name, f.dataType, row, counters,
            total, jsonDepth))
      }
      SDict(Stats.fromCounter(ValueCounter(Map(
        (s.fields.length.toLong: Any) -> cnt))), fields)
    case ArrayType(et, _) =>
      // one extra projection job per array level (explode); Catalyst
      // prunes the scan to this column only
      val c = Leaf(path, dt).col
      val lengthsDf = df.select(size(c).as("n")).where(col("n") >= 0)
      val lengths = counterOrSummary(lengthsDf, "n")
      val items = df.select(explode(c).as("item"))
      val itemType = analyzeNested(items, et, jsonDepth)
      SList(lengths, itemType)
    case MapType(kt, vt, _) =>
      val c = Leaf(path, dt).col
      val lengthsDf = df.select(size(c).as("n")).where(col("n") >= 0)
      val lengths = counterOrSummary(lengthsDf, "n")
      val keys = analyzeNested(df.select(explode(map_keys(c))
        .as("item")), kt, jsonDepth)
      val values = analyzeNested(df.select(explode(map_values(c))
        .as("item")), vt, jsonDepth)
      SDict(lengths, Vector(SDictField(keys, values)))
    case other =>
      val leaf = Leaf(path, other)
      assembleScalar(df, leaf, row, counters.get(leaf.id), total,
        jsonDepth)
  }

  /** Analyze exploded array/map content as its own level. */
  private def analyzeNested(items: DataFrame, et: DataType,
                            jsonDepth: Int): SType =
    et match {
      case s: StructType =>
        analyzeLevel(items.select(s.fields.toVector.map(f =>
          col("item").getField(f.name).as(f.name)): _*), jsonDepth)
      case _: ArrayType | _: MapType =>
        // deeper nesting: recurse with the single "item" column
        val sub = analyzeLevel2(items, jsonDepth)
        sub
      case _ =>
        val sub = analyzeLevel(items, jsonDepth)
        sub match {
          case d: SDict if d.content.length == 1 =>
            d.content.head.value // unwrap single synthetic column
          case other => other
        }
    }

  private def analyzeLevel2(items: DataFrame,
                            jsonDepth: Int): SType = {
    val d = analyzeLevel(items, jsonDepth)
    d match {
      case dict: SDict if dict.content.length == 1 =>
        dict.content.head.value
      case other => other
    }
  }

  /** Exact counter when cheap, else percentile-backed summary. */
  private def counterOrSummary(df: DataFrame, colName: String): Stats = {
    val c = col(colName)
    val r = df.agg(count(c).as("cnt"),
      approx_count_distinct(c).as("adist")).head()
    val cnt = r.getAs[Long]("cnt")
    if (cnt == 0) return Stats.fromCounter(
      ValueCounter(Map((0L: Any) -> 1L)))
    if (r.getAs[Long]("adist") <= exactDistinctCap) {
      val rows = df.groupBy(c).agg(count(lit(1)).as("n")).collect()
      Stats.fromCounter(ValueCounter(rows.map(row =>
        (normalize(row.get(0)): Any) -> row.getAs[Long]("n")).toMap))
    } else summaryStats(df, c, cnt)
  }

  /** Exact positional quartiles for over-cap numeric columns:
    * percentile at p = k/(n-1) evaluates order statistic x[k] with no
    * interpolation (§1.3 rule: k = n/4, n/2, 3n/4, 0-based int div).
    * Non-numeric (string) columns get min/max only, quartiles pinned
    * to min — a documented scale-mode approximation (strings over the
    * distinct cap; the reference would sort the whole sample).
    */
  private def summaryStats(df: DataFrame, c: Column, n: Long): Stats = {
    val numeric = df.select(c).schema.head.dataType
      .isInstanceOf[NumericType]
    if (!numeric) {
      val r = df.agg(min(c).as("mn"), max(c).as("mx"),
        count(c).as("cnt"),
        (approx_count_distinct(c) >= (count(c) * 98 / 100))
          .as("uniq")).head()
      val mn = normalize(r.get(0))
      return withTopK(df, c, Stats.summary(r.getAs[Long]("cnt"), mn,
        mn, mn, mn, normalize(r.get(1)),
        unique = r.getAs[Boolean]("uniq")))
    }
    val ps = Seq(n / 4, n / 2, 3 * n / 4).map(k =>
      if (n <= 1) 0.0 else k.toDouble / (n - 1))
    // exact percentile holds the group's values in executor memory;
    // past the cap (100 TB territory) degrade to the GK sketch
    val qExpr =
      if (n <= SparkAnalyzer.exactPercentileCap)
        percentile(c, typedLit(ps))
      else approx_percentile(c.cast(DoubleType), typedLit(ps),
        lit(10000)).cast(ArrayType(DoubleType))
    val r = df.agg(
      min(c).as("mn"), max(c).as("mx"),
      qExpr.as("qs"),
      count(c).as("cnt"),
      (approx_count_distinct(c) >= (count(c) * 98 / 100))
        .as("uniq")).head()
    val qs = r.getSeq[Double](2)
    withTopK(df, c, Stats.summary(r.getAs[Long]("cnt"),
      normalize(r.get(0)), qs(0), qs(1), qs(2), normalize(r.get(1)),
      unique = r.getAs[Boolean]("uniq")))
  }

  /** Attach the bounded top-K most-common sketch to a summary Stats:
    * one partial-aggregated groupBy + TakeOrdered of K rows — the
    * sample display survives past the distinct cap without a driver
    * histogram (SURVEY §8). Marked partial so it can never feed
    * quartile recomputation on merge.
    */
  private def withTopK(df: DataFrame, c: Column, s: Stats): Stats = {
    if (sampleTopK <= 0 || s.unique) return s
    val rows = df.groupBy(c.as("v"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("v").asc_nulls_first)
      .limit(sampleTopK)
      .collect()
    val counter = ValueCounter(rows.flatMap { r =>
      Option(r.get(0)).map(v => (normalize(v): Any) -> r.getAs[Long]("n"))
    }.toMap)
    if (counter.isEmpty) s
    else Stats.summaryWithSample(s.card, s.min, s.q1, s.q2, s.q3,
      s.max, s.unique, counter)
  }

  /** Spark row value → dynamic value model. */
  private def normalize(v: Any): Any = v match {
    case null => null
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case f: Float => f.toDouble
    case d: java.math.BigDecimal => d.doubleValue
    case t: java.sql.Timestamp => t.toInstant
    case t: java.time.LocalDateTime => t.toInstant(java.time.ZoneOffset.UTC)
    case d: java.sql.Date =>
      d.toLocalDate.atStartOfDay.toInstant(java.time.ZoneOffset.UTC)
    case d: java.time.LocalDate =>
      d.atStartOfDay.toInstant(java.time.ZoneOffset.UTC)
    case other => other
  }

  /** Build the scalar's SType: exact ladder over the counter when
    * available (reference-faithful), else witness-count decisions +
    * summary stats.
    */
  private def assembleScalar(df: DataFrame, leaf: Leaf, row: Row,
                             counterOpt: Option[ValueCounter],
                             total: Long, jsonDepth: Int): SType = {
    val id = leaf.id
    val cnt = row.getAs[Long](s"${id}__cnt")
    val nulls = total - cnt
    if (cnt == 0) return SValue(Vector.empty)
    if (total > 0 && nulls.toDouble / total > config.nullThreshold)
      return SValue(Vector.empty)

    // Spark-first extension beyond the reference: a string column
    // whose values are all JSON containers is a string REPRESENTATION
    // of nested structure — parse it distributed (spark.read.json
    // schema-merges across executors) and recurse, yielding
    // `str of {…} pattern=json`. The reference leaves such columns as
    // plain Str (it never parses strings as documents).
    if (parseJsonStrings && leaf.dataType == StringType &&
        jsonDepth < config.maxDepth) {
      val empty = row.getAs[Long](s"${id}__empty")
      val jsonW = row.getAs[Long](s"${id}__json")
      if (jsonW > 0 && jsonW == cnt - empty) {
        val spark = df.sparkSession
        import spark.implicits._
        val strings = df.select(leaf.col.as("v"))
          .where(col("v").isNotNull && col("v") =!= "").as[String]
        val parsed = spark.read.json(strings)
        if (!parsed.columns.contains("_corrupt_record"))
          return SStrRepr(analyzeLevel(parsed, jsonDepth + 1),
            "json")
      }
    }

    counterOpt match {
      case Some(counter0) =>
        val counter = ValueCounter(counter0.counts.flatMap {
          case (null, _) => None
          case (k, v) => Some(normalize(k) -> v)
        })
        if (counter.isEmpty) return SValue(Vector.empty)
        exactLadder(counter, leaf.dataType)
      case None => summaryLadder(df, leaf, row, cnt)
    }
  }

  /** Reference-exact ladder on a collected counter (reuses the
    * TreeAnalyzer string pipeline — analyzer.py:598-740).
    */
  private def exactLadder(counter: ValueCounter, dt: DataType): SType =
    dt match {
      case BooleanType => SBool(Stats.fromCounter(counter))
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
        tree.matchPossibleDateTime(SInt(Stats.fromCounter(counter)))
      case DoubleType | FloatType | _: DecimalType =>
        tree.matchPossibleDateTime(SFloat(Stats.fromCounter(counter)))
      case TimestampType | TimestampNTZType | DateType =>
        SDateTime(Stats.fromCounter(counter))
      case StringType => tree.matchStr(counter)
      case _ => SValue(Vector.empty)
    }

  /** Over-cap path: decide the interpretation from the wide-agg
    * witness counts, then compute summary stats for the chosen
    * representation in one more aggregation.
    */
  private def summaryLadder(df: DataFrame, leaf: Leaf, row: Row,
                            cnt: Long): SType = {
    val id = leaf.id
    val c = leaf.col
    leaf.dataType match {
      case BooleanType =>
        SBool(summaryStats(df.select(c.cast(LongType).as("v")),
          col("v"), cnt))
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
        tree.matchPossibleDateTime(
          SInt(summaryStats(df.select(c.as("v")), col("v"), cnt)))
      case DoubleType | FloatType | _: DecimalType =>
        tree.matchPossibleDateTime(SFloat(summaryStats(
          df.select(c.cast(DoubleType).as("v")), col("v"), cnt)))
      case TimestampType | TimestampNTZType | DateType =>
        val s = summaryStats(df.select(unix_micros(
          c.cast(TimestampType)).as("v")), col("v"), cnt)
        def toInst(v: Any): Any = v match {
          case m: Long => Instant.ofEpochSecond(
            Math.floorDiv(m, 1000000L),
            Math.floorMod(m, 1000000L) * 1000L)
          case d: Double => SType.epochToInstant(d / 1e6)
          case other => other
        }
        SDateTime(Stats.summary(s.card, toInst(s.min), toInst(s.q1),
          toInst(s.q2), toInst(s.q3), toInst(s.max), s.unique))
      case StringType => summaryStrLadder(df, leaf, row, cnt)
      case _ => SValue(Vector.empty)
    }
  }

  /** The string ladder from witness counts (analyzer.py:642-740
    * re-expressed as threshold tests over pre-computed conditional
    * aggregates).
    */
  private def summaryStrLadder(df: DataFrame, leaf: Leaf, row: Row,
                               cnt: Long): SType = {
    val id = leaf.id
    val c = leaf.col
    val empty = row.getAs[Long](s"${id}__empty")
    if (cnt > 0 && empty.toDouble / cnt > config.emptyThreshold)
      return SStr(summaryStats(df.select(c.as("v")), col("v"), cnt),
        lengthStats(df, c), None)
    val nonEmpty = cnt - empty
    val bad = math.ceil(cnt * config.badThreshold).toLong
    def ok(witness: Long): Boolean =
      witness > 0 && witness >= nonEmpty - bad
    val lmax = row.getAs[Int](s"${id}__lmax")
    val lmin = row.getAs[Int](s"${id}__lmin")

    if (lmax <= config.maxNumericLen) {
      // bools
      TreeAnalyzer.BoolPatterns.zipWithIndex.foreach { case (p, i) =>
        if (ok(row.getAs[Long](s"${id}__b$i")))
          return SStrRepr(SBool(summaryStats(df.select(
            when(lower(trim(c)) === p.split("\\|", -1)(1), 1L)
              .otherwise(0L).as("v")), col("v"), nonEmpty)), p)
      }
      // ints (o, d, x probe order — analyzer.py:63)
      Seq(("o", 8, s"${id}__io"), ("d", 10, s"${id}__id"),
          ("x", 16, s"${id}__ix")).foreach { case (pat, base, key) =>
        if (ok(row.getAs[Long](key))) {
          val conv = base match {
            case 10 => c.try_cast(LongType)
            case _ => conv10(c, base)
          }
          val res = SStrRepr(SInt(summaryStats(
            df.select(conv.as("v")).where(col("v").isNotNull),
            col("v"), nonEmpty)), pat)
          return if (pat == "d") promoteSummaryEpoch(res) else res
        }
      }
      // float
      if (ok(row.getAs[Long](s"${id}__f")))
        return promoteSummaryEpoch(SStrRepr(SFloat(summaryStats(
          df.select(c.try_cast(DoubleType).as("v"))
            .where(col("v").isNotNull), col("v"), nonEmpty)), "f"))
      // datetimes
      sparkDateTimeFormats.zipWithIndex.foreach { case ((py, fmt), i) =>
        if (ok(row.getAs[Long](s"${id}__dt$i"))) {
          val conv = try_to_timestamp(c, lit(fmt))
          val s = summaryStats(df.select(unix_micros(conv).as("v"))
            .where(col("v").isNotNull), col("v"), nonEmpty)
          def toInst(v: Any): Any = v match {
            case m: Long => Instant.ofEpochSecond(
              Math.floorDiv(m, 1000000L),
              Math.floorMod(m, 1000000L) * 1000L)
            case d: Double => SType.epochToInstant(d / 1e6)
            case other => other
          }
          return SStrRepr(SDateTime(Stats.summary(s.card,
            toInst(s.min), toInst(s.q1), toInst(s.q2), toInst(s.q3),
            toInst(s.max), s.unique)), py)
        }
      }
    }
    val values = summaryStats(df.select(c.as("v")), col("v"), cnt)
    val lengths = lengthStats(df, c)
    // fixed-length pattern mining via the custom
    // TypedImperativeAggregate (one buffer of per-position char sets,
    // positionwise union on merge) — SURVEY §4.2's custom aggregate
    val pattern =
      if (lmin == lmax && lmax > 0 && lmax <= 64) {
        val sets = df.agg(graft.functions.CharClassAgg
          .charClasses(c, 64).as("p")).head()
        if (sets.isNullAt(0)) None
        else {
          val classes = sets.getSeq[String](0).toVector.map(ch =>
            Chars(ch.toSet): CharClass)
          Some(generalizePattern(classes))
        }
      } else None
    if (pattern.isEmpty && lmin != lmax &&
        row.getAs[Long](s"${id}__url") == cnt)
      SURL.fromSummary(values, lengths)
    else SStr(values, lengths, pattern)
  }

  /** Same digit-base promotion + identifier generalization as the
    * in-memory miner (analyzer.py:686-718).
    */
  private def generalizePattern(positions: Vector[CharClass])
      : Vector[CharClass] = {
    import CharClass._
    var base = 0
    val marked: Vector[Either[Unit, CharClass]] = positions.map { cc =>
      if (cc.size > 1 && cc.subsetOf(hexDigit)) {
        if (cc.subsetOf(octDigit)) base = math.max(base, 8)
        else if (cc.subsetOf(decDigit)) base = math.max(base, 10)
        else base = math.max(base, 16)
        Left(())
      } else Right(cc)
    }
    val digitClass = base match {
      case 8 => Some(octDigit); case 10 => Some(decDigit)
      case 16 => Some(hexDigit); case _ => None
    }
    val pattern0 = marked.map {
      case Left(_) => digitClass.get
      case Right(cc) => cc
    }
    val digits = Set(octDigit, decDigit, hexDigit)
    if (pattern0.head.subsetOf(identFirst) &&
        pattern0.tail.forall(_.subsetOf(identChar)))
      (if (pattern0.head.size == 1) pattern0.head else identFirst) +:
        pattern0.tail.map(c =>
          if (c.size == 1 || digits(c)) c else identChar)
    else pattern0.map(c =>
      if (c.size == 1 || digits(c)) c else (AnyChar: CharClass))
  }

  private def lengthStats(df: DataFrame, c: Column): Stats =
    counterOrSummary(df.select(length(c).cast(LongType).as("n"))
      .where(col("n").isNotNull), "n")

  /** Base-8/16 string → long via conv() (handles 0x/0o prefixes). */
  private def conv10(c: Column, base: Int): Column = {
    val stripped = regexp_replace(c, "^([+-]?)0[xXoO]", "$1")
    functions.conv(stripped, base, 10).try_cast(LongType)
  }

  /** Summary-mode epoch promotion (analyzer.py:742-770 over summary
    * stats instead of counters).
    */
  private def promoteSummaryEpoch(t: SType): SType = t match {
    case sr @ SStrRepr(content: SScalar, pat)
        if content.isInstanceOf[SInt] || content.isInstanceOf[SFloat] =>
      val mn = SType.asDouble(content.values.min)
      val mx = SType.asDouble(content.values.max)
      if (config.minTimestamp <= mn && mx <= config.maxTimestamp) {
        def conv(v: Any): Any = SType.epochToInstant(
          SType.asDouble(v) * config.timestampScale +
            config.timestampOffset)
        val s = content.values
        SStrRepr(SNumRepr(SDateTime(Stats.summary(s.card, conv(s.min),
          conv(s.q1), conv(s.q2), conv(s.q3), conv(s.max), s.unique)),
          content.isInstanceOf[SFloat], config.timestampScale,
          config.timestampOffset), pat)
      } else sr
    case other => other
  }
}

object SparkAnalyzer {
  /** Counter-collection budget: columns with more (approx) distinct
    * values than this skip exact counters and use the summary path.
    * Override with SPARK_GRAFT_DISTINCT_CAP for scale tuning (set low
    * to force the 100 TB code path in tests).
    */
  def defaultDistinctCap: Long =
    sys.env.get("SPARK_GRAFT_DISTINCT_CAP").map(_.toLong)
      .getOrElse(65536L)

  /** Rows per column above which positional quartiles switch from
    * exact `percentile` (in-memory sort of the group) to the
    * approx_percentile sketch. Override: SPARK_GRAFT_EXACT_PCT_CAP.
    */
  def exactPercentileCap: Long =
    sys.env.get("SPARK_GRAFT_EXACT_PCT_CAP").map(_.toLong)
      .getOrElse(100000000L)

  /** Top-K sketch size for over-cap sample display. Override:
    * SPARK_GRAFT_SAMPLE_TOPK (0 disables).
    */
  def defaultSampleTopK: Int =
    sys.env.get("SPARK_GRAFT_SAMPLE_TOPK").map(_.toInt).getOrElse(8)
}
