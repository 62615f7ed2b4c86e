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
  *    Length counters for over-cap string columns ride the same batch.
  *  - **One wide summary pass over the cap** — high-cardinality columns
  *    have their representation DECIDED from the pass-1 witness counts
  *    alone (no extra jobs), then every over-cap column's summary
  *    aggregates — exact `percentile` at rank-aligned fractions
  *    (p = k/(n-1) hits x[k] exactly), min/max/count/uniqueness, length
  *    stats, and the fixed-length CharClass pattern miner — run together
  *    in a SECOND single wide aggregation per level. Job count per level
  *    is O(1) in column count (a 200-column table costs the same number
  *    of scheduler round-trips as a 2-column one); only the optional
  *    bounded top-K sample sketch remains a per-column TakeOrdered job.
  *  - **Nested data = projections, not re-scans** — struct fields are
  *    analyzed in the parent's wide agg via dotted columns; ALL of a
  *    level's scalar-element arrays and map keys/values fold into ONE
  *    tagged `explode(concat(...))` frame analyzed by a single
  *    recursive level, and all array/map length stats ride one shared
  *    batch — k sibling collections cost the same jobs as one
  *    (filter/column pruning pushed to the parquet scan by Catalyst).
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
                            SparkAnalyzer.defaultSampleTopK,
                          /** Rows per column above which positional
                            * quartiles degrade from exact `percentile`
                            * to the approx_percentile GK sketch (the
                            * 100 TB path; exact percentile holds a
                            * group's values in executor memory).
                            */
                          val exactPctCap: Long =
                            SparkAnalyzer.exactPercentileCap,
                          /** Driver-memory budget (bytes, estimated)
                            * for collected exact counters across a
                            * level: a distinct-cap check alone would
                            * happily collect 50k × 10 KB documents;
                            * columns whose estimated counter size
                            * (approx-distinct × max value width)
                            * blows the remaining budget demote to the
                            * summary path. Deterministic: columns
                            * claim budget in leaf-id order.
                            */
                          val counterByteBudget: Long =
                            SparkAnalyzer.defaultCounterByteBudget) {

  private val tree = new TreeAnalyzer(config)

  /** Analyze a relation the way the reference analyzes a list of
    * records: returns `SList(SDict(record fields...))`.
    */
  def analyzeTable(df: DataFrame): SType = {
    val dict = analyzeLevel(df)
    SList(Stats.fromCounter(ValueCounter(Map((1L: Any) -> 1L))), dict)
  }

  /** Incremental analysis: fold a DELTA into a PRIOR [[analyzeTable]]
    * result via the anti-unification monoid ([[SType.merge]], the
    * ScalaCheck-law-tested `+`), so daily ingest against a 100 TB
    * corpus re-analyzes ONLY the delta — the distributed jobs touch
    * the new rows, the prior is a driver-side value (persist it
    * however the pipeline persists small state).
    *
    * Contract: columns whose per-side analyses stayed on the
    * exact-counter path merge EXACTLY — `analyzeIncremental(
    * analyzeTable(a), b) == analyzeTable(a union b)` including
    * quartiles, uniqueness, and renders (spec-pinned). Columns on the
    * over-cap summary path merge with the reference's own summary
    * convention (exact card/min/max; quartiles carried from the
    * larger side — the identical approximation the reference applies
    * when merging analyses). A delta whose inferred field type
    * CONTRADICTS the prior (e.g. a numeric column turning
    * free-string) throws the algebra's IllegalArgumentException,
    * exactly like the reference's `+`; re-analyze from scratch when
    * the schema genuinely drifts.
    */
  def analyzeIncremental(prior: SType, delta: DataFrame): SType = {
    val d = analyzeTable(delta)
    (prior, d) match {
      // merge the record structures; keep the constant one-table
      // outer wrapper (merging the wrappers would count tables, not
      // rows, and diverge from the whole-corpus analyze)
      case (p: SList, dl: SList) =>
        dl.withContent(SType.merge(p.content, dl.content))
      case _ => SType.merge(prior, d)
    }
  }

  /** Analyze one nesting level (a relation of records).
    *
    * `srcTagged` marks the merged sibling-explode frame built by
    * [[analyzeNestedBatch]]: a `__src` column names each row's source
    * slot and every other column is null outside its own slot's rows.
    * In that mode each leaf's row total is its slot's row count
    * (aggregated in the same pass-1 job), so null-fraction decisions
    * see exactly the rows the per-column explode would have produced.
    */
  private def analyzeLevel(df: DataFrame,
                           jsonDepth: Int = 0,
                           srcTagged: Boolean = false): SType = {
    val schema = df.schema
    if (schema.isEmpty) return SDict(
      Stats.fromCounter(ValueCounter(Map((0L: Any) -> 1L))), Vector.empty)

    // -------- pass 1: one wide aggregation over every leaf column
    val leaves = collectLeaves(schema)
      .filterNot(l => srcTagged && l.path == Vector("__src"))
    val slotTotals =
      if (!srcTagged) Seq.empty
      else leaves.map(l => count(when(col("__src") === l.path.head,
        1)).as(s"${l.id}__tot"))
    val aggExprs = leaves.flatMap(l => wideAggExprs(l)) ++
      slotTotals :+ count(lit(1)).as("__total")
    val row = described(df, s"graft: witness pass " +
      s"(${leaves.size} columns)") {
      df.agg(aggExprs.head, aggExprs.tail: _*).head()
    }
    val total = row.getAs[Long]("__total")
    val totalFor: String => Long =
      if (!srcTagged) _ => total
      else id => row.getAs[Long](s"${id}__tot")

    // -------- plan: decide every over-cap column's representation from
    // the pass-1 witnesses (driver-side, no jobs)
    val underCap = leaves.filter { l =>
      row.getAs[Long](s"${l.id}__adist") <= exactDistinctCap &&
        isCounterable(l.dataType)
    }
    // driver-memory guard: estimated counter bytes (approx distinct ×
    // max value width) claim a shared budget in deterministic leaf-id
    // order; over-budget columns fall back to the summary path
    var budget = counterByteBudget
    val counterCols = underCap.sortBy(_.id).filter { l =>
      val adist = row.getAs[Long](s"${l.id}__adist")
      val width = l.dataType match {
        case StringType =>
          // lmax is null-free only when the column has rows; a column
          // with cnt == 0 never reaches the counter path's consumers
          if (row.getAs[Long](s"${l.id}__cnt") == 0) 0L
          else row.getAs[Int](s"${l.id}__lmax").toLong.max(1L)
        case _ => 16L
      }
      val est = adist * width
      if (est <= budget) { budget -= est; true } else false
    }
    val counterIds = counterCols.map(_.id).toSet
    val plans = leaves.filterNot(l => counterIds(l.id))
      .flatMap(l => planSummary(l, row, totalFor(l.id), jsonDepth))
    // all-JSON columns will recurse instead; keep their fallback
    // plans out of the shared passes
    val active = plans.filterNot(_.deferred)
    val lengthCounterCols = active
      .filter(p => p.needLengths && p.lengthsExact).map(_.leaf)

    // -------- pass 2: batched exact counters (values under the cap +
    // lengths of over-cap strings) — one job per JVM type group
    val (counters, lengthCounters) =
      described(df, s"graft: exact counter batch " +
        s"(${counterCols.size} columns)") {
        collectCounters(df, counterCols, lengthCounterCols)
      }

    // -------- pass 3: ONE wide summary aggregation for all over-cap
    // columns (quartiles, length stats, CharClass patterns together).
    // Exact-percentile buffers share the executor-memory cap: each of
    // the pctConsumers columns gets exactPctCap / pctConsumers rows
    // before degrading to the GK sketch, so the ONE-pass batching
    // cannot multiply peak aggregation memory by the column count.
    val pctConsumers = (active.count(_.numeric) +
      active.count(p => p.needLengths && !p.lengthsExact)).max(1)
    val summaryRow: Row =
      if (active.isEmpty) null
      else described(df, s"graft: summary pass " +
        s"(${active.size} over-cap columns)") {
        val exprs = active.flatMap(p => summaryAggExprs(p, pctConsumers))
        df.agg(exprs.head, exprs.tail: _*).head()
      }

    // -------- pass 4: ONE batched top-K display-sample job per JVM
    // type group (previously a groupBy+TakeOrdered job per over-cap
    // column — the last per-column cost of the level)
    val (valueSamples, lengthSamples) =
      if (summaryRow == null || sampleTopK <= 0)
        (Map.empty[String, ValueCounter],
          Map.empty[String, ValueCounter])
      else described(df, s"graft: top-K sample batch " +
        s"(${active.size} over-cap columns)") {
        collectTopKSamples(df, active, summaryRow)
      }

    // -------- pass 5: batched same-level nested content. All
    // array/map LENGTH columns ride one shared counter-or-summary
    // batch on this frame, and every scalar-element explode (array
    // items, map keys, map values) folds into ONE tagged-explode
    // frame analyzed by a single recursive level — so k sibling
    // arrays cost the same jobs as one (previously k explode passes
    // of 2-6 jobs each).
    val nestedLeaves = collectNested(schema)
    val nestedLengths =
      if (nestedLeaves.isEmpty) Map.empty[String, Stats]
      else described(df, s"graft: nested lengths batch " +
        s"(${nestedLeaves.size} columns)") {
        batchedLengthStats(df, nestedLeaves.map(l => l.id -> l.col))
      }
    val slots = nestedLeaves.flatMap { l =>
      l.dataType match {
        case ArrayType(et, _) if isScalarType(et) =>
          Vector((l.id + SlotItems, l.col, et))
        case MapType(kt, vt, _) =>
          (if (isScalarType(kt))
            Vector((l.id + SlotKeys, map_keys(l.col), kt))
          else Vector.empty) ++
          (if (isScalarType(vt))
            Vector((l.id + SlotVals, map_values(l.col), vt))
          else Vector.empty)
        case _ => Vector.empty
      }
    }
    val nestedItems = analyzeNestedBatch(df, slots, jsonDepth)

    // -------- assemble the record dict
    val ctx = LevelCtx(df, row, counters, lengthCounters,
      plans.map(p => p.leaf.id -> p).toMap, summaryRow,
      valueSamples, lengthSamples, total, totalFor, jsonDepth,
      nestedLengths, nestedItems)
    described(df, "graft: assemble (nested levels / top-K)") {
      val fields = schema.fields.toVector
        .filterNot(f => srcTagged && f.name == "__src")
        .sortBy(_.name).map { f =>
          val t = analyzeField(ctx, Vector(f.name), f.dataType)
          SDictField(SField(f.name, total, optional = false), t)
        }
      SDict(Stats.fromCounter(ValueCounter(Map(
        (schema.fields.length.toLong: Any) -> total))), fields)
    }
  }

  /** Label this block's Spark jobs (surfaced by the CLI progress line
    * and the Spark UI); restores the previous label so nested levels
    * re-label correctly.
    */
  private def described[T](df: DataFrame, desc: String)(f: => T): T = {
    val sc = df.sparkSession.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try f finally sc.setJobDescription(prev)
  }

  // ------------------------------------------------------------ schema

  private final case class Leaf(path: Vector[String], dataType: DataType) {
    def id: String = path.mkString("\u0000")
    def col: Column = path.tail.foldLeft(functions.col(
      quote(path.head)))((c, f) => c.getField(f))
    private def quote(n: String) = s"`${n.replace("`", "``")}`"
  }
  private val functions = org.apache.spark.sql.functions

  /** Everything one nesting level's assembly needs: the pass-1 witness
    * row, batched counters, and the over-cap summary plans + their
    * single wide-agg result row.
    */
  private final case class LevelCtx(df: DataFrame, row: Row,
                                    counters: Map[String, ValueCounter],
                                    lengthCounters: Map[String, ValueCounter],
                                    plans: Map[String, SummaryPlan],
                                    summaryRow: Row,
                                    valueSamples: Map[String, ValueCounter],
                                    lengthSamples: Map[String, ValueCounter],
                                    total: Long,
                                    /** Per-leaf row total: the level
                                      * total normally; the leaf's own
                                      * slot count on the merged
                                      * sibling-explode frame.
                                      */
                                    totalFor: String => Long,
                                    jsonDepth: Int,
                                    /** Pass-5 results: Stats for every
                                      * array/map length column, SType
                                      * for every scalar slot.
                                      */
                                    nestedLengths: Map[String, Stats],
                                    nestedItems: Map[String, SType])

  /** An over-cap column's decided representation: which expression to
    * aggregate in the wide summary pass, the count its rank-aligned
    * percentile fractions use, which extras it needs (length stats /
    * CharClass pattern), and how to build the final SType from the
    * aggregated pieces.
    */
  private final case class SummaryPlan(leaf: Leaf, value: Column,
                                       numeric: Boolean, n: Long,
                                       needLengths: Boolean,
                                       lengthsExact: Boolean,
                                       needPattern: Boolean,
                                       build: SummaryCtx => SType,
                                       /** All-JSON string columns
                                         * normally recurse instead;
                                         * their plan is only the
                                         * corrupt-JSON fallback and
                                         * stays OUT of the shared
                                         * passes — built on demand by
                                         * a per-column aggregation.
                                         */
                                       deferred: Boolean = false)

  private final case class SummaryCtx(values: Stats, lengths: () => Stats,
                                      pattern: Option[Vector[CharClass]])

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

  /** Array/map columns at this level (descending struct fields), the
    * inputs of the pass-5 nested batch.
    */
  private def collectNested(schema: StructType): Vector[Leaf] = {
    def walk(prefix: Vector[String], dt: DataType): Vector[Leaf] =
      dt match {
        case s: StructType =>
          s.fields.toVector.flatMap(f => walk(prefix :+ f.name,
            f.dataType))
        case a: ArrayType => Vector(Leaf(prefix, a))
        case m: MapType => Vector(Leaf(prefix, m))
        case _ => Vector.empty
      }
    schema.fields.toVector.flatMap(f => walk(Vector(f.name), f.dataType))
  }

  private def isScalarType(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType => false
    case _ => true
  }

  /** Slot-key suffixes for the pass-5 merged explode (NUL-separated
    * like leaf ids, so they can never collide with a field name).
    */
  private val SlotItems = "\u0000__items"
  private val SlotKeys = "\u0000__keys"
  private val SlotVals = "\u0000__vals"

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
        // GLOBAL lmax ≤ maxNumericLen (planStringSummary), so gating
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
          // length-distinct estimate: decides whether an over-cap
          // string's LENGTH counter can ride the batched counter pass
          approx_count_distinct(length(c)).as(s"${id}__ladist"),
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
          probe(c.try_cast(DoubleType).isNotNull).as(s"${id}__f")) ++ {
          // first-char dispatch on the datetime probes: every
          // distributed format starts with yyyy, so a successful
          // parse must begin with a digit (or a sign — Java's
          // EXCEEDS_PAD years). The guard changes no witness count,
          // but try_to_timestamp is the witness pass's dominant cost
          // (measured 4.1 s of q71's 6.1 s at sf0.1) and non-numeric
          // strings — enums, JSON, prose — skip all of it lazily.
          val dtCandidate = short && c.rlike("^[0-9+-]")
          def probeDt(cond: Column): Column =
            count(when(dtCandidate && cond, 1))
          sparkDateTimeFormats.zipWithIndex.map { case ((_, fmt), i) =>
            probeDt(try_to_timestamp(c, lit(fmt)).isNotNull)
              .as(s"${id}__dt$i")
          }
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
    * groupBy — instead of a full-data shuffle per column. Over-cap
    * string columns' length counters ride the longs group ("l"-prefixed
    * keys), so length stats cost no per-column job either.
    */
  private def collectCounters(df: DataFrame, cols: Vector[Leaf],
                              lengthCols: Vector[Leaf])
      : (Map[String, ValueCounter], Map[String, ValueCounter]) = {
    if (cols.isEmpty && lengthCols.isEmpty) return (Map.empty, Map.empty)
    def group(pairs: Vector[(String, Column)])
        : Map[String, ValueCounter] = {
      if (pairs.isEmpty) return Map.empty
      val rows = df
        .select(explode(array(pairs.map { case (k, v) =>
          struct(lit(k).as("k"), v.as("v")) }: _*)).as("e"))
        .groupBy(col("e.k").as("k"), col("e.v").as("v"))
        .agg(count(lit(1)).as("c"))
        .collect()
      rows.groupBy(_.getAs[String]("k")).map { case (k, rs) =>
        k -> ValueCounter(rs.map(r =>
          (r.get(1): Any) -> r.getAs[Long]("c")).toMap)
      }
    }
    def sel(f: Leaf => Option[Column]): Vector[(String, Column)] =
      cols.flatMap(l => f(l).map(v => ("v" + l.id) -> v))
    // longs (ints; over-cap string lengths ride along, "l"-prefixed)
    val longs = group(sel { l =>
      l.dataType match {
        case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
          Some(l.col.cast(LongType))
        case _ => None
      }
    } ++ lengthCols.map(l =>
      ("l" + l.id) -> length(l.col).cast(LongType)))
    val bools = group(sel { l =>
      l.dataType match {
        case BooleanType => Some(l.col)
        case _ => None
      }
    })
    val times = group(sel { l =>
      l.dataType match {
        case TimestampType | TimestampNTZType | DateType =>
          // NTZ/date need an explicit cast (session tz = UTC)
          Some(unix_micros(l.col.cast(TimestampType)))
        case _ => None
      }
    }).map { case (k, vc) =>
      k -> vc.mapKeys {
        case null => null
        case m: Long => Instant.ofEpochSecond(
          Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L)
      }
    }
    val doubles = group(sel { l =>
      l.dataType match {
        case DoubleType | FloatType | _: DecimalType =>
          Some(l.col.cast(DoubleType))
        case _ => None
      }
    })
    val strings = group(sel { l =>
      l.dataType match {
        case StringType => Some(l.col)
        case _ => None
      }
    })
    val all = longs ++ bools ++ times ++ doubles ++ strings
    val values = all.collect { case (k, vc) if k.startsWith("v") =>
      k.substring(1) -> vc }
    val lengths = all.collect { case (k, vc) if k.startsWith("l") =>
      k.substring(1) -> vc }
    (values, lengths)
  }

  /** ONE bounded top-K display-sample job per JVM type group and
    * level — replacing a groupBy+TakeOrdered job per over-cap column
    * (a 200-column table cost 200 jobs where passes 1-3 are O(1)).
    * Same explode-struct batching as [[collectCounters]]; the per-key
    * ranking runs as a two-stage window (a salted pre-rank bounds any
    * single reducer task, then the final per-key rank sorts at most
    * 64·K rows per column), so one over-cap column's distinct values
    * never funnel into a single task at corpus scale. Only columns
    * the summary row proved non-unique participate — unique columns
    * show no sample, exactly like the per-column path they replace.
    */
  private def collectTopKSamples(df: DataFrame,
                                 active: Vector[SummaryPlan], srow: Row)
      : (Map[String, ValueCounter], Map[String, ValueCounter]) = {
    val valuePairs = active
      .filter(p => !srow.getAs[Boolean](s"${p.leaf.id}__suniq"))
      .map(p => ("v" + p.leaf.id, p.value))
    val lengthPairs = active
      .filter(p => p.needLengths && !p.lengthsExact &&
        !srow.getAs[Boolean](s"${p.leaf.id}__sluniq"))
      .map(p => ("l" + p.leaf.id, length(p.leaf.col).cast(LongType)))
    // struct arrays must be type-homogeneous: one job per resolved
    // value type (long/double/string — the plan value space)
    val all = (valuePairs ++ lengthPairs)
      .groupBy { case (_, v) => df.select(v).schema.head.dataType }
      .values.toVector
      .map(pairs => batchedTopK(df, pairs))
      .fold(Map.empty[String, ValueCounter])(_ ++ _)
    (all.collect { case (k, vc) if k.startsWith("v") =>
        k.substring(1) -> vc },
      all.collect { case (k, vc) if k.startsWith("l") =>
        k.substring(1) -> vc })
  }

  /** ONE bounded top-K job for a batch of same-typed (key, value)
    * columns: explode-struct groupBy, then a two-stage window (a
    * salted pre-rank bounds any single reducer task, the final
    * per-key rank sorts at most 64·K rows per column). Callers must
    * pass type-homogeneous pairs (struct arrays demand it).
    */
  private def batchedTopK(df: DataFrame,
                          pairs: Vector[(String, Column)])
      : Map[String, ValueCounter] = {
    if (pairs.isEmpty) return Map.empty
    import org.apache.spark.sql.expressions.Window
    val order = Seq(col("n").desc, col("v").asc_nulls_first)
    val w1 = Window
      .partitionBy(col("k"), pmod(hash(col("v")), lit(64)))
      .orderBy(order: _*)
    val w2 = Window.partitionBy(col("k")).orderBy(order: _*)
    val rows = df
      .select(explode(array(pairs.map { case (k, v) =>
        struct(lit(k).as("k"), v.as("v")) }: _*)).as("e"))
      .where(col("e.v").isNotNull)
      .groupBy(col("e.k").as("k"), col("e.v").as("v"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r1", row_number().over(w1))
      .where(col("r1") <= sampleTopK)
      .withColumn("r", row_number().over(w2))
      .where(col("r") <= sampleTopK)
      .collect()
    rows.groupBy(_.getAs[String]("k")).map { case (k, rs) =>
      k -> ValueCounter(rs.map(r =>
        (normalize(r.get(1)): Any) -> r.getAs[Long]("n")).toMap)
    }
  }

  // --------------------------------------------------- summary planning

  /** Decide an over-cap column's representation from the pass-1 witness
    * counts alone — the reference ladder (analyzer.py:598-740) as
    * threshold tests over pre-computed conditional aggregates. Returns
    * the aggregation plan; no Spark jobs are launched here.
    */
  private def planSummary(leaf: Leaf, row: Row, total: Long,
                          jsonDepth: Int): Option[SummaryPlan] = {
    val id = leaf.id
    val cnt = row.getAs[Long](s"${id}__cnt")
    if (cnt == 0) return None
    if (total > 0 && (total - cnt).toDouble / total > config.nullThreshold)
      return None
    val c = leaf.col
    leaf.dataType match {
      case BooleanType =>
        Some(SummaryPlan(leaf, c.cast(LongType), numeric = true, cnt,
          needLengths = false, lengthsExact = false, needPattern = false,
          ctx => SBool(ctx.values)))
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
        Some(SummaryPlan(leaf, c, numeric = true, cnt,
          needLengths = false, lengthsExact = false, needPattern = false,
          ctx => tree.matchPossibleDateTime(SInt(ctx.values))))
      case DoubleType | FloatType | _: DecimalType =>
        Some(SummaryPlan(leaf, c.cast(DoubleType), numeric = true, cnt,
          needLengths = false, lengthsExact = false, needPattern = false,
          ctx => tree.matchPossibleDateTime(SFloat(ctx.values))))
      case TimestampType | TimestampNTZType | DateType =>
        Some(SummaryPlan(leaf, unix_micros(c.cast(TimestampType)),
          numeric = true, cnt,
          needLengths = false, lengthsExact = false, needPattern = false,
          ctx => SDateTime(instantStats(ctx.values))))
      case StringType => planStringSummary(leaf, row, cnt, jsonDepth)
      case _ => None
    }
  }

  /** String plan, with the all-JSON special case: such columns
    * recurse in assembly (spark.read.json) and consult the plan only
    * when the parse turns up corrupt records — so the plan is marked
    * `deferred` and costs nothing in the shared passes.
    */
  private def planStringSummary(leaf: Leaf, row: Row, cnt: Long,
                                jsonDepth: Int)
      : Option[SummaryPlan] = {
    val id = leaf.id
    val p0 = planString0(leaf, row, cnt)
    val jsonW = row.getAs[Long](s"${id}__json")
    val empty = row.getAs[Long](s"${id}__empty")
    val jsonCandidate = parseJsonStrings &&
      jsonDepth < config.maxDepth && jsonW > 0 &&
      jsonW == cnt - empty
    if (jsonCandidate)
      // deferred plans compute their own lengths in their fallback agg
      p0.map(_.copy(deferred = true, lengthsExact = false))
    else p0
  }

  /** The string ladder from witness counts (analyzer.py:642-740). */
  private def planString0(leaf: Leaf, row: Row, cnt: Long)
      : Option[SummaryPlan] = {
    val id = leaf.id
    val c = leaf.col
    val empty = row.getAs[Long](s"${id}__empty")
    val lmin = row.getAs[Int](s"${id}__lmin")
    val lmax = row.getAs[Int](s"${id}__lmax")
    val lengthsExact =
      row.getAs[Long](s"${id}__ladist") <= exactDistinctCap
    if (cnt > 0 && empty.toDouble / cnt > config.emptyThreshold)
      return Some(SummaryPlan(leaf, c, numeric = false, cnt,
        needLengths = true, lengthsExact, needPattern = false,
        ctx => SStr(ctx.values, ctx.lengths(), None)))
    val nonEmpty = cnt - empty
    val bad = math.ceil(cnt * config.badThreshold).toLong
    def ok(witness: Long): Boolean =
      witness > 0 && witness >= nonEmpty - bad

    if (lmax <= config.maxNumericLen) {
      // bools
      TreeAnalyzer.BoolPatterns.zipWithIndex.foreach { case (p, i) =>
        if (ok(row.getAs[Long](s"${id}__b$i")))
          return Some(SummaryPlan(leaf,
            when(lower(trim(c)) === p.split("\\|", -1)(1), 1L)
              .otherwise(0L),
            numeric = true, nonEmpty,
            needLengths = false, lengthsExact = false,
            needPattern = false,
            ctx => SStrRepr(SBool(ctx.values), p)))
      }
      // ints (o, d, x probe order — analyzer.py:63)
      Seq(("o", 8, s"${id}__io"), ("d", 10, s"${id}__id"),
          ("x", 16, s"${id}__ix")).foreach { case (pat, base, key) =>
        if (ok(row.getAs[Long](key))) {
          val conv = base match {
            case 10 => c.try_cast(LongType)
            case _ => conv10(c, base)
          }
          return Some(SummaryPlan(leaf, conv, numeric = true, nonEmpty,
            needLengths = false, lengthsExact = false,
            needPattern = false,
            ctx => {
              val res = SStrRepr(SInt(ctx.values), pat)
              if (pat == "d") promoteSummaryEpoch(res) else res
            }))
        }
      }
      // float
      if (ok(row.getAs[Long](s"${id}__f")))
        return Some(SummaryPlan(leaf, c.try_cast(DoubleType),
          numeric = true, nonEmpty,
          needLengths = false, lengthsExact = false, needPattern = false,
          ctx => promoteSummaryEpoch(SStrRepr(SFloat(ctx.values), "f"))))
      // datetimes
      sparkDateTimeFormats.zipWithIndex.foreach { case ((py, fmt), i) =>
        if (ok(row.getAs[Long](s"${id}__dt$i")))
          return Some(SummaryPlan(leaf,
            unix_micros(try_to_timestamp(c, lit(fmt))),
            numeric = true, nonEmpty,
            needLengths = false, lengthsExact = false,
            needPattern = false,
            ctx => SStrRepr(SDateTime(instantStats(ctx.values)), py)))
      }
    }
    // plain string: lengths + fixed-length CharClass pattern + URL
    val urlAll = row.getAs[Long](s"${id}__url") == cnt
    Some(SummaryPlan(leaf, c, numeric = false, cnt,
      needLengths = true, lengthsExact,
      needPattern = lmin == lmax && lmax > 0 && lmax <= 64,
      ctx => {
        if (ctx.pattern.isEmpty && lmin != lmax && urlAll)
          SURL.fromSummary(ctx.values, ctx.lengths())
        else SStr(ctx.values, ctx.lengths(), ctx.pattern)
      }))
  }

  // ------------------------------------------------ summary agg pass 3

  /** A plan's slice of the single wide summary aggregation: value
    * min/max/count/uniqueness (+ exact positional quartiles for
    * numerics), length stats for strings whose length counter couldn't
    * be batched, and the CharClassAgg buffer for fixed-length patterns.
    */
  private def summaryAggExprs(p: SummaryPlan,
                              pctConsumers: Int): Seq[Column] = {
    val id = p.leaf.id
    val v = p.value
    val base = Seq(
      min(v).as(s"${id}__smn"), max(v).as(s"${id}__smx"),
      count(v).as(s"${id}__scnt"),
      (approx_count_distinct(v) >= (count(v) * 98 / 100))
        .as(s"${id}__suniq"))
    val qs =
      if (p.numeric)
        Seq(quartileExpr(v, p.n, pctConsumers).as(s"${id}__sqs"))
      else Seq.empty
    val len =
      if (p.needLengths && !p.lengthsExact) {
        val lc = length(p.leaf.col).cast(LongType)
        Seq(min(lc).as(s"${id}__slmn"), max(lc).as(s"${id}__slmx"),
          count(lc).as(s"${id}__slcnt"),
          (approx_count_distinct(lc) >= (count(lc) * 98 / 100))
            .as(s"${id}__sluniq"),
          quartileExpr(lc, p.n, pctConsumers).as(s"${id}__slqs"))
      } else Seq.empty
    val pat =
      if (p.needPattern)
        Seq(graft.functions.CharClassAgg.charClasses(p.leaf.col, 64)
          .as(s"${id}__spat"))
      else Seq.empty
    base ++ qs ++ len ++ pat
  }

  /** Exact positional quartiles: percentile at p = k/(n-1) evaluates
    * order statistic x[k] with no interpolation (§1.3 rule: k = n/4,
    * n/2, 3n/4, 0-based int div). Exact percentile holds the group's
    * values in executor memory; past the cap (100 TB territory) degrade
    * to the GK sketch.
    */
  private def quartileExpr(v: Column, n: Long,
                           pctConsumers: Int = 1): Column = {
    val ps = Seq(n / 4, n / 2, 3 * n / 4).map(k =>
      if (n <= 1) 0.0 else k.toDouble / (n - 1))
    // the cap bounds TOTAL buffered rows across all exact-percentile
    // columns sharing one aggregation, not each column independently
    if (n <= exactPctCap / pctConsumers.max(1))
      percentile(v, typedLit(ps))
    else approx_percentile(v.cast(DoubleType), typedLit(ps),
      lit(10000)).cast(ArrayType(DoubleType))
  }

  /** Build a plan's value Stats from the wide summary row + the
    * batched top-K sample (deferred plans — built outside the shared
    * passes — keep their own bounded per-column sample job).
    */
  private def summaryStatsFromRow(df: DataFrame, p: SummaryPlan,
                                  srow: Row,
                                  samples: Map[String, ValueCounter])
      : Stats = {
    val id = p.leaf.id
    val cnt = srow.getAs[Long](s"${id}__scnt")
    val uniq = srow.getAs[Boolean](s"${id}__suniq")
    val mn = normalize(srow.get(srow.fieldIndex(s"${id}__smn")))
    val mx = normalize(srow.get(srow.fieldIndex(s"${id}__smx")))
    val s0 =
      if (!p.numeric)
        // strings over the distinct cap: quartiles pinned to min — a
        // documented scale-mode approximation (the reference would
        // sort the whole sample)
        Stats.summary(cnt, mn, mn, mn, mn, mx, uniq)
      else {
        val qs = srow.getSeq[Double](srow.fieldIndex(s"${id}__sqs"))
        Stats.summary(cnt, mn, qs(0), qs(1), qs(2), mx, uniq)
      }
    // null-filter the sample: parsed representations (try_cast /
    // try_to_timestamp) are null on unparsed rows, and a null group
    // would consume a top-K slot only to be dropped at collection
    if (p.deferred)
      withTopK(df.select(p.value.as("v")).where(col("v").isNotNull),
        col("v"), s0)
    else withSample(s0, samples.get(id))
  }

  /** Attach a batched sample counter to a summary Stats (mirrors
    * [[withTopK]]'s guards: no sample for unique columns, disabled
    * sketch, or an empty counter).
    */
  private def withSample(s: Stats, sample: Option[ValueCounter])
      : Stats =
    sample match {
      case Some(vc) if sampleTopK > 0 && !s.unique && !vc.isEmpty =>
        Stats.summaryWithSample(s.card, s.min, s.q1, s.q2, s.q3,
          s.max, s.unique, vc)
      case _ => s
    }

  /** Length Stats: exact from the batched counter when the length
    * cardinality is under the cap (the common case), else from the
    * wide summary row.
    */
  private def lengthStatsFor(df: DataFrame, p: SummaryPlan, srow: Row,
                             lengthCounters: Map[String, ValueCounter],
                             lengthSamples: Map[String, ValueCounter])
      : Stats = {
    val id = p.leaf.id
    if (p.lengthsExact) {
      val cleaned = lengthCounters.get(id).map(vc =>
        ValueCounter(vc.counts.flatMap {
          case (null, _) => None
          case (k, n) => Some((normalize(k): Any) -> n)
        })).getOrElse(ValueCounter(Map.empty))
      if (cleaned.isEmpty)
        Stats.fromCounter(ValueCounter(Map((0L: Any) -> 1L)))
      else Stats.fromCounter(cleaned)
    } else {
      val cnt = srow.getAs[Long](s"${id}__slcnt")
      val uniq = srow.getAs[Boolean](s"${id}__sluniq")
      val mn = normalize(srow.get(srow.fieldIndex(s"${id}__slmn")))
      val mx = normalize(srow.get(srow.fieldIndex(s"${id}__slmx")))
      val qs = srow.getSeq[Double](srow.fieldIndex(s"${id}__slqs"))
      val s0 = Stats.summary(cnt, mn, qs(0), qs(1), qs(2), mx, uniq)
      if (p.deferred)
        withTopK(df.select(length(p.leaf.col).cast(LongType).as("v"))
          .where(col("v").isNotNull), col("v"), s0)
      else withSample(s0, lengthSamples.get(id))
    }
  }

  private def buildFromPlan(df: DataFrame, p: SummaryPlan, srow0: Row,
                            lengthCounters: Map[String, ValueCounter],
                            valueSamples: Map[String, ValueCounter],
                            lengthSamples: Map[String, ValueCounter])
      : SType = {
    // deferred plans (all-JSON fallbacks) were excluded from the
    // shared summary pass; build their row on demand — one
    // per-column aggregation in the rare corrupt-JSON case only
    val srow =
      if (!p.deferred) srow0
      else {
        val exprs = summaryAggExprs(p, pctConsumers = 1)
        df.agg(exprs.head, exprs.tail: _*).head()
      }
    val values = summaryStatsFromRow(df, p, srow, valueSamples)
    val lengths = () => lengthStatsFor(df, p, srow, lengthCounters,
      lengthSamples)
    val pattern =
      if (!p.needPattern) None
      else {
        val idx = srow.fieldIndex(s"${p.leaf.id}__spat")
        if (srow.isNullAt(idx)) None
        else {
          val classes = srow.getSeq[String](idx).toVector.map(ch =>
            Chars(ch.toSet): CharClass)
          Some(generalizePattern(classes))
        }
      }
    p.build(SummaryCtx(values, lengths, pattern))
  }

  // ------------------------------------------------------ per-field asm

  private def analyzeField(ctx: LevelCtx, path: Vector[String],
                           dt: DataType): SType =
    dt match {
    case s: StructType =>
      // struct = nested record; fields were analyzed in the same pass
      val cnt = ctx.total // struct presence not separately tracked
      val fields = s.fields.toVector.sortBy(_.name).map { f =>
        SDictField(SField(f.name, cnt, optional = false),
          analyzeField(ctx, path :+ f.name, f.dataType))
      }
      SDict(Stats.fromCounter(ValueCounter(Map(
        (s.fields.length.toLong: Any) -> cnt))), fields)
    case ArrayType(et, _) =>
      // lengths + scalar items come from the pass-5 level batches;
      // only struct/nested elements still explode per column (they
      // recurse into full sub-levels of their own)
      val leaf = Leaf(path, dt)
      val lengths = ctx.nestedLengths(leaf.id)
      val itemType = ctx.nestedItems.get(leaf.id + SlotItems) match {
        case Some(t) => t
        case None =>
          val items = ctx.df.select(explode(leaf.col).as("item"))
          analyzeNested(items, et, ctx.jsonDepth)
      }
      SList(lengths, itemType)
    case MapType(kt, vt, _) =>
      val leaf = Leaf(path, dt)
      val c = leaf.col
      val lengths = ctx.nestedLengths(leaf.id)
      val keys = ctx.nestedItems.get(leaf.id + SlotKeys) match {
        case Some(t) => t
        case None => analyzeNested(ctx.df.select(explode(map_keys(c))
          .as("item")), kt, ctx.jsonDepth)
      }
      val values = ctx.nestedItems.get(leaf.id + SlotVals) match {
        case Some(t) => t
        case None => analyzeNested(ctx.df.select(explode(map_values(c))
          .as("item")), vt, ctx.jsonDepth)
      }
      SDict(lengths, Vector(SDictField(keys, values)))
    case other =>
      assembleScalar(ctx, Leaf(path, other))
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

  /** Pass 5a: ONE tagged-explode frame for every scalar slot at a
    * level (array items, map keys, map values). Each source array
    * contributes structs carrying a `__src` tag and its value in its
    * own slot field (null elsewhere); a single `explode(concat(...))`
    * generator unions them, and ONE recursive [[analyzeLevel]] in
    * `srcTagged` mode analyzes every slot through the same O(1)
    * batched passes — where k sibling arrays previously cost k
    * separate explode levels. Aggregates skip the cross-slot nulls,
    * and the per-slot totals from pass 1 keep null-fraction decisions
    * identical to the per-column explode they replace.
    */
  private def analyzeNestedBatch(df: DataFrame,
      slots: Vector[(String, Column, DataType)],
      jsonDepth: Int): Map[String, SType] = {
    if (slots.isEmpty) return Map.empty
    val names = slots.indices.map(i => s"__s$i")
    val structT = StructType(
      StructField("__src", StringType, nullable = false) +:
        slots.zip(names).map { case ((_, _, et), nm) =>
          StructField(nm, et, nullable = true) })
    val arrT = ArrayType(structT)
    val tagged = slots.zipWithIndex.map { case ((_, arr, _), i) =>
      // null source arrays must not null the whole concat
      coalesce(transform(arr, x => struct(
        lit(names(i)).as("__src") +: slots.indices.map { j =>
          (if (j == i) x
           else lit(null).cast(slots(j)._3)).as(names(j))
        }: _*)), array().cast(arrT))
    }
    val merged = df
      .select(explode(
        if (tagged.size == 1) tagged.head
        else concat(tagged: _*)).as("__e"))
      .select(col("__e.__src").as("__src") +:
        names.map(nm => col(s"__e.$nm").as(nm)): _*)
    val dict = analyzeLevel(merged, jsonDepth, srcTagged = true)
    val byName: Map[String, SType] = dict match {
      case d: SDict => d.content.map(f =>
        f.key.asInstanceOf[SField].value.toString -> f.value).toMap
      case _ => Map.empty
    }
    slots.zipWithIndex.map { case ((key, _, _), i) =>
      key -> byName.getOrElse(names(i), SValue(Vector.empty))
    }.toMap
  }

  /** Pass 5b: length Stats for every array/map column at a level in
    * a FIXED number of jobs (previously 2-3 jobs per column via a
    * per-column counter-or-summary): one wide count/distinct/min/max
    * agg, one explode-struct counter job for the under-cap columns,
    * one wide quartile agg for the over-cap ones (exact-percentile
    * buffers share the executor cap across columns, like pass 3),
    * plus the shared bounded top-K job when samples are on.
    */
  private def batchedLengthStats(df: DataFrame,
      cols: Vector[(String, Column)]): Map[String, Stats] = {
    if (cols.isEmpty) return Map.empty
    val names = cols.indices.map(i => s"__n$i").toVector
    val frame = df.select(cols.zip(names).map { case ((_, c), nm) =>
      size(c).cast(LongType).as(nm) }: _*)
    val aggs = names.flatMap(nm => Seq(
      count(col(nm)).as(s"${nm}_cnt"),
      approx_count_distinct(col(nm)).as(s"${nm}_adist"),
      min(col(nm)).as(s"${nm}_min"),
      max(col(nm)).as(s"${nm}_max")))
    val row = frame.agg(aggs.head, aggs.tail: _*).head()
    def cnt(nm: String) = row.getAs[Long](s"${nm}_cnt")
    def adist(nm: String) = row.getAs[Long](s"${nm}_adist")

    val under = names.filter(nm =>
      cnt(nm) > 0 && adist(nm) <= exactDistinctCap)
    val counters: Map[String, ValueCounter] =
      if (under.isEmpty) Map.empty
      else frame
        .select(explode(array(under.map(nm =>
          struct(lit(nm).as("k"), col(nm).as("v"))): _*)).as("e"))
        .where(col("e.v").isNotNull)
        .groupBy(col("e.k").as("k"), col("e.v").as("v"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getAs[String]("k")).map { case (k, rs) =>
          k -> ValueCounter(rs.map(r =>
            (normalize(r.get(1)): Any) -> r.getAs[Long]("c")).toMap)
        }

    val over = names.filter(nm =>
      cnt(nm) > 0 && adist(nm) > exactDistinctCap)
    val overRow: Row =
      if (over.isEmpty) null
      else {
        val oAggs = over.flatMap(nm => Seq(
          quartileExpr(col(nm), cnt(nm), pctConsumers = over.size)
            .as(s"${nm}_qs"),
          (approx_count_distinct(col(nm)) >=
            (count(col(nm)) * 98 / 100)).as(s"${nm}_uniq")))
        frame.agg(oAggs.head, oAggs.tail: _*).head()
      }
    val nonUnique = over.filter(nm =>
      !overRow.getAs[Boolean](s"${nm}_uniq"))
    val samples: Map[String, ValueCounter] =
      if (sampleTopK <= 0 || nonUnique.isEmpty) Map.empty
      else batchedTopK(frame,
        nonUnique.map(nm => nm -> col(nm)).toVector)

    cols.zip(names).map { case ((id, _), nm) =>
      val stats =
        if (cnt(nm) == 0)
          Stats.fromCounter(ValueCounter(Map((0L: Any) -> 1L)))
        else if (under.contains(nm))
          Stats.fromCounter(counters.getOrElse(nm, ValueCounter(
            Map((0L: Any) -> 1L))))
        else {
          val mn = normalize(row.get(row.fieldIndex(s"${nm}_min")))
          val mx = normalize(row.get(row.fieldIndex(s"${nm}_max")))
          val qs = overRow.getSeq[Double](
            overRow.fieldIndex(s"${nm}_qs"))
          val uniq = overRow.getAs[Boolean](s"${nm}_uniq")
          val s0 = Stats.summary(cnt(nm), mn, qs(0), qs(1), qs(2),
            mx, uniq)
          samples.get(nm) match {
            case Some(counter) if !counter.isEmpty =>
              Stats.summaryWithSample(s0.card, s0.min, s0.q1, s0.q2,
                s0.q3, s0.max, s0.unique, counter)
            case _ => s0
          }
        }
      id -> stats
    }.toMap
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

  /** micros-epoch summary Stats → Instant-valued Stats (the approx
    * path yields Double micros).
    */
  private def instantStats(s: Stats): Stats = {
    def toInst(v: Any): Any = v match {
      case m: Long => Instant.ofEpochSecond(
        Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L)
      case d: Double => SType.epochToInstant(d / 1e6)
      case other => other
    }
    Stats.summary(s.card, toInst(s.min), toInst(s.q1), toInst(s.q2),
      toInst(s.q3), toInst(s.max), s.unique)
  }

  /** Build the scalar's SType: exact ladder over the counter when
    * available (reference-faithful), else the pre-planned summary built
    * from the single wide summary pass.
    */
  private def assembleScalar(ctx: LevelCtx, leaf: Leaf): SType = {
    val id = leaf.id
    val row = ctx.row
    val cnt = row.getAs[Long](s"${id}__cnt")
    val total = ctx.totalFor(id)
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
        ctx.jsonDepth < config.maxDepth) {
      val empty = row.getAs[Long](s"${id}__empty")
      val jsonW = row.getAs[Long](s"${id}__json")
      if (jsonW > 0 && jsonW == cnt - empty) {
        val spark = ctx.df.sparkSession
        import spark.implicits._
        val strings = ctx.df.select(leaf.col.as("v"))
          .where(col("v").isNotNull && col("v") =!= "").as[String]
        val parsed = spark.read.json(strings)
        if (!parsed.columns.contains("_corrupt_record"))
          return SStrRepr(analyzeLevel(parsed, ctx.jsonDepth + 1),
            "json")
      }
    }

    ctx.counters.get(id) match {
      case Some(counter0) =>
        val counter = ValueCounter(counter0.counts.flatMap {
          case (null, _) => None
          case (k, v) => Some(normalize(k) -> v)
        })
        if (counter.isEmpty) return SValue(Vector.empty)
        exactLadder(counter, leaf.dataType)
      case None =>
        ctx.plans.get(id) match {
          case Some(p) =>
            buildFromPlan(ctx.df, p, ctx.summaryRow, ctx.lengthCounters,
              ctx.valueSamples, ctx.lengthSamples)
          case None => SValue(Vector.empty)
        }
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

  /** Driver budget for collected counters per level (estimated
    * bytes). Override: SPARK_GRAFT_COUNTER_BYTES.
    */
  def defaultCounterByteBudget: Long =
    sys.env.get("SPARK_GRAFT_COUNTER_BYTES").map(_.toLong)
      .getOrElse(256L * 1024 * 1024)
}
