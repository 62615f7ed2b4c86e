package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DateType,
  IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Temporal operators over event streams: as-of joins (latest-state
  * lookup) and gap-based sessionization — the feature-engineering
  * steps an events table feeds at training-pipeline scale.
  *
  * Both are single-shuffle window shapes: one hash exchange on the
  * key, one per-key time sort, no range explosion and no per-row
  * probing. A pathologically hot key serializes into one task's sort
  * (the same bound as any keyed window); [[asOfJoin]]'s `timeBuckets`
  * option restores parallelism for hot keys by pre-splitting each key
  * into coarse time buckets and stitching the boundary state, at the
  * cost of one pre-flight min/max action.
  */
object Temporal {

  private val asOfTempCols =
    Seq("__ts", "__side", "__l", "__r", "__m", "__rts", "__bkt")

  private def integralType(dt: DataType) =
    dt == LongType || dt == IntegerType || dt == ShortType ||
      dt == ByteType

  private def timestampLike(dt: DataType) =
    dt == TimestampType || dt == TimestampNTZType

  /** Exact epoch-microseconds for a timestamp column.
    *
    * TIMESTAMP is an instant: `unix_micros` reads it directly.
    * TIMESTAMP_NTZ is a wall clock with no instant semantics —
    * `unix_micros` rejects it and a cast through TIMESTAMP would
    * shift by the session timezone (and mis-round inside DST gaps).
    * Instead the epoch value is derived purely from the datetime
    * FIELDS (the UTC interpretation of the wall clock): day count ×
    * 86.4e9 + time-of-day micros, all exact integer/decimal
    * arithmetic, independent of `spark.sql.session.timeZone`. Stays
    * codegen'd — every piece is a built-in datetime expression.
    */
  private def tsMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    case TimestampNTZType =>
      datediff(c.cast(DateType), to_date(lit("1970-01-01")))
        .cast(LongType) * lit(86400000000L) +
        hour(c).cast(LongType) * lit(3600000000L) +
        minute(c).cast(LongType) * lit(60000000L) +
        // date_part SECOND is DECIMAL(8,6) incl. the fraction:
        // ×1e6 and the long cast are exact
        (date_part(lit("SECOND"), c) * lit(1000000L)).cast(LongType)
    case other => throw new IllegalArgumentException(
      s"expected a timestamp column, got $other")
  }

  /** The column as an integral number in its native unit: integral
    * columns pass through; TIMESTAMP / TIMESTAMP_NTZ convert to
    * epoch microseconds (monotonic, so ordering is preserved).
    */
  private def tsNumeric(df: DataFrame, c: String): Column = {
    val dt = df.schema(c).dataType
    if (integralType(dt)) df(c) else tsMicros(df(c), dt)
  }

  /** As-of join: for each left row, the single most recent right row
    * with the same key and `rightTs` ≤ `leftTs` (inclusive). The
    * classic "state at event time" lookup — last price at trade time,
    * last purchase before a page view — that Spark has no built-in
    * operator for and a naive inequality join turns into a per-key
    * cross product.
    *
    * Implementation is the union-window form: tag rows by side, union
    * into one frame, and take `last(right_payload, ignoreNulls)` over
    * a (key, ts, side) window with right rows sorting before left
    * rows at equal timestamps (inclusive match). One shuffle, one
    * sort, output width = left + right payload; the right side is
    * never re-scanned per left row. Equivalent to SQL ASOF JOIN
    * (DuckDB/QuestDB semantics: `l.key = r.key AND l.ts >= r.ts`,
    * latest match wins, unmatched left rows keep nulls).
    *
    * Null semantics follow the SQL predicate exactly: a null key
    * never matches (right rows with any null key are dropped; left
    * rows with a null key pass through unmatched — plain `=`, not
    * null-safe `<=>`). Right rows with a null timestamp never match;
    * left rows with a null timestamp match nothing. If several right
    * rows share (key, ts), which one wins is tie-broken only by the
    * window order — pre-aggregate the right side to unique (key, ts)
    * for deterministic output (SQL ASOF has the same caveat).
    *
    * @param tolerance max allowed `leftTs - rightTs` in the columns'
    *   native unit — integral columns compare as-is, TIMESTAMP /
    *   TIMESTAMP_NTZ columns in microseconds; matches older than
    *   this null out.
    * @param timeBuckets split each key's window into this many coarse
    *   time buckets (integral or timestamp columns — timestamps
    *   bucket on epoch micros). The per-(key, bucket)
    *   windows carry the latest right row from earlier buckets as a
    *   stitched boundary state row, so one hot key sorts in parallel
    *   across `timeBuckets` tasks instead of serializing into one.
    *   Costs one pre-flight min/max action over the column-pruned
    *   union; results are identical to the unbucketed form. 1 = off.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               tolerance: Option[Long] = None,
               timeBuckets: Int = 1): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(timeBuckets >= 1, s"timeBuckets must be >= 1: $timeBuckets")
    val payload = right.columns
      .filterNot(keys.contains).filterNot(_ == rightTs).toSeq
    require(payload.nonEmpty, "right side has no payload columns")
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right payload collides with left columns: $collisions")
    val tempHits = asOfTempCols.toSet
      .intersect((left.columns ++ right.columns).toSet)
    require(tempHits.isEmpty,
      s"input columns collide with as-of temp names: $tempHits")
    val lTsType = left.schema(leftTs).dataType
    val rTsType = right.schema(rightTs).dataType
    // tolerance / bucketing do arithmetic on the ts values, so those
    // paths normalize timestamps to epoch-micros longs (monotonic —
    // the window order is unchanged); the plain path keeps the native
    // type, which only ever needs ordering
    val numericMode = tolerance.isDefined || timeBuckets > 1
    if (numericMode)
      // BOTH integral (same caller-defined unit) or the SAME
      // timestamp type: integral-vs-timestamp would silently compare
      // raw units against epoch micros, and TIMESTAMP-vs-NTZ would
      // skew by the session timezone (instant vs wall-clock epochs)
      require(
        (integralType(lTsType) && integralType(rTsType)) ||
          (timestampLike(lTsType) && lTsType == rTsType),
        "tolerance/timeBuckets need ts columns both integral or " +
          s"both the same timestamp type, got $lTsType/$rTsType")
    val lTsCol =
      if (numericMode && timestampLike(lTsType))
        tsMicros(left(leftTs), lTsType)
      else left(leftTs)
    val rTsCol =
      if (numericMode && timestampLike(rTsType))
        tsMicros(right(rightTs), rTsType)
      else right(rightTs)

    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val rStruct = struct(
      (rTsCol.as("__rts") +: payload.map(right(_))): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    val leftU = left.select(
      keys.map(left(_)) ++ Seq(lTsCol.as("__ts"),
        lit(1).as("__side"), lStruct.as("__l"),
        lit(null).cast(rType).as("__r")): _*)
    // a null key never matches (plain `=` semantics): null-key right
    // rows are dropped here, so the window partition a null-key LEFT
    // row lands in contains no right rows and it passes through
    // unmatched — without this filter, partitionBy would group null
    // keys together and match them against each other
    val rightU = right
      .where(right(rightTs).isNotNull &&
        keys.map(right(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(right(_)) ++ Seq(rTsCol.as("__ts"),
          lit(0).as("__side"), lit(null).cast(lType).as("__l"),
          rStruct.as("__r")): _*)

    val (unioned, partCols) =
      if (timeBuckets == 1) (leftU.unionByName(rightU), keys)
      else (bucketStitch(leftU, rightU, keys, timeBuckets),
        keys :+ "__bkt")

    // right (__side 0) sorts before left (__side 1) at equal ts, so
    // the running last() makes the match inclusive; null left ts
    // sorts first (nulls-first asc) and therefore sees no right rows
    // (boundary-state rows from bucket stitching use __side -1 with a
    // null ts, but live in non-null bucket partitions that no null-ts
    // left row ever joins)
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val matched = tolerance match {
      case Some(tol) => matchedRaw.withColumn("__m",
        when(col("__m.__rts") >= col("__ts") - lit(tol), col("__m")))
      case None => matchedRaw
    }
    matched.select(
      leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        payload.map(c => col(s"__m.`$c`").as(c)): _*)
  }

  /** The hot-key pre-split: assign every row a coarse time bucket
    * (equal-width over the observed ts range) and stitch each
    * (key, bucket) with ONE boundary-state row — the latest right row
    * from all earlier buckets, tagged `__side = -1` with a null ts so
    * it sorts before everything real in the bucket. The carry
    * derivation windows over at most 2·timeBuckets slim rows per key
    * (one per-bucket right summary + one per-bucket left marker), so
    * no step re-introduces a full per-key sort.
    */
  private def bucketStitch(leftU: DataFrame, rightU: DataFrame,
                           keys: Seq[String],
                           timeBuckets: Int): DataFrame = {
    val u = leftU.unionByName(rightU)
    // pre-flight bounds: one action over a column-pruned projection
    // (cast to long so narrower integral ts types read back uniformly)
    val bounds = u.agg(min(col("__ts").cast("long")).as("mn"),
      max(col("__ts").cast("long")).as("mx")).head()
    if (bounds.isNullAt(0))
      // no non-null timestamps anywhere: every row lands in the null
      // bucket and matches nothing, same as the unbucketed form
      return u.withColumn("__bkt", lit(null).cast("long"))
    val mn = bounds.getLong(0)
    val mx = bounds.getLong(1)
    val width = math.max(1L, (mx - mn) / timeBuckets + 1L)
    // exact integral floor division (operands are non-negative):
    // `/` on longs routes through a double, which mis-rounds once a
    // nano-timestamp range passes 2^53
    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("__bkt",
        expr(s"(CAST(__ts AS BIGINT) - ${mn}L) div ${width}L"))

    val lB = withBucket(leftU)
    val rB = withBucket(rightU)
    // per-(key, bucket) latest right row (rows are unique per (key,
    // ts) up to the documented tie caveat, so max_by is the window's
    // last()); left markers record which buckets need a carry
    val lb = rB.groupBy((keys.map(col) :+ col("__bkt")): _*)
      .agg(max_by(col("__r"), col("__ts")).as("__lr"),
        lit(1).as("__tag"))
    val needed = lB.where(col("__ts").isNotNull)
      .select((keys.map(col) :+ col("__bkt")): _*).distinct()
      .withColumn("__lr",
        lit(null).cast(lb.schema("__lr").dataType))
      .withColumn("__tag", lit(0))
    // carry-in for a marker at bucket b = last per-bucket right
    // summary at any bucket < b (markers sort before summaries within
    // a bucket, so the running last() never sees the same bucket's
    // own right rows)
    val wc = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__bkt").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = needed.unionByName(lb)
      .withColumn("__carry",
        last(col("__lr"), ignoreNulls = true).over(wc))
      .where(col("__tag") === 0 && col("__carry").isNotNull)
      .select(keys.map(col) ++ Seq(
        lit(null).cast(lB.schema("__ts").dataType).as("__ts"),
        lit(-1).as("__side"),
        lit(null).cast(lB.schema("__l").dataType).as("__l"),
        col("__carry").as("__r"), col("__bkt")): _*)
    lB.unionByName(rB).unionByName(carries)
  }

  /** Interval (range) join: every left row paired with every right
    * interval of the same key containing its timestamp —
    * `l.key = r.key AND r.start <= l.ts <= r.end`, both bounds
    * inclusive. The "which windows does this event fall in" primitive
    * (ad attribution, maintenance windows, session enrichment) that a
    * naive theta-join plans as a per-key cross product (or a
    * BroadcastNestedLoopJoin that dies when neither side is small).
    *
    * Scale shape: quantize time into `bucketWidth`-wide buckets;
    * each interval explodes to the buckets it overlaps, each left row
    * belongs to exactly ONE bucket, and the join becomes a plain
    * (key, bucket) equi-join + residual bounds filter — shuffled,
    * partial-aggregated, AQE-skew-handled like any hash join, never
    * corpus × corpus. Because a left row meets an interval only in
    * the left row's own bucket, no pair dedup step is needed.
    * Truncating division is monotonic, so coverage holds for negative
    * timestamps too.
    *
    * Guard: one column-pruned pre-flight action prices the explosion
    * (max buckets an interval spans) and REFUSES past
    * `maxBucketsPerInterval` with a pointer to a wider `bucketWidth`
    * — a mis-sized width multiplies the right side silently
    * otherwise. Degenerate (end < start) and null-key/null-bound
    * intervals match nothing; null-ts left rows match nothing (the
    * SQL predicate's semantics).
    *
    * @param bucketWidth bucket size in the columns' native unit —
    *   integral columns bucket as-is, TIMESTAMP / TIMESTAMP_NTZ
    *   columns bucket on epoch MICROSECONDS; choose ~ the typical
    *   interval span, so intervals explode to a handful of buckets.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTs: String, startCol: String, endCol: String,
                bucketWidth: Long,
                maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(bucketWidth > 0, s"bucketWidth must be > 0: $bucketWidth")
    val collisions = right.columns.toSet.intersect(left.columns.toSet)
      .diff(keys.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left columns: $collisions")
    val tempHits = Set("__bkt", "__tsn", "__sn", "__en")
      .intersect((left.columns ++ right.columns).toSet)
    require(tempHits.isEmpty,
      s"input columns collide with range-join temp names: $tempHits")
    val boundTypes = Seq(left.schema(leftTs).dataType,
      right.schema(startCol).dataType, right.schema(endCol).dataType)
    // all integral, or all the SAME timestamp type: mixing TIMESTAMP
    // (instant epoch) with TIMESTAMP_NTZ (wall-clock epoch) would
    // skew the comparison by the session timezone offset
    require(boundTypes.forall(integralType) ||
      (timestampLike(boundTypes.head) &&
        boundTypes.forall(_ == boundTypes.head)),
      "range join needs ts/start/end columns all integral " +
        "(bucketWidth in the column unit) or all the same timestamp " +
        s"type (bucketWidth in microseconds), got $boundTypes")

    // `div` (exact integral floor-toward-zero division; `/` on longs
    // routes through a double and mis-rounds past 2^53)
    def bucketOf(c: String): Column = expr(s"`$c` div ${bucketWidth}L")

    val r = right.where(
      keys.map(right(_).isNotNull).reduce(_ && _) &&
        right(startCol).isNotNull && right(endCol).isNotNull &&
        right(endCol) >= right(startCol))
    val rr = r.select(col("*"),
      tsNumeric(r, startCol).cast(LongType).as("__sn"),
      tsNumeric(r, endCol).cast(LongType).as("__en"))

    // pre-flight explosion pricing over a two-column projection
    val worst = rr
      .agg(max(bucketOf("__en") - bucketOf("__sn") + lit(1L)))
      .head()
    val maxSpan = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(maxSpan <= maxBucketsPerInterval,
      s"an interval spans $maxSpan buckets of width $bucketWidth " +
        s"(> maxBucketsPerInterval = $maxBucketsPerInterval): raise " +
        "bucketWidth toward the typical interval span, or raise the " +
        "cap if the explosion is priced in")

    val rb = rr.withColumn("__bkt",
        explode(sequence(bucketOf("__sn"), bucketOf("__en"))))
      .drop("__sn", "__en")
    val lf = left.where(left(leftTs).isNotNull &&
      keys.map(left(_).isNotNull).reduce(_ && _))
    val lb = lf.select(col("*"),
        tsNumeric(lf, leftTs).cast(LongType).as("__tsn"))
      .withColumn("__bkt", bucketOf("__tsn"))
      .drop("__tsn")
    lb.join(rb, keys :+ "__bkt")
      .where(col(leftTs) >= col(startCol) &&
        col(leftTs) <= col(endCol))
      .drop("__bkt")
  }

  /** Gap-based sessionization: per key, a new session starts at the
    * first event and whenever the gap since the previous event
    * exceeds `gap` (same units as `ts`: the column's own unit for an
    * integral column — e.g. nanos for a long-nanos events table —
    * and MICROSECONDS for TIMESTAMP / TIMESTAMP_NTZ columns, which
    * are compared via an exact epoch-micros conversion). Adds a
    * 0-based `session`
    * index per key; every input column passes through. Deterministic
    * given unique (key, ts) pairs — and the per-key session COUNT is
    * deterministic even with ties, since tied timestamps always gap
    * by zero.
    *
    * Single-shuffle window shape: the running sum depends on `lag`'s
    * output, so they plan as two Window execs — but both share the
    * same (key) partitioning and (key, ts) order, so the second
    * pipelines over the first's sorted output: sessionizing a
    * trillion-event table still costs exactly one exchange + one
    * per-key sort (ExplainAudit pins 1 hash exchange, 1 sort).
    */
  def sessionize(df: DataFrame, key: String, ts: String,
                 gap: Long): DataFrame = {
    require(gap >= 0, s"gap must be non-negative: $gap")
    require(!df.columns.contains("session"),
      "input already has a 'session' column")
    val tsType = df.schema(ts).dataType
    val tsNum = tsType match {
      case t if timestampLike(t) => tsMicros(col(ts), t)
      case t if integralType(t) => col(ts)
      case other => throw new IllegalArgumentException(
        s"sessionize needs an integral or timestamp ts column, got " +
          s"$other — cast explicitly to define the gap unit")
    }
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc)
    val prev = lag(tsNum, 1).over(w)
    val isNew = when(prev.isNull ||
      tsNum - prev > lit(gap), 1L).otherwise(0L)
    df.withColumn("session",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - lit(1L))
  }

  /** CDC / changelog compaction: keep each key's LATEST row — the
    * "current snapshot" materialization every incrementally-ingested
    * 100 TB table needs nightly.
    *
    * Implemented as a single `max(struct(ts, tiebreak, row))`
    * aggregation, NOT a row_number window: the aggregate combines
    * map-side (each input partition contributes one candidate per
    * key), so the shuffle carries one row per distinct key per
    * partition instead of the full changelog, and no per-key sort is
    * ever materialized. Struct comparison is lexicographic, so
    * `tiebreak` (e.g. a monotone change-id) makes the winner total —
    * deterministic across partitionings and engines even with tied
    * timestamps.
    *
    * `ts` may be integral, TIMESTAMP, or TIMESTAMP_NTZ — comparison
    * is order-preserving for all three, no unit arithmetic happens.
    * Returns the input schema, one row per key.
    */
  def compactLatest(df: DataFrame, key: String, ts: String,
                    tiebreak: String): DataFrame = {
    val rowCols = df.columns.toIndexedSeq.map(c => col(c).as(c))
    df.groupBy(col(key).as("__k"))
      .agg(max(struct(col(ts).as("__ts"), col(tiebreak).as("__tb"),
        struct(rowCols: _*).as("__row"))).as("__m"))
      .select(col("__m.__row.*"))
  }

  /** EXACT sliding-window active users (the 7-day-active metric) —
    * without a window sort and without the double-counting that
    * summing daily uniques gives. Shape: collapse to distinct
    * (day, user) with per-pair event counts (one keyed aggregation
    * — the 100 TB stream becomes at most users × active-days rows),
    * then each pair fans out to the `windowDays` target days it
    * contributes to (a bounded `windowDays`× explode, NOT a range
    * self-join), and one keyed count-distinct per target day
    * finishes it. Target days past the data's max day are trimmed
    * via a broadcast 1-row max.
    */
  def slidingActiveUsers(df: DataFrame, day: Column, user: Column,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays >= 1: $windowDays")
    val base = df.select(day.as("__d"), user.as("__u"))
      .where(col("__d").isNotNull && col("__u").isNotNull)
      .groupBy(col("__d"), col("__u"))
      .agg(count(lit(1)).as("__cnt"))
    val maxDay = base.agg(max(col("__d")).as("__maxday"))
    base
      .select(explode(expr(
          s"sequence(__d, __d + ${windowDays - 1}L)")).as("day"),
        col("__u"), col("__cnt"))
      .crossJoin(broadcast(maxDay))
      .where(col("day") <= col("__maxday"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__u")).as("active_users"),
        sum(col("__cnt")).cast("long").as("n_events"))
  }

  /** Burst detection — the ops-monitoring anomaly rule, exact at any
    * scale: per (key, day) count, a day is a BURST when its count
    * beats `num/den` × the trailing-`windowDays`-OBSERVED-day mean
    * by integer cross-multiplication (`n·w_cnt·den > num·w_sum`),
    * with at least `minHistory` observed days of history (partial
    * histories never alarm). Row-based trailing window = previous
    * observed days, so silent (zero-count) days neither alarm nor
    * pad the baseline.
    *
    * Shape: one keyed aggregation builds the (key, day, n) frame —
    * DAYS-sized, corpus-size-independent — then one keyed window
    * over it. Returns the per-day frame with `burst`; census
    * downstream is the caller's.
    */
  def burstDays(df: DataFrame, key: Column, day: Column,
                windowDays: Int = 7, num: Long = 2L, den: Long = 1L,
                minHistory: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays >= 1 && num > 0 && den > 0 && minHistory >= 1)
    val daily = df.groupBy(key.as("key"), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("day").asc).rowsBetween(-windowDays, -1)
    daily
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_cnt", count(col("n")).over(w))
      .withColumn("burst", col("w_cnt") >= minHistory &&
        col("n") * col("w_cnt") * den > col("w_sum") * num)
  }

  /** Time-decayed counts — recency-weighted popularity ("what's hot
    * in the corpus NOW"), the feedback signal source/domain mixture
    * tuning runs nightly. Half-life decay, made EXACT: an event
    * `age` days old (relative to the newest event, derived in-plan)
    * contributes weight `2^-(age div halfLifeDays)` — step-wise
    * dyadic decay, so the per-key sum is an exact BIGINT at scale
    * `2^H` (`H = horizonDays div halfLifeDays`; older events are
    * cut). The reported `score` divides by `2^H` at the very end —
    * division by a power of two only changes the exponent, so even
    * the double is EXACT and engine-independent (no transcendental
    * decay exponentials, no order-dependent float sums).
    *
    * Shape: one 1-row max-day aggregate broadcast over the scan,
    * one keyed count/sum with map-side partials. `day` is any
    * integral day-bucket expression (pair with the caller's epoch
    * day convention, which handles the ts dtype).
    */
  def decayedCounts(df: DataFrame, day: Column, key: Column,
                    halfLifeDays: Int = 7,
                    horizonDays: Int = 63): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays >= 1: $halfLifeDays")
    require(horizonDays >= halfLifeDays,
      s"horizonDays >= halfLifeDays: $horizonDays")
    val h = horizonDays / halfLifeDays
    val maxDay = df.agg(max(day).as("__maxday"))
    df.select(key.as("key"), day.as("__day"))
      .crossJoin(broadcast(maxDay))
      .select(col("key"),
        // ages are non-negative (maxday is the max), so truncation
        // == floor; DIV keeps the arithmetic integral end to end
        expr(s"(__maxday - __day) DIV ${halfLifeDays}L")
          .cast("long").as("__hl"))
      .where(col("__hl") >= 0L && col("__hl") <= h.toLong)
      .select(col("key"),
        expr(s"shiftleft(CAST(1 AS BIGINT), " +
          s"CAST($h - __hl AS INT))").as("__w"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__w")).cast("long").as("score_scaled"))
      .withColumn("score",
        col("score_scaled").cast("double") / lit(math.pow(2.0, h)))
  }

  /** Per-entity event-transition census (the first-order Markov
    * view of behavior streams — session modeling, funnel discovery,
    * anomalous-sequence triage): for each entity, consecutive event
    * pairs under a total per-entity order, counted corpus-wide.
    * `orderBy` must be a TOTAL order per entity (pass a tie-break
    * column — e.g. (ts, event_id) — or replays can disagree).
    *
    * Returns `(prev, next, n)` over one keyed window (single hash
    * exchange + per-entity sort; the window never sees more than
    * one entity's rows) + one keyed count.
    */
  def transitionCensus(df: DataFrame, entity: Column, event: Column,
                       orderBy: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(orderBy.nonEmpty, "need a per-entity total order")
    val w = Window.partitionBy(col("__e")).orderBy(orderBy: _*)
    df.select(entity.as("__e") +: event.as("next") +: orderBy: _*)
      .withColumn("prev", lag(col("next"), 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("n"))
  }

  /** Exact least-squares trend over per-(key, day) counts — the
    * "is this metric growing" number, reported as an EXACT RATIONAL
    * so two engines agree bit-for-bit (no division at all): the OLS
    * slope over points (x = day, y = count(day)) is
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) = num / den
    *
    * and the census carries `(num, den, direction)` with
    * direction = sign(num) (den > 0 whenever the key has ≥ 2
    * distinct days; a single-day key reports den = 0 and 'flat').
    * Sums run in DECIMAL(38,0): x is an epoch day (~2·10^4), so
    * n·Σx² stays exact far past 10^9 daily rows per key.
    *
    * Shape: one keyed (key, day) count + one keyed sum — two
    * aggregations, no windows, no joins.
    */
  def trendFit(df: DataFrame, key: Column, day: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // the exact rationals are computed in DECIMAL(38,0) but reported
    // as BIGINT; under non-ANSI Spark an overflowing cast yields
    // silent NULLs while the DuckDB HUGEINT→BIGINT replay errors —
    // so the cast is range-guarded in-plan (fail-fast, loudly, in
    // BOTH engines' replay: num ≈ n²·cov can pass 2^63 at ~10^9
    // rows/day over years)
    def checkedLong(c: Column, what: String): Column =
      when(abs(c) <= lit(Long.MaxValue).cast(dec), c.cast("long"))
        .otherwise(raise_error(lit(s"trendFit: $what exceeds BIGINT " +
          "range — report the rational in DECIMAL instead"))
          .cast("long"))
    val daily = df.groupBy(key.as("key"), day.cast(dec).as("x"))
      .agg(count(lit(1)).cast(dec).as("y"))
    daily.groupBy(col("key"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("sx"),
        sum(col("y")).cast(dec).as("sy"),
        sum(col("x") * col("y")).cast(dec).as("sxy"),
        sum(col("x") * col("x")).cast(dec).as("sxx"))
      .select(col("key"),
        col("n").cast("long").as("n_days"),
        checkedLong(col("sy"), "n_rows").as("n_rows"),
        checkedLong(col("n") * col("sxy") - col("sx") * col("sy"),
          "num").as("num"),
        checkedLong(col("n") * col("sxx") - col("sx") * col("sx"),
          "den").as("den"),
        when(col("n") * col("sxy") > col("sx") * col("sy"), "up")
          .when(col("n") * col("sxy") < col("sx") * col("sy"),
            "down")
          .otherwise("flat").as("direction"))
  }
}
