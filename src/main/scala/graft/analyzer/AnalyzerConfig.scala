package graft.analyzer

import java.time.Instant
import java.time.temporal.ChronoUnit

/** Analyzer tuning knobs with the reference's defaults
  * (structa analyzer.py:177-185, ui/cli.py:96-226).
  *
  * Thresholds are fractions in [0,1]; timestamps are epoch-second
  * doubles in the configured epoch units.
  */
final case class AnalyzerConfig(
    badThreshold: Double = 0.02,
    emptyThreshold: Double = 0.98,
    nullThreshold: Double = 0.98,
    fieldThreshold: Int = 20,
    mergeThreshold: Double = 0.5,
    maxNumericLen: Int = 30,
    /** Beyond-reference hardening (SURVEY §7.6 watch item): recursion
      * depth cap on unbounded/variant nesting — levels deeper than
      * this collapse to the ⊤ type instead of recursing (the
      * reference would recurse until the Python stack gives out).
      */
    maxDepth: Int = 100,
    stripWhitespace: Boolean = false,
    minTimestampOpt: Option[Double] = None,
    maxTimestampOpt: Option[Double] = None,
    /** Seconds offset of the numeric-datetime epoch from the UNIX
      * epoch (Excel's is -2209161600: 1899-12-30).
      */
    timestampOffset: Double = 0.0,
    /** Seconds per unit of numeric datetimes (86400 for day counts). */
    timestampScale: Double = 1.0,
    /** Beyond-reference: also probe milli/micro/nano-second epochs in
      * the numeric-datetime heuristic (the reference only checks the
      * configured unit). Off by default for reference fidelity.
      */
    extendedEpochUnits: Boolean = false,
    /** "now" used for the ±(20y,10y) plausible-timestamp window; fixed
      * at construction for determinism (analyzer.py:196-206).
      */
    now: Instant = Instant.now()) {

  /** Window bounds in *scaled* units (analyzer.py:199-206). The Opt
    * overrides (CLI --min/max-timestamp) are RAW epoch seconds; the
    * default window is now∓(20y,10y).
    */
  val minTimestamp: Double = (minTimestampOpt.getOrElse(
    now.minus(20 * 365, ChronoUnit.DAYS).toEpochMilli / 1000.0) -
      timestampOffset) / timestampScale
  val maxTimestamp: Double = (maxTimestampOpt.getOrElse(
    now.plus(10 * 365, ChronoUnit.DAYS).toEpochMilli / 1000.0) -
      timestampOffset) / timestampScale
}
