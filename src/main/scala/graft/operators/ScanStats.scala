package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Metadata-only row counts.
  *
  * Several operators need the corpus row count only to DERIVE a knob
  * (e.g. the LSH bucket width ladder) before building their one real
  * pass. A `df.count()` there costs a full scheduling pass over the
  * corpus — at 100 TB that is hundreds of thousands of tasks spent on
  * a single scalar. When the frame is a bare parquet scan (optionally
  * under row-preserving projections), the exact row count already
  * sits in the parquet footers: read those (KBs per file, driver-side,
  * no job at all) and skip the scan. Anything else — filters, joins,
  * in-memory frames — falls back to a real `count()`.
  *
  * Footer counts are EXACT (parquet writes the row count per
  * file/row-group at commit time), so derived knobs match a SQL
  * oracle's `COUNT(*)` bit-for-bit.
  */
object ScanStats {

  def fastRowCount(df: DataFrame): Long =
    bareParquetRelation(df.queryExecution.optimizedPlan) match {
      case Some(rel) =>
        val conf = df.sparkSession.sessionState.newHadoopConf()
        // parallel footer reads: at 100 TB the file list is large and
        // the per-file work is one small metadata fetch — bound by
        // round-trips, not bandwidth
        import scala.collection.parallel.CollectionConverters._
        rel.location.inputFiles.par.map { f =>
          val r = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f), conf))
          try r.getRecordCount finally r.close()
        }.sum
      case None => df.count()
    }

  /** Repartition a frame to the session's shuffle width when it
    * plans FEWER partitions — the guide-§2.5 fix for narrow inputs
    * (locally: a single small parquet file splits into a handful of
    * tasks; at scale: a few huge unsplittable files): CPU-heavy
    * per-row work downstream (shingling, md5, signatures) otherwise
    * runs at the scan's split count no matter how many cores sit
    * idle. A frame already at or above the width passes through
    * untouched — a splittable 100 TB scan plans orders of magnitude
    * more partitions than the width, so this is a no-op there by
    * construction. Streaming frames pass through (no RDD to inspect
    * mid-plan). Results are partition-independent (the
    * partition-invariance sweep pins every query), so widening never
    * changes an answer.
    */
  def widen(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val width =
        try df.sparkSession.conf
          .get("spark.sql.shuffle.partitions").toInt
      catch { case _: Throwable => 200 }
      // deliberately NOT capped by estimated bytes: widen exists for
      // CPU-heavy per-row work (shingling, md5, signatures) where
      // byte counts say nothing about cost, and it only ever goes to
      // session width. The r14 micro-task pathology (32-core runs
      // losing to 8-core) came from the bench's constant 64 KB scan
      // SPLITS — fixed at the source by the scale-adaptive
      // BenchSplit sizing, not here.
      val n =
        try df.rdd.getNumPartitions
        catch { case _: Throwable => width }
      if (n < width) df.repartition(width) else df
    }

  /** The relation iff `plan` is a parquet scan under nothing but
    * row-count-preserving projections (no filters, joins, generators).
    */
  private def bareParquetRelation(
      plan: LogicalPlan): Option[HadoopFsRelation] = plan match {
    case Project(_, child) => bareParquetRelation(child)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation
          if h.fileFormat.isInstanceOf[ParquetFileFormat] => Some(h)
      case _ => None
    }
    case _ => None
  }
}
