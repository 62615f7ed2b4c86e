package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does a union of two persisted frames hit their caches
  * inside a broadcast-join plan?
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cyc = spark.read.parquet("/tmp/graft_fold_probe/cycle")
    val base = cyc.select(col("src"), col("dst"))
    val delta = cyc.where(pmod(col("supp"), lit(100)) === 0)
      .select(col("src"), col("dst"))
    val dec = "decimal(38,0)"
    def withW(df: org.apache.spark.sql.DataFrame) =
      df.select(col("src"), col("dst"),
        when(lit(1L).cast(dec) > 0, lit(1L).cast(dec))
          .otherwise(raise_error(lit("x")).cast(dec)).as("w"))
    val eOld = withW(base).repartition(4, col("src")).persist()
    val eDelta = withW(delta).repartition(4, col("src")).persist()
    val eNew = eOld.unionAll(eDelta)
    eNew.count() // materialize
    val hop = delta.select(col("src").as("__f")).distinct()
      .localCheckpoint(true)
    val j = eNew.join(broadcast(hop), eNew("src") === col("__f"))
      .select(eNew("dst").as("node")).distinct()
    j.explain("formatted")
    spark.stop()
  }
}
