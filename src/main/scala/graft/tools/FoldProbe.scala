package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing probe for the q174 fold path (dev tool, not part of
  * the query surface): times each phase of the shipment-cycle fold so
  * regressions are attributable to a phase, not a total.
  */
object FoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job timing: jobId, duration, #tasks — attributes the fold's
    // wall time to scheduler round-trips vs real work
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val sites =
          new java.util.concurrent.ConcurrentHashMap[Int, String]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart)
            : Unit = {
          jobStarts.put(js.jobId, (System.nanoTime(),
            js.stageInfos.map(_.numTasks).sum))
          sites.put(js.jobId,
            js.stageInfos.map(si => si.name.takeWhile(_ != '(')
              .trim + ":" + si.numTasks).mkString(" | "))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd)
            : Unit = {
          val v = jobStarts.remove(je.jobId)
          val s = sites.remove(je.jobId)
          if (v != null)
            println(f"[job] ${je.jobId}%4d ${(System.nanoTime() -
              v._1) / 1e9}%6.2f s  tasks=${v._2}  $s")
        }
      })
    def time[A](what: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
    val key = concat(lit("l"), col("l_orderkey"), lit("-"),
      col("l_linenumber"))
    val dir = "/tmp/graft_fold_probe"
    val cycPath = s"$dir/cycle"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(cycPath, "_SUCCESS")))
      time("build cycle") {
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .select(key.as("src"),
            coalesce(lead(key, 1).over(w), first(key).over(w))
              .as("dst"),
            col("l_suppkey").cast("long").as("supp"))
          .write.mode("overwrite").parquet(cycPath)
      }
    val cyc = spark.read.parquet(cycPath)
    val base = cyc.select(col("src"), col("dst"))
    val delta = cyc.where(pmod(col("supp"), lit(100)) === 0)
      .select(col("src"), col("dst"))
    val traceDir = s"$dir/trace6"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(traceDir, "t6", "_SUCCESS")))
      time("build trace6") {
        graft.operators.Graph.pagerankTrace(base, iterations = 6)
          .zipWithIndex.foreach { case (df, i) =>
            df.write.mode("overwrite").parquet(s"$traceDir/t$i")
          }
      }
    val trace = (0 to 6).map(i => spark.read.parquet(s"$traceDir/t$i"))
    for (rep <- 1 to 2) {
      time(s"pagerankDelta rep$rep") {
        graft.operators.Graph.pagerankDelta(base, delta, trace)
          .select(col("node"), col("pr").cast("long").as("pr"))
          .orderBy(col("pr").desc, col("node").asc_nulls_first)
          .limit(10).count()
      }
      time(s"full pagerank rep$rep") {
        graft.operators.Graph.pagerank(base.unionAll(delta),
            iterations = 6)
          .select(col("node"), col("pr").cast("long").as("pr"))
          .orderBy(col("pr").desc, col("node").asc_nulls_first)
          .limit(10).count()
      }
    }
    spark.stop()
  }
}
