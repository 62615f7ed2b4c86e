package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class StreamingStructureSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("windowed stats with watermark over a memory stream") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF.toDF("ts", "key", "value")
    val query = StreamingStructure
      .windowedStats(df, "ts", "key", "value",
        windowLen = "1 minute", watermark = "2 minutes")
      .writeStream.format("memory").queryName("win")
      .outputMode("update").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 00:00:10")
      val t1 = Timestamp.valueOf("2026-01-01 00:00:40")
      input.addData((t0, "a", 1.0), (t1, "a", 3.0),
        (t0, "b", 10.0))
      query.processAllAvailable()
      val rows = spark.table("win").collect()
      val a = rows.find(_.getAs[String]("key") == "a").get
      assert(a.getAs[Long]("n_rows") == 2)
      assert(a.getAs[Double]("min_value") == 1.0)
      assert(a.getAs[Double]("max_value") == 3.0)
      val b = rows.find(_.getAs[String]("key") == "b").get
      assert(b.getAs[Long]("n_rows") == 1)
    } finally query.stop()
  }

  test("running per-key state via mapGroupsWithState") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Option[Double])]
    // lifetime state in the test: MemoryStream + processAllAvailable
    // and processing-time timeout triggers interact non-deterministically
    val query = StreamingStructure
      .runningStats(spark, input.toDS(), idleTimeout = None)
      .writeStream.format("memory").queryName("run")
      .outputMode("update").start()
    try {
      input.addData(("x", Some(5.0)), ("x", Some(1.0)), ("x", None))
      query.processAllAvailable()
      input.addData(("x", Some(9.0)))
      query.processAllAvailable()
      val last = spark.table("run").collect()
        .filter(_.getAs[String]("key") == "x")
        .maxBy(_.getAs[Long]("count"))
      assert(last.getAs[Long]("count") == 4)
      assert(last.getAs[Long]("nulls") == 1)
      assert(last.getAs[Double]("min") == 1.0)
      assert(last.getAs[Double]("max") == 9.0)
    } finally query.stop()
  }
}
