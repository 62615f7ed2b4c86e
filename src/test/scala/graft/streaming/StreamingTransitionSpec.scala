package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transition watch == batch census on in-order replays:
  * state is one last-event per entity, transitions stitch across
  * micro-batch boundaries, and counting the emitted rows reproduces
  * `Temporal.transitionCensus` exactly.
  */
class StreamingTransitionSpec extends AnyFunSuite
    with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streamed transitions equal the batch census across splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rnd = new scala.util.Random(23)
    // per-entity in-order event log (the operator's cross-batch
    // contract): ts strictly increases within an entity
    val corpus = (1 to 600).map { i =>
      ((i % 9).toLong, s"e${rnd.nextInt(4)}", i.toLong, i.toLong)
    }
    val input = MemoryStream[(Long, String, Long, Long)]
    val watch = StreamingStructure.transitionWatch(s, input.toDS())
    val q = watch.toDF().writeStream.format("memory")
      .queryName("twatch").outputMode("append").start()
    try {
      // uneven splits, including a 1-row batch at a boundary
      Seq((0, 113), (113, 114), (114, 390), (390, 600)).foreach {
        case (a, b) =>
          input.addData(corpus.slice(a, b))
          q.processAllAvailable()
      }
      val streamed = s.table("twatch")
        .groupBy(col("prev"), col("next"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val batch = graft.operators.Temporal.transitionCensus(
          corpus.toDF("u", "e", "ts", "id"),
          col("u"), col("e"), Seq(col("ts"), col("id")))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(streamed === batch)
      assert(streamed.values.sum == 600L - 9L)
      // within-batch disorder is tolerated: the watch sorts by
      // (ts, id) before stitching — verified implicitly by the
      // modulo interleaving above (entities arrive interleaved)
    } finally q.stop()
  }

  test("a late cross-batch arrival is dropped, not emitted as a " +
      "time-reversed transition") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String, Long, Long)]
    val watch = StreamingStructure.transitionWatch(s, input.toDS())
    val q = watch.toDF().writeStream.format("memory")
      .queryName("twatch_late").outputMode("append").start()
    try {
      input.addData(Seq((1L, "a", 10L, 1L), (1L, "b", 20L, 2L)))
      q.processAllAvailable()
      // ts=15 arrives AFTER the entity's watermark moved to 20:
      // a contract violation — dropped, and the state stays at "b"
      input.addData(Seq((1L, "x", 15L, 3L)))
      q.processAllAvailable()
      input.addData(Seq((1L, "c", 30L, 4L)))
      q.processAllAvailable()
      val rows = s.table("twatch_late")
        .select(col("prev"), col("next"), col("ts"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(rows === Set(("a", "b", 20L), ("b", "c", 30L)))
    } finally q.stop()
  }
}
