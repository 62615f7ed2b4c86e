package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** SpaceSaving heavy-hitters sketch: exact in the no-eviction regime,
  * guarantee-bounded under eviction, deterministic under
  * repartitioning (the merge path), and correct through
  * serialize/deserialize (exercised by any distributed run).
  */
class SpaceSavingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Zipf-ish stream over `vocab` item labels: item i appears
    * proportionally more the smaller i is, shuffled deterministically.
    */
  private def skewedItems(vocab: Int, scale: Int): Seq[String] = {
    val items = (0 until vocab).flatMap { i =>
      Seq.fill(scale * (vocab - i))(f"item$i%03d")
    }
    new scala.util.Random(7).shuffle(items)
  }

  private def toDf(items: Seq[String], parts: Int): DataFrame = {
    val s = spark
    import s.implicits._
    items.toDF("item").repartition(parts)
  }

  private def sketch(df: DataFrame, k: Int): Map[String, Long] =
    df.agg(SpaceSavingAgg.spaceSaving(col("item"), k).as("hh"))
      .selectExpr("explode(hh) AS (item, est)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exact(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact regime: distinct <= k reproduces true counts") {
    val items = skewedItems(vocab = 12, scale = 3)
    assert(sketch(toDf(items, 5), k = 16) === exact(items))
  }

  test("exact regime is partitioning-invariant") {
    val items = skewedItems(vocab = 12, scale = 3)
    val a = sketch(toDf(items, 1), k = 16)
    val b = sketch(toDf(items, 7), k = 16)
    assert(a === b)
  }

  test("eviction regime: |est - truth| <= n/k for tracked items " +
      "and every item with truth > 2n/k is tracked") {
    // a 40-item tail (forces eviction at k=10) plus one item holding
    // half the stream — the non-vacuous heavy hitter
    val tail = skewedItems(vocab = 40, scale = 2)
    val items = new scala.util.Random(13).shuffle(
      tail ++ Seq.fill(tail.size)("hotitem"))
    val n = items.size.toLong
    val k = 10
    val truth = exact(items)
    for (parts <- Seq(1, 3, 8)) {
      val est = sketch(toDf(items, parts), k)
      assert(est.size <= k)
      est.foreach { case (item, e) =>
        val t = truth.getOrElse(item, 0L)
        assert(math.abs(e - t) <= n / k,
          s"parts=$parts item=$item est=$e truth=$t bound=${n / k}")
      }
      truth.filter(_._2 * k > 2 * n).keys.foreach { hh =>
        assert(est.contains(hh),
          s"parts=$parts heavy item $hh missing from sketch")
      }
    }
  }

  test("null items are ignored, not counted") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None)
      .toDF("item")
    assert(sketch(df, 4) === Map("a" -> 2L, "b" -> 1L))
  }

  test("heavyHitters emits per-group topN ranked (est desc, item)") {
    val s = spark
    import s.implicits._
    val df = (Seq.fill(5)(("g1", "x")) ++ Seq.fill(3)(("g1", "y")) ++
      Seq.fill(3)(("g1", "z")) ++ Seq.fill(2)(("g2", "w")))
      .toDF("g", "item")
    val out = Sketches.heavyHitters(df, col("g"), col("item"),
        k = 8, topN = 2)
      .orderBy(col("group"), col("est").desc, col("item"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2)))
    // g1's y/z tie at 3 → item-asc keeps y; g2 has only w
    assert(out.toSeq === Seq(("g1", "x", 5L), ("g1", "y", 3L),
      ("g2", "w", 2L)))
  }
}
