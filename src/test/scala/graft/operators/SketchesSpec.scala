package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Sketch profiles: error gates hold, results are deterministic
  * under repartitioning (mergeable sketch states, no RNG).
  */
class SketchesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    // two groups, duplicated docs (distinct < count), varied lengths
    (1 to n).map { i =>
      val g = if (i % 2 == 0) "web" else "books"
      val len = 1 + (i % 17)
      val body = (0 until len).map(j => s"w${(i % 50)}_$j")
        .mkString(" ")
      (g, body)
    }.toDF("source", "text")
  }

  test("profileWithGates: sketch error gates hold; exacts correct") {
    val df = corpus(600)
    val rows = Sketches.profileWithGates(df, col("source"),
      col("text")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 300)
      assert(r.getAs[Boolean]("unique_fp_ok"), r)
      assert(r.getAs[Boolean]("median_tok_ok"), r)
    }
  }

  test("corpusProfile is deterministic under repartitioning") {
    val df = corpus(600)
    def run(d: DataFrame): Seq[Seq[Any]] =
      Sketches.corpusProfile(d, col("source"), col("text"))
        .orderBy(col("group")).collect().toSeq.map(_.toSeq)
    assert(run(df) == run(df.repartition(13)))
    assert(run(df) == run(df.repartition(1)))
  }

  test("corpusProfile: HLL estimate tracks true distinct count") {
    val df = corpus(600) // 50 distinct word-stems -> ~50·17 bodies
    val r = Sketches.corpusProfile(df, col("source"), col("text"))
      .orderBy(col("group")).collect()
    val exact = df.groupBy(col("source"))
      .agg(countDistinct(
        graft.functions.TextFunctions.fingerprint(col("text")))
        .as("x"))
      .orderBy(col("source")).collect().map(_.getAs[Long]("x"))
    r.zip(exact).foreach { case (row, ex) =>
      val approx = row.getAs[Long]("approx_unique")
      assert(math.abs(approx - ex) * 100 <= ex * 5,
        s"approx=$approx exact=$ex")
    }
  }

  // ---- Count-Min join-size estimate ------------------------------

  /** Brute-force reference: same windowed-digest buckets (row i
    * reads 8-hex-char window i mod 4 of digest `md5(i/4 ":" k)`),
    * per-row inner products in BigInt, min over rows.
    */
  private def refJoinEstimate(a: Seq[String], b: Seq[String],
                              w: Int, d: Int): BigInt = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(row: Int, k: String): Int = {
      md.reset()
      val hex = md.digest(s"${row / 4}:$k".getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      (java.lang.Long.parseLong(
        hex.substring((row % 4) * 8, (row % 4) * 8 + 8), 16)
        % w).toInt
    }
    (0 until d).map { r =>
      val ca = a.groupBy(bucket(r, _)).view.mapValues(_.size)
      val cb = b.groupBy(bucket(r, _)).view.mapValues(_.size)
      ca.keys.toSeq.intersect(cb.keys.toSeq)
        .map(k => BigInt(ca(k)) * cb(k)).sum
    }.min
  }

  private def engineEstimate(a: Seq[String], b: Seq[String],
                             w: Int, d: Int): (Long, Long) = {
    val s = spark
    import s.implicits._
    val cmA = Sketches.countMinTable(a.toDF("k"), lit("t"),
      col("k"), w = w, d = d)
    val cmB = Sketches.countMinTable(b.toDF("k"), lit("t"),
      col("k"), w = w, d = d)
    val est = Sketches.cmJoinSizeEstimate(cmA, cmB, d = d)
      .select(col("est_join_rows")).head().getLong(0)
    val exact = a.toDF("k").join(b.toDF("k"), Seq("k")).count()
    (est, exact)
  }

  test("cm join-size estimate: lockstep with the brute-force " +
      "reference and the never-undercount law") {
    val rnd = new scala.util.Random(17)
    for (i <- 1 to 5) {
      val a = (1 to 120).map(_ => s"k${rnd.nextInt(40)}")
      val b = (1 to 80).map(_ => s"k${rnd.nextInt(60)}")
      val (est, exact) = engineEstimate(a, b, w = 16, d = 3)
      assert(BigInt(est) == refJoinEstimate(a, b, 16, 3), s"case $i")
      assert(est >= exact, s"case $i: est $est < exact $exact")
    }
  }

  test("cm join-size estimate: groups never mix — a multi-group " +
      "pair estimates each group independently") {
    val s = spark
    import s.implicits._
    // g1 sides share keys; g2 sides are disjoint from each other AND
    // from g1 — a (row,bucket)-only join would leak g1's counters
    // into g2's inner product and report g2 > 0
    val a = Seq.fill(30)("g1" -> "k1") ++
      (1 to 8).map(i => "g2" -> s"x$i")
    val b = Seq.fill(20)("g1" -> "k1") ++
      (1 to 8).map(i => "g2" -> s"y$i")
    val cmA = Sketches.countMinTable(a.toDF("g", "k"), col("g"),
      col("k"), w = 1024, d = 4)
    val cmB = Sketches.countMinTable(b.toDF("g", "k"), col("g"),
      col("k"), w = 1024, d = 4)
    val est = Sketches.cmJoinSizeEstimate(cmA, cmB, d = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("g1") == 600L) // 30 × 20, exact at this sparsity
    assert(est("g2") == 0L)   // disjoint — proven empty, not inflated
  }

  test("cm join-size estimate: a d mismatch raises instead of " +
      "silently min-ing over unpopulated rows") {
    val s = spark
    import s.implicits._
    val keys = (1 to 8).map(i => s"k$i")
    val cm4 = Sketches.countMinTable(keys.toDF("k"), lit("t"),
      col("k"), w = 64, d = 4)
    val cm2 = Sketches.countMinTable(keys.toDF("k"), lit("t"),
      col("k"), w = 64, d = 2)
    val ex = intercept[Exception] {
      Sketches.cmJoinSizeEstimate(cm4, cm2, d = 2).collect()
    }
    assert(ex.getMessage != null)
  }

  test("cm join-size estimate: disjoint keys can prove emptiness") {
    // with w larger than the key count, disjoint sides share no
    // buckets on some row -> the min sees an exact 0
    val a = (1 to 8).map(i => s"a$i")
    val b = (1 to 8).map(i => s"b$i")
    val (est, exact) = engineEstimate(a, b, w = 1024, d = 4)
    assert(exact == 0L)
    assert(BigInt(est) == refJoinEstimate(a, b, 1024, 4))
    assert(est == 0L)
  }
}

/** Group-pairwise corpus overlap: MinHash estimate vs exact
  * shingle-set intersection.
  */
class CorpusOverlapSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("identical groups estimate 1.0; disjoint groups estimate 0") {
    val s = spark
    import s.implicits._
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota"
    val textB = "uno dos tres cuatro cinco seis siete ocho nueve"
    val df = Seq(
      ("g1", textA), ("g1", textB),
      ("g2", textA), ("g2", textB),   // identical shingle union to g1
      ("g3", "one two three four five six seven eight nine ten"))
      .toDF("source", "text")
    val m = Dedup.corpusOverlapMatrix(df, col("source"), col("text"))
      .orderBy(col("g1"), col("g2")).collect()
    assert(m.length == 3)
    val m12 = m.find(r => r.getString(0) == "g1" &&
      r.getString(1) == "g2").get
    assert(m12.getAs[Long]("n_match_sig") == 64)
    assert(m12.getAs[Long]("inter") == m12.getAs[Long]("union_n"))
    val m13 = m.find(r => r.getString(0) == "g1" &&
      r.getString(1) == "g3").get
    assert(m13.getAs[Long]("inter") == 0L)
    assert(m13.getAs[Long]("n_match_sig") == 0L)
  }

  test("group signature equals the min over the union (partial-doc " +
       "overlap has exact inter/union)") {
    val s = spark
    import s.implicits._
    // g1 = {s(d1), s(d2)}, g2 = {s(d2), s(d3)}: shared shingles are
    // exactly d2's — verify exact inter against a direct computation
    val d1 = "w1 w2 w3 w4 w5 w6"
    val d2 = "x1 x2 x3 x4 x5 x6 x7"
    val d3 = "y1 y2 y3 y4 y5 y6"
    val df = Seq(("g1", d1), ("g1", d2), ("g2", d2), ("g2", d3))
      .toDF("source", "text")
    val r = Dedup.corpusOverlapMatrix(df, col("source"), col("text"))
      .head()
    // 5-gram shingles: d1 -> 2, d2 -> 3, d3 -> 2 (all distinct)
    assert(r.getAs[Long]("inter") == 3L)     // d2's shingles
    assert(r.getAs[Long]("union_n") == 7L)   // 2 + 3 + 2
    // estimate must agree with a true Jaccard of 3/7 within the
    // deterministic outcome for this fixed data (sanity bound only)
    val est = r.getAs[Long]("n_match_sig")
    assert(est > 0 && est < 64, s"est=$est")
  }

  test("exact overlap self-join refuses past the pair-row budget; " +
       "the estimate path stays available") {
    val s = spark
    import s.implicits._
    // one boilerplate document shared by every group: each of its
    // shingle digests appears in all 6 groups -> sum gs*(gs-1)/2
    // well above a budget of 10
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    val df = (0 until 6).map(g => (s"g$g", boiler))
      .toDF("source", "text")
    val ex = intercept[IllegalStateException] {
      Dedup.corpusOverlapMatrix(df, col("source"), col("text"),
        maxPairRows = 10L).collect()
    }
    assert(ex.getMessage.contains("pair rows"), ex.getMessage)
    // withExact = false never materializes pairs, so the same call
    // under the same budget succeeds
    val est = Dedup.corpusOverlapMatrix(df, col("source"),
        col("text"), withExact = false, maxPairRows = 10L)
      .collect()
    assert(est.length == 15) // all 6-choose-2 pairs, all identical
    assert(est.forall(_.getAs[Long]("n_match_sig") == 64L))
  }
}
