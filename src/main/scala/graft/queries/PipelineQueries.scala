package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

import graft.functions.TextFunctions
import graft.operators.{Chunking, Contracts, Dedup, Delta,
  EntityResolution, Graph, LangModel, Layout, Mixing, Multimodal,
  Retrieval, Sampling, Similarity, Sketches, Temporal, Urls}

/** Beyond-reference pipeline operators (SURVEY §7.5 / the north star):
  * dedup, similarity search, text analysis, multimodal plumbing — each
  * surfaced as a deterministic query with a DuckDB oracle (q33, the
  * flagship structure-inference dump, pins its deterministic output as
  * an explicit VALUES oracle; the byte-identical golden snapshot covers
  * the full render grammar).
  *
  * Determinism notes: md5/crc32 digests are identical across engines;
  * ratio thresholds use integer cross-multiplication; dot products are
  * double-multiplied, decimal-summed (exact, order-free — and a double
  * can never tie at a decimal rounding boundary, so the final decimal
  * casts agree between Spark's HALF_UP and DuckDB's rounding).
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** q155's messy-URL fixture: deterministic per-doc_id variations
    * over case, www, default/explicit ports, trailing slash, param
    * order, and fragments — built identically by [[messyUrlSql]].
    */
  private def messyUrl(id: Column): Column = concat(
    element_at(array(lit("http"), lit("HTTP"), lit("https"),
      lit("HtTpS")), (pmod(id, lit(4)) + 1).cast("int")),
    lit("://"),
    when(pmod(id, lit(2)) === 0, lit("WWW.")).otherwise(lit("")),
    lit("Site"), pmod(id, lit(5)).cast("string"),
    lit(".Example.COM"),
    element_at(array(lit(":80"), lit(":443"), lit(":8080"),
      lit("")), (pmod(id, lit(4)) + 1).cast("int")),
    lit("/Path/"), pmod(id, lit(3)).cast("string"),
    when(pmod(id, lit(2)) === 1, lit("/")).otherwise(lit("")),
    element_at(array(lit("?b=2&a=1"), lit("?a=1"), lit("")),
      (pmod(id, lit(3)) + 1).cast("int")),
    when(pmod(id, lit(5)) === 0, lit("#f")).otherwise(lit("")))

  private val messyUrlSql: String =
    "CASE doc_id % 4 WHEN 0 THEN 'http' WHEN 1 THEN 'HTTP' " +
    "WHEN 2 THEN 'https' ELSE 'HtTpS' END || '://' || " +
    "CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END || " +
    "'Site' || CAST(doc_id % 5 AS VARCHAR) || '.Example.COM' || " +
    "CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443' " +
    "WHEN 2 THEN ':8080' ELSE '' END || " +
    "'/Path/' || CAST(doc_id % 3 AS VARCHAR) || " +
    "CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END || " +
    "CASE doc_id % 3 WHEN 0 THEN '?b=2&a=1' WHEN 1 THEN '?a=1' " +
    "ELSE '' END || " +
    "CASE WHEN doc_id % 5 = 0 THEN '#f' ELSE '' END"

  /** q167's messy-HTML fixture: twelve constant documents, one per
    * documented extraction rule of
    * [[graft.functions.HtmlTextExpr]] (tag strip, RCDATA title,
    * raw-text script/style, attribute quoting, comments, numeric and
    * named entities, literal `<`, case-insensitive names, broken
    * markup). The oracle pins each variant's expected extraction as
    * explicit VALUES (the q72 pattern — hand-derivable from the
    * rules), joined to the per-variant doc counts.
    */
  private val HtmlVariants: Seq[String] = Seq(
    "<html><body><p>Hello world</p></body></html>",
    "<html><head><title>Lab &amp; Co</title></head><body>" +
      "<p>A &lt;b&gt; tag</p></body></html>",
    "<body><script>var x = \"<p>no</p>\";</script><p>Real</p></body>",
    "<body><style>p > a { color: red }</style><p>Styled</p></body>",
    "<p>See <a href=\"http://x.example/a?b=1&amp;c=2\">one</a> " +
      "and <a href='/two'>two</a></p>",
    "<body><!-- hidden <p>no</p> --><p>Shown</p></body>",
    "<p>caf&#233; &#x2603; &#65;B</p>",
    "1 < 2 and <p>fine</p>",
    "<p><a href=\"/x?q=a>b\" title='1>2'>q</a></p>",
    "<!DOCTYPE html><div><p>One</p><p>Two</p></div>",
    "<P>UP&nbsp;CASE</P><A HREF=\"#\">L</A>",
    "<p>trail <b unclosed <i>deep</i>")

  /** q168's labeled-language fixture: three synthetic "languages"
    * with visibly distinct character-bigram distributions (the
    * signal a char-n-gram identifier keys on), four sentences each;
    * a doc's language is `doc_id % 3`, its sentence `doc_id % 4`.
    * ASCII lowercase only, no quotes — so the Spark fixture and the
    * generated DuckDB CASE (built from THIS constant, they cannot
    * drift) index identically by code point.
    */
  private val LangSentences: Seq[Seq[String]] = Seq(
    Seq("the quick brown fox jumps over the lazy dog by the river",
      "a stitch in time saves nine and the early bird gets the worm",
      "all that glitters is not gold said the wise old owl",
      "better late than never when the ship comes in with the tide"),
    Seq("der schnelle zug faehrt durch den schwarzwald nach muenchen",
      "die schoene muehle steht am schiefen bach bei der bruecke",
      "ein fleissiger schueler liest ein schweres buch ueber berge",
      "das wetter wird schlecht und der wind weht ueber die wiese"),
    Seq("talo jaervellae on kaunis kesaellae ja rauhallinen",
      "kissa istuu ikkunalla ja katselee lintuja puutarhassa",
      "suomalainen saunailta on laempimae ja mukava kokemus",
      "jaerven rannalla kasvaa korkea koivu ja pieni kukka"))

  /** The fixture text as a Column over doc_id. */
  private def langText(id: Column): Column =
    element_at(array(LangSentences.flatten.map(lit): _*),
      (pmod(id, lit(3)) * 4 + pmod(id, lit(4)) + 1).cast("int"))

  /** The identical fixture as DuckDB SQL (generated from
    * [[LangSentences]]).
    */
  private val langTextSql: String =
    "CASE (doc_id % 3) * 4 + (doc_id % 4) " +
      LangSentences.flatten.zipWithIndex.map { case (s, i) =>
        s"WHEN $i THEN '$s' "
      }.mkString + "END"

  /** q172's boilerplate fixture: six page shapes (pure prose,
    * nav+prose+footer, a link farm, a table, comment/script noise,
    * broken markup). The oracle pins each variant's expected BLOCK
    * list — text and link-char count per block, derived by the
    * documented [[graft.functions.HtmlBlocksExpr]] rules — and
    * recomputes the census from those VALUES, so character counts
    * come from SQL length(), never hand arithmetic.
    */
  private val BoilerVariants: Seq[String] = Seq(
    "<p>the quick brown fox jumps over the lazy dog and keeps " +
      "running</p>",
    "<nav><a href='/h'>home</a> <a href='/a'>about</a></nav>" +
      "<p>a decently long paragraph of genuine content with a " +
      "<a href='/r'>link</a> here</p>" +
      "<footer><a href='/c'>contact page</a></footer>",
    "<ul><li><a href='/1'>one</a></li><li><a href='/2'>two</a>" +
      "</li><li><a href='/3'>three</a></li></ul>",
    "<table><tr><td>id</td><td>a reasonably wordy description " +
      "cell with many characters inside</td></tr></table>",
    "<!-- ad --><script>var x = '<td>'</script><p>plain prose " +
      "that easily clears the twenty character bar</p>",
    "<p>broken <b unclosed <i>markup still yields a usable prose " +
      "block for the census</i>")

  /** Location of the materialized purchase graph shared by the five
    * graph queries (q152/q153/q157/q163/q165) — per-process like the
    * serving index so concurrent graft JVMs never race the build.
    */
  private val PurchaseGraphDir =
    "/tmp/graft_purchase_graph_" + ProcessHandle.current().pid()

  /** The purchase graph, built ONCE per (process, sf dir) and
    * persisted as parquet — the build-once pattern a real graph
    * workload uses (all five graph queries previously re-derived the
    * orders⋈lineitem join per query, and the bench runs each query
    * 2-3×). One row per (custkey, suppkey) pair that ever traded,
    * keys prefixed into one node namespace, with the total traded
    * quantity as `w` — so the weighted edge frame and the plain
    * distinct-edge frame (drop `w`) both come from this one table.
    */
  private def ensurePurchaseGraph(s: SparkSession,
                                  d: String): DataFrame = {
    sweepStaleServingIndexes()
    val dir = PurchaseGraphDir
    val marker = java.nio.file.Paths.get(dir, "_built_from")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == d
    if (!fresh) {
      t(s, d, "orders")
        .join(t(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .agg(sum(col("l_quantity").cast("long")).as("w"))
        .write.mode("overwrite").parquet(s"$dir/edges")
      java.nio.file.Files.write(marker,
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    s.read.parquet(s"$dir/edges")
  }

  /** q152/q153's purchase graph: one distinct customer→supplier edge
    * per (custkey, suppkey) that ever traded (the weighted fixture
    * with the weight projected away — a column-pruned read of the
    * shared parquet).
    */
  private def purchaseEdges(s: SparkSession, d: String): DataFrame =
    ensurePurchaseGraph(s, d).select(col("src"), col("dst"))

  /** q174/q175's shipment-succession CYCLE graph: within each
    * supplier, line items sorted by (l_shipdate, l_orderkey,
    * l_linenumber) link each to the next and the last wraps to the
    * first — out-degree exactly 1 per node (a single-shipment
    * supplier self-loops), so the frame is dangling-free by
    * construction and SPARSE (|E| = |V| = |lineitem|), the regime
    * where an incremental fold's frontier stays local. One window
    * shuffle on `l_suppkey` builds it.
    */
  private def shipmentCycleEdges(s: SparkSession,
                                 d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
    val key = concat(lit("l"), col("l_orderkey"), lit("-"),
      col("l_linenumber"))
    t(s, d, "lineitem")
      .select(key.as("src"),
        coalesce(lead(key, 1).over(w), first(key).over(w))
          .as("dst"),
        col("l_suppkey").cast("long").as("supp"))
  }

  /** Physical partition fan-out of the persisted fold artifacts:
    * the cycle graph is directory-partitioned by
    * `sb = pmod(xxhash64(src), CycleBuckets)` so a fold's src-keyed
    * probes prune to the probing frontier's partitions
    * ([[Graph.EdgeLayout]] — at 100 TB this is the difference
    * between a fold hop costing O(frontier) and O(graph) file I/O;
    * a production deployment sizes this into the thousands), and
    * each rank-trace element is a catalog table BUCKETED by `node`
    * so the per-round trace-patch join never shuffles the
    * node-sized trace side (the frontier-sized patch side shuffles
    * into the trace's bucketing instead).
    */
  private[graft] val CycleBuckets = 16
  private val TraceBuckets = 16

  /** The cycle graph MATERIALIZED once per (process, sf dir) beside
    * the purchase graph (same marker + stale-sweep scheme) — the
    * incremental contract again: a production fold ranks a
    * persisted edge frame, it never re-sorts the fact table per
    * run. Carries `supp` so q174's delta is a column-pruned filter
    * of the same parquet, and the `sb` partition column so the
    * fold's frontier probes are partition-pruned scans.
    */
  private def ensureShipmentCycle(s: SparkSession,
                                  d: String): DataFrame = {
    sweepStaleServingIndexes()
    val dir = PurchaseGraphDir
    val marker = java.nio.file.Paths.get(dir, "_cycle_from")
    // freshness also requires the dst companion: a marker written by
    // a build that predates cycle_bydst must rebuild
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == d &&
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "cycle_bydst"))
    if (!fresh) {
      shipmentCycleEdges(s, d)
        .withColumn("sb", pmod(xxhash64(col("src")),
          lit(CycleBuckets.toLong)).cast("int"))
        .write.mode("overwrite").partitionBy("sb")
        .parquet(s"$dir/cycle")
      // the dst-partitioned COMPANION copy: the fold's one dst-keyed
      // probe (the frontier in-edge extract) prunes against this the
      // way every src-keyed probe prunes against `sb` — written once
      // per artifact build, 2× cycle storage (disclosed in
      // OPTIMIZATION_r15.md). Re-read the src copy rather than
      // re-sorting lineitem a second time.
      s.read.parquet(s"$dir/cycle")
        .withColumn("db", pmod(xxhash64(col("dst")),
          lit(CycleBuckets.toLong)).cast("int"))
        .drop("sb")
        .write.mode("overwrite").partitionBy("db")
        .parquet(s"$dir/cycle_bydst")
      java.nio.file.Files.write(marker,
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    s.read.parquet(s"$dir/cycle")
  }

  /** The dst-partitioned companion of [[ensureShipmentCycle]]'s
    * artifact (built by the same marker transaction).
    */
  private def shipmentCycleByDst(s: SparkSession,
                                 d: String): DataFrame = {
    ensureShipmentCycle(s, d)
    s.read.parquet(s"$PurchaseGraphDir/cycle_bydst")
  }

  /** q169/q173's PERSISTED prior: a real incremental pipeline folds
    * a delta into the scores it already has on disk — the trace is
    * the artifact, not something rebuilt per fold. Materialized once
    * per (process, sf dir, name) beside the purchase graph (same
    * marker + stale-sweep scheme); each element round-trips as
    * parquet (DECIMAL(38,0) scores exactly).
    */
  private def traceTable(name: String, i: Int): String =
    s"graft_trace_${name}_t$i"

  private def ensureRankTrace(s: SparkSession, d: String,
                              name: String, iterations: Int)
                             (build: () => Seq[DataFrame])
      : Seq[DataFrame] = {
    sweepStaleServingIndexes()
    val dir = s"$PurchaseGraphDir/trace_$name"
    val marker = java.nio.file.Paths.get(dir, "_built_from")
    // bucketing lives in the session CATALOG: a marker written by an
    // earlier session in this process does not let THIS session
    // resolve the tables, so freshness requires both
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == d &&
      (0 to iterations).forall(i =>
        s.catalog.tableExists(traceTable(name, i)))
    if (!fresh) {
      val sc = s.sparkContext
      val before = sc.getPersistentRDDs.keySet
      build().zipWithIndex.foreach { case (df, i) =>
        Layout.writeBucketed(df, traceTable(name, i), s"$dir/t$i",
          "node", TraceBuckets)
      }
      // the build's localCheckpoint blocks are superseded by the
      // parquet artifact the moment the writes land — release them
      // now instead of letting a trace build degrade every query
      // that shares the session (the r12 contended-bench knock-on)
      graft.operators.Graph.release(
        sc.getPersistentRDDs
          .collect { case (id, r) if !before.contains(id) => r }
          .toSeq)
      java.nio.file.Files.write(marker,
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    (0 to iterations).map(i => s.table(traceTable(name, i)))
  }

  /** The symmetrized purchase graph (q169/q178's base family). */
  private def symPurchase(s: SparkSession, d: String): DataFrame = {
    val we = ensurePurchaseGraph(s, d)
    we.select(col("src"), col("dst"), col("w"))
      .unionByName(we.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
  }

  /** The custkey ≡ 0 (mod 3) third of the purchase graph (q173/q176
    * fixtures — the equivalence proofs are graph-size-agnostic).
    */
  private def thirdPurchase(s: SparkSession, d: String): DataFrame =
    ensurePurchaseGraph(s, d)
      .where(pmod(substring(col("src"), 2, 18).cast("long"),
        lit(3)) === 0)

  /** q173's OLD frame: the symmetrized third plus a reinforcing
    * second copy of its mod-7 edges.
    */
  private def thirdOldEdges(s: SparkSession, d: String): DataFrame = {
    val we = thirdPurchase(s, d)
    val sym = we.select(col("src"), col("dst"), col("w"))
      .unionByName(we.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
    val neu = sym.select(col("src"), col("dst"))
    neu.unionAll(sym.where(pmod(col("w"), lit(7)) === 0)
      .select(col("src"), col("dst")))
  }

  /** q176's base: the symmetrized third MINUS every pair whose
    * supplier key divides 7 (the delta reintroduces them as new
    * nodes).
    */
  private def growBaseEdges(s: SparkSession, d: String): DataFrame = {
    val we = thirdPurchase(s, d)
    val sevenSupp =
      pmod(substring(col("dst"), 2, 18).cast("long"), lit(7)) === 0
    val kept = we.where(!sevenSupp)
    kept.select(col("src"), col("dst"))
      .unionByName(kept.select(col("dst").as("src"),
        col("src").as("dst")))
  }

  // the five persisted rank/HITS trace artifacts — ONE definition
  // each, shared by the query lambda and [[prebuild]] so the two can
  // never build different fixtures under the same marker name
  private def traceSym2(s: SparkSession, d: String): Seq[DataFrame] =
    ensureRankTrace(s, d, "sym2", 2)(() =>
      Graph.pagerankTrace(symPurchase(s, d)
        .select(col("src"), col("dst")), iterations = 2))
  private def traceThirdRef2(s: SparkSession, d: String)
      : Seq[DataFrame] =
    ensureRankTrace(s, d, "third_ref2", 2)(() =>
      Graph.pagerankTrace(thirdOldEdges(s, d), iterations = 2))
  private def traceCycle6(s: SparkSession, d: String)
      : Seq[DataFrame] =
    ensureRankTrace(s, d, "cycle6", 6)(() =>
      Graph.pagerankTrace(ensureShipmentCycle(s, d)
        .select(col("src"), col("dst")), iterations = 6))
  private def traceGrow2(s: SparkSession, d: String)
      : Seq[DataFrame] =
    ensureRankTrace(s, d, "grow2", 2)(() =>
      Graph.pagerankTrace(growBaseEdges(s, d), iterations = 2))
  private def traceHits2(s: SparkSession, d: String)
      : Seq[DataFrame] =
    ensureRankTrace(s, d, "hits2", 2)(() =>
      Graph.hitsTrace(ensurePurchaseGraph(s, d)
        .select(col("src"), col("dst")), iterations = 2))

  /** q174's fold, budget-parameterized so ExplainAudit can force
    * the DISTRIBUTED path (`maxBroadcastBytes = 0`) against the
    * same persisted artifacts and pin its plan shapes: the `sb`
    * partition column + `srcBuckets` hint make every frontier probe
    * a partition-pruned scan of the cycle artifact, and the
    * node-bucketed trace tables keep the trace side of each patch
    * join shuffle-free.
    */
  /** q179's deterministic cell luma (grid coords cx in 0..8,
    * cy in 0..7): five pattern families (id mod 5) with a per-
    * variant single-cell perturbation — in-family images land a few
    * dHash bits apart, across families far apart. The DuckDB oracle
    * replays this formula at the PIXEL level and re-derives both
    * hashes independently, so the match proves the whole
    * encode→decode→downsample→hash chain.
    */
  private def q179Luma(id: Long, cx: Int, cy: Int): Int = {
    val f = (id % 5).toInt
    val v = id / 5
    val base = (f * 37 + cx * 13 + cy * 7) % 199
    if (v > 0 && v % 9 == cx && (v * 3) % 8 == cy) (base + 97) % 199
    else base
  }

  /** A REAL uncompressed 24bpp bottom-up BMP per fixture id (the
    * q180–q183 driver-side assembly discipline — the first cut built
    * these in-plan from hex expressions, which shipped an 8 MiB
    * codegen task binary for 70 KB of fixture bytes): 9×8 when
    * `blk` = 1, 18×16 of 2×2 constant blocks when `blk` = 2 — the
    * two sizes exercise both the identity and the area-downsample
    * paths of the native decoder.
    */
  private def q179Bmp(id: Long): Array[Byte] = {
    val blk = if ((id / 5) % 2 == 1) 2 else 1
    val w = 9 * blk
    val h = 8 * blk
    val stride = ((24 * w + 31) / 32) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putInt(0).putInt(54).putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up: pixel row h-1 first; each cell is blk×blk identical
    // pixels of 3 identical (B=G=R) bytes — luma survives decode
    // exactly
    for (py <- (h - 1) to 0 by -1) {
      for (px <- 0 until w) {
        val l = q179Luma(id, px / blk, py / blk).toByte
        bb.put(l).put(l).put(l)
      }
      for (_ <- 0 until stride - 3 * w) bb.put(0.toByte)
    }
    bb.array()
  }

  /** q180's hand-assembled JPEG/TIFF fixtures (the ExifSpec layout,
    * built independently here so the query never shares bytes with
    * the test): IFD0 with ASCII Make/Model/DateTime, inline SHORT
    * orientation, and optionally the GPS-IFD pointer — the PII
    * signal.
    */
  private def q180Jpeg(exif: Option[(Boolean, String, String,
      String, Int, Boolean)]): Array[Byte] = {
    def tiff(le: Boolean, make: String, model: String, dt: String,
             orientation: Int, gps: Boolean): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(512).order(
        if (le) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      out.put((if (le) "II" else "MM")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      out.putShort(42).putInt(8)
      val ascii = Seq(0x010f -> make, 0x0110 -> model, 0x0132 -> dt)
      val nEntries = ascii.size + 1 + (if (gps) 1 else 0)
      out.putShort(nEntries.toShort)
      var dataOff = 8 + 2 + 12 * nEntries + 4
      val data = java.nio.ByteBuffer.allocate(256)
      for ((tag, v) <- ascii) {
        val bytes = (v + "\u0000")
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        out.putShort(tag.toShort).putShort(2).putInt(bytes.length)
        if (bytes.length <= 4) out.put(
          java.util.Arrays.copyOf(bytes, 4))
        else {
          out.putInt(dataOff)
          data.put(bytes)
          dataOff += bytes.length
        }
      }
      out.putShort(0x0112).putShort(3).putInt(1)
        .putShort(orientation.toShort).putShort(0)
      if (gps) out.putShort(0x8825.toShort).putShort(4).putInt(1)
        .putInt(dataOff)
      out.putInt(0)
      out.put(data.array(), 0, data.position())
      java.util.Arrays.copyOf(out.array(), out.position())
    }
    def bb(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val app1 = exif.map { case (le, make, model, dt, o, gps) =>
      val payload = "Exif\u0000\u0000"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        tiff(le, make, model, dt, o, gps)
      val len = payload.length + 2
      bb(0xff, 0xe1, (len >> 8) & 0xff, len & 0xff) ++ payload
    }.getOrElse(Array.empty[Byte])
    bb(0xff, 0xd8) ++ app1 ++
      bb(0xff, 0xc0, 0, 17, 8, 0, 48, 0, 64,
        3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) ++
      bb(0xff, 0xda, 0, 8, 1, 1, 0, 0, 63, 0) ++
      bb(0x12, 0x34, 0x56) ++ bb(0xff, 0xd9)
  }

  /** q181's hand-assembled PCM WAV fixtures (the AudioPcmSpec
    * container layout, built independently here): 65 windows × 20
    * samples of a square wave whose per-window amplitude is the
    * Weyl-sequence formula the oracle replays —
    * `amp(f, k) = ((f·7919 + k·104729) mod 1889) + 111`, with
    * variant v > 0 silencing window `(v·13) mod 65`. In-family
    * fingerprints land ≤ 4 Hamming bits apart, cross-family ≥ 20
    * (verified analytically), so the banded join's answer is fully
    * determined by the formula.
    */
  private def q181Wav(id: Int): Array[Byte] = {
    val f = id % 5
    val v = id / 5
    def amp(k: Int): Int =
      if (v > 0 && k == (v * 13) % 65) 0
      else ((f * 7919 + k * 104729) % 1889) + 111
    val per = 20
    val n = 65 * per
    val dataLen = 2 * n
    val riffLen = 4 + (8 + 16) + (8 + dataLen)
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(t: String): Unit = bb.put(
      t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ascii("RIFF"); bb.putInt(riffLen); ascii("WAVE")
    ascii("fmt "); bb.putInt(16)
    bb.putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    ascii("data"); bb.putInt(dataLen)
    var i = 0
    while (i < n) {
      val a = amp(i / per)
      bb.putShort((if (i % 2 == 0) a else -a).toShort)
      i += 1
    }
    bb.array()
  }

  /** q182's hand-assembled uncompressed AVI fixtures (the
    * VideoFramesSpec container layout, built independently here):
    * 12 grayscale 9×8 frames per clip, static within a scene and
    * cut every `3 + id mod 3` frames — frame luma is the
    * quadratic-residue formula the oracle replays,
    * `luma(seed, i) = (seed + 17·i)² mod 199` with
    * `seed = id·11 + scene·7` (consecutive scenes land ≥ 29 dHash
    * bits apart, verified analytically, so the >4-bit shot rule is
    * fully determined by the formula).
    */
  private def q182Avi(id: Int): Array[Byte] = {
    val segLen = 3 + id % 3
    aviFromSeeds((0 until 12).map(t => id * 11 + (t / segLen) * 7))
  }

  /** The container assembly shared by q182/q183: one grayscale 9×8
    * frame per seed, pixels `(seed + 17·i)² mod 199`.
    */
  private def aviFromSeeds(seeds: Seq[Int]): Array[Byte] = {
    val w = 9
    val h = 8
    val stride = ((24 * w + 31) / 32) * 4
    val frameLen = stride * h
    val nFrames = seeds.length
    val strh = new Array[Byte](56)
    "vids".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII).copyToArray(strh, 0)
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + nFrames * (8 + frameLen)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val bb = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(t: String): Unit = bb.put(t.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))
    ascii("RIFF"); bb.putInt(riffLen); ascii("AVI ")
    ascii("LIST"); bb.putInt(hdrlLen); ascii("hdrl")
    ascii("avih"); bb.putInt(56); bb.put(new Array[Byte](56))
    ascii("LIST"); bb.putInt(strlLen); ascii("strl")
    ascii("strh"); bb.putInt(56); bb.put(strh)
    ascii("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(frameLen).putInt(0).putInt(0).putInt(0)
      .putInt(0)
    ascii("LIST"); bb.putInt(moviLen); ascii("movi")
    for (t <- 0 until nFrames) {
      val seed = seeds(t)
      ascii("00db"); bb.putInt(frameLen)
      for (y <- (h - 1) to 0 by -1) { // bottom-up rows
        for (x <- 0 until w) {
          val v = seed + 17 * (y * w + x)
          val l = ((v * v) % 199).toByte
          bb.put(l).put(l).put(l)
        }
        for (_ <- 0 until stride - 3 * w) bb.put(0.toByte)
      }
    }
    bb.array()
  }

  private[graft] def q174Fold(s: SparkSession, d: String,
                              maxBroadcastBytes: Long): DataFrame = {
    val cyc = ensureShipmentCycle(s, d)
    val base = cyc.select(col("src"), col("dst"), col("sb"))
    val delta = cyc.where(pmod(col("supp"), lit(100)) === 0)
      .select(col("src"), col("dst"), col("sb"))
    val cycD = shipmentCycleByDst(s, d)
    val baseD = cycD.select(col("src"), col("dst"), col("db"))
    val deltaD = cycD.where(pmod(col("supp"), lit(100)) === 0)
      .select(col("src"), col("dst"), col("db"))
    val trace = traceCycle6(s, d)
    Graph.pagerankDelta(base, delta, trace,
        maxBroadcastBytes = maxBroadcastBytes,
        srcBuckets = Some(CycleBuckets),
        byDst = Some((baseD, deltaD)))
      .select(col("node"), col("pr").cast("long").as("pr"))
      .orderBy(col("pr").desc, col("node").asc_nulls_first)
      .limit(10)
  }

  /** Force every per-process artifact the query surface reads (the
    * purchase/cycle graphs, the five rank/HITS traces, the serving
    * index, the multi-source fixture). Bench calls this in an
    * UNTIMED warmup pass so the measured loop never pays a build —
    * the incremental contract says the artifacts pre-exist; timing
    * their construction inside the first measured repeat was both
    * unfair to the fold queries and a driver-timeout risk.
    */
  def prebuild(s: SparkSession, d: String): Unit = {
    // sweep between builds: consecutive trace builders persist
    // identical edge subtrees (e.g. the purchase graph for both the
    // rank and HITS traces), and a stale CacheManager entry turns
    // the second persist into an "already cached" warning plus a
    // silently shared cache whose lifetime nobody owns
    def step(body: => Any): Unit = {
      body
      graft.StateSweep(s)
    }
    step(ensurePurchaseGraph(s, d))
    step(ensureShipmentCycle(s, d))
    step(traceSym2(s, d))
    step(traceThirdRef2(s, d))
    step(traceCycle6(s, d))
    step(traceGrow2(s, d))
    step(traceHits2(s, d))
    step(ensureServingIndex(s, d))
    step(ensureMultiSourceFixture(s, d))
  }

  private def hexOf(xs: Int*): String =
    xs.map(b => f"${b & 0xff}%02x").mkString

  /** q72's synthetic image headers (hand-assembled per the public
    * format specs, same fixtures as ImageMetaSpec): dimensions are
    * pinned in the oracle VALUES.
    */
  private val PngHex = hexOf(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a,
    0x1a, 0x0a, 0, 0, 0, 13, 'I', 'H', 'D', 'R',
    0, 0, 0x01, 0x40, 0, 0, 0x00, 0xf0, 8, 6, 0, 0, 0)
  private val JpegHex = hexOf(0xff, 0xd8,
    0xff, 0xe0, 0, 16, 'J', 'F', 'I', 'F', 0,
    1, 1, 0, 0, 1, 0, 1, 0, 0,
    0xff, 0xfe, 0, 5, 'c', 'm', 't',
    0xff, 0xc0, 0, 17, 8, 0, 48, 0, 64,
    3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
  private val GifHex = hexOf('G', 'I', 'F', '8', '9', 'a',
    0x0c, 0x00, 0x07, 0x00, 0, 0, 0)
  private val BmpHex = hexOf('B', 'M', 70, 0, 0, 0, 0, 0, 0, 0,
    54, 0, 0, 0, 40, 0, 0, 0,
    0x15, 0x00, 0x00, 0x00, 0xef, 0xff, 0xff, 0xff)

  /** q81's synthetic audio headers (same fixtures as AudioMetaSpec):
    * WAV 2ch/44100/16-bit/500 ms, FLAC with the identical stream,
    * a bare MPEG1 Layer-III sync, an OGG page capture pattern.
    */
  private val WavHex = hexOf('R', 'I', 'F', 'F', 0, 0, 0, 0,
    'W', 'A', 'V', 'E', 'f', 'm', 't', ' ', 16, 0, 0, 0,
    1, 0, 2, 0, 0x44, 0xAC, 0, 0, 0x10, 0xB1, 0x02, 0,
    4, 0, 16, 0, 'd', 'a', 't', 'a', 0x88, 0x58, 0x01, 0x00)
  private val FlacHex = hexOf('f', 'L', 'a', 'C', 0, 0, 0, 0x22,
    0x10, 0, 0x10, 0, 0, 0, 0, 0, 0, 0,
    0x0A, 0xC4, 0x42, 0xF0, 0, 0, 0x56, 0x22,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val Mp3Hex = hexOf(0xff, 0xfb, 0x90, 0x00)
  private val OggHex = hexOf('O', 'g', 'g', 'S', 0, 2, 0, 0, 0, 0)

  /** q82's minimal ISO BMFF fixture (same bytes as VideoMetaSpec):
    * ftyp(isom) + moov[mvhd v0: timescale 1000, duration 5000;
    * trak[tkhd v0: 640x360]] — and the Matroska EBML magic.
    */
  private val Mp4Hex: String = {
    def u32(v: Long) = Seq((v >> 24).toInt & 0xff,
      (v >> 16).toInt & 0xff, (v >> 8).toInt & 0xff, v.toInt & 0xff)
    def cc(s: String) = s.map(_.toInt)
    val ftyp = u32(16) ++ cc("ftyp") ++ cc("isom") ++ u32(0x200)
    val mvhd = u32(108) ++ cc("mvhd") ++ Seq(0, 0, 0, 0) ++
      u32(0) ++ u32(0) ++ u32(1000) ++ u32(5000) ++ Seq.fill(80)(0)
    val tkhd = u32(92) ++ cc("tkhd") ++ Seq(0, 0, 0, 0) ++
      u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(0) ++
      Seq.fill(16)(0) ++ Seq.fill(36)(0) ++
      u32(640L << 16) ++ u32(360L << 16)
    val trak = u32(100) ++ cc("trak") ++ tkhd
    val moov = u32(216) ++ cc("moov") ++ mvhd ++ trak
    hexOf((ftyp ++ moov): _*)
  }
  private val MkvHex = hexOf(0x1a, 0x45, 0xdf, 0xa3, 0x01, 0, 0, 0)

  /** q161's mixed-media class list: index = doc_id % 11, the last
    * entry unrecognizable garbage. [[mediaSniffKindSql]] pins the
    * expected (kind, format) per class in the oracle.
    */
  private lazy val MediaSniffHexes: Seq[String] = Seq(
    PngHex, JpegHex, GifHex, BmpHex, WavHex, FlacHex, Mp3Hex,
    OggHex, Mp4Hex, MkvHex, "deadbeef")

  private val MediaSniffClasses: Seq[(String, String)] = Seq(
    "image" -> "png", "image" -> "jpeg", "image" -> "gif",
    "image" -> "bmp", "audio" -> "wav", "audio" -> "flac",
    "audio" -> "mp3", "audio" -> "ogg", "video" -> "mp4",
    "video" -> "matroska", "unknown" -> "unknown")

  /** Run the structure analyzer over a table and dump one
    * (column_name, rendered type) row per column — the q33/q70/q71
    * oracle shape.
    */
  private def analyzeDump(s: SparkSession, df: DataFrame): DataFrame = {
    val rows = new graft.analyzer.SparkAnalyzer()
      .analyzeTable(df) match {
      case l: graft.core.SList => l.content match {
        case dict: graft.core.SDict => dict.content.map(f =>
          (f.key.asInstanceOf[graft.core.SField].value.toString,
            f.value.render))
        case other => Vector(("", other.render))
      }
      case other => Vector(("", other.render))
    }
    import s.implicits._
    rows.toDF("column_name", "inferred")
      .orderBy(col("column_name").asc_nulls_first)
  }

  /** The driver regenerates testdata and `events.ts` has shipped as
    * both TIMESTAMP(NANOS) (reads as long nanos under `nanosAsLong`)
    * and timestamp[us] (reads as TIMESTAMP_NTZ): the temporal
    * builders inspect the column's actual dtype and run gap / window
    * arithmetic in its native unit, so both data shapes work.
    */
  private def tsUnitsPerDay(dt: DataType): Long = dt match {
    case LongType => 86400000000000L // nanos
    case _ => 86400000000L // micros (TIMESTAMP / TIMESTAMP_NTZ)
  }

  /** Epoch-day bucket of `ts` in the column's native representation
    * — ONE definition for every day-bucketed builder (q80, q93, q95,
    * q97, q98), sharing [[tsUnitsPerDay]]'s unit convention so a
    * dtype flip or unit change cannot desynchronize one query's day
    * arithmetic from the rest.
    */
  private def epochDay(ev: DataFrame): Column =
    ev.schema("ts").dataType match {
      case LongType => expr(s"ts DIV ${tsUnitsPerDay(LongType)}")
      case _ => datediff(col("ts").cast("date"),
        to_date(lit("1970-01-01"))).cast("long")
    }

  /** Location of q67's persisted serving index; the oracle SQL embeds
    * the same path, so it must be stable within one JVM (queries and
    * oracleSql are built together). Per-process so two concurrent
    * graft JVMs never race each other's index builds — a fixed path
    * produced phantom q67 diffs when e.g. Verify and ExplainAudit
    * overlapped.
    */
  private val ServingIndexDir =
    "/tmp/graft_serving_index_" + ProcessHandle.current().pid()

  /** Build-and-persist the PQ + IVF index for `sfDir` unless the
    * on-disk copy was already built from exactly this directory (a
    * marker file records the source). q64's parameters (dims=64,
    * m=4, ksub=4, IVF k=4, iters=2), so the two queries pin the same
    * composition — one timed with training, one serving-only.
    */
  /** Best-effort deletion of serving-index dirs left by DEAD
    * processes (a shutdown hook can't do it: the DuckDB oracle reads
    * the index AFTER the JVM that built it exits). Age-gated so a
    * freshly-exited Verify's index survives long enough for its
    * oracle run; bounds the /tmp growth of the per-pid scheme.
    */
  private def sweepStaleServingIndexes(): Unit =
    try {
      val tmp = java.nio.file.Paths.get("/tmp")
      val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
      val it = java.nio.file.Files.list(tmp).iterator()
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        if ((name.startsWith("graft_serving_index_") ||
              name.startsWith("graft_multisrc_") ||
              name.startsWith("graft_purchase_graph_")) &&
            p.toString != ServingIndexDir &&
            p.toString != MultiSrcDir &&
            p.toString != PurchaseGraphDir &&
            java.nio.file.Files.getLastModifiedTime(p).toMillis <
              cutoff) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(p).iterator().asScala.toSeq
            .reverse.foreach(f =>
              try java.nio.file.Files.deleteIfExists(f)
              catch { case _: Throwable => () })
        }
      }
    } catch { case _: Throwable => () }

  private def ensureServingIndex(s: SparkSession, d: String): String = {
    sweepStaleServingIndexes()
    val dir = ServingIndexDir
    val marker = java.nio.file.Paths.get(dir, "_built_from")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == d
    if (!fresh) {
      val emb = t(s, d, "embeddings")
      val assign = Similarity.pqAssign(emb, "vec_id", "embedding",
        dims = 64, m = 4, ksub = 4, iters = 2)
      Similarity.writePqIndex(Similarity.PqIndex(
        Similarity.pqCodes(assign),
        Similarity.pqCodebooks(emb, "vec_id", "embedding",
          dims = 64, m = 4, assign)), s"$dir/pq")
      Similarity.writeIvfIndex(Similarity.buildIvfIndex(emb,
        "vec_id", "embedding", k = 4, iters = 2), s"$dir/ivf")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir))
      java.nio.file.Files.write(marker,
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    dir
  }

  /** Location of q109's mixed-format fixture (JSONL + CSV + YAML
    * shards of one logical table), per-process like the serving
    * index so concurrent graft JVMs never race the writes.
    */
  private val MultiSrcDir =
    "/tmp/graft_multisrc_" + ProcessHandle.current().pid()

  /** Derive the q109 fixture deterministically from the documents
    * table: the 300 smallest doc_ids as (doc_id, ntok, score) rows,
    * sharded by doc_id % 3 into a JSONL file, a CSV file, and a
    * YAML file. Every value round-trips exactly through all three
    * text formats (longs, and floats with an exact binary fraction),
    * so the DuckDB oracle can re-derive the merged verdicts from
    * the parquet table alone.
    */
  private def ensureMultiSourceFixture(s: SparkSession,
                                       d: String): String = {
    sweepStaleServingIndexes()
    val dir = MultiSrcDir
    val marker = java.nio.file.Paths.get(dir, "_built_from")
    val fresh = java.nio.file.Files.exists(marker) &&
      new String(java.nio.file.Files.readAllBytes(marker),
        java.nio.charset.StandardCharsets.UTF_8) == d
    if (!fresh) {
      val rows = s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .as("ntok"))
        .orderBy(col("doc_id").asc)
        .limit(300)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir))
      def write(name: String, body: String): Unit =
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, name),
          body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // every shard ships STRING-typed values (quoted in JSON/YAML;
      // CSV is strings by the reference quirk): a CSV source always
      // analyzes as `str of int`, and mixing that with native-int
      // JSON degrades the fold to ⊤ (reference mixed-type-list
      // semantics) — string-typed exports keep all three trees
      // structurally matched so the merged verdict is the UNION's
      // numeric-string range, the shape this query gates
      def score(ntok: Long): String = s"$ntok.5"
      val shards = rows.groupBy { case (id, _) => id % 3 }
      write("part0.jsonl", shards.getOrElse(0L, Array.empty)
        .map { case (id, nt) =>
          s"""{"doc_id": "$id", "ntok": "$nt", "score": "${score(nt)}"}"""
        }.mkString("", "\n", "\n"))
      write("part1.csv", "doc_id,ntok,score\n" +
        shards.getOrElse(1L, Array.empty)
          .map { case (id, nt) => s"$id,$nt,${score(nt)}" }
          .mkString("", "\n", "\n"))
      write("part2.yaml", shards.getOrElse(2L, Array.empty)
        .map { case (id, nt) =>
          s"- doc_id: '$id'\n  ntok: '$nt'\n  score: '${score(nt)}'"
        }.mkString("", "\n", "\n"))
      java.nio.file.Files.write(marker,
        d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- graph centrality ----------------------------------------
    // PageRank over the customer→supplier purchase graph — the
    // link-quality prior a web-curation run computes (Page et al.
    // 1999) in EXACT scaled integers (q120's floor-division rule):
    // every iteration is one edges⋈ranks shuffle + one keyed sum,
    // dangling mass and N ride 1-row broadcasts. Top-10 by final
    // score, id tie-break
    "q152_pagerank" -> ((s, d) => {
      Graph.pagerank(purchaseEdges(s, d), iterations = 3)
        .select(col("node"), col("pr").cast("long").as("pr"))
        .orderBy(col("pr").desc, col("node").asc_nulls_first)
        .limit(10)
    }),

    // TrustRank (Gyöngyi et al. VLDB 2004): teleport + dangling mass
    // target ONLY the seed set (suppliers from nations 0-4), so every
    // unit of score provably originated at a seed and travelled the
    // (symmetrized) purchase links; census per node kind pins the
    // full score distribution, not just the head
    "q153_trustrank" -> ((s, d) => {
      // the shared parquet fixture makes each union branch a plain
      // column-pruned scan — no localCheckpoint needed
      val cs = purchaseEdges(s, d)
      val edges = cs.unionByName(
        cs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, d, "supplier")
        .where(col("s_nationkey") < 5)
        .select(concat(lit("s"), col("s_suppkey")).as("node"))
      Graph.pagerank(edges, iterations = 3, seeds = Some(seeds))
        .groupBy(substring(col("node"), 1, 1).as("kind"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("pr")).cast("long").as("sum_pr"),
          max(col("pr")).cast("long").as("max_pr"),
          count(when(col("pr") === 0, 1)).as("n_zero"))
        .orderBy(col("kind").asc_nulls_first)
    }),

    // HTML text extraction census — the step-zero markup strip of a
    // web-corpus pipeline (C4/RefinedWeb ingest markup, not clean
    // text): one native codegen'd pass per document over the
    // in-plan messy-HTML fixture, emitting text + title + link and
    // paragraph counts; the census pins every construct's
    // extraction against hand-derived oracle VALUES
    "q167_html_extract" -> ((s, d) => {
      val html = element_at(array(HtmlVariants.map(lit): _*),
        (pmod(col("doc_id"), lit(12)) + 1).cast("int"))
      t(s, d, "documents")
        .select(pmod(col("doc_id"), lit(12)).as("variant"),
          graft.functions.HtmlTextExpr.htmlExtract(html).as("h"))
        .groupBy(col("variant"), col("h.text").as("text"),
          col("h.title").as("title"),
          col("h.n_links").cast("long").as("n_links"),
          col("h.n_paragraphs").cast("long").as("n_paragraphs"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("variant").asc)
    }),

    // INCREMENTAL PageRank (the q63/q128 delta discipline applied to
    // the iterative family): fold a delta edge batch — a reinforcing
    // second copy of the ~1/7 of symmetrized purchase edges whose
    // traded quantity divides 7 — into a converged 3-round trace,
    // re-iterating ONLY the affected frontier. The oracle replays
    // the FULL rank on base ∪ delta, so a hash match PROVES
    // delta-fold == full re-run on real data
    "q169_pagerank_delta" -> ((s, d) => {
      val sym = symPurchase(s, d)
      val base = sym.select(col("src"), col("dst"))
      val delta = sym.where(pmod(col("w"), lit(7)) === 0)
        .select(col("src"), col("dst"))
      // 2 rounds: the equivalence proof is iteration-count-agnostic.
      // The trace is a PERSISTED fixture (built once per process —
      // the incremental contract: a fold consumes the prior run's
      // on-disk scores, it never re-ranks to get them)
      val trace = traceSym2(s, d)
      Graph.pagerankDelta(base, delta, trace)
        .select(col("node"), col("pr").cast("long").as("pr"))
        .orderBy(col("pr").desc, col("node").asc_nulls_first)
        .limit(10)
    }),

    // the COMPOSED web-corpus step-zero chain: markup-wrapped docs
    // → html_extract (title/link structure verified in the census)
    // → language-ID trained AND scored on the EXTRACTED text — the
    // real pipeline order. The wrapper is built so extraction
    // returns exactly the underlying sentence (anchor text empty,
    // title outside the text stream), so the oracle replays the
    // whole chain from the raw fixture while the engine genuinely
    // parses markup end-to-end
    "q170_web_pipeline" -> ((s, d) => {
      val wrapped = concat(lit("<html><head><title>doc</title>" +
        "</head><body>\n<p>"), langText(col("doc_id")),
        lit("</p>\n<a href=\"/next\"></a></body></html>"))
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("l"), pmod(col("doc_id"), lit(3)))
            .as("true_label"),
          graft.functions.HtmlTextExpr.htmlExtract(wrapped).as("h"))
        .select(col("doc_id"), col("true_label"),
          col("h.text").as("t"), col("h.title").as("title"),
          col("h.n_links").cast("long").as("nl"))
      val model = LangModel.trainLangId(
        docs.where(pmod(col("doc_id"), lit(5)) =!= 0),
        col("true_label"), col("t"))
      docs.where(pmod(col("doc_id"), lit(5)) === 0)
        .select(col("true_label"),
          LangModel.langIdStruct(model, col("t"))
            .getField("pred").as("pred"),
          col("title"), col("nl"))
        .groupBy(col("true_label"), col("pred"))
        .agg(count(lit(1)).as("n"),
          sum(col("nl")).cast("long").as("n_links"),
          count(when(col("title") === "doc", 1)).as("n_titled"))
        .orderBy(col("true_label").asc_nulls_first,
          col("pred").asc_nulls_first)
    }),

    // the REMOVAL direction of incremental PageRank: q169's
    // reinforced graph is the OLD state, the plain symmetrized
    // graph the NEW — pagerankRefresh diffs the per-source edge
    // multisets, seeds the frontier from the changed sources'
    // out-neighbors in BOTH frames (a removal dirties nodes the new
    // frame no longer reaches from that source), and re-iterates
    // only that frontier; the oracle replays the full rank on the
    // new frame, so the hash match proves refresh == re-run under
    // edge deletion
    "q173_pagerank_refresh" -> ((s, d) => {
      // a third of the purchase graph (custkey ≡ 0 mod 3): the
      // removal-equivalence proof is graph-size-agnostic, and q169
      // already prices the full graph's fold
      val we = thirdPurchase(s, d)
      val sym = we.select(col("src"), col("dst"), col("w"))
        .unionByName(we.select(col("dst").as("src"),
          col("src").as("dst"), col("w")))
      val neu = sym.select(col("src"), col("dst"))
      val old = thirdOldEdges(s, d)
      val trace = traceThirdRef2(s, d)
      Graph.pagerankRefresh(old, neu, trace)
        .select(col("node"), col("pr").cast("long").as("pr"))
        .orderBy(col("pr").desc, col("node").asc_nulls_first)
        .limit(10)
    }),

    // SMALL-delta incremental PageRank — the fold's production
    // profile. Frontier locality needs a SPARSE graph (on the dense
    // purchase graph ANY delta's one-hop out-neighborhood covers
    // ~every node — measured: 15995 of 15999 — so q169 there proves
    // correctness, not speed): this one ranks the
    // shipment-succession CYCLE graph (each line item links to the
    // supplier's next shipment, the last wraps to the first —
    // out-degree exactly 1, |V| = |E| = |lineitem|, no dangling by
    // construction). The delta reinforces the ~1% of cycles owned
    // by suppkey ≡ 0 (mod 100); over 6 rounds the dirty frontier
    // stays a few % of the nodes, so the fold does frontier-sized
    // rounds where the bench twin q175 re-ranks all |lineitem|
    // nodes 6 times: BENCH q174 < q175 is the measured incremental
    // win, same pinned answer both ways
    "q174_pagerank_small_delta" -> ((s, d) =>
      q174Fold(s, d, maxBroadcastBytes = 128L << 20)),

    // q174's from-scratch twin: the full 6-round re-rank of the
    // SAME base ∪ small-delta frame — the cost the fold replaces.
    // Identical oracle SQL as q174 (they must hash-match each
    // other); its bench timing is the baseline q174 beats
    "q175_pagerank_rerank_baseline" -> ((s, d) => {
      val cyc = ensureShipmentCycle(s, d)
      val base = cyc.select(col("src"), col("dst"))
      val delta = cyc.where(pmod(col("supp"), lit(100)) === 0)
        .select(col("src"), col("dst"))
      Graph.pagerank(base.unionAll(delta), iterations = 6)
        .select(col("node"), col("pr").cast("long").as("pr"))
        .orderBy(col("pr").desc, col("node").asc_nulls_first)
        .limit(10)
    }),

    // NODE-ADDING incremental PageRank (the crawl-batch case: new
    // pages arrive with every delta): the base graph omits every
    // purchase pair whose supplier key divides 7, the delta
    // reintroduces them — those suppliers (and any customer who
    // only traded with them) are NEW nodes, folded by the analytic
    // rebase (dangling-free + unseeded ⇒ every score is
    // N-invariant, so the old trace stays valid verbatim and added
    // nodes enter at round-0 mass `scale`, permanently dirty). The
    // oracle replays the FULL rank over the whole symmetrized
    // graph; the per-kind census sums EVERY node's score, so the
    // hash match proves the grown fold == full re-run on all nodes,
    // added ones included
    "q176_pagerank_grow" -> ((s, d) => {
      // the custkey ≡ 0 (mod 3) third of the purchase graph (the
      // q173 discipline: the grow-equivalence proof is
      // graph-size-agnostic, and q169 already prices the full
      // graph's fold)
      val we = thirdPurchase(s, d)
      val sevenSupp =
        pmod(substring(col("dst"), 2, 18).cast("long"), lit(7)) === 0
      val base = growBaseEdges(s, d)
      val delta = we.where(sevenSupp)
        .select(col("src"), col("dst"))
        .unionByName(we.where(sevenSupp)
          .select(col("dst").as("src"), col("src").as("dst")))
      val trace = traceGrow2(s, d)
      Graph.pagerankDelta(base, delta, trace)
        .groupBy(substring(col("node"), 1, 1).as("kind"))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("pr")).cast("long").as("sum_pr"),
          max(col("pr")).cast("long").as("max_pr"))
        .orderBy(col("kind").asc_nulls_first)
    }),

    // DECREMENTAL clustering (the missing half of q171's addition
    // fold): build the ClusterState artifact — labels + the
    // label-tagged verified PAIR STORE — then retract the mod-17
    // docs (the PII-takedown shape); only the AFFECTED components'
    // stored pairs re-close, splits included, and survivors whose
    // every pair died keep singleton self-labels. The oracle
    // re-clusters the surviving pairs from scratch, so the hash
    // match proves retract == full re-cluster. Budget 1/1 here: the
    // fixture's near-dup graph is small enough that a mod-17 sweep
    // can touch most stored pairs; the refusal knob itself is
    // RetractSpec-pinned
    "q177_retract_clusters" -> ((s, d) => {
      val pairs = Dedup.jaccardPairs(t(s, d, "documents"),
          col("doc_id"), col("text"), shingleK = 5, thresholdNum = 1,
          thresholdDen = 5, maxShingleDf = 10000L)
        .select(col("id1"), col("id2"))
        .localCheckpoint()
      val state = Dedup.clusterState(pairs)
      val removed = t(s, d, "documents")
        .where(pmod(col("doc_id"), lit(17)) === 0)
        .select(col("doc_id").as("id"))
      val after = Dedup.retractFromComponents(state, removed,
        maxShareNum = 1L, maxShareDen = 1L)
      val sizes = after.labels.groupBy(col("label"))
        .agg(count(lit(1)).as("sz"))
      after.labels.agg(count(lit(1)).as("n_clustered_docs"),
          countDistinct(col("label")).as("n_clusters"))
        .crossJoin(broadcast(
          sizes.agg(max(col("sz")).as("max_cluster_size"))))
        .crossJoin(broadcast(
          after.pairs.agg(count(lit(1)).as("n_pairs"))))
    }),

    // INCREMENTAL HITS (the q169 trace+fold discipline on the
    // hub/authority family): q157's per-round L1 renormalization
    // cannot fold — every round's divisor is global — so the
    // incremental form runs Kleinberg's RAW power iteration
    // (hitsDeferred: linear recurrences, ONE final normalization)
    // and folds the reinforcing mod-7 purchase delta against its
    // persisted raw trace, alternating a- and h-frontiers. The
    // oracle replays the full deferred run over base ∪ delta, so
    // the hash match proves fold == re-run
    "q178_hits_delta" -> ((s, d) => {
      val we = ensurePurchaseGraph(s, d)
      val base = we.select(col("src"), col("dst"))
      val delta = we.where(pmod(col("w"), lit(7)) === 0)
        .select(col("src"), col("dst"))
      val trace = traceHits2(s, d)
      Graph.hitsDelta(base, delta, trace)
        .select(col("node"), col("hub").cast("long").as("hub"),
          col("auth").cast("long").as("auth"))
        .orderBy(col("auth").desc, col("hub").desc,
          col("node").asc_nulls_first)
        .limit(10)
    }),

    // TRAINED language identification (the CCNet curation step): a
    // char-TRIGRAM naive-Bayes model trained in whole bits on the
    // labeled 80% slice (one keyed agg + a priced collect; n = 3 is
    // where close natural languages start to separate — the n = 2
    // form remains exercised end-to-end by q170), applied to the
    // held-out 20% as a stateless codegen'd projection (no join at
    // scoring time — the hashClassifierScore shape); the confusion
    // census pins train AND argmax end-to-end
    "q168_langid" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("l"), pmod(col("doc_id"), lit(3)))
            .as("true_label"),
          langText(col("doc_id")).as("t"))
      val model = LangModel.trainLangId(
        docs.where(pmod(col("doc_id"), lit(5)) =!= 0),
        col("true_label"), col("t"), n = 3)
      LangModel.langIdCensus(
          docs.where(pmod(col("doc_id"), lit(5)) === 0),
          col("true_label"), model, col("t"))
        .orderBy(col("true_label").asc_nulls_first,
          col("pred").asc_nulls_first)
    }),

    // PERCEPTUAL image near-dup (the pixel-level step past q72's
    // header sniff): 40 real BMPs (9×8 and 18×16
    // 2×2-block variants of five pattern families), hashed by the
    // native decode→downsample→dHash/aHash expressions, paired by
    // the banded Hamming join + exact bit_count verify. The oracle
    // re-derives every pixel, both hashes, and the pair set from
    // the generating formula INDEPENDENTLY — a hash match proves
    // the whole encode→decode→hash→join chain, not a pinned VALUES
    // list
    "q179_image_neardups" -> ((s, d) => {
      import s.implicits._
      val imgs = (0L until 40L).map(i => (i, q179Bmp(i)))
        .toDF("id", "payload")
      val hashes = Dedup.imageHashes(imgs, col("id"),
        col("payload"))
      val pairs = Dedup.imageNearDups(hashes, maxHamming = 4)
      hashes.select(lit("h").as("kind"), col("id").as("a"),
          col("dhash").as("b"), col("ahash").as("v"))
        .unionByName(pairs.select(lit("p").as("kind"),
          col("id1").as("a"), col("id2").as("b"),
          col("hamming").as("v")))
        .orderBy(col("kind").asc, col("a").asc, col("b").asc)
    }),

    // EXIF PII scan + redaction (the q50 discipline on multimodal
    // payloads): hand-assembled JPEGs — GPS-tagged, tagged-no-GPS,
    // untagged — through the native APP1/TIFF walk, each re-scanned
    // AFTER exif_strip to prove the redaction, plus the whole
    // documents corpus as binary (text can never begin FF D8, so
    // every row must be a null struct, never a throw)
    "q180_exif_pii" -> ((s, d) => {
      import s.implicits._
      val fixtures = Seq(
        ("gps_tagged", q180Jpeg(Some((true, "Acme", "Cam 1",
          "2024:01:02 03:04:05", 6, true)))),
        ("clean_exif", q180Jpeg(Some((false, "Lumen", "Z9",
          "2023:11:05 10:00:00", 1, false)))),
        ("no_exif", q180Jpeg(None)))
        .toDF("name", "payload")
      val m = Multimodal.exifMeta(col("payload"))
      val ms = Multimodal.exifMeta(
        Multimodal.exifStrip(col("payload")))
      val fx = fixtures.select(col("name"),
        m.getField("has_exif").as("has_exif"),
        m.getField("has_gps").as("has_gps"),
        m.getField("make").as("make"),
        m.getField("model").as("model"),
        m.getField("datetime").as("datetime"),
        m.getField("orientation").as("orientation"),
        coalesce(ms.getField("has_gps"), lit(false))
          .as("gps_after_strip"),
        lit(1L).as("n"))
      val corpus = t(s, d, "documents")
        .select(Multimodal.exifMeta(col("text").cast("binary"))
          .as("m"))
        .agg(count(when(col("m").isNull, 1)).as("n"))
        .select(lit("corpus").as("name"),
          lit(false).as("has_exif"), lit(false).as("has_gps"),
          lit(null).cast("string").as("make"),
          lit(null).cast("string").as("model"),
          lit(null).cast("string").as("datetime"),
          lit(null).cast("int").as("orientation"),
          lit(false).as("gps_after_strip"), col("n"))
      fx.unionByName(corpus).orderBy(col("name").asc_nulls_first)
    }),

    // content-level audio (q179's discipline on PCM): 30 WAV clips
    // (5 envelope families × 6 variants, one window silenced per
    // variant) through the native decode→window-energy→fingerprint
    // chain, paired by the banded Hamming join, stats per clip, and
    // the whole documents corpus as binary (text never decodes as
    // PCM WAV → every row must be null, never a throw). The oracle
    // re-derives amplitudes, energies, both features and the pair
    // set from the generating formula INDEPENDENTLY
    "q181_audio_neardups" -> ((s, d) => {
      import s.implicits._
      val clips = (0 until 30).map(i => (i.toLong, q181Wav(i)))
        .toDF("id", "payload")
      val feats = clips.select(col("id"),
        Multimodal.audioFingerprint(col("payload")).as("fp"),
        Multimodal.audioStats(col("payload")).as("st"))
      val hashes = feats.select(col("id"), col("fp"))
        .where(col("fp").isNotNull)
      val pairs = Dedup.hammingNearDups(hashes, "fp", maxHamming = 4)
      val fRows = feats.select(lit("f").as("kind"), col("id").as("a"),
        col("fp").as("b"), col("st.n_samples").as("v"))
      val sRows = feats.select(lit("s").as("kind"), col("id").as("a"),
        col("st.peak").cast("long").as("b"),
        col("st.silent_windows").cast("long").as("v"))
      val pRows = pairs.select(lit("p").as("kind"),
        col("id1").as("a"), col("id2").as("b"),
        col("hamming").as("v"))
      val corpus = t(s, d, "documents")
        .select(Multimodal.audioStats(col("text").cast("binary"))
          .as("m"))
        .agg(count(when(col("m").isNull, 1)).as("n"))
        .select(lit("c").as("kind"), col("n").as("a"),
          lit(0L).as("b"), lit(0L).as("v"))
      fRows.unionByName(sRows).unionByName(pRows).unionByName(corpus)
        .orderBy(col("kind").asc, col("a").asc, col("b").asc)
    }),

    // content-level video: 6 AVI clips (static scenes cut every
    // 3+id%3 frames) through the native container walk → per-frame
    // DIB decode → dHash chain, then shot-boundary detection as a
    // plain lag window over the exploded (id, t, hash) frames —
    // consecutive-frame Hamming distance > 4 marks a cut. The
    // oracle re-derives every frame's pixels, hash and the boundary
    // set from the generating formula INDEPENDENTLY; the corpus
    // sweep pins text-as-binary to null, never a throw
    "q182_video_shots" -> ((s, d) => {
      import s.implicits._
      val clips = (0 until 6).map(i => (i.toLong, q182Avi(i)))
        .toDF("id", "payload")
      val frames = clips.select(col("id"),
          explode(Multimodal.videoFrameHashes(col("payload")))
            .as("f"))
        .select(col("id"), col("f.idx").cast("long").as("t"),
          col("f.dhash").as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy("t")
      val withPrev = frames.withColumn("ph", lag(col("h"), 1).over(w))
      val bounds = withPrev.where(col("ph").isNotNull)
        .select(col("id"), col("t"),
          bit_count(col("h").bitwiseXOR(col("ph"))).cast("long")
            .as("hm"))
        .where(col("hm") > 4)
      val hRows = frames.select(lit("h").as("kind"),
        col("id").as("a"), col("t").as("b"), col("h").as("v"))
      val bRows = bounds.select(lit("b").as("kind"),
        col("id").as("a"), col("t").as("b"), col("hm").as("v"))
      val corpus = t(s, d, "documents")
        .select(Multimodal.videoFrameHashes(col("text")
          .cast("binary")).as("m"))
        .agg(count(when(col("m").isNull, 1)).as("n"))
        .select(lit("c").as("kind"), col("n").as("a"),
          lit(0L).as("b"), lit(0L).as("v"))
      hRows.unionByName(bRows).unionByName(corpus)
        .orderBy(col("kind").asc, col("a").asc, col("b").asc)
    }),

    // sequence-level video dedup: 8 clips in 4 pairs — each odd clip
    // re-cuts its even twin with a different opening scene, keeping
    // the other 3 scenes bit-identical — joined clip×clip ONLY
    // through exact shared frame hashes (hash-collision-sized
    // candidates, hot-frame guard), never a pairwise scan. The
    // oracle re-derives every frame hash and the shared-count pair
    // set from the generating formula INDEPENDENTLY
    "q183_video_dups" -> ((s, d) => {
      import s.implicits._
      val clips = (0 until 8).map { i =>
        val g = i / 2
        val seeds = (0 until 12).map(t => g * 31 + (t / 3) * 7 +
          (if (i % 2 == 1 && t / 3 == 0) 997 else 0))
        (i.toLong, aviFromSeeds(seeds))
      }.toDF("id", "payload")
      val frames = clips.select(col("id"),
          explode(Multimodal.videoFrameHashes(col("payload")))
            .as("f"))
        .select(col("id"), col("f.dhash").as("dhash"))
      val pairs = Dedup.videoNearDups(frames, minShared = 3)
      val nRows = frames.groupBy("id")
        .agg(countDistinct(col("dhash")).as("nd"),
          count(lit(1)).as("nf"))
        .select(lit("n").as("kind"), col("id").as("a"),
          col("nd").as("b"), col("nf").as("v"))
      val pRows = pairs.select(lit("p").as("kind"),
        col("id1").as("a"), col("id2").as("b"),
        col("shared_frames").as("v"))
      nRows.unionByName(pRows)
        .orderBy(col("kind").asc, col("a").asc, col("b").asc)
    }),

    // pre-flight join sizing: the Count-Min inner-product bound
    // (never below the true equi-join cardinality — colliding keys
    // only add) vs the exact join count; the "price the join before
    // running it" primitive, from two key scans + two sketch-sized
    // frames. Salted md5 buckets make the estimate a pure function
    // of the data, so the oracle pins it EXACTLY
    "q166_join_size_estimate" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey").cast("string").as("k"))
      val o = t(s, d, "orders")
        .select(col("o_orderkey").cast("string").as("k"))
      // BOTH sides' sketches from ONE tagged-union pass (the bucket
      // hash ignores the group, so per-side counters are identical
      // to two separate builds — the oracle replays them as such);
      // the eager checkpoint makes the build a single job the
      // sketch-sized estimate then reads twice
      val cm = Sketches.countMinTable(
          li.select(col("k"), lit("a").as("side"))
            .unionByName(o.select(col("k"), lit("b").as("side"))),
          col("side"), col("k"), w = 4096, d = 4)
        .localCheckpoint(true)
      def side(g: String) = cm.where(col("group") === g)
        .select(lit("t").as("group"), col("row"), col("bucket"),
          col("cnt"))
      val est = Sketches.cmJoinSizeEstimate(side("a"), side("b"),
        d = 4)
      // the orders key column is MBs — broadcast it so the exact
      // side is one streamed lineitem scan, never a sort-merge
      val exact = li.join(broadcast(o), Seq("k"))
        .agg(count(lit(1)).as("exact_join_rows"))
      est.crossJoin(broadcast(exact))
        .select(col("est_join_rows"), col("exact_join_rows"),
          (col("est_join_rows") >= col("exact_join_rows"))
            .as("no_undercount"),
          expr("(est_join_rows * 10000) DIV nullif(" +
            "exact_join_rows, 0)").as("est_ratio_bp"))
    }),

    // BFS hop census from the trust seeds: how many nodes sit at
    // each minimum hop distance (the contamination blast-radius /
    // trust-coverage diagnostic pairing with q153); hops beyond 4
    // count as unreachable (NULL)
    "q165_hop_census" -> ((s, d) => {
      val cs = purchaseEdges(s, d)
      val edges = cs.unionByName(
        cs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, d, "supplier")
        .where(col("s_nationkey") < 5)
        .select(concat(lit("s"), col("s_suppkey")).as("node"))
      Graph.hopCensus(edges, seeds, maxHops = 4)
        .orderBy(col("hop").asc_nulls_first)
    }),

    // WEIGHTED PageRank: the purchase graph with trade volume as
    // edge weight — mass splits proportionally to Σ quantity per
    // partner (share = floor(pr·w / Σw), the generalized exact
    // update; quantities are integral doubles, so the long cast is
    // exact in both engines)
    "q163_pagerank_weighted" -> ((s, d) => {
      val we = ensurePurchaseGraph(s, d)
      Graph.pagerank(we, iterations = 3, weight = Some(col("w")))
        .select(col("node"), col("pr").cast("long").as("pr"))
        .orderBy(col("pr").desc, col("node").asc_nulls_first)
        .limit(10)
    }),

    // media content-type sniff census: a MIXED binary column (all
    // ten real header fixtures + garbage, in-plan per doc_id — the
    // q72 pattern) routed by ONE projection evaluating all three
    // header decoders; the census pins every class's classification
    "q161_media_sniff" -> ((s, d) => {
      val blobs = t(s, d, "documents").select(
        unhex(element_at(array(MediaSniffHexes.map(lit): _*),
          (pmod(col("doc_id"), lit(11)) + 1).cast("int")))
          .as("payload"))
      blobs.select(Multimodal.sniffMedia(col("payload")).as("sn"))
        .groupBy(col("sn.kind").as("kind"),
          col("sn.format").as("format"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("kind").asc_nulls_first,
          col("format").asc_nulls_first)
    }),

    // whole-bit Zipf fit over the corpus word table: the
    // vocabulary-health diagnostic (freq ∝ rank^-1 for natural
    // text) as an exact rational slope — same no-division contract
    // as q156
    "q162_zipf_fit" -> ((s, d) =>
      LangModel.zipfFit(graft.operators.Unigram.wordFreqs(
        t(s, d, "documents"), col("text")))),

    // unigram ENCODE census per source: the trained segmentation
    // applied to every token occurrence (word-keyed join, the q141
    // model shape) — the fertility/compression numbers a tokenizer
    // evaluation reads at document level
    "q164_unigram_encode" -> ((s, d) =>
      graft.operators.Unigram.encodeCensus(t(s, d, "documents"),
          col("source"), col("text"))
        .withColumnRenamed("grp", "source")
        .orderBy(col("source").asc_nulls_first)),

    // winsorization census per event type: exact positional p01/p99
    // clip bounds (value copies, no interpolation) + clip-side row
    // counts. Rows reduce FIRST to (key, value) counts; the window
    // runs over that distinct-values frame, never raw rows
    "q160_winsor_census" -> ((s, d) =>
      graft.operators.OrderStats.winsorCensus(t(s, d, "events"),
          col("event_type"), col("value"))
        .withColumnRenamed("k", "event_type")
        .orderBy(col("event_type").asc_nulls_first)),

    // first-order Markov transition census over the event stream
    // (session behavior modeling): per-user consecutive event pairs
    // under the (ts, event_id) total order, counted corpus-wide;
    // share in exact basis points (floor cross-division both
    // engines compute identically). One keyed window + one keyed agg
    "q158_transitions" -> ((s, d) => {
      val pairs = Temporal.transitionCensus(t(s, d, "events"),
          col("user_id"), col("event_type"),
          Seq(col("ts"), col("event_id")))
        .localCheckpoint()
      val tot = pairs.agg(sum(col("n")).cast("long").as("tot"))
      pairs.crossJoin(broadcast(tot))
        .select(col("prev"), col("next"), col("n").cast("long"),
          expr("(n * 10000) DIV tot").as("share_bp"))
        .orderBy(col("n").desc, col("prev").asc_nulls_first,
          col("next").asc_nulls_first)
        .limit(15)
    }),

    // key-skew census (the "salt this join?" advisor pairing with
    // q91's salted join): per-key counts → exact-rational Gini
    // concentration (num/den, no division), verdict by
    // cross-multiplication. The rank window sees only the keys-sized
    // count frame
    "q159_skew_census" -> ((s, d) =>
      Layout.skewCensus(t(s, d, "lineitem"), col("l_suppkey"))),

    // HITS hubs/authorities over the purchase graph (Kleinberg
    // 1999): exact scaled-integer half-steps with L1
    // renormalization (floor divisions both engines replay);
    // top-10 authorities with their hub scores
    "q157_hits" -> ((s, d) =>
      Graph.hits(purchaseEdges(s, d), iterations = 2)
        .select(col("node"), col("hub").cast("long").as("hub"),
          col("auth").cast("long").as("auth"))
        .orderBy(col("auth").desc, col("node").asc_nulls_first)
        .limit(10)),

    // exact OLS trend per event type: slope over (day, daily count)
    // points as an EXACT RATIONAL (num, den) — no division, so both
    // engines agree bit-for-bit; direction = sign(num). Two keyed
    // aggregations, zero joins/windows — the metric-drift triage a
    // pipeline runs over its ingest volumes
    "q156_trend_fit" -> ((s, d) => {
      val ev = t(s, d, "events")
      Temporal.trendFit(ev, col("event_type"), epochDay(ev))
        .withColumnRenamed("key", "event_type")
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // URL canonicalization census (the normalize-before-dedup step
    // of C4/RefinedWeb-style crawl pipelines): a messy in-plan URL
    // per document (cased schemes/hosts, www., default ports,
    // trailing slashes, unsorted params, fragments — the q72
    // in-plan-fixture pattern), canonicalized by pure codegen'd
    // column rules; per-host census pins raw→canonical collapse
    "q155_url_canon" -> ((s, d) => {
      val u = t(s, d, "documents")
        .select(messyUrl(col("doc_id")).as("url"))
      u.select(col("url"),
          Urls.canonicalizeUrl(col("url")).as("canon"),
          Urls.urlHost(col("url")).as("host"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("url")).as("n_raw"),
          countDistinct(col("canon")).as("n_canon"),
          // long md5-prefix checksum keeps the agg hash-based (the
          // q144 rule — a string min would fall to SortAggregate)
          min(conv(substring(md5(col("canon")), 1, 15), 16, 10)
            .cast("long")).as("min_md5_prefix"))
        .orderBy(col("host").asc_nulls_first)
    }),

    // unigram-LM (SentencePiece-family) segmentation census: build
    // the whole-bit-scored substring vocabulary from the word table,
    // Viterbi-split every distinct word (native codegen'd DP — the
    // q117 sequential-state rule), census by optimal piece count.
    // The packed objective (bits·64 + pieces) makes the optimum's
    // bit total AND piece count unique, so DuckDB replays the DP as
    // a recursive CTE and hash-matches exactly
    "q154_unigram_segment" -> ((s, d) =>
      graft.operators.Unigram.segmentCensus(
        t(s, d, "documents"), col("text"))),

    // ---- text analysis -------------------------------------------
    // CCNet-recipe LM quality filter: train an add-one bigram model
    // on the trusted slice (source = src0), score every other doc's
    // cross-entropy in EXACT whole bits (floor-log2 via binary
    // string length — no transcendental an engine could round
    // apart), census per source with the high-perplexity tail
    // flagged at the 50-decibit (5 bits/bigram) cut. Model = one keyed agg
    // over the trusted slice; scoring = one shuffle join on the
    // bigram key that AQE broadcasts when the model fits
    "q141_lm_bits" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val (bi, uni, vocab) = LangModel.trainBigram(
        docs.where(col("source") === "src0"), col("text"))
      LangModel.crossEntropyBits(
          docs.where(col("source") =!= "src0"),
          Seq(col("source"), col("doc_id")), col("text"),
          bi, uni, vocab)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).cast("long").as("n_bigrams"),
          sum(col("n_unseen")).cast("long").as("n_unseen"),
          sum(col("bits")).cast("long").as("sum_bits"),
          min(col("decibits")).as("min_decibits"),
          max(col("decibits")).as("max_decibits"),
          count(when(col("decibits") >= 50, 1))
            .as("n_flagged"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // PMI collocation mining (word2phrase): bigrams beating
    // independence 2x with support >= 3 — the phrase-vocab pass a
    // tokenizer build runs. Products in DECIMAL(38,0) so the gate is
    // exact at any corpus size; whole-bit PMI for the ranking column
    "q142_collocations" -> ((s, d) =>
      LangModel.collocations(t(s, d, "documents"), col("text"),
          minCount = 3L, num = 2L, den = 1L)
        .orderBy(col("c_bg").desc, col("bg").asc_nulls_first)
        .limit(20)),

    // data-contract census (the Deequ/dbt-tests shape): four
    // row-level rules folded into ONE lineitem pass (adding a rule
    // adds a column, never a scan) plus a referential-integrity
    // anti-join to orders — per-rule violation counts
    "q151_contract_census" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val rules = Seq(
        "qty_le_45" -> (col("l_quantity") <= 45),
        "disc_le_8pct" -> (col("l_discount") <= 0.08),
        "price_ge_1000" -> (col("l_extendedprice") >= 1000),
        "flag_domain" -> col("l_returnflag").isin("A", "N", "R"))
      Contracts.ruleCensus(li, rules)
        .unionByName(Contracts.fkViolationCount(li,
            col("l_orderkey"), t(s, d, "orders"), col("o_orderkey"))
          .select(lit("fk_orderkey").as("rule"),
            col("n_violations"),
            lit(null).cast("long").as("n_rows")))
        .orderBy(col("rule").asc_nulls_first)
    }),

    // per-source exact decibit quartiles — the "where do I cut"
    // numbers a curation run reads off the q141 scores: positional
    // quartiles (the engine's §1.3 rank rule, rn ∈ {1, n/4+1,
    // n/2+1, 3n/4+1, n}) over the per-doc LM cross-entropy, via
    // rank windows over the DOCS-sized score frame
    "q150_lm_quartiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val (bi, uni, vocab) = LangModel.trainBigram(
        docs.where(col("source") === "src0"), col("text"))
      val perDoc = LangModel.crossEntropyBits(
        docs.where(col("source") =!= "src0"),
        Seq(col("source"), col("doc_id")), col("text"),
        bi, uni, vocab)
      val wr = Window.partitionBy(col("source"))
        .orderBy(col("decibits").asc, col("doc_id").asc)
      val wn = Window.partitionBy(col("source"))
      perDoc
        .withColumn("rn", row_number().over(wr).cast("long"))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"),
          max(when(col("rn") === 1, col("decibits"))).as("min_db"),
          max(when(col("rn") === expr("n DIV 4 + 1"),
            col("decibits"))).as("q1_db"),
          max(when(col("rn") === expr("n DIV 2 + 1"),
            col("decibits"))).as("q2_db"),
          max(when(col("rn") === expr("3 * n DIV 4 + 1"),
            col("decibits"))).as("q3_db"),
          max(when(col("rn") === col("n"), col("decibits")))
            .as("max_db"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // burst detection over the event stream: per (event_type, day),
    // flag days whose count beats 2x the trailing-7-observed-day
    // mean by integer cross-multiplication (n·w_cnt > 2·w_sum, ≥3
    // days of history) — the ops-monitoring anomaly census, exact
    // at any scale. One keyed agg + one keyed window; max_pct
    // reports the strongest day as an exact floor percentage
    "q149_burst_detect" -> ((s, d) => {
      val ev = t(s, d, "events")
      Temporal.burstDays(ev, col("event_type"), epochDay(ev),
          windowDays = 7, num = 2L, den = 1L, minHistory = 3)
        .withColumnRenamed("key", "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          count(when(col("burst"), 1)).as("n_bursts"),
          min(when(col("burst"), col("day")))
            .as("first_burst_day"),
          max(expr("(n * w_cnt * 100) DIV w_sum")).as("max_pct"),
          sum(col("n")).cast("long").as("n_events"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // SCD type-2 history: the q96 changelog as validity intervals —
    // each upsert opens [valid_from, valid_to) closed by the key's
    // next change (deletes close, never open); census per segment.
    // One keyed window, no self-joins — the audit/time-travel view
    // beside the latest-wins merge
    "q148_scd2_history" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val h = pmod(Sampling.hash32(col("c_custkey")), lit(630L))
      def slice(m: Long) = cust.where(h % m === 0L)
      def chg(df: DataFrame, bal: Column, seg: Column, ts: Long,
              op: String): DataFrame =
        df.select(col("c_custkey"), bal.as("bal"), seg.as("seg"),
          lit(ts).as("__ts"), lit(op).as("__op"))
      val changes =
        chg(slice(7), col("c_acctbal") + 50.0, col("c_mktsegment"),
          1L, "upsert")
        .unionByName(chg(slice(7), col("c_acctbal") + 100.0,
          col("c_mktsegment"), 2L, "upsert"))
        .unionByName(chg(slice(10), col("c_acctbal"),
          col("c_mktsegment"), 3L, "delete"))
        .unionByName(chg(slice(9), lit(42.0), lit("NEW"), 1L,
          "upsert")
          .withColumn("c_custkey", col("c_custkey") + 1000000L))
      Delta.scd2History(changes, "c_custkey", "__ts", "__ts",
          "__op")
        .groupBy(col("seg").as("c_mktsegment"))
        .agg(count(lit(1)).as("n_intervals"),
          count(when(col("is_current"), 1)).as("n_current"),
          coalesce(sum(col("valid_to") - col("valid_from")),
            lit(0L)).cast("long").as("sum_closed_len"),
          countDistinct(col("c_custkey")).as("n_keys"))
        .orderBy(col("c_mktsegment").asc_nulls_first)
    }),

    // LSH self-evaluation harness: on a hash-sampled doc slice,
    // exact Jaccard truth (τ = 1/5, the q25 convention) vs the
    // 16×4-band MinHash candidate set — the recall/precision
    // confusion census a team runs BEFORE trusting banded dedup at
    // 100 TB. The quadratic exact side runs on the SAMPLE only
    // (priced by jaccardPairs' pre-flight); the LSH side is the
    // production candidate path unchanged
    "q147_lsh_eval" -> ((s, d) => {
      val sample = t(s, d, "documents")
        .where(col("doc_id") % 2 === 0)
      val exact = Dedup.jaccardPairs(sample, col("doc_id"),
          col("text"), shingleK = 5, thresholdNum = 0,
          thresholdDen = 1, maxShingleDf = 10000L)
        .select(col("id1"), col("id2"),
          (col("inter") * 5 >= col("union_n")).as("truth"))
      val cands = Dedup.lshCandidatePairs(
          Dedup.lshBands(Dedup.minHashSignatures(sample,
            col("doc_id"), col("text"), numHashes = 64,
            shingleK = 5)))
        .withColumn("cand", lit(true))
      exact.join(cands, Seq("id1", "id2"), "full_outer")
        .select(coalesce(col("truth"), lit(false)).as("truth"),
          coalesce(col("cand"), lit(false)).as("cand"))
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("truth"), 1)).as("n_truth"),
          count(when(col("cand"), 1)).as("n_cand"),
          count(when(col("truth") && col("cand"), 1)).as("tp"),
          count(when(col("truth") && !col("cand"), 1)).as("fn"),
          count(when(!col("truth") && col("cand"), 1)).as("fp"))
    }),

    // matryoshka truncation eval: top-10 overlap between full-dim
    // and 16-dim-prefix cosine rankings over a sampled probe set —
    // the recall check before deploying truncated embeddings.
    // Probes broadcast, corpus streams once, both rankings share
    // one probe-key exchange; exact quantized dots, id tie-breaks
    "q146_matryoshka" -> ((s, d) =>
      Similarity.matryoshkaOverlap(t(s, d, "embeddings"), "vec_id",
        "embedding", prefixDims = 16, k = 10, probeEvery = 97L)),

    // DSIR importance weights (hashed-n-gram importance resampling):
    // per-doc log(p_target/p_raw) in exact whole bits over 1024
    // hashed buckets — the published data-selection pass that
    // upsamples target-like raw documents. Bucket frames broadcast
    // back over one exploded-feature scan
    "q145_dsir_weights" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val raw = docs.where(col("source") =!= "src0")
      LangModel.importanceBits(
          docs.where(col("source") === "src0"), raw, raw,
          Seq(col("source"), col("doc_id")), col("text"), b = 1024)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_features")).cast("long").as("n_features"),
          sum(col("wbits")).cast("long").as("sum_wbits"),
          min(col("wbits")).as("min_wbits"),
          max(col("wbits")).as("max_wbits"),
          count(when(col("wbits") >= 0, 1)).as("n_target_like"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // blocked fuzzy record linkage over customer names: candidate
    // pairs ONLY within (nation, 7-digit-prefix) blocks — the
    // prefix covers all but the last two digits, so block size is
    // bounded by ~100/nations AT ANY SCALE (5-digit blocking went
    // quadratic at sf0.1: 14.1 s -> 0.4 s). Edit distance <= 1 by
    // the exact integer levenshtein both engines share, evaluated
    // once per pair; over-cap blocks excluded before pairing
    "q143_entity_pairs" -> ((s, d) => {
      val blk = concat(col("c_nationkey").cast("string"), lit(":"),
        substring(col("c_name"), 10, 7))
      EntityResolution.blockedEditPairs(t(s, d, "customer"),
          col("c_custkey"), col("c_name"), blk, maxDist = 1,
          maxBlock = 10000L)
        .groupBy(col("blk"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("dist")).cast("long").as("sum_dist"),
          sum(col("id1") + col("id2")).cast("long").as("sum_ids"))
        .orderBy(col("blk").asc_nulls_first)
    }),

    // Unicode NFC canonicalization census via the native codegen'd
    // normalizer (Spark has no builtin): each doc gets a decomposed
    // suffix (" Cafe" + combining acute) appended IN-PLAN so the
    // pass provably composes it — lengths shrink by exactly the
    // combining mark, content pinned by the min md5 per source
    "q144_nfc_census" -> ((s, d) => {
      // the suffix is DECOMPOSED on purpose: 'e' + U+0301 combining
      // acute, which NFC composes to the single codepoint U+00E9
      val raw = concat(col("text"), lit(" Cafe\u0301"))
      t(s, d, "documents")
        .select(col("source"), raw.as("raw"),
          graft.functions.NfcNormalizeExpr.nfcNormalize(raw)
            .as("nfc"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("raw"))).cast("long").as("sum_len_raw"),
          sum(length(col("nfc"))).cast("long").as("sum_len_nfc"),
          count(when(length(col("nfc")) =!= length(col("raw")), 1))
            .as("n_changed"),
          // long checksum (md5 prefix) keeps the agg hash-based —
          // a string min would fall back to SortAggregate
          min(conv(substring(md5(col("nfc")), 1, 15), 16, 10)
            .cast("long")).as("min_md5_prefix"))
        .orderBy(col("source").asc_nulls_first)
    }),

    "q21_token_stats" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"),
          TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("total_tokens"),
          min(col("ntok")).as("min_tokens"),
          max(col("ntok")).as("max_tokens"))
        .orderBy(col("lang").asc_nulls_first)),

    // BPE-ish subword units (letter runs / digit runs / single
    // punctuation): the branches match disjoint character sets, so
    // Java and RE2 regex engines tokenize identically
    "q35_subword_stats" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"),
          TextFunctions.subwordCount(col("text")).cast("long")
            .as("nsw"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nsw")).cast("long").as("total_subwords"),
          min(col("nsw")).as("min_subwords"),
          max(col("nsw")).as("max_subwords"))
        .orderBy(col("lang").asc_nulls_first)),

    "q22_quality_score" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"),
          TextFunctions.qualityScore(col("text")).as("q"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("q")).cast("double").as("sum_quality"))
        .orderBy(col("source").asc_nulls_first)),

    "q23_lang_guess" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("lang"),
          TextFunctions.langGuess(col("text")).as("guessed"))
        .groupBy(col("lang"), col("guessed"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang").asc_nulls_first,
          col("guessed").asc_nulls_first)),

    // Gopher-style repetition quality filter: per-doc most-common
    // 2-/3-gram counts (native single-call expression — a pure
    // map-side projection), flagged by integer fraction thresholds
    // (top2 > 20% of 2-grams, or top3 > 10% of 3-grams)
    "q42_repetition_stats" -> ((s, d) => {
      import graft.functions.TopNGramExpr.topNGramNative
      t(s, d, "documents")
        .select(col("lang"),
          topNGramNative(col("text"), 2).as("g2"),
          topNGramNative(col("text"), 3).as("g3"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("g2.top")).cast("long").as("sum_top2"),
          sum(col("g3.top")).cast("long").as("sum_top3"),
          count(when(col("g2.top") * 5 > col("g2.n") ||
            col("g3.top") * 10 > col("g3.n"), 1)).as("n_flagged"))
        .orderBy(col("lang").asc_nulls_first)
    }),

    // tokenizer-vocabulary building: corpus-wide token frequencies,
    // top 50 by (count desc, token asc) — map-side partial agg +
    // TakeOrdered, the canonical vocab pass of a training pipeline
    "q43_vocab_topk" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc_nulls_first)
        .limit(50)),

    // keyword extraction: each document's most DISTINCTIVE token —
    // minimum document frequency, ties by higher in-doc count then
    // token order. Pure integer ranking (no idf logs — engines differ
    // in float transcendentals); df derives from the tf aggregate, so
    // the token explode runs once
    "q44_distinctive_terms" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("df").asc, col("tf").desc,
          col("tok").asc_nulls_first)
      tf.join(dfreq, Seq("tok"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("tok"), col("tf"), col("df"))
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    // ---- dedup ---------------------------------------------------
    "q24_dedup_exact" -> ((s, d) =>
      Dedup.exactDupStats(t(s, d, "documents"), col("text"))),

    "q25_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents"), col("doc_id"),
          col("text"), shingleK = 5, thresholdNum = 0, thresholdDen = 1,
          maxShingleDf = 10000L)
        .agg(count(lit(1)).as("n_candidate_pairs"),
          count(when(col("inter") * 5 >= col("union_n"), 1))
            .as("n_near_dups"))),

    "q26_minhash_bands" -> ((s, d) => {
      val sigs = Dedup.minHashSignatures(t(s, d, "documents"),
        col("doc_id"), col("text"), numHashes = 64, shingleK = 5)
      Dedup.lshBands(sigs, numHashes = 64, bandSize = 4)
        .where(col("key").isNotNull)
        .groupBy(col("band"))
        .agg(countDistinct(col("key")).as("n_keys"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("band").asc_nulls_first)
    }),

    "q27_simhash" -> ((s, d) =>
      Dedup.simHash32(t(s, d, "documents"), col("doc_id"), col("text"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("simhash")).as("n_distinct"))),

    // near-dup pairs -> duplicate clusters (connected components via
    // min-label propagation; the oracle derives identical labels by
    // recursive transitive closure)
    "q36_dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.jaccardPairs(t(s, d, "documents"),
          col("doc_id"), col("text"), shingleK = 5, thresholdNum = 1,
          thresholdDen = 5, maxShingleDf = 10000L)
        .select(col("id1"), col("id2"))
      val labels = Dedup.connectedComponents(pairs)
      val sizes = labels.groupBy(col("label"))
        .agg(count(lit(1)).as("sz"))
      labels.agg(count(lit(1)).as("n_clustered_docs"),
          countDistinct(col("label")).as("n_clusters"))
        .crossJoin(sizes.agg(max(col("sz")).as("max_cluster_size")))
    }),

    // block-level BOILERPLATE census (the jusText/trafilatura step
    // after q167's flat extraction): one codegen'd pass segments
    // each page into blocks carrying (chars, link-chars); the
    // integer gate n_chars >= 20 AND 2*link_chars < n_chars
    // separates article prose from nav/footer/link-farm blocks.
    // Higher-order filter/aggregate do the census — no explode of
    // anything page-sized, no UDFs
    "q172_boilerplate" -> ((s, d) => {
      val html = element_at(array(BoilerVariants.map(lit): _*),
        (pmod(col("doc_id"), lit(6)) + 1).cast("int"))
      def isContent(b: Column): Column =
        b.getField("n_chars") >= 20 &&
          b.getField("n_link_chars") * 2 < b.getField("n_chars")
      t(s, d, "documents")
        .select(pmod(col("doc_id"), lit(6)).as("variant"),
          graft.functions.HtmlBlocksExpr.htmlBlocks(html).as("bs"))
        .select(col("variant"),
          size(col("bs")).cast("long").as("n_blocks"),
          size(filter(col("bs"), isContent(_))).cast("long")
            .as("n_content"),
          aggregate(filter(col("bs"), isContent(_)), lit(0L),
            (acc, b) => acc + b.getField("n_chars").cast("long"))
            .as("content_chars"),
          aggregate(col("bs"), lit(0L),
            (acc, b) => acc + b.getField("n_link_chars")
              .cast("long")).as("link_chars"))
        .groupBy(col("variant"), col("n_blocks"), col("n_content"),
          col("content_chars"), col("link_chars"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("variant").asc)
    }),

    // INCREMENTAL clustering (the q169 delta discipline applied to
    // components): fold the ~1/3 held-out near-dup pairs into the
    // base labeling via the star collapse — CC(E_old ∪ E_new) ==
    // CC(star(labels_old) ∪ E_new) exactly, so the oracle (the full
    // closure over ALL pairs, q36's replay) proves fold == full
    "q171_components_delta" -> ((s, d) => {
      val pairs = Dedup.jaccardPairs(t(s, d, "documents"),
          col("doc_id"), col("text"), shingleK = 5, thresholdNum = 1,
          thresholdDen = 5, maxShingleDf = 10000L)
        .select(col("id1"), col("id2"))
        .localCheckpoint()
      val base = pairs.where(
        pmod(col("id1") + col("id2"), lit(3)) =!= 0)
      val delta = pairs.where(
        pmod(col("id1") + col("id2"), lit(3)) === 0)
      val labels = Dedup.foldComponents(
        Dedup.connectedComponents(base), delta)
      val sizes = labels.groupBy(col("label"))
        .agg(count(lit(1)).as("sz"))
      labels.agg(count(lit(1)).as("n_clustered_docs"),
          countDistinct(col("label")).as("n_clusters"))
        .crossJoin(sizes.agg(max(col("sz")).as("max_cluster_size")))
    }),

    // the canonical 100 TB fuzzy-dedup composition: MinHash → LSH band
    // candidates → exact-Jaccard verify ON CANDIDATES ONLY → connected
    // components (q36 keeps the exact all-pairs baseline; this is the
    // scale path — no corpus-wide shingle self-join anywhere)
    "q40_lsh_dedup_clusters" -> ((s, d) => {
      val labels = Dedup.lshDedupClusters(t(s, d, "documents"),
        col("doc_id"), col("text"), numHashes = 64, bandSize = 4,
        shingleK = 5, thresholdNum = 1, thresholdDen = 5,
        maxBucketSize = 10000L)
      val sizes = labels.groupBy(col("label"))
        .agg(count(lit(1)).as("sz"))
      labels.agg(count(lit(1)).as("n_clustered_docs"),
          countDistinct(col("label")).as("n_clusters"))
        .crossJoin(sizes.agg(max(col("sz")).as("max_cluster_size")))
    }),

    // the one-call dedup pipeline end-to-end: cluster -> drop list ->
    // anti-joined corpus; summary of what survives
    "q47_deduplicate" -> ((s, d) =>
      Dedup.deduplicate(t(s, d, "documents"), col("doc_id"),
          col("text"), shingleK = 5, thresholdNum = 1,
          thresholdDen = 5)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("sum_ids"))),

    // reproducible subsampling: same rows on every run / engine /
    // partitioning (md5 hash-space threshold, not a seeded RNG)
    "q37_hash_sample" -> ((s, d) =>
      Sampling.hashSample(t(s, d, "documents"), col("doc_id"), 1L, 4L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("source").asc_nulls_first)),

    // decontamination: a FIXED-SIZE eval suite (the 20 hash-smallest
    // docs — deterministic, engine-portable) against the rest of the
    // corpus. A constant-size bench is the shape contamination()'s
    // broadcast fast path is built for: eval suites stay MBs while
    // the corpus grows, so this query exercises the production path
    // (a corpus-fraction bench would instead trip the shuffle
    // fallback guard at scale)
    "q38_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs
        .orderBy(Sampling.hash32(col("doc_id")).asc,
          col("doc_id").asc)
        .limit(20)
      val benchIds = bench.select(col("doc_id").as("__bench_id"))
      val corpus = docs.join(broadcast(benchIds),
        col("doc_id") === col("__bench_id"), "left_anti")
      Dedup.contamination(corpus, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"), shingleK = 5)
        .agg(count(lit(1)).as("n_bench_docs"),
          sum(col("n_shingles")).cast("long").as("n_shingles"),
          sum(col("n_hits")).cast("long").as("n_hits"),
          count(when(col("n_hits") === col("n_shingles"), 1))
            .as("n_fully_contained"))
    }),

    // the q38 decontamination through the Bloom-prescreen path
    // (BloomFilterAggregate bits + might_contain corpus filter +
    // exact confirm join): a Bloom filter has no false negatives and
    // survivors are re-confirmed exactly, so the result must be
    // IDENTICAL to q38's — the same oracle pins it through the gate
    "q73_contamination_bloom" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs
        .orderBy(Sampling.hash32(col("doc_id")).asc,
          col("doc_id").asc)
        .limit(20)
      val benchIds = bench.select(col("doc_id").as("__bench_id"))
      val corpus = docs.join(broadcast(benchIds),
        col("doc_id") === col("__bench_id"), "left_anti")
      Dedup.contaminationBloom(corpus, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"), shingleK = 5,
          fpp = 0.01)
        .agg(count(lit(1)).as("n_bench_docs"),
          sum(col("n_shingles")).cast("long").as("n_shingles"),
          sum(col("n_hits")).cast("long").as("n_hits"),
          count(when(col("n_hits") === col("n_shingles"), 1))
            .as("n_fully_contained"))
    }),

    // the screening DIRECTION of decontamination: per INCOMING doc,
    // how much benchmark content it contains (q38/q73 count per
    // bench doc) — the static screen (distinct bench digests + Bloom
    // bits) built once, the corpus prescreened by might_contain and
    // confirmed exactly; also the batch semantics of the streaming
    // screen (StreamingDecontamSpec pins replayed == batch)
    "q74_decontam_screen" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bench = docs
        .orderBy(Sampling.hash32(col("doc_id")).asc,
          col("doc_id").asc)
        .limit(20)
      val benchIds = bench.select(col("doc_id").as("__bench_id"))
      val corpus = docs.join(broadcast(benchIds),
        col("doc_id") === col("__bench_id"), "left_anti")
      val screen = Dedup.buildContaminationScreen(bench,
        col("doc_id"), col("text"), shingleK = 5, fpp = 0.01)
      Dedup.screenAgainst(screen, corpus, col("doc_id"), col("text"))
        .agg(count(lit(1)).as("n_docs_screened"),
          count(when(col("n_hits") > 0, 1)).as("n_flagged"),
          sum(col("n_hits")).cast("long").as("total_hits"),
          count(when(col("n_hits") === col("n_shingles"), 1))
            .as("n_fully_bench"))
    }),

    // EXACT similarity self-join without the all-occurrence shuffle:
    // prefix filtering (AllPairs/PPJoin) joins only each doc's rarest
    // set elements — complete by pigeonhole, so the result is
    // identical to a brute-force Jaccard join at threshold 1/2 (the
    // spec proves equivalence on controlled corpora; the oracle
    // re-runs the same integer arithmetic). Elements are word-5-gram
    // shingle digests: near-unique per doc, so prefixes rarely
    // collide and the candidate join stays tiny — the scale-correct
    // element choice for near-dup detection (shingleK = 1 unigrams
    // on this small-vocabulary synthetic corpus would legitimately
    // generate ~6.5M candidate pairs at sf0.1)
    "q75_prefix_jaccard" -> ((s, d) =>
      Dedup.prefixJaccardPairs(t(s, d, "documents"), col("doc_id"),
          col("text"), thresholdNum = 1, thresholdDen = 2,
          shingleK = 5)
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("inter")).cast("long").as("sum_inter"),
          sum(col("union_n")).cast("long").as("sum_union"))),

    // audio-header decode (the audio sibling of q72): WAV chunk walk,
    // FLAC STREAMINFO bit-unpacking, MP3 frame sync, OGG capture
    // pattern — fixtures pinned by a VALUES oracle, corpus sweep
    // all-unknown (ASCII container magics excluded on both sides)
    "q81_audio_meta" -> ((s, d) => {
      import s.implicits._
      val fixtures = Seq(
        ("wav_2ch", WavHex), ("flac_2ch", FlacHex),
        ("mp3_sync", Mp3Hex), ("ogg_page", OggHex))
        .toDF("name", "hex")
        .select(col("name"),
          Multimodal.audioMeta(unhex(col("hex"))).as("m"))
        .select(col("name"), col("m.format").as("format"),
          col("m.channels").as("channels"),
          col("m.sample_rate").as("sample_rate"),
          col("m.bits_per_sample").as("bits_per_sample"),
          col("m.duration_ms").as("duration_ms"), lit(1L).as("n"))
      val corpus = t(s, d, "documents")
        .where(!col("text").startsWith("RIFF") &&
          !col("text").startsWith("fLaC") &&
          !col("text").startsWith("OggS") &&
          !col("text").startsWith("ID3"))
        .select(Multimodal.audioMeta(col("text").cast("binary"))
          .as("m"))
        .groupBy(col("m.format").as("format"))
        .agg(count(lit(1)).as("n"))
        .select(lit("corpus").as("name"), col("format"),
          lit(null).cast("int").as("channels"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("int").as("bits_per_sample"),
          lit(null).cast("long").as("duration_ms"), col("n"))
      fixtures.unionByName(corpus)
        .orderBy(col("name").asc_nulls_first,
          col("format").asc_nulls_first)
    }),

    // video-container decode completing the image/audio/video triad:
    // MP4 box walk (mvhd duration, tkhd dims), Matroska EBML sniff;
    // fixtures pinned by a VALUES oracle, corpus sweep all-unknown
    // (an 'ftyp' 4cc at text offset 4 excluded on both sides)
    "q82_video_meta" -> ((s, d) => {
      import s.implicits._
      val fixtures = Seq(
        ("mp4_640x360", Mp4Hex), ("mkv_magic", MkvHex))
        .toDF("name", "hex")
        .select(col("name"),
          Multimodal.videoMeta(unhex(col("hex"))).as("m"))
        .select(col("name"), col("m.format").as("format"),
          col("m.major_brand").as("major_brand"),
          col("m.duration_ms").as("duration_ms"),
          col("m.width").as("width"), col("m.height").as("height"),
          lit(1L).as("n"))
      val corpus = t(s, d, "documents")
        .where(substring(col("text"), 5, 4) =!= "ftyp" &&
          !col("text").startsWith("\u001aE\u07e3"))
        .select(Multimodal.videoMeta(col("text").cast("binary"))
          .as("m"))
        .groupBy(col("m.format").as("format"))
        .agg(count(lit(1)).as("n"))
        .select(lit("corpus").as("name"), col("format"),
          lit(null).cast("string").as("major_brand"),
          lit(null).cast("long").as("duration_ms"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"), col("n"))
      fixtures.unionByName(corpus)
        .orderBy(col("name").asc_nulls_first,
          col("format").asc_nulls_first)
    }),

    // Z-order (Morton) clustering census over (user, day): the
    // write-layout curve that gives parquet row groups tight min/max
    // envelopes on BOTH dimensions; dtype-adaptive day derivation
    // like every temporal builder
    "q80_zorder_census" -> ((s, d) => {
      val ev = t(s, d, "events")
      val day = epochDay(ev)
      val z = Layout.zValue2(pmod(col("user_id"), lit(256L)),
        pmod(day, lit(256L)), bits = 8)
      ev.select(z.as("z"))
        .groupBy(shiftright(col("z"), 8).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          min(col("z")).as("min_z"), max(col("z")).as("max_z"))
        .orderBy(col("bucket").asc_nulls_first)
    }),

    // Hilbert-curve clustering census over the same (user, day)
    // plane as q80 — the better-locality write layout (no Morton
    // seams); the oracle replays the identical unrolled xy2d levels
    "q117_hilbert_census" -> ((s, d) => {
      val ev = t(s, d, "events")
      val day = epochDay(ev)
      val h = Layout.hilbertValue2(pmod(col("user_id"), lit(256L)),
        pmod(day, lit(256L)), bits = 8)
      ev.select(h.as("h"))
        .groupBy(shiftright(col("h"), 8).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
        .orderBy(col("bucket").asc_nulls_first)
    }),

    // disjoint deterministic train/val/test split census: the same
    // md5 bucket arithmetic as Sampling.hashSplit, all buckets in one
    // pass — membership is a pure function of the key (stable across
    // runs, engines, partitionings), and the census proves the
    // partition is complete and disjoint (counts sum to the corpus)
    "q83_hash_split_census" -> ((s, d) => {
      val docs = t(s, d, "documents")
      docs.select(
          pmod(Sampling.hash32(col("doc_id")), lit(3L)).as("bucket"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .as("ntok"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("n_tokens"))
        .orderBy(col("bucket").asc_nulls_first)
    }),

    // trailing-window rolling features (the feature-engineering
    // staple): per-user 1-hour event count via a RANGE window — one
    // keyed exchange + one keyed sort, frames by time VALUE so ties
    // and batch boundaries cannot skew it; summarized per user
    "q84_rolling_features" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val tss = ev.schema("ts").dataType match {
        case LongType => expr("ts DIV 1000000000")
        case _ => (datediff(col("ts").cast("date"),
            to_date(lit("1970-01-01"))).cast("long") * 86400L +
          hour(col("ts")).cast("long") * 3600L +
          minute(col("ts")).cast("long") * 60L +
          second(col("ts")).cast("long"))
      }
      val w = Window.partitionBy(col("user_id")).orderBy(col("tss"))
        .rangeBetween(-3600L, Window.currentRow)
      ev.select(col("user_id"), tss.as("tss"))
        .withColumn("c", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("c")).as("max_burst"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // per-source token heavy hitters via the SpaceSaving sketch:
    // k=64 counters per group — fixed memory, map-side mergeable —
    // replaces the exact GROUP BY token whose shuffle carries one
    // row per distinct token. The corpus vocabulary fits inside k,
    // so no eviction happens and the sketch is EXACT (the oracle
    // pins equality with true counts); the eviction/merge
    // guarantees are spec-pinned where Scala can see the truth
    "q85_heavy_hitters" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tk = docs.select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .where(length(col("tok")) > 0)
      Sketches.heavyHitters(tk, col("source"), col("tok"),
          k = 64, topN = 5)
        .select(col("group").as("source"), col("item").as("tok"),
          col("est"))
        .orderBy(col("source").asc_nulls_first, col("est").desc,
          col("tok").asc)
    }),

    // CDC latest-record compaction: the "current snapshot" of an
    // append-only changelog — one max(struct(ts, tiebreak, row))
    // aggregate, so each scan partition forwards ONE candidate per
    // key (map-side partial max) and no per-key sort or window ever
    // materializes; event_id breaks timestamp ties totally
    "q86_latest_snapshot" -> ((s, d) => {
      val ev = t(s, d, "events")
      Temporal.compactLatest(ev, "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // inverted-index posting summary: token -> document frequency,
    // total term frequency, and the top-scoring document. Two keyed
    // aggregations (tok,doc) then (tok), both with map-side
    // partials; the top document rides a max(struct) — no per-token
    // sort, no window, so a stopword's million-document posting
    // list never sits in one task's memory
    "q87_inverted_index" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tk = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .where(length(col("tok")) > 0)
      tk.groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          sum(col("tf")).cast("long").as("tf_total"),
          max(struct(col("tf").as("tf"),
            (-col("doc_id")).as("nd"),
            col("doc_id").as("d"))).as("__m"))
        .select(col("tok"), col("df"), col("tf_total"),
          col("__m.d").as("top_doc"))
        .orderBy(col("tok").asc_nulls_first)
    }),

    // BPE-style adjacent-pair counting (the inner loop of tokenizer
    // training): one codegen'd transform over each token array
    // (no self-join, no positional explode-join), then a keyed
    // count — top merge candidates by frequency
    "q88_pair_counts" -> ((s, d) => {
      val docs = t(s, d, "documents")
      docs.select(TextFunctions.tokens(col("text")).as("l"))
        .where(size(col("l")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(l) - 1), " +
            "i -> concat(l[i-1], ' ', l[i]))")).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(10)
    }),

    // exact 7-day sliding active users: distinct (day, user) pairs
    // fan out to their 7 target days (bounded explode, no range
    // self-join, no window sort), one keyed count-distinct per day
    "q116_sliding_active" -> ((s, d) => {
      val ev = t(s, d, "events")
      Temporal.slidingActiveUsers(ev, epochDay(ev), col("user_id"),
          windowDays = 7)
        .orderBy(col("day").asc_nulls_first)
    }),

    // exact time-decayed popularity: step-wise dyadic half-life
    // decay keeps the per-key sum an exact BIGINT at scale 2^H, and
    // the final score divides by 2^H — an exponent-only operation,
    // so even the double is exact and engine-independent
    "q115_decayed_counts" -> ((s, d) => {
      val ev = t(s, d, "events")
      Temporal.decayedCounts(ev, epochDay(ev), col("event_type"),
          halfLifeDays = 7, horizonDays = 63)
        .orderBy(col("key").asc_nulls_first)
    }),

    // BPE ENCODING with trained rules (q107's artifact applied):
    // train 4 merges, collect the 4-row merge table, then encoding
    // is a pure column expression over the corpus — per-source
    // compression census (subwords <= code points, >= tokens).
    // The oracle derives each word's subword count by joining the
    // corpus words against the final trained vocabulary w5
    "q114_bpe_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val rules = graft.operators.Bpe
        .train(docs, col("text"), numMerges = 4)
        .orderBy(col("merge_rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      docs.select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .as("ntok"),
          size(graft.operators.Bpe.encode(col("text"), rules))
            .cast("long").as("nsub"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("sum_tokens"),
          sum(col("nsub")).cast("long").as("sum_subwords"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // Count-Min point-frequency sketch: d x w counters per source
    // replace the unbounded exact token table; estimates are
    // deterministic (md5 row-salted buckets), so the oracle pins the
    // ESTIMATES exactly alongside exact counts and the
    // never-undercount law — no probabilistic gate
    "q113_countmin" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tk = docs.select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .where(col("tok") =!= "")
      val cm = Sketches.countMinTable(tk, col("source"), col("tok"),
        w = 64, d = 4)
      val probes = Bm25Terms :+ "zzz_absent"
      val exact = tk.where(col("tok").isin(probes: _*))
        .groupBy(col("source"), col("tok").as("term"))
        .agg(count(lit(1)).as("exact"))
      Sketches.countMinEstimate(cm, probes, w = 64, d = 4)
        .withColumnRenamed("group", "source")
        .join(exact, Seq("source", "term"), "left")
        .select(col("source"), col("term"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"),
          (col("est") >= coalesce(col("exact"), lit(0L)))
            .as("no_undercount"))
        .orderBy(col("source").asc_nulls_first,
          col("term").asc_nulls_first)
    }),

    // single-document similarity probe: "find near-dups of THIS
    // doc" — the serving-side question every takedown / provenance
    // / contamination triage starts with. One banded probe of a
    // 1-row query side against the corpus (q63's delta machinery
    // with a singleton delta — the probe cost is the query's own
    // signature plus a band-keyed lookup, never a corpus pair join)
    "q118_similar_to" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // the corpus is signed + banded ONCE (eagerly materialized —
      // (id, band, key) rows, slim); both the probe-selection chain
      // and the probe lookup run off this frame, which is exactly
      // how a serving index would be held
      val bands = Dedup.lshBands(Dedup.minHashSignatures(docs,
        col("doc_id"), col("text"))).localCheckpoint()
      val isNew = pmod(Sampling.hash32(col("id")), lit(5L)) === 0L
      // probe selection: the smallest flagged new_id of the q63
      // hash-split candidates — a doc KNOWN to have matches, so the
      // gate is non-vacuous; ONE bounded driver row, with a min
      // doc_id fallback for a dup-free corpus
      val flagged = Dedup.lshPairsFromBands(
          bands.where(!isNew), bands.where(isNew))
        .agg(min(col("new_id")).as("m")).first()
      val probeId =
        if (flagged.isNullAt(0))
          docs.agg(min(col("doc_id"))).first().getLong(0)
        else flagged.getLong(0)
      Dedup.lshPairsFromBands(
          bands.where(col("id") =!= probeId),
          bands.where(col("id") === probeId))
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(min(col("old_id")), lit(-1L)).cast("long")
            .as("min_match"),
          coalesce(max(col("old_id")), lit(-1L)).cast("long")
            .as("max_match"),
          coalesce(sum(col("old_id")), lit(0L)).cast("long")
            .as("sum_matches"))
    }),

    // exact phrase search ("grep at corpus scale"): the corpus's
    // most frequent bigram (1-row driver argmax — guaranteed to
    // occur, so the gate is non-vacuous) located in every document
    // via a zero-shuffle positional filter over the token array —
    // no explode, no join, no index build
    "q119_phrase_search" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bg = Retrieval.topBigram(docs, "doc_id", "text",
          sampleDen = 20L)
        .collect()(0).getString(0)
      Retrieval.phraseSearch(docs, "doc_id", "text",
          bg.split(" ", -1).toSeq)
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_occ")), lit(0L)).cast("long")
            .as("n_occ"),
          coalesce(sum(col("first_pos")), lit(0L)).cast("long")
            .as("sum_first_pos"),
          coalesce(max(col("n_occ")), lit(0L)).cast("long")
            .as("max_occ"))
        .select(lit(bg).as("phrase"), col("n_docs"), col("n_occ"),
          col("sum_first_pos"), col("max_occ"))
    }),

    // domain-mixture weight solving: two-margin IPF (raking) over
    // the (lang, source) contingency cells in EXACT scaled-integer
    // arithmetic — balance the languages, hold the source marginals.
    // One corpus scan builds the cells; each round is two keyed aggs
    // + broadcast joins over a corpus-size-independent cell frame
    "q120_mixture_weights" -> ((s, d) =>
      Mixing.rakeRowCensus(t(s, d, "documents"), col("lang"),
          col("source"))
        .orderBy(col("row_key").asc_nulls_first)),

    // shared-span forensics: for the corpus's first repeated pair
    // (smallest ids sharing an 8-gram), the maximal verbatim shared
    // token spans at constant offset — the takedown / provenance
    // evidence behind a dedup verdict. Digest-only joins; the span
    // extraction touches two documents' grams, never the corpus
    "q140_shared_spans" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.sharedSpans(docs, col("doc_id"), col("text"),
        Dedup.topRepeatedPair(docs, col("doc_id"), col("text"),
          k = 8), k = 8)
    }),

    // curation shortlist: per-source top-3 documents by (quality
    // rules passed, classifier score, id) — the multi-signal
    // ranking a curation pass ships for review; one scan computes
    // both signals, the window sorts per-source
    "q139_curation_shortlist" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nPass = TextFunctions.QualityRuleNames
        .filterNot(_ == "keep")
        .map(r => when(col(s"qf.$r"), 1L).otherwise(0L))
        .reduce(_ + _)
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_pass").desc, col("score").desc,
          col("doc_id").asc_nulls_first)
      t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          TextFunctions.qualityFlags(col("text")).as("qf"),
          TextFunctions.hashClassifierScore(col("text"), 64)
            .as("score"))
        .withColumn("n_pass", nPass)
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("source"), col("rank"), col("doc_id"),
          col("n_pass"), col("score"))
        .orderBy(col("source").asc_nulls_first,
          col("rank").asc_nulls_first)
    }),

    // temperature-smoothed sampling (α = 1/2, the multilingual-LM
    // rebalancing exponent): each source keeps ~3·sqrt(n) docs via
    // the exact integer-sqrt hash threshold — census pins EXACT
    // membership (sum of kept ids) per source
    "q138_temperature_sample" -> ((s, d) =>
      Sampling.temperatureSample(t(s, d, "documents"),
          col("source"), col("doc_id"), num = 3L, den = 1L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("sum_kept_ids"))
        .orderBy(col("source").asc_nulls_first)),

    // index staleness monitor (the retrain trigger that pairs with
    // q128's append path): per IVF cell, the delta batch's mean
    // quantized d2 vs the indexed vectors' — drift when 2x over,
    // by integer cross-multiplication; frozen-centroid assignment
    // for the delta exactly like serving
    "q137_index_drift" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.indexDriftCensus(
        emb.where(col("vec_id") % 5 =!= 0),
        emb.where(col("vec_id") % 5 === 0),
        "vec_id", "embedding", k = 4, iters = 2, num = 2L,
        den = 1L)
    }),

    // star-schema revenue census: the canonical broadcast-dim join
    // chain (lineitem ⋈ supplier ⋈ nation ⋈ region) — every dim
    // broadcasts, the fact table streams once, ONE shuffle for the
    // final group-by; money in exact quantized cents so the sums
    // hash-match across engines
    "q135_star_join" -> ((s, d) => {
      val qty = round(col("l_quantity") * 100).cast("long")
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val disc = round(col("l_discount") * 100).cast("long")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_items"),
          sum(qty).cast("long").as("sum_qty_c"),
          sum(cents * (lit(100L) - disc)).cast("long").as("rev_c"))
        .orderBy(col("r_name").asc_nulls_first)
    }),

    // per-dimension embedding census: non-finite detection + the
    // exact quantized scaling envelope — the normalization-prep
    // pass; one explode + one keyed agg
    "q136_dim_stats" -> ((s, d) =>
      Similarity.dimStats(t(s, d, "embeddings"), "embedding")),

    // contiguous-corpus position assignment: every doc's exact token
    // offset in the packed stream via the two-pass distributed
    // prefix sum (range partitions + per-partition scan + bounded
    // base-offset broadcast — never a one-executor global sort);
    // sampled pins every 97th doc against the oracle's SUM OVER
    "q134_global_offsets" -> ((s, d) =>
      Sampling.globalOffsets(t(s, d, "documents"), col("doc_id"),
          TextFunctions.tokenCount(col("text")))
        .where(col("id") % 97 === 0)
        .select(col("id").as("doc_id"), col("len").as("n_tokens"),
          col("tok_offset"))
        .orderBy(col("doc_id").asc_nulls_first)),

    // embedding-space outlier census (the "find the garbage" pass):
    // k-means cells, exact integer distance² to each cell's rounded
    // centroid, outlier = d2 > 4x the cell mean by integer
    // cross-multiplication — no float thresholds anywhere
    "q133_embedding_outliers" -> ((s, d) =>
      Similarity.outlierCensus(t(s, d, "embeddings"), "vec_id",
        "embedding", k = 4, iters = 2, num = 4L, den = 1L)),

    // cluster topic labeling (the data-map / SemDeDup browsing
    // companion): k-means cells over the embeddings joined to their
    // documents, then each cell's top-3 tokens by LIFT — cell token
    // share over corpus token share, exact integer products with one
    // IEEE division for ranking. One token explode + keyed aggs;
    // the per-cell window sorts vocabulary rows, never documents
    "q131_cluster_topics" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val labels = Similarity.kmeansLabels(t(s, d, "embeddings"),
        "vec_id", "embedding", k = 4, iters = 2)
      val tk = t(s, d, "documents")
        .join(labels.select(col("id").as("doc_id"), col("label")),
          Seq("doc_id"))
        .select(col("label"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .where(col("tok") =!= "")
      val ct = tk.groupBy(col("label"), col("tok"))
        .agg(count(lit(1)).as("nc"))
      val tt = ct.groupBy(col("tok"))
        .agg(sum(col("nc")).cast("long").as("nt"))
      val lt = ct.groupBy(col("label"))
        .agg(sum(col("nc")).cast("long").as("tc"))
      val tot = ct.agg(sum(col("nc")).cast("long").as("t"))
      val w = Window.partitionBy(col("label"))
        .orderBy(col("lift").desc, col("tok").asc_nulls_first)
      ct.join(tt, Seq("tok"))
        .join(broadcast(lt), Seq("label"))
        .crossJoin(broadcast(tot))
        .withColumn("lift", (col("nc") * col("t")).cast("double") /
          (col("nt") * col("tc")).cast("double"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .select(col("label"), col("rank"), col("tok"),
          col("nc").as("n_in_cluster"), col("nt").as("n_total"))
        .orderBy(col("label").asc_nulls_first,
          col("rank").asc_nulls_first)
    }),

    // hybrid retrieval: BM25 top-25 (q111's exact-rational scorer)
    // fused with md5-feature vector top-25 (exact integer dots
    // against the min-doc probe) by reciprocal-rank fusion — the
    // RAG-stack combiner. Both lists are constant frames; fusion
    // cost is independent of corpus size
    "q130_hybrid_rrf" -> ((s, d) => {
      val (bmRanks, vecRanks) = hybridLists(s, d)
      Retrieval.rrfFuse(bmRanks, vecRanks, k = 10)
        .select(col("id").as("doc_id"),
          col("rank_a").as("rank_bm25"),
          col("rank_b").as("rank_vec"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc_nulls_first)
    }),

    // hard-negative mining (the DPR-style triplet builder): docs the
    // LEXICAL ranker loves that the vector ranker rejects are the
    // hard negatives for the probe query; the vector top-5 are the
    // positives. Pure set algebra over the two constant rank lists
    "q132_hard_negatives" -> ((s, d) => {
      val (bm, vr) = hybridLists(s, d)
      bm.select(col("id"), col("rank").as("rb"))
        .join(vr.select(col("id"), col("rank").as("rv")),
          Seq("id"), "full_outer")
        .select(col("id").as("doc_id"),
          coalesce(col("rb"), lit(0L)).as("rank_bm25"),
          coalesce(col("rv"), lit(0L)).as("rank_vec"),
          when(col("rv").isNotNull && col("rv") <= 5, lit("pos"))
            .when(col("rb").isNotNull && col("rv").isNull,
              lit("hard_neg"))
            .otherwise(lit("other")).as("role"))
        .where(col("role") =!= "other")
        .orderBy(col("role").asc_nulls_first,
          col("rank_bm25").asc_nulls_first,
          col("rank_vec").asc_nulls_first,
          col("doc_id").asc_nulls_first)
    }),

    // maximal-marginal-relevance retrieval: top-20 candidates by
    // exact quantized inner product with the corpus's first vector,
    // then 6 greedy λ=1/2 MMR selections — relevance minus max-sim-
    // to-selected, all integers. One distributed scoring pass +
    // TakeOrdered; the greedy touches only the constant-size
    // candidate frame
    "q129_mmr_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.orderBy(col("vec_id").asc_nulls_first).limit(1)
      Similarity.mmrTopK(emb, "vec_id", "embedding", q, "vec_id",
          "embedding", candN = 20, k = 6)
        .select(col("step"), col("id").as("vec_id"), col("rel"),
          col("penalty"), col("score"))
        .orderBy(col("step").asc_nulls_first)
    }),

    // incremental ANN index maintenance: train IVF (k=4) + PQ (m=4,
    // ksub=4) on the 80% "existing corpus" hash-split, then place
    // the 20% delta batch with FROZEN centroids/codebooks — no
    // retraining, no touch of stored codes; census pins every
    // delta vector's coarse cell and every subspace code against
    // the oracle's full replay. Append cost is delta-sized scoring
    // vs broadcast centroid frames — the daily-batch shape
    "q128_index_append" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val old = emb.where(col("vec_id") % 5 =!= 0)
      val delta = emb.where(col("vec_id") % 5 === 0)
      val ivf = Similarity.buildIvfIndex(old, "vec_id",
        "embedding", k = 4, iters = 2)
      val pq = Similarity.buildPqIndex(old, "vec_id", "embedding",
        dims = 64, m = 4, ksub = 4, iters = 2)
      val (dLabels, dCodes) = Similarity.appendToIvfPq(delta,
        "vec_id", "embedding", dims = 64, m = 4, ivf.centroids,
        pq.codebooks)
      val pqCensus = dCodes
        .select(col("id"),
          posexplode(col("codes")).as(Seq("sub", "label")))
        .groupBy(col("sub").cast("long").as("sub"), col("label"))
        .agg(count(lit(1)).as("n_delta"),
          min(col("id")).as("min_delta"))
        .select(lit("pq").as("kind"), col("sub"), col("label"),
          col("n_delta"), col("min_delta"))
      val ivfCensus = dLabels.groupBy(col("label"))
        .agg(count(lit(1)).as("n_delta"),
          min(col("id")).as("min_delta"))
        .select(lit("ivf").as("kind"), lit(-1L).as("sub"),
          col("label"), col("n_delta"), col("min_delta"))
      pqCensus.unionByName(ivfCensus)
        .orderBy(col("kind").asc_nulls_first,
          col("sub").asc_nulls_first, col("label").asc_nulls_first)
    }),

    // feature-hashing linear classifier inference (the fastText-
    // style corpus quality/topic scorer): md5-bucketed unigram
    // weights folded over each token array in place — model
    // inference at scan speed, zero shuffle beyond the census agg
    "q127_hash_classifier" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"),
          TextFunctions.hashClassifierScore(col("text"), 64)
            .as("score"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("score") >= 0L, 1L).otherwise(0L))
            .as("n_pos"),
          sum(col("score")).cast("long").as("sum_score"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("source").asc_nulls_first)),

    // exact line-level dedup (the CCNet/RefinedWeb boilerplate
    // filter): the corpus wrapped in deterministic page furniture —
    // a per-source header on 3/4 of docs, a global footer on 2/3 —
    // and the operator must strip the furniture wherever it occurs
    // while every prose line survives untouched. Only md5 line
    // digests shuffle in the frequency pass; the frequent set is
    // boilerplate-sized, so the removal join broadcasts under AQE
    "q126_line_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val header = when(col("doc_id") % 4 =!= 0,
        concat(lit("== "), col("source"), lit(" portal ==")))
      val footer = when(col("doc_id") % 3 =!= 0,
        lit("contact us at example dot com"))
      val wrapped = docs.select(col("doc_id"), col("source"),
        concat_ws("\n", header, col("text"), footer).as("page"))
      Dedup.removeFrequentLines(wrapped, col("doc_id"),
          col("page"), minDocs = 2)
        .join(docs.select(col("doc_id").as("id"), col("source")),
          Seq("id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_lines")).cast("long").as("sum_lines"),
          sum(col("n_removed")).cast("long").as("sum_removed"),
          sum(col("clean_nchars")).cast("long")
            .as("sum_clean_nchars"),
          sum(conv(substring(col("clean_md5"), 1, 8), 16, 10)
            .cast("long")).cast("long").as("sum_md5h"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // RAG indexing pipeline, end to end: token-window chunks (q123)
    // -> per-chunk STUB embedding (the documented md5 16-bin fake —
    // the real-image-decode stand-in contract) -> JL projection
    // (q121) -> sign-bit buckets (256 cells) -> a probe chunk's
    // bucket-limited top-5 — the whole chunk-level serving path as
    // one composed plan, exact integers end to end. The banded
    // chunk index is materialized once (the serving-index shape);
    // the probe is one broadcast row
    "q125_rag_index" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val chunks = Chunking.tokenChunks(docs, col("doc_id"),
          col("text"), chunkSize = 64, overlap = 16)
        .select(concat(col("id").cast("string"), lit("#"),
            col("chunk_idx").cast("string")).as("cid"),
          Multimodal.fakeDecodeFeatures(
            col("chunk_text").cast("binary")).as("emb"))
      val pv = Similarity.jlProject(chunks, "cid", "emb",
        inDim = 16, outDims = 8)
      val bucket = (0 until 8).map(j =>
          when(element_at(col("pv"), j + 1) > 0L, lit(1L << j))
            .otherwise(lit(0L)))
        .reduce(_ + _)
      val bf = pv.select(col("id").as("cid"), col("pv"),
        bucket.as("bucket")).localCheckpoint()
      val minDoc = docs.agg(min(col("doc_id"))).first().getLong(0)
      val probeCid = s"$minDoc#0"
      val probe = bf.where(col("cid") === probeCid)
        .select(col("pv").as("__qpv"), col("bucket").as("__qb"))
      val dist = (0 until 8).map { j =>
        val dj = element_at(col("pv"), j + 1) -
          element_at(col("__qpv"), j + 1)
        dj * dj
      }.reduce(_ + _)
      val cands = bf.crossJoin(broadcast(probe))
        .where(col("bucket") === col("__qb") &&
          col("cid") =!= probeCid)
        .select(col("cid"), dist.as("dist"))
      val stats = bf.agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("bucket")).as("n_buckets"))
      val bmax = bf.groupBy(col("bucket"))
        .agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("max_bucket"))
      val top5 = cands.orderBy(col("dist").asc,
          col("cid").asc_nulls_first).limit(5)
        .agg(min(struct(col("dist"), col("cid"))).as("t1"),
          sum(col("dist")).cast("long").as("sum_top5_dist"))
        .select(col("t1.cid").as("top1_cid"),
          col("t1.dist").cast("long").as("top1_dist"),
          col("sum_top5_dist"))
      val nc = cands.agg(count(lit(1)).as("n_cands"))
      stats.crossJoin(broadcast(bmax)).crossJoin(broadcast(nc))
        .crossJoin(broadcast(top5))
        .select(col("n_chunks").cast("long").as("n_chunks"),
          col("n_buckets").cast("long").as("n_buckets"),
          col("max_bucket").cast("long").as("max_bucket"),
          col("n_cands").cast("long").as("n_cands"),
          col("top1_cid"), col("top1_dist"), col("sum_top5_dist"))
    }),

    // index-accelerated phrase search: positional postings FILTERED
    // to the phrase's terms (document-frequency-sized, not
    // corpus-sized), equi-joined at pos-i — the serving-path twin of
    // q119's scan strategy; both pin the identical oracle census
    "q124_indexed_phrase" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val bg = Retrieval.topBigram(docs, "doc_id", "text",
          sampleDen = 20L)
        .collect()(0).getString(0)
      Retrieval.phraseSearchIndexed(docs, "doc_id", "text",
          bg.split(" ", -1).toSeq)
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_occ")), lit(0L)).cast("long")
            .as("n_occ"),
          coalesce(sum(col("first_pos")), lit(0L)).cast("long")
            .as("sum_first_pos"),
          coalesce(max(col("n_occ")), lit(0L)).cast("long")
            .as("max_occ"))
        .select(lit(bg).as("phrase"), col("n_docs"), col("n_occ"),
          col("sum_first_pos"), col("max_occ"))
    }),

    // fixed token-window chunking (the RAG / pretraining windowing
    // primitive, the content-defined complement of q106): one scan,
    // bounded per-doc explode, census pins exact token accounting
    // plus the provable coverage + overlap-stitching invariants
    "q123_token_chunks" -> ((s, d) =>
      Chunking.chunkCensus(t(s, d, "documents"), col("source"),
        col("doc_id"), col("text"), chunkSize = 64, overlap = 16)),

    // materialize the rebalanced corpus: each doc joins its cell's
    // solved IPF weight (broadcast — cell frame is corpus-size-
    // independent) and survives the deterministic md5-hash threshold
    // with probability w/(n*scale), all in exact integers; the
    // census pins EXACT membership (sum of kept ids) per lang
    "q122_rebalanced_sample" -> ((s, d) =>
      Mixing.rebalancedSample(t(s, d, "documents"), col("lang"),
          col("source"), col("doc_id"))
        .groupBy(col("lang").as("row_key"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).cast("long").as("sum_kept_ids"))
        .orderBy(col("row_key").asc_nulls_first)),

    // Johnson-Lindenstrauss ±1 projection (64 -> 16 dims) + top-k in
    // the projected space — the map-only ANN prefilter that shrinks
    // every vector 4x before any distance work. Exact integers
    // end-to-end: 2^25-grid quantization, md5-derived signs, BIGINT
    // squared L2; probe broadcast, ranking TakeOrdered
    "q121_jl_topk" -> ((s, d) =>
      Similarity.jlTopK(t(s, d, "embeddings"), "vec_id",
        "embedding", inDim = 64, outDims = 16, queryId = 0L,
        k = 10)),

    // leakage-free train/test split: hash-assigned split, then every
    // test doc with a cross-split MinHash band candidate (the q63
    // machinery) moves to train — the conservative guard against
    // eval contamination. Census pins sizes AND membership
    "q112_leakage_split" -> ((s, d) =>
      Sampling.leakageFreeSplit(t(s, d, "documents"),
          col("doc_id"), col("text"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
        .orderBy(col("split").asc_nulls_first)),

    // BM25 ranked retrieval (deterministic rational variant — see
    // Retrieval scaladoc): mine the corpus for documents matching a
    // keyword query; literal-term tfs are a pure projection (no
    // explode/join), corpus stats one broadcast row, TakeOrdered(K)
    "q111_bm25_topk" -> ((s, d) =>
      Retrieval.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Bm25Terms, k = 25)),

    // SemDeDup: k-means clusters as the candidate generator, then
    // quantized-cosine near-dup pairs WITHIN each cluster only,
    // connected components, keep-min-id — semantic dedup with the
    // pair space cut by ~k (cross-cluster misses are the published
    // algorithm's trade). Census form (q66's shape)
    "q110_semdedup" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.semDedup(emb, "vec_id", "embedding", k = 4,
          iters = 2, threshold = 0.8)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("vec_id")).cast("long").as("sum_ids"))
    }),

    // composite Gopher/C4 quality filter: every rule boolean plus
    // the keep verdict from ONE projection (single corpus scan —
    // pinned by ExplainAudit), per-source pass counts as the census
    "q108_quality_census" -> ((s, d) =>
      graft.streaming.StreamingStructure
        .qualityCensus(t(s, d, "documents"), "source", "text")
        .orderBy(col("group").asc_nulls_first)
        .withColumnRenamed("group", "source")),

    // full BPE tokenizer TRAINING (q88 is its inner loop): 6 merge
    // rounds over the word-frequency table — the corpus collapses in
    // ONE keyed aggregation; every round after is vocab-sized, with
    // a single argmax row crossing to the driver per round. The
    // oracle replays all 6 rounds unrolled in SQL (the q48 kmeans
    // recurrence pattern), expressing the canonical greedy
    // left-to-right merge as run-alternation window selection
    "q107_bpe_train" -> ((s, d) =>
      graft.operators.Bpe.train(t(s, d, "documents"), col("text"),
          numMerges = 6)
        .orderBy(col("merge_rank").asc)),

    // dataset-versioning diff: v2 of the corpus is derived
    // deterministically (drop the h%20==0 slice, append ' v2' to
    // the h%7==0 slice, add a fresh h%25==0 slice under shifted
    // ids), then Delta.snapshotDiff reduces the comparison to one
    // fingerprint equi-join — no content moves, and downstream
    // consumers process the delta, not the corpus
    "q89_corpus_delta" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val h = pmod(Sampling.hash32(col("doc_id")), lit(700L))
      val v2 = docs.where(h % 20L =!= 0L)
        .withColumn("text", when(h % 7L === 0L,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .select(col("doc_id"), col("text"))
        .unionByName(docs.where(h % 25L === 0L)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            col("text")))
      Delta.snapshotDiffCensus(docs, v2, "doc_id", md5(col("text")))
        .orderBy(col("status").asc_nulls_first)
    }),

    // int8 scalar quantization census: per-dimension [min,max]
    // codebook (one pass), then every component encoded to an 8-bit
    // code in EXACT integer arithmetic — 4× smaller than float32
    // with a broadcast-join encode (zero vector shuffle). bounds_ok
    // pins the quantization error guarantee |255·(qx−qmn) − code·s|
    // ≤ s/2 over every component
    "q90_sq_census" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val stats = Similarity.sqStats(emb, "embedding")
      val codes = Similarity.sqCodes(emb, "vec_id", "embedding",
        stats)
      codes.join(emb.select(col("vec_id").as("id"), col("label")),
          Seq("id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_comps"),
          sum(col("code")).cast("long").as("sum_codes"),
          expr("bool_and(bound_ok)").as("bounds_ok"))
        .orderBy(col("label").asc_nulls_first)
    }),

    // salted skew join: events fact side salted 8 ways, customer
    // dim side replicated 8 ways, joined on (key, salt) — a known
    // hot key's rows spread over 8 reducers instead of pinning one
    // straggler; the result is EXACTLY the plain inner join, which
    // is what the oracle runs
    "q91_salted_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Layout.skewJoin(ev, cust, "user_id", salt = 8,
          saltFrom = col("event_id"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("sum_value"))
        .orderBy(col("c_mktsegment").asc_nulls_first)
    }),

    // n-gram novelty scoring: each non-reference source's word
    // bigrams screened against the reference source's bigram set —
    // the "how much of this crawl is new language" curation signal.
    // The reference set is vocabulary-bounded (broadcast here; the
    // q73/q74 Bloom prescreen is the same shape when it is not),
    // and the probe side never shuffles for the screen
    "q92_ngram_novelty" -> ((s, d) => {
      val docs = t(s, d, "documents")
      def bigrams(df: DataFrame): DataFrame = df
        .select(col("source"), TextFunctions.tokens(col("text"))
          .as("l"))
        .where(size(col("l")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(l) - 1), " +
            "i -> concat(l[i-1], ' ', l[i]))")).as("bg"))
      val ref = bigrams(docs.where(col("source") === "src0"))
        .select(col("bg")).distinct().withColumn("__hit", lit(1))
      bigrams(docs.where(col("source") =!= "src0"))
        .join(broadcast(ref), Seq("bg"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_bigrams"),
          count(when(col("__hit").isNull, 1)).as("n_novel"),
          countDistinct(when(col("__hit").isNull, col("bg")))
            .as("n_novel_distinct"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // per-day distinct-user estimate with a self-auditing gate (the
    // q76 pattern over the time axis): HLL++ next to the exact
    // distinct, oracle pins the exact columns and the
    // within-tolerance boolean — fixed sketch state per day is the
    // only affordable "daily uniques" shape on an unbounded stream
    "q93_daily_distinct" -> ((s, d) => {
      val ev = t(s, d, "events")
      val day = epochDay(ev)
      // tolerance derived from the configured rsd with 5-sigma
      // headroom (0.02 → 10%): the pinned-TRUE gate needs
      // comfortable statistical margin, not ~2.5 sigma that a new
      // fixture or scale could flip spuriously
      val rsd = 0.02
      val tolPct = math.ceil(rsd * 5 * 100).toInt
      ev.select(day.as("day"), col("user_id"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"),
          approx_count_distinct(col("user_id"), rsd)
            .as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("day"), col("n_events"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) * 100 <=
            col("exact_users") * tolPct).as("users_ok"))
        .orderBy(col("day").asc_nulls_first)
    }),

    // conversion funnel: signup → first-signup-or-later purchase.
    // One unbounded per-user window (min over the partition — no
    // ORDER BY, no frame sort semantics needed) feeds a single
    // global aggregate; ts comparisons are dtype-agnostic
    "q94_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val converted = col("event_type") === "purchase" &&
        col("ts") >= col("first_signup")
      ev.withColumn("first_signup",
          min(when(col("event_type") === "signup", col("ts")))
            .over(w))
        .agg(
          countDistinct(when(col("first_signup").isNotNull,
            col("user_id"))).as("n_users_signup"),
          countDistinct(when(converted, col("user_id")))
            .as("n_users_converted"),
          count(when(converted, 1)).as("n_purchases_after"))
    }),

    // retention cohorts: users bucketed by first-seen day, distinct
    // actives per (cohort, day-offset). Built as agg + equi-join +
    // agg — each stage shuffles ONLY on its key with map-side
    // partials, no per-user sort (the window formulation would sort
    // every user's history)
    "q95_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
      val day = epochDay(ev)
      val ud = ev.select(col("user_id"), day.as("day")).distinct()
      val firsts = ud.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort"))
      ud.join(firsts, Seq("user_id"))
        .groupBy(col("cohort"),
          (col("day") - col("cohort")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort").asc_nulls_first,
          col("day_offset").asc_nulls_first)
    }),

    // MERGE INTO: a deterministic synthetic changelog (two stacked
    // upserts whose later version must win, deletes that also beat
    // earlier upserts on the same key, inserts under fresh keys)
    // applied to the customer snapshot via Delta.applyChangelog —
    // latest-change compaction + ONE full-outer equi-join; census
    // by segment pins the merged state
    "q96_apply_changelog" -> ((s, d) => {
      val cust = t(s, d, "customer")
      // 630 = lcm(7, 9, 10): one hash, three independent slices
      val h = pmod(Sampling.hash32(col("c_custkey")), lit(630L))
      def slice(m: Long) = cust.where(h % m === 0L)
      def chg(df: DataFrame, bal: Column, seg: Column, ts: Long,
              op: String): DataFrame =
        df.select(col("c_custkey"), col("c_name"),
          col("c_nationkey"), bal.as("c_acctbal"),
          seg.as("c_mktsegment"), lit(ts).as("__ts"),
          lit(op).as("__op"))
      val changes =
        chg(slice(7), col("c_acctbal") + 50.0, col("c_mktsegment"),
          1L, "upsert")
        .unionByName(chg(slice(7), col("c_acctbal") + 100.0,
          col("c_mktsegment"), 2L, "upsert"))
        .unionByName(chg(slice(10), col("c_acctbal"),
          col("c_mktsegment"), 3L, "delete"))
        .unionByName(chg(slice(9), lit(42.0), lit("NEW"), 1L,
          "upsert")
          .withColumn("c_custkey", col("c_custkey") + 1000000L))
      Delta.applyChangelog(cust, changes, "c_custkey", "__ts",
          "__ts", "__op")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("sum_acctbal"))
        .orderBy(col("c_mktsegment").asc_nulls_first)
    }),

    // ROLLUP cube: daily × event-type counts with subtotal and
    // grand-total levels in ONE pass (Spark expands grouping sets
    // inside a single aggregation — no per-level re-scan)
    "q97_rollup" -> ((s, d) => {
      val ev = t(s, d, "events")
      val day = epochDay(ev)
      ev.select(day.as("day"), col("event_type"))
        .rollup(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("day").asc_nulls_first,
          col("event_type").asc_nulls_first)
    }),

    // PIVOT: event types to columns, one row per day — the
    // wide-format export analysts ask for; explicit value list so
    // the schema is static (no driver-side distinct scan), absent
    // combinations filled with 0
    "q98_pivot" -> ((s, d) => {
      val ev = t(s, d, "events")
      val day = epochDay(ev)
      ev.select(day.as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day").asc_nulls_first)
    }),

    // equi-depth binning census: GK-sketch boundaries (one pass, no
    // global sort — ntile() would single-task-sort the corpus),
    // broadcast assignment, and the self-auditing depth gate — the
    // oracle pins exact totals plus depth_ok TRUE
    "q99_equidepth" -> ((s, d) =>
      Sketches.equiDepthCensus(t(s, d, "lineitem"),
        col("l_extendedprice"), b = 10)),

    // profile drift between two deterministic hash-halves of the
    // corpus (the A/B shape of the nightly "did this crawl change"
    // monitor): ONE conditional-aggregation pass, no join; the
    // oracle pins the slice counts exactly and both drift gates TRUE
    "q100_profile_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Sketches.profileDrift(docs, col("source"), col("text"),
          pmod(Sampling.hash32(col("doc_id")), lit(2L)))
        .withColumnRenamed("group", "source")
        .orderBy(col("source").asc_nulls_first)
    }),

    // C4-style boilerplate detection at frame granularity: frames
    // shared by >= 2 distinct documents are boilerplate (headers,
    // mirrors, templates). Digests travel, not frames; the
    // boilerplate set is small, so the affected-docs join is
    // broadcast-shaped at corpus scale
    "q101_boilerplate" -> ((s, d) => {
      val media = Multimodal.asMedia(t(s, d, "documents"),
        col("text"), "text/plain")
      val frames = Multimodal.sampleFrames(media, "payload",
          frameBytes = 64, stride = 128)
        .select(col("doc_id"), md5(col("frame")).as("fp"))
      val perFrame = frames.groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("docfreq"))
      val affected = frames
        .join(perFrame.where(col("docfreq") >= 2).select("fp"),
          Seq("fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs_affected"))
      perFrame.agg(count(lit(1)).as("n_distinct_frames"),
          count(when(col("docfreq") >= 2, 1))
            .as("n_boilerplate_frames"))
        .crossJoin(affected)
    }),

    // importance sampling by token count: keep-probability
    // ntok/100 capped at 1 — long documents always survive, short
    // ones proportionally — via the deterministic hash down-set
    // (membership is a pure function of (doc_id, ntok))
    "q102_weighted_sample" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("ntok",
        TextFunctions.tokenCount(col("text")).cast("long"))
      Sampling.weightedSample(docs, col("doc_id"), col("ntok"),
          den = 100L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("n_tokens"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // exact repeated-substring runs (the suffix-array dedup signal
    // of "Deduplicating Training Data Makes Language Models
    // Better", Lee et al. '22, re-expressed relationally): corpus-
    // repeated token-8-grams (>= 2 distinct docs — cross-doc
    // verbatim reuse, not q44's intra-doc repetition), their
    // positions merged into MAXIMAL runs per doc by the lag/
    // running-sum chain (one keyed sort over repeated positions
    // only). Digests travel, never gram strings
    "q103_repeated_substrings" -> ((s, d) =>
      Dedup.repeatedRuns(t(s, d, "documents"), col("doc_id"),
          col("text"), k = 8, minDocs = 2)
        .agg(count(lit(1)).as("n_runs"),
          countDistinct(col("id")).as("n_docs_with_repeats"),
          max(col("len_tokens")).cast("long").as("max_run_tokens"),
          sum(col("len_tokens")).cast("long")
            .as("sum_run_tokens"))),

    // the removal transform over q103's runs: drop every token
    // covered by a repeated run, reassemble survivors in position
    // order — "dedup the data, not just the documents". The census
    // compares against whitespace-normalized originals, so only
    // actual token removal counts as changed
    "q104_remove_repeats" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val clean = Dedup.removeRepeatedRuns(docs, col("doc_id"),
        col("text"), k = 8, minDocs = 2)
      docs.select(col("doc_id").as("id"), col("source"),
          concat_ws(" ", TextFunctions.tokens(col("text")))
            .as("norm"))
        .join(clean, Seq("id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("clean_text") =!= col("norm"), 1))
            .as("n_changed"),
          sum(length(col("clean_text"))).cast("long")
            .as("sum_len_clean"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // release pipeline v2 — the round's new transforms COMPOSED:
    // repeated-substring removal → PII redaction → minimum-length
    // filter → token-budget mixture sampling → per-source census.
    // q65 pins the older curation family; this pins that the new
    // operators chain (each stage consumes the previous one's
    // actual output, and the oracle replays the whole chain)
    "q105_release_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val clean = Dedup.removeRepeatedRuns(docs, col("doc_id"),
        col("text"), k = 8, minDocs = 2)
      // everything downstream needs only (ntok, length(rt)) — never
      // the redacted TEXT itself. Reduce to that slim frame in ONE
      // redaction pass and lazily checkpoint it: the budget sampler
      // consumes its input twice (per-source totals + the filter
      // probe), and the `ntok >= 20` filter used to be pushed below
      // the rt projection — measured, the three hottest q105 stages
      // each re-ran the full redaction chain. Now the chain runs
      // once per row and only ~24-byte rows flow onward (guide §2.3
      // / §8: decide with small rows). Output is unchanged:
      // sum(rtlen) ≡ sum(length(rt)).
      val slim = docs.select(col("doc_id").as("id"), col("source"))
        .join(clean, Seq("id"))
        .select(col("id"), col("source"),
          TextFunctions.redactPii(col("clean_text")).as("rt"))
        .select(col("id"), col("source"),
          TextFunctions.tokenCount(col("rt")).cast("long")
            .as("ntok"),
          length(col("rt")).cast("long").as("rtlen"))
        .localCheckpoint(false)
      val withTok = slim.where(col("ntok") >= 20L)
      Sampling.tokenBudgetSample(withTok, col("source"), col("id"),
          col("ntok"), budget = 4000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("n_tokens"),
          sum(col("rtlen")).cast("long").as("sum_len"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // content-defined chunking census (gear-hash CDC — the storage
    // dedup primitive; boundaries follow CONTENT, so edits only
    // perturb local chunks where q101's fixed frames shift): the
    // oracle pins the exact byte coverage (Σ chunk len == Σ
    // LENGTH(text)) and the [n/maxLen, n/minLen] chunk-count
    // bounds as gates; chunk identity itself is spec-pinned
    // (CdcChunksSpec: coverage, determinism, shift-invariance)
    "q106_cdc_chunks" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // cdcChunks walks the UTF-8 BYTES of the text; the gates must
      // compare bytes to bytes or any non-ASCII document flips them
      val chunks = docs.select(col("source"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          graft.functions.CdcChunksExpr
            .cdcChunks(col("text").cast("binary"),
              minLen = 32, avgBits = 6, maxLen = 256).as("ch"))
        .select(col("source"), col("n_bytes"),
          size(col("ch")).cast("long").as("n_chunks"),
          aggregate(col("ch"), lit(0L),
            (acc, x) => acc + x.getField("len").cast("long"))
            .as("covered"))
      chunks.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).cast("long").as("sum_bytes"),
          expr("bool_and(covered = n_bytes)").as("coverage_ok"),
          expr("bool_and(n_chunks >= CAST(ceil(n_bytes / 256.0) " +
            "AS BIGINT) AND (n_bytes = 0 OR n_chunks <= " +
            "CAST(ceil(n_bytes / 32.0) AS BIGINT)))")
            .as("bounds_ok"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // PII redaction (the release-time transform paired with q50's
    // scan): sequential regexp_replace fold, most-specific pattern
    // first; per-source summary of how much text changed
    "q79_pii_redact" -> ((s, d) => {
      val docs = t(s, d, "documents")
      docs.select(col("source"), col("text"),
          TextFunctions.redactPii(col("text")).as("redacted"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("redacted") =!= col("text"), 1))
            .as("n_changed"),
          sum(length(col("redacted"))).cast("long")
            .as("sum_len_after"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // token-budget mixture sampling: per-source keep-rate derived
    // from token totals (budget/total of the hash space), DECIMAL
    // cross-multiplication so 100 TB token totals can't overflow the
    // predicate; summary of what survives per source
    "q78_token_budget" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("ntok",
        TextFunctions.tokenCount(col("text")).cast("long"))
      Sampling.tokenBudgetSample(docs, col("source"), col("doc_id"),
          col("ntok"), budget = 5000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("n_tokens"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // corpus-overlap matrix between sources: MinHash group-signature
    // estimate (fixed state per group — the 100 TB path) NEXT TO the
    // exact shingle-set inter/union, so the estimator's error is
    // pinned by the gate, not taken on faith
    "q77_corpus_overlap" -> ((s, d) =>
      Dedup.corpusOverlapMatrix(t(s, d, "documents"), col("source"),
          col("text"))
        .orderBy(col("g1").asc_nulls_first,
          col("g2").asc_nulls_first)),

    // sketch-based corpus profile with self-auditing error gates:
    // HLL++ distinct-fingerprint and GK median estimates are computed
    // NEXT TO their exact counterparts, and the query emits
    // within-tolerance booleans — the oracle pins the exact columns
    // and expects every gate to read true, so a sketch drifting past
    // its bound fails the hash compare
    "q76_sketch_profile" -> ((s, d) =>
      Sketches.profileWithGates(t(s, d, "documents"), col("source"),
          col("text"))
        .withColumnRenamed("group", "source")
        .orderBy(col("source").asc_nulls_first)),

    // sequence packing: deterministic shard (hash) + token-budget
    // bins (windowed cumulative offset) — the shard-and-pack step
    // before training; per-(shard, bin) fill summary
    "q46_pack_bins" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long")
            .as("ntok"))
      Sampling.packBins(docs, col("doc_id"), col("ntok"),
          numShards = 4, tokenBudget = 1000L)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("sum_tokens"))
        .orderBy(col("shard").asc_nulls_first,
          col("bin").asc_nulls_first)
    }),

    // ---- similarity search ---------------------------------------
    "q28_cosine_topk" -> ((s, d) =>
      Similarity.cosineTopK(t(s, d, "embeddings"), "vec_id",
        "embedding", queryId = 0L, k = 10)),

    "q29_lsh_buckets" -> ((s, d) =>
      Similarity.lshBucketCounts(t(s, d, "embeddings"), "embedding",
        targetPerBucket = 128L)),

    // per-label centroid partial sums (the IVF building block):
    // exact quantized integers, vectors never collected
    "q39_centroid_stats" -> ((s, d) =>
      Similarity.centroidStats(t(s, d, "embeddings"), col("label"),
          col("embedding"))
        .orderBy(col("label").asc_nulls_first)),

    "q30_cosine_near_dups" -> ((s, d) =>
      Similarity.cosineNearDupPairs(t(s, d, "embeddings"), "vec_id",
          "embedding", threshold = 0.5, targetPerBucket = 128L,
          maxBucketSize = 10000L)
        .agg(count(lit(1)).as("n_pairs_05"),
          count(when(col("cosine") >= 0.8, 1)).as("n_pairs_08"))),

    // IVF ANN query path: probe the 3 nearest per-label centroids
    // (exact quantized integer scoring — member count cancels out of
    // the cosine), re-rank only their members by exact cosine
    "q41_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), "vec_id", "embedding",
        "label", queryId = 0L, k = 10, nprobe = 3)),

    // batch IVF: every query vector (here vec_id < 3) probes its own
    // nprobe centroids; one corpus join against the broadcast probe
    // list, per-query top-k by bounded windows
    "q45_ivf_batch" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopKBatch(emb, "vec_id", "embedding", "label",
        emb.where(col("vec_id") < 3), "vec_id", "embedding",
        k = 5, nprobe = 2)
    }),

    // corpus-typicality quality score, the LM-free perplexity proxy:
    // a document built from corpus-common tokens scores high, a
    // rare-token outlier low. Exact integers throughout — per
    // (source, token) counts, global token mass via a window over
    // the vocab-sized aggregate (no corpus re-scan, no join), then
    // Σ c·global per source.
    "q49_typicality" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tok = t(s, d, "documents").select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("t"))
      val st = tok.groupBy(col("source"), col("t"))
        .agg(count(lit(1)).as("c"))
      st.withColumn("gc",
          sum(col("c")).over(Window.partitionBy(col("t"))))
        .groupBy(col("source"))
        .agg(sum(col("c") * col("gc")).cast("long").as("typicality"),
          sum(col("c")).cast("long").as("n_tokens"))
        .orderBy(col("source").asc_nulls_first)
    }),

    // PII release scan: per-source counts of email / IPv4 / phone /
    // SSN-shaped matches (a pure projection + aggregation — one
    // corpus scan, map-side partials). The synthetic corpus is
    // PII-free, so the oracle pins the zero counts; the pattern
    // correctness is pinned by unit fixtures with real-shaped PII.
    "q50_pii_scan" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"),
          TextFunctions.piiStats(col("text")).as("p"))
        .groupBy(col("source"))
        .agg(sum(col("p.n_emails")).cast("long").as("n_emails"),
          sum(col("p.n_ipv4")).cast("long").as("n_ipv4"),
          sum(col("p.n_phones")).cast("long").as("n_phones"),
          sum(col("p.n_ssns")).cast("long").as("n_ssns"))
        .orderBy(col("source").asc_nulls_first)),

    // per-domain quota cap: at most 7 docs per source, the 7
    // hash-smallest doc_ids — deterministic membership (same rows
    // every run/engine/partitioning). The operator prefilters by a
    // count-derived hash cutoff so the row_number window never sorts
    // a full group; the oracle is the naive full window.
    "q51_quota_sample" -> ((s, d) =>
      Sampling.quotaSample(t(s, d, "documents"), col("source"),
          col("doc_id"), quota = 7)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source").asc_nulls_first, col("doc_id").asc)),

    // self-contained IVF index build: deterministic spherical
    // k-means (hash-smallest seeds, exact integer centroid sums,
    // cosine assignment — no RNG, no division), 2 fixed Lloyd
    // rounds; per-learned-label membership summary
    "q48_kmeans" -> ((s, d) =>
      Similarity.kmeansLabels(t(s, d, "embeddings"), "vec_id",
          "embedding", k = 4, iters = 2)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          min(col("id")).as("min_vec_id"))
        .orderBy(col("label").asc_nulls_first)),

    // as-of join: every event picks up the latest signup state (the
    // signup events aggregated to unique (user, ts)) at or before its
    // own timestamp — DuckDB's native ASOF LEFT JOIN is the oracle,
    // so the union-window implementation is pinned against a second
    // engine's as-of semantics (inclusive match, latest wins,
    // unmatched keeps nulls). Summed state ids are exact integers.
    "q52_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val state = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("state_id"))
      Temporal.asOfJoin(ev, state, Seq("user_id"), "ts", "ts")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("state_id")).as("n_matched"),
          sum(col("state_id")).cast("long").as("sum_state"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // gap sessionization over the event stream (30-minute gap in the
    // ts column's native unit — long nanos or TIMESTAMP_NTZ micros,
    // see tsUnitsPerDay; the oracle views the same column via
    // epoch_us): per-user session and event counts, exact integers.
    // Session COUNTS are tie-safe (tied timestamps gap by zero), so
    // the oracle needs no unique-(key, ts) assumption.
    "q53_sessionize" -> ((s, d) => {
      val ev = t(s, d, "events")
      Temporal.sessionize(ev, "user_id", "ts",
          gap = tsUnitsPerDay(ev.schema("ts").dataType) / 48L)
        .groupBy(col("user_id"))
        .agg((max(col("session")) + 1L).as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id").asc_nulls_first)
    }),

    // the q52 as-of join through the hot-key pre-split path
    // (timeBuckets = 8): per-(key, bucket) windows stitched with one
    // carried boundary-state row must reproduce the unbucketed result
    // EXACTLY — the oracle is the same native ASOF JOIN, so the
    // stitching is pinned by the driver gate, not just the spec
    "q55_asof_bucketed" -> ((s, d) => {
      val ev = t(s, d, "events")
      val state = ev.where(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("state_id"))
      Temporal.asOfJoin(ev, state, Seq("user_id"), "ts", "ts",
          timeBuckets = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("state_id")).as("n_matched"),
          sum(col("state_id")).cast("long").as("sum_state"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // hierarchical k-means through the grouped-refinement machinery
    // (per-cell seed windows, (cell, dim) centroid joins): with one
    // coarse cell the refinement IS the flat algorithm, so q48's
    // unrolled DuckDB oracle pins the hierarchical code path
    // bit-for-bit through the driver gate
    "q56_kmeans_hier" -> ((s, d) =>
      Similarity.kmeansLabelsHierarchical(t(s, d, "embeddings"),
          "vec_id", "embedding", kCoarse = 1, kPerCell = 4, iters = 2)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          min(col("id")).as("min_vec_id"))
        .orderBy(col("label").asc_nulls_first)),

    // data mixing: per-source sampling rates (named sources at their
    // own rates, the long tail at the default) — the same md5
    // hash-space predicate as q37, so membership is deterministic,
    // nested across rates, and expressible verbatim in SQL
    "q54_mixture_sample" -> ((s, d) =>
      Sampling.mixtureSample(t(s, d, "documents"), col("source"),
          col("doc_id"),
          rates = Map("src0" -> ((1L, 2L)), "src1" -> ((1L, 4L))),
          default = (1L, 8L))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy(col("source").asc_nulls_first)),

    // winnowing (MOSS) fingerprint density per source: the rolling
    // k-gram hash + window-min selection pinned value-for-value — the
    // oracle runs the textually identical Horner recurrence (mod at
    // every step keeps both engines in exact long arithmetic)
    "q57_winnow_fp" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"),
          size(TextFunctions.winnowFingerprints(col("text"),
            k = 8, w = 4)).cast("long").as("nfp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nfp")).cast("long").as("total_fps"),
          min(col("nfp")).as("min_fps"),
          max(col("nfp")).as("max_fps"))
        .orderBy(col("source").asc_nulls_first)),

    // verbatim-overlap near-dup pairs by shared winnowing
    // fingerprints (>= 23-char shared substrings, >= 3 shared
    // fingerprint values): the hot-bucket-capped fingerprint
    // equi-join — never corpus x corpus
    "q58_winnow_pairs" -> ((s, d) =>
      Dedup.winnowPairs(t(s, d, "documents"), col("doc_id"),
          col("text"), k = 16, w = 8, minShared = 3)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("shared")), lit(0L)).cast("long")
            .as("sum_shared"),
          coalesce(max(col("shared")), lit(0L)).cast("long")
            .as("max_shared"))),

    // interval containment: every event joined to the 1-day windows
    // opened by its user's signups — the bucketed equi-join
    // (bucketWidth = window span, so each interval explodes to <= 2
    // buckets) must reproduce DuckDB's plain inequality join exactly,
    // inclusive bounds and all
    "q59_range_join" -> ((s, d) => {
      val evAll = t(s, d, "events")
      val day = tsUnitsPerDay(evAll.schema("ts").dataType)
      // window end = start + 1 day in the column's own algebra:
      // plain long addition for a nanos column, interval addition
      // for a timestamp column (wall-clock +24h — NTZ has no DST)
      val winEnd = evAll.schema("ts").dataType match {
        case LongType => col("ts") + lit(day)
        case _ => col("ts") + expr("INTERVAL 24 HOURS")
      }
      val ev = evAll
        .select(col("user_id"), col("ts"), col("event_type"),
          col("event_id"))
      val iv = evAll
        .where(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("win_start"),
          winEnd.as("win_end"), col("event_id").as("win_id"))
      Temporal.rangeJoin(ev, iv, Seq("user_id"), "ts",
          "win_start", "win_end", bucketWidth = day)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("win_id")).cast("long").as("sum_win"),
          min(col("event_id")).as("min_event"))
        .orderBy(col("event_type").asc_nulls_first)
    }),

    // PQ codebook training census: one row per (subspace, code) with
    // member count and smallest member — pins every per-subspace
    // Lloyd step (shared seeds, integer centroid sums, argmax
    // tie-breaks) against the unrolled per-subspace recurrence
    "q60_pq_codes" -> ((s, d) =>
      Similarity.pqAssign(t(s, d, "embeddings"), "vec_id",
          "embedding", dims = 64, m = 4, ksub = 4, iters = 2)
        .groupBy(col("sub"), col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          min(col("id")).as("min_vec_id"))
        .orderBy(col("sub").asc_nulls_first,
          col("label").asc_nulls_first)),

    // ADC top-5 for three queries over the PQ-coded corpus: the
    // broadcast-LUT projection scan must reproduce the oracle's
    // join-and-pivot formulation term-for-term (fixed-order double
    // sums, vec_id tie-breaks)
    "q61_pq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val assign = Similarity.pqAssign(emb, "vec_id", "embedding",
        dims = 64, m = 4, ksub = 4, iters = 2)
      val codes = Similarity.pqCodes(assign)
      val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dims = 64, m = 4, assign)
      Similarity.pqTopKAdc(codes, books,
        emb.where(col("vec_id") < 3), "vec_id", "embedding",
        dims = 64, m = 4, k = 5)
    }),

    // incremental dedup screen: hash-split the documents into a 20%
    // "new batch" and an 80% "existing corpus", and census the
    // new-vs-old LSH band collisions — the delta-dedup candidate
    // generator that never self-pairs the corpus
    "q63_dedup_against" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val isNew = pmod(Sampling.hash32(col("doc_id")), lit(5L)) === 0L
      val pairs = Dedup.lshPairsAgainst(
        docs.where(!isNew), col("doc_id"), col("text"),
        docs.where(isNew), col("doc_id"), col("text"))
      pairs.groupBy(col("new_id")).agg(count(lit(1)).as("n_old"))
        .agg(count(lit(1)).as("n_flagged"),
          coalesce(sum(col("n_old")), lit(0L)).cast("long")
            .as("total_cands"),
          coalesce(max(col("n_old")), lit(0L)).cast("long")
            .as("max_cands"))
    }),

    // IVF + PQ serving composition: probe 2 of 4 IVF cells per
    // query, ADC-rank only the probed cells' code words — the
    // sublinear-candidates × no-float-reads production ANN shape
    "q64_ivfpq_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val assign = Similarity.pqAssign(emb, "vec_id", "embedding",
        dims = 64, m = 4, ksub = 4, iters = 2)
      val codes = Similarity.pqCodes(assign)
      val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
        dims = 64, m = 4, assign)
      val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
        k = 4, iters = 2)
      Similarity.ivfPqTopK(codes, books, idx.labels, idx.centroids,
        emb.where(col("vec_id") < 3), "vec_id", "embedding",
        dims = 64, m = 4, k = 5, nprobe = 2)
    }),

    // the curation pipeline END-TO-END: near-dup dedup -> quality
    // floor -> per-source mixture rates -> token-budget packing, all
    // four operators composed in one plan; the oracle chains the
    // same four SQL derivations, so any cross-operator interaction
    // bug (schema drift, row leakage, hash reuse) breaks the hash
    "q65_curation_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val deduped = Dedup.deduplicate(docs, col("doc_id"),
        col("text"))
      val qual = deduped.where(
        TextFunctions.qualityScore(col("text")) >=
          lit(new java.math.BigDecimal("0.250000")))
      val mixed = Sampling.mixtureSample(qual, col("source"),
        col("doc_id"),
        rates = Map("src0" -> ((1L, 2L)), "src1" -> ((1L, 4L))),
        default = (1L, 8L))
      val withTok = mixed.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long")
          .as("ntok"))
      Sampling.packBins(withTok, col("doc_id"), col("ntok"),
          numShards = 4, tokenBudget = 1000L)
        .groupBy(col("shard"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).cast("long").as("sum_tokens"))
        .orderBy(col("shard").asc_nulls_first,
          col("bin").asc_nulls_first)
    }),

    // one-call embedding dedup census (cosine >= 0.8 clusters ->
    // smallest-id representative): degenerate at sf0.01 (the
    // synthetic embeddings have no near-dups — q30 counts 0 pairs)
    // but live at the sf1 soak's replicated embeddings; the spec
    // carries the cluster semantics on controlled fixtures
    "q66_dedup_embeddings" -> ((s, d) =>
      Similarity.deduplicateEmbeddings(t(s, d, "embeddings"),
          "vec_id", "embedding", threshold = 0.8)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("vec_id")).cast("long").as("sum_ids"))),

    // SERVING-ONLY IVF+PQ top-k over the PERSISTED index tables —
    // the latency the bench should track for the production ANN
    // path (q64 times training + serving together). The index is
    // built once per sf directory and cached on disk; repeat runs
    // (and the bench's best-of-N) exercise pure probe + ADC scan
    // over parquet. The oracle reads the SAME persisted tables.
    "q67_pq_serving" -> ((s, d) => {
      val dir = ensureServingIndex(s, d)
      val pq = Similarity.readPqIndex(s, s"$dir/pq")
      val ivf = Similarity.readIvfIndex(s, s"$dir/ivf")
      Similarity.ivfPqTopK(pq.codes, pq.codebooks, ivf.labels,
        ivf.centroids, t(s, d, "embeddings").where(col("vec_id") < 3),
        "vec_id", "embedding", dims = 64, m = 4, k = 5, nprobe = 2)
    }),

    // residual-PQ training census: per (IVF cell, subspace, residual
    // code) the member count and smallest member — pins the WHOLE
    // residual chain (final IVF assignment, integer rounded
    // centroids, residual components, per-cell hash-smallest seeds,
    // one Lloyd step with the zero-norm NULL-score convention)
    // against the unrolled SQL re-derivation
    "q68_pq_residual" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idx = Similarity.buildIvfIndex(emb, "vec_id", "embedding",
        k = 4, iters = 2)
      Similarity.pqAssignResidual(emb, "vec_id", "embedding",
          dims = 64, m = 4, ksub = 4, ivfLabels = idx.labels,
          ivfCentroids = idx.centroids, iters = 1)
        .join(idx.labels.select(col("id"),
          col("label").as("cell")), Seq("id"))
        .groupBy(col("cell"), col("sub"), col("label"))
        .agg(count(lit(1)).as("n_vectors"),
          min(col("id")).as("min_vec_id"))
        .orderBy(col("cell").asc_nulls_first,
          col("sub").asc_nulls_first, col("label").asc_nulls_first)
    }),

    // incremental verbatim-overlap scan: the new batch's winnowing
    // fingerprint index joined against the corpus index ONLY
    // (new-vs-old, never corpus x corpus) — pins the
    // pairs-from-persisted-index path AND the delta composition in
    // one row, per-side hot-bucket caps encoded in the oracle
    "q69_winnow_against" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val newFps = Dedup.winnowDocFps(
        docs.where(col("doc_id") % 5 === 0), col("doc_id"),
        col("text"), k = 16, w = 8)
      val oldFps = Dedup.winnowDocFps(
        docs.where(col("doc_id") % 5 =!= 0), col("doc_id"),
        col("text"), k = 16, w = 8)
      Dedup.winnowPairsAgainstFps(oldFps, newFps, minShared = 3)
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("shared")), lit(0L)).cast("long")
            .as("sum_shared"),
          coalesce(max(col("shared")), lit(0L)).cast("long")
            .as("max_shared"),
          min(col("new_id")).as("min_new_id"))
    }),

    // hash-range shard census: per shard the row count, hash-range
    // bounds, and a content checksum — pins the reproducible-export
    // routing (shard = h·16 >> 32) against the identical SQL
    // arithmetic; the writer itself is spec-tested (one sorted file
    // per shard, membership == this assignment)
    "q62_shard_census" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          Sampling.shardAssign(col("doc_id"), 16).as("shard"),
          Sampling.hash32(col("doc_id")).as("h"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), min(col("h")).as("min_h"),
          max(col("h")).as("max_h"),
          sum(col("doc_id")).cast("long").as("sum_id"))
        .orderBy(col("shard").asc_nulls_first)),

    // timestamp-column calendar range: conversion to dates must agree
    // with DuckDB's native view of the same column. Dtype-adaptive:
    // a long-nanos column routes through timestamp_micros, a native
    // timestamp column casts directly
    "q34_nanos_range" -> ((s, d) => {
      val ev = t(s, d, "events")
      val day = ev.schema("ts").dataType match {
        case LongType =>
          timestamp_micros(expr("ts div 1000")).cast("date")
        case _ => col("ts").cast("date")
      }
      ev.agg(
        count(col("ts")).as("n_ts"),
        min(day).as("min_day"),
        max(day).as("max_day"))
    }),

    // ---- multimodal plumbing -------------------------------------
    "q31_media_stats" -> ((s, d) =>
      Multimodal.mediaStats(
        Multimodal.asMedia(t(s, d, "documents"), col("text"),
          "text/plain"),
        col("source"))),

    // real image-header decode (ImageMetaExpr: PNG/JPEG/GIF/BMP magic
    // + pixel dimensions straight from payload bytes): four synthetic
    // in-plan headers with known dimensions, plus the whole documents
    // corpus as binary payloads — every text blob must classify
    // "unknown" with null dims and never throw
    "q72_image_meta" -> ((s, d) => {
      import s.implicits._
      val fixtures = Seq(
        ("png_320x240", PngHex), ("jpeg_64x48", JpegHex),
        ("gif_12x7", GifHex), ("bmp_21x17", BmpHex))
        .toDF("name", "hex")
        .select(col("name"),
          Multimodal.imageMeta(unhex(col("hex"))).as("m"))
        .select(col("name"), col("m.format").as("format"),
          col("m.width").as("width"), col("m.height").as("height"),
          lit(1L).as("n"))
      // PNG/JPEG magic bytes cannot occur in text, but ASCII "BM" /
      // "GIF8" prefixes CAN — a regenerated corpus with one such doc
      // would legitimately sniff as bmp/gif and break the all-unknown
      // pin, so both engine and oracle exclude those prefixes from
      // the sweep (the fixtures cover the recognized formats)
      val corpus = t(s, d, "documents")
        .where(!col("text").startsWith("BM") &&
          !col("text").startsWith("GIF8"))
        .select(Multimodal.imageMeta(col("text").cast("binary"))
          .as("m"))
        .groupBy(col("m.format").as("format"))
        .agg(count(lit(1)).as("n"))
        .select(lit("corpus").as("name"), col("format"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"), col("n"))
      fixtures.unionByName(corpus)
        .orderBy(col("name").asc_nulls_first,
          col("format").asc_nulls_first)
    }),

    // the flagship structure-inference operator itself — one row per
    // column of `documents` with its inferred type string
    // (deterministic: exact counters over deterministic data; oracle =
    // explicit VALUES pin below)
    "q33_analyze_structure" -> ((s, d) =>
      analyzeDump(s, s.read.parquet(s"$d/documents.parquet"))),

    // structure inference over the EVENTS table: pins the analyzer's
    // handling of a native TIMESTAMP_NTZ column (datetime range
    // verdict + second-truncated rendering), JSON-pattern string
    // detection on props, and float range rendering — all derived
    // from the data in the oracle, so the gate holds at any SF
    "q71_analyze_events" -> ((s, d) =>
      analyzeDump(s, s.read.parquet(s"$d/events.parquet"))),

    // distributed multi-format analyze, end-to-end at the driver
    // gate: detect + scan a JSONL shard and a CSV shard on
    // executors (SparkAnalyzer), the YAML shard on the driver
    // (TreeAnalyzer — no native YAML source), then merge the three
    // trees through the AnalyzeDist fold and fix-point. The three
    // shards carry one logical table, so the verdicts must be the
    // UNION's ranges — which the oracle re-derives from the parquet
    // table the fixture was cut from
    "q109_analyze_multisource" -> ((s, d) => {
      val dir = ensureMultiSourceFixture(s, d)
      val analyzer = new graft.analyzer.SparkAnalyzer()
      val treeAnalyzer = new graft.analyzer.TreeAnalyzer()
      val trees = Seq(
        analyzer.analyzeTable(
          graft.sources.Source.sparkRead(s, s"$dir/part0.jsonl")),
        analyzer.analyzeTable(
          graft.sources.Source.sparkRead(s, s"$dir/part1.csv")),
        treeAnalyzer.analyze(
          graft.sources.Source.load(s"$dir/part2.yaml")))
      val folded = trees.reduceLeft { (acc, t) =>
        if (acc.isInstanceOf[graft.core.SValue]) acc
        else if (graft.core.SType.matches(acc, t))
          try graft.core.SType.merge(acc, t)
          catch { case _: IllegalArgumentException =>
            graft.core.SValue() }
        else graft.core.SValue()
      }
      val tree = graft.core.SSourcesList(
        graft.core.Stats.fromCounter(graft.core.ValueCounter(Map(
          (trees.length.toLong: Any) -> 1L))), folded)
      val merged = treeAnalyzer.mergeToFixpoint(tree)
      // the sources list wraps the per-file LIST-of-dicts trees, so
      // the row dict sits two levels down (sources -> rows -> dict)
      val rows = merged match {
        case srcs: graft.core.SSourcesList => srcs.content match {
          case l: graft.core.SList => l.content match {
            case dict: graft.core.SDict => dict.content.map(f =>
              (f.key.asInstanceOf[graft.core.SField].value.toString,
                f.value.render))
            case other => Vector(("", other.render))
          }
          case other => Vector(("", other.render))
        }
        case other => Vector(("", other.render))
      }
      import s.implicits._
      rows.toDF("column_name", "inferred")
        .orderBy(col("column_name").asc_nulls_first)
    }),

    // the daily-ingest path: analyze HALF the corpus, fold the other
    // half in as a delta via the merge monoid — must reproduce the
    // whole-corpus verdicts bit-for-bit (same oracle as q33), so the
    // incremental contract is driver-gated, not just spec-pinned
    "q70_analyze_incremental" -> ((s, d) => {
      val analyzer = new graft.analyzer.SparkAnalyzer()
      val docs = s.read.parquet(s"$d/documents.parquet")
      val prior = analyzer.analyzeTable(docs.where(col("doc_id") % 2 === 0))
      val rows = analyzer.analyzeIncremental(prior,
        docs.where(col("doc_id") % 2 =!= 0)) match {
        case l: graft.core.SList => l.content match {
          case dict: graft.core.SDict => dict.content.map(f =>
            (f.key.asInstanceOf[graft.core.SField].value.toString,
              f.value.render))
          case other => Vector(("", other.render))
        }
        case other => Vector(("", other.render))
      }
      import s.implicits._
      rows.toDF("column_name", "inferred")
        .orderBy(col("column_name").asc_nulls_first)
    }),

    // frame sampling + stub decode (explosion shape). The feature
    // aggregation is integer-exact: feat(1) is byte/255.0, and
    // round(feat·255) provably recovers the byte (the product is
    // within 1e-13 of the integer), so the sum is a plain long —
    // no decimal casts of doubles anywhere (engines tie-break those
    // differently).
    "q32_media_frames" -> ((s, d) => {
      val media = Multimodal.asMedia(t(s, d, "documents"), col("text"),
        "text/plain")
      val frames = Multimodal.sampleFrames(media, "payload",
        frameBytes = 64, stride = 128)
      frames
        .select(col("source"), col("frame_offset"),
          Multimodal.fakeDecodeFeatures(col("frame")).as("feat"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_frames"),
          sum(round(element_at(col("feat"), 1) * 255).cast("long"))
            .as("sum_f0"))
        .orderBy(col("source").asc_nulls_first)
    })
  )

  /** Winnowing fingerprint CTE: the same Horner recurrence as
    * `TextFunctions.winnowFingerprints` — mod at every step, so both
    * engines run the identical exact-long arithmetic; list
    * comprehensions keep it one row per document (no position
    * explosion).
    */
  private def winnowCte(k: Int, w: Int): String = {
    val horner = (0 until k).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
      s"(($acc * 257 + ord(substr(t, CAST(i+$j+1 AS INT), 1))) % " +
        "2147483647)"
    }
    "WITH norm AS (SELECT doc_id, source, regexp_replace(" +
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), " +
    "'[^a-z0-9 ]', '_', 'g') AS t FROM documents), " +
    s"kh AS (SELECT doc_id, source, [$horner FOR i IN " +
    s"range(greatest(length(t) - ${k - 1}, 0))] AS hs FROM norm), " +
    s"fp AS (SELECT doc_id, source, CASE WHEN len(hs) >= $w THEN " +
    s"list_distinct([list_min(hs[i+1:i+$w]) FOR i IN " +
    s"range(len(hs) - ${w - 1})]) ELSE [] END AS fps FROM kh)"
  }

  private val shingleCte =
    "WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), " +
    "'\\s+') AS t FROM documents), " +
    "sh AS (SELECT DISTINCT doc_id, unnest([t[i+1] || ' ' || t[i+2] " +
    "|| ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] FOR i IN " +
    "range(greatest(array_length(t) - 4, 0))]) AS s FROM tok) "

  /** Salted-md5 MinHash family, identical to MinHashExpr: hash
    * i = slice (i mod 4) of md5(s || '#' || (i div 4)); 16 salts × 4
    * slices = the 64-hash family; b=16 bands of r=4.
    */
  private val minhashSigCte = {
    val mins = (0 until 16).flatMap { salt =>
      (0 until 4).map { slice =>
        val idx = salt * 4 + slice + 1
        s"MIN(substr(md5(s || '#$salt'), ${slice * 8 + 1}, 8)) AS mh$idx"
      }
    }.mkString(", ")
    s", sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id)"
  }

  private val minhashBandsCte = {
    val selects = (0 until 16).map { b =>
      val key = (1 to 4).map(i => s"mh${b * 4 + i}").mkString(" || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig"
    }.mkString(" UNION ALL ")
    s", bands AS ($selects)"
  }

  /** One side of the delta-dedup oracle: the full shingle → salted
    * MinHash → band CTE chain over `documents WHERE pred`, suffixed
    * with `tag` so two sides coexist in one WITH clause.
    */
  private def minhashSideCtes(tag: String, pred: String): String = {
    val mins = (0 until 16).flatMap { salt =>
      (0 until 4).map { slice =>
        val idx = salt * 4 + slice + 1
        s"MIN(substr(md5(s || '#$salt'), ${slice * 8 + 1}, 8)) AS mh$idx"
      }
    }.mkString(", ")
    val bandSelects = (0 until 16).map { b =>
      val key = (1 to 4).map(i => s"mh${b * 4 + i}").mkString(" || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig$tag"
    }.mkString(" UNION ALL ")
    s"tok$tag AS (SELECT doc_id, regexp_split_to_array(trim(text), " +
    s"'\\s+') AS t FROM documents WHERE $pred), " +
    s"sh$tag AS (SELECT DISTINCT doc_id, unnest([t[i+1] || ' ' || " +
    "t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] FOR " +
    s"i IN range(greatest(array_length(t) - 4, 0))]) AS s FROM " +
    s"tok$tag), " +
    s"sig$tag AS MATERIALIZED (SELECT doc_id, $mins FROM sh$tag " +
    s"GROUP BY doc_id), " +
    s"bands$tag AS MATERIALIZED ($bandSelects)"
  }

  /** The q141 bigram-LM per-document scoring chain (trusted slice =
    * src0, scored = the rest): ends at `pd(source, doc_id, n_b,
    * n_u, bits, decibits)` — shared by q141's census and q150's
    * quartile cut.
    */
  private val lmPerDocCte =
    "WITH d AS (SELECT source, doc_id, regexp_split_to_array(" +
    "trim(text), '\\s+') AS l FROM documents), " +
    "p AS (SELECT source, doc_id, l[i-1] AS w1, " +
    "l[i-1] || ' ' || l[i] AS bg FROM d, " +
    "unnest(range(2, len(l) + 1)) AS u(i) WHERE len(l) >= 2), " +
    "tb AS (SELECT bg, COUNT(*) AS c_bi FROM p " +
    "WHERE source = 'src0' GROUP BY bg), " +
    "tu AS (SELECT w1, COUNT(*) AS c_uni FROM p " +
    "WHERE source = 'src0' GROUP BY w1), " +
    "v AS (SELECT COUNT(DISTINCT w1) AS v FROM p " +
    "WHERE source = 'src0'), " +
    "sc AS (SELECT p.source, p.doc_id, " +
    "length(bin(COALESCE(tu.c_uni, 0) + v.v)) - " +
    "length(bin(COALESCE(tb.c_bi, 0) + 1)) AS bits, " +
    "CASE WHEN tb.c_bi IS NULL THEN 1 ELSE 0 END AS unseen " +
    "FROM p CROSS JOIN v LEFT JOIN tb ON p.bg = tb.bg " +
    "LEFT JOIN tu ON p.w1 = tu.w1 WHERE p.source <> 'src0'), " +
    "pd AS (SELECT source, doc_id, COUNT(*) AS n_b, " +
    "SUM(unseen) AS n_u, SUM(bits) AS bits, " +
    "(10 * SUM(bits)) // COUNT(*) AS decibits " +
    "FROM sc GROUP BY source, doc_id) "

  /** q147's sampled slice: the q25/q26 shingle chain restricted to
    * the hash-sampled doc ids (the eval universe).
    */
  private val sampledShingleCte =
    "WITH tok AS (SELECT doc_id, regexp_split_to_array(trim(text), " +
    "'\\s+') AS t FROM documents WHERE doc_id % 2 = 0), " +
    "sh AS (SELECT DISTINCT doc_id, unnest([t[i+1] || ' ' || t[i+2] " +
    "|| ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] FOR i IN " +
    "range(greatest(array_length(t) - 4, 0))]) AS s FROM tok) "

  /** round-half-away quantization identical in both engines. */
  private val unnestEmb =
    "(SELECT vec_id, generate_subscripts(embedding, 1) AS i, " +
    "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 33554432.0) AS " +
    "BIGINT) AS x FROM embeddings)"

  private val lshMaxBits = graft.functions.LshSignExpr.MaxBits

  /** Bucket-width CASE ladder — integer-exact twin of
    * Similarity.bitsForCount (target 128/bucket): smallest b in
    * [4, MaxBits] with n ≤ 128·2^b.
    */
  private val bitsSql =
    "(SELECT CASE " +
      (4 until lshMaxBits).map(b =>
        s"WHEN n <= ${128L << b} THEN $b ").mkString +
      s"ELSE $lshMaxBits END AS bits FROM " +
      "(SELECT COUNT(*) AS n FROM embeddings))"

  /** md5-hyperplane sign pattern masked to the derived width —
    * bit-for-bit the engine's LshSignExpr + bitsForCount mask
    * (BIGINT throughout = the engine's unsigned-32-in-a-long view,
    * so bit 31 of the 32-bit family is a positive 2^31 term in both
    * engines).
    */
  private def bucketSql(src: String): String =
    s"SELECT vec_id, CAST(" +
      (0 until lshMaxBits).map(j =>
        s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
        .mkString(" + ") +
      " AS BIGINT) & ((CAST(1 AS BIGINT) << bits) - 1) AS bucket " +
      "FROM (SELECT vec_id, " +
      (0 until lshMaxBits).map(j =>
        s"SUM(CASE WHEN substr(md5(CAST(i AS VARCHAR) || ':$j'), " +
        s"1, 1) BETWEEN '0' AND '7' THEN x ELSE -x END) AS s$j")
        .mkString(", ") +
      s" FROM $src GROUP BY vec_id), $bitsSql"

  /** The q40/q47 shared chain: MinHash signature + band CTEs (the
    * q26 family), capped band buckets → candidate pairs → exact
    * Jaccard on the candidates only (plain shingles — no df cap; the
    * cap guards the full self-join, which this path never does) →
    * recursive transitive closure (the q36 pattern) → labels.
    */
  private val lshClusterCtes: String =
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") +
    minhashSigCte + minhashBandsCte +
    ", hotb AS (SELECT band, key FROM bands GROUP BY band, key " +
    "HAVING COUNT(*) > 10000)" +
    ", kb AS (SELECT doc_id, band, key FROM bands b WHERE NOT " +
    "EXISTS (SELECT 1 FROM hotb h WHERE h.band = b.band AND " +
    "h.key = b.key))" +
    ", cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2 " +
    "FROM kb a JOIN kb b ON a.band = b.band AND a.key = b.key " +
    "AND a.doc_id < b.doc_id)" +
    ", shd AS (SELECT doc_id, substr(md5(s), 1, 16) AS s FROM sh)" +
    ", vsz AS (SELECT doc_id, COUNT(*) AS n FROM shd " +
    "GROUP BY doc_id)" +
    ", itr AS (SELECT id1, id2, COUNT(*) AS inter FROM cand " +
    "JOIN shd a ON a.doc_id = id1 JOIN shd b ON b.doc_id = id2 " +
    "AND b.s = a.s GROUP BY id1, id2)" +
    ", nd AS (SELECT c.id1, c.id2 FROM cand c JOIN vsz sa ON " +
    "c.id1 = sa.doc_id JOIN vsz sb ON c.id2 = sb.doc_id LEFT JOIN " +
    "itr i ON c.id1 = i.id1 AND c.id2 = i.id2 WHERE " +
    "COALESCE(i.inter, 0) * 5 >= (sa.n + sb.n - " +
    "COALESCE(i.inter, 0)))" +
    ", edges AS (SELECT id1 AS src, id2 AS dst FROM nd UNION " +
    "SELECT id2, id1 FROM nd)" +
    ", nodes AS (SELECT DISTINCT src AS id FROM edges)" +
    ", reach(id, r) AS (SELECT id, id FROM nodes UNION SELECT " +
    "reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)" +
    ", labels AS (SELECT id, MIN(r) AS label FROM reach " +
    "GROUP BY id)"

  /** The decontamination oracle, shared by q38 (exact broadcast path)
    * and q73 (Bloom prescreen + exact confirm): the two engine paths
    * compute the same hits by construction, so one SQL pins both.
    */
  private lazy val contaminationSql =
    shingleCte +
      ", shd AS (SELECT doc_id, substr(md5(s), 1, 16) AS s FROM sh)" +
      ", hv AS (SELECT doc_id, CAST('0x' || substr(md5(CAST(doc_id " +
      "AS VARCHAR)), 1, 8) AS BIGINT) AS h FROM documents)" +
      ", bench AS (SELECT doc_id FROM hv ORDER BY h, doc_id " +
      "LIMIT 20)" +
      ", corpus AS (SELECT doc_id FROM hv WHERE doc_id NOT IN " +
      "(SELECT doc_id FROM bench))" +
      ", bsh AS (SELECT shd.doc_id, s FROM shd JOIN bench " +
      "USING (doc_id))" +
      ", csh AS (SELECT DISTINCT s FROM shd JOIN corpus " +
      "USING (doc_id))" +
      ", hits AS (SELECT b.doc_id, COUNT(*) AS n_hits FROM bsh b " +
      "JOIN csh USING (s) GROUP BY 1)" +
      ", sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM bsh " +
      "GROUP BY 1) " +
      "SELECT COUNT(*) AS n_bench_docs, CAST(SUM(n_shingles) AS " +
      "BIGINT) AS n_shingles, CAST(SUM(COALESCE(n_hits, 0)) AS " +
      "BIGINT) AS n_hits, COUNT(CASE WHEN n_hits = n_shingles THEN " +
      "1 END) AS n_fully_contained " +
      "FROM sizes LEFT JOIN hits USING (doc_id)"

  /** The as-of oracle, shared by q52 (unbucketed) and q55 (hot-key
    * time-bucket pre-split): the two engine paths must agree with
    * DuckDB's native ASOF semantics — and therefore with each other.
    */
  /** The BPE-training oracle: `rounds` merge rounds unrolled as
    * layered CTEs (the kmeansSql pattern). Within a round, the
    * canonical greedy left-to-right merge application is expressed
    * with windows: adjacent-pair matches, grouped into runs of
    * consecutive positions (only identical-symbol runs can be
    * consecutive), alternating selection from each run head — which
    * is exactly the scan-left semantics of `Bpe.applyMerge`. Symbols
    * are code points (`regexp_extract_all(word, '(?s).')`), matching
    * `Bpe.chars` so supplementary-plane text agrees byte-for-byte.
    */
  private def bpeSql(rounds: Int): String =
    bpeCtes(rounds, applyAll = false) +
      " SELECT * FROM (" +
      (1 to rounds).map(r =>
        s"SELECT $r AS merge_rank, lhs, rhs, lhs || rhs AS merged, " +
          s"cnt FROM m$r").mkString(" UNION ALL ") +
      ") ORDER BY merge_rank"

  /** The training CTE chain alone: w1..w{rounds(+1 when applyAll)},
    * pc/m per round. `applyAll` also applies the LAST round's merge,
    * yielding the final vocabulary w{rounds+1} — what the encode
    * oracle (q114) joins words against.
    */
  private def bpeCtes(rounds: Int, applyAll: Boolean): String = {
    val sb = new StringBuilder
    sb ++= "WITH wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS f " +
      "FROM (SELECT unnest(regexp_split_to_array(trim(text), " +
      "'\\s+')) AS word FROM documents) WHERE word <> '' " +
      "GROUP BY word), " +
      "w1 AS MATERIALIZED (SELECT word AS wid, f, " +
      "regexp_extract_all(word, '(?s).') AS l FROM wf)"
    for (r <- 1 to rounds) {
      // pair counts over word frequencies (overlapping occurrences
      // counted), then the (cnt desc, lhs, rhs) argmax
      sb ++= s", pc$r AS (SELECT l[i] AS lhs, l[i+1] AS rhs, " +
        s"CAST(SUM(f) AS BIGINT) AS cnt FROM (SELECT f, l, " +
        s"unnest(range(1, len(l))) AS i FROM w$r WHERE " +
        s"len(l) >= 2) GROUP BY 1, 2)" +
        s", m$r AS MATERIALIZED (SELECT lhs, rhs, cnt FROM pc$r " +
        s"ORDER BY cnt DESC, lhs, rhs LIMIT 1)"
      if (r < rounds || applyAll) {
        sb ++= s", e$r AS (SELECT wid, f, generate_subscripts(l, 1) " +
          s"AS i, unnest(l) AS s FROM w$r)" +
          s", x$r AS (SELECT wid, f, i, s, " +
          s"(s = (SELECT lhs FROM m$r) AND lead(s) OVER " +
          s"(PARTITION BY wid ORDER BY i) = (SELECT rhs FROM m$r)) " +
          s"AS cand FROM e$r)" +
          s", y$r AS (SELECT *, CASE WHEN cand THEN i - " +
          s"ROW_NUMBER() OVER (PARTITION BY wid, cand ORDER BY i) " +
          s"END AS grp FROM x$r)" +
          s", z$r AS (SELECT wid, f, i, s, CASE WHEN " +
          s"COALESCE(cand, FALSE) AND (i - MIN(i) OVER " +
          s"(PARTITION BY wid, grp)) % 2 = 0 THEN 1 ELSE 0 END " +
          s"AS m FROM y$r)" +
          s", w${r + 1} AS MATERIALIZED (SELECT wid, ANY_VALUE(f) AS f, " +
          s"list(CASE WHEN m = 1 THEN s || lead_s ELSE s END " +
          s"ORDER BY i) AS l FROM (SELECT *, lead(s) OVER " +
          s"(PARTITION BY wid ORDER BY i) AS lead_s, lag(m) OVER " +
          s"(PARTITION BY wid ORDER BY i) AS prev_m FROM z$r) " +
          s"WHERE COALESCE(prev_m, 0) <> 1 GROUP BY wid)"
      }
    }
    sb.toString
  }

  private val splitHashSql =
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS " +
    "BIGINT) % 5"

  /** Cross-split MinHash band candidates (new = hash residue 0, old
    * = the rest), with per-side hot-bucket caps mirroring
    * lshPairsAgainst's dropHotBuckets on EACH side (q58/q66
    * convention; inert at sf0.01 but load-bearing the first time a
    * band bucket tops the cap at larger scale). Shared by q63
    * (candidate census) and q112 (leakage-free split).
    */
  private val crossSplitCandCtes =
    candCtes(s"$splitHashSql = 0", s"$splitHashSql <> 0")

  /** New-vs-old MinHash band candidates for arbitrary side
    * predicates (q63/q112 use the hash split; q118 probes one
    * document against the rest). `tag` suffixes every CTE name so
    * two candidate chains can coexist in one WITH clause.
    */
  private def candBody(tag: String, newPred: String,
                       oldPred: String): String =
    minhashSideCtes(s"n$tag", newPred) + ", " +
    minhashSideCtes(s"o$tag", oldPred) + ", " +
    s"hotn$tag AS (SELECT band, key FROM bandsn$tag GROUP BY " +
    "band, key HAVING COUNT(*) > 10000), " +
    s"hoto$tag AS (SELECT band, key FROM bandso$tag GROUP BY " +
    "band, key HAVING COUNT(*) > 10000), " +
    s"kn$tag AS (SELECT doc_id, band, key FROM bandsn$tag b " +
    s"WHERE NOT EXISTS (SELECT 1 FROM hotn$tag h WHERE " +
    "h.band = b.band AND h.key = b.key)), " +
    s"ko$tag AS (SELECT doc_id, band, key FROM bandso$tag b " +
    s"WHERE NOT EXISTS (SELECT 1 FROM hoto$tag h WHERE " +
    "h.band = b.band AND h.key = b.key)), " +
    s"pr$tag AS MATERIALIZED (SELECT DISTINCT n.doc_id AS " +
    s"new_id, o.doc_id AS old_id FROM kn$tag n JOIN ko$tag o ON " +
    s"n.band = o.band AND n.key = o.key)"

  private def candCtes(newPred: String, oldPred: String): String =
    "WITH " + candBody("", newPred, oldPred)

  /** q120's integer-IPF replay: 3 rounds of exact floor-division
    * raking updates over the (lang, source) contingency cells in
    * HUGEINT — bit-identical to the engine's DECIMAL(38,0)
    * `(a - a mod b) / b` because both are exact integer floor
    * divisions of non-negative operands.
    */
  /** q119/q124's shared oracle: the top bigram by (count desc,
    * bigram asc), then 0-based match positions per document — one
    * logical phrase-search answer that both the scan strategy
    * (q119) and the posting-join strategy (q124) must hit.
    */
  private lazy val phraseOracleSql: String =
    "WITH tok AS MATERIALIZED (SELECT doc_id, " +
    "regexp_split_to_array(trim(text), '\\s+') AS t FROM " +
    "documents), " +
    // the probe picker samples 1-in-20 docs (the engine's hash
    // sample) — the search side below still scans every document
    "bgs AS (SELECT unnest([t[i+1] || ' ' || t[i+2] FOR i IN " +
    "range(greatest(array_length(t) - 1, 0))]) AS bg FROM tok " +
    "WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, " +
    "8) AS BIGINT) % 20 = 0), " +
    "top AS MATERIALIZED (SELECT bg, COUNT(*) AS cnt FROM bgs " +
    "GROUP BY bg ORDER BY cnt DESC, bg ASC LIMIT 1), " +
    "w AS MATERIALIZED (SELECT string_split(bg, ' ')[1] AS w1, " +
    "string_split(bg, ' ')[2] AS w2 FROM top), " +
    // subqueries are not allowed inside DuckDB lambdas, so the
    // phrase words join in as plain columns
    "pos AS (SELECT doc_id, [i FOR i IN " +
    "range(greatest(array_length(t) - 1, 0)) IF " +
    "t[i+1] = w1 AND t[i+2] = w2] AS ps FROM tok CROSS JOIN w) " +
    "SELECT (SELECT bg FROM top) AS phrase, " +
    "COUNT(*) AS n_docs, " +
    "CAST(COALESCE(SUM(array_length(ps)), 0) AS BIGINT) AS " +
    "n_occ, " +
    "CAST(COALESCE(SUM(ps[1]), 0) AS BIGINT) AS sum_first_pos, " +
    "CAST(COALESCE(MAX(array_length(ps)), 0) AS BIGINT) AS " +
    "max_occ FROM pos WHERE array_length(ps) > 0"

  /** One Viterbi DP pass as a recursive CTE against a cost table
    * named `vcName`: best-cost array carried as a list column, one
    * lockstep position per iteration.
    */
  private def unigramDpSql(dpName: String, vcName: String): String =
    s"$dpName AS (SELECT w, f, CAST(0 AS BIGINT) AS i, " +
    "[CAST(0 AS BIGINT)] AS best FROM wf WHERE length(w) <= 60 " +
    s"UNION ALL SELECT d.w, d.f, d.i + 1, list_append(d.best, " +
    "MIN(d.best[CAST(d.i + 2 - t.k AS INTEGER)] + v.cost)) " +
    s"FROM $dpName d JOIN range(1, 5) t(k) ON t.k <= d.i + 1 " +
    s"LEFT JOIN $vcName v ON v.piece = substr(d.w, CAST(d.i + 2 - " +
    "t.k AS INTEGER), CAST(t.k AS INTEGER)) " +
    "WHERE d.i < length(d.w) GROUP BY d.w, d.f, d.i, d.best)"

  /** q154/q164's shared unigram chain: word table → piece counts →
    * whole-bit costs (v0) → Viterbi DP under v0 → the BACKTRACE
    * (smallest winning k per step, the expression's pinned
    * tie-break) → frequency-weighted piece usage → the EM round's
    * pruned/re-scored vocabulary v1 (singles always survive —
    * the coverage floor; add-one-smoothed masses) → Viterbi DP
    * under v1, ending at `per(w, f, obj)`. Mirrors
    * `Unigram.vocabulary(..., emRounds = 1)` construct for
    * construct. Correlated range() laterals are unsupported in
    * DuckDB — positions/lengths enumerate through unnest.
    */
  private lazy val unigramDpCtes: String =
    "WITH RECURSIVE " +
    "wf AS MATERIALIZED (SELECT word AS w, CAST(COUNT(*) AS " +
    "BIGINT) AS f FROM (SELECT unnest(regexp_split_to_array(" +
    "trim(text), '\\s+')) AS word FROM documents) WHERE " +
    "word <> '' GROUP BY word), " +
    "pc AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) " +
    "AS cnt FROM (SELECT f, substr(w, CAST(i + 1 AS INTEGER), " +
    "CAST(k AS INTEGER)) AS piece FROM (SELECT f, w, i, " +
    "unnest([1,2,3,4]) AS k FROM (SELECT f, w, " +
    "unnest(range(length(w))) AS i FROM wf)) WHERE " +
    "i + k <= length(w)) GROUP BY piece HAVING SUM(f) >= 5), " +
    "tc AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM pc), " +
    "vc AS MATERIALIZED (SELECT piece, CAST((length(bin(" +
    "(SELECT t FROM tc))) - length(bin(cnt)) + 1) * 64 + 1 AS " +
    "BIGINT) AS cost FROM pc), " +
    unigramDpSql("dp0", "vc") + ", " +
    "fin AS MATERIALIZED (SELECT w, f, best FROM dp0 WHERE " +
    "i = length(w)), " +
    // backtrace: from position i, step back by the SMALLEST k whose
    // piece cost closes the optimum — exactly the forward DP's
    // strict-improvement-in-k-order back pointer
    "bt AS (SELECT w, f, best, CAST(length(w) AS BIGINT) AS i, " +
    "CAST(NULL AS VARCHAR) AS piece FROM fin WHERE " +
    "best[CAST(length(w) + 1 AS INTEGER)] IS NOT NULL " +
    "UNION ALL SELECT q.w, q.f, q.best, q.i - q.mk, " +
    "substr(q.w, CAST(q.i - q.mk + 1 AS INTEGER), " +
    "CAST(q.mk AS INTEGER)) FROM (SELECT b.w, b.f, b.best, b.i, " +
    "MIN(t.k) AS mk FROM bt b JOIN range(1, 5) t(k) ON " +
    "t.k <= b.i JOIN vc v ON v.piece = substr(b.w, " +
    "CAST(b.i - t.k + 1 AS INTEGER), CAST(t.k AS INTEGER)) " +
    "WHERE b.i > 0 AND b.best[CAST(b.i - t.k + 1 AS INTEGER)] " +
    "+ v.cost = b.best[CAST(b.i + 1 AS INTEGER)] " +
    "GROUP BY b.w, b.f, b.best, b.i) q), " +
    "us AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) AS " +
    "mass FROM bt WHERE piece IS NOT NULL GROUP BY 1), " +
    "kv AS MATERIALIZED (SELECT v.piece, COALESCE(u.mass, 0) + 1 " +
    "AS m FROM vc v LEFT JOIN us u ON u.piece = v.piece WHERE " +
    "COALESCE(u.mass, 0) >= 5 OR length(v.piece) = 1), " +
    "tc1 AS (SELECT CAST(SUM(m) AS BIGINT) AS t FROM kv), " +
    "vc1 AS MATERIALIZED (SELECT piece, CAST((length(bin(" +
    "(SELECT t FROM tc1))) - length(bin(m)) + 1) * 64 + 1 AS " +
    "BIGINT) AS cost FROM kv), " +
    unigramDpSql("dp", "vc1") + ", " +
    "per AS MATERIALIZED (SELECT d.w, d.f, d.best[CAST(" +
    "length(d.w) + 1 AS INTEGER)] AS obj FROM dp d WHERE " +
    "d.i = length(d.w) " +
    "UNION ALL SELECT w, f, CAST(NULL AS BIGINT) FROM wf " +
    "WHERE length(w) > 60)"

  /** q152/q153's PageRank replay: the exact floor-division update
    * unrolled as materialized CTEs in HUGEINT — bit-identical to the
    * engine's DECIMAL(38,0) `(a - a mod b) / b` because both are
    * exact integer floor divisions of non-negative operands. The
    * edge CTE and the optional seed CTE are the only variation
    * points, so q152 (plain) and q153 (seeded, symmetrized) share
    * one generator and cannot drift from each other.
    */
  private def pagerankCtes(edgesSql: String, seedsSql: Option[String],
                           rounds: Int, num: Long = 17L,
                           den: Long = 20L,
                           scale: Long = 1000000L,
                           weighted: Boolean = false): String = {
    // unweighted edge lists get w = 1 - the generalized update
    // SUM((pr*w) // SUM w) is then value-identical to the classic
    // SUM(pr // outdeg)
    val edgesWithW =
      if (weighted) edgesSql
      else "SELECT src, dst, CAST(1 AS HUGEINT) AS w FROM (" +
        edgesSql + ")"

    val nf = seedsSql match {
      case Some(sq) =>
        "nf AS MATERIALIZED (SELECT n.node, s.node IS NOT NULL AS " +
        s"is_seed FROM nodes n LEFT JOIN ($sq) s ON n.node = s.node)"
      case None =>
        "nf AS MATERIALIZED (SELECT node, TRUE AS is_seed FROM nodes)"
    }
    val body = (1 to rounds).map { r =>
      s"i$r AS (SELECT e.dst AS node, SUM((p.pr * e.w) // d.deg) AS " +
      s"inflow " +
      s"FROM edges e JOIN p${r - 1} p ON e.src = p.node JOIN deg d " +
      "ON e.src = d.node GROUP BY 1), " +
      s"g$r AS (SELECT CAST(COALESCE(SUM(p.pr), 0) AS HUGEINT) AS " +
      s"dang FROM p${r - 1} p ANTI JOIN deg d ON p.node = d.node), " +
      s"p$r AS MATERIALIZED (SELECT f.node, f.is_seed, " +
      s"CASE WHEN f.is_seed THEN (${den - num} * (SELECT n FROM " +
      s"tot) * $scale) // ($den * (SELECT s FROM tot)) ELSE " +
      s"CAST(0 AS HUGEINT) END + ($num * (COALESCE(i.inflow, 0) + " +
      s"CASE WHEN f.is_seed THEN (SELECT dang FROM g$r) // (SELECT " +
      s"s FROM tot) ELSE 0 END)) // $den AS pr FROM nf f LEFT JOIN " +
      s"i$r i ON f.node = i.node)"
    }.mkString(", ")
    s"edges AS MATERIALIZED ($edgesWithW), " +
    "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION " +
    "SELECT dst FROM edges), " +
    "deg AS MATERIALIZED (SELECT src AS node, CAST(SUM(w) AS " +
    "HUGEINT) AS deg FROM edges GROUP BY 1), " + nf + ", " +
    "tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, " +
    "CAST(COUNT(*) FILTER (is_seed) AS HUGEINT) AS s FROM nf), " +
    "p0 AS MATERIALIZED (SELECT node, is_seed, CASE WHEN is_seed " +
    s"THEN ((SELECT n FROM tot) * $scale) // (SELECT s FROM tot) " +
    "ELSE CAST(0 AS HUGEINT) END AS pr FROM nf), " + body
  }

  /** q157's HITS replay: alternating authority/hub half-steps with
    * exact floor-division L1 renormalization, unrolled in HUGEINT.
    */
  private def hitsCtes(edgesSql: String, rounds: Int,
                       scale: Long = 1000000L): String = {
    val body = (1 to rounds).map { r =>
      s"ar$r AS (SELECT e.dst AS node, SUM(s.hub) AS a_raw FROM " +
      s"edges e JOIN s${r - 1} s ON e.src = s.node GROUP BY 1), " +
      s"at$r AS (SELECT CAST(COALESCE(SUM(a_raw), 0) AS HUGEINT) " +
      s"AS at FROM ar$r), " +
      s"wa$r AS MATERIALIZED (SELECT n.node, CASE WHEN a.a_raw IS " +
      s"NULL OR (SELECT at FROM at$r) <= 0 THEN CAST(0 AS " +
      s"HUGEINT) ELSE (a.a_raw * $scale) // (SELECT at FROM " +
      s"at$r) END AS auth FROM nodes n LEFT JOIN ar$r a ON " +
      "n.node = a.node), " +
      s"hr$r AS (SELECT e.src AS node, SUM(w.auth) AS h_raw FROM " +
      s"edges e JOIN wa$r w ON e.dst = w.node GROUP BY 1), " +
      s"ht$r AS (SELECT CAST(COALESCE(SUM(h_raw), 0) AS HUGEINT) " +
      s"AS ht FROM hr$r), " +
      s"s$r AS MATERIALIZED (SELECT w.node, CASE WHEN h.h_raw IS " +
      s"NULL OR (SELECT ht FROM ht$r) <= 0 THEN CAST(0 AS " +
      s"HUGEINT) ELSE (h.h_raw * $scale) // (SELECT ht FROM " +
      s"ht$r) END AS hub, w.auth FROM wa$r w LEFT JOIN hr$r h " +
      "ON w.node = h.node)"
    }.mkString(", ")
    s"edges AS MATERIALIZED ($edgesSql), " +
    "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION " +
    "SELECT dst FROM edges), " +
    s"s0 AS MATERIALIZED (SELECT node, CAST($scale AS HUGEINT) " +
    s"AS hub, CAST($scale AS HUGEINT) AS auth FROM nodes), " + body
  }

  /** q178's replay: DEFERRED-normalization HITS — raw HUGEINT power
    * iteration (h₀ = 1; a_t = Σ in-neighbors' h; h_t = Σ
    * out-neighbors' a; absentees 0), ONE floor L1 normalization to
    * `scale` at the end. Matches [[graft.operators.Graph
    * .hitsDeferred]] bit-for-bit.
    */
  private def hitsDeferredCtes(edgesSql: String, rounds: Int,
                               scale: Long = 1000000L): String = {
    val body = (1 to rounds).map { r =>
      s"ar$r AS (SELECT e.dst AS node, SUM(s.h) AS a FROM edges " +
      s"e JOIN s${r - 1} s ON e.src = s.node GROUP BY 1), " +
      s"wa$r AS MATERIALIZED (SELECT n.node, " +
      s"COALESCE(ar$r.a, 0) AS a FROM nodes n LEFT JOIN ar$r ON " +
      s"n.node = ar$r.node), " +
      s"hr$r AS (SELECT e.src AS node, SUM(w.a) AS h FROM edges " +
      s"e JOIN wa$r w ON e.dst = w.node GROUP BY 1), " +
      s"s$r AS MATERIALIZED (SELECT w.node, w.a, " +
      s"COALESCE(hr$r.h, 0) AS h FROM wa$r w LEFT JOIN hr$r ON " +
      s"w.node = hr$r.node)"
    }.mkString(", ")
    s"edges AS MATERIALIZED ($edgesSql), " +
    "nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION " +
    "SELECT dst FROM edges), " +
    "s0 AS MATERIALIZED (SELECT node, CAST(0 AS HUGEINT) AS a, " +
    "CAST(1 AS HUGEINT) AS h FROM nodes), " + body + ", " +
    s"tot AS (SELECT CAST(SUM(a) AS HUGEINT) AS at, " +
    s"CAST(SUM(h) AS HUGEINT) AS ht FROM s$rounds), " +
    s"fin AS (SELECT node, CASE WHEN (SELECT ht FROM tot) <= 0 " +
    s"THEN CAST(0 AS HUGEINT) ELSE (h * $scale) // (SELECT ht " +
    "FROM tot) END AS hub, CASE WHEN (SELECT at FROM tot) <= 0 " +
    s"THEN CAST(0 AS HUGEINT) ELSE (a * $scale) // (SELECT at " +
    s"FROM tot) END AS auth FROM s$rounds)"
  }

  private val purchaseEdgesSql: String =
    "SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src, " +
    "'s' || CAST(l_suppkey AS VARCHAR) AS dst FROM orders JOIN " +
    "lineitem ON l_orderkey = o_orderkey"

  /** q174/q175's shared replay: the full 6-round rank over the
    * shipment-succession cycle graph plus a reinforcing copy of the
    * suppkey ≡ 0 (mod 100) suppliers' cycles — the same window
    * construction as [[shipmentCycleEdges]], so the frame pins
    * exactly.
    */
  private def shipmentCycleSql(whereSql: String): String =
    "SELECT src, COALESCE(LEAD(src) OVER w, FIRST_VALUE(src) " +
    "OVER w) AS dst FROM (SELECT 'l' || CAST(l_orderkey AS " +
    "VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS src, " +
    "l_suppkey, l_shipdate, l_orderkey, l_linenumber FROM " +
    s"lineitem $whereSql) WINDOW w AS (PARTITION BY l_suppkey " +
    "ORDER BY l_shipdate, l_orderkey, l_linenumber)"

  private lazy val smallDeltaRankSql: String =
    "WITH cyc AS MATERIALIZED (" + shipmentCycleSql("") + "), " +
    "dcy AS MATERIALIZED (" +
    shipmentCycleSql("WHERE l_suppkey % 100 = 0") + "), " +
    pagerankCtes(
      "SELECT src, dst FROM cyc UNION ALL SELECT src, dst FROM dcy",
      None, rounds = 6) +
    " SELECT node, CAST(pr AS BIGINT) AS pr FROM p6 " +
    "ORDER BY pr DESC, node ASC NULLS FIRST LIMIT 10"

  // NB: lazy so the earlier-declared SQL strings can reference it
  // during object initialization
  private lazy val rakeOracleSql: String =
    "WITH " + rakeCtes + " SELECT row_key, CAST(SUM(n) AS BIGINT) " +
    "AS n_docs, CAST(((SELECT t FROM tot) * 1000000) // (SELECT l " +
    "FROM tot) AS BIGINT) AS target, CAST(SUM(w) AS BIGINT) AS " +
    "achieved FROM w3 GROUP BY row_key ORDER BY row_key NULLS FIRST"

  /** The shared raking CTE chain ending at `w3` (the solved cell
    * weights) — q120 reads the marginals, q122 the membership.
    */
  private lazy val rakeCtes: String = {
    val sc = "1000000"
    val rounds = (1 to 3).map { r =>
      s"r$r AS MATERIALIZED (SELECT row_key, CAST(SUM(w) AS " +
      s"HUGEINT) AS row_sum FROM w${r - 1} GROUP BY 1), " +
      s"wa$r AS MATERIALIZED (SELECT b.row_key, b.col_key, b.n, " +
      s"(b.w * rt.row_target) // r$r.row_sum AS w FROM w${r - 1} " +
      s"b JOIN r$r ON b.row_key = r$r.row_key JOIN rt ON " +
      s"b.row_key = rt.row_key), " +
      s"c$r AS (SELECT col_key, CAST(SUM(w) AS HUGEINT) AS " +
      s"col_sum FROM wa$r GROUP BY 1), " +
      s"w$r AS MATERIALIZED (SELECT b.row_key, b.col_key, b.n, " +
      s"(b.w * ct.col_target) // c$r.col_sum AS w FROM wa$r b " +
      s"JOIN c$r ON b.col_key = c$r.col_key JOIN ct ON " +
      s"b.col_key = ct.col_key)"
    }.mkString(", ")
    "cells AS MATERIALIZED (SELECT lang AS row_key, source " +
    "AS col_key, CAST(COUNT(*) AS HUGEINT) AS n FROM documents " +
    "GROUP BY 1, 2), " +
    "tot AS MATERIALIZED (SELECT CAST(SUM(n) AS HUGEINT) AS t, " +
    "CAST(COUNT(DISTINCT row_key) AS HUGEINT) AS l FROM cells), " +
    "rt AS MATERIALIZED (SELECT row_key, ((SELECT t FROM tot) * " +
    s"$sc) // (SELECT l FROM tot) AS row_target FROM (SELECT " +
    "DISTINCT row_key FROM cells)), " +
    "ct AS MATERIALIZED (SELECT col_key, CAST(SUM(n) AS HUGEINT) " +
    s"* $sc AS col_target FROM cells GROUP BY 1), " +
    s"w0 AS MATERIALIZED (SELECT row_key, col_key, n, n * $sc AS " +
    "w FROM cells), " + rounds
  }

  /** q111's query terms — drawn from the synthetic corpus dictionary
    * with a spread of document frequencies.
    */
  private val Bm25Terms = Seq("spark", "join", "group", "fast")

  /** The BM25 oracle: identical BIGINT numerator/denominator
    * products, one IEEE division per term, the same fixed-order
    * left-associated sum. Generated from the same term list as the
    * engine call so the two cannot drift.
    */
  private def bm25Sql(terms: Seq[String], k: Int): String = {
    val toks = "regexp_split_to_array(trim(text), '\\s+')"
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter($toks, x -> x = '$t')) AS BIGINT) " +
        s"AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(COUNT(CASE WHEN tf$i > 0 THEN 1 END) AS BIGINT) " +
        s"AS df$i").mkString(", ")
    val termExprs = terms.indices.map { i =>
      s"(CASE WHEN tf$i > 0 THEN " +
        s"CAST(22 * tf$i * (N - df$i + 1) * T AS DOUBLE) / " +
        s"CAST((df$i + 1) * (10 * tf$i * T + 3 * T + 9 * dl * N) " +
        s"AS DOUBLE) ELSE 0.0 END)"
    }.mkString(" + ")
    s"WITH base AS (SELECT doc_id AS id, " +
      s"CAST(len($toks) AS BIGINT) AS dl, $tfCols FROM documents), " +
      s"st AS (SELECT CAST(COUNT(*) AS BIGINT) AS N, " +
      s"CAST(SUM(dl) AS BIGINT) AS T, $dfCols FROM base) " +
      s"SELECT id, $termExprs AS score, dl " +
      s"FROM base CROSS JOIN st " +
      s"ORDER BY score DESC, id NULLS FIRST LIMIT $k"
  }

  private val asofSql =
    "SELECT event_type, COUNT(*) AS n_events, COUNT(state_id) AS " +
    "n_matched, CAST(SUM(state_id) AS BIGINT) AS sum_state FROM " +
    "(SELECT l.event_type, r.state_id FROM events l ASOF LEFT " +
    "JOIN (SELECT user_id, ts, MAX(event_id) AS state_id FROM " +
    "events WHERE event_type = 'signup' GROUP BY user_id, ts) r " +
    "ON l.user_id = r.user_id AND l.ts >= r.ts) " +
    "GROUP BY event_type ORDER BY event_type NULLS FIRST"

  /** The k-means oracle — the 2 fixed Lloyd rounds unrolled: seeds =
    * 4 hash-smallest ids; centroids = exact quantized integer
    * component sums; assignment = max cosine(v, centroid sums) with
    * double only for ranking, label tie-break — in lockstep with
    * kmeansLabels. Shared by q48 (flat) and q56 (hierarchical with
    * one coarse cell, which degenerates to the flat algorithm).
    */
  private val kmeansAssignCtes =
    "WITH hv AS (SELECT vec_id, CAST('0x' || " +
    "substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS h " +
    "FROM embeddings), " +
    "seeds AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY " +
    "h, vec_id) - 1 AS BIGINT) AS label FROM hv ORDER BY h, " +
    "vec_id LIMIT 4), " +
    "qc AS (SELECT vec_id, i AS dim, CAST(round(CAST(x AS " +
    "DOUBLE) * 33554432.0) AS BIGINT) AS qx FROM (SELECT " +
    "vec_id, generate_subscripts(embedding, 1) AS i, " +
    "unnest(embedding) AS x FROM embeddings)), " +
    "c0 AS (SELECT s.label, qc.dim, CAST(SUM(qx) AS BIGINT) AS " +
    "cs FROM qc JOIN seeds s USING (vec_id) GROUP BY 1, 2), " +
    "n0 AS (SELECT label, SUM(CAST(cs AS HUGEINT) * cs) AS s2 " +
    "FROM c0 GROUP BY 1), " +
    "sc1 AS (SELECT qc.vec_id, c0.label, SUM(CAST(qx AS " +
    "HUGEINT) * cs) AS dot FROM qc JOIN c0 ON qc.dim = c0.dim " +
    "GROUP BY 1, 2), " +
    "a1 AS (SELECT vec_id, label FROM (SELECT vec_id, label, " +
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY CAST(dot " +
    "AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn " +
    "FROM sc1 JOIN n0 USING (label)) WHERE rn = 1), " +
    "c1 AS (SELECT a1.label, qc.dim, CAST(SUM(qx) AS BIGINT) AS " +
    "cs FROM qc JOIN a1 USING (vec_id) GROUP BY 1, 2), " +
    "n1 AS (SELECT label, SUM(CAST(cs AS HUGEINT) * cs) AS s2 " +
    "FROM c1 GROUP BY 1), " +
    "sc2 AS (SELECT qc.vec_id, c1.label, SUM(CAST(qx AS " +
    "HUGEINT) * cs) AS dot FROM qc JOIN c1 ON qc.dim = c1.dim " +
    "GROUP BY 1, 2), " +
    "a2 AS (SELECT vec_id, label FROM (SELECT vec_id, label, " +
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY CAST(dot " +
    "AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn " +
    "FROM sc2 JOIN n1 USING (label)) WHERE rn = 1)"

  private val kmeansSql =
    kmeansAssignCtes +
    " SELECT label, COUNT(*) AS n_vectors, MIN(vec_id) AS " +
    "min_vec_id FROM a2 GROUP BY label ORDER BY label " +
    "NULLS FIRST"

  /** q110: the kmeansSql assignment recurrence, then near-dup pairs
    * ONLY within each cluster (the SemDeDup candidate generator),
    * the same HUGEINT quantized cosine as q66, recursive transitive
    * closure, keep-min-id census.
    */
  private val semDedupSql =
    kmeansAssignCtes.replaceFirst("WITH ", "WITH RECURSIVE ") +
    ", pr AS (SELECT x.vec_id AS id1, y.vec_id AS id2 FROM a2 x " +
    "JOIN a2 y ON x.label = y.label AND x.vec_id < y.vec_id)" +
    ", n2 AS (SELECT vec_id, SUM(CAST(qx AS HUGEINT) * qx) AS n2 " +
    "FROM qc GROUP BY 1)" +
    ", dots AS (SELECT pr.id1, pr.id2, SUM(CAST(qa.qx AS HUGEINT) " +
    "* qb.qx) AS dot FROM pr JOIN qc qa ON qa.vec_id = pr.id1 " +
    "JOIN qc qb ON qb.vec_id = pr.id2 AND qb.dim = qa.dim " +
    "GROUP BY 1, 2)" +
    ", nd AS (SELECT id1, id2 FROM dots " +
    "JOIN n2 a ON a.vec_id = id1 JOIN n2 b ON b.vec_id = id2 " +
    "WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(a.n2 AS DOUBLE)) * " +
    "sqrt(CAST(b.n2 AS DOUBLE))) >= 0.8)" +
    ", edges AS (SELECT id1 AS src, id2 AS dst FROM nd UNION " +
    "SELECT id2, id1 FROM nd)" +
    ", nodes AS (SELECT DISTINCT src AS id FROM edges)" +
    ", reach(id, r) AS (SELECT id, id FROM nodes UNION SELECT " +
    "reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)" +
    ", lab AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id) " +
    "SELECT COUNT(*) AS n_kept, CAST(SUM(vec_id) AS BIGINT) AS " +
    "sum_ids FROM embeddings WHERE vec_id NOT IN " +
    "(SELECT id FROM lab WHERE id <> label)"

  // the per-subspace PQ recurrence: kmeansSql with a `sub` column
  // threaded through every step (m=4 subspaces of 16 dims over the
  // 64-dim embeddings, ksub=4 codes, 2 Lloyd rounds, the same
  // hash-smallest seed ids labeling every subspace)
  private val pqPrefix =
    "WITH hv AS (SELECT vec_id, CAST('0x' || " +
    "substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS h " +
    "FROM embeddings), " +
    "seeds AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY " +
    "h, vec_id) - 1 AS BIGINT) AS label FROM hv ORDER BY h, " +
    "vec_id LIMIT 4), " +
    "sseeds AS (SELECT vec_id, s.sub, label FROM seeds, " +
    "(SELECT unnest(range(4)) AS sub) s), " +
    "qc AS (SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, " +
    "i AS dim, CAST(round(CAST(x AS DOUBLE) * 33554432.0) AS " +
    "BIGINT) AS qx FROM (SELECT vec_id, " +
    "generate_subscripts(embedding, 1) AS i, unnest(embedding) AS " +
    "x FROM embeddings)), " +
    "c0 AS (SELECT a.sub, a.label, qc.dim, CAST(SUM(qx) AS " +
    "BIGINT) AS cs FROM qc JOIN sseeds a ON qc.vec_id = a.vec_id " +
    "AND qc.sub = a.sub GROUP BY 1, 2, 3), " +
    "n0 AS (SELECT sub, label, SUM(CAST(cs AS HUGEINT) * cs) AS " +
    "s2 FROM c0 GROUP BY 1, 2), " +
    "sc1 AS (SELECT qc.vec_id, c.sub, c.label, SUM(CAST(qx AS " +
    "HUGEINT) * cs) AS dot FROM qc JOIN c0 c ON qc.dim = c.dim " +
    "GROUP BY 1, 2, 3), " +
    "a1 AS (SELECT vec_id, sub, label FROM (SELECT vec_id, sub, " +
    "label, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY " +
    "CAST(dot AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) " +
    "AS rn FROM sc1 JOIN n0 USING (sub, label)) WHERE rn = 1), " +
    "c1 AS (SELECT a.sub, a.label, qc.dim, CAST(SUM(qx) AS " +
    "BIGINT) AS cs FROM qc JOIN a1 a ON qc.vec_id = a.vec_id " +
    "AND qc.sub = a.sub GROUP BY 1, 2, 3), " +
    "n1 AS (SELECT sub, label, SUM(CAST(cs AS HUGEINT) * cs) AS " +
    "s2 FROM c1 GROUP BY 1, 2), " +
    "sc2 AS (SELECT qc.vec_id, c.sub, c.label, SUM(CAST(qx AS " +
    "HUGEINT) * cs) AS dot FROM qc JOIN c1 c ON qc.dim = c.dim " +
    "GROUP BY 1, 2, 3), " +
    "a2 AS (SELECT vec_id, sub, label FROM (SELECT vec_id, sub, " +
    "label, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY " +
    "CAST(dot AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) " +
    "AS rn FROM sc2 JOIN n1 USING (sub, label)) WHERE rn = 1)"

  private val pqCodesSql = pqPrefix + " " +
    "SELECT sub, label, COUNT(*) AS n_vectors, MIN(vec_id) AS " +
    "min_vec_id FROM a2 GROUP BY sub, label ORDER BY sub NULLS " +
    "FIRST, label NULLS FIRST"

  // ADC: final codebooks from a2, numerator/norm lookup terms as
  // HUGEINT-sum → DOUBLE → one division (the engine's decimal →
  // double path), then a per-(query, vector) pivot so the four
  // subspace terms add in FIXED order t0+t1+t2+t3 — double addition
  // is order-sensitive and the engine folds left in subspace order
  private val pqAdcCtes =
    "cb AS (SELECT a.sub, a.label, qc.dim, CAST(SUM(qx) AS " +
    "BIGINT) AS cs FROM qc JOIN a2 a ON qc.vec_id = a.vec_id " +
    "AND qc.sub = a.sub GROUP BY 1, 2, 3), " +
    "cn AS (SELECT sub, label, COUNT(*) AS n FROM a2 " +
    "GROUP BY 1, 2), " +
    "nm AS (SELECT cb.sub, cb.label, CAST(SUM(CAST(cs AS HUGEINT) " +
    "* cs) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) " +
    "AS w FROM cb JOIN cn USING (sub, label) GROUP BY cb.sub, " +
    "cb.label, n), " +
    "tn AS (SELECT q.vec_id AS qid, cb.sub, cb.label, " +
    "CAST(SUM(CAST(qx AS HUGEINT) * cs) AS DOUBLE) / CAST(n AS " +
    "DOUBLE) AS t FROM qc q JOIN cb ON q.dim = cb.dim JOIN cn ON " +
    "cb.sub = cn.sub AND cb.label = cn.label WHERE q.vec_id < 3 " +
    "GROUP BY 1, 2, 3, n), " +
    "pv AS (SELECT tn.qid, a.vec_id, " +
    "MAX(CASE WHEN a.sub = 0 THEN t END) AS t0, " +
    "MAX(CASE WHEN a.sub = 1 THEN t END) AS t1, " +
    "MAX(CASE WHEN a.sub = 2 THEN t END) AS t2, " +
    "MAX(CASE WHEN a.sub = 3 THEN t END) AS t3 " +
    "FROM a2 a JOIN tn ON a.sub = tn.sub AND a.label = tn.label " +
    "GROUP BY 1, 2), " +
    "wv AS (SELECT a.vec_id, " +
    "MAX(CASE WHEN a.sub = 0 THEN w END) AS w0, " +
    "MAX(CASE WHEN a.sub = 1 THEN w END) AS w1, " +
    "MAX(CASE WHEN a.sub = 2 THEN w END) AS w2, " +
    "MAX(CASE WHEN a.sub = 3 THEN w END) AS w3 " +
    "FROM a2 a JOIN nm ON a.sub = nm.sub AND a.label = nm.label " +
    "GROUP BY 1)"

  private val pqAdcSql = pqPrefix + ", " + pqAdcCtes + ", " +
    "r AS (SELECT qid, pv.vec_id, ROW_NUMBER() OVER (PARTITION BY " +
    "qid ORDER BY (t0 + t1 + t2 + t3) / sqrt(w0 + w1 + w2 + w3) " +
    "DESC, pv.vec_id) AS rank FROM pv JOIN wv ON pv.vec_id = " +
    "wv.vec_id WHERE pv.vec_id <> qid) " +
    "SELECT qid, vec_id, rank FROM r WHERE rank <= 5 " +
    "ORDER BY qid NULLS FIRST, rank NULLS FIRST"

  /** The flat-kmeans recurrence (kmeansSql's chain) with every CTE
    * name suffixed, so it can coexist with the PQ chain in one WITH
    * clause (the IVF side of the IVF+PQ oracle).
    */
  private def kmeansCtes(x: String): String =
    s"hv$x AS (SELECT vec_id, CAST('0x' || " +
    "substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS h " +
    "FROM embeddings), " +
    s"seeds$x AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY " +
    "h, vec_id) - 1 AS BIGINT) AS label FROM hv" + x +
    " ORDER BY h, vec_id LIMIT 4), " +
    s"qc$x AS (SELECT vec_id, i AS dim, CAST(round(CAST(x AS " +
    "DOUBLE) * 33554432.0) AS BIGINT) AS qx FROM (SELECT " +
    "vec_id, generate_subscripts(embedding, 1) AS i, " +
    "unnest(embedding) AS x FROM embeddings)), " +
    s"c0$x AS (SELECT s.label, q.dim, CAST(SUM(qx) AS BIGINT) AS " +
    s"cs FROM qc$x q JOIN seeds$x s USING (vec_id) GROUP BY 1, 2), " +
    s"n0$x AS (SELECT label, SUM(CAST(cs AS HUGEINT) * cs) AS s2 " +
    s"FROM c0$x GROUP BY 1), " +
    s"sc1$x AS (SELECT q.vec_id, c.label, SUM(CAST(qx AS " +
    s"HUGEINT) * cs) AS dot FROM qc$x q JOIN c0$x c ON q.dim = " +
    "c.dim GROUP BY 1, 2), " +
    s"a1$x AS (SELECT vec_id, label FROM (SELECT vec_id, label, " +
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY CAST(dot " +
    "AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn " +
    s"FROM sc1$x JOIN n0$x USING (label)) WHERE rn = 1), " +
    s"c1$x AS (SELECT a.label, q.dim, CAST(SUM(qx) AS BIGINT) AS " +
    s"cs FROM qc$x q JOIN a1$x a USING (vec_id) GROUP BY 1, 2), " +
    s"n1$x AS (SELECT label, SUM(CAST(cs AS HUGEINT) * cs) AS s2 " +
    s"FROM c1$x GROUP BY 1), " +
    s"sc2$x AS (SELECT q.vec_id, c.label, SUM(CAST(qx AS " +
    s"HUGEINT) * cs) AS dot FROM qc$x q JOIN c1$x c ON q.dim = " +
    "c.dim GROUP BY 1, 2), " +
    s"a2$x AS (SELECT vec_id, label FROM (SELECT vec_id, label, " +
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY CAST(dot " +
    "AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn " +
    s"FROM sc2$x JOIN n1$x USING (label)) WHERE rn = 1)"

  // IVF+PQ: the PQ ADC pivot restricted to the cells each query
  // probes — centroid sums from the IVF chain's FINAL assignment
  // (buildIvfIndex's table), probe scoring identical to q45's, then
  // the q61 ranking over probed candidates only
  private val ivfPqSql = pqPrefix + ", " + pqAdcCtes + ", " +
    kmeansCtes("v") + ", " +
    "cv AS (SELECT a.label, q.dim, CAST(SUM(qx) AS BIGINT) AS s " +
    "FROM qcv q JOIN a2v a USING (vec_id) GROUP BY 1, 2), " +
    "scv AS (SELECT q.vec_id AS qid, cv.label, SUM(CAST(s AS " +
    "HUGEINT) * qx) AS dot_c, SUM(CAST(s AS HUGEINT) * s) AS s2 " +
    "FROM cv JOIN qcv q ON cv.dim = q.dim WHERE q.vec_id < 3 " +
    "GROUP BY 1, 2), " +
    "prv AS (SELECT qid, label FROM (SELECT qid, label, " +
    "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY CAST(dot_c AS " +
    "DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn FROM " +
    "scv) WHERE rn <= 2), " +
    "cnd AS (SELECT prv.qid, a.vec_id FROM a2v a JOIN prv ON " +
    "a.label = prv.label), " +
    "rv AS (SELECT pv.qid, pv.vec_id, ROW_NUMBER() OVER " +
    "(PARTITION BY pv.qid ORDER BY (t0 + t1 + t2 + t3) / " +
    "sqrt(w0 + w1 + w2 + w3) DESC, pv.vec_id) AS rank FROM pv " +
    "JOIN wv ON pv.vec_id = wv.vec_id JOIN cnd ON pv.qid = " +
    "cnd.qid AND pv.vec_id = cnd.vec_id WHERE pv.vec_id <> " +
    "pv.qid) " +
    "SELECT qid, vec_id, rank FROM rv WHERE rank <= 5 " +
    "ORDER BY qid NULLS FIRST, rank NULLS FIRST"

  /** Shared by q130/q132: the two constant-size rank lists of the
    * hybrid-retrieval stack — BM25 top-25 over `Bm25Terms` (rank by
    * score desc, id asc) and the md5 16-byte-feature integer-dot
    * top-25 against the min-doc_id probe (self excluded). Both are
    * one corpus scan + TakeOrdered; the row_number windows only ever
    * see the 25-row frames.
    */
  private def hybridLists(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, d, "documents")
    // non-foldable constant partition key: a literal is folded out
    // by EliminateWindowPartitions and the 25-row window then warns
    // as an unpartitioned global window on every run
    val wb = Window.partitionBy(pmod(hash(col("id")), lit(1)))
      .orderBy(col("score").desc, col("id").asc_nulls_first)
    val bmRanks = Retrieval.bm25TopK(docs, "doc_id", "text",
        Bm25Terms, k = 25)
      .select(col("id"),
        row_number().over(wb).cast("long").as("rank"))
    def emb(c: Column) = array((0 until 16).map(i =>
      conv(substring(md5(c), i * 2 + 1, 2), 16, 10)
        .cast("long")): _*)
    val probe = docs.orderBy(col("doc_id").asc_nulls_first)
      .limit(1)
      .select(col("doc_id").as("pid"), emb(col("text")).as("pemb"))
    val wv = Window.partitionBy(pmod(hash(col("id")), lit(1)))
      .orderBy(col("dot").desc, col("id").asc_nulls_first)
    val vecRanks = docs
      .select(col("doc_id").as("id"), emb(col("text")).as("demb"))
      .crossJoin(broadcast(probe))
      .where(col("id") =!= col("pid"))
      .select(col("id"),
        aggregate(zip_with(col("demb"), col("pemb"),
          (x, y) => x * y), lit(0L), (a, x) => a + x).as("dot"))
      .orderBy(col("dot").desc, col("id").asc_nulls_first)
      .limit(25)
      .select(col("id"),
        row_number().over(wv).cast("long").as("rank"))
    (bmRanks, vecRanks)
  }

  /** q130: hybrid-fusion replay — the bm25Sql scorer ranked 1..25,
    * the md5 16-byte-feature integer dots against the min-doc probe
    * ranked 1..25, full-outer joined and fused by 1/(60+rank) with
    * the same fixed term order and id tie-break as the engine.
    */
  private lazy val hybridListsCtes: String = {
    val terms = Bm25Terms
    val toks = "regexp_split_to_array(trim(text), '\\s+')"
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter($toks, x -> x = '$t')) AS BIGINT) " +
        s"AS tf$i"
    }.mkString(", ")
    val dfCols = terms.indices.map(i =>
      s"CAST(COUNT(CASE WHEN tf$i > 0 THEN 1 END) AS BIGINT) " +
        s"AS df$i").mkString(", ")
    val termExprs = terms.indices.map { i =>
      s"(CASE WHEN tf$i > 0 THEN " +
        s"CAST(22 * tf$i * (N - df$i + 1) * T AS DOUBLE) / " +
        s"CAST((df$i + 1) * (10 * tf$i * T + 3 * T + 9 * dl * N) " +
        s"AS DOUBLE) ELSE 0.0 END)"
    }.mkString(" + ")
    val feat = "[CAST('0x' || substr(md5(text), i * 2 + 1, 2) AS " +
      "BIGINT) FOR i IN range(16)]"
    "WITH base AS (SELECT doc_id AS id, " +
    s"CAST(len($toks) AS BIGINT) AS dl, $tfCols FROM documents), " +
    "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS N, " +
    s"CAST(SUM(dl) AS BIGINT) AS T, $dfCols FROM base), " +
    s"bt AS (SELECT id, $termExprs AS score FROM base CROSS JOIN " +
    "st ORDER BY score DESC, id NULLS FIRST LIMIT 25), " +
    "bm AS (SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, " +
    "id NULLS FIRST) AS rank FROM bt), " +
    s"pe AS (SELECT $feat AS pemb FROM documents WHERE doc_id = " +
    "(SELECT min(doc_id) FROM documents)), " +
    s"de AS (SELECT doc_id AS id, $feat AS demb FROM documents " +
    "WHERE doc_id <> (SELECT min(doc_id) FROM documents)), " +
    "dots AS (SELECT id, CAST(list_sum([demb[j+1] * pemb[j+1] " +
    "FOR j IN range(16)]) AS BIGINT) AS dot FROM de CROSS JOIN " +
    "pe), " +
    "vt AS (SELECT id, dot FROM dots ORDER BY dot DESC, id NULLS " +
    "FIRST LIMIT 25), " +
    "vr AS (SELECT id, ROW_NUMBER() OVER (ORDER BY dot DESC, id " +
    "NULLS FIRST) AS rank FROM vt)"
  }

  private lazy val hybridRrfSql: String = hybridListsCtes + ", " +
    "f AS (SELECT COALESCE(b.id, v.id) AS doc_id, " +
    "CAST(COALESCE(b.rank, 0) AS BIGINT) AS rank_bm25, " +
    "CAST(COALESCE(v.rank, 0) AS BIGINT) AS rank_vec FROM bm b " +
    "FULL OUTER JOIN vr v ON b.id = v.id) " +
    "SELECT doc_id, rank_bm25, rank_vec, " +
    "(CASE WHEN rank_bm25 > 0 THEN 1.0 / CAST(60 + rank_bm25 AS " +
    "DOUBLE) ELSE 0.0 END) + (CASE WHEN rank_vec > 0 THEN 1.0 / " +
    "CAST(60 + rank_vec AS DOUBLE) ELSE 0.0 END) AS rrf " +
    "FROM f ORDER BY rrf DESC, doc_id NULLS FIRST LIMIT 10"

  /** q132: the same two lists, roles instead of fusion — vector
    * top-5 are positives, BM25-only docs are the hard negatives.
    */
  private lazy val hardNegSql: String = hybridListsCtes + ", " +
    "f2 AS (SELECT COALESCE(b.id, v.id) AS doc_id, " +
    "CAST(COALESCE(b.rank, 0) AS BIGINT) AS rank_bm25, " +
    "CAST(COALESCE(v.rank, 0) AS BIGINT) AS rank_vec, " +
    "CASE WHEN v.rank IS NOT NULL AND v.rank <= 5 THEN 'pos' " +
    "WHEN b.rank IS NOT NULL AND v.rank IS NULL THEN 'hard_neg' " +
    "ELSE 'other' END AS role FROM bm b FULL OUTER JOIN vr v ON " +
    "b.id = v.id) " +
    "SELECT doc_id, rank_bm25, rank_vec, role FROM f2 WHERE " +
    "role <> 'other' ORDER BY role NULLS FIRST, rank_bm25 NULLS " +
    "FIRST, rank_vec NULLS FIRST, doc_id NULLS FIRST"

  /** q129: MMR replay — candidate top-20 by quantized inner product
    * against the min-vec_id query, candidate-pair sims, then the six
    * greedy steps UNROLLED as CTE pairs (m_i: per-remaining-candidate
    * max sim to the selected set; s_i: the argmax pick), every score
    * an exact BIGINT. MATERIALIZED is load-bearing: the selected-set
    * subqueries reference earlier CTEs many times over.
    */
  private val mmrSql: String = {
    val steps = 6
    val head =
      "WITH qv AS MATERIALIZED (SELECT i AS dim, " +
      "CAST(round(CAST(x AS DOUBLE) * 33554432.0) AS BIGINT) AS " +
      "qy FROM (SELECT generate_subscripts(embedding, 1) AS i, " +
      "unnest(embedding) AS x FROM embeddings WHERE vec_id = " +
      "(SELECT min(vec_id) FROM embeddings))), " +
      "qc AS MATERIALIZED (SELECT vec_id, i AS dim, " +
      "CAST(round(CAST(x AS DOUBLE) * 33554432.0) AS BIGINT) AS " +
      "qx FROM (SELECT vec_id, generate_subscripts(embedding, 1) " +
      "AS i, unnest(embedding) AS x FROM embeddings)), " +
      "cand AS MATERIALIZED (SELECT vec_id, rel FROM (SELECT " +
      "q.vec_id, CAST(SUM(CAST(qx AS HUGEINT) * qy) AS BIGINT) " +
      "AS rel FROM qc q JOIN qv ON q.dim = qv.dim WHERE " +
      "q.vec_id <> (SELECT min(vec_id) FROM embeddings) GROUP BY " +
      "1) ORDER BY rel DESC, vec_id LIMIT 20), " +
      "pairs AS MATERIALIZED (SELECT a.vec_id AS id1, b.vec_id " +
      "AS id2, CAST(SUM(CAST(a.qx AS HUGEINT) * b.qx) AS BIGINT) " +
      "AS sim FROM qc a JOIN qc b ON a.dim = b.dim AND a.vec_id " +
      "<> b.vec_id WHERE a.vec_id IN (SELECT vec_id FROM cand) " +
      "AND b.vec_id IN (SELECT vec_id FROM cand) GROUP BY 1, 2), " +
      "s1 AS MATERIALIZED (SELECT vec_id, rel, CAST(0 AS BIGINT) " +
      "AS penalty FROM cand ORDER BY rel DESC, vec_id LIMIT 1)"
    val mids = (2 to steps).map { i =>
      val prev = (1 until i)
        .map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      s", m$i AS MATERIALIZED (SELECT c.vec_id, c.rel, " +
      s"MAX(p.sim) AS ms FROM cand c JOIN pairs p ON p.id1 = " +
      s"c.vec_id AND p.id2 IN ($prev) WHERE c.vec_id NOT IN " +
      s"($prev) GROUP BY 1, 2), " +
      s"s$i AS MATERIALIZED (SELECT vec_id, rel, ms AS penalty " +
      s"FROM m$i ORDER BY rel - ms DESC, vec_id LIMIT 1)"
    }.mkString
    val sel = (1 to steps)
      .map(i => s"SELECT $i AS step, vec_id, rel, penalty FROM s$i")
      .mkString(" UNION ALL ")
    head + mids +
    s" SELECT CAST(step AS BIGINT) AS step, vec_id, rel, penalty, " +
    s"rel - penalty AS score FROM ($sel) ORDER BY step"
  }

  /** Shared by q108/q139: the per-document Gopher/C4 flag chain —
    * q42's n-gram CTEs for the repetition rule, the integer
    * thresholds of `TextFunctions.qualityFlags`, one row per doc in
    * `flq` with all ten rule booleans.
    */
  private val qualityDocCtes: String =
    "WITH tok AS (SELECT doc_id, source, text, " +
    "regexp_split_to_array(trim(text), '\\s+') AS t " +
    "FROM documents), " +
    "g2 AS (SELECT doc_id, unnest([t[i+1] || ' ' || t[i+2] FOR " +
    "i IN range(greatest(array_length(t) - 1, 0))]) AS g " +
    "FROM tok), " +
    "g3 AS (SELECT doc_id, unnest([t[i+1] || ' ' || t[i+2] || " +
    "' ' || t[i+3] FOR i IN range(greatest(array_length(t) - 2, " +
    "0))]) AS g FROM tok), " +
    "t2 AS (SELECT doc_id, MAX(c) AS top FROM (SELECT doc_id, " +
    "g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g) " +
    "GROUP BY doc_id), " +
    "t3 AS (SELECT doc_id, MAX(c) AS top FROM (SELECT doc_id, " +
    "g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g) " +
    "GROUP BY doc_id), " +
    "per AS (SELECT tok.doc_id, source, " +
    "CAST(array_length(t) AS BIGINT) AS ntok, " +
    "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS " +
    "BIGINT) AS nonspace, " +
    "CAST(len(regexp_extract_all(text, '#')) + " +
    "len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS " +
    "nsym, " +
    "CAST(len(regexp_split_to_array(text, chr(10))) AS BIGINT) " +
    "AS nlines, " +
    "CAST(len(regexp_extract_all(text, '(?m)^ *[-*•]')) AS " +
    "BIGINT) AS nbullet, " +
    "CAST(len(regexp_extract_all(text, '(?m)\\.\\.\\.$')) AS " +
    "BIGINT) AS nellend, " +
    "CAST(len(list_filter(t, x -> regexp_matches(x, " +
    "'[A-Za-z]'))) AS BIGINT) AS nalpha, " +
    graft.functions.TextFunctions.GopherStopwords
      .map(w => s"CAST(list_contains(t, '$w') AS INT)")
      .mkString("(", " + ", ") AS stophits, ") +
    "COALESCE(t2.top, 0) AS top2, " +
    "greatest(array_length(t) - 1, 0) AS n2, " +
    "COALESCE(t3.top, 0) AS top3, " +
    "greatest(array_length(t) - 2, 0) AS n3, " +
    "lower(text) AS lt FROM tok " +
    "LEFT JOIN t2 ON tok.doc_id = t2.doc_id " +
    "LEFT JOIN t3 ON tok.doc_id = t3.doc_id), " +
    "flq AS (SELECT doc_id, source, " +
    "(ntok >= 50 AND ntok <= 100000) AS wc_ok, " +
    "(nonspace >= ntok * 3 AND nonspace <= ntok * 10) AS " +
    "mwl_ok, " +
    "(nsym * 10 <= ntok) AS sym_ok, " +
    "(nbullet * 10 <= nlines * 9) AS bullet_ok, " +
    "(nellend * 10 <= nlines * 3) AS ell_ok, " +
    "(nalpha * 5 >= ntok * 4) AS alpha_ok, " +
    "(stophits >= 2) AS stop_ok, " +
    "(top2 * 5 <= n2 AND top3 * 10 <= n3) AS rep_ok, " +
    "(NOT contains(lt, '{')) AS curly_ok, " +
    graft.functions.TextFunctions.C4PolicyPhrases
      .map(p => s"lt NOT LIKE '%$p%'")
      .mkString("(", " AND ", ") AS policy_ok FROM per)")

  /** q137: staleness replay — the shared old/delta chains, the
    * rounded centroid formula, per-side d2 sums, and the 2×-mean
    * cross-multiplied drift flag.
    */
  private lazy val indexDriftSql =
    "WITH " + idxOldBaseCtes + ", " + idxFlatKmeansCtes + ", " +
    "cntf AS (SELECT label AS cell, COUNT(*) AS n FROM a2f " +
    "GROUP BY 1), " +
    "muf AS (SELECT cvf.label AS cell, cvf.dim, CASE WHEN s >= 0 " +
    "THEN (2*s + n) // (2*n) ELSE -((-2*s + n) // (2*n)) END AS " +
    "mu FROM cvf JOIN cntf ON cvf.label = cntf.cell), " +
    "d2o AS (SELECT q.vec_id, a.label AS cell, SUM(CAST(qx - mu " +
    "AS HUGEINT) * (qx - mu)) AS d2 FROM qco q JOIN a2f a USING " +
    "(vec_id) JOIN muf ON muf.cell = a.label AND muf.dim = q.dim " +
    "GROUP BY 1, 2), " +
    "d2d AS (SELECT q.vec_id, v.label AS cell, SUM(CAST(qx - mu " +
    "AS HUGEINT) * (qx - mu)) AS d2 FROM qcd q JOIN ivfd v USING " +
    "(vec_id) JOIN muf ON muf.cell = v.label AND muf.dim = q.dim " +
    "GROUP BY 1, 2), " +
    "sto AS (SELECT cell, COUNT(*) AS n_old, SUM(d2) AS s_old " +
    "FROM d2o GROUP BY 1), " +
    "std AS (SELECT cell, COUNT(*) AS n_delta, SUM(d2) AS " +
    "s_delta, LEAST(MAX(d2), CAST(9223372036854775807 AS " +
    "HUGEINT)) AS max_d2 FROM d2d GROUP BY 1) " +
    "SELECT COALESCE(sto.cell, std.cell) AS cell, " +
    "CAST(COALESCE(n_old, 0) AS BIGINT) AS n_old, " +
    "CAST(COALESCE(n_delta, 0) AS BIGINT) AS n_delta, " +
    "CAST(COALESCE(max_d2, 0) AS BIGINT) AS max_d2_delta, " +
    "COALESCE(s_delta * n_old * 1 > s_old * n_delta * 2, false) " +
    "AS drift FROM sto FULL OUTER JOIN std ON sto.cell = " +
    "std.cell ORDER BY cell NULLS FIRST"

  /** q128: incremental-append replay — the pqPrefix and kmeansCtes
    * recurrences restricted to the 80% "old" split (vec_id % 5 <> 0),
    * final codebooks/centroid sums from each chain's a2, then the
    * delta (vec_id % 5 = 0) encoded against the FROZEN sums: per-sub
    * argmax cosine for PQ codes, nearest coarse centroid for the IVF
    * cell, census over the delta only.
    */
  /** Shared by q128/q137: old-split seeds + components, the delta
    * components, and the flat-kmeans chain on the old split ending
    * at a2f (final assignment) + cvf (frozen centroid sums).
    */
  private val idxOldBaseCtes =
    "hv AS (SELECT vec_id, CAST('0x' || " +
    "substr(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS h " +
    "FROM embeddings WHERE vec_id % 5 <> 0), " +
    "seeds AS (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY h, " +
    "vec_id) - 1 AS BIGINT) AS label FROM hv ORDER BY h, vec_id " +
    "LIMIT 4), " +
    "qco AS (SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, " +
    "i AS dim, CAST(round(CAST(x AS DOUBLE) * 33554432.0) AS " +
    "BIGINT) AS qx FROM (SELECT vec_id, " +
    "generate_subscripts(embedding, 1) AS i, unnest(embedding) AS " +
    "x FROM embeddings WHERE vec_id % 5 <> 0)), " +
    "qcd AS (SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS sub, " +
    "i AS dim, CAST(round(CAST(x AS DOUBLE) * 33554432.0) AS " +
    "BIGINT) AS qx FROM (SELECT vec_id, " +
    "generate_subscripts(embedding, 1) AS i, unnest(embedding) AS " +
    "x FROM embeddings WHERE vec_id % 5 = 0))"

  private val idxFlatKmeansCtes =
    "c0f AS (SELECT s.label, q.dim, CAST(SUM(qx) AS BIGINT) AS " +
    "cs FROM qco q JOIN seeds s USING (vec_id) GROUP BY 1, 2), " +
    "n0f AS (SELECT label, SUM(CAST(cs AS HUGEINT) * cs) AS s2 " +
    "FROM c0f GROUP BY 1), " +
    "sc1f AS (SELECT q.vec_id, c.label, SUM(CAST(qx AS HUGEINT) " +
    "* cs) AS dot FROM qco q JOIN c0f c ON q.dim = c.dim " +
    "GROUP BY 1, 2), " +
    "a1f AS (SELECT vec_id, label FROM (SELECT vec_id, label, " +
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY CAST(dot AS " +
    "DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn FROM " +
    "sc1f JOIN n0f USING (label)) WHERE rn = 1), " +
    "c1f AS (SELECT a.label, q.dim, CAST(SUM(qx) AS BIGINT) AS " +
    "cs FROM qco q JOIN a1f a USING (vec_id) GROUP BY 1, 2), " +
    "n1f AS (SELECT label, SUM(CAST(cs AS HUGEINT) * cs) AS s2 " +
    "FROM c1f GROUP BY 1), " +
    "sc2f AS (SELECT q.vec_id, c.label, SUM(CAST(qx AS HUGEINT) " +
    "* cs) AS dot FROM qco q JOIN c1f c ON q.dim = c.dim " +
    "GROUP BY 1, 2), " +
    "a2f AS (SELECT vec_id, label FROM (SELECT vec_id, label, " +
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY CAST(dot AS " +
    "DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn FROM " +
    "sc2f JOIN n1f USING (label)) WHERE rn = 1), " +
    "cvf AS (SELECT a.label, q.dim, CAST(SUM(qx) AS BIGINT) AS s " +
    "FROM qco q JOIN a2f a USING (vec_id) GROUP BY 1, 2), " +
    "scvd AS (SELECT q.vec_id, c.label, SUM(CAST(s AS HUGEINT) * " +
    "qx) AS dot, SUM(CAST(s AS HUGEINT) * s) AS s2 FROM cvf c " +
    "JOIN qcd q ON c.dim = q.dim GROUP BY 1, 2), " +
    "ivfd AS (SELECT vec_id, label FROM (SELECT vec_id, label, " +
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY CAST(dot AS " +
    "DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn FROM " +
    "scvd) WHERE rn = 1)"

  private val indexAppendSql =
    "WITH " + idxOldBaseCtes + ", " +
    "sseeds AS (SELECT vec_id, s.sub, label FROM seeds, " +
    "(SELECT unnest(range(4)) AS sub) s), " +
    "c0 AS (SELECT a.sub, a.label, q.dim, CAST(SUM(qx) AS BIGINT) " +
    "AS cs FROM qco q JOIN sseeds a ON q.vec_id = a.vec_id AND " +
    "q.sub = a.sub GROUP BY 1, 2, 3), " +
    "n0 AS (SELECT sub, label, SUM(CAST(cs AS HUGEINT) * cs) AS " +
    "s2 FROM c0 GROUP BY 1, 2), " +
    "sc1 AS (SELECT q.vec_id, c.sub, c.label, SUM(CAST(qx AS " +
    "HUGEINT) * cs) AS dot FROM qco q JOIN c0 c ON q.dim = c.dim " +
    "GROUP BY 1, 2, 3), " +
    "a1 AS (SELECT vec_id, sub, label FROM (SELECT vec_id, sub, " +
    "label, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY " +
    "CAST(dot AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) " +
    "AS rn FROM sc1 JOIN n0 USING (sub, label)) WHERE rn = 1), " +
    "c1 AS (SELECT a.sub, a.label, q.dim, CAST(SUM(qx) AS BIGINT) " +
    "AS cs FROM qco q JOIN a1 a ON q.vec_id = a.vec_id AND " +
    "q.sub = a.sub GROUP BY 1, 2, 3), " +
    "n1 AS (SELECT sub, label, SUM(CAST(cs AS HUGEINT) * cs) AS " +
    "s2 FROM c1 GROUP BY 1, 2), " +
    "sc2 AS (SELECT q.vec_id, c.sub, c.label, SUM(CAST(qx AS " +
    "HUGEINT) * cs) AS dot FROM qco q JOIN c1 c ON q.dim = c.dim " +
    "GROUP BY 1, 2, 3), " +
    "a2 AS (SELECT vec_id, sub, label FROM (SELECT vec_id, sub, " +
    "label, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY " +
    "CAST(dot AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) " +
    "AS rn FROM sc2 JOIN n1 USING (sub, label)) WHERE rn = 1), " +
    "cb AS (SELECT a.sub, a.label, q.dim, CAST(SUM(qx) AS BIGINT) " +
    "AS cs FROM qco q JOIN a2 a ON q.vec_id = a.vec_id AND " +
    "q.sub = a.sub GROUP BY 1, 2, 3), " +
    "nb AS (SELECT sub, label, SUM(CAST(cs AS HUGEINT) * cs) AS " +
    "s2 FROM cb GROUP BY 1, 2), " +
    "scd AS (SELECT q.vec_id, c.sub, c.label, SUM(CAST(qx AS " +
    "HUGEINT) * cs) AS dot FROM qcd q JOIN cb c ON q.dim = c.dim " +
    "GROUP BY 1, 2, 3), " +
    "ad AS (SELECT vec_id, sub, label FROM (SELECT vec_id, sub, " +
    "label, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY " +
    "CAST(dot AS DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) " +
    "AS rn FROM scd JOIN nb USING (sub, label)) WHERE rn = 1), " +
    idxFlatKmeansCtes + " " +
    "SELECT kind, sub, label, n_delta, min_delta FROM (" +
    "SELECT 'pq' AS kind, sub, label, COUNT(*) AS n_delta, " +
    "MIN(vec_id) AS min_delta FROM ad GROUP BY 2, 3 " +
    "UNION ALL SELECT 'ivf', CAST(-1 AS BIGINT), label, " +
    "COUNT(*), MIN(vec_id) FROM ivfd GROUP BY 3) " +
    "ORDER BY kind NULLS FIRST, sub NULLS FIRST, label NULLS FIRST"

  /** Serving-only oracle: re-derives the IVF+PQ top-k from the SAME
    * persisted index tables q67 reads (no re-training) — 0-based
    * dims, codes arrays unnested back to assignment rows, then the
    * ivfPqSql probe/pivot/rank tail verbatim.
    */
  private val pqServingSql = {
    val p = ServingIndexDir
    "WITH qc AS (SELECT vec_id, CAST((i - 1) // 16 AS BIGINT) AS " +
    "sub, i - 1 AS dim, CAST(round(CAST(x AS DOUBLE) * 33554432.0) " +
    "AS BIGINT) AS qx FROM (SELECT vec_id, " +
    "generate_subscripts(embedding, 1) AS i, unnest(embedding) AS " +
    "x FROM embeddings WHERE vec_id < 3)), " +
    s"cb AS (SELECT * FROM read_parquet('$p/pq/codebooks/" +
    "*.parquet')), " +
    s"cw AS (SELECT * FROM read_parquet('$p/pq/codes/*.parquet')), " +
    "a2 AS (SELECT id AS vec_id, CAST(generate_subscripts(codes, " +
    "1) - 1 AS BIGINT) AS sub, unnest(codes) AS label FROM cw), " +
    s"lb AS (SELECT * FROM read_parquet('$p/ivf/labels/" +
    "*.parquet')), " +
    s"cv AS (SELECT * FROM read_parquet('$p/ivf/centroids/" +
    "*.parquet')), " +
    "nm AS (SELECT cb.sub, cb.label, CAST(SUM(CAST(cs AS HUGEINT) " +
    "* cs) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) " +
    "AS w FROM cb GROUP BY cb.sub, cb.label, n), " +
    "tn AS (SELECT q.vec_id AS qid, cb.sub, cb.label, " +
    "CAST(SUM(CAST(qx AS HUGEINT) * cs) AS DOUBLE) / CAST(n AS " +
    "DOUBLE) AS t FROM qc q JOIN cb ON q.dim = cb.dim GROUP BY " +
    "1, 2, 3, n), " +
    "scv AS (SELECT q.vec_id AS qid, cv.label, SUM(CAST(s AS " +
    "HUGEINT) * qx) AS dot_c, SUM(CAST(s AS HUGEINT) * s) AS s2 " +
    "FROM cv JOIN qc q ON cv.dim = q.dim GROUP BY 1, 2), " +
    "prv AS (SELECT qid, label FROM (SELECT qid, label, " +
    "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY CAST(dot_c AS " +
    "DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn FROM " +
    "scv) WHERE rn <= 2), " +
    "cnd AS (SELECT prv.qid, lb.id AS vec_id FROM lb JOIN prv ON " +
    "lb.label = prv.label), " +
    "pv AS (SELECT tn.qid, a.vec_id, " +
    "MAX(CASE WHEN a.sub = 0 THEN t END) AS t0, " +
    "MAX(CASE WHEN a.sub = 1 THEN t END) AS t1, " +
    "MAX(CASE WHEN a.sub = 2 THEN t END) AS t2, " +
    "MAX(CASE WHEN a.sub = 3 THEN t END) AS t3 " +
    "FROM a2 a JOIN tn ON a.sub = tn.sub AND a.label = tn.label " +
    "GROUP BY 1, 2), " +
    "wv AS (SELECT a.vec_id, " +
    "MAX(CASE WHEN a.sub = 0 THEN w END) AS w0, " +
    "MAX(CASE WHEN a.sub = 1 THEN w END) AS w1, " +
    "MAX(CASE WHEN a.sub = 2 THEN w END) AS w2, " +
    "MAX(CASE WHEN a.sub = 3 THEN w END) AS w3 " +
    "FROM a2 a JOIN nm ON a.sub = nm.sub AND a.label = nm.label " +
    "GROUP BY 1), " +
    "rv AS (SELECT pv.qid, pv.vec_id, ROW_NUMBER() OVER " +
    "(PARTITION BY pv.qid ORDER BY (t0 + t1 + t2 + t3) / " +
    "sqrt(w0 + w1 + w2 + w3) DESC, pv.vec_id) AS rank FROM pv " +
    "JOIN wv ON pv.vec_id = wv.vec_id JOIN cnd ON pv.qid = " +
    "cnd.qid AND pv.vec_id = cnd.vec_id WHERE pv.vec_id <> " +
    "pv.qid) " +
    "SELECT qid, vec_id, rank FROM rv WHERE rank <= 5 " +
    "ORDER BY qid NULLS FIRST, rank NULLS FIRST"
  }

  /** Residual-PQ census oracle: the IVF chain (kmeansCtes) feeds
    * integer rounded centroids mu = round-half-away(s/n) — the pure
    * integer formula (2|s|+n)//(2n) with sign restored, `//` and
    * Spark `div` agreeing on the nonnegative operands — then
    * residuals y = qx − mu, per-cell hash-smallest seeds, and ONE
    * unrolled Lloyd step whose zero-norm clusters score NULL (DESC
    * NULLS LAST, label-asc), exactly the engine's convention.
    */
  private val pqResidualSql = pqPrefix + ", " + kmeansCtes("v") +
    ", " +
    "cnv AS (SELECT label AS cell, COUNT(*) AS n FROM a2v " +
    "GROUP BY 1), " +
    "cvv AS (SELECT a.label AS cell, q.dim, CAST(SUM(qx) AS " +
    "BIGINT) AS s FROM qcv q JOIN a2v a USING (vec_id) " +
    "GROUP BY 1, 2), " +
    "muv AS (SELECT cell, dim, CASE WHEN s >= 0 THEN (2*s + n) " +
    "// (2*n) ELSE -((-2*s + n) // (2*n)) END AS mu FROM cvv " +
    "JOIN cnv USING (cell)), " +
    "ycv AS (SELECT q.vec_id, a.label AS cell, q.sub, q.dim, " +
    "q.qx - muv.mu AS y FROM qc q JOIN a2v a USING (vec_id) " +
    "JOIN muv ON muv.cell = a.label AND muv.dim = q.dim), " +
    "rsv AS (SELECT vec_id, cell, rlabel FROM (SELECT hv.vec_id, " +
    "a.label AS cell, CAST(ROW_NUMBER() OVER (PARTITION BY " +
    "a.label ORDER BY h, hv.vec_id) - 1 AS BIGINT) AS rlabel " +
    "FROM hv JOIN a2v a USING (vec_id)) WHERE rlabel < 4), " +
    "rssv AS (SELECT vec_id, cell, s.sub, rlabel FROM rsv, " +
    "(SELECT unnest(range(4)) AS sub) s), " +
    "z0v AS (SELECT y.cell, y.sub, r.rlabel, y.dim, CAST(SUM(y.y) " +
    "AS BIGINT) AS zs FROM ycv y JOIN rssv r ON y.vec_id = " +
    "r.vec_id AND y.sub = r.sub GROUP BY 1, 2, 3, 4), " +
    "zn0v AS (SELECT cell, sub, rlabel, SUM(CAST(zs AS HUGEINT) " +
    "* zs) AS s2 FROM z0v GROUP BY 1, 2, 3), " +
    "rs1v AS (SELECT y.vec_id, y.cell, y.sub, z.rlabel, " +
    "SUM(CAST(y.y AS HUGEINT) * z.zs) AS dot FROM ycv y JOIN z0v " +
    "z ON y.cell = z.cell AND y.sub = z.sub AND y.dim = z.dim " +
    "GROUP BY 1, 2, 3, 4), " +
    "ra1v AS (SELECT vec_id, cell, sub, rlabel FROM (SELECT " +
    "r.vec_id, r.cell, r.sub, r.rlabel, ROW_NUMBER() OVER " +
    "(PARTITION BY r.vec_id, r.sub ORDER BY (CASE WHEN z.s2 = 0 " +
    "THEN NULL ELSE CAST(r.dot AS DOUBLE) / sqrt(CAST(z.s2 AS " +
    "DOUBLE)) END) DESC NULLS LAST, r.rlabel) AS rn FROM rs1v r " +
    "JOIN zn0v z ON r.cell = z.cell AND r.sub = z.sub AND " +
    "r.rlabel = z.rlabel) WHERE rn = 1) " +
    "SELECT cell, sub, rlabel AS label, COUNT(*) AS n_vectors, " +
    "MIN(vec_id) AS min_vec_id FROM ra1v GROUP BY 1, 2, 3 " +
    "ORDER BY cell NULLS FIRST, sub NULLS FIRST, label NULLS FIRST"

  /** q33/q70 oracle: the two int-range rows derive from the DATA with
    * the engine's formatInt ladder, the three string rows are pinned
    * value sets (see the q33 comment at the map entry).
    */
  private val analyzeStructureSql =
    "WITH ir AS (SELECT 'doc_id' AS column_name, " +
    "CAST(MIN(doc_id) AS BIGINT) AS mn, CAST(MAX(doc_id) AS " +
    "BIGINT) AS mx FROM documents UNION ALL SELECT 'n_chars', " +
    "CAST(MIN(n_chars) AS BIGINT), CAST(MAX(n_chars) AS BIGINT) " +
    "FROM documents), " +
    "fmtd AS (SELECT column_name, 'int range=' || " +
    "CASE WHEN abs(mn) < 1000 THEN CAST(mn AS VARCHAR) " +
    "WHEN abs(mn) < 1000000 THEN printf('%.1fK', mn / 1000.0) " +
    "ELSE printf('%.1fM', mn / 1000000.0) END || '..' || " +
    "CASE WHEN abs(mx) < 1000 THEN CAST(mx AS VARCHAR) " +
    "WHEN abs(mx) < 1000000 THEN printf('%.1fK', mx / 1000.0) " +
    "ELSE printf('%.1fM', mx / 1000000.0) END AS inferred " +
    "FROM ir) " +
    "SELECT column_name, inferred FROM (SELECT * FROM fmtd " +
    "UNION ALL SELECT * FROM (VALUES ('lang', 'str pattern=Ii'), " +
    "('source', 'str'), ('text', 'str')) AS t(column_name, " +
    "inferred)) ORDER BY column_name NULLS FIRST"

  /** q36/q171's shared replay: the q25 shingle/jaccard chain,
    * near-dup filtered, then cluster labels by recursive transitive
    * closure (min reachable id == the engine's min-label propagation
    * fixpoint). q171 answers with the base+delta FOLD
    * ([[graft.operators.Dedup.foldComponents]]); this full closure
    * is its definitional result.
    */
  /** The shared chain up to `nd` (the verified near-dup pair list) —
    * [[dedupClustersSql]] closes over it in full, the q177 retract
    * replay closes over it minus the retracted docs' pairs.
    */
  private lazy val dedupPairsCtes: String =
    "WITH RECURSIVE " + shingleCte.stripPrefix("WITH ") +
    ", shd AS (SELECT doc_id, substr(md5(s), 1, 16) AS s FROM sh)" +
    ", kept AS (SELECT * FROM shd WHERE s NOT IN (SELECT s FROM " +
    "shd GROUP BY s HAVING COUNT(*) > 10000))" +
    ", sz AS (SELECT doc_id, COUNT(*) AS n FROM kept " +
    "GROUP BY doc_id)" +
    ", p0 AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) " +
    "AS inter FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < " +
    "b.doc_id GROUP BY 1, 2)" +
    ", nd AS (SELECT id1, id2 FROM p0 JOIN sz sa ON id1 = " +
    "sa.doc_id JOIN sz sb ON id2 = sb.doc_id WHERE inter * 5 >= " +
    "(sa.n + sb.n - inter))"

  private lazy val dedupClustersSql: String =
    dedupPairsCtes +
    ", edges AS (SELECT id1 AS src, id2 AS dst FROM nd UNION " +
    "SELECT id2, id1 FROM nd)" +
    ", nodes AS (SELECT DISTINCT src AS id FROM edges)" +
    ", reach(id, r) AS (SELECT id, id FROM nodes UNION SELECT " +
    "reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)" +
    ", labels AS (SELECT id, MIN(r) AS label FROM reach " +
    "GROUP BY id)" +
    ", sizes AS (SELECT label, COUNT(*) AS sz FROM labels " +
    "GROUP BY label) " +
    "SELECT (SELECT COUNT(*) FROM labels) AS n_clustered_docs, " +
    "(SELECT COUNT(DISTINCT label) FROM labels) AS n_clusters, " +
    "(SELECT MAX(sz) FROM sizes) AS max_cluster_size"

  /** q177's replay: the full closure over the near-dup pairs MINUS
    * every pair touching a retracted doc (doc_id ≡ 0 mod 17), plus
    * SINGLETON self-labels for previously-clustered survivors whose
    * every pair died — the definitional result the engine's
    * affected-components-only retraction must hash-match.
    */
  private lazy val retractClustersSql: String =
    dedupPairsCtes +
    ", rm AS (SELECT doc_id AS id FROM documents WHERE " +
    "doc_id % 17 = 0)" +
    ", ndk AS (SELECT id1, id2 FROM nd WHERE id1 NOT IN (SELECT " +
    "id FROM rm) AND id2 NOT IN (SELECT id FROM rm))" +
    ", prev AS (SELECT DISTINCT id FROM (SELECT id1 AS id FROM nd " +
    "UNION ALL SELECT id2 FROM nd) WHERE id NOT IN (SELECT id " +
    "FROM rm))" +
    ", edges AS (SELECT id1 AS src, id2 AS dst FROM ndk UNION " +
    "SELECT id2, id1 FROM ndk)" +
    ", nodes AS (SELECT DISTINCT src AS id FROM edges)" +
    ", reach(id, r) AS (SELECT id, id FROM nodes UNION SELECT " +
    "reach.id, e.dst FROM reach JOIN edges e ON e.src = reach.r)" +
    ", labels0 AS (SELECT id, MIN(r) AS label FROM reach " +
    "GROUP BY id)" +
    ", labels AS (SELECT id, label FROM labels0 UNION ALL SELECT " +
    "id, id AS label FROM prev WHERE id NOT IN (SELECT id FROM " +
    "labels0))" +
    ", sizes AS (SELECT label, COUNT(*) AS sz FROM labels " +
    "GROUP BY label) " +
    "SELECT (SELECT COUNT(*) FROM labels) AS n_clustered_docs, " +
    "(SELECT COUNT(DISTINCT label) FROM labels) AS n_clusters, " +
    "(SELECT MAX(sz) FROM sizes) AS max_cluster_size, " +
    "(SELECT COUNT(*) FROM ndk) AS n_pairs"

  val oracleSql: Map[String, String] = Map(
    // q154: the unigram Viterbi DP replayed as a recursive CTE — one
    // lockstep position per iteration, the best-cost array carried
    // as a list column; same word table, same piece counts, same
    // whole-bit costs, same packed objective
    "q154_unigram_segment" ->
      (unigramDpCtes +
       " SELECT obj % 64 AS n_pieces, COUNT(*) AS n_words, " +
       "CAST(SUM(f) AS BIGINT) AS n_tokens, " +
       "CAST(SUM(f * (obj // 64)) AS BIGINT) AS sum_wbits " +
       "FROM per GROUP BY 1 ORDER BY n_pieces NULLS FIRST"),

    // q164: the same DP chain joined back to the per-document token
    // stream — corpus-level encode census per source
    "q164_unigram_encode" ->
      (unigramDpCtes +
       ", tok AS (SELECT source, word AS w FROM (SELECT source, " +
       "unnest(regexp_split_to_array(trim(text), '\\s+')) AS word " +
       "FROM documents) WHERE word <> ''), " +
       "j AS (SELECT t.source, p.obj FROM tok t LEFT JOIN per p " +
       "ON t.w = p.w) " +
       "SELECT source, COUNT(*) AS n_tokens, " +
       "COUNT(CASE WHEN obj IS NULL THEN 1 END) AS n_unseg, " +
       "CAST(SUM(obj % 64) AS BIGINT) AS n_pieces, " +
       "CAST(SUM(obj // 64) AS BIGINT) AS sum_wbits " +
       "FROM j GROUP BY source ORDER BY source NULLS FIRST"),

    // q156: identical daily counts, identical HUGEINT sums, the
    // same rational (num, den) and sign
    "q156_trend_fit" ->
      ("WITH daily AS (SELECT event_type, " +
       "CAST(epoch_us(ts) // 86400000000 AS HUGEINT) AS x, " +
       "CAST(COUNT(*) AS HUGEINT) AS y FROM events " +
       "GROUP BY 1, 2), " +
       "s AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n, " +
       "SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, " +
       "SUM(x * x) AS sxx FROM daily GROUP BY 1) " +
       "SELECT event_type, CAST(n AS BIGINT) AS n_days, " +
       "CAST(sy AS BIGINT) AS n_rows, " +
       "CAST(n * sxy - sx * sy AS BIGINT) AS num, " +
       "CAST(n * sxx - sx * sx AS BIGINT) AS den, " +
       "CASE WHEN n * sxy > sx * sy THEN 'up' " +
       "WHEN n * sxy < sx * sy THEN 'down' ELSE 'flat' END AS " +
       "direction FROM s ORDER BY event_type NULLS FIRST"),

    // q155: identical messy-URL construction, identical rule set
    // (the SQL is GENERATED beside the Column rules — one
    // definition, zero drift)
    "q155_url_canon" ->
      ("WITH u AS (SELECT " + messyUrlSql + " AS url FROM " +
       "documents), c AS (SELECT url, " +
       Urls.canonicalizeSql("url") + " AS canon, " +
       Urls.hostSql("url") + " AS host FROM u) " +
       "SELECT host, COUNT(*) AS n_rows, " +
       "COUNT(DISTINCT url) AS n_raw, " +
       "COUNT(DISTINCT canon) AS n_canon, " +
       "MIN(CAST('0x' || substr(md5(canon), 1, 15) AS BIGINT)) " +
       "AS min_md5_prefix " +
       "FROM c GROUP BY host ORDER BY host NULLS FIRST"),

    // q167: every variant's expected extraction hand-derived from
    // the documented HtmlTextExpr rules and pinned as VALUES (the
    // q72 fixture pattern — the engine must reproduce each construct
    // EXACTLY: tag strip, RCDATA title, raw-text script/style,
    // quoted attributes, comments, entities, literal '<', broken
    // markup), joined to the per-variant doc counts
    "q167_html_extract" ->
      ("WITH exp AS (SELECT * FROM (VALUES " +
       "(0, 'Hello world', NULL, 0, 1), " +
       "(1, 'A <b> tag', 'Lab & Co', 0, 1), " +
       "(2, 'Real', NULL, 0, 1), " +
       "(3, 'Styled', NULL, 0, 1), " +
       "(4, 'See one and two', NULL, 2, 1), " +
       "(5, 'Shown', NULL, 0, 1), " +
       "(6, 'café ☃ AB', NULL, 0, 1), " +
       "(7, '1 < 2 and fine', NULL, 0, 1), " +
       "(8, 'q', NULL, 1, 1), " +
       "(9, 'One Two', NULL, 0, 2), " +
       "(10, 'UP CASE L', NULL, 1, 1), " +
       "(11, 'trail deep', NULL, 0, 1)" +
       ") v(variant, text, title, n_links, n_paragraphs)), " +
       "c AS (SELECT doc_id % 12 AS variant, CAST(COUNT(*) AS " +
       "BIGINT) AS n FROM documents GROUP BY 1) " +
       "SELECT c.variant, e.text, e.title, " +
       "CAST(e.n_links AS BIGINT) AS n_links, " +
       "CAST(e.n_paragraphs AS BIGINT) AS n_paragraphs, c.n " +
       "FROM exp e JOIN c ON e.variant = c.variant " +
       "ORDER BY c.variant"),

    // q172: expected blocks pinned as (variant, text, link-chars)
    // VALUES per the documented rules; the census recomputes from
    // length(text) in SQL so every character count is derived, not
    // hand-added
    "q172_boilerplate" ->
      ("WITH exp AS (SELECT * FROM (VALUES " +
       "(0, 'the quick brown fox jumps over the lazy dog and " +
       "keeps running', 0), " +
       "(1, 'home about', 10), " +
       "(1, 'a decently long paragraph of genuine content with a " +
       "link here', 5), " +
       "(1, 'contact page', 12), " +
       "(2, 'one', 3), (2, 'two', 3), (2, 'three', 5), " +
       "(3, 'id', 0), " +
       "(3, 'a reasonably wordy description cell with many " +
       "characters inside', 0), " +
       "(4, 'plain prose that easily clears the twenty character " +
       "bar', 0), " +
       "(5, 'broken markup still yields a usable prose block for " +
       "the census', 0)" +
       ") v(variant, text, lc)), " +
       "st AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS " +
       "n_blocks, CAST(COUNT(*) FILTER (length(text) >= 20 AND " +
       "2 * lc < length(text)) AS BIGINT) AS n_content, " +
       "CAST(COALESCE(SUM(length(text)) FILTER (length(text) >= " +
       "20 AND 2 * lc < length(text)), 0) AS BIGINT) AS " +
       "content_chars, CAST(SUM(lc) AS BIGINT) AS link_chars " +
       "FROM exp GROUP BY 1), " +
       "c AS (SELECT doc_id % 6 AS variant, CAST(COUNT(*) AS " +
       "BIGINT) AS n FROM documents GROUP BY 1) " +
       "SELECT c.variant, st.n_blocks, st.n_content, " +
       "st.content_chars, st.link_chars, c.n " +
       "FROM st JOIN c ON st.variant = c.variant " +
       "ORDER BY c.variant"),

    // q169: the oracle runs the FULL 3-round exact rank over
    // base ∪ delta (the existing pagerankCtes generator) — the
    // engine answers with the frontier-only delta fold, so the hash
    // compare IS the delta-fold == full-re-run proof
    "q169_pagerank_delta" ->
      ("WITH pe AS MATERIALIZED (SELECT 'c' || CAST(o_custkey AS " +
       "VARCHAR) AS src, 's' || CAST(l_suppkey AS VARCHAR) AS dst, " +
       "SUM(CAST(l_quantity AS BIGINT)) AS w FROM orders JOIN " +
       "lineitem ON l_orderkey = o_orderkey GROUP BY 1, 2), " +
       "sy AS MATERIALIZED (SELECT src, dst, w FROM pe UNION ALL " +
       "SELECT dst AS src, src AS dst, w FROM pe), " +
       pagerankCtes(
         "SELECT src, dst FROM sy UNION ALL " +
         "SELECT src, dst FROM sy WHERE w % 7 = 0",
         None, rounds = 2) +
       " SELECT node, CAST(pr AS BIGINT) AS pr FROM p2 " +
       "ORDER BY pr DESC, node ASC NULLS FIRST LIMIT 10"),

    // q170: the q168 replay with the extraction-structure columns —
    // the wrapper guarantees text == raw sentence, one link and one
    // 'doc' title per document, so a hash match pins the extraction
    // AND the downstream classification in one gate
    "q170_web_pipeline" ->
      ("WITH txt AS MATERIALIZED (SELECT doc_id, 'l' || " +
       "CAST(doc_id % 3 AS VARCHAR) AS l, " + langTextSql +
       " AS t FROM documents), " +
       "tg AS MATERIALIZED (SELECT l, substr(t, CAST(i + 1 AS " +
       "INTEGER), 2) AS g FROM (SELECT l, t, " +
       "unnest(range(length(t) - 1)) AS i FROM txt WHERE " +
       "doc_id % 5 <> 0)), " +
       "c AS (SELECT l, g, CAST(COUNT(*) AS BIGINT) AS c FROM tg " +
       "GROUP BY 1, 2), " +
       "nl AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS n FROM tg " +
       "GROUP BY 1), " +
       "vv AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS v " +
       "FROM tg), " +
       "eg AS (SELECT doc_id, l AS tl, substr(t, CAST(i + 1 AS " +
       "INTEGER), 2) AS g FROM (SELECT doc_id, l, t, " +
       "unnest(range(length(t) - 1)) AS i FROM txt WHERE " +
       "doc_id % 5 = 0)), " +
       "sc AS (SELECT eg.doc_id, eg.tl, nl.l, " +
       "SUM((length(bin(nl.n + (SELECT v FROM vv))) - 1) - " +
       "(length(bin(COALESCE(c.c, 0) + 1)) - 1)) AS bits " +
       "FROM eg CROSS JOIN nl LEFT JOIN c ON c.l = nl.l AND " +
       "c.g = eg.g GROUP BY 1, 2, 3), " +
       "pr AS (SELECT doc_id, tl, l AS pred, ROW_NUMBER() OVER " +
       "(PARTITION BY doc_id ORDER BY bits, l) AS rn FROM sc) " +
       "SELECT tl AS true_label, pred, CAST(COUNT(*) AS BIGINT) " +
       "AS n, CAST(COUNT(*) AS BIGINT) AS n_links, " +
       "CAST(COUNT(*) AS BIGINT) AS n_titled FROM pr WHERE rn = 1 " +
       "GROUP BY 1, 2 " +
       "ORDER BY true_label NULLS FIRST, pred NULLS FIRST"),

    // q173: the oracle is the FULL 2-round rank over the PLAIN
    // symmetrized graph (the refresh's new state) — the engine
    // answers by folding the edge removals into the reinforced
    // graph's trace
    "q173_pagerank_refresh" ->
      ("WITH pe AS MATERIALIZED (SELECT 'c' || CAST(o_custkey AS " +
       "VARCHAR) AS src, 's' || CAST(l_suppkey AS VARCHAR) AS dst " +
       "FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
       "WHERE o_custkey % 3 = 0 GROUP BY 1, 2), " +
       "sy AS MATERIALIZED (SELECT src, dst FROM pe UNION ALL " +
       "SELECT dst AS src, src AS dst FROM pe), " +
       pagerankCtes("SELECT src, dst FROM sy", None, rounds = 2) +
       " SELECT node, CAST(pr AS BIGINT) AS pr FROM p2 " +
       "ORDER BY pr DESC, node ASC NULLS FIRST LIMIT 10"),

    // q174/q175: the order-cycle graph plus the mod-100 customers'
    // reinforcing delta, ranked in full for 6 rounds — q174 answers
    // with the frontier fold, q175 with the from-scratch re-rank;
    // both must hash-match this replay
    "q174_pagerank_small_delta" -> smallDeltaRankSql,
    "q175_pagerank_rerank_baseline" -> smallDeltaRankSql,

    // q176: the full 2-round rank over the whole custkey ≡ 0
    // (mod 3) symmetrized subgraph (base ∪ node-adding delta),
    // censused per node kind — the engine folds the
    // mod-7-supplier edges (new nodes included) into the shrunken
    // base's trace
    "q176_pagerank_grow" ->
      ("WITH pe AS MATERIALIZED (SELECT src, dst FROM (" +
       purchaseEdgesSql + ") WHERE CAST(substr(src, 2) AS " +
       "BIGINT) % 3 = 0), " +
       "sy AS MATERIALIZED (SELECT src, dst FROM pe UNION ALL " +
       "SELECT dst AS src, src AS dst FROM pe), " +
       pagerankCtes("SELECT src, dst FROM sy", None, rounds = 2) +
       " SELECT substr(node, 1, 1) AS kind, CAST(COUNT(*) AS " +
       "BIGINT) AS n_nodes, CAST(SUM(pr) AS BIGINT) AS sum_pr, " +
       "CAST(MAX(pr) AS BIGINT) AS max_pr FROM p2 GROUP BY 1 " +
       "ORDER BY kind NULLS FIRST"),

    // q168: the naive-Bayes training AND argmin replayed in SQL —
    // same char-TRIGRAM enumeration, same add-one whole-bit costs
    // (length(bin(n)) - 1 = ⌊log2 n⌋), same (bits, label) tie-break
    "q168_langid" ->
      ("WITH txt AS MATERIALIZED (SELECT doc_id, 'l' || " +
       "CAST(doc_id % 3 AS VARCHAR) AS l, " + langTextSql +
       " AS t FROM documents), " +
       "tg AS MATERIALIZED (SELECT l, substr(t, CAST(i + 1 AS " +
       "INTEGER), 3) AS g FROM (SELECT l, t, " +
       "unnest(range(length(t) - 2)) AS i FROM txt WHERE " +
       "doc_id % 5 <> 0)), " +
       "c AS (SELECT l, g, CAST(COUNT(*) AS BIGINT) AS c FROM tg " +
       "GROUP BY 1, 2), " +
       "nl AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS n FROM tg " +
       "GROUP BY 1), " +
       "vv AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS v " +
       "FROM tg), " +
       "eg AS (SELECT doc_id, l AS tl, substr(t, CAST(i + 1 AS " +
       "INTEGER), 3) AS g FROM (SELECT doc_id, l, t, " +
       "unnest(range(length(t) - 2)) AS i FROM txt WHERE " +
       "doc_id % 5 = 0)), " +
       "sc AS (SELECT eg.doc_id, eg.tl, nl.l, " +
       "SUM((length(bin(nl.n + (SELECT v FROM vv))) - 1) - " +
       "(length(bin(COALESCE(c.c, 0) + 1)) - 1)) AS bits " +
       "FROM eg CROSS JOIN nl LEFT JOIN c ON c.l = nl.l AND " +
       "c.g = eg.g GROUP BY 1, 2, 3), " +
       "pr AS (SELECT doc_id, tl, l AS pred, ROW_NUMBER() OVER " +
       "(PARTITION BY doc_id ORDER BY bits, l) AS rn FROM sc) " +
       "SELECT tl AS true_label, pred, CAST(COUNT(*) AS BIGINT) " +
       "AS n FROM pr WHERE rn = 1 GROUP BY 1, 2 " +
       "ORDER BY true_label NULLS FIRST, pred NULLS FIRST"),

    // q166: identical salted buckets, identical per-row inner
    // products, identical min — the estimate pins exactly
    "q166_join_size_estimate" ->
      ("WITH la AS (SELECT CAST(l_orderkey AS VARCHAR) AS k FROM " +
       "lineitem), " +
       "ob AS (SELECT CAST(o_orderkey AS VARCHAR) AS k FROM " +
       "orders), " +
       "ca AS (SELECT row, bucket, CAST(COUNT(*) AS HUGEINT) AS " +
       "ca FROM (SELECT r.i AS row, CAST('0x' || substr(md5(" +
       "CAST(r.i // 4 AS VARCHAR) || ':' || k), " +
       "CAST((r.i % 4) * 8 + 1 AS INTEGER), 8) AS BIGINT) % " +
       "4096 AS bucket FROM la, (SELECT unnest(range(4)) AS i) r) " +
       "GROUP BY 1, 2), " +
       "cb AS (SELECT row, bucket, CAST(COUNT(*) AS HUGEINT) AS " +
       "cb FROM (SELECT r.i AS row, CAST('0x' || substr(md5(" +
       "CAST(r.i // 4 AS VARCHAR) || ':' || k), " +
       "CAST((r.i % 4) * 8 + 1 AS INTEGER), 8) AS BIGINT) % " +
       "4096 AS bucket FROM ob, (SELECT unnest(range(4)) AS i) r) " +
       "GROUP BY 1, 2), " +
       "ip AS (SELECT ca.row, SUM(ca.ca * cb.cb) AS ip FROM ca " +
       "JOIN cb ON ca.row = cb.row AND ca.bucket = cb.bucket " +
       "GROUP BY 1), " +
       "es AS (SELECT CAST(MIN(COALESCE(ip.ip, 0)) AS BIGINT) AS " +
       "est FROM (SELECT unnest(range(4)) AS row) r LEFT JOIN ip " +
       "ON ip.row = r.row), " +
       "ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact FROM la " +
       "JOIN ob ON la.k = ob.k) " +
       "SELECT est AS est_join_rows, exact AS exact_join_rows, " +
       "est >= exact AS no_undercount, " +
       "CAST((est * 10000) // NULLIF(exact, 0) AS BIGINT) AS " +
       "est_ratio_bp FROM es CROSS JOIN ex"),

    // q165: min-hop BFS as a depth-bounded recursive closure.
    // NB: inside WITH RECURSIVE this DuckDB build does NOT
    // deduplicate a bare UNION in non-recursive CTEs — the node
    // set dedups through an explicit DISTINCT
    "q165_hop_census" ->
      ("WITH RECURSIVE " +
       "pe AS MATERIALIZED (" + purchaseEdgesSql + "), " +
       "edges AS MATERIALIZED (SELECT src, dst FROM pe UNION ALL " +
       "SELECT dst, src FROM pe), " +
       "nodes AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT " +
       "src AS node FROM edges UNION ALL SELECT dst FROM edges)), " +
       "sd AS (SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node " +
       "FROM supplier WHERE s_nationkey < 5), " +
       "reach(node, d) AS (SELECT n.node, 0 FROM nodes n JOIN sd " +
       "ON n.node = sd.node UNION SELECT e.dst, r.d + 1 FROM " +
       "reach r JOIN edges e ON e.src = r.node WHERE r.d < 4), " +
       "md AS (SELECT node, MIN(d) AS d FROM reach GROUP BY 1) " +
       "SELECT CAST(d AS INTEGER) AS hop, COUNT(*) AS n_nodes " +
       "FROM (SELECT n.node, md.d FROM nodes n LEFT JOIN md ON " +
       "n.node = md.node) GROUP BY 1 ORDER BY hop NULLS FIRST"),

    // q163: the weighted replay — same edge aggregation, same
    // generalized floor update
    "q163_pagerank_weighted" ->
      ("WITH " + pagerankCtes(
         "SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src, " +
         "'s' || CAST(l_suppkey AS VARCHAR) AS dst, " +
         "CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS w " +
         "FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
         "GROUP BY 1, 2",
         None, rounds = 3, weighted = true) +
       " SELECT node, CAST(pr AS BIGINT) AS pr FROM p3 " +
       "ORDER BY pr DESC, node ASC NULLS FIRST LIMIT 10"),

    // q152: the 3-iteration exact-integer PageRank replay in HUGEINT
    "q152_pagerank" ->
      ("WITH " + pagerankCtes(purchaseEdgesSql, None, rounds = 3) +
       " SELECT node, CAST(pr AS BIGINT) AS pr FROM p3 " +
       "ORDER BY pr DESC, node ASC NULLS FIRST LIMIT 10"),

    // q153: the seeded replay — symmetrized edges, nation-0..4
    // supplier seeds, per-kind score census
    "q153_trustrank" ->
      ("WITH " + pagerankCtes(
         "SELECT src, dst FROM (" + purchaseEdgesSql +
         ") UNION ALL SELECT dst, src FROM (" + purchaseEdgesSql + ")",
         Some("SELECT 's' || CAST(s_suppkey AS VARCHAR) AS node " +
           "FROM supplier WHERE s_nationkey < 5"),
         rounds = 3) +
       " SELECT substr(node, 1, 1) AS kind, COUNT(*) AS n_nodes, " +
       "CAST(SUM(pr) AS BIGINT) AS sum_pr, " +
       "CAST(MAX(pr) AS BIGINT) AS max_pr, " +
       "COUNT(CASE WHEN pr = 0 THEN 1 END) AS n_zero " +
       "FROM p3 GROUP BY 1 ORDER BY kind NULLS FIRST"),

    // q161: the classification per blob class is PINNED (the q72
    // VALUES pattern) — the engine derives it from the bytes, the
    // oracle asserts the documented answer per doc_id class
    "q161_media_sniff" ->
      ("SELECT kind, format, COUNT(*) AS n FROM (SELECT " +
       "CASE doc_id % 11 " +
       MediaSniffClasses.zipWithIndex.map { case ((k, _), i) =>
         s"WHEN $i THEN '$k' " }.mkString +
       "END AS kind, CASE doc_id % 11 " +
       MediaSniffClasses.zipWithIndex.map { case ((_, f), i) =>
         s"WHEN $i THEN '$f' " }.mkString +
       "END AS format FROM documents) GROUP BY 1, 2 " +
       "ORDER BY kind NULLS FIRST, format NULLS FIRST"),

    // q162: same word table, same bin()-length whole bits, same
    // rational slope
    "q162_zipf_fit" ->
      ("WITH wf AS (SELECT word AS w, CAST(COUNT(*) AS BIGINT) AS " +
       "f FROM (SELECT unnest(regexp_split_to_array(trim(text), " +
       "'\\s+')) AS word FROM documents) WHERE word <> '' " +
       "GROUP BY word), " +
       "p AS (SELECT CAST(length(bin(ROW_NUMBER() OVER (ORDER BY " +
       "f DESC, w ASC NULLS FIRST))) - 1 AS HUGEINT) AS x, " +
       "CAST(length(bin(f)) - 1 AS HUGEINT) AS y FROM wf), " +
       "s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS " +
       "sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx " +
       "FROM p) " +
       "SELECT CAST(n AS BIGINT) AS n_words, " +
       "CAST(n * sxy - sx * sy AS BIGINT) AS num, " +
       "CAST(n * sxx - sx * sx AS BIGINT) AS den, " +
       "CASE WHEN n * sxy > sx * sy THEN 'up' " +
       "WHEN n * sxy < sx * sy THEN 'down' ELSE 'flat' END AS " +
       "direction FROM s"),

    // q160: same (key, value) count reduction, same cumulative rank
    // rule, same exact value-copy bounds
    "q160_winsor_census" ->
      ("WITH vc AS (SELECT event_type AS k, value AS v, " +
       "CAST(COUNT(*) AS BIGINT) AS c FROM events WHERE value IS " +
       "NOT NULL GROUP BY 1, 2), " +
       "f AS (SELECT k, v, c, SUM(c) OVER (PARTITION BY k ORDER " +
       "BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS " +
       "cum, SUM(c) OVER (PARTITION BY k) AS n FROM vc), " +
       "g AS (SELECT *, n * 1 // 100 + 1 AS lo_rn, " +
       "n * 99 // 100 + 1 AS hi_rn FROM f) " +
       "SELECT k AS event_type, CAST(MAX(n) AS BIGINT) AS n_rows, " +
       "COUNT(*) AS n_distinct, " +
       "MAX(CASE WHEN cum - c < lo_rn AND cum >= lo_rn THEN v " +
       "END) AS lo, " +
       "MAX(CASE WHEN cum - c < hi_rn AND cum >= hi_rn THEN v " +
       "END) AS hi, " +
       "CAST(COALESCE(SUM(CASE WHEN cum < lo_rn THEN c END), 0) " +
       "AS BIGINT) AS n_clip_low, " +
       "CAST(COALESCE(SUM(CASE WHEN cum - c >= hi_rn THEN c END), " +
       "0) AS BIGINT) AS n_clip_high " +
       "FROM g GROUP BY k ORDER BY event_type NULLS FIRST"),

    // q158: same per-user lag window, same pair counts, same
    // basis-point floor division
    "q158_transitions" ->
      ("WITH o AS (SELECT user_id, event_type, LAG(event_type) " +
       "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev " +
       "FROM events), " +
       "p AS (SELECT prev, event_type AS next, COUNT(*) AS n " +
       "FROM o WHERE prev IS NOT NULL GROUP BY 1, 2), " +
       "t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM p) " +
       "SELECT prev, next, CAST(n AS BIGINT) AS n, " +
       "(n * 10000) // (SELECT tot FROM t) AS share_bp " +
       "FROM p ORDER BY n DESC, prev ASC NULLS FIRST, " +
       "next ASC NULLS FIRST LIMIT 15"),

    // q159: same rank-ordered counts, same exact Gini rational and
    // cross-multiplied verdict
    "q159_skew_census" ->
      ("WITH kc AS (SELECT l_suppkey AS k, CAST(COUNT(*) AS " +
       "HUGEINT) AS x FROM lineitem GROUP BY 1), " +
       "r AS (SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x ASC, " +
       "k ASC NULLS FIRST) AS HUGEINT) AS i, " +
       "CAST(COUNT(*) OVER () AS HUGEINT) AS n, " +
       "CAST(SUM(x) OVER () AS HUGEINT) AS sx FROM kc) " +
       "SELECT CAST(MAX(n) AS BIGINT) AS n_keys, " +
       "CAST(MAX(sx) AS BIGINT) AS n_rows, " +
       "CAST(SUM((2*i - n - 1) * x) AS BIGINT) AS gini_num, " +
       "CAST(MAX(n * sx) AS BIGINT) AS gini_den, " +
       "CAST(MAX(x) AS BIGINT) AS max_key_rows, " +
       "SUM((2*i - n - 1) * x) * 5 > MAX(n * sx) * 2 AS " +
       "salt_advised FROM r"),

    // q157: the 2-round HITS replay — same half-steps, same floor
    // renormalization
    "q157_hits" ->
      ("WITH " + hitsCtes(purchaseEdgesSql, rounds = 2) +
       " SELECT node, CAST(hub AS BIGINT) AS hub, " +
       "CAST(auth AS BIGINT) AS auth FROM s2 " +
       "ORDER BY auth DESC, node ASC NULLS FIRST LIMIT 10"),

    // q141: replay the add-one bigram LM in SQL — same bigram rows,
    // same trained counts, same whole-bit code lengths via bin()
    // string length (floor-log2 exactness both engines share)
    "q141_lm_bits" ->
      (lmPerDocCte +
       "SELECT source, COUNT(*) AS n_docs, " +
       "CAST(SUM(n_b) AS BIGINT) AS n_bigrams, " +
       "CAST(SUM(n_u) AS BIGINT) AS n_unseen, " +
       "CAST(SUM(bits) AS BIGINT) AS sum_bits, " +
       "CAST(MIN(decibits) AS BIGINT) AS min_decibits, " +
       "CAST(MAX(decibits) AS BIGINT) AS max_decibits, " +
       "COUNT(CASE WHEN decibits >= 50 THEN 1 END) AS n_flagged " +
       "FROM pd GROUP BY source ORDER BY source NULLS FIRST"),
    // q142: replay the PMI gate with HUGEINT products (DuckDB's
    // exact 128-bit ints stand in for the engine's DECIMAL(38,0));
    // the floor-log2 "-1"s cancel two-up-two-down in pmi_bits
    "q142_collocations" ->
      ("WITH d AS (SELECT regexp_split_to_array(trim(text), " +
       "'\\s+') AS l FROM documents), " +
       "p AS (SELECT l[i-1] AS w1, l[i] AS w2, " +
       "l[i-1] || ' ' || l[i] AS bg FROM d, " +
       "unnest(range(2, len(l) + 1)) AS u(i) WHERE len(l) >= 2), " +
       "b AS (SELECT bg, w1, w2, COUNT(*) AS c_bg FROM p " +
       "GROUP BY bg, w1, w2 HAVING COUNT(*) >= 3), " +
       "u1 AS (SELECT w1, COUNT(*) AS c_w1 FROM p GROUP BY w1), " +
       "u2 AS (SELECT w2, COUNT(*) AS c_w2 FROM p GROUP BY w2), " +
       "n AS (SELECT COUNT(*) AS n_total FROM p) " +
       "SELECT bg, c_bg, c_w1, c_w2, " +
       "CAST(length(bin(c_bg)) + length(bin(n_total)) - " +
       "length(bin(c_w1)) - length(bin(c_w2)) AS BIGINT) " +
       "AS pmi_bits " +
       "FROM b JOIN u1 USING (w1) JOIN u2 USING (w2) CROSS JOIN n " +
       "WHERE c_bg::HUGEINT * n_total::HUGEINT >= " +
       "2 * c_w1::HUGEINT * c_w2::HUGEINT " +
       "ORDER BY c_bg DESC, bg ASC NULLS FIRST LIMIT 20"),
    // q151: replay each rule as a filtered count + the anti-join
    "q151_contract_census" ->
      ("WITH c AS (SELECT COUNT(*) AS n FROM lineitem) " +
       "SELECT * FROM (" +
       "SELECT 'qty_le_45' AS rule, COUNT(CASE WHEN NOT " +
       "COALESCE(l_quantity <= 45, FALSE) THEN 1 END) AS " +
       "n_violations, (SELECT n FROM c) AS n_rows FROM lineitem " +
       "UNION ALL SELECT 'disc_le_8pct', COUNT(CASE WHEN NOT " +
       "COALESCE(l_discount <= 0.08, FALSE) THEN 1 END), " +
       "(SELECT n FROM c) FROM lineitem " +
       "UNION ALL SELECT 'price_ge_1000', COUNT(CASE WHEN NOT " +
       "COALESCE(l_extendedprice >= 1000, FALSE) THEN 1 END), " +
       "(SELECT n FROM c) FROM lineitem " +
       "UNION ALL SELECT 'flag_domain', COUNT(CASE WHEN NOT " +
       "COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 1 " +
       "END), (SELECT n FROM c) FROM lineitem " +
       "UNION ALL SELECT 'fk_orderkey', (SELECT COUNT(*) FROM " +
       "lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS " +
       "(SELECT 1 FROM orders o WHERE o.o_orderkey = " +
       "l.l_orderkey)), NULL) " +
       "ORDER BY rule NULLS FIRST"),
    // q150: the shared LM per-doc chain + the q07 positional-rank
    // rule, per source
    "q150_lm_quartiles" ->
      (lmPerDocCte +
       ", r AS (SELECT source, doc_id, decibits, " +
       "ROW_NUMBER() OVER (PARTITION BY source ORDER BY decibits, " +
       "doc_id) AS rn, COUNT(*) OVER (PARTITION BY source) AS n " +
       "FROM pd) " +
       "SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs, " +
       "CAST(MAX(CASE WHEN rn = 1 THEN decibits END) AS BIGINT) " +
       "AS min_db, " +
       "CAST(MAX(CASE WHEN rn = n // 4 + 1 THEN decibits END) AS " +
       "BIGINT) AS q1_db, " +
       "CAST(MAX(CASE WHEN rn = n // 2 + 1 THEN decibits END) AS " +
       "BIGINT) AS q2_db, " +
       "CAST(MAX(CASE WHEN rn = 3 * n // 4 + 1 THEN decibits END) " +
       "AS BIGINT) AS q3_db, " +
       "CAST(MAX(CASE WHEN rn = n THEN decibits END) AS BIGINT) " +
       "AS max_db " +
       "FROM r GROUP BY source ORDER BY source NULLS FIRST"),
    // q149: same daily counts, same ROWS BETWEEN trailing window,
    // same exact cross-multiplied burst rule
    "q149_burst_detect" ->
      ("WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 " +
       "AS day, COUNT(*) AS n FROM events GROUP BY 1, 2), " +
       "t AS (SELECT event_type, day, n, " +
       "SUM(n) OVER (PARTITION BY event_type ORDER BY day ROWS " +
       "BETWEEN 7 PRECEDING AND 1 PRECEDING) AS w_sum, " +
       "COUNT(n) OVER (PARTITION BY event_type ORDER BY day ROWS " +
       "BETWEEN 7 PRECEDING AND 1 PRECEDING) AS w_cnt FROM d), " +
       "b AS (SELECT *, (w_cnt >= 3 AND n * w_cnt > w_sum * 2) " +
       "AS burst FROM t) " +
       "SELECT event_type, COUNT(*) AS n_days, " +
       "COUNT(CASE WHEN burst THEN 1 END) AS n_bursts, " +
       "MIN(CASE WHEN burst THEN day END) AS first_burst_day, " +
       "CAST(MAX((n * w_cnt * 100) // w_sum) AS BIGINT) AS " +
       "max_pct, CAST(SUM(n) AS BIGINT) AS n_events " +
       "FROM b GROUP BY event_type ORDER BY event_type NULLS FIRST"),
    // q148: the q96 changelog CTE, lead() per key over (ts), upsert
    // intervals only, per-segment census
    "q148_scd2_history" ->
      ("WITH h AS (SELECT *, CAST('0x' || " +
       "substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT) " +
       "% 630 AS hh FROM customer), " +
       "chg AS (" +
       "SELECT c_custkey, c_acctbal + 50.0 AS bal, c_mktsegment " +
       "AS seg, 1 AS ts, 'upsert' AS op FROM h WHERE hh % 7 = 0 " +
       "UNION ALL SELECT c_custkey, c_acctbal + 100.0, " +
       "c_mktsegment, 2, 'upsert' FROM h WHERE hh % 7 = 0 " +
       "UNION ALL SELECT c_custkey, c_acctbal, c_mktsegment, 3, " +
       "'delete' FROM h WHERE hh % 10 = 0 " +
       "UNION ALL SELECT c_custkey + 1000000, 42.0, 'NEW', 1, " +
       "'upsert' FROM h WHERE hh % 9 = 0), " +
       "v AS (SELECT c_custkey, seg, ts, op, lead(ts) OVER " +
       "(PARTITION BY c_custkey ORDER BY ts) AS valid_to FROM chg), " +
       "iv AS (SELECT * FROM v WHERE op = 'upsert') " +
       "SELECT seg AS c_mktsegment, COUNT(*) AS n_intervals, " +
       "COUNT(CASE WHEN valid_to IS NULL THEN 1 END) AS n_current, " +
       "CAST(COALESCE(SUM(valid_to - ts), 0) AS BIGINT) AS " +
       "sum_closed_len, COUNT(DISTINCT c_custkey) AS n_keys " +
       "FROM iv GROUP BY seg ORDER BY seg NULLS FIRST"),
    // q147: replay both sides over the sampled slice — the exact
    // q25 jaccard chain (df cap included) and the q26/q40 capped
    // band candidates — then the confusion census on the full
    // outer join
    "q147_lsh_eval" ->
      (sampledShingleCte + minhashSigCte + minhashBandsCte +
       ", hotb AS (SELECT band, key FROM bands GROUP BY band, key " +
       "HAVING COUNT(*) > 10000)" +
       ", kb AS (SELECT doc_id, band, key FROM bands b WHERE NOT " +
       "EXISTS (SELECT 1 FROM hotb h WHERE h.band = b.band AND " +
       "h.key = b.key))" +
       ", cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS " +
       "id2 FROM kb a JOIN kb b ON a.band = b.band AND a.key = " +
       "b.key AND a.doc_id < b.doc_id)" +
       ", shd AS (SELECT doc_id, substr(md5(s), 1, 16) AS s " +
       "FROM sh)" +
       ", kept AS (SELECT * FROM shd WHERE s NOT IN (SELECT s " +
       "FROM shd GROUP BY s HAVING COUNT(*) > 10000))" +
       ", sz AS (SELECT doc_id, COUNT(*) AS n FROM kept " +
       "GROUP BY doc_id)" +
       ", pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, " +
       "COUNT(*) AS inter FROM kept a JOIN kept b ON a.s = b.s " +
       "AND a.doc_id < b.doc_id GROUP BY 1, 2)" +
       ", ex AS (SELECT id1, id2, inter * 5 >= (sa.n + sb.n - " +
       "inter) AS truth FROM pr JOIN sz sa ON id1 = sa.doc_id " +
       "JOIN sz sb ON id2 = sb.doc_id)" +
       ", j AS (SELECT COALESCE(ex.truth, FALSE) AS truth, " +
       "(cand.id1 IS NOT NULL) AS cand FROM ex " +
       "FULL OUTER JOIN cand ON ex.id1 = cand.id1 AND " +
       "ex.id2 = cand.id2) " +
       "SELECT COUNT(*) AS n_pairs, " +
       "COUNT(CASE WHEN truth THEN 1 END) AS n_truth, " +
       "COUNT(CASE WHEN cand THEN 1 END) AS n_cand, " +
       "COUNT(CASE WHEN truth AND cand THEN 1 END) AS tp, " +
       "COUNT(CASE WHEN truth AND NOT cand THEN 1 END) AS fn, " +
       "COUNT(CASE WHEN NOT truth AND cand THEN 1 END) AS fp " +
       "FROM j"),
    // q146: replay the matryoshka eval — q28's quantized-dot ladder
    // with FILTERed prefix sums, two rank windows, the same id
    // tie-breaks
    "q146_matryoshka" ->
      ("WITH p AS (SELECT vec_id AS pid, embedding AS qv FROM " +
       "embeddings WHERE vec_id % 97 = 0), " +
       "u AS (SELECT c.vec_id AS cid, p.pid AS pid, " +
       "generate_subscripts(c.embedding, 1) AS i, " +
       "unnest(c.embedding) AS x, p.qv AS qv " +
       "FROM embeddings c CROSS JOIN p WHERE c.vec_id <> p.pid), " +
       "e AS (SELECT cid, pid, i, " +
       "CAST(round(CAST(x AS DOUBLE) * 33554432.0) AS BIGINT) AS " +
       "qx, CAST(round(CAST(qv[i] AS DOUBLE) * 33554432.0) AS " +
       "BIGINT) AS qy FROM u), " +
       "d AS (SELECT pid, cid, " +
       "CAST(SUM(qx * qy) AS BIGINT) AS dot_full, " +
       "CAST(SUM(CASE WHEN i <= 16 THEN qx * qy ELSE 0 END) AS " +
       "BIGINT) AS dot_pre, " +
       "CAST(SUM(qx * qx) AS BIGINT) AS nc2, " +
       "CAST(SUM(CASE WHEN i <= 16 THEN qx * qx ELSE 0 END) AS " +
       "BIGINT) AS ncp2, " +
       "CAST(SUM(qy * qy) AS BIGINT) AS nq2, " +
       "CAST(SUM(CASE WHEN i <= 16 THEN qy * qy ELSE 0 END) AS " +
       "BIGINT) AS nqp2 FROM e GROUP BY pid, cid), " +
       "r AS (SELECT pid, cid, " +
       "row_number() OVER (PARTITION BY pid ORDER BY " +
       "CAST(dot_full AS DOUBLE) / (sqrt(CAST(nc2 AS DOUBLE)) * " +
       "sqrt(CAST(nq2 AS DOUBLE))) DESC, cid) AS rf, " +
       "row_number() OVER (PARTITION BY pid ORDER BY " +
       "CAST(dot_pre AS DOUBLE) / (sqrt(CAST(ncp2 AS DOUBLE)) * " +
       "sqrt(CAST(nqp2 AS DOUBLE))) DESC, cid) AS rp FROM d) " +
       "SELECT pid, COUNT(CASE WHEN rf <= 10 AND rp <= 10 THEN 1 " +
       "END) AS overlap, " +
       "MIN(CASE WHEN rf = 1 THEN cid END) AS top1_full, " +
       "MIN(CASE WHEN rp = 1 THEN cid END) AS top1_prefix " +
       "FROM r WHERE rf <= 10 OR rp <= 10 GROUP BY pid " +
       "ORDER BY pid NULLS FIRST"),
    // q145: replay DSIR — same md5-prefix bucket hash, same add-one
    // whole-bit log ratio (the four bin() lengths' -1s cancel)
    "q145_dsir_weights" ->
      ("WITH d AS (SELECT source, doc_id, regexp_split_to_array(" +
       "trim(text), '\\s+') AS l FROM documents), " +
       "dd AS (SELECT * FROM d WHERE NOT (len(l) = 1 AND " +
       "l[1] = '')), " +
       "f AS (SELECT source, doc_id, unnest(list_concat(l, " +
       "list_transform(range(2, len(l) + 1), " +
       "i -> l[i-1] || ' ' || l[i]))) AS ft FROM dd), " +
       "fb AS (SELECT source, doc_id, CAST('0x' || " +
       "substr(md5(ft), 1, 15) AS BIGINT) % 1024 AS bucket FROM f), " +
       "ct AS (SELECT bucket, COUNT(*) AS c_t FROM fb " +
       "WHERE source = 'src0' GROUP BY bucket), " +
       "cr AS (SELECT bucket, COUNT(*) AS c_r FROM fb " +
       "WHERE source <> 'src0' GROUP BY bucket), " +
       "nt AS (SELECT COUNT(*) AS n_t FROM fb " +
       "WHERE source = 'src0'), " +
       "nr AS (SELECT COUNT(*) AS n_r FROM fb " +
       "WHERE source <> 'src0'), " +
       "sc AS (SELECT fb.source, fb.doc_id, " +
       "length(bin(COALESCE(ct.c_t, 0) + 1)) - " +
       "length(bin(COALESCE(cr.c_r, 0) + 1)) + " +
       "length(bin(n_r + 1024)) - length(bin(n_t + 1024)) AS w " +
       "FROM fb LEFT JOIN ct USING (bucket) " +
       "LEFT JOIN cr USING (bucket) CROSS JOIN nt CROSS JOIN nr " +
       "WHERE fb.source <> 'src0'), " +
       "pd AS (SELECT source, doc_id, COUNT(*) AS n_f, " +
       "SUM(w) AS wbits FROM sc GROUP BY source, doc_id) " +
       "SELECT source, COUNT(*) AS n_docs, " +
       "CAST(SUM(n_f) AS BIGINT) AS n_features, " +
       "CAST(SUM(wbits) AS BIGINT) AS sum_wbits, " +
       "CAST(MIN(wbits) AS BIGINT) AS min_wbits, " +
       "CAST(MAX(wbits) AS BIGINT) AS max_wbits, " +
       "COUNT(CASE WHEN wbits >= 0 THEN 1 END) AS n_target_like " +
       "FROM pd GROUP BY source ORDER BY source NULLS FIRST"),
    // q143: same blocking key, same cap filter, same exact
    // levenshtein — DuckDB's and Spark's edit distance agree on
    // integers by definition
    "q143_entity_pairs" ->
      ("WITH r AS (SELECT c_custkey AS id, c_name AS nm, " +
       "c_nationkey || ':' || substr(c_name, 10, 7) AS blk " +
       "FROM customer), " +
       "ok AS (SELECT blk FROM r GROUP BY blk " +
       "HAVING COUNT(*) <= 10000), " +
       "ri AS (SELECT r.* FROM r JOIN ok USING (blk)), " +
       "pr AS (SELECT a.blk, a.id AS id1, b.id AS id2, " +
       "levenshtein(a.nm, b.nm) AS dist FROM ri a JOIN ri b " +
       "ON a.blk = b.blk AND a.id < b.id " +
       "WHERE levenshtein(a.nm, b.nm) <= 1) " +
       "SELECT blk, COUNT(*) AS n_pairs, " +
       "CAST(SUM(dist) AS BIGINT) AS sum_dist, " +
       "CAST(SUM(id1 + id2) AS BIGINT) AS sum_ids " +
       "FROM pr GROUP BY blk ORDER BY blk NULLS FIRST"),
    // q144: DuckDB's nfc_normalize is the independent UAX#15
    // implementation checking the engine's native expression;
    // chr(769) = U+0301 combining acute
    "q144_nfc_census" ->
      ("WITH d AS (SELECT source, text || ' Cafe' || chr(769) " +
       "AS raw FROM documents), " +
       "n AS (SELECT source, raw, nfc_normalize(raw) AS nfc " +
       "FROM d) " +
       "SELECT source, COUNT(*) AS n_docs, " +
       "CAST(SUM(length(raw)) AS BIGINT) AS sum_len_raw, " +
       "CAST(SUM(length(nfc)) AS BIGINT) AS sum_len_nfc, " +
       "COUNT(CASE WHEN length(nfc) <> length(raw) THEN 1 END) " +
       "AS n_changed, MIN(CAST('0x' || substr(md5(nfc), 1, 15) " +
       "AS BIGINT)) AS min_md5_prefix " +
       "FROM n GROUP BY source ORDER BY source NULLS FIRST"),
    "q67_pq_serving" -> pqServingSql,
    "q68_pq_residual" -> pqResidualSql,
    "q69_winnow_against" ->
      (winnowCte(16, 8) +
       ", fpx AS (SELECT doc_id, unnest(fps) AS fp FROM fp), " +
       "fpxn AS (SELECT doc_id, fp FROM fpx WHERE doc_id % 5 = 0), " +
       "fpxo AS (SELECT doc_id, fp FROM fpx WHERE doc_id % 5 <> 0), " +
       "okn AS (SELECT fp FROM fpxn GROUP BY fp HAVING COUNT(*) <= " +
       "10000), " +
       "oko AS (SELECT fp FROM fpxo GROUP BY fp HAVING COUNT(*) <= " +
       "10000), " +
       "keptn AS (SELECT doc_id, fp FROM fpxn WHERE fp IN (SELECT " +
       "fp FROM okn)), " +
       "kepto AS (SELECT doc_id, fp FROM fpxo WHERE fp IN (SELECT " +
       "fp FROM oko)), " +
       "pr AS (SELECT n.doc_id AS new_id, o.doc_id AS old_id, " +
       "COUNT(*) AS shared FROM keptn n JOIN kepto o ON n.fp = " +
       "o.fp GROUP BY 1, 2 HAVING COUNT(*) >= 3) " +
       "SELECT COUNT(*) AS n_pairs, CAST(COALESCE(SUM(shared), 0) " +
       "AS BIGINT) AS sum_shared, CAST(COALESCE(MAX(shared), 0) AS " +
       "BIGINT) AS max_shared, MIN(new_id) AS min_new_id FROM pr"),
    "q21_token_stats" ->
      ("SELECT lang, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS " +
       "total_tokens, MIN(ntok) AS min_tokens, MAX(ntok) AS max_tokens " +
       "FROM (SELECT lang, CAST(array_length(regexp_split_to_array(" +
       "trim(text), '\\s+')) AS BIGINT) AS ntok FROM documents) " +
       "GROUP BY lang ORDER BY lang NULLS FIRST"),
    "q35_subword_stats" ->
      ("SELECT lang, COUNT(*) AS n_docs, CAST(SUM(nsw) AS BIGINT) AS " +
       "total_subwords, MIN(nsw) AS min_subwords, MAX(nsw) AS " +
       "max_subwords FROM (SELECT lang, CAST(len(regexp_extract_all(" +
       "text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS nsw " +
       "FROM documents) GROUP BY lang ORDER BY lang NULLS FIRST"),
    "q22_quality_score" ->
      ("SELECT source, COUNT(*) AS n_docs, CAST(SUM(q) AS DOUBLE) AS " +
       "sum_quality FROM (SELECT source, CAST((1.0 - LEAST(np / " +
       "GREATEST(nc, 1.0) * 10, 1.0)) * LEAST(nt / 100.0, 1.0) * " +
       "LEAST((nc / GREATEST(nt, 1.0)) / 8.0, 1.0) AS DECIMAL(18,6)) " +
       "AS q FROM (SELECT source, CAST(array_length(" +
       "regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS nt, " +
       "CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS " +
       "DOUBLE) AS np, CAST(length(text) AS DOUBLE) AS nc FROM " +
       "documents)) GROUP BY source ORDER BY source NULLS FIRST"),
    "q23_lang_guess" ->
      ("SELECT lang, CASE WHEN lower(text) LIKE '% the %' OR " +
       "lower(text) LIKE '% and %' THEN 'en' WHEN lower(text) LIKE " +
       "'% der %' OR lower(text) LIKE '% und %' THEN 'de' WHEN " +
       "lower(text) LIKE '% el %' OR lower(text) LIKE '% la %' THEN " +
       "'es' WHEN lower(text) LIKE '% le %' OR lower(text) LIKE " +
       "'% et %' THEN 'fr' ELSE 'und' END AS guessed, COUNT(*) AS cnt " +
       "FROM documents GROUP BY lang, guessed " +
       "ORDER BY lang NULLS FIRST, guessed NULLS FIRST"),
    "q44_distinctive_terms" ->
      ("WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(" +
       "trim(text), '\\s+')) AS tok FROM documents), " +
       "tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tk WHERE " +
       "tok <> '' GROUP BY doc_id, tok), " +
       "dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok), " +
       "r AS (SELECT doc_id, tok, tf, df, ROW_NUMBER() OVER " +
       "(PARTITION BY doc_id ORDER BY df, tf DESC, tok) AS rn " +
       "FROM tf JOIN dfq USING (tok)) " +
       "SELECT doc_id, tok, tf, df FROM r WHERE rn = 1 " +
       "ORDER BY doc_id NULLS FIRST"),
    "q42_repetition_stats" ->
      ("WITH tok AS (SELECT doc_id, lang, regexp_split_to_array(" +
       "trim(text), '\\s+') AS t FROM documents), " +
       "g2 AS (SELECT doc_id, unnest([t[i+1] || ' ' || t[i+2] FOR i " +
       "IN range(greatest(array_length(t) - 1, 0))]) AS g FROM tok), " +
       "g3 AS (SELECT doc_id, unnest([t[i+1] || ' ' || t[i+2] || ' ' " +
       "|| t[i+3] FOR i IN range(greatest(array_length(t) - 2, 0))]) " +
       "AS g FROM tok), " +
       "t2 AS (SELECT doc_id, MAX(c) AS top FROM (SELECT doc_id, g, " +
       "COUNT(*) AS c FROM g2 GROUP BY doc_id, g) GROUP BY doc_id), " +
       "t3 AS (SELECT doc_id, MAX(c) AS top FROM (SELECT doc_id, g, " +
       "COUNT(*) AS c FROM g3 GROUP BY doc_id, g) GROUP BY doc_id), " +
       "per AS (SELECT tok.doc_id, lang, " +
       "greatest(array_length(t) - 1, 0) AS n2, " +
       "greatest(array_length(t) - 2, 0) AS n3, " +
       "COALESCE(t2.top, 0) AS top2, COALESCE(t3.top, 0) AS top3 " +
       "FROM tok LEFT JOIN t2 ON tok.doc_id = t2.doc_id " +
       "LEFT JOIN t3 ON tok.doc_id = t3.doc_id) " +
       "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(top2) AS BIGINT) " +
       "AS sum_top2, CAST(SUM(top3) AS BIGINT) AS sum_top3, " +
       "COUNT(CASE WHEN top2 * 5 > n2 OR top3 * 10 > n3 THEN 1 END) " +
       "AS n_flagged FROM per GROUP BY lang " +
       "ORDER BY lang NULLS FIRST"),
    "q43_vocab_topk" ->
      ("SELECT tok, COUNT(*) AS cnt FROM (SELECT unnest(" +
       "regexp_split_to_array(trim(text), '\\s+')) AS tok FROM " +
       "documents) WHERE tok <> '' GROUP BY tok " +
       "ORDER BY cnt DESC, tok NULLS FIRST LIMIT 50"),
    "q24_dedup_exact" ->
      ("SELECT COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique, " +
       "COUNT(*) - COUNT(DISTINCT fp) AS n_dups FROM (SELECT " +
       "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS " +
       "fp FROM documents)"),
    "q25_jaccard_pairs" ->
      (shingleCte +
       ", shd AS (SELECT doc_id, substr(md5(s), 1, 16) AS s FROM sh)" +
       // same document-frequency cap as the engine (stop-shingle
       // removal before the self-join)
       ", kept AS (SELECT * FROM shd WHERE s NOT IN (SELECT s FROM " +
       "shd GROUP BY s HAVING COUNT(*) > 10000))" +
       ", sz AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id)" +
       ", pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) " +
       "AS inter FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < " +
       "b.doc_id GROUP BY 1, 2) " +
       "SELECT COUNT(*) AS n_candidate_pairs, COUNT(CASE WHEN " +
       "inter * 5 >= (sa.n + sb.n - inter) THEN 1 END) AS n_near_dups " +
       "FROM pairs JOIN sz sa ON id1 = sa.doc_id " +
       "JOIN sz sb ON id2 = sb.doc_id"),
    "q36_dedup_clusters" -> dedupClustersSql,
    // q177: full re-cluster of the surviving pairs + stranded
    // singletons — the engine answers with the affected-components
    // retraction
    "q177_retract_clusters" -> retractClustersSql,

    // q178: the full deferred-HITS run over base ∪ delta — the
    // engine answers with the alternating-frontier fold against
    // the persisted raw trace
    "q178_hits_delta" ->
      ("WITH pe AS MATERIALIZED (SELECT 'c' || CAST(o_custkey AS " +
       "VARCHAR) AS src, 's' || CAST(l_suppkey AS VARCHAR) AS " +
       "dst, SUM(CAST(l_quantity AS BIGINT)) AS w FROM orders " +
       "JOIN lineitem ON l_orderkey = o_orderkey GROUP BY 1, 2), " +
       hitsDeferredCtes(
         "SELECT src, dst FROM pe UNION ALL " +
         "SELECT src, dst FROM pe WHERE w % 7 = 0", rounds = 2) +
       " SELECT node, CAST(hub AS BIGINT) AS hub, CAST(auth AS " +
       "BIGINT) AS auth FROM fin ORDER BY auth DESC, hub DESC, " +
       "node ASC NULLS FIRST LIMIT 10"),
    // q179: the oracle re-derives every pixel from the generating
    // formula, replays the exact-integer luma/downsample/hash spec
    // (floor divisions, two's-complement bit-63 packing), and pairs
    // by brute-force bit_count(xor) over all 780 id pairs — fully
    // independent of the engine's BMP encode/decode and banded join
    "q179_image_neardups" ->
      ("WITH ids AS (SELECT range AS id, CASE WHEN (range // 5) % " +
       "2 = 1 THEN 2 ELSE 1 END AS blk, range // 5 AS v, range % 5 " +
       "AS f FROM range(40)), " +
       "pl AS (SELECT id, blk, x.range AS px, y.range AS py, " +
       "CASE WHEN v > 0 AND (x.range // blk) = v % 9 AND (y.range " +
       "// blk) = (v * 3) % 8 THEN (f * 37 + (x.range // blk) * 13 " +
       "+ (y.range // blk) * 7 + 97) % 199 ELSE (f * 37 + (x.range " +
       "// blk) * 13 + (y.range // blk) * 7) % 199 END AS luma " +
       "FROM ids, range(18) x, range(16) y " +
       "WHERE x.range < 9 * blk AND y.range < 8 * blk), " +
       "g9 AS (SELECT id, cx.range AS cx, cy.range AS cy, " +
       "SUM(luma) // COUNT(*) AS g FROM pl, range(9) cx, range(8) " +
       "cy WHERE px >= cx.range * (9 * blk) // 9 AND px < " +
       "(cx.range + 1) * (9 * blk) // 9 AND py >= cy.range * (8 * " +
       "blk) // 8 AND py < (cy.range + 1) * (8 * blk) // 8 " +
       "GROUP BY 1, 2, 3), " +
       "g8 AS (SELECT id, cx.range AS cx, cy.range AS cy, " +
       "SUM(luma) // COUNT(*) AS g FROM pl, range(8) cx, range(8) " +
       "cy WHERE px >= cx.range * (9 * blk) // 8 AND px < " +
       "(cx.range + 1) * (9 * blk) // 8 AND py >= cy.range * (8 * " +
       "blk) // 8 AND py < (cy.range + 1) * (8 * blk) // 8 " +
       "GROUP BY 1, 2, 3), " +
       "dh AS (SELECT a.id, CAST(SUM(CASE WHEN b.g > a.g THEN " +
       "CASE WHEN a.cy * 8 + a.cx = 63 THEN -9223372036854775807 " +
       "- 1 ELSE (CAST(1 AS BIGINT) << (a.cy * 8 + a.cx)) END " +
       "ELSE 0 END) AS BIGINT) AS dhash FROM g9 a JOIN g9 b ON " +
       "b.id = a.id AND b.cy = a.cy AND b.cx = a.cx + 1 " +
       "WHERE a.cx < 8 GROUP BY a.id), " +
       "av AS (SELECT id, SUM(g) // 64 AS avg FROM g8 GROUP BY id), " +
       "ah AS (SELECT g8.id, CAST(SUM(CASE WHEN g > avg THEN " +
       "CASE WHEN cy * 8 + cx = 63 THEN -9223372036854775807 - 1 " +
       "ELSE (CAST(1 AS BIGINT) << (cy * 8 + cx)) END ELSE 0 END) " +
       "AS BIGINT) AS ahash FROM g8 JOIN av ON av.id = g8.id " +
       "GROUP BY g8.id), " +
       "pairs AS (SELECT p.id AS id1, q.id AS id2, " +
       "CAST(bit_count(xor(p.dhash, q.dhash)) AS BIGINT) AS " +
       "hamming FROM dh p JOIN dh q ON p.id < q.id " +
       "WHERE bit_count(xor(p.dhash, q.dhash)) <= 4) " +
       "SELECT kind, a, b, v FROM (" +
       "SELECT 'h' AS kind, dh.id AS a, dh.dhash AS b, ah.ahash " +
       "AS v FROM dh JOIN ah ON ah.id = dh.id " +
       "UNION ALL SELECT 'p', id1, id2, hamming FROM pairs) " +
       "ORDER BY kind, a, b"),

    // q180: fixture expectations are construction-pinned VALUES
    // (the fixture bytes are hand-assembled constants, q72 style);
    // the corpus sweep re-derives its count from the table
    "q180_exif_pii" ->
      ("SELECT name, has_exif, has_gps, make, model, datetime, " +
       "orientation, gps_after_strip, n FROM (VALUES " +
       "('gps_tagged', TRUE, TRUE, 'Acme', 'Cam 1', " +
       "'2024:01:02 03:04:05', 6, FALSE, CAST(1 AS BIGINT)), " +
       "('clean_exif', TRUE, FALSE, 'Lumen', 'Z9', " +
       "'2023:11:05 10:00:00', 1, FALSE, CAST(1 AS BIGINT)), " +
       "('no_exif', FALSE, FALSE, NULL, NULL, NULL, NULL, FALSE, " +
       "CAST(1 AS BIGINT)) " +
       ") AS v(name, has_exif, has_gps, make, model, datetime, " +
       "orientation, gps_after_strip, n) " +
       "UNION ALL SELECT 'corpus', FALSE, FALSE, NULL, NULL, NULL, " +
       "NULL, FALSE, COUNT(*) FROM documents " +
       "ORDER BY name NULLS FIRST"),

    // q181: the oracle replays the per-window amplitude formula,
    // the energy-gradient fingerprint (two's-complement bit-63
    // packing, q179 style), the exact silence/peak stats (equal
    // 20-sample windows make 'silent' amp < 328 exactly), and the
    // brute-force pair set — fully independent of the engine's WAV
    // assembly, PCM decode and banded join
    "q181_audio_neardups" ->
      ("WITH ids AS (SELECT range AS id, range % 5 AS f, " +
       "range // 5 AS v FROM range(30)), " +
       "win AS (SELECT id, k.range AS k, CASE WHEN v > 0 AND " +
       "k.range = (v * 13) % 65 THEN 0 ELSE ((f * 7919 + k.range * " +
       "104729) % 1889) + 111 END AS amp FROM ids, range(65) k), " +
       "fp AS (SELECT a.id, CAST(SUM(CASE WHEN b.amp > a.amp THEN " +
       "CASE WHEN a.k = 63 THEN -9223372036854775807 - 1 ELSE " +
       "(CAST(1 AS BIGINT) << a.k) END ELSE 0 END) AS BIGINT) AS " +
       "fp FROM win a JOIN win b ON b.id = a.id AND b.k = a.k + 1 " +
       "WHERE a.k < 64 GROUP BY a.id), " +
       "st AS (SELECT id, CAST(MAX(amp) AS BIGINT) AS peak, " +
       "CAST(SUM(CASE WHEN amp < 328 THEN 1 ELSE 0 END) AS BIGINT) " +
       "AS silent FROM win GROUP BY id), " +
       "pairs AS (SELECT p.id AS id1, q.id AS id2, " +
       "CAST(bit_count(xor(p.fp, q.fp)) AS BIGINT) AS hamming " +
       "FROM fp p JOIN fp q ON p.id < q.id " +
       "WHERE bit_count(xor(p.fp, q.fp)) <= 4) " +
       "SELECT kind, a, b, v FROM (" +
       "SELECT 'f' AS kind, id AS a, fp AS b, CAST(1300 AS BIGINT) " +
       "AS v FROM fp " +
       "UNION ALL SELECT 's', st.id, st.peak, st.silent FROM st " +
       "UNION ALL SELECT 'p', id1, id2, hamming FROM pairs " +
       "UNION ALL SELECT 'c', COUNT(*), 0, 0 FROM documents) " +
       "ORDER BY kind, a, b"),

    // q182: the oracle re-derives every frame pixel from the
    // quadratic-residue formula, replays the 9x8 dHash (the grid IS
    // the frame — no downsample; two's-complement bit-63 packing)
    // and the lag-window boundary rule — fully independent of the
    // engine's AVI assembly, container walk and DIB decode
    "q182_video_shots" ->
      ("WITH ids AS (SELECT range AS id, 3 + range % 3 AS seg " +
       "FROM range(6)), " +
       "fr AS (SELECT id, t.range AS t, " +
       "id * 11 + (t.range // seg) * 7 AS seed " +
       "FROM ids, range(12) t), " +
       "px AS (SELECT id, t, i.range AS i, " +
       "((seed + 17 * i.range) * (seed + 17 * i.range)) % 199 AS l " +
       "FROM fr, range(72) i), " +
       "dh AS (SELECT a.id, a.t, CAST(SUM(CASE WHEN b.l > a.l THEN " +
       "CASE WHEN (a.i // 9) * 8 + (a.i % 9) = 63 THEN " +
       "-9223372036854775807 - 1 ELSE (CAST(1 AS BIGINT) << " +
       "((a.i // 9) * 8 + (a.i % 9))) END ELSE 0 END) AS BIGINT) " +
       "AS h FROM px a JOIN px b ON b.id = a.id AND b.t = a.t AND " +
       "b.i = a.i + 1 WHERE a.i % 9 < 8 GROUP BY a.id, a.t), " +
       "bd AS (SELECT c.id, c.t, CAST(bit_count(xor(c.h, p.h)) AS " +
       "BIGINT) AS hm FROM dh c JOIN dh p ON p.id = c.id AND " +
       "p.t = c.t - 1 WHERE bit_count(xor(c.h, p.h)) > 4) " +
       "SELECT kind, a, b, v FROM (" +
       "SELECT 'h' AS kind, id AS a, t AS b, h AS v FROM dh " +
       "UNION ALL SELECT 'b', id, t, hm FROM bd " +
       "UNION ALL SELECT 'c', COUNT(*), 0, 0 FROM documents) " +
       "ORDER BY kind, a, b"),

    // q183: same pixel/hash replay as q182 over the pair-structured
    // seeds, then the shared-distinct-hash pair count brute-forced
    // over all clip pairs — independent of the engine's banded join
    "q183_video_dups" ->
      ("WITH ids AS (SELECT range AS id, range // 2 AS g " +
       "FROM range(8)), " +
       "fr AS (SELECT id, t.range AS t, g * 31 + (t.range // 3) * 7 " +
       "+ CASE WHEN id % 2 = 1 AND t.range // 3 = 0 THEN 997 " +
       "ELSE 0 END AS seed FROM ids, range(12) t), " +
       "px AS (SELECT id, t, i.range AS i, " +
       "((seed + 17 * i.range) * (seed + 17 * i.range)) % 199 AS l " +
       "FROM fr, range(72) i), " +
       "dh AS (SELECT a.id, a.t, CAST(SUM(CASE WHEN b.l > a.l THEN " +
       "CASE WHEN (a.i // 9) * 8 + (a.i % 9) = 63 THEN " +
       "-9223372036854775807 - 1 ELSE (CAST(1 AS BIGINT) << " +
       "((a.i // 9) * 8 + (a.i % 9))) END ELSE 0 END) AS BIGINT) " +
       "AS h FROM px a JOIN px b ON b.id = a.id AND b.t = a.t AND " +
       "b.i = a.i + 1 WHERE a.i % 9 < 8 GROUP BY a.id, a.t), " +
       "dist AS (SELECT DISTINCT id, h FROM dh), " +
       "pairs AS (SELECT a.id AS id1, b.id AS id2, " +
       "CAST(COUNT(*) AS BIGINT) AS sh FROM dist a JOIN dist b ON " +
       "b.h = a.h AND a.id < b.id GROUP BY 1, 2 " +
       "HAVING COUNT(*) >= 3) " +
       "SELECT kind, a, b, v FROM (" +
       "SELECT 'n' AS kind, id AS a, CAST(COUNT(DISTINCT h) AS " +
       "BIGINT) AS b, CAST(COUNT(*) AS BIGINT) AS v FROM dh " +
       "GROUP BY id " +
       "UNION ALL SELECT 'p', id1, id2, sh FROM pairs) " +
       "ORDER BY kind, a, b"),

    // q171: the fold result is DEFINED as the full closure over all
    // pairs — the oracle is exactly q36's replay, and the hash match
    // is the star-collapse equivalence proof on real pairs
    "q171_components_delta" -> dedupClustersSql,
    "q40_lsh_dedup_clusters" ->
      (lshClusterCtes +
       ", sizes AS (SELECT label, COUNT(*) AS sz FROM labels " +
       "GROUP BY label) " +
       "SELECT (SELECT COUNT(*) FROM labels) AS n_clustered_docs, " +
       "(SELECT COUNT(DISTINCT label) FROM labels) AS n_clusters, " +
       "(SELECT MAX(sz) FROM sizes) AS max_cluster_size"),
    "q47_deduplicate" ->
      (lshClusterCtes +
       " SELECT COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS " +
       "sum_ids FROM documents WHERE doc_id NOT IN " +
       "(SELECT id FROM labels WHERE id <> label)"),
    "q37_hash_sample" ->
      ("SELECT source, COUNT(*) AS n_sampled FROM documents " +
       "WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, " +
       "8) AS BIGINT) * 4 < 4294967296 " +
       "GROUP BY source ORDER BY source NULLS FIRST"),
    "q38_contamination" -> contaminationSql,
    // the Bloom prescreen path must reproduce the exact-join result
    "q73_contamination_bloom" -> contaminationSql,
    // q74: the flipped direction — hits counted per CORPUS doc
    // against the distinct bench shingle set
    "q74_decontam_screen" ->
      (shingleCte +
       ", shd AS (SELECT doc_id, substr(md5(s), 1, 16) AS s FROM sh)" +
       ", hv AS (SELECT doc_id, CAST('0x' || substr(md5(CAST(doc_id " +
       "AS VARCHAR)), 1, 8) AS BIGINT) AS h FROM documents)" +
       ", bench AS (SELECT doc_id FROM hv ORDER BY h, doc_id " +
       "LIMIT 20)" +
       ", corpus AS (SELECT doc_id FROM hv WHERE doc_id NOT IN " +
       "(SELECT doc_id FROM bench))" +
       ", bset AS (SELECT DISTINCT s FROM shd JOIN bench " +
       "USING (doc_id))" +
       ", csh AS (SELECT shd.doc_id, s FROM shd JOIN corpus " +
       "USING (doc_id))" +
       ", hits AS (SELECT c.doc_id, COUNT(*) AS n_hits FROM csh c " +
       "JOIN bset USING (s) GROUP BY 1)" +
       ", sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM csh " +
       "GROUP BY 1) " +
       "SELECT COUNT(*) AS n_docs_screened, " +
       "COUNT(CASE WHEN COALESCE(n_hits, 0) > 0 THEN 1 END) AS " +
       "n_flagged, " +
       "CAST(SUM(COALESCE(n_hits, 0)) AS BIGINT) AS total_hits, " +
       "COUNT(CASE WHEN n_hits = n_shingles THEN 1 END) AS " +
       "n_fully_bench " +
       "FROM sizes LEFT JOIN hits USING (doc_id)"),
    // q75: the oracle mirrors the prefix-filtered plan step by step
    // (df ordering, integer ceil, size filter, candidate verify) so
    // every arithmetic choice is pinned cross-engine; completeness of
    // the prefix filter itself is proven against brute force in
    // OperatorsSpec
    "q75_prefix_jaccard" ->
      (shingleCte +
       ", toks AS (SELECT doc_id AS id, substr(md5(s), 1, 16) AS " +
       "tok FROM sh)" +
       ", dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY 1)" +
       ", kept AS (SELECT t.id, t.tok, f.df FROM toks t JOIN dfreq f " +
       "USING (tok) WHERE f.df <= 10000)" +
       ", sizes AS (SELECT id, COUNT(*) AS n FROM kept GROUP BY 1)" +
       ", ranked AS (SELECT k.id, k.tok, s.n, ROW_NUMBER() OVER " +
       "(PARTITION BY k.id ORDER BY k.df, k.tok) AS rn FROM kept k " +
       "JOIN sizes s USING (id))" +
       ", prefix AS (SELECT id, tok, n FROM ranked WHERE rn <= " +
       "n - ((1 * n + 1) // 2) + 1)" +
       ", cands AS (SELECT DISTINCT a.id AS id1, b.id AS id2 FROM " +
       "prefix a JOIN prefix b ON a.tok = b.tok AND a.id < b.id " +
       "AND a.n * 2 >= b.n * 1 AND b.n * 2 >= a.n * 1)" +
       ", inter AS (SELECT c.id1, c.id2, COUNT(*) AS inter FROM " +
       "cands c JOIN kept ta ON c.id1 = ta.id JOIN kept tb ON " +
       "c.id2 = tb.id AND ta.tok = tb.tok GROUP BY 1, 2)" +
       ", pairs AS (SELECT i.id1, i.id2, i.inter, " +
       "sa.n + sb.n - i.inter AS union_n FROM inter i JOIN sizes sa " +
       "ON i.id1 = sa.id JOIN sizes sb ON i.id2 = sb.id WHERE " +
       "i.inter * 2 >= (sa.n + sb.n - i.inter) * 1) " +
       "SELECT COUNT(*) AS n_pairs, CAST(SUM(inter) AS BIGINT) AS " +
       "sum_inter, CAST(SUM(union_n) AS BIGINT) AS sum_union " +
       "FROM pairs"),
    // q81: fixture parameters pinned as literals (the spec derives
    // them from the same bytes); corpus sweep must be all-unknown
    "q81_audio_meta" ->
      ("SELECT name, format, channels, sample_rate, " +
       "bits_per_sample, duration_ms, n FROM (" +
       "SELECT * FROM (VALUES " +
       "('wav_2ch', 'wav', 2, 44100, 16, CAST(500 AS BIGINT), " +
       "CAST(1 AS BIGINT)), " +
       "('flac_2ch', 'flac', 2, 44100, 16, CAST(500 AS BIGINT), " +
       "CAST(1 AS BIGINT)), " +
       "('mp3_sync', 'mp3', 2, 44100, CAST(NULL AS INTEGER), " +
       "CAST(NULL AS BIGINT), CAST(1 AS BIGINT)), " +
       "('ogg_page', 'ogg', CAST(NULL AS INTEGER), " +
       "CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), " +
       "CAST(NULL AS BIGINT), CAST(1 AS BIGINT))) AS " +
       "v(name, format, channels, sample_rate, bits_per_sample, " +
       "duration_ms, n) " +
       "UNION ALL SELECT 'corpus', 'unknown', NULL, NULL, NULL, " +
       "NULL, COUNT(*) FROM documents WHERE text NOT LIKE 'RIFF%' " +
       "AND text NOT LIKE 'fLaC%' AND text NOT LIKE 'OggS%' AND " +
       "text NOT LIKE 'ID3%') " +
       "ORDER BY name NULLS FIRST, format NULLS FIRST"),
    // q82: fixture parameters as literals; chr(26)||'E'||chr(2019)
    // is the UTF-8 decoding of the EBML magic bytes
    "q82_video_meta" ->
      ("SELECT name, format, major_brand, duration_ms, width, " +
       "height, n FROM (" +
       "SELECT * FROM (VALUES " +
       "('mp4_640x360', 'mp4', 'isom', CAST(5000 AS BIGINT), 640, " +
       "360, CAST(1 AS BIGINT)), " +
       "('mkv_magic', 'matroska', CAST(NULL AS VARCHAR), " +
       "CAST(NULL AS BIGINT), CAST(NULL AS INTEGER), " +
       "CAST(NULL AS INTEGER), CAST(1 AS BIGINT))) AS " +
       "v(name, format, major_brand, duration_ms, width, height, n) " +
       "UNION ALL SELECT 'corpus', 'unknown', NULL, NULL, NULL, " +
       "NULL, COUNT(*) FROM documents WHERE " +
       "substr(text, 5, 4) <> 'ftyp' AND text NOT " +
       "LIKE chr(26) || 'E' || chr(2019) || '%') " +
       "ORDER BY name NULLS FIRST, format NULLS FIRST"),
    // q80: the identical interleave formula, disjoint bit positions
    // summed; epoch day via epoch_us
    "q80_zorder_census" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"(((a >> $i) & 1) << ${2 * i})",
        s"(((b >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      "WITH dims AS (SELECT user_id % 256 AS a, " +
      "(epoch_us(ts) // 86400000000) % 256 AS b FROM events)" +
      s", zs AS (SELECT CAST($terms AS BIGINT) AS z FROM dims) " +
      "SELECT z >> 8 AS bucket, COUNT(*) AS n_events, " +
      "MIN(z) AS min_z, MAX(z) AS max_z FROM zs GROUP BY 1 " +
      "ORDER BY 1 NULLS FIRST"
    },
    // q117: the xy2d walk unrolled, one MATERIALIZED CTE per bit
    // level (rotation state is sequential; materialization stops
    // DuckDB re-inlining the whole prefix per reference)
    "q117_hilbert_census" -> {
      val bits = 8
      val n1 = (1 << bits) - 1
      val sb = new StringBuilder
      sb ++= "WITH h0 AS (SELECT CAST(user_id % 256 AS BIGINT) AS " +
        "x, CAST((epoch_us(ts) // 86400000000) % 256 AS BIGINT) " +
        "AS y, CAST(0 AS BIGINT) AS d FROM events)"
      for (i <- 0 until bits) {
        val s = 1L << (bits - 1 - i)
        sb ++= s", h${i + 1} AS MATERIALIZED (SELECT " +
          s"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN $n1 - y " +
          s"ELSE y END ELSE x END AS x, " +
          s"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN $n1 - x " +
          s"ELSE x END ELSE y END AS y, " +
          s"d + ${s * s} * xor(3 * rx, ry) AS d FROM " +
          s"(SELECT x, y, d, CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 " +
          s"END AS rx, CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END " +
          s"AS ry FROM h$i))"
      }
      sb ++= s" SELECT d >> 8 AS bucket, COUNT(*) AS n_events, " +
        s"MIN(d) AS min_h, MAX(d) AS max_h FROM h$bits GROUP BY 1 " +
        "ORDER BY 1 NULLS FIRST"
      sb.toString
    },
    // q83: pmod over the same md5 hash space as q37
    "q83_hash_split_census" ->
      ("SELECT bucket, COUNT(*) AS n_docs, " +
       "CAST(SUM(array_length(regexp_split_to_array(trim(text), " +
       "'\\s+'))) AS BIGINT) AS n_tokens FROM " +
       "(SELECT CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), " +
       "1, 8) AS BIGINT) % 3 AS bucket, text FROM documents) " +
       "GROUP BY bucket ORDER BY bucket NULLS FIRST"),
    // q84: RANGE window frames by time value — identical semantics
    // in DuckDB; epoch seconds via epoch_us
    "q84_rolling_features" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS tss " +
       "FROM events), " +
       "r AS (SELECT user_id, COUNT(*) OVER (PARTITION BY user_id " +
       "ORDER BY tss RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) " +
       "AS c FROM e) " +
       "SELECT user_id, MAX(c) AS max_burst, COUNT(*) AS n_events " +
       "FROM r GROUP BY user_id ORDER BY user_id NULLS FIRST"),
    // q85: the sketch runs in its exact regime (vocabulary ≤ k), so
    // the oracle is the true per-source token counts
    "q85_heavy_hitters" ->
      ("WITH tk AS (SELECT source, " +
       "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok " +
       "FROM documents), " +
       "c AS (SELECT source, tok, COUNT(*) AS est FROM tk " +
       "WHERE tok <> '' GROUP BY source, tok), " +
       "r AS (SELECT source, tok, est, row_number() OVER " +
       "(PARTITION BY source ORDER BY est DESC, tok) AS rn FROM c) " +
       "SELECT source, tok, est FROM r WHERE rn <= 5 " +
       "ORDER BY source NULLS FIRST, est DESC, tok"),
    // q86: latest row per key, ties broken by event_id — the
    // row_number formulation is the oracle; the engine's
    // max(struct) must pick the identical winner
    "q86_latest_snapshot" ->
      ("SELECT user_id, event_id, event_type, value FROM " +
       "(SELECT user_id, event_id, event_type, value, " +
       "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, " +
       "event_id DESC) AS rn FROM events) WHERE rn = 1 " +
       "ORDER BY user_id NULLS FIRST"),
    "q87_inverted_index" ->
      ("WITH tk AS (SELECT doc_id, " +
       "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok " +
       "FROM documents), " +
       "pd AS (SELECT tok, doc_id, COUNT(*) AS tf FROM tk " +
       "WHERE tok <> '' GROUP BY tok, doc_id), " +
       "r AS (SELECT tok, doc_id, tf, row_number() OVER " +
       "(PARTITION BY tok ORDER BY tf DESC, doc_id) AS rn FROM pd) " +
       "SELECT tok, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS " +
       "tf_total, MAX(CASE WHEN rn = 1 THEN doc_id END) AS " +
       "top_doc FROM r GROUP BY tok ORDER BY tok NULLS FIRST"),
    // q88: 1-based list indexing; range(2, n+1) is end-exclusive,
    // pairing (l[i-1], l[i]) exactly like the engine's 0-based
    // transform
    "q88_pair_counts" ->
      ("WITH d AS (SELECT regexp_split_to_array(trim(text), " +
       "'\\s+') AS l FROM documents), " +
       "p AS (SELECT unnest(list_transform(range(2, len(l) + 1), " +
       "i -> l[i-1] || ' ' || l[i])) AS pair FROM d " +
       "WHERE len(l) >= 2) " +
       "SELECT pair, COUNT(*) AS cnt FROM p GROUP BY pair " +
       "ORDER BY cnt DESC, pair LIMIT 10"),
    // q109: the fixture is cut deterministically from documents
    // (300 smallest doc_ids, sharded doc_id % 3 across JSONL/CSV/
    // YAML), so the merged multi-source verdicts re-derive from the
    // parquet table: numeric-string ranges over the UNION, the q71
    // int ladder, and the exact x.5 float endpoints
    "q109_analyze_multisource" ->
      ("WITH sub AS (SELECT doc_id, " +
       "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS " +
       "BIGINT) AS ntok FROM documents ORDER BY doc_id LIMIT 300), " +
       "ir AS (SELECT 'doc_id' AS column_name, MIN(doc_id) AS mn, " +
       "MAX(doc_id) AS mx FROM sub " +
       "UNION ALL SELECT 'ntok', MIN(ntok), MAX(ntok) FROM sub), " +
       "fmtd AS (SELECT column_name, " +
       "CASE WHEN abs(mn) < 1000 THEN CAST(mn AS VARCHAR) " +
       "WHEN abs(mn) < 1000000 THEN printf('%.1fK', mn / 1000.0) " +
       "ELSE printf('%.1fM', mn / 1000000.0) END AS fmn, " +
       "CASE WHEN abs(mx) < 1000 THEN CAST(mx AS VARCHAR) " +
       "WHEN abs(mx) < 1000000 THEN printf('%.1fK', mx / 1000.0) " +
       "ELSE printf('%.1fM', mx / 1000000.0) END AS fmx FROM ir), " +
       "ints AS (SELECT column_name, 'str of int range=' || fmn || " +
       "'..' || fmx || ' pattern=d' AS inferred FROM fmtd), " +
       "fl AS (SELECT 'score' AS column_name, " +
       "'str of float range=' || CAST(MIN(ntok) AS VARCHAR) || " +
       "'.5..' || CAST(MAX(ntok) AS VARCHAR) || '.5 pattern=f' AS " +
       "inferred FROM sub) " +
       "SELECT column_name, inferred FROM (SELECT * FROM ints " +
       "UNION ALL SELECT * FROM fl) " +
       "ORDER BY column_name NULLS FIRST"),
    // q107: the 6 training rounds unrolled; see bpeSql
    "q107_bpe_train" -> bpeSql(6),
    // q114: 4 training rounds INCLUDING the last apply (w5 = final
    // vocabulary); every corpus word's subword count is len(w5.l)
    "q114_bpe_encode" ->
      (bpeCtes(4, applyAll = true) +
       ", wd AS (SELECT source, " +
       "unnest(regexp_split_to_array(trim(text), '\\s+')) AS word " +
       "FROM documents)" +
       ", wl AS (SELECT source, word FROM wd WHERE word <> '')" +
       ", enc AS (SELECT w.source, CAST(SUM(len(v.l)) AS BIGINT) " +
       "AS sum_subwords FROM wl w JOIN w5 v ON v.wid = w.word " +
       "GROUP BY 1)" +
       ", tot AS (SELECT source, COUNT(*) AS n_docs, " +
       "CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+'))) " +
       "AS BIGINT) AS sum_tokens FROM documents GROUP BY source) " +
       "SELECT tot.source, n_docs, sum_tokens, " +
       "COALESCE(sum_subwords, 0) AS sum_subwords FROM tot " +
       "LEFT JOIN enc ON tot.source = enc.source " +
       "ORDER BY tot.source NULLS FIRST"),
    // q108: the same integer-threshold rules per document (q42's
    // n-gram CTE pattern for the repetition rule), aggregated to
    // per-source pass counts (per-doc flag chain shared with q139)
    "q108_quality_census" ->
      (qualityDocCtes +
       " SELECT source, COUNT(*) AS n_docs, " +
       "COUNT(CASE WHEN wc_ok THEN 1 END) AS n_wc_ok, " +
       "COUNT(CASE WHEN mwl_ok THEN 1 END) AS n_mwl_ok, " +
       "COUNT(CASE WHEN sym_ok THEN 1 END) AS n_sym_ok, " +
       "COUNT(CASE WHEN bullet_ok THEN 1 END) AS n_bullet_ok, " +
       "COUNT(CASE WHEN ell_ok THEN 1 END) AS n_ell_ok, " +
       "COUNT(CASE WHEN alpha_ok THEN 1 END) AS n_alpha_ok, " +
       "COUNT(CASE WHEN stop_ok THEN 1 END) AS n_stop_ok, " +
       "COUNT(CASE WHEN rep_ok THEN 1 END) AS n_rep_ok, " +
       "COUNT(CASE WHEN curly_ok THEN 1 END) AS n_curly_ok, " +
       "COUNT(CASE WHEN policy_ok THEN 1 END) AS n_policy_ok, " +
       "COUNT(CASE WHEN wc_ok AND mwl_ok AND sym_ok AND bullet_ok " +
       "AND ell_ok AND alpha_ok AND stop_ok AND rep_ok AND " +
       "curly_ok AND policy_ok THEN 1 END) AS n_keep " +
       "FROM flq GROUP BY source ORDER BY source NULLS FIRST"),
    // q139: the SAME per-doc flag chain + the q127 classifier —
    // per-source top-3 by (rules passed, classifier score, id)
    "q139_curation_shortlist" ->
      (qualityDocCtes +
       ", scq AS (SELECT doc_id, CAST(list_sum([((CAST('0x' || " +
       "substr(md5(t), 1, 8) AS BIGINT) % 64) * 2654435761) % " +
       "2001 - 1000 FOR t IN regexp_split_to_array(trim(text), " +
       "'\\s+')]) AS BIGINT) AS score FROM documents), " +
       "jq AS (SELECT f.source, f.doc_id, CAST(" +
       "CAST(wc_ok AS INT) + CAST(mwl_ok AS INT) + " +
       "CAST(sym_ok AS INT) + CAST(bullet_ok AS INT) + " +
       "CAST(ell_ok AS INT) + CAST(alpha_ok AS INT) + " +
       "CAST(stop_ok AS INT) + CAST(rep_ok AS INT) + " +
       "CAST(curly_ok AS INT) + CAST(policy_ok AS INT) AS BIGINT) " +
       "AS n_pass, scq.score FROM flq f JOIN scq USING (doc_id)), " +
       "rq AS (SELECT source, doc_id, n_pass, score, ROW_NUMBER() " +
       "OVER (PARTITION BY source ORDER BY n_pass DESC, score " +
       "DESC, doc_id) AS rn FROM jq) " +
       "SELECT source, CAST(rn AS BIGINT) AS rank, doc_id, " +
       "n_pass, score FROM rq WHERE rn <= 3 " +
       "ORDER BY source NULLS FIRST, rank NULLS FIRST"),
    // q89: same md5 hash space as q37 (h % 700 so the %20/%7/%25
    // slices share one hash), same v2 derivation, FULL OUTER join
    // on the id comparing md5 content fingerprints
    "q89_corpus_delta" ->
      ("WITH h AS (SELECT doc_id, text, CAST('0x' || " +
       "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) " +
       "% 700 AS h7 FROM documents), " +
       "v1 AS (SELECT doc_id, md5(text) AS fp FROM documents), " +
       "v2 AS (SELECT doc_id, md5(CASE WHEN h7 % 7 = 0 THEN " +
       "text || ' v2' ELSE text END) AS fp FROM h " +
       "WHERE h7 % 20 <> 0 " +
       "UNION ALL SELECT doc_id + 10000000, md5(text) FROM h " +
       "WHERE h7 % 25 = 0), " +
       "j AS (SELECT v1.fp AS ofp, v2.fp AS nfp FROM v1 " +
       "FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id) " +
       "SELECT CASE WHEN ofp IS NULL THEN 'added' " +
       "WHEN nfp IS NULL THEN 'removed' " +
       "WHEN ofp = nfp THEN 'unchanged' ELSE 'changed' END AS " +
       "status, COUNT(*) AS n FROM j GROUP BY status " +
       "ORDER BY status NULLS FIRST"),
    // q90: the exact-integer quantization ladder — qx = round(x·2²⁵)
    // (exact: a float times a power of two), per-dim [qmn, qmx],
    // code = round-half-up in pure BIGINT (// is floor; operands are
    // non-negative), bound gate in the same integers
    "q90_sq_census" ->
      ("WITH qc AS (SELECT vec_id, i AS dim, CAST(round(CAST(x AS " +
       "DOUBLE) * 33554432.0) AS BIGINT) AS qx FROM (SELECT " +
       "vec_id, generate_subscripts(embedding, 1) AS i, " +
       "unnest(embedding) AS x FROM embeddings)), " +
       "st AS (SELECT dim, MIN(qx) AS qmn, MAX(qx) AS qmx FROM qc " +
       "GROUP BY dim), " +
       "cd AS (SELECT vec_id, qx, qmn, qmx - qmn AS span, " +
       "CASE WHEN qmx = qmn THEN 0 ELSE ((qx - qmn) * 510 + " +
       "(qmx - qmn)) // ((qmx - qmn) * 2) END AS code " +
       "FROM qc JOIN st USING (dim)), " +
       "g AS (SELECT vec_id, code, CASE WHEN span = 0 THEN TRUE " +
       "ELSE abs((qx - qmn) * 510 - code * span * 2) <= span END " +
       "AS ok FROM cd) " +
       "SELECT label, COUNT(*) AS n_comps, CAST(SUM(code) AS " +
       "BIGINT) AS sum_codes, bool_and(ok) AS bounds_ok FROM g " +
       "JOIN embeddings USING (vec_id) GROUP BY label " +
       "ORDER BY label NULLS FIRST"),
    // q92: identical bigram extraction via DuckDB list lambdas; the
    // LEFT JOIN marker mirrors the engine's broadcast screen
    "q92_ngram_novelty" ->
      ("WITH d AS (SELECT source, regexp_split_to_array(trim(text), " +
       "'\\s+') AS l FROM documents), " +
       "p AS (SELECT source, unnest(list_transform(range(2, " +
       "len(l) + 1), i -> l[i-1] || ' ' || l[i])) AS bg FROM d " +
       "WHERE len(l) >= 2), " +
       "ref AS (SELECT DISTINCT bg FROM p WHERE source = 'src0'), " +
       "pr AS (SELECT p.source, p.bg, ref.bg IS NOT NULL AS hit " +
       "FROM p LEFT JOIN ref ON p.bg = ref.bg " +
       "WHERE p.source <> 'src0') " +
       "SELECT source, COUNT(*) AS n_bigrams, " +
       "COUNT(CASE WHEN NOT hit THEN 1 END) AS n_novel, " +
       "COUNT(DISTINCT CASE WHEN NOT hit THEN bg END) AS " +
       "n_novel_distinct FROM pr GROUP BY source " +
       "ORDER BY source NULLS FIRST"),
    // q93: exact daily uniques; the engine's HLL++ estimate only
    // surfaces through the users_ok gate, pinned TRUE
    "q93_daily_distinct" ->
      ("SELECT epoch_us(ts) // 86400000000 AS day, " +
       "COUNT(*) AS n_events, " +
       "COUNT(DISTINCT user_id) AS exact_users, " +
       "TRUE AS users_ok FROM events GROUP BY day " +
       "ORDER BY day NULLS FIRST"),
    // q103: identical 8-gram digest ladder via DuckDB list slicing
    // (1-based l[i:i+7] = the engine's 0-based slice(l, i+1, 8)),
    // the same lag/running-sum run merge
    // q140: q103's digest ladder, the min-(id1,id2) repeated pair,
    // then diagonal runs over the pair's matched gram positions
    "q140_shared_spans" ->
      ("WITH d AS (SELECT doc_id, regexp_split_to_array(trim(" +
       "text), '\\s+') AS l FROM documents), " +
       "g AS (SELECT doc_id, i - 1 AS pos, " +
       "md5(array_to_string(l[i:i+7], ' ')) AS gram FROM " +
       "(SELECT doc_id, l, unnest(range(1, len(l) - 8 + 2)) AS i " +
       "FROM d WHERE len(l) >= 8)), " +
       "rep AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT " +
       "doc_id) AS df FROM g GROUP BY gram) WHERE df >= 2 AND " +
       "df <= 1000), " +
       "rg AS (SELECT g.doc_id, g.pos, g.gram FROM g JOIN rep " +
       "USING (gram)), " +
       "pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM " +
       "(SELECT DISTINCT doc_id, gram FROM rg) a JOIN " +
       "(SELECT DISTINCT doc_id, gram FROM rg) b ON a.gram = " +
       "b.gram AND a.doc_id < b.doc_id ORDER BY 1, 2 LIMIT 1), " +
       "ga AS (SELECT gram, pos AS p1 FROM g, pr WHERE " +
       "g.doc_id = pr.id1), " +
       "gb AS (SELECT gram, pos AS p2 FROM g, pr WHERE " +
       "g.doc_id = pr.id2), " +
       "mm AS (SELECT p1, p2, p1 - p2 AS diag FROM ga JOIN gb " +
       "USING (gram)), " +
       "rn AS (SELECT p1, p2, diag, CASE WHEN p1 - LAG(p1) OVER " +
       "(PARTITION BY diag ORDER BY p1) = 1 THEN 0 ELSE 1 END AS " +
       "nw FROM mm), " +
       "rr AS (SELECT p1, p2, diag, SUM(nw) OVER (PARTITION BY " +
       "diag ORDER BY p1 ROWS UNBOUNDED PRECEDING) AS run FROM " +
       "rn) " +
       "SELECT pr.id1, pr.id2, CAST(MIN(p1) AS BIGINT) AS " +
       "start1, CAST(MIN(p2) AS BIGINT) AS start2, " +
       "CAST(MAX(p1) - MIN(p1) + 8 AS BIGINT) AS len_tokens " +
       "FROM rr, pr GROUP BY diag, run, pr.id1, pr.id2 " +
       "ORDER BY start1 NULLS FIRST, start2 NULLS FIRST"),
    "q103_repeated_substrings" ->
      ("WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), " +
       "'\\s+') AS l FROM documents), " +
       "g AS (SELECT doc_id, i - 1 AS pos, " +
       "md5(array_to_string(l[i:i+7], ' ')) AS gram FROM " +
       "(SELECT doc_id, l, unnest(range(1, len(l) - 8 + 2)) AS i " +
       "FROM d WHERE len(l) >= 8)), " +
       "rep AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT " +
       "doc_id) AS df FROM g GROUP BY gram) WHERE df >= 2), " +
       "m AS (SELECT doc_id, pos FROM g JOIN rep USING (gram)), " +
       "r AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER " +
       "(PARTITION BY doc_id ORDER BY pos) = 1 THEN 0 ELSE 1 END " +
       "AS nw FROM m), " +
       "r2 AS (SELECT doc_id, pos, SUM(nw) OVER (PARTITION BY " +
       "doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run " +
       "FROM r), " +
       "runs AS (SELECT doc_id, run, MAX(pos) - MIN(pos) + 8 AS " +
       "len FROM r2 GROUP BY doc_id, run) " +
       "SELECT COUNT(*) AS n_runs, COUNT(DISTINCT doc_id) AS " +
       "n_docs_with_repeats, CAST(MAX(len) AS BIGINT) AS " +
       "max_run_tokens, CAST(SUM(len) AS BIGINT) AS " +
       "sum_run_tokens FROM runs"),
    // q106: the oracle pins exact byte totals and the coverage /
    // chunk-count gates TRUE — chunk boundaries themselves are not
    // SQL-expressible (stateful scan), so they are spec-pinned
    "q106_cdc_chunks" ->
      ("SELECT source, COUNT(*) AS n_docs, " +
       "CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes, " +
       "TRUE AS coverage_ok, TRUE AS bounds_ok FROM documents " +
       "GROUP BY source ORDER BY source NULLS FIRST"),
    // q105: the q104 removal chain, the q79 redaction fold over the
    // cleaned text, a >= 20-token floor, then the q78 HUGEINT
    // token-budget predicate — one linear CTE replay of the whole
    // composition
    "q105_release_pipeline" -> {
      val pats = graft.functions.TextFunctions.PiiPatterns.toMap
      val redacted = graft.functions.TextFunctions.PiiRedactOrder
        .foldLeft("ct") { (acc, name) =>
          val tag = graft.functions.TextFunctions.PiiTags(name)
          s"regexp_replace($acc, '${pats(name)}', '$tag', 'g')"
        }
      "WITH d AS (SELECT doc_id, source, " +
      "regexp_split_to_array(trim(text), '\\s+') AS l FROM " +
      "documents), " +
      "g AS (SELECT doc_id, i - 1 AS pos, " +
      "md5(array_to_string(l[i:i+7], ' ')) AS gram FROM " +
      "(SELECT doc_id, l, unnest(range(1, len(l) - 8 + 2)) AS i " +
      "FROM d WHERE len(l) >= 8)), " +
      "rep AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT " +
      "doc_id) AS df FROM g GROUP BY gram) WHERE df >= 2), " +
      "m AS (SELECT doc_id, pos FROM g JOIN rep USING (gram)), " +
      "r AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER " +
      "(PARTITION BY doc_id ORDER BY pos) = 1 THEN 0 ELSE 1 END " +
      "AS nw FROM m), " +
      "r2 AS (SELECT doc_id, pos, SUM(nw) OVER (PARTITION BY " +
      "doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run " +
      "FROM r), " +
      "runs AS (SELECT doc_id, run, MIN(pos) AS start, " +
      "MAX(pos) - MIN(pos) + 8 AS len FROM r2 GROUP BY doc_id, " +
      "run), " +
      "cov AS (SELECT DISTINCT doc_id, unnest(range(start, " +
      "start + len)) AS pos FROM runs), " +
      "toks AS (SELECT doc_id, i - 1 AS pos, l[i] AS tok FROM " +
      "(SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i " +
      "FROM d)), " +
      "kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t LEFT " +
      "JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos " +
      "WHERE c.pos IS NULL), " +
      "clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) " +
      "AS ct FROM kept GROUP BY doc_id), " +
      "j AS (SELECT d.doc_id, d.source, COALESCE(c.ct, '') AS ct " +
      "FROM d LEFT JOIN clean c USING (doc_id)), " +
      s"red AS (SELECT doc_id, source, $redacted AS rt FROM j), " +
      "nt AS (SELECT doc_id, source, rt, " +
      "CAST(array_length(regexp_split_to_array(trim(rt), " +
      "'\\s+')) AS BIGINT) AS ntok, " +
      "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) " +
      "AS BIGINT) AS h FROM red), " +
      "f AS (SELECT * FROM nt WHERE ntok >= 20), " +
      "tot AS (SELECT source, SUM(ntok) AS total FROM f " +
      "GROUP BY source), " +
      "k2 AS (SELECT f.* FROM f JOIN tot USING (source) WHERE " +
      "CAST(h AS HUGEINT) * CAST(total AS HUGEINT) < " +
      "CAST(4000 AS HUGEINT) * CAST(4294967296 AS HUGEINT)) " +
      "SELECT source, COUNT(*) AS n_docs, CAST(SUM(ntok) AS " +
      "BIGINT) AS n_tokens, CAST(SUM(LENGTH(rt)) AS BIGINT) AS " +
      "sum_len FROM k2 GROUP BY source ORDER BY source NULLS FIRST"
    },
    // q104: q103's run ladder + distinct exploded cover, left-anti
    // kept tokens, ORDER BY pos reassembly; normalized originals
    // via array_to_string over the same token split
    "q104_remove_repeats" ->
      ("WITH d AS (SELECT doc_id, source, " +
       "regexp_split_to_array(trim(text), '\\s+') AS l FROM " +
       "documents), " +
       "g AS (SELECT doc_id, i - 1 AS pos, " +
       "md5(array_to_string(l[i:i+7], ' ')) AS gram FROM " +
       "(SELECT doc_id, l, unnest(range(1, len(l) - 8 + 2)) AS i " +
       "FROM d WHERE len(l) >= 8)), " +
       "rep AS (SELECT gram FROM (SELECT gram, COUNT(DISTINCT " +
       "doc_id) AS df FROM g GROUP BY gram) WHERE df >= 2), " +
       "m AS (SELECT doc_id, pos FROM g JOIN rep USING (gram)), " +
       "r AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER " +
       "(PARTITION BY doc_id ORDER BY pos) = 1 THEN 0 ELSE 1 END " +
       "AS nw FROM m), " +
       "r2 AS (SELECT doc_id, pos, SUM(nw) OVER (PARTITION BY " +
       "doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS run " +
       "FROM r), " +
       "runs AS (SELECT doc_id, run, MIN(pos) AS start, " +
       "MAX(pos) - MIN(pos) + 8 AS len FROM r2 GROUP BY doc_id, " +
       "run), " +
       "cov AS (SELECT DISTINCT doc_id, unnest(range(start, " +
       "start + len)) AS pos FROM runs), " +
       "toks AS (SELECT doc_id, i - 1 AS pos, l[i] AS tok FROM " +
       "(SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i " +
       "FROM d)), " +
       "kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t LEFT " +
       "JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos " +
       "WHERE c.pos IS NULL), " +
       "clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) " +
       "AS ct FROM kept GROUP BY doc_id), " +
       "j AS (SELECT d.source, COALESCE(c.ct, '') AS ct, " +
       "array_to_string(d.l, ' ') AS norm FROM d LEFT JOIN clean c " +
       "USING (doc_id)) " +
       "SELECT source, COUNT(*) AS n_docs, " +
       "COUNT(CASE WHEN ct <> norm THEN 1 END) AS n_changed, " +
       "CAST(SUM(LENGTH(ct)) AS BIGINT) AS sum_len_clean FROM j " +
       "GROUP BY source ORDER BY source NULLS FIRST"),
    // q101: the q32 frame extraction (ASCII text, so VARCHAR substr
    // == byte slicing), md5 digests as frame identity
    "q101_boilerplate" ->
      ("WITH f AS (SELECT doc_id, substr(text, off, 64) AS frame " +
       "FROM (SELECT doc_id, text, unnest(range(1, " +
       "greatest(length(text) - 63, 1) + 1, 128)) AS off FROM " +
       "documents)), " +
       "pf AS (SELECT md5(frame) AS fp, COUNT(DISTINCT doc_id) AS " +
       "docfreq FROM f GROUP BY md5(frame)) " +
       "SELECT (SELECT COUNT(*) FROM pf) AS n_distinct_frames, " +
       "(SELECT COUNT(CASE WHEN docfreq >= 2 THEN 1 END) FROM pf) " +
       "AS n_boilerplate_frames, " +
       "(SELECT COUNT(DISTINCT doc_id) FROM f WHERE md5(frame) IN " +
       "(SELECT fp FROM pf WHERE docfreq >= 2)) AS n_docs_affected"),
    // q102: same md5 hash space, least(ntok, 100)/100 keep rate
    "q102_weighted_sample" ->
      ("WITH nt AS (SELECT doc_id, source, " +
       "CAST(array_length(regexp_split_to_array(trim(text), " +
       "'\\s+')) AS BIGINT) AS ntok, " +
       "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) " +
       "AS BIGINT) AS h FROM documents) " +
       "SELECT source, COUNT(*) AS n_docs, CAST(SUM(ntok) AS " +
       "BIGINT) AS n_tokens FROM nt WHERE h * 100 < " +
       "least(ntok, 100) * 4294967296 GROUP BY source " +
       "ORDER BY source NULLS FIRST"),
    // q100: the same md5 hash halves; HUGEINT cross-multiplication
    // mirrors the engine's DECIMAL(38,0) mean compare
    "q100_profile_drift" ->
      ("WITH x AS (SELECT source, CAST('0x' || " +
       "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 " +
       "AS h, CAST(array_length(regexp_split_to_array(trim(text), " +
       "'\\s+')) AS BIGINT) AS ntok FROM documents), " +
       "g AS (SELECT source, " +
       "COUNT(CASE WHEN h = 0 THEN 1 END) AS n_a, " +
       "COUNT(CASE WHEN h <> 0 THEN 1 END) AS n_b, " +
       "SUM(CASE WHEN h = 0 THEN ntok ELSE 0 END) AS sum_a, " +
       "SUM(CASE WHEN h <> 0 THEN ntok ELSE 0 END) AS sum_b " +
       "FROM x GROUP BY source) " +
       "SELECT source, n_a, n_b, " +
       "abs(n_a - n_b) * 100 <= n_b * 10 AS balance_ok, " +
       "abs(CAST(sum_a AS HUGEINT) * CAST(n_b AS HUGEINT) - " +
       "CAST(sum_b AS HUGEINT) * CAST(n_a AS HUGEINT)) * 100 <= " +
       "CAST(sum_b AS HUGEINT) * CAST(n_a AS HUGEINT) * 10 AS " +
       "mean_tok_ok FROM g ORDER BY source NULLS FIRST"),
    // q99: the engine's GK boundaries are partitioning-dependent
    // within their rank-error bound, so the oracle pins the exact
    // total, the bucket count, and the equi-depth PROPERTY
    "q99_equidepth" ->
      ("SELECT CAST(COUNT(*) AS BIGINT) AS n_total, " +
       "10 AS n_buckets, TRUE AS depth_ok FROM lineitem"),
    // q96: the same hash slices (630 = lcm(7,9,10)), window-latest
    // change per key, merge logic as CASE over the full-outer join
    "q96_apply_changelog" ->
      ("WITH h AS (SELECT *, CAST('0x' || " +
       "substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) AS BIGINT) " +
       "% 630 AS hh FROM customer), " +
       "chg AS (" +
       "SELECT c_custkey, c_acctbal + 50.0 AS bal, c_mktsegment " +
       "AS seg, 1 AS ts, 'upsert' AS op FROM h WHERE hh % 7 = 0 " +
       "UNION ALL SELECT c_custkey, c_acctbal + 100.0, " +
       "c_mktsegment, 2, 'upsert' FROM h WHERE hh % 7 = 0 " +
       "UNION ALL SELECT c_custkey, c_acctbal, c_mktsegment, 3, " +
       "'delete' FROM h WHERE hh % 10 = 0 " +
       "UNION ALL SELECT c_custkey + 1000000, 42.0, 'NEW', 1, " +
       "'upsert' FROM h WHERE hh % 9 = 0), " +
       "latest AS (SELECT * FROM (SELECT *, row_number() OVER " +
       "(PARTITION BY c_custkey ORDER BY ts DESC) AS rn FROM chg) " +
       "WHERE rn = 1), " +
       "m AS (SELECT CASE WHEN l.op = 'upsert' THEN l.bal ELSE " +
       "s.c_acctbal END AS bal, CASE WHEN l.op = 'upsert' THEN " +
       "l.seg ELSE s.c_mktsegment END AS seg, l.op AS op FROM " +
       "customer s FULL OUTER JOIN latest l ON s.c_custkey = " +
       "l.c_custkey) " +
       "SELECT seg AS c_mktsegment, COUNT(*) AS n, " +
       "CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS " +
       "sum_acctbal FROM m WHERE op IS NULL OR op <> 'delete' " +
       "GROUP BY seg ORDER BY seg NULLS FIRST"),
    "q97_rollup" ->
      ("SELECT epoch_us(ts) // 86400000000 AS day, event_type, " +
       "COUNT(*) AS n FROM events GROUP BY ROLLUP(day, event_type) " +
       "ORDER BY day NULLS FIRST, event_type NULLS FIRST"),
    "q98_pivot" ->
      ("SELECT epoch_us(ts) // 86400000000 AS day, " +
       "COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click, " +
       "COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error, " +
       "COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS " +
       "purchase, " +
       "COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS " +
       "signup, " +
       "COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view " +
       "FROM events GROUP BY day ORDER BY day NULLS FIRST"),
    "q94_funnel" ->
      ("WITH f AS (SELECT user_id, event_type, ts, " +
       "MIN(CASE WHEN event_type = 'signup' THEN ts END) OVER " +
       "(PARTITION BY user_id) AS fs FROM events) " +
       "SELECT COUNT(DISTINCT CASE WHEN fs IS NOT NULL THEN " +
       "user_id END) AS n_users_signup, " +
       "COUNT(DISTINCT CASE WHEN event_type = 'purchase' AND " +
       "ts >= fs THEN user_id END) AS n_users_converted, " +
       "COUNT(CASE WHEN event_type = 'purchase' AND ts >= fs " +
       "THEN 1 END) AS n_purchases_after FROM f"),
    "q95_retention" ->
      ("WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // " +
       "86400000000 AS day FROM events), " +
       "f AS (SELECT user_id, MIN(day) AS cohort FROM ud " +
       "GROUP BY user_id) " +
       "SELECT cohort, day - cohort AS day_offset, " +
       "COUNT(DISTINCT ud.user_id) AS n_users FROM ud " +
       "JOIN f USING (user_id) GROUP BY cohort, day_offset " +
       "ORDER BY cohort NULLS FIRST, day_offset"),
    // q91: the salted join IS the plain inner join — the oracle
    // runs the unsalted form
    "q91_salted_join" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_events, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS " +
       "sum_value FROM events JOIN customer ON user_id = c_custkey " +
       "GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST"),
    // q79: the same pattern constants as the Spark side, nested in
    // PiiRedactOrder; 'g' flag = Spark's replace-all default
    "q79_pii_redact" -> {
      val pats = graft.functions.TextFunctions.PiiPatterns.toMap
      val redacted = graft.functions.TextFunctions.PiiRedactOrder
        .foldLeft("text") { (acc, name) =>
          val tag = graft.functions.TextFunctions.PiiTags(name)
          s"regexp_replace($acc, '${pats(name)}', '$tag', 'g')"
        }
      s"WITH red AS (SELECT source, text, $redacted AS redacted " +
      "FROM documents) " +
      "SELECT source, COUNT(*) AS n_docs, " +
      "COUNT(CASE WHEN redacted <> text THEN 1 END) AS n_changed, " +
      "CAST(SUM(LENGTH(redacted)) AS BIGINT) AS sum_len_after " +
      "FROM red GROUP BY source ORDER BY source NULLS FIRST"
    },
    // q78: same md5 hash-space predicate as q37, cutoff scaled by the
    // group's token total; HUGEINT arithmetic mirrors the DECIMAL(38)
    // compare
    "q78_token_budget" ->
      ("WITH nt AS (SELECT doc_id, source, " +
       "CAST(array_length(regexp_split_to_array(trim(text), " +
       "'\\s+')) AS BIGINT) AS ntok, " +
       "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS " +
       "BIGINT) AS h FROM documents)" +
       ", tot AS (SELECT source, SUM(ntok) AS total FROM nt " +
       "GROUP BY 1)" +
       ", kept AS (SELECT nt.* FROM nt JOIN tot USING (source) " +
       "WHERE CAST(h AS HUGEINT) * CAST(total AS HUGEINT) < " +
       "CAST(5000 AS HUGEINT) * CAST(4294967296 AS HUGEINT)) " +
       "SELECT source, COUNT(*) AS n_docs, CAST(SUM(ntok) AS " +
       "BIGINT) AS n_tokens FROM kept GROUP BY source " +
       "ORDER BY source NULLS FIRST"),
    // q77: group MinHash signatures from per-shingle salted-md5 mins
    // (the same family as minhashSigCte, grouped by source instead of
    // doc), match-count across group pairs, plus exact distinct-digest
    // inter/union
    "q77_corpus_overlap" -> {
      val mins = (0 until 16).flatMap { salt =>
        (0 until 4).map { slice =>
          val idx = salt * 4 + slice + 1
          s"MIN(substr(md5(s || '#$salt'), ${slice * 8 + 1}, 8)) " +
            s"AS mh$idx"
        }
      }.mkString(", ")
      val matches = (1 to 64).map(i =>
        s"CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      shingleCte +
      ", shsrc AS (SELECT d.source AS g, sh.s FROM sh JOIN " +
      "documents d USING (doc_id))" +
      s", gsig AS (SELECT g, $mins FROM shsrc GROUP BY g)" +
      s", est AS (SELECT a.g AS g1, b.g AS g2, CAST($matches AS " +
      "BIGINT) AS n_match_sig, CAST(64 AS BIGINT) AS n_sig FROM " +
      "gsig a JOIN gsig b ON a.g < b.g)" +
      ", shd AS (SELECT DISTINCT g, substr(md5(s), 1, 16) AS s " +
      "FROM shsrc)" +
      ", sizes AS (SELECT g, COUNT(*) AS n FROM shd GROUP BY 1)" +
      ", inter AS (SELECT x.g AS g1, y.g AS g2, COUNT(*) AS inter " +
      "FROM shd x JOIN shd y ON x.s = y.s AND x.g < y.g " +
      "GROUP BY 1, 2) " +
      "SELECT e.g1, e.g2, e.n_match_sig, e.n_sig, " +
      "COALESCE(i.inter, 0) AS inter, " +
      "sa.n + sb.n - COALESCE(i.inter, 0) AS union_n " +
      "FROM est e LEFT JOIN inter i ON e.g1 = i.g1 AND e.g2 = i.g2 " +
      "JOIN sizes sa ON e.g1 = sa.g JOIN sizes sb ON e.g2 = sb.g " +
      "ORDER BY 1 NULLS FIRST, 2 NULLS FIRST"
    },
    // q76: the exact columns are data-derived; the sketch gates must
    // all read true (a sketch exceeding its tolerance flips one to
    // false and fails the hash)
    "q76_sketch_profile" ->
      ("SELECT source, COUNT(*) AS n_docs, " +
       "CAST(SUM(array_length(regexp_split_to_array(trim(text), " +
       "'\\s+'))) AS BIGINT) AS n_tokens, " +
       "true AS unique_fp_ok, true AS median_tok_ok " +
       "FROM documents GROUP BY source ORDER BY source NULLS FIRST"),
    "q26_minhash_bands" ->
      (shingleCte + minhashSigCte + minhashBandsCte +
       " SELECT band, COUNT(DISTINCT key) AS n_keys, COUNT(*) AS " +
       "n_rows FROM bands WHERE key IS NOT NULL GROUP BY band " +
       "ORDER BY band NULLS FIRST"),
    "q27_simhash" -> {
      // 32-bit SimHash in plain SQL: md5-slice token hash via DuckDB's
      // hex-literal cast, per-bit sign sums, bit reassembly
      val sums = (0 until 32).map(j =>
        s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS s$j")
        .mkString(", ")
      val bits = (0 until 32).map(j =>
        s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      "WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(" +
        "trim(text), '\\s+')) AS tok FROM documents), " +
        "h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS " +
        "BIGINT) AS h FROM tok), " +
        s"b AS (SELECT doc_id, $sums FROM h GROUP BY doc_id), " +
        s"sim AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash " +
        "FROM b) " +
        "SELECT COUNT(*) AS n_docs, COUNT(DISTINCT simhash) AS " +
        "n_distinct FROM sim"
    },
    "q32_media_frames" ->
      // documents are ASCII (octet_length == length verified at every
      // SF), so VARCHAR substr == the engine's byte slicing; sum_f0 is
      // the exact integer sum of each frame's first md5 byte
      ("WITH f AS (SELECT source, text, unnest(range(1, " +
       "greatest(length(text) - 63, 1) + 1, 128)) AS off FROM " +
       "documents), " +
       "fr AS (SELECT source, substr(text, off, 64) AS frame FROM f) " +
       "SELECT source, COUNT(*) AS n_frames, CAST(SUM(CAST('0x' || " +
       "substr(md5(frame), 1, 2) AS INTEGER)) AS BIGINT) AS sum_f0 " +
       "FROM fr GROUP BY source ORDER BY source NULLS FIRST"),
    "q28_cosine_topk" ->
      ("WITH q AS (SELECT embedding AS qv FROM embeddings WHERE " +
       "vec_id = 0), " +
       "e AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * " +
       "33554432.0) AS BIGINT) AS qx, CAST(round(CAST(qv[i] AS " +
       "DOUBLE) * 33554432.0) AS BIGINT) AS qy FROM (SELECT vec_id, " +
       "generate_subscripts(embedding, 1) AS i, unnest(embedding) AS " +
       "x, (SELECT qv FROM q) AS qv FROM embeddings WHERE vec_id <> 0))" +
       ", dots AS (SELECT vec_id, CAST(SUM(qx * qy) AS BIGINT) AS " +
       "dot, CAST(SUM(qx * qx) AS BIGINT) AS na2 FROM e " +
       "GROUP BY vec_id), " +
       "nq AS (SELECT CAST(SUM(qy * qy) AS BIGINT) AS nq2 FROM " +
       "(SELECT CAST(round(CAST(unnest(qv) AS DOUBLE) * 33554432.0) " +
       "AS BIGINT) AS qy FROM q)) " +
       "SELECT vec_id, dot FROM dots, nq " +
       "ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * " +
       "sqrt(CAST(nq2 AS DOUBLE))) DESC, vec_id LIMIT 10"),
    "q29_lsh_buckets" ->
      ("SELECT bucket, COUNT(*) AS n_vectors FROM (" +
       bucketSql(unnestEmb) +
       ") GROUP BY bucket ORDER BY bucket NULLS FIRST"),
    "q39_centroid_stats" ->
      ("WITH c AS (SELECT label, i, CAST(SUM(x) AS BIGINT) AS s " +
       "FROM (SELECT label, generate_subscripts(embedding, 1) AS i, " +
       "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 33554432.0) " +
       "AS BIGINT) AS x FROM embeddings) GROUP BY label, i), " +
       "agg AS (SELECT label, COUNT(*) AS dims, CAST(SUM(abs(s)) AS " +
       "BIGINT) AS l1_q FROM c GROUP BY label), " +
       "n AS (SELECT label, COUNT(*) AS n_vectors FROM embeddings " +
       "GROUP BY label) " +
       "SELECT agg.label, n_vectors, dims, l1_q FROM agg JOIN n " +
       "USING (label) ORDER BY label NULLS FIRST"),
    "q30_cosine_near_dups" ->
      ("WITH eb0 AS (SELECT e.vec_id, e.embedding, b.bucket FROM " +
       "embeddings e JOIN (" + bucketSql(unnestEmb) + ") b ON " +
       "e.vec_id = b.vec_id), " +
       // same per-bucket candidate cap as the engine (degenerate
       // buckets dropped before the pair join)
       "eb AS (SELECT * FROM eb0 WHERE bucket IN (SELECT bucket " +
       "FROM eb0 GROUP BY bucket HAVING COUNT(*) <= 10000)), " +
       "pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2, " +
       "a.embedding AS ea, b.embedding AS eb2 FROM eb a JOIN eb b ON " +
       "a.bucket = b.bucket AND a.vec_id < b.vec_id), " +
       "dots AS (SELECT id1, id2, CAST(SUM(x * y) AS BIGINT) AS dot, " +
       "CAST(SUM(x * x) AS BIGINT) AS na2, CAST(SUM(y * y) AS BIGINT) " +
       "AS nb2 FROM (SELECT id1, id2, CAST(round(CAST(x0 AS DOUBLE) * " +
       "33554432.0) AS BIGINT) AS x, CAST(round(CAST(eb2[i] AS " +
       "DOUBLE) * 33554432.0) AS BIGINT) AS y " +
       "FROM (SELECT id1, id2, generate_subscripts(ea, 1) AS i, " +
       "unnest(ea) AS x0, eb2 FROM pairs)) GROUP BY id1, id2), " +
       "cos AS (SELECT CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS " +
       "DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) AS cosine FROM dots) " +
       "SELECT COUNT(CASE WHEN cosine >= 0.5 THEN 1 END) AS " +
       "n_pairs_05, COUNT(CASE WHEN cosine >= 0.8 THEN 1 END) AS " +
       "n_pairs_08 FROM cos"),
    "q41_ivf_topk" ->
      // centroid scoring in exact integers (HUGEINT products = the
      // engine's DECIMAL(38,0)), probe top-3 labels, then the q28
      // re-rank restricted to probed labels
      ("WITH q AS (SELECT embedding AS qv FROM embeddings WHERE " +
       "vec_id = 0), " +
       "qc AS (SELECT i, CAST(round(CAST(x AS DOUBLE) * 33554432.0) " +
       "AS BIGINT) AS qy FROM (SELECT generate_subscripts(qv, 1) AS " +
       "i, unnest(qv) AS x FROM q)), " +
       "ds AS (SELECT label, i, CAST(SUM(CAST(round(CAST(x AS " +
       "DOUBLE) * 33554432.0) AS BIGINT)) AS BIGINT) AS s FROM " +
       "(SELECT label, generate_subscripts(embedding, 1) AS i, " +
       "unnest(embedding) AS x FROM embeddings) GROUP BY label, i), " +
       "sc AS (SELECT label, SUM(CAST(s AS HUGEINT) * qy) AS dot_c, " +
       "SUM(CAST(s AS HUGEINT) * s) AS s2 FROM ds JOIN qc USING (i) " +
       "GROUP BY label), " +
       "pr AS (SELECT label FROM sc ORDER BY CAST(dot_c AS DOUBLE) / " +
       "sqrt(CAST(s2 AS DOUBLE)) DESC, label LIMIT 3), " +
       "e AS (SELECT vec_id, CAST(round(CAST(x AS DOUBLE) * " +
       "33554432.0) AS BIGINT) AS qx, CAST(round(CAST(qv[i] AS " +
       "DOUBLE) * 33554432.0) AS BIGINT) AS qy FROM (SELECT vec_id, " +
       "generate_subscripts(embedding, 1) AS i, unnest(embedding) AS " +
       "x, (SELECT qv FROM q) AS qv FROM embeddings WHERE vec_id <> " +
       "0 AND label IN (SELECT label FROM pr))), " +
       "dots AS (SELECT vec_id, CAST(SUM(qx * qy) AS BIGINT) AS dot, " +
       "CAST(SUM(qx * qx) AS BIGINT) AS na2 FROM e GROUP BY vec_id), " +
       "nq AS (SELECT CAST(SUM(qy * qy) AS BIGINT) AS nq2 FROM " +
       "(SELECT CAST(round(CAST(unnest(qv) AS DOUBLE) * 33554432.0) " +
       "AS BIGINT) AS qy FROM q)) " +
       "SELECT vec_id, dot FROM dots, nq " +
       "ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * " +
       "sqrt(CAST(nq2 AS DOUBLE))) DESC, vec_id LIMIT 10"),
    "q46_pack_bins" ->
      ("WITH t AS (SELECT doc_id, CAST(array_length(" +
       "regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS " +
       "ntok, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, " +
       "8) AS BIGINT) AS h FROM documents), " +
       "c AS (SELECT h % 4 AS shard, ntok, SUM(ntok) OVER " +
       "(PARTITION BY h % 4 ORDER BY h, doc_id ROWS UNBOUNDED " +
       "PRECEDING) - ntok AS strt FROM t) " +
       "SELECT shard, CAST(strt // 1000 AS BIGINT) AS bin, " +
       "COUNT(*) AS n_docs, " +
       "CAST(SUM(ntok) AS BIGINT) AS sum_tokens FROM c " +
       "GROUP BY shard, bin ORDER BY shard NULLS FIRST, " +
       "bin NULLS FIRST"),
    "q49_typicality" ->
      ("WITH tok AS (SELECT source, unnest(regexp_split_to_array(" +
       "trim(text), '\\s+')) AS t FROM documents), " +
       "st AS (SELECT source, t, COUNT(*) AS c FROM tok " +
       "GROUP BY 1, 2), " +
       "g AS (SELECT source, c, SUM(c) OVER (PARTITION BY t) AS gc " +
       "FROM st) " +
       "SELECT source, CAST(SUM(c * gc) AS BIGINT) AS typicality, " +
       "CAST(SUM(c) AS BIGINT) AS n_tokens FROM g GROUP BY source " +
       "ORDER BY source NULLS FIRST"),
    "q50_pii_scan" ->
      ("SELECT source, " +
       "CAST(SUM(len(regexp_extract_all(text, " +
       "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))) AS " +
       "BIGINT) AS n_emails, " +
       "CAST(SUM(len(regexp_extract_all(text, " +
       "'[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}'))) AS " +
       "BIGINT) AS n_ipv4, " +
       "CAST(SUM(len(regexp_extract_all(text, " +
       "'\\+?[0-9][0-9 -]{7,}[0-9]'))) AS BIGINT) AS n_phones, " +
       "CAST(SUM(len(regexp_extract_all(text, " +
       "'[0-9]{3}-[0-9]{2}-[0-9]{4}'))) AS BIGINT) AS n_ssns " +
       "FROM documents GROUP BY source ORDER BY source NULLS FIRST"),
    "q51_quota_sample" ->
      ("SELECT source, doc_id FROM (SELECT source, doc_id, " +
       "ROW_NUMBER() OVER (PARTITION BY source ORDER BY " +
       "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS " +
       "BIGINT), doc_id) AS rn FROM documents) " +
       "WHERE rn <= 7 ORDER BY source NULLS FIRST, doc_id"),
    "q48_kmeans" -> kmeansSql,
    "q110_semdedup" -> semDedupSql,
    "q111_bm25_topk" -> bm25Sql(Bm25Terms, 25),
    // q116: same day buckets; range(day, day+7) end-exclusive ==
    // sequence(d, d+6) inclusive — each (day,user) pair lands on
    // its 7 target days, trimmed at the data's max day
    "q116_sliding_active" ->
      ("WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, " +
       "user_id, COUNT(*) AS cnt FROM events GROUP BY 1, 2), " +
       "m AS (SELECT MAX(day) AS maxday FROM d), " +
       "e AS (SELECT unnest(range(day, day + 7)) AS tday, " +
       "user_id, cnt FROM d) " +
       "SELECT tday AS day, COUNT(DISTINCT user_id) AS " +
       "active_users, CAST(SUM(cnt) AS BIGINT) AS n_events " +
       "FROM e CROSS JOIN m WHERE tday <= maxday " +
       "GROUP BY 1 ORDER BY day NULLS FIRST"),
    // q115: same integral day buckets (q93's convention), same
    // integer half-life ladder, same BIGINT shift weights; the final
    // /512 is exact in both engines
    "q115_decayed_counts" ->
      ("WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 " +
       "AS day FROM events), " +
       "m AS (SELECT MAX(day) AS maxday FROM d), " +
       "w AS (SELECT event_type, (maxday - day) // 7 AS hl FROM d " +
       "CROSS JOIN m), " +
       "k AS (SELECT event_type, CAST(1 AS BIGINT) << " +
       "CAST(9 - hl AS INT) AS wgt FROM w WHERE hl >= 0 AND " +
       "hl <= 9) " +
       "SELECT event_type AS key, COUNT(*) AS n_events, " +
       "CAST(SUM(wgt) AS BIGINT) AS score_scaled, " +
       "CAST(SUM(wgt) AS DOUBLE) / 512 AS score " +
       "FROM k GROUP BY 1 ORDER BY key NULLS FIRST"),
    // q113: identical row-salted md5 buckets, identical min-of-
    // coalesced-counters — the estimates pin exactly
    "q113_countmin" -> {
      val probes = Bm25Terms :+ "zzz_absent"
      val probeValues = probes.map(t => s"('$t')").mkString(", ")
      "WITH tk AS (SELECT source, tok FROM (SELECT source, " +
      "unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok " +
      "FROM documents) WHERE tok <> ''), " +
      "rb AS (SELECT source, r.i AS row, CAST('0x' || " +
      "substr(md5(CAST(r.i // 4 AS VARCHAR) || ':' || tok), " +
      "CAST((r.i % 4) * 8 + 1 AS INTEGER), 8) AS " +
      "BIGINT) % 64 AS bucket FROM tk, " +
      "(SELECT unnest(range(4)) AS i) r), " +
      "cm AS (SELECT source, row, bucket, CAST(COUNT(*) AS BIGINT) " +
      "AS cnt FROM rb GROUP BY 1, 2, 3), " +
      s"pr AS (SELECT t.term, r.i AS row, CAST('0x' || " +
      "substr(md5(CAST(r.i // 4 AS VARCHAR) || ':' || t.term), " +
      "CAST((r.i % 4) * 8 + 1 AS INTEGER), 8) " +
      "AS BIGINT) % 64 AS bucket FROM " +
      s"(VALUES $probeValues) t(term), " +
      "(SELECT unnest(range(4)) AS i) r), " +
      "g AS (SELECT DISTINCT source FROM tk), " +
      "est AS (SELECT g.source, pr.term, MIN(COALESCE(cm.cnt, 0)) " +
      "AS est FROM g CROSS JOIN pr LEFT JOIN cm ON " +
      "cm.source = g.source AND cm.row = pr.row AND " +
      "cm.bucket = pr.bucket GROUP BY 1, 2), " +
      "ex AS (SELECT source, tok AS term, CAST(COUNT(*) AS BIGINT) " +
      s"AS exact FROM tk WHERE tok IN (${probes.map(t => s"'$t'")
        .mkString(", ")}) GROUP BY 1, 2) " +
      "SELECT est.source, est.term, est.est, " +
      "COALESCE(ex.exact, 0) AS exact, " +
      "est.est >= COALESCE(ex.exact, 0) AS no_undercount " +
      "FROM est LEFT JOIN ex ON est.source = ex.source AND " +
      "est.term = ex.term " +
      "ORDER BY est.source NULLS FIRST, est.term NULLS FIRST"
    },
    "q60_pq_codes" -> pqCodesSql,
    "q61_pq_adc" -> pqAdcSql,
    "q64_ivfpq_topk" -> ivfPqSql,
    "q66_dedup_embeddings" ->
      ("WITH RECURSIVE eb0 AS (SELECT e.vec_id, e.embedding, " +
       "b.bucket FROM embeddings e JOIN (" + bucketSql(unnestEmb) +
       ") b ON e.vec_id = b.vec_id), " +
       "eb AS (SELECT * FROM eb0 WHERE bucket IN (SELECT bucket " +
       "FROM eb0 GROUP BY bucket HAVING COUNT(*) <= 10000)), " +
       "pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2, " +
       "a.embedding AS ea, b.embedding AS eb2 FROM eb a JOIN eb b " +
       "ON a.bucket = b.bucket AND a.vec_id < b.vec_id), " +
       "dots AS (SELECT id1, id2, CAST(SUM(x * y) AS BIGINT) AS " +
       "dot, CAST(SUM(x * x) AS BIGINT) AS na2, CAST(SUM(y * y) " +
       "AS BIGINT) AS nb2 FROM (SELECT id1, id2, " +
       "CAST(round(CAST(x0 AS DOUBLE) * 33554432.0) AS BIGINT) AS " +
       "x, CAST(round(CAST(eb2[i] AS DOUBLE) * 33554432.0) AS " +
       "BIGINT) AS y FROM (SELECT id1, id2, " +
       "generate_subscripts(ea, 1) AS i, unnest(ea) AS x0, eb2 " +
       "FROM pairs)) GROUP BY id1, id2), " +
       "nd AS (SELECT id1, id2 FROM dots WHERE CAST(dot AS " +
       "DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS " +
       "DOUBLE))) >= 0.8), " +
       "edges AS (SELECT id1 AS src, id2 AS dst FROM nd UNION " +
       "SELECT id2, id1 FROM nd), " +
       "nodes AS (SELECT DISTINCT src AS id FROM edges), " +
       "reach(id, r) AS (SELECT id, id FROM nodes UNION SELECT " +
       "reach.id, e.dst FROM reach JOIN edges e ON e.src = " +
       "reach.r), " +
       "labels AS (SELECT id, MIN(r) AS label FROM reach " +
       "GROUP BY id) " +
       "SELECT COUNT(*) AS n_kept, CAST(SUM(vec_id) AS BIGINT) AS " +
       "sum_ids FROM embeddings WHERE vec_id NOT IN " +
       "(SELECT id FROM labels WHERE id <> label)"),
    "q65_curation_pipeline" ->
      (lshClusterCtes +
       ", kept AS (SELECT doc_id, source, text FROM documents " +
       "WHERE doc_id NOT IN (SELECT id FROM labels WHERE id <> " +
       "label))" +
       ", qv AS (SELECT doc_id, source, text FROM (SELECT doc_id, " +
       "source, text, CAST((1.0 - LEAST(np / GREATEST(nc, 1.0) * " +
       "10, 1.0)) * LEAST(nt / 100.0, 1.0) * LEAST((nc / " +
       "GREATEST(nt, 1.0)) / 8.0, 1.0) AS DECIMAL(18,6)) AS q " +
       "FROM (SELECT doc_id, source, text, CAST(array_length(" +
       "regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS " +
       "nt, CAST(length(regexp_replace(text, '[^.!?,;:]', '', " +
       "'g')) AS DOUBLE) AS np, CAST(length(text) AS DOUBLE) AS " +
       "nc FROM kept)) WHERE q >= CAST(0.25 AS DECIMAL(18,6)))" +
       ", mx AS (SELECT doc_id, text FROM (SELECT doc_id, text, " +
       "source, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), " +
       "1, 8) AS BIGINT) AS h FROM qv) WHERE h * (CASE source " +
       "WHEN 'src0' THEN 2 WHEN 'src1' THEN 4 ELSE 8 END) < " +
       "4294967296)" +
       ", tt AS (SELECT doc_id, CAST(array_length(" +
       "regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS " +
       "ntok, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), " +
       "1, 8) AS BIGINT) AS h FROM mx)" +
       ", cc AS (SELECT h % 4 AS shard, ntok, SUM(ntok) OVER " +
       "(PARTITION BY h % 4 ORDER BY h, doc_id ROWS UNBOUNDED " +
       "PRECEDING) - ntok AS strt FROM tt) " +
       "SELECT shard, CAST(strt // 1000 AS BIGINT) AS bin, " +
       "COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS " +
       "sum_tokens FROM cc GROUP BY shard, bin " +
       "ORDER BY shard NULLS FIRST, bin NULLS FIRST"),
    "q63_dedup_against" ->
      (crossSplitCandCtes +
      ", per AS (SELECT new_id, COUNT(*) AS n_old FROM pr GROUP BY " +
      "new_id) " +
      "SELECT COUNT(*) AS n_flagged, CAST(COALESCE(SUM(n_old), 0) " +
      "AS BIGINT) AS total_cands, CAST(COALESCE(MAX(n_old), 0) AS " +
      "BIGINT) AS max_cands FROM per"),
    // q118: pick a probe KNOWN to have matches (the smallest
    // flagged new_id of the q63 hash-split candidates; fall back to
    // the smallest doc_id on a dup-free corpus), then the
    // singleton-probe candidate chain against everything else
    "q118_similar_to" ->
      ("WITH " +
       candBody("", s"$splitHashSql = 0", s"$splitHashSql <> 0") +
       ", probe AS MATERIALIZED (SELECT COALESCE(MIN(new_id), " +
       "(SELECT MIN(doc_id) FROM documents)) AS pid FROM pr), " +
       candBody("p", "doc_id = (SELECT pid FROM probe)",
         "doc_id <> (SELECT pid FROM probe)") +
       " SELECT COUNT(*) AS n_candidates, " +
       "COALESCE(MIN(old_id), -1) AS min_match, " +
       "COALESCE(MAX(old_id), -1) AS max_match, " +
       "CAST(COALESCE(SUM(old_id), 0) AS BIGINT) AS sum_matches " +
       "FROM prp"),
    // q119: the top bigram by (count desc, bigram asc), then match
    // positions per document via the same 0-based comprehension the
    // engine's array filter uses
    "q119_phrase_search" -> phraseOracleSql,
    // q124: the SAME oracle — the posting-join strategy is an
    // alternative physical plan for the identical logical operator,
    // so both gates pin the identical census
    "q124_indexed_phrase" -> phraseOracleSql,
    // q120: the integer-IPF replay — 3 rounds of exact floor-division
    // updates over the (lang, source) cells in HUGEINT (`//` is the
    // same exact floor division the engine computes via a - a mod b)
    "q120_mixture_weights" -> rakeOracleSql,
    // q123: chunk starts are range(0, greatest(n-overlap, 1), step);
    // the same exact-integer census identities replayed per group
    "q123_token_chunks" ->
      ("WITH tok AS MATERIALIZED (SELECT doc_id, source, " +
       "regexp_split_to_array(trim(text), '\\s+') AS t FROM " +
       "documents), " +
       "d AS (SELECT doc_id, source, array_length(t) AS n FROM " +
       "tok), " +
       "ch AS (SELECT doc_id, array_length(t) AS n, " +
       "unnest(range(0, greatest(array_length(t) - 16, 1), 48)) " +
       "AS start FROM tok), " +
       "pd AS (SELECT doc_id, COUNT(*) AS c, " +
       "SUM(least(64, n - start)) AS sum_tok, MAX(start) AS " +
       "max_start FROM ch GROUP BY doc_id) " +
       "SELECT source AS grp, COUNT(*) AS n_docs, " +
       "CAST(SUM(c) AS BIGINT) AS n_chunks, " +
       "CAST(SUM(sum_tok) AS BIGINT) AS sum_chunk_tokens, " +
       "bool_and(d.n - max_start <= 64) AS covered_ok, " +
       "bool_and(sum_tok = d.n + 16 * (c - 1)) AS stitch_ok " +
       "FROM d JOIN pd USING (doc_id) GROUP BY source " +
       "ORDER BY grp NULLS FIRST"),
    // q122: the raking chain, then the exact hash-threshold
    // membership — kept iff hash32(id)*n*scale < w*2^32 in HUGEINT
    "q122_rebalanced_sample" ->
      ("WITH " + rakeCtes + ", kept AS (SELECT d.doc_id, d.lang " +
       "FROM documents d JOIN w3 ON d.lang = w3.row_key AND " +
       "d.source = w3.col_key WHERE CAST(CAST('0x' || " +
       "substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) " +
       "AS HUGEINT) * w3.n * 1000000 < w3.w * 4294967296) " +
       "SELECT lang AS row_key, COUNT(*) AS n_kept, " +
       "CAST(SUM(doc_id) AS BIGINT) AS sum_kept_ids FROM kept " +
       "GROUP BY lang ORDER BY row_key NULLS FIRST"),
    "q128_index_append" -> indexAppendSql,
    "q129_mmr_topk" -> mmrSql,
    "q130_hybrid_rrf" -> hybridRrfSql,
    "q132_hard_negatives" -> hardNegSql,
    "q137_index_drift" -> indexDriftSql,
    // q138: same integer-sqrt + hash-threshold replay
    "q138_temperature_sample" ->
      ("WITH gq AS (SELECT source, COUNT(*) AS n FROM documents " +
       "GROUP BY 1), " +
       "r0q AS (SELECT source, n, CAST(floor(sqrt(CAST(n AS " +
       "DOUBLE))) AS BIGINT) AS r FROM gq), " +
       "riq AS (SELECT source, n, CASE WHEN r*r > n THEN r - 1 " +
       "WHEN (r+1)*(r+1) <= n THEN r + 1 ELSE r END AS r FROM " +
       "r0q) " +
       "SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(d.doc_id) " +
       "AS BIGINT) AS sum_kept_ids FROM documents d JOIN riq ON " +
       "d.source = riq.source WHERE CAST(CAST('0x' || " +
       "substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) " +
       "AS HUGEINT) * riq.n * 1 < CAST(4294967296 AS HUGEINT) * " +
       "3 * riq.r GROUP BY d.source ORDER BY d.source NULLS " +
       "FIRST"),
    "q135_star_join" ->
      ("SELECT r_name, COUNT(*) AS n_items, " +
       "CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS " +
       "BIGINT) AS sum_qty_c, " +
       "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * " +
       "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS " +
       "BIGINT) AS rev_c " +
       "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "GROUP BY r_name ORDER BY r_name NULLS FIRST"),
    "q136_dim_stats" ->
      ("WITH ce AS (SELECT CAST(i - 1 AS BIGINT) AS dim, " +
       "CAST(x AS DOUBLE) AS x FROM (SELECT " +
       "generate_subscripts(embedding, 1) AS i, unnest(embedding) " +
       "AS x FROM embeddings)), " +
       "qe AS (SELECT dim, CAST(round(x * 33554432.0) AS BIGINT) " +
       "AS qx, (isnan(x) OR abs(x) > 1e30) AS bad FROM ce) " +
       "SELECT dim, COUNT(*) AS n, CAST(SUM(CASE WHEN bad THEN 1 " +
       "ELSE 0 END) AS BIGINT) AS n_bad, CAST(SUM(CASE WHEN bad " +
       "THEN 0 ELSE abs(qx) END) AS BIGINT) AS l1_q, " +
       "MIN(CASE WHEN bad THEN NULL ELSE qx END) AS min_q, " +
       "MAX(CASE WHEN bad THEN NULL ELSE qx END) AS max_q " +
       "FROM qe GROUP BY dim ORDER BY dim NULLS FIRST"),
    // q134: the two-pass distributed prefix sum collapses to one
    // SUM OVER window in the oracle — partition boundaries cancel
    "q134_global_offsets" ->
      ("WITH tl AS (SELECT doc_id, CAST(len(regexp_split_to_array(" +
       "trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM " +
       "documents), " +
       "og AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER " +
       "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND " +
       "CURRENT ROW) - n_tokens AS tok_offset FROM tl) " +
       "SELECT doc_id, n_tokens, CAST(tok_offset AS BIGINT) AS " +
       "tok_offset FROM og WHERE doc_id % 97 = 0 " +
       "ORDER BY doc_id NULLS FIRST"),
    // q133: kmeans recurrence to a2, the residual-chain rounded
    // centroid formula ((2|s|+n) // (2n), sign restored), integer
    // d2 per vector, the 4x-mean cross-multiplied flag
    "q133_embedding_outliers" ->
      (kmeansAssignCtes + ", " +
       "cntk AS (SELECT label AS cell, COUNT(*) AS n FROM a2 " +
       "GROUP BY 1), " +
       "csk AS (SELECT a2.label AS cell, qc.dim, CAST(SUM(qx) AS " +
       "BIGINT) AS s FROM qc JOIN a2 USING (vec_id) GROUP BY " +
       "1, 2), " +
       "muk AS (SELECT csk.cell, csk.dim, CASE WHEN s >= 0 THEN " +
       "(2*s + n) // (2*n) ELSE -((-2*s + n) // (2*n)) END AS mu " +
       "FROM csk JOIN cntk USING (cell)), " +
       "dd AS (SELECT qc.vec_id, a2.label AS cell, " +
       "SUM(CAST(qx - mu AS HUGEINT) * (qx - mu)) AS d2 FROM qc " +
       "JOIN a2 USING (vec_id) JOIN muk ON muk.cell = a2.label " +
       "AND muk.dim = qc.dim GROUP BY 1, 2), " +
       "stk AS (SELECT cell, COUNT(*) AS nv, SUM(d2) AS sum_d2, " +
       "MAX(d2) AS max_d2 FROM dd GROUP BY 1) " +
       "SELECT dd.cell, CAST(stk.nv AS BIGINT) AS n_vectors, " +
       "CAST(SUM(CASE WHEN dd.d2 * stk.nv * 1 > stk.sum_d2 * 4 " +
       "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
       "CAST(stk.max_d2 AS BIGINT) AS max_d2 FROM dd JOIN stk " +
       "USING (cell) GROUP BY 1, stk.nv, stk.max_d2 " +
       "ORDER BY cell NULLS FIRST"),
    // q131: the kmeansAssignCtes recurrence to a2, documents joined
    // on vec_id = doc_id, per-cell lift ranking with tok tie-break
    "q131_cluster_topics" ->
      (kmeansAssignCtes + ", " +
       "tkc AS (SELECT a2.label, unnest(regexp_split_to_array(" +
       "trim(d.text), '\\s+')) AS tok FROM documents d JOIN a2 ON " +
       "a2.vec_id = d.doc_id), " +
       "ctc AS (SELECT label, tok, COUNT(*) AS nc FROM tkc WHERE " +
       "tok <> '' GROUP BY 1, 2), " +
       "ttc AS (SELECT tok, CAST(SUM(nc) AS BIGINT) AS nt FROM " +
       "ctc GROUP BY 1), " +
       "ltc AS (SELECT label, CAST(SUM(nc) AS BIGINT) AS tc FROM " +
       "ctc GROUP BY 1), " +
       "totc AS (SELECT CAST(SUM(nc) AS BIGINT) AS t FROM ctc), " +
       "rc AS (SELECT ctc.label, ctc.tok, CAST(ctc.nc AS BIGINT) " +
       "AS n_in_cluster, ttc.nt AS n_total, ROW_NUMBER() OVER " +
       "(PARTITION BY ctc.label ORDER BY CAST(ctc.nc * (SELECT t " +
       "FROM totc) AS DOUBLE) / CAST(ttc.nt * ltc.tc AS DOUBLE) " +
       "DESC, ctc.tok) AS rn FROM ctc JOIN ttc USING (tok) JOIN " +
       "ltc USING (label)) " +
       "SELECT label, CAST(rn AS BIGINT) AS rank, tok, " +
       "n_in_cluster, n_total FROM rc WHERE rn <= 3 ORDER BY " +
       "label NULLS FIRST, rank NULLS FIRST"),
    // q127: hashed-classifier replay — same md5 bucket, same Knuth
    // mix weight formula, folded with a list comprehension
    "q127_hash_classifier" ->
      ("WITH sc AS (SELECT source, CAST(list_sum([((CAST('0x' || " +
       "substr(md5(t), 1, 8) AS BIGINT) % 64) * 2654435761) % " +
       "2001 - 1000 FOR t IN regexp_split_to_array(trim(text), " +
       "'\\s+')]) AS BIGINT) AS score FROM documents) " +
       "SELECT source, count(*) AS n_docs, CAST(sum(CASE WHEN " +
       "score >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, " +
       "CAST(sum(score) AS BIGINT) AS sum_score, min(score) AS " +
       "min_score, max(score) AS max_score FROM sc GROUP BY " +
       "source ORDER BY source NULLS FIRST"),
    // q126: full line-dedup replay — same page wrapping, same
    // df >= 2 frequency bar, same order-preserving reassembly
    "q126_line_dedup" ->
      ("WITH pg AS (SELECT doc_id, source, concat_ws(chr(10), " +
       "CASE WHEN doc_id % 4 <> 0 THEN '== ' || source || " +
       "' portal ==' END, text, CASE WHEN doc_id % 3 <> 0 THEN " +
       "'contact us at example dot com' END) AS page FROM " +
       "documents), " +
       "ln AS (SELECT doc_id, source, string_split(page, chr(10)) " +
       "AS ls FROM pg), " +
       "ex AS (SELECT doc_id, source, unnest(ls) AS line, " +
       "unnest(range(len(ls))) AS pos FROM ln), " +
       "fr AS (SELECT line FROM (SELECT line, count(DISTINCT " +
       "doc_id) AS df FROM ex WHERE trim(line) <> '' GROUP BY 1) " +
       "WHERE df >= 2), " +
       "fl AS (SELECT e.doc_id, e.source, e.pos, e.line, " +
       "(f.line IS NULL) AS keep FROM ex e LEFT JOIN fr f ON " +
       "e.line = f.line), " +
       "cl AS (SELECT doc_id, source, count(*) AS n_lines, " +
       "sum(CASE WHEN keep THEN 0 ELSE 1 END) AS n_removed, " +
       "coalesce(string_agg(CASE WHEN keep THEN line END, " +
       "chr(10) ORDER BY pos), '') AS ct FROM fl GROUP BY doc_id, " +
       "source) " +
       "SELECT source, count(*) AS n_docs, CAST(sum(n_lines) AS " +
       "BIGINT) AS sum_lines, CAST(sum(n_removed) AS BIGINT) AS " +
       "sum_removed, CAST(sum(length(ct)) AS BIGINT) AS " +
       "sum_clean_nchars, CAST(sum(CAST('0x' || substr(md5(ct), " +
       "1, 8) AS BIGINT)) AS BIGINT) AS sum_md5h FROM cl GROUP BY " +
       "source ORDER BY source NULLS FIRST"),
    // q125: the full RAG-index replay — q123's chunk starts, the md5
    // stub embedding bytes, q121's md5-parity signs, sign-bit
    // buckets, bucket-limited top-5; exact integers end to end
    "q125_rag_index" ->
      ("WITH tok AS MATERIALIZED (SELECT doc_id, " +
       "regexp_split_to_array(trim(text), '\\s+') AS t FROM " +
       "documents), " +
       "ch AS MATERIALIZED (SELECT CAST(doc_id AS VARCHAR) || '#' " +
       "|| CAST(start // 48 AS VARCHAR) AS cid, " +
       "array_to_string(t[start+1 : start+64], ' ') AS ct FROM " +
       "(SELECT doc_id, t, unnest(range(0, " +
       "greatest(array_length(t) - 16, 1), 48)) AS start FROM " +
       "tok)), " +
       "qv AS MATERIALIZED (SELECT cid, [CAST(round((CAST('0x' || " +
       "substr(md5(ct), i*2+1, 2) AS INTEGER) / 255.0) * " +
       "33554432.0) AS BIGINT) FOR i IN range(16)] AS q FROM ch), " +
       "sgn AS MATERIALIZED (SELECT i, j, CASE WHEN " +
       "strpos('02468ace', substr(md5('jl_' || CAST(i AS VARCHAR) " +
       "|| '_' || CAST(j AS VARCHAR)), 1, 1)) > 0 THEN 1 ELSE -1 " +
       "END AS s FROM generate_series(0, 15) g1(i) CROSS JOIN " +
       "generate_series(0, 7) g2(j)), " +
       "p AS MATERIALIZED (SELECT cid, j, CAST(SUM(s * q[i+1]) AS " +
       "BIGINT) AS pj FROM qv CROSS JOIN sgn GROUP BY cid, j), " +
       "pb AS MATERIALIZED (SELECT cid, list(pj ORDER BY j) AS pv, " +
       "CAST(SUM(CASE WHEN pj > 0 THEN (CAST(1 AS BIGINT) << j) " +
       "ELSE 0 END) AS BIGINT) AS bucket FROM p GROUP BY cid), " +
       "prb AS MATERIALIZED (SELECT CAST(MIN(doc_id) AS VARCHAR) " +
       "|| '#0' AS pcid FROM documents), " +
       "pr AS MATERIALIZED (SELECT pv AS qpv, bucket AS qb FROM " +
       "pb CROSS JOIN prb WHERE cid = pcid), " +
       "cand AS MATERIALIZED (SELECT cid, " +
       "CAST(list_sum([(pv[j+1] - qpv[j+1]) * (pv[j+1] - " +
       "qpv[j+1]) FOR j IN range(8)]) AS BIGINT) AS dist FROM pb " +
       "CROSS JOIN pr CROSS JOIN prb WHERE bucket = qb AND " +
       "cid <> pcid), " +
       "t5 AS MATERIALIZED (SELECT dist, cid FROM cand ORDER BY " +
       "dist ASC, cid ASC LIMIT 5) " +
       "SELECT (SELECT COUNT(*) FROM pb) AS n_chunks, " +
       "(SELECT COUNT(DISTINCT bucket) FROM pb) AS n_buckets, " +
       "(SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM pb GROUP " +
       "BY bucket)) AS max_bucket, " +
       "(SELECT COUNT(*) FROM cand) AS n_cands, " +
       "(SELECT cid FROM t5 ORDER BY dist ASC, cid ASC LIMIT 1) " +
       "AS top1_cid, " +
       "(SELECT MIN(dist) FROM t5) AS top1_dist, " +
       "CAST((SELECT SUM(dist) FROM t5) AS BIGINT) AS " +
       "sum_top5_dist"),
    // q121: signs from md5 parity, 2^25 quantization, exact BIGINT
    // sums — the projection replayed coordinate-by-coordinate
    "q121_jl_topk" ->
      ("WITH sgn AS MATERIALIZED (SELECT i, j, CASE WHEN " +
       "strpos('02468ace', substr(md5('jl_' || CAST(i AS VARCHAR) " +
       "|| '_' || CAST(j AS VARCHAR)), 1, 1)) > 0 THEN 1 ELSE -1 " +
       "END AS s FROM generate_series(0, 63) g1(i) CROSS JOIN " +
       "generate_series(0, 15) g2(j)), " +
       "q AS MATERIALIZED (SELECT vec_id, [CAST(round(CAST(x AS " +
       "DOUBLE) * 33554432.0) AS BIGINT) FOR x IN embedding] AS " +
       "qv FROM embeddings), " +
       "p AS MATERIALIZED (SELECT vec_id, j, CAST(SUM(s * " +
       "qv[i+1]) AS BIGINT) AS pj FROM q CROSS JOIN sgn GROUP BY " +
       "vec_id, j), " +
       "pv AS MATERIALIZED (SELECT vec_id, list(pj ORDER BY j) AS " +
       "pv FROM p GROUP BY vec_id), " +
       "pr AS (SELECT pv AS qpv FROM pv WHERE vec_id = 0) " +
       "SELECT vec_id, CAST(list_sum([(pv[j+1] - qpv[j+1]) * " +
       "(pv[j+1] - qpv[j+1]) FOR j IN range(16)]) AS BIGINT) AS " +
       "dist FROM pv CROSS JOIN pr WHERE vec_id <> 0 " +
       "ORDER BY dist ASC, vec_id ASC LIMIT 10"),
    // q112: the same cross-split band-candidate CTEs; every flagged
    // test doc moves to train, census pins split sizes AND exact
    // membership (sum of ids)
    "q112_leakage_split" ->
      (crossSplitCandCtes +
      ", mv AS (SELECT DISTINCT new_id AS doc_id FROM pr), " +
      "asg AS (SELECT doc_id, CASE WHEN " + splitHashSql +
      " = 0 AND doc_id NOT IN (SELECT doc_id FROM mv) THEN 'test' " +
      "ELSE 'train' END AS split FROM documents) " +
      "SELECT split, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS " +
      "BIGINT) AS sum_ids FROM asg GROUP BY split " +
      "ORDER BY split NULLS FIRST"),
    "q62_shard_census" ->
      ("WITH hd AS (SELECT doc_id, CAST('0x' || " +
       "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h " +
       "FROM documents) " +
       "SELECT (h * 16) // 4294967296 AS shard, COUNT(*) AS n_docs, " +
       "MIN(h) AS min_h, MAX(h) AS max_h, CAST(SUM(doc_id) AS " +
       "BIGINT) AS sum_id FROM hd GROUP BY shard " +
       "ORDER BY shard NULLS FIRST"),
    // the grouped-refinement path with one coarse cell IS the flat
    // algorithm — the same unrolled oracle pins it
    "q56_kmeans_hier" -> kmeansSql,
    "q45_ivf_batch" ->
      ("WITH qs AS (SELECT vec_id AS qid, embedding AS qv FROM " +
       "embeddings WHERE vec_id < 3), " +
       "qc AS (SELECT qid, i, CAST(round(CAST(x AS DOUBLE) * " +
       "33554432.0) AS BIGINT) AS qy FROM (SELECT qid, " +
       "generate_subscripts(qv, 1) AS i, unnest(qv) AS x FROM qs)), " +
       "ds AS (SELECT label, i, CAST(SUM(CAST(round(CAST(x AS " +
       "DOUBLE) * 33554432.0) AS BIGINT)) AS BIGINT) AS s FROM " +
       "(SELECT label, generate_subscripts(embedding, 1) AS i, " +
       "unnest(embedding) AS x FROM embeddings) GROUP BY label, i), " +
       "sc AS (SELECT qid, label, SUM(CAST(s AS HUGEINT) * qy) AS " +
       "dot_c, SUM(CAST(s AS HUGEINT) * s) AS s2 FROM ds JOIN qc " +
       "USING (i) GROUP BY qid, label), " +
       "pr AS (SELECT qid, label FROM (SELECT qid, label, " +
       "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY CAST(dot_c AS " +
       "DOUBLE) / sqrt(CAST(s2 AS DOUBLE)) DESC, label) AS rn FROM " +
       "sc) WHERE rn <= 2), " +
       "cand AS (SELECT pr.qid, e.vec_id, e.embedding FROM " +
       "embeddings e JOIN pr ON e.label = pr.label WHERE e.vec_id " +
       "<> pr.qid), " +
       "px AS (SELECT c.qid, c.vec_id, CAST(round(CAST(x AS DOUBLE) " +
       "* 33554432.0) AS BIGINT) AS qx, CAST(round(CAST(q.qv[i] AS " +
       "DOUBLE) * 33554432.0) AS BIGINT) AS qy FROM (SELECT qid, " +
       "vec_id, generate_subscripts(embedding, 1) AS i, " +
       "unnest(embedding) AS x FROM cand) c JOIN qs q ON c.qid = " +
       "q.qid), " +
       "dots AS (SELECT qid, vec_id, CAST(SUM(qx * qy) AS BIGINT) " +
       "AS dot, CAST(SUM(qx * qx) AS BIGINT) AS na2 FROM px " +
       "GROUP BY qid, vec_id), " +
       "nq AS (SELECT qid, CAST(SUM(qy * qy) AS BIGINT) AS nq2 FROM " +
       "qc GROUP BY qid), " +
       "r AS (SELECT dots.qid, vec_id, dot, ROW_NUMBER() OVER " +
       "(PARTITION BY dots.qid ORDER BY CAST(dot AS DOUBLE) / " +
       "(sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nq2 AS DOUBLE))) " +
       "DESC, vec_id) AS rank FROM dots JOIN nq ON dots.qid = " +
       "nq.qid) " +
       "SELECT qid, vec_id, dot, rank FROM r WHERE rank <= 5 " +
       "ORDER BY qid NULLS FIRST, rank NULLS FIRST"),
    "q34_nanos_range" ->
      ("SELECT COUNT(ts) AS n_ts, MIN(CAST(ts AS DATE)) AS min_day, " +
       "MAX(CAST(ts AS DATE)) AS max_day FROM events"),
    "q52_asof_join" -> asofSql,
    "q55_asof_bucketed" -> asofSql,
    "q53_sessionize" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS tsn FROM events), " +
       "l AS (SELECT user_id, tsn, LAG(tsn) OVER (PARTITION BY " +
       "user_id ORDER BY tsn) AS prev FROM e), " +
       "s AS (SELECT user_id, CASE WHEN prev IS NULL OR tsn - prev > " +
       "1800000000 THEN 1 ELSE 0 END AS isnew FROM l) " +
       "SELECT user_id, CAST(SUM(isnew) AS BIGINT) AS n_sessions, " +
       "COUNT(*) AS n_events FROM s GROUP BY user_id " +
       "ORDER BY user_id NULLS FIRST"),
    "q54_mixture_sample" ->
      ("SELECT source, COUNT(*) AS n_sampled FROM (SELECT source, " +
       "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS " +
       "BIGINT) AS h FROM documents) " +
       "WHERE h * (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 4 " +
       "ELSE 8 END) < (CASE source WHEN 'src0' THEN 1 WHEN 'src1' " +
       "THEN 1 ELSE 1 END) * 4294967296 " +
       "GROUP BY source ORDER BY source NULLS FIRST"),
    "q57_winnow_fp" ->
      (winnowCte(8, 4) +
       " SELECT source, COUNT(*) AS n_docs, CAST(SUM(len(fps)) AS " +
       "BIGINT) AS total_fps, CAST(MIN(len(fps)) AS BIGINT) AS " +
       "min_fps, CAST(MAX(len(fps)) AS BIGINT) AS max_fps FROM fp " +
       "GROUP BY source ORDER BY source NULLS FIRST"),
    "q58_winnow_pairs" ->
      (winnowCte(16, 8) +
       ", fpx AS (SELECT doc_id, unnest(fps) AS fp FROM fp), " +
       "ok AS (SELECT fp FROM fpx GROUP BY fp HAVING COUNT(*) <= " +
       "10000), " +
       "kept AS (SELECT doc_id, fp FROM fpx WHERE fp IN (SELECT fp " +
       "FROM ok)), " +
       "pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS " +
       "shared FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < " +
       "b.doc_id GROUP BY 1, 2 HAVING COUNT(*) >= 3) " +
       "SELECT COUNT(*) AS n_pairs, CAST(COALESCE(SUM(shared), 0) " +
       "AS BIGINT) AS sum_shared, CAST(COALESCE(MAX(shared), 0) AS " +
       "BIGINT) AS max_shared FROM pr"),
    "q59_range_join" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS tsn, " +
       "event_type FROM events), " +
       "iv AS (SELECT user_id, tsn AS s, tsn + 86400000000 AS e, " +
       "event_id AS win_id FROM ev WHERE event_type = 'signup') " +
       "SELECT ev.event_type, COUNT(*) AS n_pairs, CAST(SUM(win_id) " +
       "AS BIGINT) AS sum_win, MIN(ev.event_id) AS min_event " +
       "FROM ev JOIN iv ON ev.user_id = iv.user_id AND ev.tsn >= " +
       "iv.s AND ev.tsn <= iv.e " +
       "GROUP BY ev.event_type ORDER BY ev.event_type NULLS FIRST"),
    // q33 is the structure-inference dump itself: its five inferred
    // type strings over the documents table are deterministic (exact
    // counters over deterministic data). The byte-identical golden
    // snapshot (GoldenSpec) covers the full render grammar; this
    // oracle makes the driver's hash gate cover the query too. The
    // two int-range rows derive from the DATA with the engine's
    // formatInt ladder (plain < 1000, then K/M suffixes,
    // format.py:64-86), so the gate holds at any verify scale factor;
    // the three string rows are pinned (lang's 2-letter codes,
    // source's and text's over-cap str verdicts are the same value
    // sets at every SF the driver generates).
    "q33_analyze_structure" -> analyzeStructureSql,
    // q71: every data-dependent piece re-derived from the events
    // table — int ranges through the formatInt K/M ladder, the
    // props JSON inner range, the NTZ timestamp's second-truncated
    // datetime range, and the %.7g float range (integral values
    // print as plain longs, matching formatFloat)
    "q71_analyze_events" ->
      ("WITH ir AS (SELECT 'event_id' AS column_name, " +
       "CAST(MIN(event_id) AS BIGINT) AS mn, CAST(MAX(event_id) AS " +
       "BIGINT) AS mx FROM events " +
       "UNION ALL SELECT 'user_id', CAST(MIN(user_id) AS BIGINT), " +
       "CAST(MAX(user_id) AS BIGINT) FROM events " +
       "UNION ALL SELECT 'props', " +
       "CAST(MIN(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) " +
       "AS BIGINT), " +
       "CAST(MAX(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) " +
       "AS BIGINT) FROM events), " +
       "fmtd AS (SELECT column_name, " +
       "CASE WHEN abs(mn) < 1000 THEN CAST(mn AS VARCHAR) " +
       "WHEN abs(mn) < 1000000 THEN printf('%.1fK', mn / 1000.0) " +
       "ELSE printf('%.1fM', mn / 1000000.0) END AS fmn, " +
       "CASE WHEN abs(mx) < 1000 THEN CAST(mx AS VARCHAR) " +
       "WHEN abs(mx) < 1000000 THEN printf('%.1fK', mx / 1000.0) " +
       "ELSE printf('%.1fM', mx / 1000000.0) END AS fmx FROM ir), " +
       "ints AS (SELECT column_name, CASE WHEN column_name = " +
       "'props' THEN 'str of {''k'': int range=' || fmn || '..' || " +
       "fmx || '} pattern=json' ELSE 'int range=' || fmn || '..' || " +
       "fmx END AS inferred FROM fmtd), " +
       "tsr AS (SELECT 'ts' AS column_name, 'datetime range=' || " +
       "strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') || '..' || " +
       "strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS inferred FROM " +
       "events), " +
       "vr AS (SELECT 'value' AS column_name, 'float range=' || " +
       "CASE WHEN MIN(value) = floor(MIN(value)) THEN " +
       "CAST(CAST(MIN(value) AS BIGINT) AS VARCHAR) ELSE " +
       "printf('%.7g', MIN(value)) END || '..' || " +
       "CASE WHEN MAX(value) = floor(MAX(value)) THEN " +
       "CAST(CAST(MAX(value) AS BIGINT) AS VARCHAR) ELSE " +
       "printf('%.7g', MAX(value)) END AS inferred FROM events) " +
       "SELECT column_name, inferred FROM (SELECT * FROM ints " +
       "UNION ALL SELECT * FROM tsr UNION ALL SELECT * FROM vr " +
       "UNION ALL SELECT 'event_type', 'str') " +
       "ORDER BY column_name NULLS FIRST"),
    // q72: fixture dimensions pinned as VALUES (the hex headers are
    // compile-time constants); the corpus side must be all-unknown
    "q72_image_meta" ->
      ("SELECT name, format, width, height, n FROM (" +
       "SELECT * FROM (VALUES " +
       "('png_320x240', 'png', 320, 240, CAST(1 AS BIGINT)), " +
       "('jpeg_64x48', 'jpeg', 64, 48, CAST(1 AS BIGINT)), " +
       "('gif_12x7', 'gif', 12, 7, CAST(1 AS BIGINT)), " +
       "('bmp_21x17', 'bmp', 21, 17, CAST(1 AS BIGINT))) AS " +
       "v(name, format, width, height, n) " +
       "UNION ALL SELECT 'corpus', 'unknown', NULL, NULL, COUNT(*) " +
       "FROM documents WHERE text NOT LIKE 'BM%' AND text NOT LIKE " +
       "'GIF8%') " +
       "ORDER BY name NULLS FIRST, format NULLS FIRST"),
    // the INCREMENTAL analysis must reproduce the whole-corpus
    // verdicts exactly, so q70 shares q33's oracle re-derivation
    "q70_analyze_incremental" -> analyzeStructureSql,
    "q31_media_stats" ->
      ("SELECT source AS grp, COUNT(*) AS n_items, " +
       "CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS " +
       "total_bytes, CAST(MIN(octet_length(CAST(text AS BLOB))) AS " +
       "BIGINT) AS min_bytes, CAST(MAX(octet_length(CAST(text AS " +
       "BLOB))) AS BIGINT) AS max_bytes FROM documents GROUP BY " +
       "source ORDER BY grp NULLS FIRST")
  )
}
