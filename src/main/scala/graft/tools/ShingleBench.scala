package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
/** Scratch comparison of shingle strategies (kept for plan review). */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    df.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"$name: ${(System.nanoTime()-t0)/1e9} sec, rows=$n")
    }
    for (round <- 1 to 2) {
      time(s"r$round native expr") {
        df.select(col("doc_id"), explode(
          graft.functions.WordShinglesExpr.wordShinglesNative(
            col("text"), 5)).as("s"))
          .select(md5(col("s"))).count()
      }
      time(s"r$round window lead") {
        val toks = df.select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        toks.select(col("doc_id"), concat_ws(" ", col("tok"),
            lead("tok", 1).over(w), lead("tok", 2).over(w),
            lead("tok", 3).over(w), lead("tok", 4).over(w)).as("s"),
            lead("tok", 4).over(w).as("last"))
          .where(col("last").isNotNull)
          .select(col("doc_id"), col("s")).distinct()
          .select(md5(col("s"))).count()
      }
    }
    spark.stop()
  }
}
