package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IsoProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    spark.range(10).count() // session warmup

    // A: current jaccard (SMJ)
    time("jaccard smj 1")(noop(graft.ops.Dedup.jaccardPairs(docs, 3, 0.6)))
    time("jaccard smj 2")(noop(graft.ops.Dedup.jaccardPairs(docs, 3, 0.6)))

    // B: same with shuffle-hash hint
    val hashed = docs.select(col("doc_id").as("id"),
      org.apache.spark.sql.graftfns.TextFunctions.shingleHashes(col("text"), 3).as("hs"))
    val sh = hashed.select(col("id"), explode(col("hs")).as("h"))
    val counts = hashed.select(col("id"), size(col("hs")).cast("long").as("n_sh"))
    val overlap = sh.as("a").hint("SHUFFLE_HASH")
      .join(sh.as("b").hint("SHUFFLE_HASH"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ov"))
    val out = graft.ops.Ordered.smallResult(
      overlap
        .join(counts.select(col("id").as("d1"), col("n_sh").as("n1")), "d1")
        .join(counts.select(col("id").as("d2"), col("n_sh").as("n2")), "d2")
        .select(col("d1"), col("d2"),
          round(col("ov").cast("double") / (col("n1") + col("n2") - col("ov")).cast("double"), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.6),
      "d1", "d2")
    time("jaccard shj 1")(noop(out))
    time("jaccard shj 2")(noop(out))
    spark.stop()
  }
}
