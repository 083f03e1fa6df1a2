package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** Scratch profiler for the jaccard pipeline stages (dev tool, not API). */
object JaccardProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    time("warmup")(docs.count())
    val sh = Dedup.shingles(docs, 3)
    time("shingles noop 1")(noop(sh))
    time("shingles noop 2")(noop(sh))
    val joined = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
    time("join noop")(noop(joined))
    val overlap = joined.groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ov"))
    time("join+groupBy noop")(noop(overlap))
    time("full warm")(noop(Dedup.jaccardPairs(docs, 3, 0.6)))
  }
}
