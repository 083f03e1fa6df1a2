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

    time("warmup (trivial job)")(docs.count())
    time("overlap cold")(Dedup.jaccardPairs(docs, 3, 0.6).count())
    time("overlap warm")(Dedup.jaccardPairs(docs, 3, 0.6).count())
    time("prefix-filtered cold")(Dedup.jaccardPairsPrefixFiltered(docs, 3, 0.6).count())
    time("prefix-filtered warm")(Dedup.jaccardPairsPrefixFiltered(docs, 3, 0.6).count())
    val nA = Dedup.jaccardPairs(docs, 3, 0.6).count()
    val nB = Dedup.jaccardPairsPrefixFiltered(docs, 3, 0.6).count()
    println(s"pair counts overlap=$nA prefix=$nB")
    spark.stop()
  }
}
