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

    time("warmup full")(Dedup.jaccardPairs(docs, 3, 0.6).count())
    val sh = Dedup.shingles(docs, 3)
    time("shingles count")(sh.count())
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df_sh"))
    time("dfreq")(dfreq.count())
    val w = org.apache.spark.sql.expressions.Window
    val ranked = sh.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(w.partitionBy(col("id")).orderBy(col("df_sh"), col("shingle"))))
      .withColumn("n_sh", count(lit(1)).over(w.partitionBy(col("id"))))
    val prefix = ranked.filter(col("rk") <= col("n_sh") - ceil(col("n_sh") * 0.6) + 1)
      .select(col("id"), col("shingle"))
    time("prefix rows")(prefix.count())
    val candidates = prefix.as("a").join(prefix.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2")).distinct()
    time("candidates")(candidates.count())
    val sets = sh.groupBy(col("id")).agg(collect_list(col("shingle")).as("sh"))
    time("sets")(sets.count())
    val verified = candidates
      .join(sets.select(col("id").as("d1"), col("sh").as("sh1")), "d1")
      .join(sets.select(col("id").as("d2"), col("sh").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        round(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
    time("verified")(verified.count())
    time("full again")(Dedup.jaccardPairs(docs, 3, 0.6).count())
    spark.stop()
  }
}
