package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time one registry query N times against a corpus dir and
  * print the final physical plan. `runMain graft.tools.QueryProbe <name>
  * [sfDir] [reps]`.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q1_agg")(spark, sfDir).write.mode("overwrite").format("noop").save()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
