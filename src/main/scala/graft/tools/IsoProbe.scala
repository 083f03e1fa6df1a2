package graft.tools
import org.apache.spark.sql.SparkSession
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
    for (q <- args) {
      time(q + " noop1")(graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save())
      time(q + " noop2")(graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
