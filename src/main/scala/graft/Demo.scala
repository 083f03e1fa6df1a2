package graft

import org.apache.spark.sql.SparkSession
import graft.uts._

/** Manual end-to-end driver: loads the real test corpus and runs the core
  * query surface, printing results + physical plans. Usage:
  *   sbt "runMain graft.Demo [sfDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tsdb.events(spark, sfDir)
    val nowMs = ev.df.agg(org.apache.spark.sql.functions.max("time")).head().getLong(0)
    println(s"== events loaded; max time = $nowMs ==")

    val hour = 3600L * 1000
    println("== flagship: mean(value) per 1h bin, last 24h, zero-filled ==")
    val flagship = ev.query(UtsQuery(
      Seq("mean_value" -> Mean("value"), "n" -> CountM()),
      where = Seq(Pred.gt("time", nowMs - 24 * hour)),
      group = IntervalGroup(hour, fill = true, nowMs)))
    flagship.show(30, truncate = false)
    flagship.explain("formatted")

    println("== global multi-metric ==")
    ev.query(UtsQuery(Seq(
      "mean" -> Mean("value"), "sum" -> SumM("value"), "n" -> CountM(),
      "mx" -> MaxM("value"), "mn" -> MinM("value"), "lst" -> Last("value")
    ))).show(truncate = false)

    println("== derivative of sum-like value for user 1, I=6h ==")
    ev.derivative("value", 6 * hour, partitionCols = Seq("user_id")).show(10, truncate = false)
  }
}
