package graft

import org.apache.spark.sql.functions._

/** Write-side layout claims, verified on real written data: bucketed tables
  * co-locate equi-joins (no shuffle exchange on either side), and
  * date-partitioned parquet prunes partitions at the scan. These are the
  * two levers that remove whole shuffle/scan stages at 100 TB — asserting
  * them on plans over actual files keeps the posture claims honest.
  */
class StorageLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-layout").toString

  test("bucketed tables join without a shuffle exchange on either side") {
    val dir = tmpDir()
    val left = (0L until 1000L).map(i => (i % 100, i)).toDF("k", "v")
    val right = (0L until 300L).map(i => (i % 100, s"r$i")).toDF("rk", "name")
    left.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$dir/left").saveAsTable("graft_bucketed_left")
    right.write.bucketBy(8, "rk").sortBy("rk")
      .option("path", s"$dir/right").saveAsTable("graft_bucketed_right")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force the shuffle-join path: a broadcast join would trivially have
      // no exchange and prove nothing about bucketing.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucketed_left")
        .join(spark.table("graft_bucketed_right"), col("k") === col("rk"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${p.take(2000)}")
      // And it is not a degenerate plan: the join really runs.
      assert(joined.count() == 3000L) // 300 right rows × 10 matching left each
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_right")
    }
  }

  test("date-partitioned parquet prunes partitions at the scan") {
    val dir = tmpDir()
    val events = (0L until 500L)
      .map(i => (i % 10, i, s"e$i")).toDF("day", "event_id", "payload")
    events.write.partitionBy("day").parquet(s"$dir/events")
    val df = spark.read.parquet(s"$dir/events").filter(col("day") === 3)
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = root.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // The partition filter must be applied at planning: only day=3's files
    // are read (one tenth of the rows), and the scan metadata records it.
    assert(scans.head.metadata("PartitionFilters").contains("day"),
      scans.head.metadata.toString)
    assert(scans.head.relation.location.inputFiles.count(_.contains("day=3")) > 0)
    assert(df.count() == 50L)
  }
}
