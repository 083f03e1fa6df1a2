package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Materialize]]'s one contract: the mode switch changes WHERE the
  * materialized blocks live (executor memory vs reliable storage), never
  * the data — every op built on `narrow` must be bit-identical across
  * modes.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def withMode[A](mode: String, dir: Option[String] = None)(f: => A): A = {
    val conf = spark.conf
    val prevMode = conf.getOption(Materialize.ModeConf)
    val prevDir = conf.getOption(Materialize.DirConf)
    try {
      conf.set(Materialize.ModeConf, mode)
      dir.foreach(conf.set(Materialize.DirConf, _))
      f
    } finally {
      prevMode.fold(conf.unset(Materialize.ModeConf))(conf.set(Materialize.ModeConf, _))
      if (dir.isDefined)
        prevDir.fold(conf.unset(Materialize.DirConf))(conf.set(Materialize.DirConf, _))
    }
  }

  /** Run `f` with NO session-level checkpoint dir, restoring any existing
    * one after — other suites (connectedComponents' reliable cuts) may have
    * set it, and Materialize respects an existing dir by contract, so these
    * tests must isolate themselves from suite order.
    */
  private def withNoCheckpointDir[A](f: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getCheckpointDir
    sc.setCheckpointDir(null) // Option(null) ⇒ None: clears the dir
    try f finally sc.setCheckpointDir(prev.orNull) // exact restore (incl. a dir narrow() set inside f)
  }

  test("reliable mode without any checkpoint dir fails loud") {
    val df = Seq(1, 2, 3).toDF("x")
    val e = intercept[IllegalStateException] {
      withNoCheckpointDir(withMode("reliable")(Materialize.narrow(df)))
    }
    assert(e.getMessage.contains(Materialize.DirConf))
  }

  test("unknown mode is rejected") {
    val df = Seq(1).toDF("x")
    val e = intercept[IllegalArgumentException] {
      withMode("weird")(Materialize.narrow(df))
    }
    assert(e.getMessage.contains("weird"))
  }

  test("local and reliable modes produce identical results on a narrow-built op") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    // knnGraph materializes its assignment frame through narrow — a real
    // consumer of the primitive, not a synthetic frame.
    def run() = Similarity.knnGraph(vecs, nClusters = Some(4), rounds = 1, kNeighbors = 2)
      .collect().map(_.toSeq).toSeq
    val local = withMode("local")(run())
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-matspec").toString
    // The quantizer cache keys on the RESOLVED mode (corpusKey), so this
    // second run re-trains its centroids under reliable mode rather than
    // serving the local run's executor-resident checkpointed frames.
    val reliable = withNoCheckpointDir(withMode("reliable", Some(ckptDir))(run()))
    assert(local == reliable)
    // The reliable run must actually have gone through the filesystem.
    def anyFile(p: java.io.File): Boolean =
      p.isFile || Option(p.listFiles).exists(_.exists(anyFile))
    assert(anyFile(new java.io.File(ckptDir)),
      "reliable mode left no checkpoint files on disk")
  }
}
