package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned (time-travel) parquet tables: immutable data files + one
  * file-list manifest per version — the Delta/Iceberg snapshot discipline
  * for tables that are just a directory, and the missing temporal half of
  * [[Layout.upsertPartitioned]] (which swaps files IN PLACE: after the
  * swap, yesterday's state is gone; here every version stays readable
  * forever, the property reproducible-training pipelines need — "train on
  * the corpus exactly as it stood at snapshot 12").
  *
  * Layout on disk:
  * {{{
  *   path/files/v<k>-*.parquet       immutable data files, never rewritten
  *   path/_vmanifest/version=<k>/    (file) rows: the files LIVE at k
  *   path/_vlatest                   current version number (one long)
  * }}}
  *
  * [[upsertVersion]] is MERGE at FILE granularity (copy-on-write): only
  * files that CONTAIN a batch key are rewritten (surviving rows + the
  * batch land in new files); untouched files are carried into the new
  * manifest by reference. At 100 TB that is the entire point — an upsert
  * touching one user rewrites kilobytes, not the table. The touched-file
  * list is collected to the driver (bounded by the batch's key spread —
  * the same driver-side file-list envelope Delta's MERGE planning uses,
  * and the [[Similarity.ivfProbePersisted]] routing-state argument).
  *
  * Crash safety: data files are written FIRST, the manifest second, the
  * `_vlatest` pointer LAST — a crash anywhere leaves orphan files beside a
  * consistent previous snapshot (readers resolve versions only through
  * manifests; orphans are invisible). Writing an already-existing version
  * fails loud. Single-writer ownership, like the rest of the layout
  * family.
  */
object Versioned {

  private val LatestFile = "_vlatest"

  private def fsOf(spark: SparkSession, path: String): (org.apache.hadoop.fs.FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The table's newest version number; None before [[init]]. */
  def latestVersion(spark: SparkSession, path: String): Option[Long] = {
    val (fs, root) = fsOf(spark, path)
    Layout.readLongFile(fs, new Path(root, LatestFile))
  }

  private def manifestDir(path: String, v: Long): String =
    s"$path/_vmanifest/version=$v"

  /** Write `df` as version 1 of a new versioned table. */
  def init(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val (fs, root) = fsOf(spark, path)
    require(Layout.readLongFile(fs, new Path(root, LatestFile)).isEmpty,
      s"$path is already a versioned table (use upsertVersion)")
    writeVersion(spark, path, 1L, df, carried = Seq.empty)
  }

  /** MERGE `batch` by `keyCols` into the latest snapshot, producing a new
    * version: rows of live files whose keys collide with the batch are
    * replaced, all other rows carried (their FILES carried by reference —
    * never rewritten), new keys inserted. Returns the new version number.
    */
  def upsertVersion(batch: DataFrame, path: String, keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "upsertVersion needs at least one key column")
    val spark = batch.sparkSession
    val v = latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"$path: not a versioned table (run init first)"))
    val live = liveFiles(spark, path, v)
    // Which live files hold a colliding key? One semi-join scan, grouped to
    // file names — the driver-side list is bounded by the batch's spread.
    val keys = batch.select(keyCols.map(col): _*).distinct()
    val touched = spark.read.parquet(live: _*)
      .withColumn("__f", input_file_name())
      .join(keys, keyCols, "left_semi")
      .select(col("__f")).distinct()
      .collect().map(r => toUri(spark, r.getString(0))).toSet
    val untouched = live.filterNot(f => touched.contains(toUri(spark, f)))
    val survivors =
      if (touched.isEmpty) batch
      else spark.read.parquet(touched.toSeq: _*)
        .join(keys, keyCols, "left_anti")
        .unionByName(batch)
    writeVersion(spark, path, v + 1L, survivors, carried = untouched)
  }

  /** Read the table EXACTLY as it stood at `version` — any version, any
    * time, from the immutable files its manifest lists. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val files = liveFiles(spark, path, version)
    require(files.nonEmpty, s"$path has no manifest for version $version")
    spark.read.parquet(files: _*)
  }

  /** What changed between two snapshots — [[Diff.snapshots]] over two
    * [[readVersion]] reads: `(keys..., change ∈ {added, removed, changed})`.
    * The temporal audit the versioned layout makes possible: "what did
    * yesterday's ingest actually do", answerable forever because both
    * snapshots stay readable. */
  def diffVersions(
      spark: SparkSession,
      path: String,
      oldV: Long,
      newV: Long,
      keys: Seq[String]): DataFrame =
    Diff.snapshots(readVersion(spark, path, oldV), readVersion(spark, path, newV), keys)

  /** Drop all but the newest `keepLast` versions: dropped manifests are
    * deleted (their versions fail loud on read from then on) and data
    * files referenced by NO kept manifest are removed — files carried
    * forward into a kept version survive, however old the version that
    * wrote them. The retention half of the lifecycle: snapshots are
    * forever only until the operator says otherwise, and storage is
    * reclaimed at FILE granularity, exactly as it was written. Returns the
    * number of data files deleted.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int): Int = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val (fs, _) = fsOf(spark, path)
    val latest = latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"$path: not a versioned table"))
    val cutoff = latest - keepLast + 1
    val kept = (cutoff to latest).flatMap(v => liveFiles(spark, path, v)).toSet
    // Delete dropped manifests first: a reader can no longer resolve a
    // version whose files are about to go.
    (1L until cutoff).foreach { v =>
      fs.delete(new Path(manifestDir(path, v)), true): Unit
    }
    val filesRoot = new Path(s"$path/files")
    var removed = 0
    if (fs.exists(filesRoot)) {
      val it = fs.listFiles(filesRoot, true)
      while (it.hasNext) {
        val st = it.next()
        val uri = st.getPath.toUri.toString
        if (st.isFile && uri.endsWith(".parquet") && !kept.contains(uri)) {
          fs.delete(st.getPath, false)
          removed += 1
        }
      }
    }
    removed
  }

  /** `input_file_name()` URIs and manifest-stored paths must compare in one
    * form; normalize through the filesystem's URI resolution. */
  private def toUri(spark: SparkSession, f: String): String =
    new Path(f).toUri.toString

  private def liveFiles(spark: SparkSession, path: String, v: Long): Seq[String] = {
    val mdir = manifestDir(path, v)
    val (fs, _) = fsOf(spark, path)
    if (!fs.exists(new Path(mdir))) Seq.empty
    else spark.read.parquet(mdir).select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Data files first, manifest second, latest-pointer LAST. */
  private def writeVersion(
      spark: SparkSession,
      path: String,
      v: Long,
      fresh: DataFrame,
      carried: Seq[String]): Long = {
    val (fs, root) = fsOf(spark, path)
    require(!fs.exists(new Path(manifestDir(path, v))),
      s"$path: version $v already exists")
    val stage = s"$path/files/v$v-${java.util.UUID.randomUUID()}"
    fresh.write.parquet(stage)
    val freshFiles = fs.listStatus(new Path(stage))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.toString).toSeq
    import spark.implicits._
    (freshFiles ++ carried).map(f => new Path(f).toUri.toString)
      .toDF("file").coalesce(1)
      .write.parquet(manifestDir(path, v))
    Layout.writeLongFile(fs, new Path(root, LatestFile), v)
    v
  }
}
