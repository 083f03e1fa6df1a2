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
    val oldSchema = versionSchemaOf(spark, path, v)
      .getOrElse(spark.read.parquet(live: _*).schema)
    val keys = batch.select(keyCols.map(col): _*).distinct()
    val touched = spark.read.schema(oldSchema).parquet(live: _*)
      .withColumn("__f", input_file_name())
      .join(keys, keyCols, "left_semi")
      .select(col("__f")).distinct()
      .collect().map(r => toUri(spark, r.getString(0))).toSet
    // Fail loud on URI-form drift: every touched file must be a live file
    // under the same qualified form — a mismatch here would silently carry
    // AND rewrite the file (duplicate rows in the new version).
    val liveQ = live.map(f => toUri(spark, f)).toSet
    require(touched.subsetOf(liveQ),
      s"$path: touched files not in the live set (URI form mismatch?): " +
        (touched -- liveQ).take(3).mkString(", "))
    val untouched = live.filterNot(f => touched.contains(toUri(spark, f)))
    // Schema evolution: batch columns not in the live schema are ADDED
    // (survivors and carried rows read as NULL for them); live columns
    // absent from the batch stay (batch rows get NULL); a shared name with
    // a different type fails loud — silent coercion would corrupt.
    val newSchema = evolvedSchema(oldSchema, batch.schema, path)
    def conform(d: DataFrame): DataFrame =
      d.select(newSchema.fields.map { f =>
        if (d.columns.contains(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)
      }.toSeq: _*)
    val survivors =
      if (touched.isEmpty) conform(batch)
      else conform(spark.read.schema(oldSchema).parquet(touched.toSeq: _*)
          .join(keys, keyCols, "left_anti"))
        .unionByName(conform(batch))
    writeVersion(spark, path, v + 1L, survivors, carried = untouched,
      schema = newSchema)
  }

  /** Union of the live schema and the batch schema (live field order first,
    * batch-only fields appended; everything nullable — carried files lack
    * the new columns and batch rows may lack old ones). Fails loud when a
    * shared name changes type. */
  private def evolvedSchema(
      old: org.apache.spark.sql.types.StructType,
      batch: org.apache.spark.sql.types.StructType,
      path: String): org.apache.spark.sql.types.StructType = {
    for (f <- batch.fields; o <- old.fields if o.name == f.name)
      require(o.dataType == f.dataType,
        s"$path: column ${f.name} changes type ${o.dataType.simpleString} -> " +
          s"${f.dataType.simpleString}; schema evolution adds columns, never retypes")
    org.apache.spark.sql.types.StructType(
      (old.fields ++ batch.fields.filterNot(f => old.fieldNames.contains(f.name)))
        .map(_.copy(nullable = true)))
  }

  /** Read the table EXACTLY as it stood at `version` — any version, any
    * time, from the immutable files its manifest lists, under the schema
    * the manifest RECORDS for that version: a version that predates an
    * added column comes back without it, and carried files that physically
    * lack a later-added column read as NULL for it (the parquet reader
    * NULL-backfills columns missing from a file when given an explicit
    * schema). */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val files = liveFiles(spark, path, version)
    require(files.nonEmpty, s"$path has no manifest for version $version")
    versionSchemaOf(spark, path, version) match {
      case Some(sc) => spark.read.schema(sc).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
  }

  /** The schema recorded in a version's manifest; None for manifests
    * written before schemas were recorded (read then falls back to
    * parquet's own inference). */
  private def versionSchemaOf(
      spark: SparkSession, path: String, v: Long): Option[org.apache.spark.sql.types.StructType] = {
    val mdir = manifestDir(path, v)
    val (fs, _) = fsOf(spark, path)
    if (!fs.exists(new Path(mdir))) None
    else {
      val m = spark.read.parquet(mdir)
      if (!m.columns.contains("schema_json")) None
      else Some(org.apache.spark.sql.types.DataType
        .fromJson(m.select(col("schema_json")).head().getString(0))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
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

  /** RESTORE an old snapshot as the table's newest version — the roll-back
    * verb that completes the lifecycle (init / upsert / read / diff /
    * vacuum / restore): a bad ingest is undone by writing a NEW version
    * whose manifest carries version `v`'s files BY REFERENCE (no data is
    * rewritten or deleted — the bad version stays readable for the
    * post-mortem, exactly Delta's RESTORE semantics), under `v`'s own
    * recorded schema. Returns the new version number. Fails loud if `v`
    * does not resolve.
    */
  def restore(spark: SparkSession, path: String, v: Long): Long = {
    val latest = latestVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"$path: not a versioned table"))
    val files = liveFiles(spark, path, v)
    require(files.nonEmpty, s"$path has no manifest for version $v")
    val schema = versionSchemaOf(spark, path, v)
      .getOrElse(spark.read.parquet(files: _*).schema)
    // No data write at all: the restore is manifest-only — every row rides
    // the carried references.
    commitManifest(spark, path, latest + 1L, files, schema.json)
  }

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
    val kept = (cutoff to latest)
      .flatMap(v => liveFiles(spark, path, v))
      .map(f => toUri(spark, f)).toSet
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
        val uri = toUri(spark, st.getPath.toString)
        if (st.isFile && uri.endsWith(".parquet") && !kept.contains(uri)) {
          fs.delete(st.getPath, false)
          removed += 1
        }
      }
      // Namespace retention: a staging directory whose data files are all
      // gone still holds _SUCCESS/.crc markers — unbounded directory growth
      // at scale. Drop non-parquet sidecars in emptied staging dirs, then
      // the dirs themselves (a dir that still holds any parquet keeps its
      // markers: committers may consult them).
      for (d <- fs.listStatus(filesRoot) if d.isDirectory) {
        val entries = fs.listStatus(d.getPath)
        if (!entries.exists(e => e.getPath.getName.endsWith(".parquet"))) {
          fs.delete(d.getPath, true): Unit
        }
      }
    }
    removed
  }

  /** `input_file_name()` URIs, `listStatus` paths and manifest-stored
    * paths must compare in ONE form; `new Path(f).toUri` alone does NOT
    * qualify (file:///x vs file:/x vs /x on HDFS/S3 render differently per
    * source), and a silent form mismatch makes `touched` match nothing —
    * files then both carried AND rewritten (duplicate rows), or vacuum
    * deleting live files. Qualify every path against the table's
    * FileSystem before comparing or storing. */
  private def toUri(spark: SparkSession, f: String): String = {
    val p = new Path(f)
    val q = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toUri
    // makeQualified preserves the INPUT's null-vs-empty authority (Path
    // "file:/x" keeps null, "file:///x" keeps ""), so render both the same.
    s"${q.getScheme}://${Option(q.getAuthority).getOrElse("")}${q.getPath}"
  }

  private def liveFiles(spark: SparkSession, path: String, v: Long): Seq[String] = {
    val mdir = manifestDir(path, v)
    val (fs, _) = fsOf(spark, path)
    if (!fs.exists(new Path(mdir))) Seq.empty
    else spark.read.parquet(mdir).select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Data files first, manifest second, latest-pointer LAST. Every manifest
    * row carries the version's schema JSON beside the file path (the
    * per-version schema that makes evolution readable; redundant per row,
    * but the manifest is one tiny file and a single-column sidecar would
    * double the crash-ordering surface). */
  private def writeVersion(
      spark: SparkSession,
      path: String,
      v: Long,
      fresh: DataFrame,
      carried: Seq[String],
      schema: org.apache.spark.sql.types.StructType = null): Long = {
    val (fs, root) = fsOf(spark, path)
    require(!fs.exists(new Path(manifestDir(path, v))),
      s"$path: version $v already exists")
    val stage = s"$path/files/v$v-${java.util.UUID.randomUUID()}"
    fresh.write.parquet(stage)
    val freshFiles = fs.listStatus(new Path(stage))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toUri.toString).toSeq
    val schemaJson = Option(schema).getOrElse(fresh.schema).json
    commitManifest(spark, path, v, freshFiles ++ carried, schemaJson)
  }

  /** The manifest-second / pointer-LAST commit tail shared by
    * [[writeVersion]] and the data-free [[restore]]. */
  private def commitManifest(
      spark: SparkSession,
      path: String,
      v: Long,
      files: Seq[String],
      schemaJson: String): Long = {
    val (fs, root) = fsOf(spark, path)
    require(!fs.exists(new Path(manifestDir(path, v))),
      s"$path: version $v already exists")
    import spark.implicits._
    files.map(f => toUri(spark, f))
      .toDF("file").withColumn("schema_json", lit(schemaJson)).coalesce(1)
      .write.parquet(manifestDir(path, v))
    Layout.writeLongFile(fs, new Path(root, LatestFile), v)
    v
  }
}
