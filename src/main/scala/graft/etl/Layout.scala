package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout levers for scan pruning at 100 TB.
  *
  * Parquet/scan pruning works off per-file (and per-rowgroup) min/max
  * statistics; a layout where each file spans the full domain of a
  * filter column prunes nothing. Sorting solves it for ONE column;
  * Z-ORDER (Morton-curve) clustering solves it for several at once:
  * interleave the bits of the (normalized) column values and
  * range-partition + sort by the interleaved key, so files become
  * hyper-rectangles in the multi-dimensional key space and a filter on
  * ANY clustered column skips most files.
  */
object Layout {

  /** Bit-spread of the low 32 bits of `x` into even bit positions
    * (Morton spreading via the classic mask cascade — pure codegen'd
    * long arithmetic, no UDF). */
  private[etl] def spreadBits(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton (Z-order) key of two NON-NEGATIVE integer columns
    * (callers map their domain onto [0, 2^31) first — e.g. epoch
    * seconds, dictionary ranks, bucketed doubles). */
  def zOrder2(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Write `df` as parquet clustered on the Z-order of two columns:
    * min/max-normalize both dimensions onto [0, 2^20) — WITHOUT this,
    * the wider-domain column dominates the curve's high bits and the
    * layout degenerates to a plain sort on it — then range-partition
    * on the Morton key into `numFiles` ranges, sort within each, drop
    * the key. Filters on EITHER column then prune most files via
    * footer min/max, where a single-column sort only helps that one
    * column. Cost: one tiny min/max agg job + the same single shuffle
    * a sorted write pays anyway. */
  def writeZOrdered(df: DataFrame, path: String,
      colA: String, colB: String, numFiles: Int): Unit = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    def norm(c: Column, lo: Double, hi: Double): Column =
      ((c.cast("double") - lo) / math.max(hi - lo, 1e-300)
        * ((1 << 20) - 1)).cast("long")
    df.withColumn("__z", zOrder2(
        norm(col(colA), r.getDouble(0), r.getDouble(1)),
        norm(col(colB), r.getDouble(2), r.getDouble(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` range-clustered on `clusterCol` into ~`numFiles`
    * parquet files AND record an explicit zone map (per-file min/max
    * of the cluster column) under `path/_zonemap` — the data-skipping
    * manifest pattern (Delta/Iceberg file stats): a range predicate
    * consults the manifest and opens only overlapping files, skipping
    * even the footer reads a parquet row-group filter still pays. The
    * `_`-prefixed manifest dir is invisible to plain readers of
    * `path`. Cost: the same single range shuffle a sorted write pays,
    * plus one file-grain aggregation over the written data. */
  def writeZoneMapped(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    val manifest = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(clusterCol)).as("min_v"), max(col(clusterCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
    manifest.coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap")
    manifest.coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap_v/1")
  }

  /** Committed manifest versions of a zone-mapped dataset, ascending
    * (1 = the initial [[writeZoneMapped]]; each [[appendZoneMapped]]
    * adds one). A filesystem listing — metadata-scale. */
  def zoneMapVersions(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Long] = {
    val vRoot = new org.apache.hadoop.fs.Path(s"$path/_zonemap_v")
    val fs = vRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(vRoot)) Seq.empty
    else fs.listStatus(vRoot).filter(_.isDirectory)
      .flatMap(d => scala.util.Try(d.getPath.getName.toLong).toOption)
      .sorted.toSeq
  }

  /** TIME-TRAVEL read: the dataset exactly as of manifest `version`.
    * The layout is append-only (appends — and [[compactZoneMapped]] —
    * land NEW files and commit a new manifest version; committed
    * files are never rewritten), so the version's file list IS the
    * snapshot — reading those files reproduces the table as
    * committed then, regardless of what was appended since.
    * Metadata-scale: one small manifest read, then a plain parquet
    * scan of the listed files (all pushdowns apply). Versions
    * dropped by [[vacuumZoneMapped]] refuse LOUDLY (never a silent
    * wrong answer): a missing manifest or a manifest whose files
    * were physically removed both raise a pointed error naming the
    * retention horizon. */
  def readZoneMappedAsOf(spark: org.apache.spark.sql.SparkSession,
      path: String, version: Long): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vDir = new org.apache.hadoop.fs.Path(s"$path/_zonemap_v/$version")
    if (!fs.exists(vDir)) {
      val retained = zoneMapVersions(spark, path)
      throw new IllegalStateException(
        s"time-travel read of $path as of version $version: that " +
          s"version is past the retention horizon (vacuumed); retained " +
          s"versions: ${if (retained.isEmpty) "none" else retained.mkString(", ")}")
    }
    val files = spark.read.parquet(vDir.toString)
      .select("file").collect().map(_.getString(0))
    val missing = files.filterNot(f =>
      fs.exists(new org.apache.hadoop.fs.Path(new java.net.URI(f))))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"time-travel read of $path as of version $version: " +
          s"${missing.length} of ${files.length} snapshot files were " +
          "physically removed (vacuumed or externally deleted) — run " +
          "against the current table or a retained version " +
          s"(${zoneMapVersions(spark, path).mkString(", ")})")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** [[readZonePruned]] against a historical manifest version: zone
    * pruning AND time travel compose — only the snapshot's files
    * whose [min, max] overlaps [lo, hi] are opened. */
  def readZonePrunedAsOf(spark: org.apache.spark.sql.SparkSession,
      path: String, version: Long, lo: Column, hi: Column): DataFrame = {
    val zm = spark.read.parquet(s"$path/_zonemap_v/$version")
    val files = zm.where(col("max_v") >= lo && col("min_v") <= hi)
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(path).schema)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Scan of `path` pruned by the zone map: only files whose
    * [min, max] overlaps [lo, hi] are opened (the residual per-row
    * predicate remains the caller's job — zone maps bound files, not
    * rows). The manifest read + overlap filter is metadata-scale (one
    * row per file); the returned scan is a plain pruned parquet read,
    * so every downstream pushdown still applies. Returns an empty
    * frame of the right schema when nothing overlaps. */
  def readZonePruned(spark: org.apache.spark.sql.SparkSession,
      path: String, lo: Column, hi: Column): DataFrame = {
    val zm = spark.read.parquet(s"$path/_zonemap")
    val files = zm.where(col("max_v") >= lo && col("min_v") <= hi)
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(path).schema)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Append a batch to a zone-mapped dataset and maintain the
    * manifest INCREMENTALLY: the batch lands range-clustered as new
    * files, per-file stats are computed from ONLY those files, and
    * the manifest becomes old ∪ new (manifest rows are metadata-scale
    * — one per file — so the swap materializes driver-side, like
    * every table-format metadata commit). Batches cluster internally;
    * cross-batch ranges may overlap — pruning stays CORRECT (the
    * overlap test is per file), merely less selective until a
    * compaction re-clusters. */
  def appendZoneMapped(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit = {
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles: Set[String] = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSet
    val before = dataFiles
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("append").parquet(path)
    val added = (dataFiles -- before).toSeq
    // an empty delta can legitimately commit zero part files — a
    // no-op append must not fail the job (and has no manifest delta)
    if (added.isEmpty) return
    val newStats = spark.read.parquet(added: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(clusterCol)).as("min_v"), max(col(clusterCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
    // A dataset written before versioning existed has a _zonemap but
    // no _zonemap_v: backfill ITS manifest as version 1 first, so
    // the post-append commit below never masquerades as the original
    // snapshot (readZoneMappedAsOf(path, 1) must mean "as first
    // written", not "after this append").
    val versions = zoneMapVersions(spark, path)
    if (versions.isEmpty)
      spark.read.parquet(s"$path/_zonemap").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/_zonemap_v/1")
    val next = zoneMapVersions(spark, path).last + 1
    // Commit the snapshot manifest first (a NEW path — a distributed
    // union write, never a driver-side collect: at millions of files
    // the manifest is a small table, not driver memory), then republish
    // the current-table manifest by reading the committed version back
    // (reading the OLD _zonemap while overwriting it would race).
    spark.read.parquet(s"$path/_zonemap").unionByName(newStats)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap_v/$next")
    spark.read.parquet(s"$path/_zonemap_v/$next").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  /** Write `df` with a FILE-MEMBERSHIP sketch on `keyCol` — the
    * point-lookup complement of the zone map's range pruning: the
    * manifest records, per file, the SET of 16-bit hash slots its
    * keys occupy (`pmod(xxhash64(key), 65536)`), so an equality probe
    * opens only files whose slot set contains the probe's slot. No
    * false negatives (every key sets its slot); false positives are
    * hash collisions (~n_distinct/65536 per file), which the caller's
    * exact residual predicate absorbs. Unlike the zone map this needs
    * NO clustering — it prunes even a layout ordered for some other
    * column. Manifest size: ≤ min(distinct keys, 65536) ints per
    * file. */
  def writeMemberMapped(df: DataFrame, path: String, keyCol: String,
      numFiles: Int): Unit = {
    df.repartition(numFiles)
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      // hash the STRING rendering: xxhash64 is type-sensitive, and a
      // probe literal of a different width (int vs long) would
      // silently prune the wrong files — a false NEGATIVE
      .agg(sort_array(collect_set(
          pmod(xxhash64(col(keyCol).cast("string")), lit(65536L))))
          .as("slots"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_memmap")
  }

  /** Scan of `path` pruned by the membership sketch: only files whose
    * slot set contains `value`'s hash slot are opened (the exact
    * equality predicate remains the caller's job — collisions pass
    * the sketch). Metadata-scale manifest probe, then a plain pruned
    * parquet read. */
  def readMemberPruned(spark: org.apache.spark.sql.SparkSession,
      path: String, value: Column): DataFrame = {
    val mm = spark.read.parquet(s"$path/_memmap")
    val files = mm.where(array_contains(col("slots"),
        pmod(xxhash64(value.cast("string")), lit(65536L))))
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(path).schema)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. The file-count decision reads ONLY
    * filesystem metadata (listing sizes — a driver-side metadata walk,
    * no data read); the rewrite itself is one scan + shuffle-free
    * coalesce when shrinking the file count (the normal case), or a
    * round-robin repartition when growing it. The streaming-ingest
    * companion: micro-batches land thousands of KB-sized files whose
    * per-file open/footer cost dominates scans until compacted. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(hPath)
    // A partitioned layout (key=value subdirs) would be silently
    // flattened by a read+rewrite — refuse it; compact leaf dirs.
    // Hidden/metadata dirs (_temporary from a crashed write, .crc
    // dirs) are not partition layout — ignore them like the .parquet
    // file filter below ignores non-data files.
    require(!entries.exists(e => e.isDirectory && {
        val n = e.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      }),
      s"compact() rewrites FLAT parquet dirs only; $path contains " +
        "subdirectories (partitioned layout) — compact each leaf instead")
    val files = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val out = if (nFiles <= files.length) df.coalesce(nFiles)
      else df.repartition(nFiles)
    // Write beside, then swap via rename-aside: the published path is
    // replaced by two renames, so a crash at any point leaves either
    // the old or the new data recoverable on disk (never only a
    // half-deleted dir, as delete-then-rename would).
    val tmp = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "__compacting")
    val aside = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "__precompact")
    out.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(aside)) fs.delete(aside, true)
    if (!fs.rename(hPath, aside))
      throw new java.io.IOException(s"compact: could not move $hPath aside")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(aside, hPath) // roll back so the path never stays absent
      fs.delete(tmp, true) // don't leave the temp dir behind on rollback
      throw new java.io.IOException(s"compact: could not publish $tmp")
    }
    fs.delete(aside, true)
    nFiles
  }

  /** Small-file compaction for a ZONE-MAPPED dataset, version-aware
    * (the Delta OPTIMIZE model): the current snapshot's rows are
    * rewritten re-clustered as NEW files committed as a NEW manifest
    * version — previously committed files are NOT touched, so every
    * retained time-travel version stays readable until
    * [[vacuumZoneMapped]] reclaims it. Contrast [[compact]], which
    * rewrites a plain directory in place and therefore cannot
    * preserve history. Cost: one pruned scan + the range shuffle a
    * clustered write always pays; superseded files are reclaimed by
    * vacuum, not here. */
  def compactZoneMapped(spark: org.apache.spark.sql.SparkSession,
      path: String, clusterCol: String, numFiles: Int): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles: Set[String] = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSet
    val current = spark.read.parquet(s"$path/_zonemap")
      .select("file").collect().map(_.getString(0))
    val before = dataFiles
    spark.read.parquet(current.toIndexedSeq: _*)
      .repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("append").parquet(path)
    val added = (dataFiles -- before).toSeq
    val newManifest = spark.read.parquet(added: _*)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(clusterCol)).as("min_v"), max(col(clusterCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
    if (zoneMapVersions(spark, path).isEmpty)
      spark.read.parquet(s"$path/_zonemap").coalesce(1)
        .write.mode("overwrite").parquet(s"$path/_zonemap_v/1")
    val next = zoneMapVersions(spark, path).last + 1
    newManifest.coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap_v/$next")
    spark.read.parquet(s"$path/_zonemap_v/$next").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap")
    next
  }

  /** RETENTION (Delta VACUUM semantics): keep the newest `keepLast`
    * manifest versions, drop every older version's manifest, and
    * physically delete data files referenced ONLY by dropped
    * versions. After vacuum, [[readZoneMappedAsOf]] on a dropped
    * version fails with a pointed error naming the retained horizon
    * — never a silent wrong answer. Metadata-scale: manifests are
    * one row per file; the delete set is computed as (all committed
    * files) minus (files referenced by any retained version).
    * Returns the number of data files deleted. */
  def vacuumZoneMapped(spark: org.apache.spark.sql.SparkSession,
      path: String, keepLast: Int): Int = {
    require(keepLast >= 1, "vacuum must retain at least one version")
    val versions = zoneMapVersions(spark, path)
    if (versions.size <= keepLast) return 0
    val (dropped, retained) = versions.splitAt(versions.size - keepLast)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def filesOf(vs: Seq[Long]): Set[String] =
      if (vs.isEmpty) Set.empty
      else spark.read.parquet(vs.map(v => s"$path/_zonemap_v/$v"): _*)
        .select("file").distinct().collect().map(_.getString(0)).toSet
    val keep = filesOf(retained)
    val dead = filesOf(dropped) -- keep
    var deleted = 0
    dead.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(f))
      if (fs.delete(p, false)) deleted += 1
    }
    dropped.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_zonemap_v/$v"), true)
    }
    deleted
  }
}
