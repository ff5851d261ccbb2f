package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rel.Relational

/** Versioned copy-on-write table layout — a miniature of the
  * Delta/Iceberg commit model on plain parquet (beyond-reference
  * source/sink surface; the lifecycle layer over
  * [[Relational.mergeUpsert]], whose doc names exactly this file-level
  * pruning as what table formats add to the merge join).
  *
  * Layout under `root`:
  * {{{
  *   files/<uuid>/part-*.parquet     immutable data files, never edited
  *   _graft_manifest/v=N/            parquet manifest: one row per data
  *                                   file (path, min_key, max_key, rows)
  * }}}
  *
  * A version IS its manifest — a list of immutable files plus per-file
  * key bounds. [[merge]] commits version N+1 by rewriting ONLY the data
  * files whose [min_key, max_key] range intersects the change batch's
  * keys; every other file entry is carried into the new manifest
  * verbatim (spec-gated). Old versions stay readable forever (time
  * travel) because no commit ever mutates or deletes a data file.
  *
  * Scale shape: the manifest is file-count-sized (KBs per million
  * files), so routing a change batch to affected files is a BROADCAST
  * range join — the 100-TB table itself is only scanned for the
  * affected fraction, and an update batch touching 0.1% of the key
  * space rewrites ~0.1% of the bytes. Per-file stats are collected in
  * ONE column-pruned pass grouped by `input_file_name()` at write time
  * (production table formats read the same min/max from parquet
  * footers; the numbers are identical). Snapshot reads list the
  * manifest, not the directory — no eventually-consistent listing, and
  * a reader never sees a half-committed version because the manifest
  * is written to a temp directory and RENAMED into `v=N` as the commit
  * point ([[commitManifest]]) — `hasVersion`/`latestVersion` key on
  * the directory name, which only exists post-rename.
  *
  * Scope note: this layer addresses local/HDFS-style filesystems where
  * directory rename is atomic (`java.io.File`); an object-store port
  * would swap the rename for a conditional PUT of a single manifest
  * object (the Delta commit-log pattern) — the manifest schema and
  * pruning logic are storage-agnostic.
  */
object Versioned {

  private def manifestDir(root: String, version: Int): String =
    s"$root/_graft_manifest/v=$version"

  /** Atomic manifest commit: write the manifest parquet into a temp
    * directory, then RENAME it to `v=N`. The version directory —
    * which [[hasVersion]]/[[latestVersion]] key on — appears only
    * after every byte of the manifest is on disk, so a concurrent
    * reader can never observe a half-written manifest (directory
    * rename is atomic on local/HDFS-style filesystems).
    */
  private def commitManifest(stats: DataFrame, root: String,
                             version: Int): Unit = {
    val tmp = s"$root/_graft_manifest/_tmp_v${version}_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    stats.coalesce(1).write.mode("overwrite").parquet(tmp)
    val target = new java.io.File(manifestDir(root, version))
    if (target.exists()) { // replace semantics (test re-runs)
      Option(target.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      target.delete()
    }
    if (!new java.io.File(tmp).renameTo(target))
      sys.error(s"manifest commit failed: rename $tmp -> $target")
  }

  /** One row per data file of `version`. */
  def manifest(s: SparkSession, root: String, version: Int): DataFrame =
    s.read.parquet(manifestDir(root, version))

  def hasVersion(root: String, version: Int): Boolean =
    new java.io.File(manifestDir(root, version)).exists()

  /** Highest committed version under `root`. */
  def latestVersion(root: String): Int = {
    val manRoot = new java.io.File(s"$root/_graft_manifest")
    Option(manRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toInt)
      .maxOption.getOrElse(sys.error(s"no versions at $root"))
  }

  /** Per-file (path, min_key, max_key, rows) for freshly written
    * files — one column-pruned scan grouped by file.
    */
  private def fileStats(s: SparkSession, paths: Seq[String],
                        keyCol: String): DataFrame =
    s.read.parquet(paths: _*)
      .select(col(keyCol).cast("long").as("__k"),
        input_file_name().as("path"))
      .groupBy("path")
      .agg(min("__k").as("min_key"), max("__k").as("max_key"),
        count(lit(1)).as("rows"))

  private def listParquet(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-")
        && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq.sorted
  }

  /** Write a new immutable file group; returns its stats rows. */
  private def writeFileGroup(df: DataFrame, root: String, keyCol: String,
                             nFiles: Int): DataFrame = {
    val dir = s"$root/files/" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    df.repartitionByRange(math.max(1, nFiles), col(keyCol))
      .write.mode("overwrite").parquet(dir)
    fileStats(df.sparkSession, listParquet(dir), keyCol)
  }

  /** Commit `df` as `version` (a full snapshot — the initial load). */
  def write(df: DataFrame, root: String, keyCol: String, version: Int,
            nFiles: Int): Unit = {
    val stats = writeFileGroup(df, root, keyCol, nFiles)
    commitManifest(stats, root, version)
  }

  /** Snapshot read of `version`: exactly its manifest's files. */
  def readAsOf(s: SparkSession, root: String, version: Int): DataFrame = {
    val paths = manifest(s, root, version)
      .select("path").collect().map(_.getString(0)).toSeq
    s.read.parquet(paths: _*)
  }

  /** Paths of `version`'s files whose [min_key, max_key] range
    * intersects [lo, hi] — manifest-level data skipping, the
    * key-range analog of partition pruning. File-count-sized driver
    * work; the pruned files are never listed, opened, or footer-read.
    */
  private[graft] def prunedPaths(s: SparkSession, root: String,
                                 version: Int, lo: Long,
                                 hi: Long): Seq[String] =
    manifest(s, root, version)
      .filter(col("max_key") >= lo && col("min_key") <= hi)
      .select("path").collect().map(_.getString(0)).toSeq

  /** Snapshot read restricted to key range [lo, hi]: the manifest
    * prunes whole files BEFORE the scan plan exists, then the residual
    * predicate (still pushed to the parquet reader) finishes the job —
    * at 100 TB a point-ish lookup touches one file group, not the
    * table. Returns an empty (schema-correct) frame when every file
    * prunes.
    */
  def readAsOfWhere(s: SparkSession, root: String, version: Int,
                    keyCol: String, lo: Long, hi: Long): DataFrame = {
    val paths = prunedPaths(s, root, version, lo, hi)
    val all =
      if (paths.nonEmpty) s.read.parquet(paths: _*)
      else s.read.parquet(manifest(s, root, version)
          .select("path").first().getString(0))
        .filter(lit(false))
    all.filter(col(keyCol).cast("long") >= lo
      && col(keyCol).cast("long") <= hi)
  }

  /** Expire old snapshots: drop every manifest older than the newest
    * `keepVersions`, then delete data files no surviving manifest
    * references (never a file a live version can still read). Returns
    * the deleted data-file count. Driver work is manifest-sized.
    */
  def expire(s: SparkSession, root: String, keepVersions: Int): Int = {
    val manRoot = new java.io.File(s"$root/_graft_manifest")
    val versions = Option(manRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toInt).sorted
    val keep = versions.takeRight(keepVersions).toSet
    val dead = versions.filterNot(keep)
    val live = keep.toSeq.flatMap(v =>
      manifest(s, root, v).select("path").collect().map(_.getString(0)))
      .toSet
    val deadRefs = dead.flatMap(v =>
      manifest(s, root, v).select("path").collect().map(_.getString(0)))
      .toSet
    val toDelete = deadRefs -- live
    toDelete.foreach { p =>
      val f = new java.io.File(new java.net.URI(p).getPath)
      f.delete()
    }
    dead.foreach { v =>
      val d = new java.io.File(manifestDir(root, v))
      Option(d.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      d.delete()
    }
    toDelete.size
  }

  /** Commit `toVersion` = `fromVersion` + `changes` (columns of the
    * table plus `opCol`: 'U' upsert / 'D' delete, at most one row per
    * key — the [[Relational.mergeUpsert]] contract).
    *
    * Copy-on-write: a file is rewritten iff some change key falls in
    * its [min_key, max_key]; change keys outside every range (pure
    * inserts) form a new file. Untouched manifest entries carry over
    * byte-identical.
    */
  def merge(s: SparkSession, root: String, keyCol: String, opCol: String,
            changes: DataFrame, fromVersion: Int, toVersion: Int): Unit = {
    val man = manifest(s, root, fromVersion).cache()
    // file-count-sized broadcast range join routes each change row to
    // the file whose key range holds it (null = net-new key space)
    val routed = changes.withColumn("__k", col(keyCol).cast("long"))
      .join(broadcast(man),
        col("__k") >= col("min_key") && col("__k") <= col("max_key"),
        "left")
    val affected = routed.filter(col("path").isNotNull)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    val untouched = man.filter(!col("path").isin(affected.toSeq: _*))
    val hasInserts = !changes.filter(col(opCol) === "U").isEmpty
    import s.implicits._
    val newStats =
      if (affected.isEmpty && !hasInserts) {
        // deletes into untouched key space: nothing to rewrite
        Seq.empty[(String, Long, Long, Long)]
          .toDF("path", "min_key", "max_key", "rows")
      } else {
        val base =
          if (affected.isEmpty) {
            // insert-only commit into net-new key space: empty base
            // with the table's schema
            s.read.parquet(man.select("path").first().getString(0))
              .filter(lit(false))
          } else s.read.parquet(affected.toSeq: _*)
        val merged = Relational.mergeUpsert(base, changes, keyCol, opCol)
        writeFileGroup(merged, root, keyCol, math.max(1, affected.size))
      }
    commitManifest(untouched.unionByName(newStats), root, toVersion)
    man.unpersist(blocking = false)
  }
}
