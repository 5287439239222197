package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Transactional parquet table: an atomic-commit log over immutable
  * data files — the Delta/Iceberg pattern reduced to its invariants,
  * with no library dependency.
  *
  *   layout:  <table>/data/v<version>-<n>.parquet   (immutable)
  *            <table>/_graft_log/v<version>.json    (one per commit)
  *
  * A commit file enumerates the COMPLETE set of live data files for
  * its version. Readers resolve the newest commit file and read only
  * the files it lists, so a concurrent writer's half-written data is
  * invisible until its single commit-file publication lands — snapshot
  * isolation from two filesystem primitives (immutable data files +
  * atomic create-exclusive publish, see [[commit]] for the per-FS
  * mechanism). Two writers racing to the same version collide on the
  * identical log path and exactly one wins; the loser gets
  * [[TxConflictException]] and must rebase (re-read, re-apply,
  * re-commit) — optimistic concurrency, same contract as Delta.
  *
  * Time travel is free: every older commit file still names its
  * version's files, so `read(asOf = v)` reproduces any snapshot.
  * MERGE is copy-on-write: the new version rewrites the union of
  * (current anti updates) ++ updates as fresh files; the old files
  * stay untouched for older snapshots.
  *
  * At 100 TB the log is bounded by commits (not rows) and the data
  * path is ordinary distributed parquet. Production hardening beyond
  * scope here: per-partition file pruning in the manifest, log
  * compaction/checkpoints, and vacuum of unreferenced files.
  */
object TxTable {

  final class TxConflictException(msg: String) extends RuntimeException(msg)

  case class Snapshot(version: Long, files: Seq[String])

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(table: String) = new Path(table, "_graft_log")
  private def dataDir(table: String) = new Path(table, "data")

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".json"))
      n.stripPrefix("v").stripSuffix(".json").toLongOption
    else None
  }

  /** Newest snapshot ≤ `asOf` (or the latest). None = never written. */
  def snapshot(spark: SparkSession, table: String,
      asOf: Option[Long] = None): Option[Snapshot] = {
    val ld = logDir(table)
    val f = fs(spark, ld)
    if (!f.exists(ld)) return None
    val versions = f.listStatus(ld).toSeq
      .flatMap(s => versionOf(s.getPath))
      .filter(v => asOf.forall(v <= _))
    if (versions.isEmpty) return None
    val v = versions.max
    val body = new String(
      readFully(f, new Path(ld, s"v$v.json")), "UTF-8")
    // commit body: {"version":N,"files":["data/...","data/..."]}
    val files = "\"([^\"]+\\.parquet)\"".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    Some(Snapshot(v, files))
  }

  private def readFully(f: FileSystem, p: Path): Array[Byte] = {
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** Read the table at the newest — or a pinned — version. */
  def read(spark: SparkSession, table: String,
      asOf: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, table, asOf).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version${asOf.fold("")(v => s" <= $v")} at $table"))
    if (snap.files.isEmpty)
      throw new IllegalArgumentException(s"version ${snap.version} is empty")
    spark.read.parquet(snap.files.map(new Path(table, _).toString): _*)
  }

  /** Write `df`'s rows as new immutable files for `version`; returns
    * their table-relative paths. Files land under data/ BEFORE the
    * commit exists, so readers never see them. The staging dir and the
    * data file names carry a writer-unique tag: two writers racing to
    * the same version must not share ANY path — otherwise the commit
    * loser's renames could clobber the winner's already-published data
    * files. The loser's orphaned files stay in data/ unreferenced by
    * any commit (vacuum of unreferenced files is the documented
    * production-hardening gap). */
  private def writeFiles(df: DataFrame, table: String,
      version: Long): Seq[String] = {
    val spark = df.sparkSession
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(table, s"_tmp_v$version-$tag")
    df.write.mode("overwrite").parquet(tmp.toString)
    val f = fs(spark, tmp)
    val dd = dataDir(table)
    f.mkdirs(dd)
    val moved = f.listStatus(tmp).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.map { case (s, i) =>
        val dst = new Path(dd, s"v$version-$tag-$i.parquet")
        require(f.rename(s.getPath, dst), s"rename failed: ${s.getPath}")
        s"data/${dst.getName}"
      }
    f.delete(tmp, true)
    moved
  }

  /** Atomic commit of `files` as `version`. Throws
    * [[TxConflictException]] when another writer claimed the version
    * first — the caller re-reads and retries. Any other IO fault
    * (permissions, disk full, network) propagates as-is: misreporting
    * it as a conflict would send the caller into a rebase loop.
    *
    * The body is staged in a writer-unique temp file and PUBLISHED in
    * one filesystem primitive, so a concurrent reader either sees no
    * commit or the complete one — never a partial body:
    *   - local FS: link(2) via `Files.createLink` — an atomic
    *     create-exclusive (POSIX guarantees EEXIST on a race); plain
    *     `FileSystem.create(overwrite=false)` on RawLocalFileSystem is
    *     check-then-create and two racers can both "win".
    *   - HDFS (and any FS with atomic no-overwrite rename): rename of
    *     the temp onto the log path — atomic on the NameNode, fails if
    *     the destination exists.
    *   - object stores with last-writer-wins rename (S3A) get NO CAS
    *     from this path; they need an external coordinator (the Delta
    *     LogStore pattern) — out of scope here, documented.
    */
  private[graft] def commit(spark: SparkSession, table: String,
      version: Long, files: Seq[String]): Unit = {
    val ld = logDir(table)
    val f = fs(spark, ld)
    f.mkdirs(ld)
    val body = files.map("\"" + _ + "\"")
      .mkString(s"""{"version":$version,"files":[""", ",", "]}")
    val target = new Path(ld, s"v$version.json")
    val tmp = new Path(ld,
      s".v$version-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, /* overwrite = */ false)
    try { out.write(body.getBytes("UTF-8")); out.hflush() }
    finally out.close()
    def conflict() = new TxConflictException(
      s"version $version already committed at $table")
    try {
      if (f.getScheme == "file") {
        val dir = java.nio.file.Paths.get(ld.toUri.getPath)
        try
          java.nio.file.Files.createLink(
            dir.resolve(target.getName), dir.resolve(tmp.getName))
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw conflict()
        }
      } else {
        if (f.exists(target)) throw conflict()
        // atomic no-overwrite rename (HDFS contract); `false` without
        // an IOException means the destination appeared since the
        // check — a lost race, not an IO fault
        if (!f.rename(tmp, target)) throw conflict()
      }
    } finally f.delete(tmp, false)
  }

  /** Overwrite: next version = exactly `df`. Returns the version. */
  def overwrite(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val next = snapshot(spark, table).map(_.version + 1).getOrElse(1L)
    val files = writeFiles(df, table, next)
    commit(spark, table, next, files)
    next
  }

  /** Append: next version = current files ++ new files. No data file
    * is ever rewritten, so concurrent readers of version N are
    * untouched. */
  def append(df: DataFrame, table: String): Long = {
    val spark = df.sparkSession
    val cur = snapshot(spark, table)
    val next = cur.map(_.version + 1).getOrElse(1L)
    val files = writeFiles(df, table, next)
    commit(spark, table, next, cur.map(_.files).getOrElse(Nil) ++ files)
    next
  }

  /** MERGE (upsert) by key, copy-on-write: rows of `updates` replace
    * current rows with the same key, everything else carries over,
    * all rewritten as the next version's files. The relational
    * semantics are the same anti-join+union as `q_cdc_apply`; what
    * this adds is the atomicity — a reader mid-merge sees version N
    * or N+1, never a mixture. */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
      key: String): Long = {
    val cur = snapshot(spark, table)
    val next = cur.map(_.version + 1).getOrElse(1L)
    val merged = cur match {
      case None => updates
      case Some(_) =>
        read(spark, table)
          .join(updates.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(updates)
    }
    val files = writeFiles(merged, table, next)
    commit(spark, table, next, files)
    next
  }
}
