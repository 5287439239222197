package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one step of a [[TxTable]] commit that must be ATOMIC: turning a
  * fully-built manifest body into the published commit file. Everything
  * else in a commit (data files, staging) uses writer-unique names and
  * cannot race; this step is where two writers claim the SAME path, so
  * the filesystem must arbitrate — and which primitive actually
  * arbitrates is per-store:
  *
  *   - local POSIX: `link(2)` is create-exclusive (EEXIST on a race);
  *     plain `FileSystem.create(overwrite=false)` on
  *     RawLocalFileSystem is check-then-create and two racers can both
  *     "win".
  *   - HDFS: rename with an existing destination fails atomically on
  *     the NameNode.
  *   - object stores (S3 and friends): rename is copy + last-writer-
  *     wins and create is check-then-create — NEITHER arbitrates. The
  *     store's own conditional write (S3 `PutObject If-None-Match`,
  *     GCS `ifGenerationMatch=0`, Azure `If-None-Match: *` ETag) is
  *     the only single-winner primitive, so commits must go through
  *     [[ConditionalPutProtocol]] wired to that API (the Delta
  *     LogStore pattern). To keep a misconfigured cluster from
  *     silently losing commits, [[CommitProtocol.forScheme]] REFUSES
  *     known last-writer-wins schemes with no registered protocol
  *     rather than defaulting to rename.
  */
trait CommitProtocol {
  /** Publish `body` at `target` iff nothing is published there yet.
    * Contract: of N concurrent publishers of the same target, EXACTLY
    * one returns true; the rest return false (lost race) — and after
    * any true return, readers of `target` see the complete winning
    * body, never a partial one. IO faults (permissions, disk full)
    * must THROW, not return false: a misreported conflict sends the
    * caller into a futile rebase loop. */
  def publish(f: FileSystem, target: Path, body: Array[Byte]): Boolean
}

object CommitProtocol {

  /** Write `body` to a writer-unique sibling of `target` (unique name
    * → no race on this path, any create mode works) and flush it. */
  private def stage(f: FileSystem, target: Path, body: Array[Byte]): Path = {
    val tmp = new Path(target.getParent,
      s".${target.getName}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, /* overwrite = */ true)
    try { out.write(body); out.hflush() } finally out.close()
    tmp
  }

  /** POSIX local FS: stage + `link(2)` — the kernel returns EEXIST to
    * every publisher but one, even under a perfectly timed race. */
  object LocalLink extends CommitProtocol {
    override def publish(f: FileSystem, target: Path,
        body: Array[Byte]): Boolean = {
      val tmp = stage(f, target, body)
      try {
        val dir = java.nio.file.Paths.get(target.getParent.toUri.getPath)
        try {
          java.nio.file.Files.createLink(
            dir.resolve(target.getName), dir.resolve(tmp.getName))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } finally f.delete(tmp, false)
    }
  }

  /** HDFS (and any FS whose rename is atomic and fails on an existing
    * destination): stage + no-overwrite rename. The pre-check only
    * short-circuits; arbitration is the rename itself — `false`
    * without an IOException means the destination appeared since the
    * check, a lost race, not an IO fault. */
  object HdfsRename extends CommitProtocol {
    override def publish(f: FileSystem, target: Path,
        body: Array[Byte]): Boolean = {
      val tmp = stage(f, target, body)
      try {
        if (f.exists(target)) false
        else f.rename(tmp, target)
      } finally f.delete(tmp, false)
    }
  }

  /** Object stores: delegate arbitration to the store's conditional
    * write. `cas(target, body)` must perform the store's atomic
    * create-if-absent (S3 `If-None-Match: *`, GCS
    * `ifGenerationMatch=0`, Azure ETag precondition) and return
    * whether THIS call created the object — with the winning body
    * fully visible to readers before it returns true. No staging
    * file: the conditional put IS the write. */
  final class ConditionalPutProtocol(
      cas: (Path, Array[Byte]) => Boolean) extends CommitProtocol {
    override def publish(f: FileSystem, target: Path,
        body: Array[Byte]): Boolean = cas(target, body)
  }

  /** Schemes whose rename/create primitives are last-writer-wins:
    * publishing through [[HdfsRename]] there can silently drop a
    * commit, so an explicit [[register]] is required. */
  private val LastWriterWins = Set("s3", "s3a", "s3n", "gs", "oss", "cos")

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitProtocol]()

  /** Install the commit protocol for a URI scheme (e.g. an
    * [[ConditionalPutProtocol]] wired to the store's conditional-put
    * API for `s3a`). Overrides the built-in choice for that scheme. */
  def register(scheme: String, p: CommitProtocol): Unit =
    registry.put(scheme, p)

  /** The protocol for a scheme: a registration if present, else
    * link(2) for `file`, else — for schemes with an atomic
    * no-overwrite rename — [[HdfsRename]]. Known last-writer-wins
    * schemes with no registration FAIL here, at commit time, with the
    * remedy in the message: that is the difference between a loud
    * misconfiguration and a silently lost commit. */
  def forScheme(scheme: String): CommitProtocol = {
    val s = Option(scheme).getOrElse("").toLowerCase
    Option(registry.get(s)).getOrElse {
      if (s == "file") LocalLink
      else if (LastWriterWins(s)) throw new IllegalStateException(
        s"scheme '$s' has no atomic create-exclusive primitive: register " +
          "a ConditionalPutProtocol wired to the store's conditional-put " +
          s"API via CommitProtocol.register(\"$s\", ...) before committing")
      else HdfsRename
    }
  }
}
