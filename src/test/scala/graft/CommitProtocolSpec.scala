package graft

import java.net.URI
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.{FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CommitProtocol, TxTable}

/** An object store in miniature: a local FS whose
  * `create(overwrite=false)` is CHECK-THEN-CREATE (the exists check
  * and the create are separate steps with a scheduling window between
  * them — two racers can both "succeed") and whose rename is
  * last-writer-wins (clobbers an existing destination). This is the
  * S3A failure model the [[CommitProtocol]] seam exists for. */
class RacyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "racy"
  override def getUri: URI = URI.create("racy:///")

  override def create(p: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      // deliberately non-atomic: check, yield the race window, create
      if (exists(p))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
      Thread.sleep(25)
    }
    super.create(p, permission, /* overwrite = */ true, bufferSize,
      replication, blockSize, progress)
  }

  // last-writer-wins rename: an existing destination is clobbered,
  // exactly like an object-store copy — no arbitration from this path
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
  }
}

/** The commit-publication seam: exactly one racer may win. Proves the
  * mock FS genuinely double-wins through the naive primitives, that
  * the conditional-put protocol arbitrates to a single winner on that
  * same FS, that known last-writer-wins schemes fail fast when
  * unregistered, and that a full TxTable append race on the mock
  * scheme ends with one winner, one TxConflictException, and a
  * consistent table. */
class CommitProtocolSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def racyFs(): FileSystem = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("fs.racy.impl", classOf[RacyFileSystem].getName)
    FileSystem.get(URI.create("racy:///"), conf)
  }

  private def tmpDir(): Path = new Path("racy://" +
    java.nio.file.Files.createTempDirectory("graft_racy").toString)

  /** Run `body` from `n` threads released together; collect results. */
  private def race[A](n: Int)(body: Int => A): Seq[Either[Throwable, A]] = {
    val pool = Executors.newFixedThreadPool(n)
    val go = new CountDownLatch(1)
    try {
      val futs = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Either[Throwable, A]] {
          def call(): Either[Throwable, A] = {
            go.await()
            try Right(body(i)) catch { case t: Throwable => Left(t) }
          }
        })
      }
      go.countDown()
      futs.map(_.get(120, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  test("the mock FS is genuinely non-atomic: naive create-exclusive double-wins") {
    val f = racyFs()
    val dir = tmpDir()
    f.mkdirs(dir)
    var sawDoubleWin = false
    for (it <- 0 until 10 if !sawDoubleWin) {
      val target = new Path(dir, s"naive-$it.json")
      val wins = race(4) { i =>
        // the check-then-create publish an object store actually gives
        // you: both racers pass the exists check, both create
        val out = f.create(target, /* overwrite = */ false)
        try out.write(s"writer-$i".getBytes("UTF-8")) finally out.close()
        true
      }.count(_.isRight)
      if (wins > 1) sawDoubleWin = true
    }
    assert(sawDoubleWin,
      "mock FS let only one create(overwrite=false) through — the race " +
        "window is gone and the protocol tests below prove nothing")
  }

  test("conditional-put protocol: exactly one winner per target, every time") {
    val f = racyFs()
    val dir = tmpDir()
    f.mkdirs(dir)
    // the store's server-side arbitration: one atomic decision per
    // key, winner's object fully visible before publish returns true
    val served = new ConcurrentHashMap[String, Integer]()
    val protocol = new CommitProtocol.ConditionalPutProtocol((p, body) => {
      val tmp = new Path(p.getParent,
        s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, true)
      try out.write(body) finally out.close()
      if (served.putIfAbsent(p.toString, 1) == null) { f.rename(tmp, p); true }
      else { f.delete(tmp, false); false }
    })
    for (it <- 0 until 20) {
      val target = new Path(dir, s"v$it.json")
      val results = race(4) { i =>
        protocol.publish(f, target, s"""{"writer":$i}""".getBytes("UTF-8"))
      }
      assert(results.forall(_.isRight), s"iteration $it: IO fault in race")
      val winners = results.collect { case Right(true) => 1 }.size
      assert(winners == 1, s"iteration $it: $winners winners, want exactly 1")
      // the published body is one complete writer body, not a mixture
      val in = f.open(target)
      val body = try scala.io.Source.fromInputStream(in).mkString
        finally in.close()
      assert(body.matches("""\{"writer":\d\}"""), s"partial body: $body")
    }
  }

  test("known last-writer-wins schemes fail fast when unregistered") {
    val err = intercept[IllegalStateException] {
      CommitProtocol.forScheme("s3a")
    }
    assert(err.getMessage.contains("register"),
      s"remedy missing from the message: ${err.getMessage}")
    // and a registration clears it
    val noop = new CommitProtocol.ConditionalPutProtocol((_, _) => true)
    CommitProtocol.register("s3a", noop)
    try assert(CommitProtocol.forScheme("s3a") eq noop)
    finally CommitProtocol.register("s3a",
      // restore fail-fast for other suites: re-register a protocol
      // that refuses, mirroring the unregistered behavior
      new CommitProtocol.ConditionalPutProtocol((_, _) =>
        throw new IllegalStateException("register a real protocol")))
  }

  test("TxTable append race on the object-store mock: one winner, one rebase signal") {
    // route the racy scheme through a real conditional-put protocol
    val f = racyFs()
    val served = new ConcurrentHashMap[String, Integer]()
    CommitProtocol.register("racy",
      new CommitProtocol.ConditionalPutProtocol((p, body) => {
        val tmp = new Path(p.getParent,
          s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}")
        val out = f.create(tmp, true)
        try out.write(body) finally out.close()
        if (served.putIfAbsent(p.toString, 1) == null) { f.rename(tmp, p); true }
        else { f.delete(tmp, false); false }
      }))
    // the mock FS must serve TxTable's file IO too
    spark.sparkContext.hadoopConfiguration
      .set("fs.racy.impl", classOf[RacyFileSystem].getName)
    import spark.implicits._
    val table = tmpDir().toString
    TxTable.overwrite(Seq((0L, "base")).toDF("id", "s"), table)
    for (round <- 1 to 3) {
      val results = race(2) { i =>
        TxTable.append(
          Seq((round * 10L + i, s"r$round-w$i")).toDF("id", "s"), table)
      }
      val winners = results.collect { case Right(v) => v }
      val losers = results.collect { case Left(t) => t }
      assert(winners.size == 1, s"round $round: ${winners.size} winners")
      assert(losers.size == 1 &&
        losers.head.isInstanceOf[TxTable.TxConflictException],
        s"round $round: loser got ${losers.headOption}")
    }
    // table state: base row + exactly the 3 winning appends, and the
    // losers' orphaned data files are invisible to every snapshot
    val snap = TxTable.snapshot(spark, table).get
    assert(snap.version == 4L)
    val rows = TxTable.read(spark, table).count()
    assert(rows == 4L, s"expected base + 3 winner rows, got $rows")
  }
}
