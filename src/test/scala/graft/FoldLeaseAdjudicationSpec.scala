package graft

import graft.ops.FoldLease

import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Models default S3A's non-atomic create(overwrite = false) — the
  * exists check is check-then-act and a racing writer's PUT can win
  * without this writer's create ever throwing (r16 advice). The mock
  * succeeds spuriously when the marker already exists and DISCARDS
  * the writes (the racing writer's object is what the store keeps),
  * which is exactly the interleaving where, pre-fix, two distinct
  * writers both believed they held the single-writer lease.
  */
class NonAtomicCreateFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftnonatomic:///")
  // RawLocalFileSystem overrides BOTH create variants directly, so the
  // spurious-success model has to sit on both to cover every call path
  override def create(
      f: HPath, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (!overwrite && exists(f))
      new FSDataOutputStream(new java.io.ByteArrayOutputStream(), null)
    else super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  override def create(
      f: HPath, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (!overwrite && exists(f))
      new FSDataOutputStream(new java.io.ByteArrayOutputStream(), null)
    else super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
}

/** Models the LATE-CLOSE interleaving the discard-mock above cannot
  * (r17 advice): on S3 the object only becomes visible at close(),
  * LAST writer wins — so a loser whose stale exists-check raced
  * before the winner's PUT can land its own object AFTER the
  * winner's read-back. create(overwrite = false) over an existing
  * marker "succeeds" and the bytes land at close (overwriting),
  * which is the both-writes-land ordering.
  */
class LateCloseFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftlateclose:///")
  private def landAtClose(f: HPath): FSDataOutputStream = {
    val target = pathToFile(f)
    val buf = new java.io.ByteArrayOutputStream()
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
        java.nio.file.Files.write(target.toPath, buf.toByteArray)
      }
    }, null)
  }
  override def create(
      f: HPath, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (!overwrite && exists(f)) landAtClose(f)
    else super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  override def create(
      f: HPath, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    if (!overwrite && exists(f)) landAtClose(f)
    else super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
}

/** The LateCloseFs store behavior under a scheme with a REGISTERED
  * conditional create — the pair that proves the seam: the underlying
  * fs still has the late-close hole, but acquisition never goes
  * through it.
  */
class LateCloseCondFs extends LateCloseFs {
  override def getUri: java.net.URI = java.net.URI.create("graftcond:///")
}

/** Mock conditional store: models S3 If-None-Match / GCS
  * ifGenerationMatch=0 — ONE atomic create-or-fail operation
  * (File.createNewFile is O_CREAT|O_EXCL per POSIX, the same
  * atomicity class). Counts calls so specs can assert the seam was
  * actually the acquisition path.
  */
object MockConditionalStore extends FoldLease.ConditionalCreate {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  override def createExclusive(
      fs: org.apache.hadoop.fs.FileSystem,
      lease: HPath, content: Array[Byte]): Boolean = {
    calls.incrementAndGet()
    val f = new java.io.File(lease.toUri.getPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    if (!f.createNewFile()) false
    else { java.nio.file.Files.write(f.toPath, content); true }
  }
}

/** Read-back adjudication on filesystems without atomic conditional
  * create (r16 advice, medium): after the holder id lands, the lease
  * is read back — a writer whose spurious create "succeeded" but
  * whose id is not what the marker names must fail CONCURRENT_FOLD,
  * not silently restore the overlapping-offsets corruption the guard
  * exists to prevent.
  */
class FoldLeaseAdjudicationSpec extends SparkSpecBase {

  private lazy val registered: Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftnonatomic.impl", classOf[NonAtomicCreateFs].getName)

  private def mockPath(dir: String): String = { registered; s"graftnonatomic://$dir" }

  test("non-local acquire: clean acquisition passes read-back, runs the body, releases") {
    val dir = java.nio.file.Files.createTempDirectory("lease-adj-clean").toString
    var ran = false
    val r = FoldLease.withLease(spark, mockPath(dir), "writer-a") { ran = true; 42 }
    assert(r === 42 && ran)
    assert(!new java.io.File(dir, "_FOLD_LEASE").exists(),
      "completed writer must release the lease")
  }

  test("non-local acquire: spurious create over a live foreign lease fails CONCURRENT_FOLD") {
    val dir = java.nio.file.Files.createTempDirectory("lease-adj-race").toString
    // the racing writer's marker is already the committed object —
    // our create will "succeed" (non-atomic store), our id never lands
    val lease = new java.io.File(dir, "_FOLD_LEASE")
    java.nio.file.Files.write(lease.toPath, "writer-winner".getBytes("UTF-8"))
    var ran = false
    val e = intercept[IllegalStateException] {
      FoldLease.withLease(spark, mockPath(dir), "writer-loser") { ran = true }
    }
    assert(e.getMessage.contains("CONCURRENT_FOLD"), s"wrong error: ${e.getMessage}")
    assert(e.getMessage.contains("writer-winner"), "error must name the observed holder")
    assert(!ran, "loser ran the guarded body anyway")
    // the winner's lease must survive the loser's failed acquisition
    assert(new String(java.nio.file.Files.readAllBytes(lease.toPath), "UTF-8")
      === "writer-winner")
  }

  test("RESIDUAL, pinned honestly (r17 advice): a pathologically late close dual-acquires") {
    // The documented hole read-back adjudication + settle delay CANNOT
    // close: writer B's stale exists-check races before writer A's PUT
    // (modeled by LateCloseFs letting create succeed over the marker),
    // but B's close lands only AFTER A's read-back — here forced by
    // starting B once A is already inside the guarded body. Both
    // writers then read back their own id and BOTH proceed. This spec
    // asserts the failure mode EXISTS so the scaladoc's residual claim
    // stays honest; the remedy it names is conditional create
    // (If-None-Match), under which B's create would throw instead.
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftlateclose.impl", classOf[LateCloseFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("lease-adj-late").toString
    val path = s"graftlateclose://$dir"
    val aInBody = new java.util.concurrent.CountDownLatch(1)
    val bDone   = new java.util.concurrent.CountDownLatch(1)
    @volatile var aRan = false
    @volatile var bRan = false
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val a = new Thread(() => {
      try FoldLease.withLease(spark, path, "writer-a") {
        aRan = true
        aInBody.countDown()
        // hold the body open across B's entire late acquisition
        bDone.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
      } catch { case e: Throwable => aInBody.countDown(); errs.add(e) }
    })
    a.start()
    assert(aInBody.await(60, java.util.concurrent.TimeUnit.SECONDS))
    try FoldLease.withLease(spark, path, "writer-b") { bRan = true }
    catch { case e: Throwable => errs.add(e) } finally bDone.countDown()
    a.join(60000)
    assert(errs.isEmpty, s"unexpected failure: ${Option(errs.peek()).map(_.toString)}")
    assert(aRan && bRan,
      "late-close dual acquisition no longer reproduces — the residual is closed; " +
        "update the FoldLease scaladoc and flip this spec to assert CONCURRENT_FOLD")
  }

  test("CONDITIONAL mode (r18 verdict task 2): the late-close interleaving cannot dual-acquire") {
    // The exact interleaving the residual test above PROVES dual-
    // acquires in fallback mode — rerun over the same late-close
    // store behavior, but with a conditional create registered for
    // the scheme: writer B's acquisition now loses AT THE STORE and
    // fails CONCURRENT_FOLD while A is still inside the body.
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftcond.impl", classOf[LateCloseCondFs].getName)
    FoldLease.registerConditionalCreate("graftcond", MockConditionalStore)
    try {
      val dir = java.nio.file.Files.createTempDirectory("lease-adj-cond").toString
      val path = s"graftcond://$dir"
      val callsBefore = MockConditionalStore.calls.get()
      val aInBody = new java.util.concurrent.CountDownLatch(1)
      val bDone   = new java.util.concurrent.CountDownLatch(1)
      @volatile var aRan = false
      @volatile var bRan = false
      val aErrs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val a = new Thread(() => {
        try FoldLease.withLease(spark, path, "writer-a") {
          aRan = true
          aInBody.countDown()
          bDone.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
        } catch { case e: Throwable => aInBody.countDown(); aErrs.add(e) }
      })
      a.start()
      assert(aInBody.await(60, java.util.concurrent.TimeUnit.SECONDS))
      val e = intercept[IllegalStateException] {
        try FoldLease.withLease(spark, path, "writer-b") { bRan = true }
        finally bDone.countDown()
      }
      a.join(60000)
      assert(aErrs.isEmpty, s"winner must complete cleanly: ${Option(aErrs.peek()).map(_.toString)}")
      assert(e.getMessage.contains("CONCURRENT_FOLD"), s"wrong error: ${e.getMessage}")
      assert(e.getMessage.contains("writer-a"), "error must name the live holder")
      assert(aRan && !bRan,
        "conditional create must make dual acquisition impossible by construction")
      assert(MockConditionalStore.calls.get() > callsBefore,
        "acquisition must have gone through the registered seam, not the fallback")
      // the winner released on completion; a fresh writer acquires
      var cRan = false
      FoldLease.withLease(spark, path, "writer-c") { cRan = true }
      assert(cRan)
    } finally FoldLease.unregisterConditionalCreate("graftcond")
  }

  test("CONDITIONAL mode: same-id crash replay still passes through its own lease") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftcond.impl", classOf[LateCloseCondFs].getName)
    FoldLease.registerConditionalCreate("graftcond", MockConditionalStore)
    try {
      val dir = java.nio.file.Files.createTempDirectory("lease-adj-cond-replay").toString
      val lease = new java.io.File(dir, "_FOLD_LEASE")
      java.nio.file.Files.write(lease.toPath, "writer-a".getBytes("UTF-8"))
      var ran = false
      FoldLease.withLease(spark, s"graftcond://$dir", "writer-a") { ran = true }
      assert(ran, "a lost conditional create with a matching holder is the crash-replay path")
      assert(!lease.exists(), "replay must release its own lease on completion")
      // ...and a DISTINCT id against that crashed lease fails loudly
      java.nio.file.Files.write(lease.toPath, "writer-a".getBytes("UTF-8"))
      val e = intercept[IllegalStateException] {
        FoldLease.withLease(spark, s"graftcond://$dir", "writer-b") { () }
      }
      assert(e.getMessage.contains("CONCURRENT_FOLD"))
    } finally FoldLease.unregisterConditionalCreate("graftcond")
  }

  test("non-local acquire: same-id replay through a crashed lease still passes") {
    val dir = java.nio.file.Files.createTempDirectory("lease-adj-replay").toString
    val lease = new java.io.File(dir, "_FOLD_LEASE")
    java.nio.file.Files.write(lease.toPath, "writer-a".getBytes("UTF-8"))
    var ran = false
    FoldLease.withLease(spark, mockPath(dir), "writer-a") { ran = true }
    assert(ran, "same-id crash replay must pass through its own lease")
    assert(!lease.exists(), "replay must release its own lease on completion")
  }
}
