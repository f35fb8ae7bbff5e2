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
