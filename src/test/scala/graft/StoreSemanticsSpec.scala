package graft

import java.net.URI
import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import graft.http.Collections

/** A local filesystem whose `create(overwrite = false)` is deliberately
  * NON-atomic: the existence check and the object write are separate
  * steps, like S3's HEAD-then-PUT through the Hadoop FS API (SURVEY §9).
  * When [[NonAtomicCreateFs.armWindow]] is set, every non-overwrite
  * create of a matching file parks at a barrier BETWEEN the two steps,
  * so a spec can force two claimants through the check before either
  * writes — the race a real object store merely makes possible. */
class NonAtomicCreateFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("nonatomic:///")

  // the non-permission variant is RawLocalFileSystem's actual
  // entry point for FileSystem.create(Path, boolean) — the
  // permission-taking overload delegates to it virtually
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      NonAtomicCreateFs.window(f)
      // blind PUT: no exclusivity between the check above and this write
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else {
      super.create(f, overwrite, bufferSize, replication, blockSize,
        progress)
    }
  }
}

object NonAtomicCreateFs {
  @volatile private var armed: Option[(String, CyclicBarrier)] = None
  def armWindow(fileName: String, parties: Int): Unit =
    armed = Some((fileName, new CyclicBarrier(parties)))
  def disarm(): Unit = armed = None
  private[graft] def window(f: Path): Unit = armed.foreach {
    case (name, b) =>
      if (f.getName == name) b.await(10, TimeUnit.SECONDS)
  }
}

/** Exercises the ONE silent degradation in the SURVEY §9 matrix: on a
  * store without atomic create-if-absent, the HTTP collection lease is
  * advisory — two processes can both claim it. The spec pins the
  * degradation itself AND the protocol parts that survive it (token-
  * checked release never deletes a foreign lease; plain sequential
  * conflicts still 409). */
class StoreSemanticsSpec extends SparkSpec {

  private def freshRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.nonatomic.impl", classOf[NonAtomicCreateFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("nonatomic").toString
    s"nonatomic://$dir"
  }

  test("sequential lease conflict still raises WriterConflict on a non-atomic store") {
    val root = freshRoot()
    Collections.create(spark, root, "seqcol", Seq.empty)
    val inBody = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val holder = new Thread(() =>
      Collections.withLease(spark, root, "seqcol", "spec") {
        inBody.countDown(); release.await(10, TimeUnit.SECONDS); ()
      })
    holder.start()
    assert(inBody.await(10, TimeUnit.SECONDS))
    try {
      // the lock object EXISTS by now, so the non-atomic check still
      // catches an honestly-sequential second claimant
      intercept[Collections.WriterConflict] {
        Collections.withLease(spark, root, "seqcol", "spec") { () }
      }
    } finally {
      release.countDown(); holder.join(10000)
    }
  }

  test("non-atomic create-if-absent admits two lease holders; token release survives") {
    val root = freshRoot()
    Collections.create(spark, root, "degcol", Seq.empty)
    val lock = new Path(s"$root/degcol/_spec.lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val concurrent = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val bothInBody = new CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    // both claimants pass the exists-check before either writes —
    // exactly what S3's check-then-put window allows
    NonAtomicCreateFs.armWindow("_spec.lock", parties = 2)
    try {
      val ts = (1 to 2).map { _ =>
        new Thread(() =>
          try Collections.withLease(spark, root, "degcol", "spec") {
            val now = concurrent.incrementAndGet()
            peak.getAndUpdate(p => math.max(p, now))
            // hold both bodies open together so the overlap is proven
            // and both token writes land before either release runs
            bothInBody.await(10, TimeUnit.SECONDS)
            concurrent.decrementAndGet(); ()
          } catch { case t: Throwable => errors.add(t) })
      }
      ts.foreach(_.start()); ts.foreach(_.join(15000))
    } finally NonAtomicCreateFs.disarm()

    // the documented degradation: mutual exclusion is gone
    assert(errors.isEmpty, s"claims failed: $errors")
    assert(peak.get() == 2, "expected both claimants inside the lease")

    // what survives: release is ownership-positive, so exactly the
    // holder whose token the lock carries deleted it — the lock is
    // gone (not leaked) and nobody deleted a lease they did not hold
    assert(!fs.exists(lock), "lock should be released by its last owner")

    // and the root is healthy: a fresh claim works immediately
    Collections.withLease(spark, root, "degcol", "spec") { () }
  }
}
