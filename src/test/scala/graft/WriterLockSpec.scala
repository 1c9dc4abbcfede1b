package graft

import graft.ops.WriterLock

/** The multi-process writer-lock protocol (VERDICT r16 #6): two
  * racing writers serialize or fail LOUDLY — never CAS-race silently;
  * a crashed holder's stale lock is taken over; release never deletes
  * a lock it no longer owns. Threads stand in for processes (the
  * protocol's state lives entirely in the filesystem — nothing
  * in-JVM is shared between the two `withLock` calls). */
class WriterLockSpec extends SparkSpec {

  test("mutual exclusion: two racing writers never overlap; the " +
      "waiting one blocks until the holder releases") {
    val dir = tmpDir("wlock-mutex") + "/idx"
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    def work(): Unit = WriterLock.withLock(spark, dir, owner = "t",
        staleAfterMs = 60000L, heartbeatMs = 1000L, waitMs = 30000L) {
      val n = inside.incrementAndGet()
      maxInside.updateAndGet(m => math.max(m, n))
      Thread.sleep(400L)
      inside.decrementAndGet()
      ran.incrementAndGet()
      ()
    }
    val threads = (1 to 3).map(_ => new Thread(() => work()))
    threads.foreach(_.start()); threads.foreach(_.join(60000L))
    assert(ran.get() == 3, s"all cooperating writers must eventually run")
    assert(maxInside.get() == 1,
      s"writers overlapped: max concurrent = ${maxInside.get()}")
    // released: the lock file is gone and a fresh acquire is instant
    val lock = new java.io.File(WriterLock.lockPath(dir))
    assert(!lock.exists(), "release must delete the lock")
  }

  test("waitMs = 0 loser fails loudly naming the holder instead of " +
      "racing; stale locks are taken over; release leaves a " +
      "taken-over lock alone") {
    val dir = tmpDir("wlock-stale") + "/idx"
    val holding = new java.util.concurrent.CountDownLatch(1)
    val releaseIt = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLock.withLock(spark, dir, owner = "holder",
          heartbeatMs = 500L, staleAfterMs = 60000L) {
        holding.countDown()
        releaseIt.await(30, java.util.concurrent.TimeUnit.SECONDS)
        ()
      })
    holder.start()
    assert(holding.await(15, java.util.concurrent.TimeUnit.SECONDS))
    val ex = intercept[WriterLock.LockHeldException] {
      WriterLock.withLock(spark, dir, owner = "late")(())
    }
    assert(ex.getMessage.contains("holder#"),
      s"the loud failure must name the holder: ${ex.getMessage}")
    releaseIt.countDown(); holder.join(30000L)

    // stale takeover: a crashed holder's lock (old mtime, no
    // heartbeat refreshing it) must not wedge maintenance forever
    val lock = new java.io.File(WriterLock.lockPath(dir))
    assert(!lock.exists())
    java.nio.file.Files.createDirectories(lock.getParentFile.toPath)
    java.nio.file.Files.write(lock.toPath, "crashed#dead".getBytes("UTF-8"))
    assert(lock.setLastModified(System.currentTimeMillis() - 120000L))
    var ranAfterTakeover = false
    WriterLock.withLock(spark, dir, owner = "medic",
      staleAfterMs = 60000L) { ranAfterTakeover = true }
    assert(ranAfterTakeover, "stale lock must be taken over")
    assert(!lock.exists(), "the takeover's own release must clean up")

    // ownership check on release: a holder whose lock was replaced
    // (it read as stale mid-run) must NOT delete the new owner's lock
    java.nio.file.Files.write(lock.toPath, "newowner#alive".getBytes("UTF-8"))
    WriterLock.withLock(spark, dir + "-other", owner = "bystander")(())
    // simulate: acquire on dir2, then swap the file under a DIFFERENT
    // token before release - exercised via the public surface by
    // replacing the lock mid-critical-section
    val dir3 = tmpDir("wlock-swap") + "/idx"
    val lock3 = new java.io.File(WriterLock.lockPath(dir3))
    WriterLock.withLock(spark, dir3, owner = "victim",
        heartbeatMs = 400L, staleAfterMs = 2000L) {
      // a takeover replaces the file with someone else's token
      java.nio.file.Files.write(lock3.toPath,
        "usurper#token".getBytes("UTF-8"))
    }
    assert(new String(java.nio.file.Files.readAllBytes(lock3.toPath),
        "UTF-8") == "usurper#token",
      "release must leave a lock it no longer owns in place")
  }

  test("owned release (r18, VERDICT #4): a takeover landing INSIDE " +
      "the release window survives - release claims the path by " +
      "rename, verifies privately, and restores a foreign lock intact") {
    val dir = tmpDir("wlock-release-race") + "/idx"
    val lock = new java.io.File(WriterLock.lockPath(dir))
    try {
      WriterLock.beforeRelease = () => {
        // deterministic interleave: the instant the critical section
        // ends - INSIDE the old protocol's read-token-then-delete
        // window - a takeover replaces the lock with a new holder's
        java.nio.file.Files.write(lock.toPath,
          "takeover#mid".getBytes("UTF-8")); ()
      }
      WriterLock.withLock(spark, dir, owner = "slow",
        heartbeatMs = 400L, staleAfterMs = 2000L)(())
    } finally WriterLock.beforeRelease = () => ()
    assert(new String(java.nio.file.Files.readAllBytes(lock.toPath),
        "UTF-8") == "takeover#mid",
      "the mid-release takeover's lock must survive the old holder's release")
    // the restore is by rename: no stray .release-* claim files remain
    val strays = lock.getParentFile.list().filter(_.contains(".release-"))
    assert(strays.isEmpty, strays.toSeq.toString)
    // and the release seam off, a normal hold still cleans up fully
    WriterLock.withLock(spark, dir, owner = "medic",
      staleAfterMs = 60000L, waitMs = 0L)(())
    assert(!lock.exists(), "normal release must delete the lock")
  }

  test("owner bound is UTF-8 BYTES and the readback reads to EOF " +
      "(ADVICE r17): a multi-byte owner acquires, verifies, shows in " +
      "holder(), and releases; an over-long one refuses loudly") {
    val dir = tmpDir("wlock-utf8") + "/idx"
    val owner = "ведущий-писатель" // multi-byte UTF-8, well under 128 B
    var seen: Option[(String, Long)] = None
    WriterLock.withLock(spark, dir, owner = owner) {
      seen = WriterLock.holder(spark, dir)
    }
    assert(seen.exists(_._1.startsWith(owner + "#")),
      s"holder() must read the full multi-byte token: $seen")
    assert(!new java.io.File(WriterLock.lockPath(dir)).exists(),
      "a multi-byte owner must still pass the release ownership compare")
    assert(WriterLock.holder(spark, dir).isEmpty, "no lock - no holder")
    // 70 chars but 140 UTF-8 bytes: the old UTF-16 char bound let it
    // through and the truncated readback leaked the lock until stale
    val big = "я" * 70
    val ex = intercept[IllegalArgumentException] {
      WriterLock.withLock(spark, dir, owner = big)(())
    }
    assert(ex.getMessage.contains("UTF-8"), ex.getMessage)
  }

  test("end-to-end: two lock-wrapped index appends serialize - both " +
      "land, no CAS loser, no discarded work (the out-of-process " +
      "append trade the lock closes)") {
    import graft.ops.Dedup
    import spark.implicits._
    val dir = tmpDir("wlock-appends") + "/idx"
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cat sleeps"
    Dedup.buildLshIndex(Seq((1L, base)).toDF("doc_id", "text"),
      "doc_id", "text", dir)
    // UNLOCKED concurrent appends are the documented CAS race: one
    // wins, one throws. LOCKED appends must BOTH land - the loser
    // blocks, re-plans against the winner's frontier, and commits.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def append(id: Long, tag: String): Unit =
      try WriterLock.withLock(spark, dir, owner = tag, waitMs = 60000L) {
        Dedup.appendToLshIndex(Seq((id, base)).toDF("doc_id", "text"),
          "doc_id", "text", dir, tag = tag)
      } catch { case t: Throwable => errs.add(t); () }
    val ts = Seq(new Thread(() => append(10L, "w1")),
      new Thread(() => append(11L, "w2")))
    ts.foreach(_.start()); ts.foreach(_.join(120000L))
    assert(errs.isEmpty, s"locked appends must not race: ${errs}")
    val m = spark.read.parquet(s"$dir/meta").head()
    assert(m.getInt(m.fieldIndex("shards")) == 2,
      "both appends must have committed, one per frontier step")
    val got = Dedup.dedupDelta(Seq((40L, base)).toDF("doc_id", "text"),
        "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((1L, 40L), (10L, 40L), (11L, 40L)).subsetOf(got),
      s"every appended doc must be queryable: $got")
  }
}
