package graft.ops

import org.apache.spark.sql.SparkSession

/** Best-effort multi-process writer lock for index maintenance
  * (VERDICT r16 #6): the per-family CAS commits turn concurrent
  * writers into one-winner-one-loud-loser, but out-of-process APPENDS
  * still need caller serialization, and a CLI-driven maintenance
  * story (cron compacts beside a streaming ingest) wants writers to
  * BLOCK or fail before doing work, not to race and discard it. This
  * closes that operational gap: a rename-arbitrated lock file under
  * the index path, a heartbeat that keeps it visibly alive, and a
  * stale-lock takeover so a crashed holder never wedges maintenance
  * forever.
  *
  * Semantics, stated honestly — ADVISORY, opt-in:
  *  - correctness still rests on the CAS. A writer that bypasses the
  *    lock races the holder and loses loudly at its meta commit; the
  *    lock only serializes the cooperating writers that opt in.
  *  - mutual exclusion rests on the filesystem's no-overwrite RENAME
  *    (each contender stages its own token file and renames it onto
  *    the lock path) plus a readback VERIFY of the landed token:
  *    exact on HDFS (server-side atomic rename); local checksummed
  *    filesystems and object stores get best-effort semantics — the
  *    verify demotes a lost rename race to a retry, an unreadable
  *    (crc-corrupt) lock is reclaimed as garbage, and in the residual
  *    overwrite-after-verify window two acquirers can briefly both
  *    believe they won — the CAS remains the backstop.
  *  - staleness compares the lock's mtime (refreshed every
  *    `heartbeatMs` by the holder) against the acquirer's clock:
  *    cross-host clock skew must stay well under `staleAfterMs`.
  *    A filesystem whose setTimes is unsupported degrades the
  *    heartbeat to a FIXED LEASE of `staleAfterMs` from acquisition —
  *    size it above the longest expected critical section there, or
  *    a live holder can be taken over mid-run (its CAS still
  *    backstops correctness; the takeover only wastes its work).
  *  - a holder whose lock was taken over (it stalled past
  *    `staleAfterMs`, e.g. a long GC pause) keeps running — its CAS
  *    commit is what aborts it if the new holder got there first; on
  *    release it never deletes a lock it no longer owns (the token is
  *    re-read before the delete). */
object WriterLock {

  /** Loud acquisition failure: the lock is held and `waitMs` ran out
    * (or was 0). Carries the holder token so operators can see WHO. */
  final class LockHeldException(msg: String) extends IllegalStateException(msg)

  private def fsPath(spark: SparkSession, p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** The lock file's location for an index rooted at `indexPath` —
    * dot-prefixed, so no reader's partition discovery ever sees it. */
  def lockPath(indexPath: String): String = s"$indexPath/.writer-lock"

  /** Run `f` holding the index's writer lock; always releases.
    *
    *  - `owner`: operator-readable holder name (host/pid make good
    *    ones); a random token is appended so release can verify
    *    ownership after a takeover.
    *  - `waitMs` = 0: one attempt, then a loud [[LockHeldException]]
    *    naming the holder. > 0: poll (4 Hz) until acquired or the
    *    deadline passes, then throw.
    *  - `staleAfterMs`: a lock whose mtime is older than this is a
    *    crashed holder's leftover — deleted and re-raced (two
    *    takeover racers: the no-overwrite rename arbitrates).
    *  - `heartbeatMs`: the holder's mtime refresh period; keep it
    *    several times smaller than every cooperating process's
    *    `staleAfterMs`. */
  def withLock[T](spark: SparkSession, indexPath: String,
      owner: String = "writer", staleAfterMs: Long = 60000L,
      heartbeatMs: Long = 5000L, waitMs: Long = 0L)(f: => T): T = {
    require(staleAfterMs > heartbeatMs * 2,
      s"staleAfterMs ($staleAfterMs) must be well above heartbeatMs " +
        s"($heartbeatMs), or a healthy holder reads as stale between beats")
    // the token must fit holderToken()'s read buffer or the release
    // ownership compare breaks and the lock leaks until staleness
    require(owner.length <= 128,
      s"owner name too long (${owner.length} > 128 chars)")
    val (fs, lock) = fsPath(spark, lockPath(indexPath))
    val token = owner + "#" + java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs

    def holderToken(): String =
      try {
        val in = fs.open(lock)
        try {
          val buf = new Array[Byte](256)
          val n = math.max(0, in.read(buf))
          new String(buf, 0, n, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      } catch { case _: java.io.IOException => "<unreadable>" }

    // Arbitration primitive: each contender writes its token to its
    // OWN unique temp file, then renames it onto the lock path with
    // the no-overwrite option — rename fails when the lock exists, so
    // exactly one rename lands and the lock's content is always one
    // intact token. (A shared-file create-exclusive was the first
    // design; Hadoop's checksummed LocalFileSystem lets two
    // near-simultaneous create(overwrite=false) calls through and the
    // interleaved closes leave a CRC-corrupt lock NOBODY owns — a
    // deadlock until staleness. Rename is the primitive MetaSwap and
    // ShardDirs already trust.)
    def tryAcquire(allowTakeover: Boolean = true): Boolean = {
      // staged under the UUID alone: the operator-chosen owner half
      // of the token may hold path-hostile chars ('/', spaces) and
      // belongs in the CONTENT, not the filename
      val tmp = new org.apache.hadoop.fs.Path(
        lockPath(indexPath) + ".acquire-" +
          token.substring(token.lastIndexOf('#') + 1))
      val out = fs.create(tmp, true)
      try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val ctx = org.apache.hadoop.fs.FileContext.getFileContext(
        lock.toUri, spark.sparkContext.hadoopConfiguration)
      try {
        ctx.rename(tmp, lock)
        // a checksummed local fs pairs the temp with a .crc sibling
        // the raw rename leaves behind - best-effort sweep
        fs.delete(new org.apache.hadoop.fs.Path(
          tmp.getParent, "." + tmp.getName + ".crc"), false)
        // VERIFY by readback (full-suite race, r17): the local
        // FileContext filesystem is ChecksumFs, whose no-overwrite
        // rename is check-then-act over TWO files (data + .crc) - two
        // near-simultaneous renames can interleave into an overwrite
        // or a crc-mismatched lock NOBODY can read or release. The
        // settle pause + token readback demotes both to a retry: a
        // foreign token means a racer's rename landed over ours (they
        // hold - poll on); an unreadable one is corrupt garbage the
        // failure path below reclaims on the next poll. Never delete
        // here - the file may be a healthy racer's.
        Thread.sleep(50L)
        holderToken() == token
      } catch {
        case _: java.io.IOException =>
          fs.delete(tmp, false)
          // held - or a crashed holder's leftover past its heartbeat,
          // or crc-corrupt garbage (exists + fresh mtime + unreadable:
          // its "owner" can never pass the release ownership compare,
          // so nobody else will ever delete it - reclaim it here)
          val status =
            try Some(fs.getFileStatus(lock))
            catch { case _: java.io.IOException => None } // vanished: re-race
          val stale = status.exists(st =>
            System.currentTimeMillis() - st.getModificationTime > staleAfterMs)
          val corrupt = status.isDefined && holderToken() == "<unreadable>"
          if ((stale || corrupt) && allowTakeover) {
            // takeover: reclaim and re-race the rename IMMEDIATELY
            // (waitMs = 0 callers must still win a stale lock - the
            // deadline check would otherwise fire first); one level
            // only, so live contention never recurses
            fs.delete(lock, false)
            tryAcquire(allowTakeover = false)
          } else false
      }
    }

    while (!tryAcquire()) {
      if (System.currentTimeMillis() >= deadline)
        throw new LockHeldException(
          s"writer lock at '${lockPath(indexPath)}' is held by " +
            s"'${holderToken()}' and waitMs ran out - another maintenance " +
            "process is active on this index (pass a larger waitMs to " +
            "block, or let it finish)")
      Thread.sleep(250L)
    }

    // heartbeat: keep the lock's mtime fresh so cooperating acquirers
    // never read a LIVE holder as stale
    val beat = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(heartbeatMs)
        val now = System.currentTimeMillis()
        try fs.setTimes(lock, now, now)
        catch { case _: java.io.IOException => () } // taken over: CAS backstops
      } catch { case _: InterruptedException => () }
    }, s"graft-writer-lock-heartbeat")
    beat.setDaemon(true)
    beat.start()
    try f
    finally {
      beat.interrupt()
      // delete only what we still own: after a stale takeover the
      // file carries the NEW holder's token and must survive
      try if (fs.exists(lock) && holderToken() == token) {
        fs.delete(lock, false); ()
      } catch { case _: java.io.IOException => () }
    }
  }
}
