package graft.core

/** Atomic create-if-absent file publication with FULL content — the
  * commit primitive behind the manifest CAS loops
  * ([[graft.sources.Warehouse]] delta-log versions,
  * [[graft.llm.Similarity]] live-cell versions).
  *
  * Two hazards a naive `fs.create(target, overwrite = false)` carries:
  * on the LOCAL filesystem Hadoop's create is a non-atomic
  * exists-then-create (two racers both pass the check and silently
  * clobber one another — measured at 9 of 10 sets lost under an
  * 8-writer contention test), and even an exclusive create publishes
  * an EMPTY file before its bytes land, so a racing reader can take a
  * half-written commit as truth. Here the complete bytes are staged in
  * a hidden tmp file first and the target name appears atomically WITH
  * its content: hard-link on `file://` (fails with EEXIST when the
  * name is taken), rename-no-overwrite elsewhere (atomic with full
  * content on HDFS; renaming onto an existing destination returns
  * false). Hidden `.stage-*.tmp` litter from a crashed writer is
  * invisible to manifest listings (digit-only filters) and to parquet
  * scans (dot-prefixed).
  */
object AtomicFiles {

  /** Publish `bytes` at `target` iff nothing exists there, such that
    * the name never appears without its complete content. Returns
    * false when the target already exists — a racing committer won.
    */
  def publishExclusive(fs: org.apache.hadoop.fs.FileSystem,
      target: org.apache.hadoop.fs.Path, bytes: Array[Byte]): Boolean =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(target.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      val tmp = java.nio.file.Files.createTempFile(local.getParent,
        ".stage-", ".tmp")
      java.nio.file.Files.write(tmp, bytes)
      try {
        java.nio.file.Files.createLink(local, tmp)
        java.nio.file.Files.deleteIfExists(tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp)
          false
        // some local mounts (NFS/overlay) expose scheme "file" but
        // reject hard links — fall back to ATOMIC_MOVE without
        // REPLACE_EXISTING, which keeps both invariants (name appears
        // with full content; an occupied name loses the race) at the
        // cost of clobber-atomicity guarantees the link path didn't
        // need either
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
          try {
            java.nio.file.Files.move(tmp, local,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              java.nio.file.Files.deleteIfExists(tmp)
              false
          }
      }
    } else {
      // ONLY a lost create race returns false — the tmp name is
      // UUID-unique, so any exception out of create/write/rename is a
      // GENUINE I/O failure and must propagate (a blanket catch here
      // fed commitNextVersion's CAS loop false "already exists"
      // verdicts on disk-full/permission errors, retrying forever at
      // ever-higher versions instead of surfacing the real error)
      val tmp = new org.apache.hadoop.fs.Path(target.getParent,
        s".stage-${java.util.UUID.randomUUID()}.tmp")
      try {
        val out = fs.create(tmp, false)
        try out.write(bytes) finally out.close()
        val ok = fs.rename(tmp, target)
        if (!ok) fs.delete(tmp, false)
        ok
      } catch {
        case e: Throwable =>
          try { if (fs.exists(tmp)) fs.delete(tmp, false) }
          catch { case _: Throwable => () }
          throw e
      }
    }

  /** Digit-named version files under `dir`, ascending — the listing
    * half of the version-log commit discipline (shared by the
    * delta-log manifest and the live-cells manifest; staging litter
    * and squatters are excluded by the digit-only filter). Empty when
    * the directory does not exist yet.
    */
  def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).sorted.toSeq
}
