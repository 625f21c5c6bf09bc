package graft.util

/** Tracked per-run scratch directories for artifact-writing queries.
  *
  * The artifact queries (x23/x44/x62/x68, the promote gate) each lay a
  * temp warehouse per invocation. Benchmarks invoke every query
  * reps+warm-up times, so untracked temp dirs accumulate gigabytes of
  * dead parquet over a full sweep — page-cache and disk pressure that
  * showed up as rep-spread on whichever artifact query ran late in
  * sorted order (VERDICT r8 "What's wrong" #1). Creating through here
  * lets the bench harness reclaim every dead warehouse between queries
  * ([[sweep]]) while leaving single-shot callers (Verify, tests)
  * untouched — their dirs die with /tmp as before.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()

  /** Create and track a fresh temp directory; returns its path. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    dirs.add(d)
    d.toString
  }

  /** Best-effort delete of every tracked dir. Callers must be done
    * consuming any DataFrame that reads from a tracked warehouse —
    * results are lazy, so sweep only after the action completed. */
  def sweep(): Unit = {
    var d = dirs.poll()
    while (d != null) {
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      d = dirs.poll()
    }
  }
}
