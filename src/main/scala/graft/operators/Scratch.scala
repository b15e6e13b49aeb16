package graft.operators

/** Per-invocation scratch directories for queries that persist
  * intermediate artifacts (dedup_family's pair+CC frames, ann_family's
  * trained index). `java.nio.file.Files.createTempDirectory` appends a
  * random token, so two concurrent Verify/Bench runs on the SAME sfDir
  * can never collide on an artifact path (the r9 finding: a shared
  * sfDir-derived layout raced under concurrency). Directories are
  * removed by a JVM shutdown hook — "delete on success" for the
  * one-shot Verify/Bench/test mains this repo runs; a long-lived
  * service would instead persist its artifacts deliberately under a
  * managed warehouse path (the train-once/serve-many posture), not
  * here.
  */
object Scratch {

  /** Create `tmpdir/graft_<prefix>_<token>/` and register it for
    * recursive deletion at JVM exit. Returns the absolute path. */
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
      s"graft_${prefix}_")
    val f = p.toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(f)))
    p.toString
  }

  private def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete()
    ()
  }
}
