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

  // ONE directory per prefix per JVM (r10 review finding): repeated
  // in-JVM invocations (ScaleBench warmup + 2 passes × 3 scales) reuse
  // the same dir — every artifact write is mode("overwrite"), so disk
  // stays bounded at one corpus-sized copy per prefix instead of
  // accumulating seven. Cross-JVM uniqueness (the actual race surface:
  // concurrent Verify/Bench processes) still comes from the random
  // createTempDirectory token.
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** `tmpdir/graft_<prefix>_<token>/`, created once per (JVM, prefix)
    * and registered for recursive deletion at JVM exit. */
  def dir(prefix: String): String =
    dirs.computeIfAbsent(prefix, { p =>
      val d = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")),
        s"graft_${p}_")
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(d.toFile)))
      d.toString
    })

  private def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete()
    ()
  }
}
