package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Staging-directory lifecycle (SURVEY §2.10 K12): unique run-scoped dirs
  * (the reference's `savedData/<source>_<ts>_<rand>/`, index.js:49-66) and
  * cleanup-unless-kept (`save_local_copy`, index.js:93-101) — without
  * shelling out to `rm -rf`.
  */
object Staging {

  /** Create `<base>/<label>_<suffix>/`, unique per run. */
  def createRunDir(base: String, label: String, suffix: String): Path = {
    val dir = Paths.get(base, s"${label}_$suffix")
    Files.createDirectories(dir)
    dir
  }

  /** Run `body` with a staging dir; delete it afterwards unless
    * `keepLocalCopy` (reference's save_local_copy flag). Deletion failure
    * is non-fatal (matches staging being disposable).
    */
  def withStaging[A](base: String, label: String, keepLocalCopy: Boolean)
      (body: Path => A): A = {
    val dir = createRunDir(base, label, System.nanoTime().toString)
    try body(dir)
    finally if (!keepLocalCopy) deleteRecursively(dir)
  }

  def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      try {
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { val _ = Files.deleteIfExists(p) })
      } catch { case _: java.io.IOException => () }
    }
}
