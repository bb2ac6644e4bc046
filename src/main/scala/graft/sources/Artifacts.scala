package graft.sources

import java.io.File
import java.nio.file.{Files, Path, Paths}

/** Repo-root-anchored, git-TRACKED artifact store for gate-critical
  * memos (currently the m5 full-grid CrossValidatorModel).
  *
  * Why it exists (r14 verdict #1): the m5 memo lived under gitignored
  * `target/automl_cv`, so a wiped workspace re-paid an ~11-minute cold
  * CV grid inside the correctness gate — the exact failure mode that
  * produced the empty r13 artifact. Anchoring under `<repo>/artifacts`
  * (tracked) makes the memo survive a `target/` wipe AND a fresh
  * clone; anchoring to the REPO ROOT rather than the CWD makes gate
  * runs launched from any working directory hit the same cache
  * (r14 ADVICE finding #3).
  */
object Artifacts {

  /** Repo root, resolved in priority order: `GRAFT_REPO_DIR` env var;
    * the directory containing `build.sbt` above this class's code
    * source (target/scala-2.13/classes → repo); the first `build.sbt`
    * ancestor of the CWD; the CWD itself as a last resort. */
  lazy val repoRoot: Path = {
    def ancestorWithBuild(start: Path): Option[Path] =
      Iterator.iterate(start.toAbsolutePath)(_.getParent)
        .takeWhile(_ != null)
        .find(p => Files.exists(p.resolve("build.sbt")))
    val fromCodeSource =
      Option(getClass.getProtectionDomain.getCodeSource)
        .flatMap(cs => scala.util.Try(Paths.get(cs.getLocation.toURI)).toOption)
        .flatMap(ancestorWithBuild)
    sys.env.get("GRAFT_REPO_DIR").map(Paths.get(_).toAbsolutePath)
      .orElse(fromCodeSource)
      .orElse(ancestorWithBuild(Paths.get(sys.props("user.dir"))))
      .getOrElse(Paths.get(sys.props("user.dir")).toAbsolutePath)
  }

  /** Absolute path of a named tracked-artifact directory. */
  def dir(name: String): String =
    repoRoot.resolve("artifacts").resolve(name).toString

  /** Content fingerprint of a dataset (parquet file or directory of
    * part files): one line per file of `name:length:sha256(head 8 KiB
    * ‖ tail 8 KiB)`, plus the caller's protocol tag. The tail window
    * covers the parquet FOOTER — row counts, column min/max stats,
    * schema — so an attribute-preserving copy of *different* data
    * cannot serve a stale model (r14 ADVICE #3: the old
    * name:length:mtime stamp could). Deliberately NOT mtime-based:
    * a byte-identical regeneration of the test corpus keeps the memo
    * warm across driver rounds. */
  def contentFingerprint(dataset: File, tag: String): String = {
    val files =
      if (dataset.isDirectory)
        dataset.listFiles.toSeq.filter(_.isFile).sortBy(_.getName)
      else Seq(dataset)
    val lines = files.map { f =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val ch = java.nio.channels.FileChannel.open(f.toPath)
      try {
        val n = ch.size()
        val head = java.nio.ByteBuffer.allocate(math.min(8192L, n).toInt)
        ch.read(head, 0L); head.flip(); md.update(head)
        if (n > 8192L) {
          val tail = java.nio.ByteBuffer.allocate(
            math.min(8192L, n - 8192L).toInt)
          ch.read(tail, n - tail.capacity()); tail.flip(); md.update(tail)
        }
      } finally ch.close()
      val hex = md.digest().map("%02x".format(_)).mkString
      s"${f.getName}:${f.length}:$hex"
    }
    (lines :+ tag).mkString("\n")
  }
}
