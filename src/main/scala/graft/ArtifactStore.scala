package graft

import org.apache.spark.sql.SparkSession

/** Cross-session persistence for expensive on-disk index artifacts
  * (VERDICT r9 #7): a content-keyed directory plus an atomic-rename
  * publication protocol, so a deterministic build (e.g. the ann14
  * IVF-PQ lifecycle) pays its cold cost ONCE PER MACHINE instead of
  * once per JVM.
  *
  * Protocol (the lock story, cross-JVM safe without a lock file):
  *
  *   1. If `<base>/<name>-<key>/_OK` exists, the artifact is complete
  *      and immutable — reuse it. (_OK is written before publication,
  *      so a visible target is always whole.)
  *   2. Otherwise build into a private `.tmp-<uuid>` sibling, write
  *      `_OK` inside it, then ATOMIC_MOVE it to the target. Directory
  *      rename is atomic on a POSIX filesystem, so concurrent sessions
  *      may build in parallel (wasted work, never corruption) and
  *      exactly one rename wins; losers delete their tmp and adopt the
  *      winner — both get byte-valid artifacts, and determinism of the
  *      build makes them semantically identical.
  *   3. A crashed build leaves only an unpublished `.tmp-*` dir —
  *      never a half-visible target. A target WITHOUT `_OK` can only
  *      be a manual copy or external tampering; fail loudly rather
  *      than trust or overwrite it.
  *
  * The content key must fingerprint everything the artifact derives
  * from — input data AND the build recipe version — so a data change
  * or semantics change lands in a fresh dir instead of silently
  * reusing a stale one. Base dir: `spark.graft.artifact.dir`, default
  * `<tmpdir>/graft-artifacts` (on a cluster: durable shared storage).
  */
object ArtifactStore {
  val DirKey = "spark.graft.artifact.dir"

  def ensure(spark: SparkSession, name: String, contentKey: String)(
      build: String => Unit): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = Paths.get(spark.conf.getOption(DirKey).getOrElse(
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-artifacts"))
    val target = base.resolve(s"$name-$contentKey")
    def complete = Files.exists(target.resolve("_OK"))
    if (Files.exists(target)) {
      require(complete, s"artifact dir $target exists without its _OK " +
        "completion marker - not produced by ArtifactStore; delete it " +
        "to rebuild")
      return target.toString
    }
    Files.createDirectories(base)
    val tmp = base.resolve(
      s".$name-$contentKey.tmp-${java.util.UUID.randomUUID()}")
    try {
      build(tmp.toString)
      Files.write(tmp.resolve("_OK"), Array.empty[Byte])
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // Another session published first — adopt the winner. rename(2)
        // reports the lost race as EEXIST or ENOTEMPTY, which the JDK
        // surfaces variously as FileAlreadyExistsException,
        // DirectoryNotEmptyException, or a GENERIC FileSystemException
        // (Linux, non-empty target dir — caught by the race spec), so
        // the discriminator is the target's state, not the exception
        // class: a COMPLETE target means a lost race; anything else is
        // a real filesystem error and must propagate.
        case e: java.nio.file.FileSystemException =>
          if (!complete) throw e
          deleteRecursively(tmp)
      }
    } catch {
      case t: Throwable => deleteRecursively(tmp); throw t
    }
    target.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f): Unit)
    }
}
