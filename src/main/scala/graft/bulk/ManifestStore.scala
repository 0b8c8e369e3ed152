package graft.bulk

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** Transactional commit protocol + crash-safe compaction for the
  * parquet-backed slot tables — the storage-level twin of the
  * reference KV store's optimistic commit (assemblage_kv/src/
  * lib.rs:286-323) and merge (lib.rs:233-277, with the atomic
  * file swap of storage/file_storage.rs:100-119):
  *
  *   - data dirs are IMMUTABLE: every write lands in a fresh
  *     `data/<slot>/<uuid>` parquet directory, never touched again.
  *   - visibility is ONE manifest file per version
  *     (`manifest/v<N>.manifest`, lines `slot=dir`), created by CAS:
  *     a hard link from a fully-written temp file — link(2) is atomic
  *     and fails if the target exists, so two writers committing from
  *     the same base version race and exactly one wins; the loser gets
  *     the same conflict the reference txn gets when the store moved
  *     under it. (On an object store, the same protocol is a
  *     put-if-absent of the manifest key.)
  *   - readers resolve the highest manifest and only ever see dirs it
  *     references: a writer (or compactor) killed before its CAS
  *     leaves orphan data dirs but NO visible state change.
  *   - compaction rewrites a slot's latest-live rows to a new dir and
  *     commits it like any other txn — killed mid-rewrite it changes
  *     nothing; `gc` removes dirs unreferenced by the retained
  *     manifests afterwards.
  */
final class ManifestStore(spark: SparkSession, rootDir: String) {

  final case class Conflict(baseVersion: Long, winner: Long)
    extends RuntimeException(
      s"commit from base v$baseVersion lost the manifest CAS to v$winner")

  private val root: Path = Paths.get(rootDir)
  private val manifestDir = root.resolve("manifest")
  private val dataDir = root.resolve("data")
  Files.createDirectories(manifestDir)
  Files.createDirectories(dataDir)

  private def manifestPath(v: Long): Path = manifestDir.resolve(s"v$v.manifest")

  /** Highest committed version, 0 when empty. */
  def currentVersion(): Long =
    Using.resource(Files.list(manifestDir)) { s =>
      s.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
          n.stripPrefix("v").stripSuffix(".manifest").toLong
        }
        .foldLeft(0L)(math.max)
    }

  /** slot → data dir of the given manifest version. */
  def manifest(version: Long = currentVersion()): Map[String, String] =
    if (version == 0) Map.empty
    else Files.readAllLines(manifestPath(version)).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val Array(slot, dir) = line.split("=", 2)
        slot -> dir
      }.toMap

  /** Latest committed content of a slot (None if never written). */
  def read(slot: String): Option[DataFrame] =
    manifest().get(slot).map(d => spark.read.parquet(dataDir.resolve(d).toString))

  /** Store name (KvStore::name — the directory stem). */
  def name: String = root.getFileName.toString

  /** On-disk bytes of a slot's CURRENT committed dir (KvStore::size);
    * 0 if never written. Orphans and history don't count — they are
    * gc-reclaimable, not live data.
    */
  def size(slot: String): Long =
    manifest().get(slot).map { d =>
      Using.resource(Files.walk(dataDir.resolve(d))) { s =>
        s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      }
    }.getOrElse(0L)

  /** An open transaction: stages immutable dirs, commits by CAS. */
  final class Txn private[ManifestStore] (val baseVersion: Long) {
    private var staged = Map.empty[String, String]

    /** Write `df` as the slot's new content (a fresh immutable dir —
      * nothing is visible until commit).
      */
    def stage(slot: String, df: DataFrame): this.type = {
      val dir = s"$slot/${java.util.UUID.randomUUID()}"
      df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.resolve(dir).toString)
      staged += slot -> dir
      this
    }

    /** CAS-commit: version base+1 is created iff nobody else created
      * it first; otherwise the staged dirs stay orphaned (invisible)
      * and the caller sees the same conflict the reference's
      * optimistic commit reports. Unstaged slots carry over.
      *
      * Staged dirs are re-verified right before the CAS: a concurrent
      * [[gc]] past its grace period may have reclaimed them (they are
      * unreferenced until this commit publishes them) — publishing a
      * manifest that points at deleted parquet would be silent data
      * loss, so a missing staged dir surfaces as a Conflict instead
      * (retry like any lost CAS). The remaining verify→CAS window is
      * covered by gc's mtime grace.
      */
    def commit(): Either[Conflict, Long] = {
      val next = baseVersion + 1
      if (staged.values.exists(d => !Files.exists(dataDir.resolve(d))))
        return Left(Conflict(baseVersion, currentVersion()))
      val merged = manifest(baseVersion) ++ staged
      val tmp = Files.createTempFile(manifestDir, ".staging", ".tmp")
      try {
        Files.write(tmp, merged.toSeq.sorted.map { case (s, d) => s"$s=$d" }.asJava)
        try {
          Files.createLink(manifestPath(next), tmp) // atomic put-if-absent
          Right(next)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Left(Conflict(baseVersion, next))
        }
      } finally Files.deleteIfExists(tmp)
    }
  }

  def begin(): Txn = new Txn(currentVersion())

  /** Crash-safe compaction of one slot: rewrite the latest live
    * versions to a fresh dir, CAS it in. Killed anywhere before the
    * CAS, the store is untouched; on CAS conflict nothing is retried
    * (the caller re-runs against the new state, like any txn).
    */
  def compact(slot: String, keyCols: String*): Either[Conflict, Long] = {
    val txn = begin()
    val current = read(slot).getOrElse(
      throw new IllegalStateException(s"slot '$slot' has no committed content"))
    txn.stage(slot, VersionedTable.compact(current, keyCols: _*))
    txn.commit()
  }

  /** Delete data dirs not referenced by the newest `keepVersions`
    * manifests (orphans from lost/killed writers included), then drop
    * the older manifests. Referenced dirs of retained versions are
    * never touched; UNREFERENCED dirs are only reclaimed once older
    * than `graceMillis`, because an in-flight [[Txn]]'s staged dirs
    * are indistinguishable from orphans until its CAS publishes them —
    * the grace keeps gc safe to run alongside live writers (any txn
    * older than the grace that still commits is caught by commit()'s
    * staged-dir re-verify and reports a Conflict instead of
    * publishing dangling references).
    */
  def gc(keepVersions: Int = 1, graceMillis: Long = ManifestStore.DefaultGcGraceMillis): Unit = {
    val newest = currentVersion()
    val keep = (0L to newest).filter(v => v > newest - keepVersions && v > 0)
    val referenced = keep.flatMap(v => manifest(v).values).toSet
    val cutoff = System.currentTimeMillis() - graceMillis
    if (Files.exists(dataDir)) {
      Using.resource(Files.list(dataDir))(_.iterator().asScala.toVector).foreach { slotDir =>
        Using.resource(Files.list(slotDir))(_.iterator().asScala.toVector).foreach { d =>
          val rel = s"${slotDir.getFileName}/${d.getFileName}"
          val oldEnough = Files.getLastModifiedTime(d).toMillis <= cutoff
          if (!referenced.contains(rel) && oldEnough) {
            Using.resource(Files.walk(d)) { s =>
              s.sorted(Comparator.reverseOrder[Path]())
                .iterator().asScala.foreach(Files.deleteIfExists(_))
            }
          }
        }
      }
    }
    (1L to newest).filterNot(keep.contains).foreach(v => Files.deleteIfExists(manifestPath(v)))
  }
}

object ManifestStore {
  /** Unreferenced dirs younger than this survive [[ManifestStore.gc]]
    * — must exceed the longest plausible stage→commit window of a
    * live writer.
    */
  val DefaultGcGraceMillis: Long = 15L * 60 * 1000
}
