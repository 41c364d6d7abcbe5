package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.DataFrame

/** Snapshot-overwrite protocol (SURVEY.md §5: "upsert atomicity — none in
  * plain Parquet — write new dir, swap").
  *
  * Plain `mode("overwrite")` deletes the target before writing: a reader
  * (or a crashed writer) can observe a missing/partial table. Here the
  * published `path` is a SYMLINK: each snapshot writes to a fresh
  * versioned directory (`<path>.v-<uuid>`), and publishing is ONE atomic
  * rename of a symlink over the old one — there is no instant at which
  * `path` is missing or partial, and a crash at any point leaves the
  * previous snapshot published (at worst plus an unpublished version
  * directory, removed by the next successful publish's cleanup). This is
  * the batch analogue of the reference's transactional Postgres upserts.
  *
  * On a cluster the same protocol runs against an object store via a
  * manifest/table-format commit (Iceberg/Delta-style); the symlink swap is
  * the local-filesystem form of that commit pointer.
  */
object SnapshotSink {

  /** Publish `df` at `path` (a symlink managed by this sink).
    * `partitionBy` keys the snapshot's directory layout (e.g. an IVF
    * inverted file partitioned by list id) — readers prune partitions
    * exactly as with any partitioned parquet table.
    */
  def overwrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val target  = Paths.get(path)
    require(!Files.exists(target) || Files.isSymbolicLink(target),
      s"snapshot target $path exists but is not a sink-managed symlink")
    val version = Paths.get(path + ".v-" + java.util.UUID.randomUUID())
    val prior: Option[Path] =
      if (Files.isSymbolicLink(target)) Some(Files.readSymbolicLink(target)) else None

    try df.write.partitionBy(partitionBy: _*).parquet(version.toString)
    catch { case e: Throwable => deleteRecursively(version); throw e }

    // Atomic publish: rename a fresh symlink over the target.
    val tmpLink = Paths.get(path + ".lnk-" + java.util.UUID.randomUUID())
    Files.createSymbolicLink(tmpLink, version.getFileName)
    Files.move(tmpLink, target, StandardCopyOption.ATOMIC_MOVE)

    // Retire the previous version only after the new one is live.
    prior.foreach(p => deleteRecursively(target.getParent.resolve(p)))
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
