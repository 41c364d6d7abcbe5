package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

import org.apache.spark.sql.DataFrame

/** Snapshot-overwrite protocol (SURVEY.md §5: "upsert atomicity — none in
  * plain Parquet — write new dir, swap").
  *
  * Plain `mode("overwrite")` deletes the target before writing: a reader
  * (or a crashed writer) can observe a missing/partial table. This sink
  * writes the new snapshot to a fresh staging directory first, then swaps
  * it in with a same-filesystem atomic rename, so the published path is
  * always a complete snapshot — the batch analogue of the reference's
  * transactional Postgres upserts.
  *
  * On a cluster the same protocol runs against an object store via a
  * manifest/table-format commit (Iceberg/Delta-style); the directory-swap
  * below is the local-filesystem form of that commit.
  */
object SnapshotSink {

  /** Publish `df` at `path` via staging-dir + atomic rename. */
  def overwrite(df: DataFrame, path: String): Unit = {
    val target  = Paths.get(path)
    val staging = Paths.get(path + ".staging-" + java.util.UUID.randomUUID())
    val retired = Paths.get(path + ".retired-" + java.util.UUID.randomUUID())
    df.write.parquet(staging.toString)
    val existed = Files.exists(target)
    if (existed) Files.move(target, retired, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case e: Throwable =>
        // Roll the old snapshot back into place before propagating.
        if (existed) Files.move(retired, target, StandardCopyOption.ATOMIC_MOVE)
        throw e
    }
    if (existed) deleteRecursively(retired)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
    }
}
