package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Atomic snapshot-commit protocol for the store catalog — the
  * Spark-native answer to the reference's fcntl read/write locks around
  * file I/O (timebox.py:405-455). The reference serializes one writer
  * and excludes readers during a rewrite; at warehouse scale nobody
  * holds locks — immutable files + an atomic commit step give the same
  * guarantees without any coordination on the read path:
  *
  *   - every snapshot is written to a FRESH uuid-named directory and
  *     never modified after commit;
  *   - a version is claimed by creating `commits/v%09d` with
  *     CREATE_NEW — an atomic compare-and-swap on the filesystem
  *     namespace: exactly one writer wins a version; the loser re-reads
  *     the head and retries against the next number (optimistic
  *     concurrency, the iceberg/delta commit shape);
  *   - the marker file (a few key=value lines, written to a temp name
  *     then atomically MOVEd into place) carries the manifest row, so
  *     a reader resolves any version from immutable single files and
  *     can NEVER observe a half-rewritten manifest: it sees the catalog
  *     at v_n or v_n+1, nothing in between.
  *
  * The read path costs one directory listing + one tiny file read —
  * time travel stays O(1) in the store size.
  */
object SnapshotCatalog {

  /** One committed version's manifest row. */
  final case class Manifest(
      version: Long,
      path: String,
      nBlocks: Long,
      nPoints: Long,
      minDay: Long,
      maxDay: Long
  )

  private def commitsDir(root: String): Path = Paths.get(root, "commits")

  private def markerName(v: Long): String = f"v$v%09d"

  /** Write a snapshot through `write` (given a fresh immutable
    * directory), derive its manifest stats from block metadata, and
    * commit it under the next free version. Safe against any number of
    * concurrent committers on the same root; returns the version won.
    *
    * @param pointsCol block-metadata column summed for the manifest's
    *        point count (n_points on encoded stores)
    */
  def commit(
      spark: SparkSession,
      root: String,
      write: String => Unit,
      pointsCol: String = "n_points"
  ): Long = {
    val snapPath = s"$root/data/snap-${java.util.UUID.randomUUID().toString.take(12)}"
    write(snapPath)
    val snap = spark.read.parquet(snapPath)
    val stats = snap
      .agg(
        count(lit(1)).as("n_blocks"),
        coalesce(sum(col(pointsCol)), lit(0L)).as("n_points"),
        coalesce(min(col("day_id")), lit(0L)).as("min_day"),
        coalesce(max(col("day_id")), lit(0L)).as("max_day")
      )
      .head()
    Files.createDirectories(commitsDir(root))
    var committed = -1L
    while (committed < 0) {
      val v = currentVersion(root) + 1
      val body =
        s"""version=$v
           |path=$snapPath
           |n_blocks=${stats.getAs[Long]("n_blocks")}
           |n_points=${stats.getAs[Long]("n_points")}
           |min_day=${stats.getAs[Long]("min_day")}
           |max_day=${stats.getAs[Long]("max_day")}
           |""".stripMargin
      // temp write + CREATE_NEW move: the marker appears in the commits
      // listing fully written or not at all, and exactly one contender
      // can own a given version number
      val tmp = commitsDir(root).resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try {
        Files.move(tmp, commitsDir(root).resolve(markerName(v)))
        committed = v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp): Unit // lost the race — retry at the new head
      }
    }
    committed
  }

  /** Highest committed version, 0 if none. One directory listing. */
  def currentVersion(root: String): Long = {
    val dir = commitsDir(root)
    if (!Files.isDirectory(dir)) 0L
    else {
      val s = Files.list(dir)
      try {
        s.iterator()
          .asScala
          .map(_.getFileName.toString)
          .filter(_.matches("v\\d{9}"))
          .map(_.drop(1).toLong)
          .foldLeft(0L)(math.max)
      } finally s.close()
    }
  }

  private implicit class IterOps[A](private val it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  private def readMarker(p: Path): Manifest = {
    val kv = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .linesIterator
      .filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
      .toMap
    Manifest(
      kv("version").toLong,
      kv("path"),
      kv("n_blocks").toLong,
      kv("n_points").toLong,
      kv("min_day").toLong,
      kv("max_day").toLong
    )
  }

  /** All committed manifest rows, ascending by version. */
  def manifests(root: String): Seq[Manifest] = {
    val dir = commitsDir(root)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try {
        s.iterator()
          .asScala
          .filter(_.getFileName.toString.matches("v\\d{9}"))
          .map(readMarker)
          .toSeq
          .sortBy(_.version)
      } finally s.close()
    }
  }

  /** Greatest committed version ≤ `asofVersion` — the time-travel
    * resolve. Reads only immutable marker files: concurrent commits
    * can only APPEND versions, so the answer is always a version that
    * was fully committed when the listing happened.
    */
  def resolveAsOf(root: String, asofVersion: Long): Option[Manifest] =
    manifests(root).filter(_.version <= asofVersion).lastOption
}
