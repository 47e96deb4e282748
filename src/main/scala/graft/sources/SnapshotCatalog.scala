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
  *   - a version is claimed by hard-LINKING a fully-written temp file
  *     to `commits/v%09d` — link(2) is an atomic compare-and-swap on
  *     the filesystem namespace (EEXIST when taken): exactly one
  *     writer wins a version; the loser re-reads the head and retries
  *     against the next number (optimistic concurrency, the
  *     iceberg/delta commit shape);
  *   - the marker file (a few key=value lines) carries the manifest row, so
  *     a reader resolves any version from immutable single files and
  *     can NEVER observe a half-rewritten manifest: it sees the catalog
  *     at v_n or v_n+1, nothing in between.
  *
  * The read path costs one directory listing + one tiny file read —
  * time travel stays O(1) in the store size.
  */
object SnapshotCatalog {

  /** One committed version's manifest row. `removed` lists block FILES
    * from EARLIER snapshots this version supersedes (the delete/rewrite
    * commit shape): state(v) = data files of snapshots ≤ v minus the
    * union of `removed` over versions ≤ v — so a DELETE rewrites only
    * its candidate files into the new snapshot, names the originals
    * here, and every older version still time-travels to the
    * pre-delete state.
    */
  final case class Manifest(
      version: Long,
      path: String,
      nBlocks: Long,
      nPoints: Long,
      minDay: Long,
      maxDay: Long,
      removed: Seq[String] = Nil
  )

  private def commitsDir(root: String): Path = Paths.get(root, "commits")

  private def markerName(v: Long): String = f"v$v%09d"

  private def manifestName(v: Long): String = f"manifest-v$v%09d"

  private val ManifestRe = "manifest-v(\\d{9})".r

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
      pointsCol: String = "n_points",
      removed: Seq[String] = Nil,
      snapName: Option[String] = None
  ): Long = {
    require(
      removed.forall(f => !f.contains(";") && !f.contains("\n")),
      "removed file paths must not contain ';' or newlines (manifest encoding)"
    )
    // snapName: a DETERMINISTIC snapshot directory (the streaming sink's
    // replay-identity door — the name encodes the batch, so a replayed
    // commit is detectable from the manifest before any work). Default
    // is a fresh uuid dir, never reused.
    val snapPath = s"$root/data/${snapName.getOrElse(s"snap-${java.util.UUID.randomUUID().toString.take(12)}")}"
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
           |""".stripMargin +
          (if (removed.isEmpty) "" else s"removed=${removed.mkString(";")}\n")
      // temp write + hard-link claim: link(2) creates the marker name
      // ATOMICALLY or fails with EEXIST — a real filesystem CAS (a
      // Files.move here would be stat+rename: two racing committers
      // could both pass the stat and the second rename would silently
      // REPLACE the winner's marker — a lost commit). The marker
      // appears in the commits listing fully written or not at all,
      // and exactly one contender can own a given version number.
      val tmp = commitsDir(root).resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try {
        Files.createLink(commitsDir(root).resolve(markerName(v)), tmp)
        committed = v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => // lost the race — retry at the new head
      } finally {
        Files.deleteIfExists(tmp): Unit
      }
    }
    committed
  }

  /** Highest committed version, 0 if none. One directory listing —
    * markers and consolidated manifests both carry their head version
    * in the NAME, so no file is opened.
    */
  def currentVersion(root: String): Long = {
    val dir = commitsDir(root)
    if (!Files.isDirectory(dir)) 0L
    else {
      val s = Files.list(dir)
      try {
        s.iterator()
          .asScala
          .map(_.getFileName.toString)
          .map {
            case ManifestRe(v)                => v.toLong
            case n if n.matches("v\\d{9}")    => n.drop(1).toLong
            case _                            => 0L
          }
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
      kv("max_day").toLong,
      kv.get("removed").map(_.split(';').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    )
  }

  /** All committed (and retained) manifest rows, ascending by version.
    * Reads the NEWEST consolidated manifest (one file covering every
    * version up to its head) plus only the per-version markers ABOVE
    * that head — under continuous snapshots with periodic
    * [[compactManifests]], resolution cost is one small file + the
    * tail since the last compaction, not one file per version ever
    * committed. Markers at-or-below the consolidated head are
    * mid-compaction duplicates of rows the manifest already carries
    * and are skipped without being opened.
    */
  def manifests(root: String): Seq[Manifest] = {
    val dir = commitsDir(root)
    if (!Files.isDirectory(dir)) return Seq.empty
    // a compactor may delete a marker between our listing and our read;
    // the retry re-lists and finds the consolidated manifest instead
    def attempt(): Seq[Manifest] = {
      val names = {
        val s = Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString).toVector
        finally s.close()
      }
      val head = names.collect { case ManifestRe(v) => v.toLong } match {
        case Seq() => None
        case vs    => Some(vs.max)
      }
      val consolidated = head
        .map(h => readConsolidated(dir.resolve(manifestName(h))))
        .getOrElse(Seq.empty)
      val markerRows = names
        .filter(_.matches("v\\d{9}"))
        .map(_.drop(1).toLong)
        .filter(v => head.forall(v > _))
        .map(v => readMarker(dir.resolve(markerName(v))))
      val floor = retentionFloor(root)
      (consolidated ++ markerRows).filter(_.version >= floor).sortBy(_.version)
    }
    try attempt()
    catch { case _: java.nio.file.NoSuchFileException => attempt() }
  }

  /** Consolidate every committed version row into ONE manifest file
    * (`commits/manifest-v<head>`) and drop the per-version markers it
    * covers — the growth valve for 24/7 continuous snapshots, where the
    * marker count would otherwise grow forever and every read would
    * list-and-open all of it. Claimed with the same hard-link CAS as
    * commits; a same-head racer writes identical rows (rows ≤ head are
    * immutable), so losing that race is a no-op. Returns the head
    * version covered.
    */
  def compactManifests(root: String): Long = {
    val dir = commitsDir(root)
    val all = manifests(root)
    if (all.isEmpty) return 0L
    val head = all.last.version
    val body = all
      .map(m =>
        s"${m.version}|${m.path}|${m.nBlocks}|${m.nPoints}|${m.minDay}|${m.maxDay}" +
          (if (m.removed.isEmpty) "" else s"|${m.removed.mkString(";")}")
      )
      .mkString("", "\n", "\n")
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try Files.createLink(dir.resolve(manifestName(head)), tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    finally Files.deleteIfExists(tmp)
    // markers ≤ head and superseded consolidated manifests are redundant
    val names = {
      val s = Files.list(dir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }
    names.foreach {
      case n @ ManifestRe(v) if v.toLong < head =>
        Files.deleteIfExists(dir.resolve(n)): Unit
      case n if n.matches("v\\d{9}") && n.drop(1).toLong <= head =>
        Files.deleteIfExists(dir.resolve(n)): Unit
      case _ => ()
    }
    head
  }

  /** Retention: keep the newest `keepLast` versions' data, delete the
    * snapshot directories of everything older, and raise the retention
    * floor so readers resolve only retained versions (resolveAsOf below
    * the floor returns None instead of a dangling path). The floor is a
    * single watermark file replaced atomically. Returns the expired
    * versions.
    */
  def expireSnapshots(root: String, keepLast: Int): Seq[Long] = {
    val all = manifests(root)
    if (all.size <= keepLast) return Seq.empty
    val expired = all.dropRight(keepLast)
    val floor = all(all.size - keepLast).version
    val tmp = Paths.get(root, s".retention-${java.util.UUID.randomUUID()}")
    Files.write(tmp, floor.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(
      tmp,
      Paths.get(root, "retention"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE
    )
    expired.foreach { m =>
      val p = Paths.get(m.path)
      if (Files.exists(p)) {
        val walk = Files.walk(p)
        try
          walk
            .sorted(java.util.Comparator.reverseOrder[Path]())
            .iterator()
            .asScala
            .foreach(f => Files.deleteIfExists(f): Unit)
        finally walk.close()
      }
    }
    expired.map(_.version)
  }

  /** Clone a catalog root for a PRIVATE mutation (the fixture-template
    * discipline): copy the tree, then rewrite the absolute snapshot
    * paths inside every commit marker / consolidated manifest from
    * `srcRoot` to `dstRoot`. Manifest paths are absolute by design
    * ("$root/data/snap-..."), so a byte-copy would leave the clone's
    * manifests pointing INTO the template — and retention on the clone
    * would delete the template's data. Rewriting the root prefix
    * retargets exactly those references (path= fields, removed= lists,
    * consolidated rows) and nothing else.
    */
  private[graft] def cloneRoot(srcRoot: String, dstRoot: String): String = {
    TimeboxStore.fixtureCloneTo(srcRoot, dstRoot)
    val dir = commitsDir(dstRoot)
    if (Files.isDirectory(dir)) {
      val s = Files.list(dir)
      try
        s.iterator().asScala.filter(Files.isRegularFile(_)).foreach { f =>
          val body = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
          val next = body.replace(srcRoot, dstRoot)
          if (next != body) Files.write(f, next.getBytes(StandardCharsets.UTF_8)): Unit
        }
      finally s.close()
    }
    dstRoot
  }

  /** Delete snapshot data directories no retained manifest references —
    * the residue of (a) a commit that crashed between writing its data
    * dir and claiming a version (the uuid/deterministic dir is never
    * listed, so it is invisible to readers but holds disk forever) and
    * (b) an expireSnapshots that crashed mid-delete. The grace period
    * protects the race with an IN-FLIGHT commit whose dir is written
    * but whose marker is not yet claimed: only dirs untouched for
    * `graceMs` are candidates. Safe to run any time, from any process —
    * referenced dirs are never touched, and a dir the vacuum deletes
    * could never again become referenced (versions only append, and a
    * crashed commit's writer retries into a FRESH uuid dir / rewrites
    * its deterministic dir, refreshing its mtime past the grace).
    * Returns the deleted directories.
    */
  def vacuumOrphans(root: String, graceMs: Long = 3600000L): Seq[String] = {
    val data = Paths.get(root, "data")
    if (!Files.isDirectory(data)) return Seq.empty
    val referenced = manifests(root).map(m => Paths.get(m.path).normalize.toString).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val children = {
      val s = Files.list(data)
      try s.iterator().asScala.toVector
      finally s.close()
    }
    val deleted = Seq.newBuilder[String]
    for (d <- children if Files.isDirectory(d) && !referenced.contains(d.normalize.toString)) {
      val newest = {
        val w = Files.walk(d)
        try w.iterator().asScala.map(p => Files.getLastModifiedTime(p).toMillis).foldLeft(0L)(math.max)
        finally w.close()
      }
      if (newest < cutoff) {
        val w = Files.walk(d)
        try
          w.sorted(java.util.Comparator.reverseOrder[Path]())
            .iterator().asScala.foreach(f => Files.deleteIfExists(f): Unit)
        finally w.close()
        deleted += d.toString
      }
    }
    deleted.result()
  }

  private def retentionFloor(root: String): Long = {
    val p = Paths.get(root, "retention")
    if (Files.exists(p)) new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    else 0L
  }

  private def readConsolidated(p: Path): Seq[Manifest] =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8).linesIterator
      .filter(_.nonEmpty)
      .map { l =>
        val f = l.split('|')
        Manifest(
          f(0).toLong, f(1), f(2).toLong, f(3).toLong, f(4).toLong, f(5).toLong,
          if (f.length > 6) f(6).split(';').toSeq.filter(_.nonEmpty) else Nil
        )
      }
      .toSeq

  /** A committed snapshot directory's data files (part files only —
    * metadata/_SUCCESS skipped). The file-granular unit the `removed`
    * composition subtracts at.
    */
  private[sources] def dataFilesOf(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try
      s.iterator()
        .asScala
        .filter(Files.isRegularFile(_))
        .map(_.toString)
        .filter { p =>
          val n = p.substring(p.lastIndexOf('/') + 1)
          !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet")
        }
        .toVector
    finally s.close()
  }

  /** Greatest committed version ≤ `asofVersion` — the time-travel
    * resolve. Reads only immutable marker files: concurrent commits
    * can only APPEND versions, so the answer is always a version that
    * was fully committed when the listing happened.
    */
  def resolveAsOf(root: String, asofVersion: Long): Option[Manifest] =
    manifests(root).filter(_.version <= asofVersion).lastOption
}
