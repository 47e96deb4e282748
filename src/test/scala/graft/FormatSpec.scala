package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{TimeboxFormat, TimeboxStore}

/** The `spark.read.format("timebox")` facade: schema inference, filter
  * pushdown into the block-skip machinery, column pruning of the
  * decode, and row-level equality with the hand-wired library reads.
  */
class FormatSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val storePath: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_format_spec").toString + "/store"
    TimeboxStore
      .encode(TimeboxStore.eventTypePoints(spark, sf), tagCols = Seq("value_c", "etype_c"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private val lo = 1704672000000000L // 2024-01-08
  private val hi = 1705276800000000L // 2024-01-15

  test("schema inference: decoded point schema with one LONG column per stored tag") {
    val df = spark.read.format("timebox").load(storePath)
    assert(df.columns.toSeq === Seq("series_id", "ts_us", "seq", "value_c", "etype_c"))
    assert(df.schema.fields.forall(_.dataType.typeName == "long"))
  }

  test("range + value filters push down and match the library zone-map read exactly") {
    val q = spark.read.format("timebox").load(storePath)
      .filter(col("ts_us") >= lo && col("ts_us") < hi && col("value_c") >= 9000L && col("value_c") <= 12000L)
    // plan toString truncates metadata — read the scan node's handled
    // filter set directly
    val handled = q.queryExecution.executedPlan.collect {
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r.handledFilters
    }.flatten.map(_.toString).toSet
    for (f <- Seq("GreaterThanOrEqual(ts_us", "LessThan(ts_us", "GreaterThanOrEqual(value_c", "LessThanOrEqual(value_c"))
      assert(handled.exists(_.startsWith(f)), s"$f not reported pushed: $handled")
    val lib = TimeboxStore
      .rangeReadValueFiltered(spark, storePath, lo, hi, "value_c", 9000L, 12000L)
      .select(col("series_id"), col("ts_us"), col("seq"), col("value_c"))
    val fac = q.select(col("series_id"), col("ts_us"), col("seq"), col("value_c"))
    assert(fac.count() > 0)
    assert(fac.except(lib).count() === 0 && lib.except(fac).count() === 0)
  }

  test("equality pushdown reaches the dictionary + bloom skip chain; matches the library read") {
    val q = spark.read.format("timebox").load(storePath)
      .filter(col("ts_us") >= lo && col("ts_us") < hi && col("etype_c") === 112L)
    // the INNER pipeline (what buildScan constructs) must carry the
    // dict/bloom block predicates down to the parquet block scan
    val inner = TimeboxFormat.scanDataFrame(
      spark, storePath,
      q.schema,
      Array(
        org.apache.spark.sql.sources.GreaterThanOrEqual("ts_us", lo),
        org.apache.spark.sql.sources.LessThan("ts_us", hi),
        org.apache.spark.sql.sources.EqualTo("etype_c", 112L)
      )
    )
    val innerPlan = inner.queryExecution.optimizedPlan.toString
    for (c <- Seq("dict_etype_c", "bloom_etype_c", "min_etype_c", "max_etype_c", "day_id"))
      assert(innerPlan.contains(c), s"block skip on $c missing from the facade's inner plan")
    val lib = TimeboxStore
      .rangeReadValueEquals(spark, storePath, lo, hi, "etype_c", 112L)
      .select(col("series_id"), col("ts_us"), col("seq"), col("etype_c"))
    val fac = q.select(col("series_id"), col("ts_us"), col("seq"), col("etype_c"))
    assert(fac.count() > 0)
    assert(fac.except(lib).count() === 0 && lib.except(fac).count() === 0)
  }

  test("column pruning: an unrequested tag's offset arrays never reach the block scan") {
    val required = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("series_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value_c", org.apache.spark.sql.types.LongType)
    ))
    val inner = TimeboxFormat.scanDataFrame(spark, storePath, required, Array.empty)
    val scans = inner.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.metadata("ReadSchema")
    }
    assert(scans.nonEmpty)
    assert(scans.forall(!_.contains("offs_etype_c")), s"unrequested tag decoded: $scans")
    assert(scans.exists(_.contains("offs_value_c")), "requested tag missing from the block scan")
  }

  test("aggregate pushdown: groupBy(series).agg answered from block metadata — no re-aggregation, no decode") {
    val df = spark.read.format("timebox").load(storePath)
      .groupBy(col("series_id"))
      .agg(
        count(col("value_c")).as("n"),
        sum(col("value_c")).as("s"),
        min(col("value_c")).as("mn"),
        max(col("value_c")).as("mx"),
        min(col("ts_us")).as("t0"),
        max(col("ts_us")).as("t1")
      )
    // COMPLETE pushdown: Spark plans no aggregation above the scan
    val plan = df.queryExecution.executedPlan.toString
    for (bad <- Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate"))
      assert(!plan.contains(bad), s"aggregate was not completely pushed:\n$plan")
    // and the numbers equal decode-then-aggregate
    val expect = TimeboxStore.read(spark, storePath)
      .groupBy(col("series_id"))
      .agg(
        count(col("value_c")).as("n"),
        sum(col("value_c")).as("s"),
        min(col("value_c")).as("mn"),
        max(col("value_c")).as("mx"),
        min(col("ts_us")).as("t0"),
        max(col("ts_us")).as("t1")
      )
    assert(df.count() > 0)
    assert(df.except(expect).count() === 0 && expect.except(df).count() === 0)
  }

  test("aggregate pushdown declines what block metadata cannot answer") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.aggregate._
    val tags = Set("value_c", "etype_c")
    def agg(group: Array[org.apache.spark.sql.connector.expressions.Expression], fs: AggregateFunc*) =
      new Aggregation(fs.toArray, group)
    val bySeries = Array[org.apache.spark.sql.connector.expressions.Expression](Expressions.column("series_id"))
    assert(TimeboxFormat.translateAgg(agg(bySeries, new CountStar, new Sum(Expressions.column("value_c"), false)), tags).isDefined)
    // distinct sums, non-tag columns, and non-series grouping all decline
    assert(TimeboxFormat.translateAgg(agg(bySeries, new Sum(Expressions.column("value_c"), true)), tags).isEmpty)
    assert(TimeboxFormat.translateAgg(agg(bySeries, new Sum(Expressions.column("seq"), false)), tags).isEmpty)
    assert(TimeboxFormat.translateAgg(
      agg(Array[org.apache.spark.sql.connector.expressions.Expression](Expressions.column("etype_c")), new CountStar), tags).isEmpty)
    // min/max on ts_us are block-computable
    assert(TimeboxFormat.translateAgg(agg(bySeries, new Min(Expressions.column("ts_us")), new Max(Expressions.column("ts_us"))), tags).isDefined)
  }

  test("unfilterable predicates are not claimed as pushed") {
    val tags = Set("value_c", "etype_c")
    assert(TimeboxFormat.handles(org.apache.spark.sql.sources.EqualTo("ts_us", 5L), tags))
    assert(TimeboxFormat.handles(org.apache.spark.sql.sources.In("series_id", Array(1L, 2L)), tags))
    assert(!TimeboxFormat.handles(org.apache.spark.sql.sources.EqualTo("seq", 5L), tags))
    assert(!TimeboxFormat.handles(org.apache.spark.sql.sources.IsNull("value_c"), tags))
    assert(!TimeboxFormat.handles(
      org.apache.spark.sql.sources.Or(
        org.apache.spark.sql.sources.EqualTo("value_c", 1L),
        org.apache.spark.sql.sources.EqualTo("value_c", 2L)
      ), tags))
  }

  test("write facade: blocks identical to the library encode, append adds without rewriting") {
    val p = java.nio.file.Files.createTempDirectory("graft_format_w").toString + "/store"
    val pts = TimeboxStore.eventTypePoints(spark, sf)
      .select(
        col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"),
        col("value_c"), col("etype_c"))
    pts.write.format("timebox").mode("overwrite").save(p)
    // byte-level parity: the facade IS TimeboxStore.encode
    val direct = TimeboxStore.encode(
      TimeboxStore.eventTypePoints(spark, sf), tagCols = Seq("value_c", "etype_c"))
    val viaFormat = spark.read.parquet(p)
    assert(viaFormat.count() === direct.count())
    val cmpCols = Seq("series_id", "day_id", "n_points", "start_us", "mode_value_c", "min_value_c")
    assert(
      viaFormat.select(cmpCols.map(col): _*).exceptAll(direct.select(cmpCols.map(col): _*)).count() === 0,
      "facade-written blocks diverge from the library encode"
    )
    // append: re-adding the same points doubles every block, rewrites none
    val firstFiles = new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    pts.write.format("timebox").mode("append").save(p)
    assert(spark.read.parquet(p).count() === direct.count() * 2)
    val afterFiles = new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(afterFiles > firstFiles, "append produced no new block files")
    // read side unions appended blocks: twice the points per series
    val n = spark.read.format("timebox").load(p).count()
    val n1 = TimeboxStore.decode(direct, Seq("value_c", "etype_c")).count()
    assert(n === 2 * n1)
  }

  test("asOf time travel: option resolves exactly the <= v snapshot paths, head read without it") {
    import graft.sources.SnapshotCatalog
    val root = java.nio.file.Files.createTempDirectory("graft_asof_spec").toString + "/cat"
    val pts = TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 20)
    // 5 delta snapshots: version i carries only points with seq%5==i-1
    // so every version contributes distinguishable rows
    (1 to 5).foreach { i =>
      SnapshotCatalog.commit(
        spark, root,
        p => TimeboxStore.encode(pts.filter(col("event_id") % 5 === (i - 1)), tagCols = Seq("value_c", "etype_c"))
          .write.parquet(p)
      )
    }
    // (a) the resolved PATH SET is exactly versions 1..3 — the pin the
    // r9 verdict asked for: no later snapshot contributes I/O
    val m = SnapshotCatalog.manifests(root)
    assert(m.map(_.version) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(TimeboxFormat.resolveDataPaths(root, Some(3L)) === m.take(3).map(_.path))
    assert(TimeboxFormat.resolveDataPaths(root, None) === m.map(_.path))
    // (b) end-to-end: asOf=3 equals the direct union of deltas 1..3,
    // and provably excludes versions 4-5
    val asOf3 = spark.read.format("timebox").option("asOf", 3).load(root)
    val direct = TimeboxStore.decode(spark.read.parquet(m.take(3).map(_.path): _*), Seq("value_c", "etype_c"))
    assert(asOf3.count() === direct.count())
    assert(asOf3.except(direct).count() === 0 && direct.except(asOf3).count() === 0)
    assert(asOf3.filter(col("seq") % 5 >= 3).count() === 0, "a version > asOf leaked into the read")
    val head = spark.read.format("timebox").load(root)
    assert(head.filter(col("seq") % 5 >= 3).count() > 0, "head read must see all committed versions")
    // (c) COMPLETE aggregate pushdown fires through the versioned door
    val agg = spark.read.format("timebox").option("asOf", 3).load(root)
      .groupBy(col("series_id"))
      .agg(count(col("value_c")).as("n"), sum(col("value_c")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    for (bad <- Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate"))
      assert(!plan.contains(bad), s"aggregate not completely pushed through asOf:\n$plan")
    val expect = direct.groupBy(col("series_id")).agg(count(col("value_c")).as("n"), sum(col("value_c")).as("s"))
    assert(agg.except(expect).count() === 0 && expect.except(agg).count() === 0)
    // (d) guard rails: asOf on a raw store, version below retention,
    // and writes through a catalog root all refuse loudly
    intercept[IllegalArgumentException](
      spark.read.format("timebox").option("asOf", 1).load(storePath).count()
    )
    intercept[IllegalArgumentException](
      spark.read.format("timebox").option("asOf", 0).load(root).count()
    )
    intercept[Exception](
      spark.range(1).selectExpr("id AS series_id", "id AS ts_us", "id AS seq", "id AS value_c")
        .write.format("timebox").mode("append").save(root)
    )
    // startingVersion is streaming-only: a BATCH read carrying it must
    // refuse loudly, not silently serve the full store from version 1
    val e = intercept[IllegalArgumentException](
      spark.read.format("timebox").option("startingVersion", 2).load(root).count()
    )
    assert(e.getMessage.contains("streaming"), s"wrong refusal: ${e.getMessage}")
  }

  test("SQL DDL surface: CREATE TABLE USING timebox reaches pushdowns from pure SQL") {
    spark.sql("DROP TABLE IF EXISTS tb_ddl_spec")
    spark.sql(s"CREATE TABLE tb_ddl_spec USING timebox LOCATION '$storePath'")
    try {
      // filters written in SQL land as pushed filters on the scan
      val filtered = spark.sql(
        s"SELECT series_id, ts_us, value_c FROM tb_ddl_spec WHERE ts_us >= $lo AND ts_us < $hi AND value_c >= 0"
      )
      val ex = filtered.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(ex.contains("PushedFilters") && ex.contains("GreaterThanOrEqual(ts_us"),
        s"SQL WHERE did not reach PushedFilters:\n$ex")
      val expect = TimeboxStore.read(spark, storePath)
        .filter(col("ts_us") >= lo && col("ts_us") < hi && col("value_c") >= 0)
        .select(col("series_id"), col("ts_us"), col("value_c"))
      assert(filtered.count() > 0)
      assert(filtered.except(expect).count() === 0 && expect.except(filtered).count() === 0)
      // a pure-SQL aggregate completely pushes down (no aggregate exec)
      val agg = spark.sql(
        "SELECT series_id, COUNT(value_c) AS n, SUM(value_c) AS s FROM tb_ddl_spec GROUP BY series_id"
      )
      val plan = agg.queryExecution.executedPlan.toString
      for (bad <- Seq("HashAggregate", "SortAggregate", "ObjectHashAggregate"))
        assert(!plan.contains(bad), s"SQL aggregate not completely pushed:\n$plan")
      val aggExpect = TimeboxStore.read(spark, storePath)
        .groupBy(col("series_id")).agg(count(col("value_c")).as("n"), sum(col("value_c")).as("s"))
      assert(agg.except(aggExpect).count() === 0 && aggExpect.except(agg).count() === 0)
    } finally spark.sql("DROP TABLE IF EXISTS tb_ddl_spec"): Unit
  }

  test("SQL write door: CTAS + INSERT INTO land the identical store the DataFrame writer lands") {
    val root = java.nio.file.Files.createTempDirectory("graft_sqlw_spec").toString
    val pts = TimeboxStore.eventTypePoints(spark, sf)
      .select(col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"), col("value_c"))
      .filter(col("series_id") < 20)
    pts.createOrReplaceTempView("sqlw_pts")
    spark.sql("DROP TABLE IF EXISTS tb_sqlw_spec")
    try {
      // CTAS creates + writes in one statement; INSERT INTO appends
      spark.sql(
        s"CREATE TABLE tb_sqlw_spec USING timebox LOCATION '$root/sql' AS " +
          "SELECT * FROM sqlw_pts WHERE series_id % 2 = 0"
      )
      spark.sql("INSERT INTO tb_sqlw_spec SELECT * FROM sqlw_pts WHERE series_id % 2 = 1")
      // the DataFrame door writes the same halves to a sibling store
      pts.filter(col("series_id") % 2 === 0).write.format("timebox").mode("overwrite").save(s"$root/df")
      pts.filter(col("series_id") % 2 === 1).write.format("timebox").mode("append").save(s"$root/df")
      val viaSql = spark.sql("SELECT * FROM tb_sqlw_spec")
      val viaDf  = spark.read.format("timebox").load(s"$root/df")
      assert(viaSql.count() === pts.count(), "SQL-written store lost or duplicated rows")
      assert(viaSql.except(viaDf).count() === 0 && viaDf.except(viaSql).count() === 0,
        "SQL and DataFrame write doors landed different stores")
      // INSERT OVERWRITE truncates, then lands only the new slice
      spark.sql("INSERT OVERWRITE tb_sqlw_spec SELECT * FROM sqlw_pts WHERE series_id % 4 = 0")
      assert(
        spark.sql("SELECT COUNT(*) FROM tb_sqlw_spec").head().getLong(0)
          === pts.filter(col("series_id") % 4 === 0).count(),
        "INSERT OVERWRITE did not truncate-and-replace"
      )
    } finally {
      spark.sql("DROP TABLE IF EXISTS tb_sqlw_spec")
      spark.catalog.dropTempView("sqlw_pts"): Unit
    }
  }

  test("streaming read: versions arrive as micro-batches, resume serves only post-drain commits") {
    import graft.sources.SnapshotCatalog
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_streamread_spec").toString + "/cat"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_streamread_ckpt").toString
    val pts = TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 10)
    def commitSlice(i: Int): Unit =
      SnapshotCatalog.commit(
        spark, root,
        p => TimeboxStore.encode(pts.filter(col("event_id") % 4 === i.toLong), tagCols = Seq("value_c", "etype_c"))
          .write.parquet(p)
      ): Unit
    (0 to 2).foreach(commitSlice)
    // file sink (memory sink refuses checkpoint recovery): one output
    // path, two drains over one checkpoint — resume appends ONLY what
    // committed in between
    val out = java.nio.file.Files.createTempDirectory("graft_streamread_out").toString + "/rows"
    def drain(): Unit = {
      val q = spark.readStream.format("timebox").load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val a = spark.read.parquet(out)
    assert(a.select(col("commit_version")).distinct().collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // served rows == the decoded union of the three snapshots
    val ms = SnapshotCatalog.manifests(root)
    val direct = TimeboxStore.decode(spark.read.parquet(ms.map(_.path): _*), Seq("value_c", "etype_c"))
    val n1 = a.count()
    assert(n1 === direct.count())
    // a commit AFTER the drain arrives as its own incremental batch on
    // resume — the checkpointed version offset is the resume point
    commitSlice(3)
    drain()
    val b = spark.read.parquet(out)
    assert(b.select(col("commit_version")).distinct().collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L, 4L))
    val sliceN = pts.filter(col("event_id") % 4 === 3L).count()
    assert(b.count() === n1 + sliceN, "resume must append ONLY the post-drain commit")
    assert(b.filter(col("commit_version") === 4L).count() === sliceN)
  }

  test("streaming read survives a CRASH mid-drain: restart serves (j, n] exactly once, partial output never surfaces") {
    import graft.sources.SnapshotCatalog
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_streamcrash_spec").toString + "/cat"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_streamcrash_ckpt").toString
    val out  = java.nio.file.Files.createTempDirectory("graft_streamcrash_out").toString + "/rows"
    val pts = TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 10)
    def commitSlice(i: Int): Unit =
      SnapshotCatalog.commit(
        spark, root,
        p => TimeboxStore.encode(pts.filter(col("event_id") % 4 === i.toLong), tagCols = Seq("value_c", "etype_c"))
          .write.parquet(p)
      ): Unit
    // the poison fires INSIDE batch processing — a dirty executor
    // failure mid-write, not a clean stop (the clean-stop resume is
    // the previous test; this is the production failure path)
    val poison = udf { (v: Long) =>
      if (FormatSpecCrash.armed && v >= 3L)
        throw new RuntimeException("injected crash while processing version " + v)
      v
    }
    def drain(): Unit = {
      val q = spark.readStream.format("timebox").load(root)
        .withColumn("commit_version", poison(col("commit_version")))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // phase 1: two commits drain cleanly (j = 2 processed)
    (0 to 1).foreach(commitSlice)
    FormatSpecCrash.armed = false
    drain()
    assert(spark.read.parquet(out).select(col("commit_version")).distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    // phase 2: two more commits; the drain CRASHES processing them
    (2 to 3).foreach(commitSlice)
    FormatSpecCrash.armed = true
    intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
    // the failed batch's partial files must NOT surface through the
    // sink manifest: the crashed run changed nothing visible
    val afterCrash = spark.read.parquet(out)
    assert(afterCrash.select(col("commit_version")).distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L), "crashed batch leaked rows into the visible sink")
    val n2 = afterCrash.count()
    // phase 3: restart from the checkpoint — versions (2, 4] arrive
    // EXACTLY ONCE (no loss from the crash, no duplication from the
    // failed attempt's replay)
    FormatSpecCrash.armed = false
    drain()
    val b = spark.read.parquet(out)
    assert(b.select(col("commit_version")).distinct().collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 3L, 4L))
    val ms = SnapshotCatalog.manifests(root)
    val direct = TimeboxStore.decode(spark.read.parquet(ms.map(_.path): _*), Seq("value_c", "etype_c"))
    assert(b.count() === direct.count(), "post-recovery total diverges from the batch decode")
    for (i <- 2 to 3) {
      val sliceN = pts.filter(col("event_id") % 4 === i.toLong).count()
      assert(b.filter(col("commit_version") === (i + 1).toLong).count() === sliceN,
        s"version ${i + 1} not served exactly once after crash recovery")
    }
    assert(b.count() === n2 + (2 to 3).map(i => pts.filter(col("event_id") % 4 === i.toLong).count()).sum)
  }

  test("streaming read honors startingVersion: first batch begins at k, earlier versions never served") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.SnapshotCatalog
    val root = java.nio.file.Files.createTempDirectory("graft_streamfrom_spec").toString + "/cat"
    val pts  = TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 10)
    (0 to 3).foreach { i =>
      SnapshotCatalog.commit(
        spark, root,
        p => TimeboxStore.encode(pts.filter(col("event_id") % 4 === i.toLong), tagCols = Seq("value_c", "etype_c"))
          .write.parquet(p)
      ): Unit
    }
    val out  = java.nio.file.Files.createTempDirectory("graft_streamfrom_out").toString + "/rows"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_streamfrom_ckpt").toString
    val q = spark.readStream.format("timebox").option("startingVersion", "3").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val served = spark.read.parquet(out)
    assert(served.select(col("commit_version")).distinct().collect().map(_.getLong(0)).toSet === Set(3L, 4L))
    val expect = pts.filter(col("event_id") % 4 === 2L || col("event_id") % 4 === 3L).count()
    assert(served.count() === expect, "startingVersion=3 must serve exactly the version 3..4 suffix")
    // a bad startingVersion fails loudly at source construction
    val e = intercept[Throwable] {
      spark.readStream.format("timebox").option("startingVersion", "0").load(root)
        .writeStream.format("noop").trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("startingVersion"), s"expected a startingVersion error, got: $chain")
  }

  test("streaming write sink: multi-batch drain equals the batch write, resume appends only new slices") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_sinkspec").toString
    val srcDir = new java.io.File(root, "pts.parquet"); assert(srcDir.mkdir())
    val store = s"$root/store"
    val pts = TimeboxStore
      .eventTypePoints(spark, sf)
      .filter(col("user_id") < 10)
      .select(
        col("user_id").as("series_id"),
        col("ts_us"),
        col("event_id").as("seq"),
        col("value_c")
      )
    val t0 = System.currentTimeMillis() - 60000
    def writeSlice(i: Int): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sink_slice").toString
      pts.filter(col("seq") % 4 === i.toLong).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, s"p$i.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(t0 + i * 2000))
    }
    (0 to 2).foreach(writeSlice)
    def drain(): Unit = {
      val q = spark.readStream
        .schema(pts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir.getPath)
        .writeStream.format("timebox")
        .option("checkpointLocation", s"$root/_ckpt")
        .trigger(Trigger.AvailableNow())
        .start(store)
      q.awaitTermination()
    }
    drain()
    // three micro-batches through the sink == the one-shot batch write
    val batchStore = s"$root/batch"
    pts.filter(col("seq") % 4 <= 2L).write.format("timebox").mode("overwrite").save(batchStore)
    def decoded(p: String) = spark.read.format("timebox").load(p)
    val (a, b) = (decoded(store), decoded(batchStore))
    assert(a.count() === b.count())
    assert(a.except(b).count() === 0 && b.except(a).count() === 0,
      "streamed store diverges from the batch-written store")
    // resume over the same checkpoint: only the NEW slice lands
    writeSlice(3)
    drain()
    val full = decoded(store)
    assert(full.count() === pts.count(), "resume must append exactly the new slice")
    assert(full.except(pts).count() === 0 && pts.except(full).count() === 0)
  }

  test("streaming write sink: a replayed batchId lands once — marker skip, and a crashed attempt re-lands byte-stably") {
    import graft.sources.TimeboxStreamSink
    val root = java.nio.file.Files.createTempDirectory("graft_sinkreplay").toString
    val store = s"$root/store"
    val pts = TimeboxStore
      .eventTypePoints(spark, sf)
      .filter(col("user_id") < 5)
      .select(col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"), col("value_c"))
      .localCheckpoint()
    val ns = "aaaa0000"
    val sink = new TimeboxStreamSink(spark, store, ns)
    sink.addBatch(0L, pts)
    def files() = new java.io.File(store).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    val once = files()
    assert(
      once.nonEmpty && once.keySet.forall(_.startsWith(s"b$ns-0-")),
      s"blocks must carry namespace+batchId names: ${once.keySet}"
    )
    val nRows = spark.read.format("timebox").load(store).count()
    // replay with the marker present: a no-op
    sink.addBatch(0L, pts)
    assert(files() === once, "replayed batchId re-landed blocks")
    // crash simulation: marker lost AFTER a (partial) landing — the
    // replay clears the partial files and re-lands deterministically
    assert(new java.io.File(s"$store/_stream_commits/$ns-0").delete())
    assert(new java.io.File(store, once.keySet.head).delete(), "could not simulate a partial landing")
    sink.addBatch(0L, pts)
    assert(files().keySet === once.keySet, "recovery must restore the exact block set")
    assert(spark.read.format("timebox").load(store).count() === nRows, "recovery duplicated or lost points")
    assert(new java.io.File(s"$store/_stream_commits/$ns-0").exists(), "recovery must re-commit the marker")
    // a SECOND query (fresh checkpoint → fresh namespace) restarts its
    // batchIds at 0; the first query's markers must not suppress it
    val sink2 = new TimeboxStreamSink(spark, store, "bbbb1111")
    sink2.addBatch(0L, pts)
    assert(
      spark.read.format("timebox").load(store).count() === 2 * nRows,
      "a second query's batch 0 was dropped by the first query's commit marker"
    )
  }

  test("SQL DELETE door: purges exactly the predicate's rows; unsupported predicates decline loudly, store untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_sqldel_spec").toString
    val p = s"$root/store"
    val pts = TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 20)
    TimeboxStore.encode(pts, tagCols = Seq("value_c", "etype_c"))
      .write.mode("overwrite").parquet(p)
    spark.sql("DROP TABLE IF EXISTS tb_sqldel_spec")
    spark.sql(s"CREATE TABLE tb_sqldel_spec USING timebox LOCATION '$p'")
    val before = spark.read.format("timebox").load(p).count()
    // a predicate the skip machinery cannot serve exactly declines at
    // canDeleteWhere — Spark errors, nothing is deleted
    intercept[Throwable](spark.sql("DELETE FROM tb_sqldel_spec WHERE etype_c > 100"))
    intercept[Throwable](spark.sql("DELETE FROM tb_sqldel_spec")) // no WHERE: refuse, never silently no-op
    assert(spark.read.format("timebox").load(p).count() === before, "declined DELETE must not change the store")
    // the supported shape: tag equality — same survivors as the raw filter
    spark.sql("DELETE FROM tb_sqldel_spec WHERE etype_c = 112")
    val got = spark.read.format("timebox").load(p)
      .select(col("series_id"), col("ts_us"), col("seq"), col("value_c"), col("etype_c"))
    val expect = pts
      .filter(col("etype_c") =!= 112L)
      .select(
        col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"),
        col("value_c"), col("etype_c")
      )
    assert(got.count() === expect.count())
    assert(got.except(expect).count() === 0 && expect.except(got).count() === 0,
      "SQL DELETE survivors diverge from the raw filter")
    // the SQL read door keeps working on the rewritten store
    assert(spark.sql("SELECT COUNT(*) AS n FROM tb_sqldel_spec").head().getLong(0) === expect.count())
  }

  test("SQL DELETE conjunction: WHERE a = x AND b = y deletes the INTERSECTION, not the union") {
    val root = java.nio.file.Files.createTempDirectory("graft_sqldel_conj").toString
    val p = s"$root/store"
    val pts = TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 20)
    TimeboxStore.encode(pts, tagCols = Seq("value_c", "etype_c"))
      .write.mode("overwrite").parquet(p)
    spark.sql("DROP TABLE IF EXISTS tb_sqldel_conj")
    spark.sql(s"CREATE TABLE tb_sqldel_conj USING timebox LOCATION '$p'")
    // pick a (value_c, etype_c) pair that exists, where each side alone
    // matches strictly more rows than the conjunction
    val probe = pts.groupBy(col("value_c"), col("etype_c")).count().orderBy(col("count").desc).head()
    val (v, e) = (probe.getLong(0), probe.getLong(1))
    val nBoth  = pts.filter(col("value_c") === v && col("etype_c") === e).count()
    val nUnion = pts.filter(col("value_c") === v || col("etype_c") === e).count()
    assert(nBoth > 0 && nUnion > nBoth, "fixture must separate conjunction from union")
    val before = spark.read.format("timebox").load(p).count()
    spark.sql(s"DELETE FROM tb_sqldel_conj WHERE value_c = $v AND etype_c = $e")
    val after = spark.read.format("timebox").load(p)
    assert(after.count() === before - nBoth, "conjunction DELETE must remove exactly the AND-matched rows")
    assert(
      after.filter(col("value_c") === v && col("etype_c") === e).count() === 0,
      "AND-matched rows survived"
    )
    // rows matching only ONE conjunct are NOT deleted
    assert(
      after.filter(col("value_c") === v || col("etype_c") === e).count() === nUnion - nBoth,
      "single-conjunct rows were over-deleted (union semantics)"
    )
  }

  test("SQL DELETE swap: a crash between dst-delete and rename heals on the next read") {
    val root = java.nio.file.Files.createTempDirectory("graft_sqldel_crash").toString
    val p = s"$root/store"
    val pts = TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 20)
    TimeboxStore.encode(pts, tagCols = Seq("value_c", "etype_c"))
      .write.mode("overwrite").parquet(p)
    spark.sql("DROP TABLE IF EXISTS tb_sqldel_crash")
    spark.sql(s"CREATE TABLE tb_sqldel_crash USING timebox LOCATION '$p'")
    spark.sql("DELETE FROM tb_sqldel_crash WHERE etype_c = 112")
    val survivors = spark.read.format("timebox").load(p).count()
    // reconstruct the worst crash point: staging fully materialized +
    // marker written + dst deleted, process dies before the rename
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"${p}__delete_staging")
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(p), fs, staging, false,
      spark.sparkContext.hadoopConfiguration
    )
    val out = fs.create(new org.apache.hadoop.fs.Path(s"${p}__delete_swap"), true)
    out.write(staging.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    // the next format read heals: staging renamed into place, marker cleared
    assert(spark.read.format("timebox").load(p).count() === survivors, "recovery lost rows")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${p}__delete_swap")), "marker must clear after recovery")
    assert(!fs.exists(staging), "staging must be consumed by recovery")
    // crash AFTER the rename (only the marker-clear lost): heal is a marker delete
    fs.create(new org.apache.hadoop.fs.Path(s"${p}__delete_swap"), true).close()
    assert(spark.read.format("timebox").load(p).count() === survivors)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${p}__delete_swap")))
  }

  test("SQL DELETE on a sink-landed store: commit markers survive, uncommitted partial landings purge") {
    import graft.sources.TimeboxStreamSink
    val root = java.nio.file.Files.createTempDirectory("graft_sqldel_sidecar").toString
    val p = s"$root/store"
    val pts = TimeboxStore
      .eventTypePoints(spark, sf)
      .filter(col("user_id") < 5)
      .select(col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"),
        col("value_c"), col("etype_c"))
      .localCheckpoint()
    val ns = "cccc2222"
    val sink = new TimeboxStreamSink(spark, p, ns)
    sink.addBatch(0L, pts)
    // batch 1 CRASHED mid-landing: block files on disk, no marker
    sink.addBatch(1L, pts.filter(col("series_id") === 0L))
    assert(new java.io.File(s"$p/_stream_commits/$ns-1").delete())
    val committedOnly = pts.filter(col("etype_c") =!= 112L).count()
    spark.sql("DROP TABLE IF EXISTS tb_sqldel_sidecar")
    spark.sql(s"CREATE TABLE tb_sqldel_sidecar USING timebox LOCATION '$p'")
    spark.sql("DELETE FROM tb_sqldel_sidecar WHERE etype_c = 112")
    // the uncommitted landing is gone (purged, not folded into the rewrite)
    assert(
      spark.read.format("timebox").load(p).count() === committedOnly,
      "uncommitted partial landing leaked into the rewritten store"
    )
    // the committed batch's marker survived the swap: a replay is a no-op
    assert(new java.io.File(s"$p/_stream_commits/$ns-0").exists(), "commit marker lost in DELETE swap")
    sink.addBatch(0L, pts)
    assert(
      spark.read.format("timebox").load(p).count() === committedOnly,
      "replay after DELETE re-landed an already-committed batch"
    )
    // the crashed batch REPLAYS cleanly into the purged store
    sink.addBatch(1L, pts.filter(col("series_id") === 0L))
    assert(
      spark.read.format("timebox").load(p).count() ===
        committedOnly + pts.filter(col("series_id") === 0L).count(),
      "crashed batch could not re-land after the purge"
    )
  }

  test("SQL DELETE on a catalog root: version commit, time travel intact, skip-proven no-op") {
    import graft.sources.SnapshotCatalog
    val root = java.nio.file.Files.createTempDirectory("graft_catdel_spec").toString + "/root"
    val pts = graft.sources.TimeboxStore.eventTypePoints(spark, sf).filter(col("user_id") < 20)
    SnapshotCatalog.commit(
      spark, root,
      p => graft.sources.TimeboxStore
        .encode(pts, tagCols = Seq("value_c", "etype_c")).write.parquet(p)
    )
    val v1Files = SnapshotCatalog.manifests(root).flatMap(m => new java.io.File(m.path)
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getPath)).toSet
    spark.sql("DROP TABLE IF EXISTS tb_catdel_spec")
    spark.sql(s"CREATE TABLE tb_catdel_spec USING timebox LOCATION '$root'")
    spark.sql("DELETE FROM tb_catdel_spec WHERE etype_c = 112")
    spark.sql("REFRESH TABLE tb_catdel_spec")
    // the DELETE is a catalog version, not a rewrite-in-place
    assert(SnapshotCatalog.currentVersion(root) === 2L, "catalog DELETE must land as a version commit")
    val m2 = SnapshotCatalog.manifests(root).last
    assert(m2.removed.nonEmpty, "the delete version must name the superseded files")
    assert(m2.removed.forall(v1Files.contains), "removed entries must be v1 data files")
    // head state = the purge; the survivors match the raw filter
    val head = spark.read.format("timebox").load(root)
    val expect = pts.filter(col("etype_c") =!= 112L)
    assert(head.count() === expect.count())
    assert(
      head.select("series_id", "ts_us", "seq", "value_c", "etype_c")
        .except(expect.select(
          col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"),
          col("value_c"), col("etype_c"))).count() === 0,
      "catalog DELETE survivors diverge from the raw filter"
    )
    // TIME TRAVEL: version 1 still reads the PRE-delete state — the
    // removed files were superseded, never destroyed
    assert(m2.removed.forall(f => new java.io.File(f).exists()), "superseded files must survive on disk")
    assert(
      spark.read.format("timebox").option("asOf", 1).load(root).count() === pts.count(),
      "asOf=1 must read the pre-delete state"
    )
    // a skip-proven DELETE (value outside every zone map) commits NOTHING
    spark.sql("DELETE FROM tb_catdel_spec WHERE etype_c = 99999999")
    assert(SnapshotCatalog.currentVersion(root) === 2L, "a skip-proven no-op DELETE must not commit a version")
    // the SQL read door serves the new head through the catalog table
    spark.sql("REFRESH TABLE tb_catdel_spec")
    assert(spark.sql("SELECT COUNT(*) AS n FROM tb_catdel_spec").head().getLong(0) === expect.count())
  }

  test("SQL MERGE door: upsert semantics on raw and catalog roots; non-upsert shapes decline, store untouched") {
    import graft.sources.SnapshotCatalog
    val pts = TimeboxStore
      .eventTypePoints(spark, sf)
      .filter(col("user_id") < 5)
      .select(col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"),
        col("value_c"), col("etype_c"))
      .localCheckpoint()
    // corrections for half the identities + brand-new identities
    val srcUpd = pts.filter(col("seq") % 2 === 0).withColumn("value_c", col("value_c") + 7L)
    val srcNew = pts.filter(col("seq") % 2 === 1)
      .withColumn("seq", col("seq") + 900000000L).withColumn("value_c", lit(5L))
    srcUpd.unionByName(srcNew).createOrReplaceTempView("merge_spec_src")
    val expect = pts.filter(col("seq") % 2 === 1).unionByName(srcUpd).unionByName(srcNew)
    val mergeSql = (t: String) =>
      s"""MERGE INTO $t t USING merge_spec_src s
         |ON t.series_id = s.series_id AND t.seq = s.seq
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    // raw root: staged-swap rewrite
    val p = java.nio.file.Files.createTempDirectory("graft_sqlmerge_spec").toString + "/store"
    TimeboxStore.encode(pts, "series_id", "ts_us", "seq", Seq("value_c", "etype_c")).write.parquet(p)
    spark.sql("DROP TABLE IF EXISTS tb_merge_spec")
    spark.sql(s"CREATE TABLE tb_merge_spec USING timebox LOCATION '$p'")
    spark.sql(mergeSql("tb_merge_spec"))
    spark.sql("REFRESH TABLE tb_merge_spec")
    val got = spark.read.format("timebox").load(p)
    assert(got.count() === expect.count())
    assert(got.except(expect).count() === 0 && expect.except(got).count() === 0,
      "SQL MERGE survivors diverge from the upsert model")
    // catalog root: version commit, v1 time-travels to the pre-merge state
    val root = java.nio.file.Files.createTempDirectory("graft_sqlmerge_cat").toString + "/root"
    SnapshotCatalog.commit(spark, root,
      q => TimeboxStore.encode(pts, "series_id", "ts_us", "seq", Seq("value_c", "etype_c")).write.parquet(q))
    spark.sql("DROP TABLE IF EXISTS tb_merge_cat")
    spark.sql(s"CREATE TABLE tb_merge_cat USING timebox LOCATION '$root'")
    spark.sql(mergeSql("tb_merge_cat"))
    assert(SnapshotCatalog.currentVersion(root) === 2L, "catalog MERGE must land as a version commit")
    val gotC = spark.read.format("timebox").load(root)
    assert(gotC.count() === expect.count())
    assert(gotC.except(expect).count() === 0 && expect.except(gotC).count() === 0)
    assert(
      spark.read.format("timebox").option("asOf", 1).load(root).count() === pts.count(),
      "asOf=1 must read the pre-merge state"
    )
    // non-upsert shapes decline LOUDLY at analysis, store untouched
    val before = spark.read.format("timebox").load(p).count()
    for (bad <- Seq(
        // ON must be the full point identity
        s"""MERGE INTO tb_merge_spec t USING merge_spec_src s ON t.series_id = s.series_id
           |WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""".stripMargin,
        // DELETE / conditional clauses are not the upsert shape
        s"""MERGE INTO tb_merge_spec t USING merge_spec_src s
           |ON t.series_id = s.series_id AND t.seq = s.seq
           |WHEN MATCHED THEN DELETE""".stripMargin,
        s"""MERGE INTO tb_merge_spec t USING merge_spec_src s
           |ON t.series_id = s.series_id AND t.seq = s.seq
           |WHEN MATCHED AND s.value_c > 0 THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin
      )) {
      val e = intercept[Throwable](spark.sql(bad))
      assert(String.valueOf(e.getMessage).contains("timebox MERGE"), s"unexpected error: ${e.getMessage}")
    }
    assert(spark.read.format("timebox").load(p).count() === before, "declined MERGE must not change the store")
  }

  test("catalog streaming sink: one version per batch, replay commits once, stream-write then stream-read round-trips") {
    import graft.sources.{SnapshotCatalog, TimeboxCatalogStreamSink}
    val root = java.nio.file.Files.createTempDirectory("graft_catsink_spec").toString + "/root"
    val pts = TimeboxStore
      .eventTypePoints(spark, sf)
      .filter(col("user_id") < 5)
      .select(col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"), col("value_c"))
      .localCheckpoint()
    val b0 = pts.filter(col("seq") % 2 === 0)
    val b1 = pts.filter(col("seq") % 2 === 1)
    val sink = new TimeboxCatalogStreamSink(spark, root, "dddd3333")
    sink.addBatch(0L, b0)
    sink.addBatch(1L, b1)
    assert(SnapshotCatalog.currentVersion(root) === 2L, "each micro-batch must land as one version")
    // a replayed batchId commits EXACTLY once — recognized from the
    // manifest's deterministic snapshot name, no side markers
    sink.addBatch(1L, b1)
    assert(SnapshotCatalog.currentVersion(root) === 2L, "replayed batch committed a duplicate version")
    // the drained store equals the one-shot batch write (shared oracle)
    val got = spark.read.format("timebox").load(root)
    assert(got.count() === pts.count())
    assert(got.except(pts).count() === 0 && pts.except(got).count() === 0,
      "stream-committed store diverges from its input")
    // and it is STREAM-READABLE: the catalog streaming source tails the
    // commit log the sink wrote — the store-to-store streaming loop
    val q = spark.readStream
      .format("timebox")
      .load(root)
      .writeStream
      .format("memory")
      .queryName("catsink_tail")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tail = spark.table("catsink_tail")
    assert(tail.count() === pts.count(), "stream-read tail lost or duplicated rows")
    assert(
      tail.select("commit_version").distinct().collect().map(_.getLong(0)).toSet === Set(1L, 2L),
      "every committed version must arrive with its provenance"
    )
    // time travel composes: version 1 is exactly batch 0
    assert(
      spark.read.format("timebox").option("asOf", 1).load(root).count() === b0.count(),
      "asOf=1 must read batch 0 alone"
    )
  }

  test("SQL INSERT on a catalog root: append = delta version, overwrite supersedes, history time-travels") {
    import graft.sources.SnapshotCatalog
    val root = java.nio.file.Files.createTempDirectory("graft_catins_spec").toString + "/root"
    val pts = TimeboxStore
      .eventTypePoints(spark, sf)
      .filter(col("user_id") < 5)
      .select(col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"), col("value_c"))
      .localCheckpoint()
    val first = pts.filter(col("seq") % 2 === 0)
    val second = pts.filter(col("seq") % 2 === 1)
    SnapshotCatalog.commit(spark, root,
      q => TimeboxStore.encode(first, "series_id", "ts_us", "seq", Seq("value_c")).write.parquet(q))
    second.createOrReplaceTempView("catins_second")
    spark.sql("DROP TABLE IF EXISTS tb_catins_spec")
    spark.sql(s"CREATE TABLE tb_catins_spec USING timebox LOCATION '$root'")
    spark.sql("INSERT INTO tb_catins_spec SELECT series_id, ts_us, seq, value_c FROM catins_second")
    spark.sql("REFRESH TABLE tb_catins_spec")
    assert(SnapshotCatalog.currentVersion(root) === 2L, "INSERT INTO must land as one delta version")
    val head = spark.read.format("timebox").load(root)
    assert(head.count() === pts.count())
    assert(head.except(pts).count() === 0 && pts.except(head).count() === 0)
    assert(
      spark.read.format("timebox").option("asOf", 1).load(root).count() === first.count(),
      "asOf=1 must read the pre-insert state"
    )
    // INSERT OVERWRITE: a version superseding every live file — the
    // head is the new rows alone, and version 2 still composes fully
    val tiny = pts.filter(col("series_id") === 0L)
    tiny.createOrReplaceTempView("catins_tiny")
    spark.sql("INSERT OVERWRITE tb_catins_spec SELECT series_id, ts_us, seq, value_c FROM catins_tiny")
    spark.sql("REFRESH TABLE tb_catins_spec")
    assert(SnapshotCatalog.currentVersion(root) === 3L)
    assert(spark.read.format("timebox").load(root).count() === tiny.count(), "overwrite head must be the new rows alone")
    assert(
      spark.read.format("timebox").option("asOf", 2).load(root).count() === pts.count(),
      "the pre-overwrite state must still time-travel"
    )
  }

  test("catalog DML is O(delta): DELETE and MERGE rewrite only skip-admitted files, untouched versions' files never move") {
    import graft.sources.SnapshotCatalog
    val root = java.nio.file.Files.createTempDirectory("graft_catdelta_spec").toString + "/root"
    val pts = TimeboxStore
      .eventTypePoints(spark, sf)
      .filter(col("user_id") < 5)
      .select(col("user_id").as("series_id"), col("ts_us"), col("event_id").as("seq"),
        col("value_c"), col("etype_c"))
      .localCheckpoint()
    // v1 = series 0-2 (etype codes are ascii letters, all < 150);
    // v2 = series 3-4 with a tag value (200) NO v1 block can hold —
    // zone maps prove v1's files clean, so the delta is exactly v2
    val v1Pts = pts.filter(col("series_id") < 3)
    val v2Pts = pts.filter(col("series_id") >= 3).withColumn("etype_c", lit(200L))
    def commitOf(d: org.apache.spark.sql.DataFrame) = SnapshotCatalog.commit(spark, root,
      q => TimeboxStore.encode(d, "series_id", "ts_us", "seq", Seq("value_c", "etype_c")).write.parquet(q))
    commitOf(v1Pts); commitOf(v2Pts)
    def filesOf(version: Long) = SnapshotCatalog.manifests(root).filter(_.version === version)
      .flatMap(m => new java.io.File(m.path).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getPath)).toSet
    val (v1Files, v2Files) = (filesOf(1L), filesOf(2L))
    spark.sql("DROP TABLE IF EXISTS tb_catdelta_spec")
    spark.sql(s"CREATE TABLE tb_catdelta_spec USING timebox LOCATION '$root'")
    // DELETE of the v2-only value: the rewrite set must be ⊆ v2's files
    spark.sql("DELETE FROM tb_catdelta_spec WHERE etype_c = 200")
    val delRemoved = SnapshotCatalog.manifests(root).last.removed.toSet
    assert(delRemoved.nonEmpty && delRemoved.subsetOf(v2Files),
      s"DELETE rewrote beyond its delta: ${delRemoved -- v2Files}")
    assert((delRemoved & v1Files).isEmpty && v1Files.forall(f => new java.io.File(f).exists()),
      "untouched version's files must neither be removed nor moved")
    assert(spark.read.format("timebox").load(root).count() === v1Pts.count(),
      "head after the v2-only purge must be exactly v1")
    // MERGE touching only series 0: candidates are v1 files alone
    v1Pts.filter(col("series_id") === 0L).withColumn("value_c", col("value_c") + 9L)
      .createOrReplaceTempView("catdelta_src")
    spark.sql(
      """MERGE INTO tb_catdelta_spec t USING catdelta_src s
        |ON t.series_id = s.series_id AND t.seq = s.seq
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val mergeRemoved = SnapshotCatalog.manifests(root).last.removed.toSet
    assert(mergeRemoved.nonEmpty && mergeRemoved.subsetOf(v1Files),
      s"MERGE rewrote beyond its touched blocks: ${mergeRemoved -- v1Files}")
    val got = spark.read.format("timebox").load(root)
    val expect = v1Pts.filter(col("series_id") =!= 0L)
      .unionByName(v1Pts.filter(col("series_id") === 0L).withColumn("value_c", col("value_c") + 9L))
    assert(got.count() === expect.count())
    assert(got.except(expect).count() === 0 && expect.except(got).count() === 0)
  }

  test("write facade: non-point schemas are rejected loudly") {
    val p = java.nio.file.Files.createTempDirectory("graft_format_bad").toString + "/store"
    val bad = spark.range(3).select(col("id").as("series_id"), col("id").as("ts_us"))
    val e = intercept[Throwable] {
      bad.write.format("timebox").mode("overwrite").save(p)
    }
    val chain = Iterator
      .iterate(e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("timebox write"), s"unexpected error chain: $chain")
  }
}

/** Poison switch for the crash-injection drill — top-level so the UDF
  * closure resolves it in-process on local-mode executors.
  */
object FormatSpecCrash { @volatile var armed: Boolean = false }
