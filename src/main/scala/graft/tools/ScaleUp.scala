package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derive a 10×-scale dataset from a driver-generated SF dir — the
  * sf1.0 step the ScaleSpec panel climbs when no sf1.0 testdata
  * exists. Each fact table is unioned as `copies` key-shifted replicas
  * (every int64 key column shifted by copy·10⁸, so FK joins stay
  * consistent within a copy and never collide across copies); the tiny
  * dims (region, nation) are shared, exactly like a real 10× corpus
  * over the same reference data. Shapes that would degenerate under
  * verbatim replication get a deterministic per-copy transform:
  *
  *   - `documents.text` (copy > 0): tokens re-ordered by
  *     md5(token:copy:doc_id) — token/char distributions survive, but
  *     3-gram shingles are copy-specific, so the near-dup structure
  *     stays the ORIGINAL corpus' (a 10×-clone corpus would instead
  *     hand the rep-collapse a free pass and the member expansion a
  *     quadratic bill — not a scale test);
  *   - `embeddings.embedding` (copy > 0): rotated by `copy` dims —
  *     norm-preserving, direction-distinct.
  *
  * Events replicate as new user_id series over the same time window —
  * the scale-OUT direction a TSDB grows in.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [copies]
  */
object ScaleUp {
  private val Offset = 100000000L

  /** Generate (once) and return the derived dir; reused via marker. */
  def ensure(spark: SparkSession, srcDir: String, copies: Int = 10): String = {
    val key = srcDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = s"${sys.props("java.io.tmpdir")}/graft_scaleup_${key}_x$copies"
    val done = new java.io.File(s"$root/_done")
    if (done.exists) return root

    def src(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def out(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$root/$t.parquet")
    val cp = spark.range(copies).toDF("cp")
    def shift(c: String) = (col(c) + col("cp") * Offset).as(c)

    out(src("region"), "region")
    out(src("nation"), "nation")
    out(
      src("customer").crossJoin(cp)
        .select(shift("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer"
    )
    out(
      src("supplier").crossJoin(cp)
        .select(shift("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal")),
      "supplier"
    )
    out(
      src("part").crossJoin(cp)
        .select(shift("p_partkey"), col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part"
    )
    out(
      src("orders").crossJoin(cp)
        .select(shift("o_orderkey"), shift("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")),
      "orders"
    )
    out(
      src("lineitem").crossJoin(cp)
        .select(shift("l_orderkey"), shift("l_partkey"), shift("l_suppkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem"
    )
    out(
      src("events").crossJoin(cp)
        .select(shift("event_id"), col("ts"), shift("user_id"), col("event_type"), col("value"), col("props")),
      "events"
    )
    out(
      src("documents").crossJoin(cp)
        .select(
          shift("doc_id"),
          when(col("cp") === 0, col("text")).otherwise(
            expr(
              """array_join(transform(array_sort(transform(split(text, ' '),
                |  t -> struct(md5(concat(t, ':', CAST(cp AS STRING), ':', CAST(doc_id AS STRING))) AS h,
                |              t AS t))), p -> p.t), ' ')""".stripMargin
            )
          ).as("text"),
          col("lang"),
          col("source"),
          col("n_chars")
        ),
      "documents"
    )
    out(
      src("embeddings").crossJoin(cp)
        .select(
          shift("vec_id"),
          when(col("cp") === 0, col("embedding")).otherwise(
            expr(
              "concat(slice(embedding, CAST(cp AS INT) + 1, size(embedding) - CAST(cp AS INT)), " +
                "slice(embedding, 1, CAST(cp AS INT)))"
            )
          ).as("embedding"),
          col("label")
        ),
      "embeddings"
    )
    java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
    root
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.get()
    val t0 = System.nanoTime()
    val root = ensure(spark, srcDir, copies)
    println(f"[scaleup] $root ready in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    for (t <- Seq("lineitem", "events", "documents", "embeddings"))
      println(s"[scaleup] $t rows: " + spark.read.parquet(s"$root/$t.parquet").count())
    spark.stop()
  }
}
