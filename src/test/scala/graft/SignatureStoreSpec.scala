package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SignatureStore

class SignatureStoreSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("text"))

  private lazy val (incPath, fullPath) = {
    val root = java.nio.file.Files.createTempDirectory("graft_sigstore_spec").toString
    val inc = s"$root/inc"
    val full = s"$root/full"
    // incremental: batch A then batch B appended; rebuild: A∪B at once
    SignatureStore.write(spark, docs.filter(col("doc_id") < 300), inc)
    SignatureStore.append(spark, docs.filter(col("doc_id") >= 300 && col("doc_id") < 400), inc)
    SignatureStore.write(spark, docs.filter(col("doc_id") < 400), full)
    (inc, full)
  }

  test("append equals rebuild: groups/reps/bands are set-identical for id-ordered batches") {
    for (t <- Seq("groups", "reps", "bands")) {
      val x = spark.read.parquet(s"$incPath/$t")
      val y = spark.read.parquet(s"$fullPath/$t")
      assert(x.count() === y.count(), s"$t row count diverged")
      assert(x.except(y).count() === 0, s"$t has rows the rebuild lacks")
      assert(y.except(x).count() === 0, s"$t is missing rebuilt rows")
    }
  }

  test("contamination matrix over three bucketed stores: symmetric pair counts, no corpus shuffle") {
    val d = docs
    SignatureStore.writeBucketedBands(spark, d.filter(col("doc_id") < 170), "cmx_a")
    SignatureStore.writeBucketedBands(spark, d.filter(col("doc_id") >= 170 && col("doc_id") < 340), "cmx_b")
    SignatureStore.writeBucketedBands(spark, d.filter(col("doc_id") >= 340), "cmx_c")
    try {
      val m = SignatureStore.contaminationMatrix(spark, Seq("cmx_a", "cmx_b", "cmx_c")).collect()
      assert(m.length === 3, "expected C(3,2) = 3 store pairs")
      // every count equals the direct pairwise match count
      m.foreach { r =>
        val expect = SignatureStore.crossStoreMatches(spark, r.getString(0), r.getString(1)).count()
        assert(r.getAs[Long]("n_pairs") === expect)
      }
    } finally Seq("cmx_a", "cmx_b", "cmx_c").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("matchDelta over the appended store equals the from-scratch match") {
    val delta = docs.filter(col("doc_id") >= 400)
    val a = SignatureStore.matchDelta(spark, incPath, delta)
    val b = SignatureStore.matchDelta(spark, fullPath, delta)
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
    // matches against batch-B docs (appended, not rewritten) must appear
    assert(a.filter(col("match_doc_id") >= 300 && col("match_doc_id") < 400).count() > 0)
  }
}
