package graft.tools

/** Local iteration aid: print the formatted physical plan of one (or
  * more) SparkEntry queries at a given SF dir — the `.explain` loop the
  * build guide prescribes, runnable as `runMain graft.tools.ExplainOne
  * <sfDir> <query>...`.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
