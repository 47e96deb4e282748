package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join splitting handles moderate runtime skew; explicit
  * salting is for the pathological keys known in advance (the null
  * user, the "unknown" device, the one series carrying 10% of a
  * 100 TB stream). Salting trades nSalts× replication of the small
  * side for spreading one hot key across nSalts reducers.
  */
object SkewJoin {

  /** Salted inner equi-join. The fact (skewed) side gets a
    * deterministic salt in [0, nSalts) hashed from `saltBy` columns;
    * the dim side is replicated nSalts×. The shuffle key becomes
    * (key, salt), so a hot key's rows spread over nSalts tasks while
    * join semantics are unchanged (every fact row still meets every
    * matching dim row exactly once).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBy: Seq[Column],
      nSalts: Int = 16
  ): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val salted = fact.withColumn("__graft_salt", pmod(hash(saltBy: _*), lit(nSalts)))
    val replicated = dim.withColumn("__graft_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
