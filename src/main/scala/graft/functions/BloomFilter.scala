package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable Bloom-filter probe family, the PortableHash discipline
  * applied to membership sketches: every probe position is integer
  * arithmetic over an md5-derived base hash, so a SQL oracle (or any
  * other engine) regenerates the identical bit set.
  *
  *   hm     = top-60-bits(md5(key)) mod p,        p = 2³¹−1
  *   pos_j  = ((A_j·hm + B_j) mod p) mod m,       j < k
  *
  * Every intermediate stays below 2⁶² (A_j, hm < 2³¹), so ANSI bigint
  * arithmetic is exact in both engines. The bit set is at most `m`
  * distinct positions — with the default m = 2²⁰ that is a 128 KiB
  * bitmap in a production executor (broadcast once, probed row-local);
  * expressed relationally here as a ≤m-row position table behind a
  * broadcast join, which Catalyst plans identically at any corpus
  * size because the bound is structural, not statistical.
  *
  * The A/B multipliers are fixed arbitrary constants of the same
  * universal family as the MinHash slots (Dedup.MhA/MhB) but drawn
  * independently, so Bloom collisions and MinHash collisions are
  * uncorrelated.
  */
object BloomFilter {

  val P: Long = 2147483647L // Mersenne prime 2³¹−1

  val DefaultBits: Int   = 1 << 20
  val DefaultProbes: Int = 7

  private[graft] val A: Seq[Long] = Seq(1203292013L, 734572811L, 158709113L, 902718361L,
    1294679543L, 477361247L, 1768059871L)
  private[graft] val B: Seq[Long] = Seq(98763527L, 1446785053L, 689234191L, 1912673219L,
    254610989L, 1082547763L, 1537206419L)

  /** 31-bit base hash of a string key: md5 top 60 bits mod p. */
  def baseHash(key: Column): Column =
    conv(substring(md5(key), 1, 15), 16, 10).cast("long") % P

  /** The k probe positions as an array column over a MATERIALIZED base
    * hash column (materialize hm with withColumn first — passing
    * baseHash(...) directly would re-derive the md5 per probe).
    */
  def positions(hm: Column, m: Int = DefaultBits, k: Int = DefaultProbes): Column = {
    require(k <= A.length, s"at most ${A.length} probes available")
    array((0 until k).map(j => (lit(A(j)) * hm + lit(B(j))) % P % m): _*)
  }

  /** DuckDB replay of the same probe family: a (j, a, b) VALUES table
    * to cross-join against key rows, and the position expression over
    * its columns — kept here so the Spark constants and the oracle
    * constants cannot drift apart.
    */
  def duckAbValues(k: Int = DefaultProbes): String =
    (0 until k).map(j => s"(${A(j)}, ${B(j)})").mkString(", ")

  def duckBaseHashSql(keySql: String): String =
    s"CAST('0x' || substr(md5($keySql), 1, 15) AS BIGINT) % $P"

  def duckPosSql(hmSql: String, m: Int = DefaultBits): String =
    s"((ab.a * $hmSql + ab.b) % $P) % $m"
}
