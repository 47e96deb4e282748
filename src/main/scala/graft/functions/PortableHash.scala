package graft.functions

import java.security.MessageDigest

/** Cross-engine hashing discipline: every hash the engine exposes is
  * md5-hex over an explicit string, never an engine-native hash —
  * Spark's md5() and any SQL oracle's md5() agree byte-for-byte, so
  * hash-derived structures (minhash signatures, LSH planes, band
  * signatures) are reproducible outside Spark.
  */
object PortableHash {

  /** driver-side md5 hex (lowercase), identical to Spark/DuckDB md5(). */
  def md5Hex(s: String): String =
    MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  /** Random-hyperplane weights for LSH, derived from md5 so any engine
    * can regenerate them: component i of plane p weighs
    * 2*nibble(md5("plane:p:i")) - 15 — an odd integer in [-15, 15],
    * never zero, so hyperplane sides are unambiguous for integer dots.
    */
  def planeWeights(nPlanes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until nPlanes).map { p =>
      (1 to dim).map { i =>
        2L * Integer.parseInt(md5Hex(s"plane:$p:$i").substring(0, 1), 16) - 15L
      }
    }
}
