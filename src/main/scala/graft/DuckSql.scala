package graft

/** Builders for DuckDB oracle SQL that replays the engine's seeded
  * hashing (Kernels.scala) EXACTLY in HUGEINT arithmetic — shared by the
  * q63/q64/q134 dedup oracles and the q67/q156 LSH-ANN oracles.
  *
  * The one trap: splitmix64's multiplier constants are ~2^63, so a direct
  * HUGEINT product of two 64-bit values overflows int128. [[mulMod64]]
  * splits the left operand at 32 bits ((a_lo·c + ((a_hi·c) mod 2^32)·2^32)
  * mod 2^64 — every intermediate stays under 2^97). Each mixer step gets
  * its own chained CTE stage so nothing is recomputed exponentially.
  *
  * Float/double replays (the LSH hyperplane components, dot-product
  * signs) are exact because every step is IEEE-754 identical on both
  * engines: `(r >>> 11) · 2^-53` and `2u − 1` are exact (operands are
  * multiples of 2^-52 below magnitude 2), float→double widening is
  * exact, and multiplies/adds round identically when performed in the
  * same order — which `list_reduce` over an index range guarantees.
  */
object DuckSql {

  val M = "CAST('18446744073709551616' AS HUGEINT)"

  /** (a · c) mod 2^64 without int128 overflow; `a` in [0, 2^64). */
  def mulMod64(a: String, c: String): String =
    s"((($a) % 4294967296) * $c + (((($a) // 4294967296) * $c) % 4294967296)" +
      s" * 4294967296) % $M"

  /** splitmix64 (Kernels.mix64) as chained CTE stages: reads column `in`
    * of CTE `src`, emits CTE `tag_out` with column `out`, carrying the
    * `keep` columns through. */
  def mix64(tag: String, src: String, keep: String,
      in: String, out: String): String = s"""
    ${tag}_a AS (SELECT $keep, (($in) + 11400714819323198485) % $M AS za FROM $src),
    ${tag}_b AS (SELECT $keep, ${mulMod64("xor(za, za >> 30)", "13787848793156543929")} AS zb FROM ${tag}_a),
    ${tag}_out AS (SELECT $keep, xor(zc, zc >> 31) AS $out FROM (
      SELECT $keep, ${mulMod64("xor(zb, zb >> 27)", "10723151780598845931")} AS zc FROM ${tag}_b) q)"""
}
