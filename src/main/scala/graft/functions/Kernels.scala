package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels behind the custom Catalyst expressions.
  *
  * Top-level object ⇒ the Scala compiler emits static forwarders, so
  * generated whole-stage code can call `graft.functions.Kernels.cosineF(a,b)`
  * directly (one static call per row — stays inside the fused pipeline, no
  * boxing, no UDF serialization; see the expressions in
  * `VectorExpressions.scala`).
  *
  * All hashing is deterministic, seed-derived, and public-domain math
  * (FNV-1a, splitmix64) — no RNG state, so results are identical across
  * partitions, executors, and re-runs (required for AQE/speculative tasks).
  */
object Kernels {

  // ---------------------------------------------------------------- vectors

  /** Cosine similarity over float vectors, accumulated in double. */
  /** NULL elements are DEFINED as 0.0 on every backing. UnsafeArrayData
    * ZEROES null slots at write time (UnsafeArrayWriter.setNull), so the
    * hot codegen'd row path keeps its check-free loop; other backings
    * (ColumnarArray over a REUSED vector — whose null slots hold stale
    * bytes — GenericArrayData) pay one isNullAt per element to get the
    * identical, deterministic result. */
  def cosineF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    if (x.isInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData] &&
        y.isInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData]) {
      while (i < n) {
        val a = x.getFloat(i).toDouble; val b = y.getFloat(i).toDouble
        dot += a * b; nx += a * a; ny += b * b; i += 1
      }
    } else {
      while (i < n) {
        val a = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
        val b = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
        dot += a * b; nx += a * a; ny += b * b; i += 1
      }
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Cosine similarity over double vectors. */
  def cosineD(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val a = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val b = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += a * b; nx += a * a; ny += b * b; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Dot product over float vectors — same null-element policy as
    * [[cosineF]] (null contributes 0; UnsafeArrayData fast path skips
    * the per-element check, its float slots are never null-marked). */
  def dotF(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    if (x.isInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData] &&
        y.isInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData]) {
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) {
        val a = if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
        val b = if (y.isNullAt(i)) 0.0 else y.getFloat(i).toDouble
        dot += a * b; i += 1
      }
    }
    dot
  }

  // ---------------------------------------------------------------- hashing

  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  /** FNV-1a 64 over UTF-8 bytes. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** splitmix64 — statistically strong 64→64 mixer (public domain). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hashes of `shingleSize`-word shingles of a tokenized document. */
  def shingleHashes(words: ArrayData, shingleSize: Int): Array[Long] = {
    val n = words.numElements()
    if (n < shingleSize) return Array.empty
    val wordHash = new Array[Long](n)
    var i = 0
    while (i < n) { wordHash(i) = fnv1a64(words.getUTF8String(i)); i += 1 }
    val out = new Array[Long](n - shingleSize + 1)
    i = 0
    while (i <= n - shingleSize) {
      var h = FnvOffset
      var j = 0
      while (j < shingleSize) { h = mix64(h ^ wordHash(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** MinHash signature: k permutation-minima over the shingle set.
    * Permutation i is `mix64(h ^ mix64(seed+i))` — one multiply-free pass
    * per (shingle, perm); O(shingles × k) per document, no allocation
    * beyond the signature. */
  def minHash(words: ArrayData, k: Int, shingleSize: Int, seed: Long): ArrayData = {
    val hs = shingleHashes(words, shingleSize)
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val perm = mix64(seed + i)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = mix64(hs(j) ^ perm)
        if (v < m) m = v
        j += 1
      }
      sig(i) = m
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** 64-bit SimHash over word hashes (unit weights). */
  def simHash64(words: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val h = fnv1a64(words.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Random-hyperplane LSH bucket for a float vector: `planes` sign bits,
    * plane components drawn deterministically from splitmix64 in [-1, 1). */
  def lshBucketF(vec: ArrayData, planes: Int, seed: Long): Int = {
    val n = vec.numElements()
    var bucket = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val r = mix64(seed + p * 1000003L + i)
        // top 53 bits → uniform double in [0,1) → [-1,1)
        val u = (r >>> 11) * 1.1102230246251565e-16 // 2^-53
        dot += vec.getFloat(i).toDouble * (2.0 * u - 1.0)
        i += 1
      }
      if (dot > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Fraction of equal positions between two equal-length signatures —
    * the MinHash estimate of Jaccard similarity. */
  def sigAgreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var same = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) same += 1; i += 1 }
    same.toDouble / n
  }

  /** Count of `sorted` entries ≤ `v` (the equi-depth bucket index of `v`
    * given sorted boundaries) via binary search — O(log n) primitive
    * comparisons per row vs the O(n) interpreted `aggregate` fold it
    * replaced in ZOrder.bucket. Matches Spark's nan-safe double ordering
    * for the values that can reach it: NaN compares greater than every
    * double (so a NaN value lands past every boundary and a NaN boundary
    * is counted by nothing finite), matching the old
    * `when(v >= b, 1).otherwise(0)` fold bound-for-bound. */
  def upperBound(sorted: Array[Double], v: Double): Int = {
    if (java.lang.Double.isNaN(v)) return sorted.length
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
