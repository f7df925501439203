package graft.sources

import org.apache.spark.sql.types._

/** EQUI-HEIGHT HISTOGRAMS riding commits (round 15 — the selectivity
  * half of the live-CBO story; `#ndv` sketches + min/max bounds feed
  * join reorder, but a RANGE predicate's selectivity still used
  * Catalyst's uniformity heuristic, which misreads every skewed
  * distribution). Declared `TBLPROPERTIES('stats.histogram.columns'=
  * 'x,y')` columns track a deterministic positional sample per file as
  * rows stream through the writer (`#hist` rider lines, zero extra
  * passes — the ANALYZE-free analogue of Spark's
  * `spark.sql.statistics.histogram.enabled`), and every scan merges the
  * KEPT files' samples, weighted by their non-null row counts, into the
  * DSv2 `ColumnStatistics.histogram()` seam Catalyst converts to its
  * own equi-height `Histogram` — `FilterEstimation` then prices range
  * predicates from the actual mass distribution. At 100 TB the
  * difference is a join order computed from "1% of rows pass x > 10"
  * instead of "uniformly 99%".
  *
  * SAMPLE DISCIPLINE (deterministic, no RNG — the repo-wide rule):
  * threshold sampling on a POSITION HASH. Each non-null value keeps iff
  * splitmix64(rowOrdinal) < threshold; when the buffer overflows the
  * threshold halves and the buffer re-filters — expected half survives,
  * so the buffer oscillates within capacity while remaining an exact
  * uniform sample of positions at the final threshold. Position-hash
  * (not stride) sampling is immune to the periodic-value pathology a
  * power-of-two stride aliases on (e.g. `id % 10` sampled at stride 64
  * sees only even values). Identical input files yield identical
  * samples, so plans are reproducible. */
object ManifestHist {

  /** Merged bins served to the optimizer. */
  val Buckets = 64
  /** Per-file per-column in-memory sample capacity (doubles). */
  val SampleCap = 1024
  /** Per-file per-column EMITTED order statistics: the sorted sample
    * downsamples to evenly-spaced ranks before landing in the `#hist`
    * line, bounding metadata at ~1 KB per file per declared column — a
    * 10⁶-file corpus pays ~1 GB of segment bytes per histogram column,
    * not the raw sample's ~8 GB. Rank-downsampling a sorted sample is
    * itself a quantile sketch, so merge quality is unchanged at the
    * optimizer's 64-bin resolution. */
  val EmitCap = 128

  /** Histogram-capable = losslessly-enough double-convertible and
    * range-comparable (catalyst HistogramBin bounds are doubles).
    *
    * STRINGS are deliberately excluded (round 16, after the r15 review
    * suggested a Z-order-style 8-byte prefix proxy): catalyst's
    * FilterEstimation prices range predicates from histograms only for
    * numeric/date/timestamp/boolean attributes — a string comparison
    * routes to default selectivity before the histogram is ever
    * consulted (EstimationUtils.toDouble has no string domain), so an
    * emitted string histogram would be metadata nobody reads. String
    * EQUALITY selectivity already prices from the `#ndv` distinct
    * counts, which strings do carry. */
  def capable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** INTERNAL value → the double domain estimation happens in (the same
    * mapping catalyst's EstimationUtils.toDouble applies to ColumnStat
    * bounds: dates as epoch days, timestamps as micros). */
  def toDouble(dt: DataType, v: Any): Double = dt match {
    case ByteType => v.asInstanceOf[Byte].toDouble
    case ShortType => v.asInstanceOf[Short].toDouble
    case IntegerType | DateType => v.asInstanceOf[Int].toDouble
    case LongType | TimestampType | TimestampNTZType =>
      v.asInstanceOf[Long].toDouble
    case FloatType => v.asInstanceOf[Float].toDouble
    case DoubleType => v.asInstanceOf[Double]
    case _: DecimalType =>
      v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalArgumentException(
      s"no histogram domain for ${other.sql}")
  }

  /** Monomorphic double accessor for the WRITE PATH (round 17, the
    * [[ManifestColTrackers]] pattern): the generic
    * `toDouble(dt, r.get(i, dt))` boxed and type-dispatched per non-null
    * value; this dispatches once per column at writer construction.
    * Values are identical to [[toDouble]]'s by construction. */
  def doubleGetter(dt: DataType): (org.apache.spark.sql.catalyst.InternalRow, Int) => Double =
    dt match {
      case ByteType => (r, i) => r.getByte(i).toDouble
      case ShortType => (r, i) => r.getShort(i).toDouble
      case IntegerType | DateType => (r, i) => r.getInt(i).toDouble
      case LongType | TimestampType | TimestampNTZType =>
        (r, i) => r.getLong(i).toDouble
      case FloatType => (r, i) => r.getFloat(i).toDouble
      case DoubleType => (r, i) => r.getDouble(i)
      case d: DecimalType =>
        (r, i) => r.getDecimal(i, d.precision, d.scale).toDouble
      case other => throw new IllegalArgumentException(
        s"no histogram domain for ${other.sql}")
    }

  /** Deterministic position hash for the sampler — the repo-wide
    * splitmix64 mixer (graft.functions.Kernels.mix64). */
  private def splitmix64(x0: Long): Long =
    graft.functions.Kernels.mix64(x0)

  /** Streaming deterministic threshold sampler (one per declared column
    * per task writer). */
  final class Tracker {
    // (position hash, value): the hash — over the FINITE NON-NULL value
    // ordinal — decides survival on re-filter
    private var buf = new scala.collection.mutable.ArrayBuffer[(Long, Double)](
      SampleCap + 1)
    private var threshold = Long.MaxValue
    private var seen = 0L
    def add(d: Double): Unit = {
      // non-finite values sample like nulls: a NaN/∞ HistogramBin bound
      // feeds garbage into catalyst's range-selectivity arithmetic (the
      // agg-pushdown path refuses non-finite float/double bounds for the
      // same reason)
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return
      val h = splitmix64(seen) & Long.MaxValue // non-negative
      if (h < threshold) {
        buf += ((h, d))
        if (buf.length > SampleCap) {
          threshold /= 2
          buf = buf.filter(_._1 < threshold)
        }
      }
      seen += 1
    }
    def isEmpty: Boolean = buf.isEmpty
    /** (sorted order statistics, the finite non-null count they
      * represent). */
    def result(): (Array[Double], Long) = {
      val nonNull = seen
      val sorted = buf.map(_._2).toArray.sorted
      if (sorted.length <= EmitCap) (sorted, nonNull)
      else {
        val out = new Array[Double](EmitCap)
        var i = 0
        while (i < EmitCap) {
          out(i) = sorted((i.toLong * (sorted.length - 1) /
            (EmitCap - 1)).toInt)
          i += 1
        }
        (out, nonNull)
      }
    }
  }

  // ---- `#hist,<file>,<pos>:<nonNull>:<b64 doubles>;...` codec ---------

  def payload(samples: Seq[(Int, (Array[Double], Long))]): String =
    samples.map { case (pos, (vs, nn)) =>
      val bb = java.nio.ByteBuffer.allocate(vs.length * 8)
      vs.foreach(bb.putDouble)
      s"$pos:$nn:${java.util.Base64.getEncoder.encodeToString(bb.array())}"
    }.mkString(";")

  def parsePayload(payload: String): Map[Int, (Array[Double], Long)] =
    payload.split(";").flatMap { s =>
      s.split(":", 3) match {
        case Array(p, nn, b64) =>
          for (pos <- p.toIntOption; n <- nn.toLongOption) yield {
            val bytes = java.util.Base64.getDecoder.decode(b64)
            val bb = java.nio.ByteBuffer.wrap(bytes)
            val vs = new Array[Double](bytes.length / 8)
            var i = 0
            while (i < vs.length) { vs(i) = bb.getDouble(); i += 1 }
            pos -> (vs, n)
          }
        case _ => None
      }
    }.toMap

  def line(name: String, samples: Seq[(Int, (Array[Double], Long))]): String =
    s"#hist,$name,${payload(samples)}"

  /** file → (pos → (sorted sample, non-null count)). */
  def fromLines(lines: Array[String]):
      Map[String, Map[Int, (Array[Double], Long)]] =
    lines.filter(_.startsWith("#hist,")).flatMap { l =>
      val parts = l.split(",", 3)
      if (parts.length < 3) None
      else Some(parts(1) -> parsePayload(parts(2)))
    }.toMap

  /** Merge per-file (sample, weight) into `buckets` equi-height bins —
    * PERCENTILE bins, catalyst's exact shape: boundary k is the
    * weighted k/B-quantile of the pooled samples, bins share endpoints,
    * and a heavy repeated value legitimately spans several (lo == hi)
    * bins, which is precisely how the estimator prices point mass.
    * Each sample point carries weight nonNull/|sample|; bin ndv counts
    * the distinct sample values inside (min 1). */
  /** K-way merge of SORTED per-file samples (result() sorts before
    * emit; the codec preserves order) into parallel primitive arrays —
    * values ascending, each with its file's per-point weight. No boxed
    * tuples, no O(n log n) re-sort of already-ordered runs on the
    * driver's plan path. */
  private def mergedArrays(files: Array[(Array[Double], Long)]):
      (Array[Double], Array[Double]) = {
    val k = files.length
    val n = {
      var s = 0L; files.foreach(s += _._1.length)
      require(s <= Int.MaxValue, "histogram sample pool overflow")
      s.toInt
    }
    val vals = new Array[Double](n)
    val wts = new Array[Double](n)
    val perW = files.map(f => f._2.toDouble / f._1.length)
    val idx = new Array[Int](k)
    // binary min-heap of file indices keyed by each file's current head;
    // equal heads pop in unspecified order, which cannot change the
    // result (consumers read VALUES and ranks, never provenance)
    val heap = new Array[Int](k)
    var hs = 0
    @inline def head(f: Int): Double = files(f)._1(idx(f))
    def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1; var m = i
        if (l < hs && head(heap(l)) < head(heap(m))) m = l
        if (r < hs && head(heap(r)) < head(heap(m))) m = r
        if (m == i) return
        val t = heap(i); heap(i) = heap(m); heap(m) = t; i = m
      }
    }
    var fi = 0
    while (fi < k) { // insert with sift-up
      heap(hs) = fi; var i = hs; hs += 1
      while (i > 0 && head(heap(i)) < head(heap((i - 1) / 2))) {
        val p = (i - 1) / 2
        val t = heap(i); heap(i) = heap(p); heap(p) = t; i = p
      }
      fi += 1
    }
    var o = 0
    while (hs > 0) {
      val f = heap(0)
      vals(o) = head(f); wts(o) = perW(f); o += 1
      idx(f) += 1
      if (idx(f) >= files(f)._1.length) { hs -= 1; heap(0) = heap(hs) }
      siftDown()
    }
    (vals, wts)
  }

  /** Per-SEGMENT summary capacity: one segment may pool thousands of
    * files' samples, so its pre-merged summary keeps more order
    * statistics than a single file's 128 — resolution loss from the
    * double downsampling stays negligible at the optimizer's 64-bin
    * grain. */
  val SegEmitCap = 512

  /** Compress pooled per-file samples into ONE uniform-weight summary
    * of ≤ cap order statistics representing their total non-null mass —
    * the segment-level pre-merge that makes plan-time histogram
    * assembly O(live segments) instead of O(kept files). Downsampling a
    * weighted merged sample at evenly spaced cumulative-weight ranks is
    * itself a quantile sketch, the same argument as EmitCap. */
  def compress(perFile: Seq[(Array[Double], Long)], cap: Int = SegEmitCap):
      Option[(Array[Double], Long)] = {
    val files = perFile.filter(f => f._1.nonEmpty && f._2 > 0L).toArray
    if (files.isEmpty) return None
    val (vals, wts) = mergedArrays(files)
    val n = vals.length
    var nn = 0L
    files.foreach(nn += _._2)
    val total = wts.sum
    val m = math.min(cap, n)
    if (m == n && files.forall(f => f._1.length.toLong * files(0)._2 ==
        f._2 * files(0)._1.length))
      return Some((vals, nn)) // uniform weights already: verbatim
    val out = new Array[Double](m)
    out(0) = vals(0)
    out(m - 1) = vals(n - 1)
    var i = 0
    var acc = 0.0
    var q = 1
    while (q < m - 1) {
      val target = total * q / (m - 1)
      while (acc < target && i < n) { acc += wts(i); i += 1 }
      out(q) = vals(math.min(i, n) - 1)
      q += 1
    }
    Some((out, nn))
  }

  def merge(perFile: Seq[(Array[Double], Long)], buckets: Int = Buckets):
      Option[(Double, Array[(Double, Double, Long)])] = {
    val files = perFile.filter(f => f._1.nonEmpty && f._2 > 0L).toArray
    if (files.isEmpty) return None
    val (vals, wts) = mergedArrays(files)
    val n = vals.length
    var total = 0.0
    files.foreach(total += _._2.toDouble)
    val nBins = math.min(buckets, n)
    // weighted quantile at cumulative targets k/B, by one walk
    val boundaries = new Array[Double](nBins + 1)
    boundaries(0) = vals(0)
    var i = 0
    var acc = 0.0
    var q = 1
    while (q <= nBins) {
      val target = total * q / nBins
      while (acc < target && i < n) { acc += wts(i); i += 1 }
      boundaries(q) = vals(math.min(i, n) - 1)
      q += 1
    }
    // per-bin distinct counts in ONE monotone walk (vals and boundaries
    // are both sorted): advance j once across all bins
    val out = new Array[(Double, Double, Long)](nBins)
    var b = 0
    var j = 0
    var prev = Double.NaN
    while (b < nBins) {
      val lo = boundaries(b)
      val hi = boundaries(b + 1)
      var d = 0L
      // skip points at or below lo (they belong to earlier bins),
      // except the very first bin which includes its lower endpoint
      while (j < n && (vals(j) < lo || (b > 0 && vals(j) == lo))) j += 1
      while (j < n && vals(j) <= hi) {
        if (vals(j) != prev) { d += 1; prev = vals(j) }
        j += 1
      }
      out(b) = (lo, hi, math.max(1L, d))
      b += 1
    }
    Some((total / nBins, out))
  }
}
