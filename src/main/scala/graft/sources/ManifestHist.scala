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
    * range-comparable (catalyst HistogramBin bounds are doubles). */
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

  /** Deterministic position hash for the sampler — the repo-wide
    * splitmix64 mixer (graft.functions.Kernels.mix64). */
  private def splitmix64(x0: Long): Long =
    graft.functions.Kernels.mix64(x0)

  /** Streaming deterministic threshold sampler (one per declared column
    * per task writer). */
  final class Tracker {
    // (position hash, value): the hash decides survival on re-filter
    private var buf = new scala.collection.mutable.ArrayBuffer[(Long, Double)](
      SampleCap + 1)
    private var threshold = Long.MaxValue
    private var seen = 0L
    private var nonNull = 0L
    def add(d: Double): Unit = {
      nonNull += 1
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
    /** (sorted order statistics, non-null count they represent). */
    def result(): (Array[Double], Long) = {
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

  def line(name: String, samples: Seq[(Int, (Array[Double], Long))]): String =
    s"#hist,$name," + samples.map { case (pos, (vs, nn)) =>
      val bb = java.nio.ByteBuffer.allocate(vs.length * 8)
      vs.foreach(bb.putDouble)
      s"$pos:$nn:${java.util.Base64.getEncoder.encodeToString(bb.array())}"
    }.mkString(";")

  /** file → (pos → (sorted sample, non-null count)). */
  def fromLines(lines: Array[String]):
      Map[String, Map[Int, (Array[Double], Long)]] =
    lines.filter(_.startsWith("#hist,")).flatMap { l =>
      val parts = l.split(",", 3)
      if (parts.length < 3) None
      else Some(parts(1) -> parts(2).split(";").flatMap { s =>
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
      }.toMap)
    }.toMap

  /** Merge per-file (sample, weight) into `buckets` equi-height bins —
    * PERCENTILE bins, catalyst's exact shape: boundary k is the
    * weighted k/B-quantile of the pooled samples, bins share endpoints,
    * and a heavy repeated value legitimately spans several (lo == hi)
    * bins, which is precisely how the estimator prices point mass.
    * Each sample point carries weight nonNull/|sample|; bin ndv counts
    * the distinct sample values inside (min 1). */
  def merge(perFile: Seq[(Array[Double], Long)], buckets: Int = Buckets):
      Option[(Double, Array[(Double, Double, Long)])] = {
    val pts = perFile.filter(f => f._1.nonEmpty && f._2 > 0L).flatMap {
      case (vs, nn) =>
        val w = nn.toDouble / vs.length
        vs.iterator.map(v => (v, w))
    }.sortBy(_._1)
    if (pts.isEmpty) return None
    val total = pts.iterator.map(_._2).sum
    val nBins = math.min(buckets, pts.length)
    // weighted quantile at cumulative targets k/B, by one walk
    val boundaries = new Array[Double](nBins + 1)
    boundaries(0) = pts.head._1
    var i = 0
    var acc = 0.0
    var k = 1
    while (k <= nBins) {
      val target = total * k / nBins
      while (acc < target && i < pts.length) { acc += pts(i)._2; i += 1 }
      boundaries(k) = pts(math.min(i, pts.length) - 1)._1
      k += 1
    }
    // per-bin distinct counts in ONE monotone walk (pts and boundaries
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
      while (j < pts.length && (pts(j)._1 < lo ||
          (b > 0 && pts(j)._1 == lo))) j += 1
      while (j < pts.length && pts(j)._1 <= hi) {
        if (pts(j)._1 != prev) { d += 1; prev = pts(j)._1 }
        j += 1
      }
      out(b) = (lo, hi, math.max(1L, d))
      b += 1
    }
    Some((total / nBins, out))
  }
}
