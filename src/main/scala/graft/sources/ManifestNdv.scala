package graft.sources

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file DISTINCT-COUNT sketches for the manifest format's
  * cost-based-optimizer statistics (the Iceberg-Puffin idea folded into
  * the manifest itself): tables declare `stats.ndv.columns`, every
  * data-file write then tracks a small dense HyperLogLog per declared
  * column as rows stream through, and the sketch lands as a
  * `#ndv,<file>,<pos>=<b64-registers>;…` rider line next to the file's
  * entry. At plan time the scan merges the KEPT files' registers
  * (register-wise max — the HLL union is exact over the sketch domain,
  * so post-pruning NDV is the union of surviving files only, never a
  * stale table-level number) and reports the estimate through DSv2
  * `Statistics.columnStats()` alongside exact merged min/max/null
  * counts from the `#stats` lines — the seam Spark's CBO join reorder
  * consumes (SPARK-41378; reference: 2.1's ANALYZE-computed
  * `sql/core/.../command/AnalyzeColumnCommand.scala` stats, which go
  * stale the moment data changes — these never do, they ride every
  * commit).
  *
  * Sketch shape: p=9 → 512 registers of one byte, 460 B of raw payload
  * (~616 B in Base64) per column per file; relative error ≈ 1.04/√512
  * ≈ 4.6 % — cardinality-class accuracy, exactly what join reorder
  * needs. Hashing is XXH64 over the column's INTERNAL value (longs
  * hash their bits, strings their UTF-8 bytes), deterministic across
  * runs and executors, so sketches are stable artifacts: the same rows
  * always produce the same registers.
  */
object ManifestNdv {
  val P = 9
  val M: Int = 1 << P // 512 registers
  private val Seed = 0x9747b28cL

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  /** Fold one 64-bit hash into the registers. */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val w = hash << P
    // rank of the first 1-bit in the remaining 55 bits (1-based; all
    // zeros rank at the full width + 1)
    val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > (regs(idx) & 0xFF)) regs(idx) = rank.toByte
  }

  /** Register-wise max — the HLL union, exact in sketch space. */
  def merge(into: Array[Byte], other: Array[Byte]): Unit = {
    var i = 0
    while (i < M) {
      if ((other(i) & 0xFF) > (into(i) & 0xFF)) into(i) = other(i)
      i += 1
    }
  }

  /** Standard HLL estimate with linear-counting small-range correction. */
  def estimate(regs: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var inv = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = regs(i) & 0xFF
      inv += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * M.toDouble * M.toDouble / inv
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.max(0L, math.round(corrected))
  }

  /** Types a sketch is tracked for (the orderable #stats set minus
    * nothing — any value with a stable internal identity hashes). */
  def capable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType |
         DoubleType | FloatType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Deterministic 64-bit hash of a NON-NULL internal value. Integral
    * families share the long-bits path so int→long TYPE WIDENING keeps
    * old sketches valid (5: Int and 5L hash identically); float→double
    * does NOT (widened floats re-decode to different bit patterns), so
    * the scan suppresses NDV on widened float columns exactly like it
    * suppresses their min/max skipping. */
  def hash(dt: DataType, v: Any): Long = dt match {
    case LongType | TimestampType | TimestampNTZType =>
      XXH64.hashLong(v.asInstanceOf[Long], Seed)
    case IntegerType | DateType =>
      XXH64.hashLong(v.asInstanceOf[Int].toLong, Seed)
    case ShortType => XXH64.hashLong(v.asInstanceOf[Short].toLong, Seed)
    case ByteType => XXH64.hashLong(v.asInstanceOf[Byte].toLong, Seed)
    case BooleanType =>
      XXH64.hashLong(if (v.asInstanceOf[Boolean]) 1L else 0L, Seed)
    case DoubleType => XXH64.hashLong(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), Seed)
    case FloatType => XXH64.hashLong(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Float].toDouble), Seed)
    case StringType =>
      XXH64.hashUTF8String(v.asInstanceOf[UTF8String], Seed)
    case _: DecimalType =>
      XXH64.hashUTF8String(UTF8String.fromString(
        v.asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal.stripTrailingZeros.toPlainString), Seed)
    case other => throw new IllegalArgumentException(
      s"ndv sketch over unsupported type $other")
  }

  /** Monomorphic hash accessor for the WRITE PATH (round 17, the
    * [[ManifestColTrackers]] pattern applied to sketch maintenance): the
    * generic `hash(dt, r.get(i, dt))` paid one box and one runtime-type
    * dispatch per non-null value of every declared column. The getter
    * dispatches ONCE per column at writer construction and reads the
    * row's primitive slot directly; registers are bit-identical because
    * the hash input is the same logical value either way (integrals
    * widen to long exactly as `hash` does, floats widen through double
    * bits, strings hash their UTF-8 bytes in place — no clone needed,
    * XXH64 consumes them before the buffer is reused). */
  def hashGetter(dt: DataType): (org.apache.spark.sql.catalyst.InternalRow, Int) => Long =
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (r, i) => XXH64.hashLong(r.getLong(i), Seed)
      case IntegerType | DateType =>
        (r, i) => XXH64.hashLong(r.getInt(i).toLong, Seed)
      case ShortType => (r, i) => XXH64.hashLong(r.getShort(i).toLong, Seed)
      case ByteType => (r, i) => XXH64.hashLong(r.getByte(i).toLong, Seed)
      case BooleanType =>
        (r, i) => XXH64.hashLong(if (r.getBoolean(i)) 1L else 0L, Seed)
      case DoubleType => (r, i) => XXH64.hashLong(
        java.lang.Double.doubleToLongBits(r.getDouble(i)), Seed)
      case FloatType => (r, i) => XXH64.hashLong(
        java.lang.Double.doubleToLongBits(r.getFloat(i).toDouble), Seed)
      case StringType =>
        (r, i) => XXH64.hashUTF8String(r.getUTF8String(i), Seed)
      case d: DecimalType => (r, i) => XXH64.hashUTF8String(
        UTF8String.fromString(r.getDecimal(i, d.precision, d.scale)
          .toJavaBigDecimal.stripTrailingZeros.toPlainString), Seed)
      case other => throw new IllegalArgumentException(
        s"ndv sketch over unsupported type $other")
    }

  // ---- `#ndv` rider-line codec -----------------------------------------

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  def payload(sketches: Seq[(Int, Array[Byte])]): String =
    sketches.map { case (p, r) => s"$p=${b64(r)}" }.mkString(";")

  def parsePayload(payload: String): Map[Int, Array[Byte]] =
    payload.split(";").flatMap { kv =>
      val eq = kv.indexOf('=')
      if (eq <= 0) None
      else kv.substring(0, eq).toIntOption.map(_ -> unb64(kv.substring(eq + 1)))
    }.toMap

  /** `#ndv,<file>,<pos>=<b64>;<pos>=<b64>` — position-keyed like
    * `#stats`, so RENAME COLUMN keeps sketches valid. */
  def line(name: String, sketches: Seq[(Int, Array[Byte])]): String =
    s"#ndv,$name,${payload(sketches)}"

  def fromLines(lines: Array[String]): Map[String, Map[Int, Array[Byte]]] =
    lines.filter(_.startsWith("#ndv,")).flatMap { l =>
      l.split(",", 3) match {
        case Array(_, name, p) => Some(name -> parsePayload(p))
        case _ => None
      }
    }.toMap
}
