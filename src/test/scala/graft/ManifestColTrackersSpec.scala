package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The specialized parquet-path trackers must record exactly what the
  * generic normalize+cmp fold recorded: strict-update tie handling,
  * -0.0/0.0 squash on the COMPARE domain with the ORIGINAL value in the
  * raw string, NaN ordered greatest, float raw strings from the float
  * (never the widened double), decimal scale-insensitive order. */
class ManifestColTrackersSpec extends AnyFunSuite {

  private def track(dt: DataType, vals: Seq[Any]): (String, String) = {
    val t = ManifestColTrackers.forType(dt)
    vals.foreach { v =>
      val row = InternalRow(v)
      t.add(row, 0)
    }
    (t.rawMin, t.rawMax)
  }

  test("long/int widen and compare exactly") {
    assert(track(LongType, Seq(5L, -3L, 9L, -3L)) == ("-3", "9"))
    assert(track(IntegerType, Seq(7, 2, 2, 11)) == ("2", "11"))
  }

  test("double: -0.0 ties 0.0 (first seen wins the raw string), NaN greatest") {
    // -0.0 first: the later 0.0 compares EQUAL on the normalized domain,
    // so the strict update keeps the original "-0.0" — the generic
    // fold's exact behavior (ordered(kept, min) < 0)
    assert(track(DoubleType, Seq(-0.0d, 0.0d, 1.0d)) == ("-0.0", "1.0"))
    assert(track(DoubleType, Seq(0.0d, -0.0d, 1.0d)) == ("0.0", "1.0"))
    assert(track(DoubleType, Seq(1.0d, Double.NaN, 2.0d)) == ("1.0", "NaN"))
  }

  test("float raw strings come from the float, not the widened double") {
    val (mn, mx) = track(FloatType, Seq(0.1f, 0.3f))
    assert(mn == "0.1" && mx == "0.3")
  }

  test("string: binary order, tie keeps first raw") {
    val (mn, mx) = track(StringType,
      Seq(UTF8String.fromString("b"), UTF8String.fromString("ab"),
        UTF8String.fromString("b")))
    assert(mn == "ab" && mx == "b")
  }

  test("decimal: scale-insensitive compare, raw keeps Decimal rendering") {
    val dt = DecimalType(10, 2)
    val (mn, mx) = track(dt, Seq(
      org.apache.spark.sql.types.Decimal("3.50"),
      org.apache.spark.sql.types.Decimal("3.05"),
      org.apache.spark.sql.types.Decimal("12.00")))
    assert(mn == "3.05" && mx == "12.00")
  }

  test("date/timestamp track on their internal numeric forms") {
    assert(track(DateType, Seq(10, 3, 25)) == ("3", "25"))
    assert(track(TimestampType, Seq(100L, 7L, 300L)) == ("7", "300"))
  }

  test("non-capable types get no tracker") {
    assert(ManifestColTrackers.forType(BinaryType) == null)
    assert(ManifestColTrackers.forType(ArrayType(LongType)) == null)
  }
}
