package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

class KernelsSpec extends AnyFunSuite {

  private def words(ws: String*): GenericArrayData =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])

  private def floats(fs: Float*): GenericArrayData =
    new GenericArrayData(fs.map(f => f.asInstanceOf[Any]).toArray)

  test("fnv1a64 is deterministic and spreads") {
    val a = Kernels.fnv1a64(UTF8String.fromString("spark"))
    val b = Kernels.fnv1a64(UTF8String.fromString("spark"))
    val c = Kernels.fnv1a64(UTF8String.fromString("sparl"))
    assert(a == b)
    assert(a != c)
  }

  test("cosineF matches a naive reference computation") {
    val x = floats(1f, 2f, 3f)
    val y = floats(4f, 5f, 6f)
    val expected = (4.0 + 10.0 + 18.0) /
      (math.sqrt(1 + 4 + 9) * math.sqrt(16 + 25 + 36))
    assert(math.abs(Kernels.cosineF(x, y) - expected) < 1e-15)
    assert(math.abs(Kernels.cosineF(x, x) - 1.0) < 1e-15)
    assert(Kernels.cosineF(floats(0f, 0f), y) == 0.0)
  }

  test("cosineF defines NULL elements as 0.0 — identical on any ArrayData " +
    "backing (a reused column vector's null slot must not leak stale bytes)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val withNull = new GenericArrayData(Array[Any](1.0f, null, 3.0f))
    val zeroed = floats(1f, 0f, 3f)
    val y = floats(4f, 5f, 6f)
    assert(Kernels.cosineF(withNull, y) == Kernels.cosineF(zeroed, y))
    assert(Kernels.cosineD(
      new GenericArrayData(Array[Any](1.0d, null, 3.0d)),
      new GenericArrayData(Array[Any](4.0d, 5.0d, 6.0d))) ==
      Kernels.cosineD(
        new GenericArrayData(Array[Any](1.0d, 0.0d, 3.0d)),
        new GenericArrayData(Array[Any](4.0d, 5.0d, 6.0d))))
  }

  test("minhash signature estimates jaccard within tolerance") {
    // two 60-word docs sharing ~80% of their shingles
    val base = (0 until 60).map(i => s"w$i")
    val variant = base.take(48) ++ (0 until 12).map(i => s"x$i")
    val sigA = Kernels.minHash(words(base: _*), 128, 3, 42L)
    val sigB = Kernels.minHash(words(variant: _*), 128, 3, 42L)
    val est = Kernels.sigAgreement(sigA, sigB)
    // true jaccard of 3-shingle sets: 46 shared of (58+58-46)=70 ≈ 0.657
    assert(est > 0.4 && est < 0.9, s"estimate $est out of band")
    // identical docs → identical signatures
    val sigA2 = Kernels.minHash(words(base: _*), 128, 3, 42L)
    assert(Kernels.sigAgreement(sigA, sigA2) == 1.0)
  }

  test("simhash near-duplicates land within small hamming distance") {
    val base = (0 until 80).map(i => s"tok${i % 40}")
    val nearDup = base.updated(3, "CHANGED").updated(50, "ALSO")
    val far = (0 until 80).map(i => s"other${i}")
    val h1 = Kernels.simHash64(words(base: _*))
    val h2 = Kernels.simHash64(words(nearDup: _*))
    val h3 = Kernels.simHash64(words(far: _*))
    assert(Kernels.hamming64(h1, h2) < Kernels.hamming64(h1, h3))
    assert(Kernels.hamming64(h1, h1) == 0)
  }

  test("lsh bucket is stable and respects plane count") {
    val v = floats((0 until 64).map(i => (i % 7 - 3).toFloat): _*)
    val b1 = Kernels.lshBucketF(v, 4, 7L)
    val b2 = Kernels.lshBucketF(v, 4, 7L)
    assert(b1 == b2)
    assert(b1 >= 0 && b1 < 16)
  }
}
