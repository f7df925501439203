package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels

/** Property-based kernel checks (SURVEY.md §5.7 mirror): cosine range and
  * symmetry, MinHash estimate vs true Jaccard, SimHash locality.
  * ScalaCheck generators sampled under fixed seeds (the cached artifact
  * set has no scalatest bridge). */
class KernelPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga, 40).zip(samples(gb, 40)).foreach { case (a, b) => f(a, b) }
  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    samples(ga, 40).foreach(f)
  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private def words(ws: Seq[String]) =
    new GenericArrayData(ws.map(w => UTF8String.fromString(w)).toArray[Any])
  private def floats(fs: Seq[Float]) =
    new GenericArrayData(fs.map(_.asInstanceOf[Any]).toArray)

  private val vecGen = Gen.listOfN(32, Gen.chooseNum(-10.0f, 10.0f))
    .suchThat(_.exists(_ != 0f))

  test("cosine is in [-1,1], symmetric, and 1 on self") {
    forAll(vecGen, vecGen) { (a: List[Float], b: List[Float]) =>
      val (x, y) = (floats(a), floats(b))
      val c = Kernels.cosineF(x, y)
      assert(c >= -1.0000001 && c <= 1.0000001)
      assert(math.abs(c - Kernels.cosineF(y, x)) < 1e-12)
      assert(math.abs(Kernels.cosineF(x, x) - 1.0) < 1e-9)
    }
  }

  private val docGen = for {
    n <- Gen.chooseNum(20, 80)
    ws <- Gen.listOfN(n, Gen.chooseNum(0, 50).map(i => s"w$i"))
  } yield ws

  test("minhash agreement tracks true shingle jaccard within 0.25") {
    forAll(docGen, Gen.chooseNum(0, 60)) { (doc: List[String], cut: Int) =>
      whenever(doc.length >= 20) {
        // variant shares a prefix of the shingle stream
        val variant = doc.take(math.max(5, doc.length - cut)) ++
          (0 until cut).map(i => s"z$i")
        def shingles(ws: Seq[String]) =
          ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        val (sa, sb) = (shingles(doc), shingles(variant))
        val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
        val est = Kernels.sigAgreement(
          Kernels.minHash(words(doc), 256, 3, 42L),
          Kernels.minHash(words(variant), 256, 3, 42L))
        assert(math.abs(est - trueJ) < 0.25,
          s"est=$est true=$trueJ doc=${doc.length} cut=$cut")
      }
    }
  }

  test("simhash hamming distance is monotone-ish in edit count") {
    forAll(docGen) { (doc: List[String]) =>
      whenever(doc.length >= 20) {
        val h0 = Kernels.simHash64(words(doc))
        val small = doc.updated(0, "EDIT")
        val big = doc.indices.map(i => if (i % 2 == 0) s"E$i" else doc(i))
        val dSmall = Kernels.hamming64(h0, Kernels.simHash64(words(small)))
        val dBig = Kernels.hamming64(h0, Kernels.simHash64(words(big)))
        assert(dSmall <= dBig + 8, s"small=$dSmall big=$dBig")
      }
    }
  }
}
