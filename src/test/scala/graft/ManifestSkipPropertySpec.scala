package graft.sources

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Soundness property of the data-skipping evaluator: for ANY dataset,
  * ANY partitioning into files, and ANY supported filter, a file that
  * [[ManifestSkip.canSkip]] proves row-free under the writer's recorded
  * stats must truly contain NO row satisfying the filter (SQL
  * three-valued semantics: NULL never satisfies a comparison). This is
  * the property the q226 hash-match spot-checks once; here it is fuzzed
  * across thousands of (file, filter) pairs, including null-bearing
  * string columns, negative/extreme numerics, and nested And/Or shapes.
  * Completeness (files that could skip but don't) is intentionally NOT
  * asserted — the evaluator is free to be conservative. */
class ManifestSkipPropertySpec extends AnyFunSuite {

  private val schema = new StructType()
    .add("k", LongType).add("d", DoubleType).add("s", StringType)

  private case class Row(k: Long, d: Double, s: Option[String])

  /** Stats exactly as the writer records them: String.valueOf encoding,
    * min/max under canonical orderings, null counts. */
  private def statsOf(rows: Seq[Row]): ManifestFiles.FileStats = {
    def col[A](vals: Seq[A], lt: (A, A) => Boolean, enc: A => String) =
      if (vals.isEmpty) ManifestFiles.ColStats(0L, None, None)
      else ManifestFiles.ColStats(0L,
        Some(enc(vals.reduce((a, b) => if (lt(a, b)) a else b))),
        Some(enc(vals.reduce((a, b) => if (lt(a, b)) b else a))))
    val ks = col[Long](rows.map(_.k), _ < _, String.valueOf(_))
    val ds = col[Double](rows.map(_.d),
      (a, b) => java.lang.Double.compare(a, b) < 0, String.valueOf(_))
    val svals = rows.flatMap(_.s)
    val ss0 = col[String](svals,
      (a, b) => UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0,
      identity)
    // the writer TRUNCATES string bounds (prefix / prefix+increment) —
    // fuzz the truncated form, it is what production skips against
    val ss = ManifestFiles.ColStats((rows.size - svals.size).toLong,
      ss0.min.map(ManifestFiles.truncLower),
      ss0.max.flatMap(ManifestFiles.truncUpper))
    ManifestFiles.FileStats(100L, Map(0 -> ks, 1 -> ds, 2 -> ss))
  }

  /** Ground-truth filter evaluation with SQL null semantics. */
  private def matches(f: Filter, r: Row): Boolean = {
    def value(c: String): Option[Any] = c match {
      case "k" => Some(r.k)
      case "d" => Some(r.d)
      case "s" => r.s
    }
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
      case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
      case (x: String, y: String) =>
        Some(UTF8String.fromString(x).compareTo(UTF8String.fromString(y)))
      case _ => None
    }
    f match {
      case And(l, rr) => matches(l, r) && matches(rr, r)
      case Or(l, rr) => matches(l, r) || matches(rr, r)
      case EqualTo(c, v) => value(c).flatMap(cmp(_, v)).contains(0)
      case EqualNullSafe(c, null) => value(c).isEmpty
      case EqualNullSafe(c, v) => value(c).flatMap(cmp(_, v)).contains(0)
      case GreaterThan(c, v) => value(c).flatMap(cmp(_, v)).exists(_ > 0)
      case GreaterThanOrEqual(c, v) => value(c).flatMap(cmp(_, v)).exists(_ >= 0)
      case LessThan(c, v) => value(c).flatMap(cmp(_, v)).exists(_ < 0)
      case LessThanOrEqual(c, v) => value(c).flatMap(cmp(_, v)).exists(_ <= 0)
      case In(c, vs) => vs.exists(v => value(c).flatMap(cmp(_, v)).contains(0))
      case IsNull(c) => value(c).isEmpty
      case IsNotNull(c) => value(c).isDefined
      case StringStartsWith(c, p) =>
        value(c).exists(_.asInstanceOf[String].startsWith(p))
      case other => fail(s"unhandled filter in ground truth: $other")
    }
  }

  private val genLong = Gen.oneOf(Gen.choose(-100L, 100L),
    Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L))
  private val genDouble = Gen.oneOf(
    Gen.choose(-50.0, 50.0), Gen.oneOf(-1e300, 1e300, 0.0, -0.0, 1e-300))
  // Long adversarial strings stress bound truncation: equal up to the
  // 16-cp truncation point and diverging after; maxed-out code points
  // exercise the increment's carry/give-up path; supplementary planes
  // exercise surrogate-pair handling.
  private val maxCp = new String(Character.toChars(0x10FFFF))
  private val longStrs = Seq(
    "x" * 16, "x" * 16 + "a", "x" * 16 + "b", "x" * 40,
    "x" * 15 + maxCp + "tail", maxCp * 17, maxCp * 16 + "a",
    "pre" + "\ud83d\ude00" * 10 + "suf", // astral emoji past the cut
    "z" * 17, "z" * 16 + maxCp)
  private val genStr = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("", "a", "zz", "abc"), Gen.oneOf(longStrs))
  private val genRow: Gen[Row] = for {
    k <- genLong; d <- genDouble
    s <- Gen.option(genStr)
  } yield Row(k, d, s)

  private def leaf: Gen[Filter] = {
    val col = Gen.oneOf("k", "d", "s")
    def v(c: String): Gen[Any] = c match {
      case "k" => genLong.map(x => x: java.lang.Long)
      case "d" => genDouble.map(x => x: java.lang.Double)
      case "s" => genStr
    }
    Gen.oneOf[Gen[Filter]](
      col.flatMap(c => v(c).map(EqualTo(c, _))),
      col.flatMap(c => v(c).map(GreaterThan(c, _))),
      col.flatMap(c => v(c).map(GreaterThanOrEqual(c, _))),
      col.flatMap(c => v(c).map(LessThan(c, _))),
      col.flatMap(c => v(c).map(LessThanOrEqual(c, _))),
      col.flatMap(c => Gen.listOfN(3, v(c)).map(vs => In(c, vs.toArray))),
      col.map(IsNull(_)), col.map(IsNotNull(_)),
      genStr.map(StringStartsWith("s", _)),
      col.flatMap(c => v(c).map(EqualNullSafe(c, _)))
    ).flatMap(identity)
  }

  private def genFilter(depth: Int): Gen[Filter] =
    if (depth == 0) leaf
    else Gen.frequency(
      3 -> leaf,
      1 -> (for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield And(l, r)),
      1 -> (for { l <- genFilter(depth - 1); r <- genFilter(depth - 1) } yield Or(l, r)))

  private def sample[A](g: Gen[A], seed: Long): A = {
    var i = 0L
    var out: Option[A] = None
    while (out.isEmpty) { out = g.apply(Gen.Parameters.default, Seed(seed + i * 7919)); i += 1 }
    out.get
  }

  test("canSkip never skips a file containing a matching row (fuzzed)") {
    var skips = 0
    var checked = 0
    (1 to 600).foreach { trial =>
      val n = 1 + (trial % 17)
      val rows = (0 until n).map(i => sample(genRow, trial * 1000L + i))
      // go through the WIRE FORMAT: the skip decision in production reads
      // stats parsed back from the snapshot line, so the encoding is part
      // of the soundness surface (an early encoding conflated empty-string
      // minima with all-null columns — caught exactly here)
      val raw = statsOf(rows)
      val stats = ManifestFiles.parseStatsLine(
        ManifestFiles.statsLine("f", 100L, raw.cols.toSeq.sortBy(_._1)))
        .map(_._2)
      assert(stats.isDefined)
      val filter = sample(genFilter(2), trial * 31L)
      checked += 1
      if (ManifestSkip.canSkip(filter, schema, stats, Some(rows.size.toLong))) {
        skips += 1
        rows.foreach { r =>
          assert(!matches(filter, r),
            s"UNSOUND SKIP: $filter skipped a file containing $r " +
              s"(stats=${stats.get})")
        }
      }
    }
    // meta-assertion: the fuzz actually exercised the skip path
    assert(skips > 50, s"only $skips/$checked trials skipped — generator too weak")
  }

  test("truncated bounds bracket the true value; the manifest stays " +
    "O(file-count) sized over long-text columns") {
    // unit postconditions on the adversarial set + random long strings
    val rnd = new scala.util.Random(42)
    val samples = longStrs ++ (1 to 200).map(_ =>
      rnd.alphanumeric.take(5 + rnd.nextInt(60)).mkString +
        (if (rnd.nextBoolean()) maxCp else ""))
    samples.foreach { s =>
      val lo = ManifestFiles.truncLower(s)
      assert(UTF8String.fromString(lo).compareTo(UTF8String.fromString(s)) <= 0)
      assert(lo.codePointCount(0, lo.length) <=
        math.max(ManifestFiles.StatsTruncLen, s.codePointCount(0, s.length)))
      ManifestFiles.truncUpper(s).foreach { hi =>
        assert(UTF8String.fromString(hi).compareTo(UTF8String.fromString(s)) >= 0,
          s"upper bound $hi < value $s")
        assert(hi.codePointCount(0, hi.length) <= ManifestFiles.StatsTruncLen + 1)
      }
    }
    // a stats line over 10KB values is bounded: bounds carry <= 17 cps
    val big = "lorem ipsum " * 1000
    val line = ManifestFiles.statsLine("f", 1L, Seq(
      0 -> ManifestFiles.ColStats(0L,
        Some(ManifestFiles.truncLower(big)),
        ManifestFiles.truncUpper(big))))
    assert(line.length < 256, s"stats line not bounded: ${line.length}")
  }

  test("round-trip: writer-encoded stats parse back identically") {
    (1 to 100).foreach { trial =>
      val rows = (0 until 5).map(i => sample(genRow, trial * 77L + i))
      val st = statsOf(rows)
      val line = ManifestFiles.statsLine(s"part-$trial", 100L,
        st.cols.toSeq.sortBy(_._1))
      val parsed = ManifestFiles.parseStatsLine(line)
      assert(parsed.contains(s"part-$trial" -> st), s"$line\n$parsed\n$st")
    }
  }
}
