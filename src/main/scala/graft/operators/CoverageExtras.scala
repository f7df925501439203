package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** Remaining SURVEY.md §2 inventory lines: columnar cache
  * (InMemoryRelation §1.3/2.1), explicit repartition + join-strategy hints
  * (§2.3), bucketed co-located joins (§2.1 sink options), intersectAll/
  * exceptAll (§2.7), RDD primitives (§2.12), sampling (§2.2), additional
  * string/date registry names (§2.8), stat helpers (§2.4), unionByName.
  */
object CoverageExtras extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** df.cache() → InMemoryTableScan on the second access; result unchanged. */
  val qCache: QueryDef = QueryDef(
    "q100_cache_scan",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
        .select($"l_returnflag", $"l_quantity").cache()
      li.count() // materialize the columnar cache
      val out = li.groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sum_qty"))
        .orderBy($"l_returnflag")
      out.collect() // execute against the cache before unpersisting
      li.unpersist(blocking = false)
      out
    },
    Some("""
      SELECT l_returnflag, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Explicit repartition on the join key + shuffle-hash join hint
    * (reference JoinSelection `SparkStrategies.scala:171-183`). */
  val qJoinHint: QueryDef = QueryDef(
    "q101_join_hint_shuffle_hash",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem").repartition(8, $"l_orderkey")
      val ord = t(s, d, "orders").hint("shuffle_hash")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"))
        .orderBy($"o_orderstatus")
    },
    Some(s"""
      SELECT o_orderstatus, COUNT(*) AS n, ${dsumSql("l_extendedprice")} AS total
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Bucketed tables: both sides bucketed on the join key ⇒ the sort-merge
    * join runs with NO exchange (the 100 TB co-location pattern; the spec
    * asserts the plan is exchange-free). */
  val qBucketedJoin: QueryDef = QueryDef(
    "q102_bucketed_join",
    (s, d) => {
      import s.implicits._
      val suffix = d.replaceAll("[^A-Za-z0-9]", "_")
      val liT = s"li_bkt_$suffix"
      val ordT = s"ord_bkt_$suffix"
      // The in-memory catalog forgets tables across sessions but the
      // warehouse directory persists — clear both before (re)creating.
      def resetTable(name: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $name")
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), name)
        val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.delete(wh, true)
      }
      if (!s.catalog.tableExists(liT)) {
        resetTable(liT)
        t(s, d, "lineitem").select($"l_orderkey", $"l_quantity")
          .write.mode(SaveMode.Overwrite)
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liT)
      }
      if (!s.catalog.tableExists(ordT)) {
        resetTable(ordT)
        t(s, d, "orders").select($"o_orderkey", $"o_orderpriority")
          .write.mode(SaveMode.Overwrite)
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ordT)
      }
      s.table(liT).join(s.table(ordT), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(sum($"l_quantity").as("sum_qty"))
        .orderBy($"o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, SUM(l_quantity) AS sum_qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  val qIntersectAll: QueryDef = QueryDef(
    "q103_intersect_all",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("k"))
        .intersectAll(t(s, d, "supplier").select($"s_nationkey".as("k")))
        .groupBy($"k").agg(count(lit(1)).as("n")).orderBy($"k")
    },
    Some("""
      SELECT k, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer
        INTERSECT ALL SELECT s_nationkey FROM supplier)
      GROUP BY k ORDER BY k"""))

  val qExceptAll: QueryDef = QueryDef(
    "q104_except_all",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("k"))
        .exceptAll(t(s, d, "supplier").select($"s_nationkey".as("k")))
        .groupBy($"k").agg(count(lit(1)).as("n")).orderBy($"k")
    },
    Some("""
      SELECT k, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer
        EXCEPT ALL SELECT s_nationkey FROM supplier)
      GROUP BY k ORDER BY k"""))

  /** RDD primitives (§2.12): map / filter / reduceByKey / sortBy on the
    * raw RDD, re-wrapped as a DataFrame — the imperative escape hatch. */
  val qRddPrimitives: QueryDef = QueryDef(
    "q105_rdd_primitives",
    (s, d) => {
      import s.implicits._
      val rdd = t(s, d, "lineitem")
        .select($"l_returnflag", $"l_quantity").as[(String, Double)].rdd
        .filter(_._2 > 10)
        .map { case (flag, qty) => (flag, qty.toLong) }
        .reduceByKey(_ + _)
      s.createDataFrame(rdd).toDF("l_returnflag", "heavy_qty")
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS heavy_qty
      FROM lineitem WHERE l_quantity > 10
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Bernoulli sample + randomSplit (seeded — deterministic per run but
    * partitioning-dependent → rows-only). */
  val qSample: QueryDef = QueryDef(
    "q106_sample_split",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      val sampled = li.sample(withReplacement = false, 0.1, seed = 42)
      val Array(a, b) = li.randomSplit(Array(0.8, 0.2), seed = 42)
      Seq(
        ("sample_10pct", sampled.count()),
        ("split_a", a.count()),
        ("split_b", b.count())
      ).toDF("part", "n").orderBy($"part")
    },
    None)

  /** Stat helpers (§2.4): approxQuantile / freqItems / sampleBy — sketchy
    * by nature → rows-only; spec bounds the quantile error. */
  val qStatHelpers: QueryDef = QueryDef(
    "q107_stat_helpers",
    (s, d) => {
      import s.implicits._
      val li = t(s, d, "lineitem")
      val Array(q25, q50, q75) =
        li.stat.approxQuantile("l_quantity", Array(0.25, 0.5, 0.75), 0.01)
      val freq = li.stat.freqItems(Seq("l_returnflag"), 0.3)
        .collect()(0).getSeq[String](0).sorted.mkString(",")
      val strata = li.stat.sampleBy("l_returnflag",
        Map("A" -> 0.5, "N" -> 0.1, "R" -> 0.9), 42L).count()
      Seq(("q25", q25), ("q50", q50), ("q75", q75),
        ("freq_" + freq, -1.0), ("strata_n", strata.toDouble))
        .toDF("stat", "v").orderBy($"stat")
    },
    None)

  /** unionByName with missing columns filled as nulls. */
  val qUnionByName: QueryDef = QueryDef(
    "q108_union_by_name",
    (s, d) => {
      import s.implicits._
      val a = t(s, d, "customer").select($"c_nationkey".as("k"), $"c_acctbal".as("bal"))
      val b = t(s, d, "supplier").select($"s_acctbal".as("bal"), $"s_nationkey".as("k"))
      a.unionByName(b)
        .groupBy($"k").agg(count(lit(1)).as("n"), dsum($"bal").as("total_bal"))
        .orderBy($"k")
    },
    Some(s"""
      SELECT k, COUNT(*) AS n, ${dsumSql("bal")} AS total_bal
      FROM (SELECT c_nationkey AS k, c_acctbal AS bal FROM customer
            UNION ALL SELECT s_nationkey, s_acctbal FROM supplier)
      GROUP BY k ORDER BY k"""))

  /** Additional registry names: levenshtein, base64, chr, strpos-family,
    * split_part-style extraction, left/right semantics via substring. */
  val qStringExtras: QueryDef = QueryDef(
    "q109_string_extras",
    (s, d) => {
      import s.implicits._
      t(s, d, "region")
        .select($"r_regionkey",
          levenshtein($"r_name", lit("EUROPE")).as("lev"),
          base64($"r_name".cast(BinaryType)).as("b64"),
          chr($"r_regionkey" + 65).as("ch"),
          substring($"r_name", 1, 3).as("l3"),
          expr("right(r_name, 3)").as("r3"),
          locate("A", $"r_name").as("pos_a"))
        .orderBy($"r_regionkey")
    },
    Some("""
      SELECT r_regionkey,
        levenshtein(r_name, 'EUROPE') AS lev,
        to_base64(encode(r_name)) AS b64,
        chr(CAST(r_regionkey + 65 AS INT)) AS ch,
        left(r_name, 3) AS l3, right(r_name, 3) AS r3,
        strpos(r_name, 'A') AS pos_a
      FROM region ORDER BY r_regionkey"""))

  /** Additional datetime names: add_months, months_between, next_day,
    * trunc, from_unixtime round-trip. */
  val qDateExtras: QueryDef = QueryDef(
    "q110_date_extras",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders").filter($"o_orderkey" < 30)
        .select($"o_orderkey",
          add_months($"o_orderdate", 2).as("plus2m"),
          ((lit(2000) - year($"o_orderdate")) * 12 - (month($"o_orderdate") - 1))
            .as("months_to_2000"),
          trunc($"o_orderdate", "year").as("year_start"),
          from_unixtime(unix_timestamp($"o_orderdate")).cast(TimestampType).as("rt"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        (2000 - year(o_orderdate)) * 12 - (month(o_orderdate) - 1) AS months_to_2000,
        CAST(date_trunc('year', o_orderdate) AS DATE) AS year_start,
        o_orderdate AS rt
      FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey"""))

  /** collect_list / collect_set (reference `collect.scala:137`) — sorted
    * for determinism; bounded group sizes only (these buffer in memory).
    * Lists are serialized to a joined string because the driver's
    * comparator cannot sort rows containing raw array cells. */
  val qCollectAggs: QueryDef = QueryDef(
    "q114_collect_aggs",
    (s, d) => {
      import s.implicits._
      t(s, d, "nation")
        .join(broadcast(t(s, d, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(
          array_join(sort_array(collect_list($"n_name")), ",").as("nations"),
          array_join(transform(sort_array(collect_set($"n_regionkey")),
            _.cast("string")), ",").as("region_keys"))
        .orderBy($"r_name")
    },
    Some("""
      SELECT r_name,
        array_to_string(list_sort(list(n_name)), ',') AS nations,
        array_to_string(list_sort(list(DISTINCT n_regionkey)), ',') AS region_keys
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))

  /** NATURAL JOIN resolution (reference `ResolveNaturalAndUsingJoin`). */
  val qNaturalJoin: QueryDef = QueryDef(
    "q115_natural_join",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT r_name, COUNT(*) AS n FROM
          (SELECT n_regionkey AS rk, n_name FROM nation) NATURAL JOIN
          (SELECT r_regionkey AS rk, r_name FROM region)
        GROUP BY r_name ORDER BY r_name""")
    },
    Some("""
      SELECT r_name, COUNT(*) AS n FROM
        (SELECT n_regionkey AS rk, n_name FROM nation) NATURAL JOIN
        (SELECT r_regionkey AS rk, r_name FROM region)
      GROUP BY r_name ORDER BY r_name"""))

  /** max_by / min_by (argmax aggregates). Ties on c_acctbal are broken by
    * c_name via a composite (balance, name) ordering key on BOTH engines —
    * bare max_by tie-breaking is nondeterministic in Spark and unspecified
    * in DuckDB, a latent oracle flake if balances ever collide. Both sides
    * also filter NULL ordering keys explicitly: Spark's max_by silently
    * ignores rows whose ordering key is NULL while row_number ranks them
    * (NULLS FIRST/LAST), so the two formulations are only equivalent under
    * a non-null key — enforce it rather than assume it. */
  val qArgMax: QueryDef = QueryDef(
    "q116_argmax",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer").filter($"c_acctbal".isNotNull)
        .groupBy($"c_mktsegment")
        .agg(max_by($"c_name", struct($"c_acctbal", $"c_name")).as("richest"),
          min_by($"c_name", struct($"c_acctbal", $"c_name")).as("poorest"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      WITH ranked AS (
        SELECT c_mktsegment, c_name,
          row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal DESC, c_name DESC) AS rmax,
          row_number() OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal ASC, c_name ASC) AS rmin
        FROM customer WHERE c_acctbal IS NOT NULL)
      SELECT c_mktsegment,
        MAX(CASE WHEN rmax = 1 THEN c_name END) AS richest,
        MAX(CASE WHEN rmin = 1 THEN c_name END) AS poorest
      FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  override def defs: Seq[QueryDef] = Seq(
    qCache, qJoinHint, qBucketedJoin, qIntersectAll, qExceptAll,
    qRddPrimitives, qSample, qStatHelpers, qUnionByName, qStringExtras,
    qDateExtras, qCollectAggs, qNaturalJoin, qArgMax)
}
