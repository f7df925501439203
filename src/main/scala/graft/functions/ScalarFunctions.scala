package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}

/** Scalar-function registry coverage (SURVEY.md §2.8 — the reference's
  * 229-name `FunctionRegistry`): string, regex, datetime, math, bitwise,
  * conditional/null, JSON, hash, collection, struct/map categories, each
  * exercised through `org.apache.spark.sql.functions._` (codegen'd; no
  * UDFs in these paths) and checked value-exact against DuckDB.
  *
  * Dialect-divergent names (instr↔strpos, date_format↔strftime …) keep the
  * same output aliases so the driver's by-name column compare holds.
  */
object ScalarFunctions extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  val qString: QueryDef = QueryDef(
    "q50_string_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "customer").filter($"c_custkey" < 25)
        .select(
          $"c_custkey",
          upper($"c_mktsegment").as("up"),
          lower($"c_name").as("lo"),
          length($"c_name").as("len"),
          substring($"c_name", 10, 5).as("sub"),
          concat_ws("|", $"c_mktsegment", $"c_custkey".cast(StringType)).as("cws"),
          lpad($"c_mktsegment", 12, "*").as("pad"),
          reverse($"c_name").as("rev"),
          regexp_replace($"c_name", "Customer#", "C").as("repl"),
          instr($"c_name", "#").as("pos"),
          element_at(split($"c_name", "#"), 2).as("id_part"),
          translate($"c_mktsegment", "AEIOU", "aeiou").as("tr"),
          repeat(substring($"c_mktsegment", 1, 2), 3).as("rep"),
          trim(lit("  x  ")).as("trm"))
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey,
        upper(c_mktsegment) AS up, lower(c_name) AS lo,
        length(c_name) AS len, substring(c_name, 10, 5) AS sub,
        concat_ws('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS cws,
        lpad(c_mktsegment, 12, '*') AS pad, reverse(c_name) AS rev,
        regexp_replace(c_name, 'Customer#', 'C') AS repl,
        instr(c_name, '#') AS pos,
        string_split(c_name, '#')[2] AS id_part,
        translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
        repeat(substring(c_mktsegment, 1, 2), 3) AS rep,
        trim('  x  ') AS trm
      FROM customer WHERE c_custkey < 25 ORDER BY c_custkey"""))

  val qRegex: QueryDef = QueryDef(
    "q51_regex_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "part").filter($"p_partkey" < 60)
        .select(
          $"p_partkey",
          regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
          regexp_replace($"p_name", "[aeiou]", "_").as("devowel"),
          $"p_name".rlike("^(red|blue)").cast(IntegerType).as("is_colored"),
          $"p_name".like("%bolt%").cast(IntegerType).as("is_bolt"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
        regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        CAST(regexp_matches(p_name, '^(red|blue)') AS INT) AS is_colored,
        CAST(p_name LIKE '%bolt%' AS INT) AS is_bolt
      FROM part WHERE p_partkey < 60 ORDER BY p_partkey"""))

  val qDate: QueryDef = QueryDef(
    "q52_date_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders").filter($"o_orderkey" < 40)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("yr"),
          quarter($"o_orderdate").as("qtr"),
          month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("dy"),
          date_trunc("month", $"o_orderdate").as("mon_start"),
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("plus30"),
          datediff(lit("1999-01-01").cast(DateType), $"o_orderdate").as("days_to_1999"),
          unix_timestamp($"o_orderdate").as("epoch_s"),
          date_format($"o_orderdate", "yyyy-MM").as("ym"),
          last_day($"o_orderdate").as("ld"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
        month(o_orderdate) AS mo, day(o_orderdate) AS dy,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        o_orderdate + INTERVAL 30 DAY AS plus30,
        datediff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS days_to_1999,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        strftime(o_orderdate, '%Y-%m') AS ym,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS ld
      FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey"""))

  val qMath: QueryDef = QueryDef(
    "q53_math_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "part").filter($"p_partkey" < 60)
        .select(
          $"p_partkey",
          abs($"p_size" - 25).as("ab"),
          ceil($"p_retailprice").as("cl"),
          floor($"p_retailprice").as("fl"),
          round(sqrt($"p_retailprice"), 4).as("sq"),
          round(log($"p_retailprice"), 4).as("lg"),
          round(log10($"p_retailprice"), 4).as("l10"),
          round(exp($"p_size" / 20.0), 4).as("ex"),
          ($"p_size" * $"p_size").as("pw"),
          ($"p_size" % 7).as("md"),
          ((($"p_size" - 30) % 7 + 7) % 7).as("pm"),
          signum($"p_size" - 25).cast(IntegerType).as("sg"),
          ($"p_size".bitwiseAND(12)).as("ba"),
          ($"p_size".bitwiseOR(3)).as("bo"),
          ($"p_size".bitwiseXOR(5)).as("bx"),
          shiftleft($"p_size", 2).as("shl"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
        abs(p_size - 25) AS ab,
        CAST(ceil(p_retailprice) AS BIGINT) AS cl,
        CAST(floor(p_retailprice) AS BIGINT) AS fl,
        round(sqrt(p_retailprice), 4) AS sq,
        round(ln(p_retailprice), 4) AS lg,
        round(log10(p_retailprice), 4) AS l10,
        round(exp(p_size / 20.0), 4) AS ex,
        p_size * p_size AS pw, p_size % 7 AS md,
        ((p_size - 30) % 7 + 7) % 7 AS pm,
        CAST(sign(p_size - 25) AS INT) AS sg,
        p_size & 12 AS ba, p_size | 3 AS bo, xor(p_size, 5) AS bx,
        p_size << 2 AS shl
      FROM part WHERE p_partkey < 60 ORDER BY p_partkey"""))

  val qConditional: QueryDef = QueryDef(
    "q54_conditional_funcs",
    (s, d) => {
      import s.implicits._
      val bucket = when($"o_totalprice" < 100000.0, "small")
        .when($"o_totalprice" < 300000.0, "medium")
        .otherwise("large")
      t(s, d, "orders")
        .select(
          bucket.as("bucket"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status2"),
          greatest($"o_totalprice", lit(150000.0)).as("gl"),
          least($"o_totalprice", lit(150000.0)).as("ll"))
        .groupBy($"bucket", $"status2")
        .agg(count(lit(1)).as("n"),
          Exact.dsum($"gl").as("sum_gl"),
          Exact.dsum($"ll").as("sum_ll"))
        .orderBy($"bucket", $"status2")
    },
    Some(s"""
      SELECT CASE WHEN o_totalprice < 100000.0 THEN 'small'
                  WHEN o_totalprice < 300000.0 THEN 'medium'
                  ELSE 'large' END AS bucket,
             COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
             COUNT(*) AS n,
             ${Exact.dsumSql("greatest(o_totalprice, 150000.0)")} AS sum_gl,
             ${Exact.dsumSql("least(o_totalprice, 150000.0)")} AS sum_ll
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** get_json_object + from_json over the events props column (reference
    * `jsonExpressions.scala:119,486`). */
  val qJson: QueryDef = QueryDef(
    "q55_json_funcs",
    (s, d) => {
      import s.implicits._
      val k = get_json_object($"props", "$.k").cast(LongType)
      t(s, d, "events")
        .groupBy($"event_type")
        .agg(sum(k).as("sum_k"), max(k).as("max_k"), count(lit(1)).as("n"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val qJsonStruct: QueryDef = QueryDef(
    "q56_from_json_struct",
    (s, d) => {
      import s.implicits._
      t(s, d, "events").filter($"event_id" < 30)
        .select(
          $"event_id",
          from_json($"props", StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"),
          to_json(struct(($"event_id" * 2).as("e2"))).as("j"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        to_json(struct_pack(e2 := event_id * 2)) AS j
      FROM events WHERE event_id < 30 ORDER BY event_id"""))

  /** Cryptographic hashes are engine-independent (md5/sha2 per RFC);
    * murmur3 `hash`/`xxhash64` are Spark-specific → kept out of oracle. */
  val qHash: QueryDef = QueryDef(
    "q57_hash_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents").filter($"doc_id" < 40)
        .select($"doc_id", md5($"text").as("m"), sha2($"text", 256).as("s"))
        .orderBy($"doc_id")
    },
    Some("""
      SELECT doc_id, md5(text) AS m, sha256(text) AS s
      FROM documents WHERE doc_id < 40 ORDER BY doc_id"""))

  val qCollection: QueryDef = QueryDef(
    "q58_collection_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "embeddings").filter($"vec_id" < 30)
        .select(
          $"vec_id",
          size($"embedding").as("dim"),
          round(element_at($"embedding", 1).cast(DoubleType), 6).as("e1"),
          round(array_max($"embedding").cast(DoubleType), 6).as("mx"),
          round(array_min($"embedding").cast(DoubleType), 6).as("mn"),
          // slice exercised via scalar extraction — the driver's comparator
          // cannot sort rows holding raw array cells.
          round(element_at(slice($"embedding", 1, 3), 2).cast(DoubleType), 6)
            .as("s2"),
          round(element_at(slice($"embedding", 1, 3), 3).cast(DoubleType), 6)
            .as("s3"))
        .orderBy($"vec_id")
    },
    Some("""
      SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
        round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
        round(CAST(embedding[1:3][2] AS DOUBLE), 6) AS s2,
        round(CAST(embedding[1:3][3] AS DOUBLE), 6) AS s3
      FROM embeddings WHERE vec_id < 30 ORDER BY vec_id"""))

  /** Higher-order array functions (Spark 2.4+/4 lambda functions —
    * a superset of the reference's collection ops): transform, filter,
    * exists, forall, aggregate/reduce, zip_with over integer arrays so
    * every value is exact in both engines. */
  val qHigherOrder: QueryDef = QueryDef(
    "q136_higher_order_funcs",
    (s, d) => {
      import s.implicits._
      val arr = sequence(lit(1), $"p_size")
      t(s, d, "part").filter($"p_partkey" < 40)
        .select(
          $"p_partkey",
          aggregate(arr, lit(0), (acc, x) => acc + x).as("tri_sum"),
          size(filter(arr, x => x % 3 === 0)).as("n_div3"),
          exists(arr, x => x > 45).cast(IntegerType).as("has_gt45"),
          forall(arr, x => x < 60).cast(IntegerType).as("all_lt60"),
          aggregate(zip_with(arr, arr, (a, b) => a * b), lit(0L),
            (acc, x) => acc + x).as("sum_sq"),
          element_at(transform(arr, x => x * 2), 1).as("first_doubled"))
        .orderBy($"p_partkey")
    },
    Some("""
      SELECT p_partkey,
        CAST(list_sum(r) AS INT) AS tri_sum,
        CAST(len(list_filter(r, x -> x % 3 = 0)) AS INT) AS n_div3,
        CAST(list_has_any(r, range(46, 1000)) AS INT) AS has_gt45,
        CAST(NOT list_has_any(r, range(60, 1000)) AS INT) AS all_lt60,
        CAST(list_sum(list_transform(r, x -> CAST(x AS BIGINT) * x)) AS BIGINT) AS sum_sq,
        list_transform(r, x -> x * 2)[1] AS first_doubled
      FROM (SELECT p_partkey, range(1, p_size + 1) AS r FROM part
            WHERE p_partkey < 40)
      ORDER BY p_partkey"""))

  /** Timezone conversions (reference `datetimeExpressions.scala`
    * to_utc_timestamp/from_utc_timestamp) — session stays UTC; the
    * functions reinterpret wall times across zones. */
  val qTimezone: QueryDef = QueryDef(
    "q138_tz_funcs",
    (s, d) => {
      import s.implicits._
      t(s, d, "orders").filter($"o_orderkey" < 30)
        .select($"o_orderkey",
          to_utc_timestamp($"o_orderdate", "America/New_York").as("ny_to_utc"),
          from_utc_timestamp($"o_orderdate", "Asia/Tokyo").as("utc_to_tokyo"))
        .orderBy($"o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
        CAST(timezone('UTC', timezone('America/New_York', o_orderdate)) AS TIMESTAMP)
          AS ny_to_utc,
        CAST(timezone('Asia/Tokyo', timezone('UTC', o_orderdate)) AS TIMESTAMP)
          AS utc_to_tokyo
      FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey"""))

  /** Higher-order MAP functions (the map siblings of q136's array HOFs):
    * a per-status map of priority→count built with map_from_entries,
    * rewritten with transform_values, differenced with map_zip_with,
    * pruned with map_filter, then exploded back to rows — so the
    * map-typed intermediates (which DuckDB's comparer cannot hash) leave
    * the query as plain sorted rows the oracle reproduces relationally.
    * Map columns never shuffle here: everything after the first groupBy
    * is map-side expression work. */
  val qMapFunctions: QueryDef = QueryDef(
    "q200_map_functions",
    (s, d) => {
      import s.implicits._
      val perPrio = t(s, d, "orders")
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val m = perPrio.groupBy($"o_orderstatus")
        .agg(map_from_entries(
          collect_list(struct($"o_orderpriority", $"n"))).as("m1"))
        .withColumn("m2", transform_values($"m1", (_, v) => v * lit(2L)))
        .withColumn("mdiff", map_zip_with($"m2", $"m1", (_, a, b) => a - b))
      m.select($"o_orderstatus", $"mdiff", size($"m1").as("n_prios"),
          explode(map_filter($"m2", (_, v) => v >= lit(20L))))
        .select($"o_orderstatus", $"key".as("prio"), $"value".as("n2"),
          element_at($"mdiff", $"key").as("n"), $"n_prios")
        .orderBy($"o_orderstatus", $"prio")
    },
    Some("""
      WITH pn AS (SELECT o_orderstatus, o_orderpriority AS prio, COUNT(*) AS n
                  FROM orders GROUP BY 1, 2),
      tot AS (SELECT o_orderstatus, CAST(COUNT(*) AS INTEGER) AS n_prios
              FROM pn GROUP BY 1)
      SELECT pn.o_orderstatus, prio, CAST(n * 2 AS BIGINT) AS n2,
             CAST(n AS BIGINT) AS n, n_prios
      FROM pn JOIN tot USING (o_orderstatus)
      WHERE n * 2 >= 20
      ORDER BY o_orderstatus, prio"""))

  override def defs: Seq[QueryDef] = Seq(
    qString, qRegex, qDate, qMath, qConditional, qJson, qJsonStruct,
    qHash, qCollection, qHigherOrder, qTimezone, qMapFunctions)
}
