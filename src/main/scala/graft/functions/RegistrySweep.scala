package graft.functions

import org.apache.spark.sql.SparkSession

import graft.{QueryDef, QueryModule}

/** Long-tail of the reference's 229-name function registry
  * (`FunctionRegistry.scala:160-420`): numeral conversion, bit twiddling,
  * formatting, soundex/sentences, xpath, stack/inline generators, map
  * constructors, partition-introspection functions. Output formats are
  * Spark-specific (e.g. `format_number` locale grouping) → rows-only
  * check here; `RegistrySweepSpec` pins exact values in-JVM.
  */
object RegistrySweep extends QueryModule {

  val sweepSql: String = """
    SELECT
      conv('100', 2, 10)                       AS conv_b2_b10,
      hex(255)                                 AS hex255,
      unhex('4D')                              AS unhex4d,
      bin(5)                                   AS bin5,
      factorial(5)                             AS fact5,
      soundex('spark')                         AS sdx,
      format_number(1234567.891, 2)            AS fmt,
      bround(CAST(2.5 AS DOUBLE), 0)                           AS br_half_even,
      round(CAST(2.5 AS DOUBLE), 0)                            AS r_half_up,
      hypot(3.0, 4.0)                          AS hyp,
      degrees(pi())                            AS deg_pi,
      bit_count(7)                             AS bits7,
      CAST(sentences('Spark runs fast. It scales.') AS STRING) AS sent,
      xpath_string('<a><b>x</b></a>', 'a/b')   AS xp,
      CAST(map_keys(map('k1', 1, 'k2', 2)) AS STRING)   AS mkeys,
      CAST(map_values(map('k1', 1, 'k2', 2)) AS STRING) AS mvals,
      CAST(str_to_map('a:1,b:2', ',', ':') AS STRING)   AS s2m,
      CAST(named_struct('x', 1, 'y', 'z') AS STRING)    AS ns,
      CAST(array_repeat('ab', 3) AS STRING)             AS arep,
      CAST(flatten(array(array(1, 2), array(3))) AS STRING)    AS flat,
      CAST(arrays_zip(array(1, 2), array('a', 'b')) AS STRING) AS azip,
      crc32('spark')                           AS crc,
      xxhash64('spark')                        AS xxh,
      hash('spark')                            AS mh3,
      spark_partition_id()                     AS pid,
      typeof(1.5)                              AS ty
  """

  val qSweep: QueryDef = QueryDef(
    "q111_registry_sweep",
    (s, _) => s.sql(sweepSql),
    None)

  /** stack/inline generators (reference `generators.scala:112,276`). */
  val qStack: QueryDef = QueryDef(
    "q113_stack_inline",
    (s, _) => s.sql("""
      SELECT k, v FROM (SELECT stack(3, 'a', 1, 'b', 2, 'c', 3) AS (k, v))
      UNION ALL
      SELECT col.k, col.v FROM (
        SELECT explode(array(named_struct('k', 'd', 'v', 4))) AS col)
      ORDER BY k"""),
    Some("""
      SELECT k, v FROM (VALUES ('a', 1), ('b', 2), ('c', 3), ('d', 4)) t(k, v)
      ORDER BY k"""))

  /** Second long-tail pass, DuckDB-expressible this time: string
    * formatting/picking (`substring_index`, `initcap`, `format_string`,
    * `elt`), `json_tuple` (the multi-field JSON generator,
    * `jsonExpressions.scala:341`), and `nanvl`. Runs over customer so
    * the functions execute per-row through codegen, not constant-folded. */
  val qSweep2: QueryDef = QueryDef(
    "q171_registry_sweep2",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""
        SELECT c_custkey,
          substring_index(c_name, '#', 1)                   AS name_head,
          initcap(lower(c_mktsegment))                      AS seg_cap,
          format_string('%s|%05d', c_mktsegment, c_custkey) AS tagged,
          elt(2, c_mktsegment, c_name)                      AS second_arg,
          nanvl(CAST('NaN' AS DOUBLE), c_acctbal)           AS no_nan,
          jt.seg                                            AS json_seg
        FROM (SELECT *, to_json(named_struct('seg', c_mktsegment, 'k', c_custkey)) AS j
              FROM customer) c
        LATERAL VIEW json_tuple(c.j, 'seg') jt AS seg
        WHERE c_custkey <= 200
        ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey,
        string_split(c_name, '#')[1] AS name_head,
        upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
          AS seg_cap,
        printf('%s|%05d', c_mktsegment, c_custkey) AS tagged,
        c_name AS second_arg,
        c_acctbal AS no_nan,
        c_mktsegment AS json_seg
      FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey"""))

  /** Partition-introspection trio reduced to engine-independent
    * invariants so it still oracle-checks exactly: distinct
    * `monotonically_increasing_id` count equals the row count (ids are
    * unique across partitions by construction —
    * `MonotonicallyIncreasingID.scala`), every row's `input_file_name`
    * points at the scanned parquet file (`InputFileName.scala`), and
    * `reflect` calls a JVM static (`CallMethodViaReflection`,
    * `misc.scala`). */
  val qSweep3: QueryDef = QueryDef(
    "q172_partition_introspection",
    (s, d) => {
      graft.Tables.registerAll(s, d)
      s.sql("""
        SELECT
          COUNT(DISTINCT mid)                           AS n_ids,
          CAST(SUM(CASE WHEN fn LIKE '%lineitem%' THEN 1
                        ELSE 0 END) AS BIGINT)          AS n_from_file,
          MAX(refl)                                     AS refl_abs
        FROM (SELECT monotonically_increasing_id()      AS mid,
                     input_file_name()                  AS fn,
                     reflect('java.lang.Math', 'abs', -7) AS refl
              FROM lineitem)""")
    },
    Some("""
      SELECT COUNT(*) AS n_ids, CAST(COUNT(*) AS BIGINT) AS n_from_file,
             '7' AS refl_abs
      FROM lineitem"""))

  override def defs: Seq[QueryDef] = Seq(qSweep, qStack, qSweep2, qSweep3)
}
