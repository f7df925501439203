package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-V2 `FunctionCatalog` (SURVEY §2.10): SQL-resolvable engine
  * functions loaded through a catalog plugin instead of the session
  * registry — the modern, catalog-scoped descendant of the reference's
  * `FunctionRegistry` + `SessionCatalog.lookupFunction` seam (reference
  * `sql/catalyst/.../analysis/FunctionRegistry.scala`,
  * `catalog/SessionCatalog.scala:986-1045`), and the V2 complement to the
  * Hive permanent-function bridge (HiveCatalogRoundTrip).
  *
  * Two functions a dedup engine actually wants, both on the codegen-fast
  * paths Spark reserves for V2 functions:
  *
  *  - `hamming64(a BIGINT, b BIGINT) → INT`: popcount(a XOR b), the
  *    SimHash fingerprint distance. Exposes the MAGIC_METHOD form
  *    (`invoke(long, long): int`), so the analyzer binds it as a direct
  *    `Invoke` over unboxed primitives — no InternalRow boxing per row,
  *    same discipline as our Catalyst `doGenCode` kernels
  *    (VectorExpressions.scala). `produceResult` stays as the documented
  *    interpreted fallback.
  *  - `xor64(BIGINT) → BIGINT` aggregate: order-insensitive XOR checksum
  *    (content-drift detection across corpus snapshots). Implements V2
  *    `AggregateFunction` with a real partial→merge contract, so Spark
  *    plans it as partial aggregates + a merge after the shuffle — the
  *    map-side-combine shape that holds at 100 TB.
  *
  * Registered per-session via
  * `spark.sql.catalog.<name> = graft.functions.GraftFunctionCatalog`;
  * SQL then resolves `<name>.fn.hamming64(...)` through `loadFunction`.
  */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {

  private var catalogName = "graft_fns"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private val ns = Array("fn")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(ns))
      GraftFunctionCatalog.functions.keys
        .map(n => Identifier.of(ns, n)).toArray
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace.sameElements(ns))
      GraftFunctionCatalog.functions.getOrElse(ident.name,
        throw new NoSuchFunctionException(ident))
    else throw new NoSuchFunctionException(ident)
}

object GraftFunctionCatalog {
  private[functions] val functions: Map[String, UnboundFunction] = Map(
    "hamming64" -> new Hamming64Unbound,
    "xor64" -> new Xor64Unbound)
}

/** Coverage query for the V2 function seam. XOR checksum + summed
  * hamming distances per return flag — both order-insensitive, so the
  * result is deterministic under any partitioning and DuckDB's
  * `bit_xor` / `bit_count(xor(..))` reproduce it exactly. */
object V2FunctionOps extends graft.QueryModule {
  import org.apache.spark.sql.SparkSession

  private def withCatalog(s: SparkSession): Unit =
    s.conf.set("spark.sql.catalog.graft_fns",
      classOf[GraftFunctionCatalog].getName)

  val qV2FunctionCatalog: graft.QueryDef = graft.QueryDef(
    "q221_v2_function_catalog",
    (s, d) => {
      withCatalog(s)
      graft.Tables.registerAll(s, d)
      s.sql("""SELECT l_returnflag,
                      graft_fns.fn.xor64(l_orderkey) AS key_xor,
                      CAST(SUM(graft_fns.fn.hamming64(l_orderkey, l_partkey))
                           AS BIGINT) AS hd_sum
               FROM lineitem
               GROUP BY l_returnflag
               ORDER BY l_returnflag""")
    },
    Some("""SELECT l_returnflag,
                   bit_xor(l_orderkey) AS key_xor,
                   CAST(SUM(bit_count(xor(l_orderkey, l_partkey))) AS BIGINT)
                     AS hd_sum
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag"""))

  override def defs: Seq[graft.QueryDef] = Seq(qV2FunctionCatalog)
}

/** Bind-time arity/type gate: V2 binding happens at analysis, so a
  * mis-typed call fails the query before any task launches. */
private[functions] final class Hamming64Unbound extends UnboundFunction {
  override def name(): String = "hamming64"
  override def description(): String =
    "hamming64(a BIGINT, b BIGINT): popcount(a XOR b) — SimHash distance"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields.forall(_.dataType == LongType),
      s"hamming64 expects (BIGINT, BIGINT), got ${inputType.catalogString}")
    new Hamming64
  }
}

private[functions] final class Hamming64 extends ScalarFunction[Integer] {
  override def name(): String = "hamming64"
  override def canonicalName(): String = "graft.fn.hamming64"
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = IntegerType
  // Inputs may be nullable columns (parquet longs usually are): a NULL
  // argument yields NULL through the analyzer's null-safe Invoke wrapper,
  // so the result contract must be nullable too — declaring false here
  // would let downstream codegen elide null checks over a value that can
  // in fact be null.
  override def isResultNullable: Boolean = true

  /** MAGIC_METHOD_NAME path: resolved reflectively by the analyzer and
    * bound as `Invoke` over primitive longs (no row boxing). */
  def invoke(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Interpreted fallback (the API contract when no magic method binds). */
  override def produceResult(input: InternalRow): Integer =
    invoke(input.getLong(0), input.getLong(1))
}

private[functions] final class Xor64Unbound extends UnboundFunction {
  override def name(): String = "xor64"
  override def description(): String =
    "xor64(BIGINT) aggregate: order-insensitive XOR of the input values"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields.head.dataType == LongType,
      s"xor64 expects (BIGINT), got ${inputType.catalogString}")
    new Xor64
  }
}

/** XOR is commutative/associative with identity 0, so partial states
  * merge exactly regardless of partitioning — `merge` IS the shuffle
  * contract (Spark runs update map-side, merge after the exchange). */
private[functions] final class Xor64
    extends AggregateFunction[java.lang.Long, java.lang.Long] {
  override def name(): String = "xor64"
  override def canonicalName(): String = "graft.fn.xor64"
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false

  override def newAggregationState(): java.lang.Long = 0L
  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state else state ^ input.getLong(0)
  override def merge(s1: java.lang.Long, s2: java.lang.Long): java.lang.Long =
    s1 ^ s2
  override def produceResult(state: java.lang.Long): java.lang.Long = state
}
