package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.Exact._

/** Training-data-pipeline building blocks beyond dedup/similarity:
  * per-group embedding centroids (the "update" half of k-means / IVF
  * coarse quantizer training) and deterministic content-hash dataset
  * splits (train/valid/test assignment that is stable across engines,
  * runs, and cluster sizes — unlike `sample()`/`randomSplit()`, whose
  * partition-seeded RNG can't be reproduced outside Spark, cf.
  * q106_sample_split's rows-only check).
  */
object PipelineExtras extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Element-wise mean vector per label over the embeddings table,
    * emitted long-form as one `(label, pos, mu, n_vecs)` row per
    * dimension (scalar columns only — array-valued result columns break
    * engine-portable comparison, and downstream consumers regroup with
    * `collect_list(struct(pos, mu))` when they need the dense vector).
    * Shape: posexplode → (label, pos) hash-agg (exact decimal sums).
    * One shuffle on small keys; the wide vectors are never carried
    * through an aggregation buffer, so this scales to arbitrary corpus
    * size (state = labels × dims, not rows). The float→double cast
    * happens before summation in both engines. */
  val qVectorCentroid: QueryDef = QueryDef(
    "q144_vector_centroid",
    (s, d) => {
      import s.implicits._
      t(s, d, "embeddings")
        .select($"label", posexplode($"embedding"))
        .select($"label", ($"pos" + 1).as("pos"), $"col".cast("double").as("e"))
        .groupBy($"label", $"pos")
        .agg((dsum($"e", 9) / count(lit(1))).as("mu"),
          count(lit(1)).as("n_vecs"))
        .orderBy($"label", $"pos")
    },
    Some("""
      WITH ex AS (SELECT label, s.pos, CAST(embedding[s.pos] AS DOUBLE) AS e
                  FROM embeddings,
                       UNNEST(generate_series(1, len(embedding))) AS s(pos))
      SELECT label, CAST(pos AS INTEGER) AS pos,
             CAST(SUM(CAST(e AS DECIMAL(18,9))) AS DOUBLE)/COUNT(*) AS mu,
             CAST(COUNT(*) AS BIGINT) AS n_vecs
      FROM ex GROUP BY label, pos ORDER BY label, pos"""))

  /** Deterministic train/valid/test split by md5 of the row key: the
    * first hex nibble buckets 10/3/3 of 16. Pure map-side (no shuffle, no
    * RNG state), identical assignment on any engine that has md5 — the
    * portable way to split 100 TB reproducibly. */
  val qHashSplit: QueryDef = QueryDef(
    "q145_hash_split",
    (s, d) => {
      import s.implicits._
      val nib = substring(md5($"o_orderkey".cast("string")), 1, 1)
      t(s, d, "orders")
        .withColumn("split",
          when(nib < "a", "train").when(nib < "d", "valid").otherwise("test"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("volume"))
        .orderBy($"split")
    },
    Some(s"""
      SELECT CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < 'a'
                    THEN 'train'
                  WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < 'd'
                    THEN 'valid'
                  ELSE 'test' END AS split,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             ${dsumSql("o_totalprice")} AS volume
      FROM orders GROUP BY 1 ORDER BY 1"""))

  override def defs: Seq[QueryDef] = Seq(qVectorCentroid, qHashSplit)
}
