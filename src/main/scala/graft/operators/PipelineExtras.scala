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
      // double→decimal goes THROUGH A STRING in both engines: Spark's
      // direct cast rounds the shortest round-trip representation while
      // DuckDB's rounds the exact binary expansion, and on a boundary
      // element (seen at sf0.1, ~1 in 10⁶) the two disagree by 1 ulp of
      // the target scale. The shortest representation of a given double
      // is unique, so string→decimal rounds identically everywhere.
      val eDec = $"col".cast("double").cast("string").cast("decimal(18,12)")
      t(s, d, "embeddings")
        .select($"label", posexplode($"embedding"))
        .select($"label", ($"pos" + 1).as("pos"), eDec.as("e"))
        .groupBy($"label", $"pos")
        .agg((sum($"e").cast("double") / count(lit(1))).as("mu"),
          count(lit(1)).as("n_vecs"))
        .orderBy($"label", $"pos")
    },
    Some("""
      WITH ex AS (SELECT label, s.pos,
                    CAST(CAST(CAST(embedding[s.pos] AS DOUBLE) AS VARCHAR)
                      AS DECIMAL(18,12)) AS e
                  FROM embeddings,
                       UNNEST(generate_series(1, len(embedding))) AS s(pos))
      SELECT label, CAST(pos AS INTEGER) AS pos,
             CAST(SUM(e) AS DOUBLE)/COUNT(*) AS mu,
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

  /** Deterministic weighted corpus mixing: per-language keep rates
    * applied via an md5-nibble of the row key (en 16/16, de 8/16,
    * fr/es 4/16, zh 2/16) — the "mix web:books:code at 5:2:1" step of a
    * training-data recipe, with zero RNG state. Pure map-side filter; the
    * same rows are kept on any engine, any cluster size, any run (what
    * `sample()` cannot promise — cf. q106's rows-only check). */
  val qCorpusMix: QueryDef = QueryDef(
    "q168_corpus_mix",
    (s, d) => {
      import s.implicits._
      val nib = substring(md5($"doc_id".cast("string")), 1, 1)
      val keep = when($"lang" === "en", lit(true))
        .when($"lang" === "de", nib < "8")
        .when($"lang" === "fr" || $"lang" === "es", nib < "4")
        .otherwise(nib < "2")
      t(s, d, "documents").filter(keep)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split($"text", " "))).cast("long").as("tokens"))
        .orderBy($"lang")
    },
    Some("""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents
      WHERE CASE WHEN lang = 'en' THEN TRUE
                 WHEN lang = 'de'
                   THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
                 WHEN lang IN ('fr', 'es')
                   THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                 ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2' END
      GROUP BY lang ORDER BY lang"""))

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences (512 tokens) by running token count, keyed per language —
    * the batching step before tokenized examples hit a trainer. The
    * running sum is one window pass over (lang, doc_id) order; at 100 TB
    * the partition key IS the pack shard (per-lang here; per
    * (shard, lang) in production — same code with one more key), so no
    * global sort ever happens. */
  val qSequencePack: QueryDef = QueryDef(
    "q169_sequence_pack",
    (s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      t(s, d, "documents")
        .select($"doc_id", $"lang", size(split($"text", " ")).as("tok"))
        .withColumn("prior", coalesce(sum($"tok").over(w), lit(0)))
        .withColumn("seq_id", expr("prior div 512"))
        .groupBy($"lang", $"seq_id")
        .agg(count(lit(1)).as("n_docs"), sum($"tok").cast("long").as("seq_tokens"))
        .orderBy($"lang", $"seq_id")
    },
    Some("""
      WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS tok
                 FROM documents),
      p AS (SELECT lang, tok,
              COALESCE(SUM(tok) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
            FROM d)
      SELECT lang, CAST(prior // 512 AS BIGINT) AS seq_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS seq_tokens
      FROM p GROUP BY lang, seq_id ORDER BY lang, seq_id"""))

  /** Context-window chunking: overlapping 50-token windows at stride 40
    * (10-token overlap) — the long-document split for embedding/context
    * pipelines. Chunks are emitted map-side (transform + posexplode over
    * the token array); chunk content is verified by md5 so the oracle
    * hash-checks every chunk's exact text without shipping it. */
  val qDocChunking: QueryDef = QueryDef(
    "q170_doc_chunking",
    (s, d) => {
      import s.implicits._
      val words = split($"text", " ")
      val stride = 40
      val win = 50
      t(s, d, "documents")
        .select($"doc_id", posexplode(transform(
          sequence(lit(0), ((size(words) - 1) / stride).cast("int")),
          i => slice(words, i * stride + 1, lit(win)))))
        .select($"doc_id", $"pos".cast("int").as("chunk_id"),
          size($"col").cast("long").as("chunk_tokens"),
          md5(concat_ws(" ", $"col")).as("chunk_md5"))
        .orderBy($"doc_id", $"chunk_id")
    },
    Some("""
      SELECT doc_id, CAST(g.i AS INT) AS chunk_id,
             CAST(len(w[g.i*40+1 : g.i*40+50]) AS BIGINT) AS chunk_tokens,
             md5(array_to_string(w[g.i*40+1 : g.i*40+50], ' ')) AS chunk_md5
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(generate_series(0, (len(w)-1)//40)) AS g(i)
      ORDER BY doc_id, chunk_id"""))

  /** Symmetric int8 embedding quantization (the storage/ANN-recall trade
    * every 10¹⁰-vector corpus makes): per-vector scale = max|x|/127,
    * q_i = round(x_i/scale). Emitted as per-vector scalars (dims, scale,
    * integer checksum of the codes, max reconstruction error) so the
    * whole codebook is hash-verified without array columns. Pure
    * map-side — quantization adds no shuffle at any scale. */
  val qQuantize: QueryDef = QueryDef(
    "q179_embedding_quantize",
    (s, d) => {
      import s.implicits._
      val x = $"embedding"
      val absmax = array_max(transform(x, v => abs(v.cast("double"))))
      val scale = absmax / 127.0
      val q = transform(x, v => round(v.cast("double") / scale).cast("int"))
      val err = array_max(zip_with(x, q,
        (v, c) => abs(v.cast("double") - c * scale)))
      t(s, d, "embeddings").filter($"vec_id" < 200)
        .select($"vec_id", size(x).as("dims"),
          round(scale, 9).as("scale"),
          aggregate(q, lit(0L), (acc, c) => acc + c).as("code_sum"),
          round(err, 9).as("max_err"))
        .orderBy($"vec_id")
    },
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
                 FROM embeddings WHERE vec_id < 200),
      s AS (SELECT vec_id, x,
              list_max(list_transform(x, v -> abs(v))) / 127.0 AS scale
            FROM e),
      q AS (SELECT vec_id, x, scale,
              list_transform(x, v -> CAST(round(v / scale) AS INT)) AS c
            FROM s)
      SELECT vec_id, CAST(len(x) AS INT) AS dims,
             round(scale, 9) AS scale,
             CAST(list_sum(c) AS BIGINT) AS code_sum,
             round(list_max(list_transform(list_zip(x, c),
               p -> abs(p[1] - p[2] * scale))), 9) AS max_err -- unnamed-struct numeric index
      FROM q ORDER BY vec_id"""))

  /** Deterministic per-epoch corpus reshuffle: training runs want a
    * DIFFERENT global document order every epoch, reproducible across
    * reruns, engines, and cluster sizes — which rules out RNG shuffles
    * (partition-seeded, like `sample()`) and rules in a seeded hash
    * permutation: order by `md5(epoch || ':' || doc_id)`. The key is
    * uniform, so at 100 TB the epoch order is materialized shard-by-shard
    * with `repartitionByRange(k).sortWithinPartitions(k)` — balanced
    * range partitions, one shuffle, no global coordination
    * (EpochShuffleSpec pins balance, per-shard sortedness, and that
    * epochs decorrelate). The query form surfaces the head of each
    * epoch's permutation (window per epoch — the small-k introspection
    * shape, not the materialization path) so DuckDB replays the exact
    * permutation prefix. */
  val qEpochShuffle: QueryDef = QueryDef(
    "q223_epoch_shuffle",
    (s, d) => {
      import s.implicits._
      val epochs = s.range(0, 2).select($"id".cast("int").as("epoch"))
      val keyed = t(s, d, "documents").select($"doc_id")
        .crossJoin(broadcast(epochs))
        .withColumn("k", md5(concat($"epoch".cast("string"), lit(":"),
          $"doc_id".cast("string"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"epoch").orderBy($"k")
      keyed.withColumn("pos", row_number().over(w))
        .filter($"pos" <= 10)
        .select($"epoch", $"pos", $"doc_id")
        .orderBy($"epoch", $"pos")
    },
    Some("""
      SELECT epoch, CAST(pos AS INT) AS pos, doc_id FROM (
        SELECT epoch, doc_id,
               row_number() OVER (PARTITION BY epoch
                 ORDER BY md5(epoch || ':' || doc_id)) AS pos
        FROM documents
        CROSS JOIN (SELECT CAST(0 AS INT) AS epoch
                    UNION ALL SELECT CAST(1 AS INT)) e)
      WHERE pos <= 10
      ORDER BY epoch, pos"""))

  override def defs: Seq[QueryDef] =
    Seq(qVectorCentroid, qHashSplit, qCorpusMix, qSequencePack,
      qDocChunking, qQuantize, qEpochShuffle)
}
