package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}
import graft.functions.VectorExpressions._

/** Deduplication operators for training-data pipelines: exact,
  * fingerprint, n-gram Jaccard, MinHash+LSH, SimHash. All stages are
  * expressed as shuffles on hash keys, never all-pairs comparisons:
  *
  *   - exact / fingerprint: one hash-aggregate on the (normalized) key —
  *     at 100 TB this is the cheapest possible distributed dedup.
  *   - MinHash-LSH: signature (map-side, custom codegen'd expression) →
  *     explode to (band, bucket) keys → self-join *within buckets only*.
  *     Candidate count scales with collision rate, not n², and the band
  *     join shuffles each doc id `bands` times (a few hundred bytes/doc).
  *   - SimHash: 64-bit fingerprint, banded into 4×16-bit keys so any pair
  *     within Hamming distance 3·16 shares ≥1 band (pigeonhole); verified
  *     with a popcount expression.
  *
  * Oracle coverage: exact/fingerprint/Jaccard are SQL-expressible and
  * DuckDB-checked; LSH/SimHash outputs are deterministic (seeded hashes)
  * but not SQL-expressible → rows-only check + ScalaTest invariants.
  */
object Dedup extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Tokenized view of documents. */
  private def docWords(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    t(s, d, "documents").select($"doc_id", $"lang", $"source", $"text",
      split(lower($"text"), " ").as("words"))
  }

  val qExact: QueryDef = QueryDef(
    "q60_dedup_exact",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents").select($"lang", $"text").distinct()
        .groupBy($"lang").agg(count(lit(1)).as("n_unique"))
        .orderBy($"lang")
    },
    Some("""
      SELECT lang, COUNT(*) AS n_unique
      FROM (SELECT DISTINCT lang, text FROM documents)
      GROUP BY lang ORDER BY lang"""))

  /** Normalized-content fingerprint dedup (md5 of canonicalized text). */
  val qFingerprint: QueryDef = QueryDef(
    "q61_dedup_fingerprint",
    (s, d) => {
      import s.implicits._
      val fp = md5(regexp_replace(lower(trim($"text")), " +", " "))
      t(s, d, "documents").select($"source", fp.as("fp"))
        .groupBy($"source")
        .agg(countDistinct($"fp").as("n_unique"), count(lit(1)).as("n_docs"))
        .orderBy($"source")
    },
    Some("""
      SELECT source, COUNT(DISTINCT fp) AS n_unique, COUNT(*) AS n_docs
      FROM (SELECT source,
              md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
            FROM documents)
      GROUP BY source ORDER BY source"""))

  /** Exact 3-gram Jaccard similarity for same-lang pairs in a bounded id
    * window — the "verify" stage a MinHash pipeline feeds. All-pairs is
    * intentional here and bounded (|ids|²); the scale path is q63's LSH. */
  val qNgramJaccard: QueryDef = QueryDef(
    "q62_dedup_ngram_jaccard",
    (s, d) => {
      import s.implicits._
      val shingled = docWords(s, d).filter($"doc_id" < 40)
        .select($"doc_id", $"lang",
          array_distinct(transform(
            sequence(lit(1), size($"words") - 2),
            i => concat_ws(" ", element_at($"words", i),
              element_at($"words", i + 1), element_at($"words", i + 2))))
            .as("sh"))
      val a = shingled.select($"doc_id".as("doc_a"), $"lang", $"sh".as("sh_a"))
      val b = shingled.select($"doc_id".as("doc_b"), $"lang", $"sh".as("sh_b"))
      a.join(b, Seq("lang")).filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          round(size(array_intersect($"sh_a", $"sh_b")).cast(DoubleType) /
            size(array_union($"sh_a", $"sh_b")), 6).as("jaccard"))
        .filter($"jaccard" >= 0.03)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""
      WITH shingled AS (
        SELECT doc_id, lang,
          list_distinct(list_transform(
            generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
              FROM documents WHERE doc_id < 40))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
      FROM shingled a JOIN shingled b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.03
      ORDER BY doc_a, doc_b"""))

  // DuckDB replay of the engine's seeded hashing (q63/q64/q134 oracles):
  // deterministic modular/bit arithmetic — see graft.DuckSql for the
  // HUGEINT mixers and the int128-overflow note.
  private val duckM = graft.DuckSql.M
  private def duckMix64(tag: String, src: String, keep: String,
      in: String, out: String): String =
    graft.DuckSql.mix64(tag, src, keep, in, out)

  /** The shared CTE chain replaying `minHashCandidates(64, 16, 0.2)` in
    * DuckDB, ending at CTE `agree(doc_a, doc_b, est_jaccard)` — the q63
    * oracle selects from it directly, the q134 oracle appends the
    * recursive transitive closure. */
  private val duckMinHashChain: String = duckMinHashChainFrom("documents")

  /** The q63 replay chain over an arbitrary source relation — q261 runs
    * it over the post-takedown corpus to oracle the governed band
    * index's candidates. */
  private[graft] def duckMinHashChainFrom(src: String): String = s"""
      docs AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM $src
        WHERE len(string_split(lower(text), ' ')) >= 3),
      wh AS (
        SELECT doc_id, list_transform(ws, w ->
          list_reduce(
            list_prepend(CAST('14695981039346656037' AS HUGEINT),
              list_transform(range(1, length(w) + 1),
                ch -> CAST(ord(substr(w, ch, 1)) AS HUGEINT))),
            (h, b) -> (xor(h, b) * 1099511628211) % $duckM)) AS hs
        FROM docs),
      sh_in AS (SELECT doc_id, unnest(range(1, len(hs) - 1)) AS i, hs FROM wh),
      sh0 AS (
        SELECT doc_id, xor(CAST('14695981039346656037' AS HUGEINT), hs[i]) AS x0,
               hs[i + 1] AS w1, hs[i + 2] AS w2
        FROM sh_in),
      ${duckMix64("m1", "sh0", "doc_id, w1, w2", "x0", "y1")},
      s1 AS (SELECT doc_id, xor(y1, w1) AS x1, w2 FROM m1_out),
      ${duckMix64("m2", "s1", "doc_id, w2", "x1", "y2")},
      s2 AS (SELECT doc_id, xor(y2, w2) AS x2 FROM m2_out),
      ${duckMix64("m3", "s2", "doc_id", "x2", "shv")},
      shingles AS (SELECT DISTINCT doc_id, shv FROM m3_out),
      perm0 AS (SELECT p, CAST(42 + p AS HUGEINT) AS pin
                FROM (SELECT unnest(range(0, 64)) AS p) t),
      ${duckMix64("pm", "perm0", "p", "pin", "permv")},
      pv0 AS (SELECT sgl.doc_id, pm.p, xor(sgl.shv, pm.permv) AS vin
              FROM shingles sgl CROSS JOIN pm_out pm),
      ${duckMix64("pv", "pv0", "doc_id, p", "vin", "v")},
      sigv AS (
        SELECT doc_id, p, CAST(min(
          CASE WHEN v >= 9223372036854775808 THEN v - $duckM ELSE v END)
          AS BIGINT) AS sv
        FROM pv_out GROUP BY doc_id, p),
      sig AS (SELECT doc_id, list(sv ORDER BY p) AS sg FROM sigv GROUP BY doc_id),
      banded AS (
        SELECT doc_id, bd, array_to_string(sg[bd * 4 + 1 : bd * 4 + 4], ',') AS bkey
        FROM sig, (SELECT unnest(range(0, 16)) AS bd) bands),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b ON a.bd = b.bd AND a.bkey = b.bkey
        WHERE a.doc_id < b.doc_id),
      agree AS (
        SELECT p.doc_a, p.doc_b,
          CAST(len(list_filter(range(1, 65), ix -> sa.sg[ix] = sb.sg[ix]))
            AS DOUBLE) / 64 AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b)"""

  /** MinHash + banded LSH near-dup candidates (custom codegen'd
    * expressions; deterministic seeded hashing). 64 hashes, 16 bands of 4
    * ⇒ catches pairs above ~0.5 estimated Jaccard with high probability.
    *
    * Oracle-checked since round 10: DuckDB replays the ENTIRE pipeline —
    * FNV-1a word hashes, 3-word shingle hashes (3 chained mix64 steps),
    * 64 permutation minima under SIGNED Long order, 16×4 band slices,
    * bucket join, signature-agreement verify at ≥ 0.2. Two deliberate
    * simplifications, both no-ops on this data: the oracle buckets on
    * slice EQUALITY where Spark buckets on `hash(slice)` (differs only on
    * a Murmur3 collision between unequal slices), and the
    * maxBucketSize=10000 cap is unreachable with ≤ 10k docs. */
  val qMinHashLsh: QueryDef = QueryDef(
    "q63_dedup_minhash_lsh",
    (s, d) => {
      import s.implicits._
      graft.api.Graft.minHashCandidates(
        t(s, d, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.2)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(s"""
      WITH $duckMinHashChain
      SELECT doc_a, doc_b, est_jaccard FROM agree
      WHERE est_jaccard >= 0.2 ORDER BY doc_a, doc_b"""))

  /** SimHash near-dup: 64-bit fingerprints, 4×16-bit band join, popcount
    * verify at Hamming ≤ 16. */
  /** Oracle-checked since round 10: the whole SimHash pipeline — FNV-1a
    * word hashes, per-bit majority vote, 4×16-bit band keys, band join,
    * popcount verify — is plain modular/bit arithmetic, so DuckDB can
    * replay it exactly with HUGEINT math (`xor`/`<<`/`bit_count`,
    * FNV's multiply mod 2^64 via HUGEINT % 2^64, bytes via `ord` — the
    * documents corpus is pure ASCII so code point = byte). A drift in
    * ANY stage (hashing, banding, verify threshold) fails the hash. */
  val qSimHash: QueryDef = QueryDef(
    "q64_dedup_simhash",
    (s, d) => {
      import s.implicits._
      graft.api.Graft.simHashCandidates(
        t(s, d, "documents"), "doc_id", "text", maxHamming = 16)
        .orderBy($"doc_a", $"doc_b")
    },
    Some("""
      WITH words AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
      wh AS (
        SELECT doc_id, list_reduce(
          list_prepend(CAST('14695981039346656037' AS HUGEINT),
            list_transform(range(1, length(w) + 1),
              i -> CAST(ord(substr(w, i, 1)) AS HUGEINT))),
          (h, b) -> (xor(h, b) * 1099511628211) %
            CAST('18446744073709551616' AS HUGEINT)) AS h
        FROM words),
      bitvotes AS (
        SELECT doc_id, j,
          SUM(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS v
        FROM wh, range(0, 64) t(j)
        GROUP BY doc_id, j),
      fp AS (
        SELECT doc_id,
          SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << j
                   ELSE CAST(0 AS HUGEINT) END) AS fp
        FROM bitvotes GROUP BY doc_id),
      banded AS (
        SELECT doc_id, fp, b AS band, (fp >> (b * 16)) % 65536 AS key
        FROM fp, range(0, 4) t(b)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          bit_count(xor(a.fp, b.fp)) AS hamming
        FROM banded a JOIN banded b ON a.band = b.band AND a.key = b.key
        WHERE a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(hamming AS INT) AS hamming
      FROM pairs WHERE hamming <= 16 ORDER BY doc_a, doc_b"""))

  /** Embedding near-dup: cosine over a bounded id window (oracle-checked);
    * the scale path is the LSH-bucketed variant in Similarity. */
  val qEmbeddingCosine: QueryDef = QueryDef(
    "q65_dedup_embedding_cosine",
    (s, d) => {
      import s.implicits._
      val e = t(s, d, "embeddings").filter($"vec_id" < 60)
      val a = e.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"))
      val b = e.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"))
      a.crossJoin(b).filter($"vec_a" < $"vec_b")
        .select($"vec_a", $"vec_b",
          round(cosine($"emb_a", $"emb_b"), 6).as("sim"))
        .filter($"sim" >= 0.22)
        .orderBy($"vec_a", $"vec_b")
    },
    Some("""
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 60 AND b.vec_id < 60
        AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.22
      ORDER BY vec_a, vec_b"""))

  /** Full near-dup pipeline end product: LSH candidates → connected
    * components → canonical id per cluster (keep-one dedup). Deterministic
    * (seeded hashing + min-id canonicalization) but iterative → rows-only;
    * DedupClusterSpec pins the invariants. Runs the GraphX CC formulation
    * (the §2.11 surface); the DataFrame-native twin is oracle-proven by
    * q143/q162/q182 and the two are equal by DedupClustersSpec. */
  val qDedupClusters: QueryDef = QueryDef(
    "q134_dedup_clusters",
    (s, d) => {
      import s.implicits._
      val candidates = graft.api.Graft.minHashCandidates(
        t(s, d, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.2)
      graft.api.Graft.dedupClustersGraphX(candidates)
        .groupBy($"canonical_id")
        .agg(count(lit(1)).as("cluster_size"))
        .orderBy($"canonical_id")
    },
    // Oracle-checked since round 10: the q63 chain replays the LSH
    // candidates, the q162 recursive-CTE pattern replays GraphX CC
    // (canonical id = min reachable id), so the WHOLE banded near-dup
    // clustering pipeline is hash-matched end to end.
    Some(s"""
      WITH RECURSIVE $duckMinHashChain,
      cands AS (SELECT doc_a, doc_b FROM agree WHERE est_jaccard >= 0.2),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM cands
                UNION SELECT doc_b, doc_a FROM cands),
      walk AS (
        SELECT a AS node, a AS reach FROM edges
        UNION
        SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a),
      comp AS (SELECT node, MIN(reach) AS canonical_id FROM walk GROUP BY node)
      SELECT CAST(canonical_id AS BIGINT) AS canonical_id,
             CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY canonical_id ORDER BY canonical_id"""))

  /** Connected-components clustering over an ORACLE-CHECKABLE pair set:
    * the exact-Jaccard pairs from q62 feed the same CC operator the
    * pipeline uses, and DuckDB reproduces the components
    * with a recursive transitive-closure CTE (min reachable id = the
    * component's canonical id, which is exactly what GraphX
    * `connectedComponents` assigns — reference `graphx/.../GraphOps
    * .scala:433`). This hash-matches the last stage of the dedup pipeline
    * that was previously only spec-checked. The closure is O(n·edges) —
    * fine for an oracle on a bounded id window; the distributed path is
    * the Pregel loop. At sf0.01 this id window covers the whole corpus
    * and yields ~46 components (largest 19 docs) — a real clustering,
    * not a vacuous empty match. */
  val qDedupClustersExact: QueryDef = QueryDef(
    "q162_dedup_clusters_exact",
    (s, d) => {
      import s.implicits._
      val shingled = docWords(s, d).filter($"doc_id" < 500)
        .select($"doc_id", $"lang",
          array_distinct(transform(
            sequence(lit(1), size($"words") - 2),
            i => concat_ws(" ", element_at($"words", i),
              element_at($"words", i + 1), element_at($"words", i + 2))))
            .as("sh"))
      val a = shingled.select($"doc_id".as("doc_a"), $"lang", $"sh".as("sh_a"))
      val b = shingled.select($"doc_id".as("doc_b"), $"lang", $"sh".as("sh_b"))
      val pairs = a.join(b, Seq("lang")).filter($"doc_a" < $"doc_b")
        .filter(size(array_intersect($"sh_a", $"sh_b")).cast(DoubleType) /
          size(array_union($"sh_a", $"sh_b")) >= 0.02)
        .select($"doc_a", $"doc_b")
      graft.api.Graft.dedupClusters(pairs).orderBy($"doc_id")
    },
    Some("""
      WITH RECURSIVE shingled AS (
        SELECT doc_id, lang,
          list_distinct(list_transform(
            generate_series(1, len(w) - 2),
            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
        FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
              FROM documents WHERE doc_id < 500)),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM shingled a JOIN shingled b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.02),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      walk AS (
        SELECT a AS node, a AS reach FROM edges
        UNION
        SELECT w.node, e.b FROM walk w JOIN edges e ON w.reach = e.a)
      SELECT CAST(node AS BIGINT) AS doc_id,
             CAST(MIN(reach) AS BIGINT) AS canonical_id
      FROM walk GROUP BY node ORDER BY doc_id"""))

  /** End-to-end corpus-prep pipeline, hash-verified as ONE query: quality
    * gate (length + word-repetition) → canonical-fingerprint dedup (keep
    * min id per md5) → exact-Jaccard near-dup pairs → connected-component
    * clustering → drop non-canonical members → per-lang corpus
    * stats. This is the "switch your prep job to this library" demo: every
    * stage is the oracle-checked operator it reuses (q72/q61/q62/q162),
    * composed lazily so Catalyst plans the whole chain. At 100 TB the one
    * swap is the pair stage: exact Jaccard (bounded here) → q63's
    * MinHash-LSH candidates, same downstream. */
  val qCorpusPipeline: QueryDef = QueryDef(
    "q182_corpus_pipeline_e2e",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val words = split(lower($"text"), " ")
      val quality = t(s, d, "documents")
        .withColumn("tok", size(split($"text", " ")))
        .filter($"tok" >= 10 && (lit(1.0) -
          size(array_distinct(words)).cast(DoubleType) / size(words)) <= 0.7)
      // The deduped corpus feeds two consumers across a job boundary (the
      // shingle-pair stage consumed by the CC loop, and the final agg) —
      // persist it so the scan + regex + window run once. Released by the
      // caller via Graft.releaseCaches() after materialization.
      val keep1 = graft.api.Graft.pinCache(quality
        .withColumn("f", md5(regexp_replace(lower(trim($"text")), " +", " ")))
        .withColumn("_m", min($"doc_id").over(Window.partitionBy($"f")))
        .filter($"doc_id" === $"_m").drop("_m", "f"))
      // Exact-Jaccard pairs via the inverted shingle index — see
      // Graft.exactJaccardPairs: only pairs sharing a shingle are
      // generated (near-linear for natural text), vs the all-pairs
      // array-intersect formulation that is O(n²·|sh|) per language
      // (measured 5.5× slower end-to-end at sf0.1). Identical result.
      val pairs = graft.api.Graft.exactJaccardPairs(
        keep1, "doc_id", "text", threshold = 0.15,
        groupCol = Some("lang"))
      val dropped = graft.api.Graft.dedupClusters(pairs)
        .filter($"doc_id" =!= $"canonical_id").select($"doc_id")
      keep1.join(dropped, Seq("doc_id"), "left_anti")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"tok").cast("long").as("tokens"))
        .orderBy($"lang")
    },
    Some("""
      WITH RECURSIVE quality AS (
        SELECT doc_id, lang, text, len(string_split(text, ' ')) AS tok
        FROM documents
        WHERE len(string_split(text, ' ')) >= 10
          AND 1.0 - CAST(len(list_distinct(string_split(lower(text), ' ')))
                AS DOUBLE) / len(string_split(lower(text), ' ')) <= 0.7),
      keep1 AS (
        SELECT doc_id, lang, text, tok FROM (
          SELECT *, min(doc_id) OVER (PARTITION BY
            md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))) AS m
          FROM quality) WHERE doc_id = m),
      sh AS (SELECT doc_id, lang,
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
             FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
                   FROM keep1)),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.15),
      edges AS (SELECT da AS x, db AS y FROM pairs
                UNION SELECT db, da FROM pairs),
      walk AS (SELECT x AS node, x AS reach FROM edges
               UNION
               SELECT w2.node, e.y FROM walk w2 JOIN edges e ON w2.reach = e.x)
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS tokens
      FROM keep1
      WHERE doc_id NOT IN (
        SELECT node FROM walk GROUP BY node HAVING MIN(reach) <> node)
      GROUP BY lang ORDER BY lang"""))

  /** The `DEDUP TABLE` SQL statement end to end (parser seam,
    * plans/DedupStatement.scala): KEEP MIN o_orderkey keeps each
    * customer's FIRST order — deterministic because o_orderkey is
    * globally unique (the KEEP column must make (BY, KEEP) unique;
    * lineitem's l_linenumber does NOT qualify in this testdata) — and
    * the statement desugars to the already-audited one-shuffle
    * window-rank shape. The session parser is installed via
    * spark.sql.extensions (GraftSession/Verify), the way a cluster
    * deploys it. */
  val qDedupStatement: QueryDef = QueryDef(
    "q224_dedup_sql_statement",
    (s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      s.sql("DEDUP TABLE orders BY (o_custkey) KEEP MIN o_orderkey")
        .select($"o_custkey", $"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_custkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderkey) AS rn
        FROM orders) t
      WHERE rn = 1
      ORDER BY o_custkey"""))

  /** The round-10 `DEDUP TABLE` extensions end to end: `KEEP MAX`
    * (keep each customer's LATEST order) and the `INTO` write-back form
    * landing in a GOVERNED graft-manifest catalog table as one atomic
    * snapshot commit (plans/DedupStatement.scala desugars INTO to
    * Spark's own InsertIntoStatement, so any catalog works). The target
    * is pre-seeded with a deterministic slice, the statement appends the
    * deduped set, and the oracle recomputes seed ∪ keep-max relationally.
    * Scale shape: the dedup itself stays the one-shuffle window rank; the
    * write is the manifest sink's normal two-phase commit. */
  val qDedupWriteback: QueryDef = QueryDef(
    "q227_dedup_writeback",
    (s, d) => {
      import s.implicits._
      Tables.registerAll(s, d)
      val root = java.nio.file.Paths.get("target", "graft-io",
        d.replaceAll("[^A-Za-z0-9.]", "_"), "dedup_into").toString
      val dir = new org.apache.hadoop.fs.Path(root)
      dir.getFileSystem(s.sparkContext.hadoopConfiguration).delete(dir, true)
      val cat = "graft_q227"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      val src = t(s, d, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
      src.filter($"o_orderkey" % 1000 === 0)
        .write.mode("append").format("graft-manifest")
        .option("path", s"$root/kept").save()
      src.createOrReplaceTempView("q227_src")
      s.sql(s"DEDUP TABLE q227_src BY (o_custkey) KEEP MAX o_orderkey INTO $cat.kept;")
      s.table(s"$cat.kept")
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      WITH src AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      seed AS (SELECT * FROM src WHERE o_orderkey % 1000 = 0),
      keep AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM (
          SELECT *, row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderkey DESC) AS rn
          FROM src) t WHERE rn = 1)
      SELECT * FROM seed UNION ALL SELECT * FROM keep
      ORDER BY o_custkey, o_orderkey"""))

  /** GOVERNED MinHash-BAND dedup index (round 14 — the near-dup twin of
    * q258's hyperplane ANN index): the `(band, bucket, doc_id)` relation
    * lands in a manifest table built map-side from the q63 machinery; a
    * TAKEDOWN on the corpus lands as KB-scale MOR delete vectors and the
    * index maintains itself from the CHANGE FEED (row-level DELETE of
    * exactly the touched ids + re-signature of ONLY the insert legs —
    * never a corpus rescan, Graft.maintainMinHashBandIndex); candidate
    * pairs come THROUGH the index (band self-join + candidates-only
    * agreement verify). The oracle replays the full q63 HUGEINT chain
    * over the post-takedown corpus, so a drift in the index build, the
    * feed maintenance, or the query path fails the hash. Same q63
    * caveats: the oracle buckets on slice equality vs Spark's
    * hash(slice) (differs only on a Murmur3 collision), and the
    * maxBucketSize cap is unreachable at this corpus size. */
  val qBandIndex: QueryDef = QueryDef(
    "q261_governed_band_index",
    (s, d) => {
      import s.implicits._
      val root = java.nio.file.Paths.get("target", "graft-io",
        d.replaceAll("[^A-Za-z0-9.]", "_"), "band_index").toString
      val dir = new org.apache.hadoop.fs.Path(root)
      dir.getFileSystem(s.sparkContext.hadoopConfiguration).delete(dir, true)
      val cat = "graft_bandidx_" + d.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftManifestCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"CREATE TABLE $cat.docs (doc_id BIGINT, text STRING) " +
        "TBLPROPERTIES('delete.mode'='merge-on-read')")
      t(s, d, "documents").select($"doc_id", $"text")
        .writeTo(s"$cat.docs").append()                          // v2
      s.sql(s"CREATE TABLE $cat.bidx (band INT, bucket INT, doc_id BIGINT)")
      graft.api.Graft.minHashBandIndex(s.table(s"$cat.docs"),
        "doc_id", "text").writeTo(s"$cat.bidx").append()
      // takedown: KB-scale positional delete vectors on the corpus; the
      // index follows from the FEED, never a rescan
      s.sql(s"DELETE FROM $cat.docs WHERE doc_id % 13 = 5")      // v3
      graft.api.Graft.maintainMinHashBandIndex(s, cat, "docs", "bidx",
        "doc_id", "text", fromVersion = 2)
      graft.api.Graft.minHashBandCandidates(s.table(s"$cat.docs"),
        s.table(s"$cat.bidx"), "doc_id", "text", threshold = 0.2)
        .orderBy($"doc_a", $"doc_b")
    },
    Some(s"""
      WITH ${duckMinHashChainFrom(
        "(SELECT * FROM documents WHERE doc_id % 13 <> 5) dsrc")}
      SELECT doc_a, doc_b, est_jaccard FROM agree
      WHERE est_jaccard >= 0.2 ORDER BY doc_a, doc_b"""))

  override def defs: Seq[QueryDef] = Seq(
    qExact, qFingerprint, qNgramJaccard, qMinHashLsh, qSimHash,
    qEmbeddingCosine, qDedupClusters, qDedupClustersExact, qCorpusPipeline,
    qDedupStatement, qDedupWriteback, qBandIndex)
}
