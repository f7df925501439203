package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}
import graft.api.Graft
import graft.plans.TopK

/** Corpus-INGEST operators: the steps a production training-data pipeline
  * runs when new crawl batches land on an existing 100 TB corpus —
  * incremental dedup against the corpus fingerprint store, boilerplate
  * detection via cross-document shingle frequency, per-domain quotas, and
  * benchmark decontamination. All four are deterministic relational plans
  * (DuckDB-exact oracles); the shingle stages reuse the codegen'd
  * [[graft.functions.NGramGenerator]] streamed through GenerateExec
  * (reference seam: `sql/catalyst/.../expressions/generators.scala`,
  * `sql/core/.../execution/GenerateExec.scala`).
  *
  * Scale shapes (per operator, for the 1000-executor read of this code):
  *  - incremental dedup: the store side is 16-byte md5 keys only — at
  *    corpus scale this is a shuffled-hash ANTI join on `fp` (never the
  *    document payloads), with a bloom-filter prefilter (q157's pattern)
  *    cutting the batch-side shuffle before it happens; at test scale
  *    Catalyst broadcasts the store automatically.
  *  - boilerplate: the only wide state is the shingle→doc-frequency
  *    relation — vocabulary-sized, not corpus-sized — built with partial
  *    (map-side) aggregation; payloads never shuffle.
  *  - domain caps: the custom two-phase TopK operator prunes every
  *    domain to k rows BEFORE the exchange (partial heaps), so the
  *    shuffle carries O(domains × k), not the corpus.
  *  - decontamination: the eval set is tiny by construction — its
  *    distinct shingles broadcast, and the corpus-side scan stays
  *    shuffle-free up to the per-doc count aggregation.
  */
object CorpusIngest extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Whitespace word-trigram shingles, DISTINCT per document (presence,
    * not multiplicity, is what overlap metrics want). */
  private def shingles(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.functions.NGramGenerator.ngrams
    docs.select($"doc_id", ngrams(split($"text", " "), 3).as("sh")).distinct()
  }
  private val shinglesSql = """
      w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      shing AS (
        SELECT DISTINCT doc_id,
          words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS sh
        FROM w, UNNEST(range(1, len(words) - 1)) t(i))"""

  /** Incremental ingest dedup: re-ingesting a batch where 20 % of the
    * documents (doc_id ≡ 0 mod 5) are already in the corpus fingerprint
    * store keeps exactly the unseen ones. The store never holds payloads
    * — only the canonicalized md5 from [[Graft.withFingerprint]]. */
  val qIncrementalDedup: QueryDef = QueryDef(
    "q184_incremental_dedup",
    (s, d) => {
      import s.implicits._
      val all = Graft.withFingerprint(t(s, d, "documents"), "text")
        .select($"doc_id", $"fp")
      val store = all.filter($"doc_id" % 5 === 0).select($"fp")
      all.join(store, Seq("fp"), "left_anti")
        .select($"doc_id", $"fp").orderBy($"doc_id")
    },
    Some("""
      WITH fp AS (SELECT doc_id,
          md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
        FROM documents)
      SELECT doc_id, fp FROM fp
      WHERE fp NOT IN (SELECT fp FROM fp WHERE doc_id % 5 = 0)
      ORDER BY doc_id"""))

  /** Boilerplate detection: fraction of a document's distinct trigrams
    * that appear in more than one document (headers/footers/templates
    * repeat across a crawl; prose doesn't). Ratio rounded to 4 decimals
    * BEFORE thresholding so both engines take the same branch. */
  val qBoilerplate: QueryDef = QueryDef(
    "q185_boilerplate_shingles",
    (s, d) => {
      import s.implicits._
      val sh = shingles(t(s, d, "documents"))
      val freq = sh.groupBy($"sh").agg(count(lit(1)).as("c"))
      sh.join(freq, "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          round(avg(when($"c" > 1, 1.0).otherwise(0.0)), 4).as("shared_ratio"))
        .withColumn("is_boilerplate", ($"shared_ratio" >= 0.8).cast("int"))
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $shinglesSql,
      freq AS (SELECT sh, COUNT(*) AS c FROM shing GROUP BY sh)
      SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        round(avg(CASE WHEN f.c > 1 THEN 1.0 ELSE 0.0 END), 4) AS shared_ratio,
        CAST(round(avg(CASE WHEN f.c > 1 THEN 1.0 ELSE 0.0 END), 4) >= 0.8
             AS INT) AS is_boilerplate
      FROM shing s JOIN freq f ON s.sh = f.sh
      GROUP BY s.doc_id ORDER BY s.doc_id"""))

  /** Per-domain quota: keep the top-5 documents per source by length
    * (doc_id breaks ties → total order, engine-independent), via the
    * custom two-phase TopK physical operator (plans/TopKPerKey.scala). */
  val qDomainCap: QueryDef = QueryDef(
    "q186_domain_cap",
    (s, d) => {
      import s.implicits._
      TopK.perKey(t(s, d, "documents").select($"source", $"doc_id", $"n_chars"),
          Seq("source"), Seq(TopK.desc("n_chars"), TopK.asc("doc_id")), 5)
        .orderBy($"source", $"n_chars".desc, $"doc_id")
    },
    Some("""
      WITH ranked AS (
        SELECT source, doc_id, n_chars,
          row_number() OVER (PARTITION BY source
                             ORDER BY n_chars DESC, doc_id ASC) AS rn
        FROM documents)
      SELECT source, doc_id, n_chars FROM ranked WHERE rn <= 5
      ORDER BY source, n_chars DESC, doc_id"""))

  /** Benchmark decontamination: training documents sharing ≥ 3 distinct
    * trigrams with the held-out eval set (doc_id ≡ 0 mod 50) are flagged
    * with their overlap count — the n-gram-overlap contamination check
    * every LLM data pipeline runs before training. */
  val qDecontaminate: QueryDef = QueryDef(
    "q187_decontamination",
    (s, d) => {
      import s.implicits._
      val sh = shingles(t(s, d, "documents"))
      val ev = sh.filter($"doc_id" % 50 === 0).select($"sh").distinct()
      sh.filter($"doc_id" % 50 =!= 0)
        .join(broadcast(ev), "sh")
        .groupBy($"doc_id").agg(count(lit(1)).as("n_shared"))
        .filter($"n_shared" >= 3)
        .orderBy($"doc_id")
    },
    Some(s"""
      WITH $shinglesSql,
      ev AS (SELECT DISTINCT sh FROM shing WHERE doc_id % 50 = 0)
      SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM shing s JOIN ev ON s.sh = ev.sh
      WHERE s.doc_id % 50 <> 0
      GROUP BY s.doc_id HAVING COUNT(*) >= 3 ORDER BY doc_id"""))

  /** Token-budget rebalancing: cap the corpus at 40% of its size while
    * equalizing source shares — each source gets budget/k chars, so its
    * acceptance rate is min(1, (0.4·total/k)/chars_s): over-represented
    * sources are downsampled hard, small sources keep everything. The
    * accept decision is the md5-threshold trick (uniform u(doc) ∈ [0,1)
    * from the id's hash prefix), so membership is DETERMINISTIC — two
    * engines, two runs, two cluster sizes pick the same documents, which
    * is what makes the sampled corpus reproducible and auditable.
    * Dataflow: one small per-source aggregate, rates broadcast back, one
    * map-side filter — the corpus itself shuffles only for the final
    * per-source stats. Both engines compute the rate with the identical
    * double-arithmetic shape, so the boundary comparison agrees bitwise. */
  val qTokenBudget: QueryDef = QueryDef(
    "q225_token_budget_sample",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").select($"doc_id", $"source", $"n_chars")
      val per = docs.groupBy($"source").agg(sum($"n_chars").as("chars_s"))
      val tot = per.agg(sum($"chars_s").cast("double").as("t"),
        count(lit(1)).cast("double").as("k"))
      val rated = per.crossJoin(broadcast(tot))
        .withColumn("rate", least(lit(1.0),
          lit(0.4) * $"t" / $"k" / $"chars_s".cast("double")))
        .select($"source", $"rate")
      docs.join(broadcast(rated), "source")
        .withColumn("u",
          expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) " +
            "as bigint) / 4294967296.0"))
        .filter($"u" < $"rate")
        .groupBy($"source")
        .agg(count(lit(1)).as("kept_docs"),
          sum($"n_chars").as("kept_chars"))
        .orderBy($"source")
    },
    Some("""
      WITH per AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars_s
        FROM documents GROUP BY source),
      tot AS (
        SELECT CAST(SUM(chars_s) AS DOUBLE) AS t,
               CAST(COUNT(*) AS DOUBLE) AS k FROM per),
      rated AS (
        SELECT source,
               LEAST(1.0, 0.4 * t / k / CAST(chars_s AS DOUBLE)) AS rate
        FROM per, tot)
      SELECT d.source, CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
      FROM documents d JOIN rated r ON d.source = r.source
      WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT
                 AS BIGINT) / 4294967296.0 < r.rate
      GROUP BY d.source
      ORDER BY d.source"""))

  override def defs: Seq[QueryDef] =
    Seq(qIncrementalDedup, qBoilerplate, qDomainCap, qDecontaminate,
      qTokenBudget)
}
