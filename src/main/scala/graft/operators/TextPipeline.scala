package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryModule, Tables}

/** Corpus-preparation operators past the q70-74 per-document statistics:
  * TF-IDF term scoring, Gopher-style repetition pruning, PII redaction,
  * and global n-gram mining. All tokenization is codegen'd `functions._`
  * (split/filter/transform — no UDFs); every aggregate is integer or
  * fixed-rounded math so each query is DuckDB-exact.
  *
  * Scale shape: tokenize/explode is map-side; the shuffles are keyed by
  * (doc, term) or term — state proportional to the vocabulary, not the
  * corpus. The only global top-k (bigrams) goes through the two-phase
  * TopK pattern via partial aggregation before the single-key exchange.
  */
object TextPipeline extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  /** Alphabetic terms of length >= 3 (anchored, so Spark rlike and DuckDB
    * regexp_matches agree despite both being partial-match by default). */
  private def terms(c: Column): Column =
    filter(split(lower(c), " "), w => w.rlike("^[a-z]{3,}$"))
  private val termsSql =
    "list_filter(string_split(lower(text), ' '), x -> regexp_matches(x, '^[a-z]{3,}$'))"

  /** TF-IDF: top-3 terms per document by tf·(ln((N+1)/(df+1))+1). The
    * score is rounded to 4 decimals BEFORE ranking (libm ln may differ in
    * the last ulp between JVM and DuckDB; at 1e-4 granularity they agree)
    * and ties break on the term, so the ranking is engine-independent.
    * Two shuffles: (doc,term) tf agg, then term df agg joined back; the
    * doc count N is the one driver-side scalar (a config-like constant). */
  val qTfIdf: QueryDef = QueryDef(
    "q148_tfidf_topterms",
    (s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val n = docs.count()
      val tf = docs.select($"doc_id", explode(terms($"text")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df, "term")
        .select($"doc_id", $"term",
          round($"tf" * (log((lit(n) + 1.0) / ($"df" + 1.0)) + 1.0), 4)
            .as("score"))
      val w = Window.partitionBy($"doc_id")
        .orderBy($"score".desc, $"term".asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"doc_id", $"rnk".cast("int").as("rnk"), $"term", $"score")
        .orderBy($"doc_id", $"rnk")
    },
    Some(s"""
      WITH tf AS (
        SELECT doc_id, t.term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, $termsSql AS w FROM documents),
             UNNEST(w) AS t(term)
        GROUP BY doc_id, t.term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(*) AS n FROM documents),
      scored AS (
        SELECT doc_id, tf.term,
          round(tf * (ln(((SELECT n FROM n) + 1.0) / (df + 1.0)) + 1.0), 4)
            AS score
        FROM tf JOIN df ON tf.term = df.term),
      ranked AS (
        SELECT doc_id, term, score,
          row_number() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, term ASC) AS rnk
        FROM scored)
      SELECT doc_id, CAST(rnk AS INT) AS rnk, term, score
      FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk"""))

  /** Gopher-style repetition pruning: word-repetition ratio
    * (1 - distinct/total) and duplicate-sentence ratio per document, plus
    * the keep/drop verdict. Pure integer-ratio math — exact everywhere. */
  val qRepetitionPrune: QueryDef = QueryDef(
    "q149_repetition_prune",
    (s, d) => {
      import s.implicits._
      val words = split(lower($"text"), " ")
      val sents = filter(split($"text", "\\. "), x => length(x) > 0)
      val wordRep = round(lit(1.0) -
        size(array_distinct(words)).cast("double") / size(words), 6)
      // A document with no non-empty sentence would divide by zero: Spark
      // yields NULL, DuckDB's IEEE float mode yields NaN — pin both engines
      // to 0.0 ("no repetition") for the degenerate case.
      val sentRep = when(size(sents) > 0, round(lit(1.0) -
        size(array_distinct(sents)).cast("double") / size(sents), 6))
        .otherwise(lit(0.0))
      t(s, d, "documents")
        .select($"doc_id", wordRep.as("word_rep"), sentRep.as("sent_rep"))
        .withColumn("keep",
          ($"word_rep" <= 0.7 && $"sent_rep" <= 0.3).cast("int"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
          round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
            AS word_rep,
          CASE WHEN len(sn) > 0
               THEN round(1.0 - CAST(len(list_distinct(sn)) AS DOUBLE) / len(sn), 6)
               ELSE 0.0 END AS sent_rep
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS w,
                list_filter(string_split_regex(text, '\. '), x -> len(x) > 0)
                  AS sn
              FROM documents))
      SELECT doc_id, word_rep, sent_rep,
        CAST(word_rep <= 0.7 AND sent_rep <= 0.3 AS INT) AS keep
      FROM m ORDER BY doc_id"""))

  /** PII redaction pass: digit runs and email-shaped tokens replaced by
    * placeholder tags, with per-source counts of how much was redacted.
    * Map-side regex rewrite (codegen'd), one small aggregate at the end —
    * the 100 TB shape of a scrubbing pass. */
  val qPiiRedact: QueryDef = QueryDef(
    "q150_pii_redact",
    (s, d) => {
      import s.implicits._
      val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
      val numRe = "[0-9]+"
      val redacted = regexp_replace(
        regexp_replace($"text", emailRe, "<EMAIL>"), numRe, "<NUM>")
      t(s, d, "documents")
        .select($"source",
          regexp_count($"text", lit(emailRe)).as("n_email"),
          regexp_count($"text", lit(numRe)).as("n_num"),
          (length(redacted) - length($"text")).as("len_delta"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_email").cast("long").as("emails_redacted"),
          sum($"n_num").cast("long").as("numbers_redacted"),
          sum($"len_delta").cast("long").as("total_len_delta"))
        .orderBy($"source")
    },
    Some("""
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(len(regexp_extract_all(text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+')))
             AS BIGINT) AS emails_redacted,
        CAST(SUM(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT)
          AS numbers_redacted,
        CAST(SUM(len(regexp_replace(regexp_replace(text,
               '[a-zA-Z0-9._]+@[a-zA-Z0-9.]+', '<EMAIL>', 'g'),
               '[0-9]+', '<NUM>', 'g')) - len(text)) AS BIGINT)
          AS total_len_delta
      FROM documents GROUP BY source ORDER BY source"""))

  /** Global top-20 word bigrams: per-doc bigram arrays built map-side
    * (transform over index sequence), exploded, partially aggregated
    * before the term-keyed exchange, final top-k by (count, bigram). */
  val qBigramTopK: QueryDef = QueryDef(
    "q151_bigram_topk",
    (s, d) => {
      import s.implicits._
      val toks = terms($"text")
      // sequence(1, 0) is DESCENDING in Spark, so docs with < 2 tokens need
      // an explicit empty-array branch rather than an empty sequence.
      val bigrams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
        .otherwise(expr("array()").cast("array<string>"))
      t(s, d, "documents")
        .select(explode(bigrams).as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"bigram".asc)
        .limit(20)
    },
    Some(s"""
      WITH toks AS (SELECT $termsSql AS t FROM documents),
      bg AS (SELECT UNNEST(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS bigram
             FROM toks)
      SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM bg GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20"""))

  /** Global top-20 word trigrams via the custom `NGramGenerator` UDTF
    * (graft.functions.NGramGenerator) — the generator streams one output
    * row per n-gram through `GenerateExec` instead of materializing a
    * per-document n-gram array and exploding it (q151's idiom). The
    * oracle rebuilds the same trigrams declaratively, so this
    * hash-verifies a custom `Generator` expression end-to-end. */
  val qTrigramGenerator: QueryDef = QueryDef(
    "q166_trigram_generator",
    (s, d) => {
      import s.implicits._
      import graft.functions.NGramGenerator.ngrams
      t(s, d, "documents")
        .select(ngrams(terms($"text"), 3).as("ngram"))
        .groupBy($"ngram").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"ngram".asc)
        .limit(20)
    },
    Some(s"""
      WITH toks AS (SELECT $termsSql AS t FROM documents),
      tg AS (SELECT UNNEST(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS ngram
             FROM toks)
      SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
      FROM tg GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 20"""))

  override def defs: Seq[QueryDef] =
    Seq(qTfIdf, qRepetitionPrune, qPiiRedact, qBigramTopK, qTrigramGenerator)
}
