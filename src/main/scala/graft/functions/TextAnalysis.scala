package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{QueryDef, QueryModule, Tables}

/** Text-analysis operators for training-data pipelines: token counting
  * (whitespace + BPE-ish regex), quality scoring, stopword-based
  * language scoring, document statistics. Everything is built from
  * codegen'd `functions._` expressions (no UDFs), entirely map-side until
  * the final aggregate, and every query is DuckDB-oracle-checked — the
  * scoring arithmetic is integer-ratio math, identical across engines.
  */
object TextAnalysis extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.df(s, d, n)

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")

  val qTokenStats: QueryDef = QueryDef(
    "q70_text_token_stats",
    (s, d) => {
      import s.implicits._
      val words = split($"text", " ")
      t(s, d, "documents")
        .select($"lang", size(words).as("n_tok"), $"n_chars")
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tok").cast(LongType).as("total_tokens"),
          avg($"n_tok").as("avg_tokens"),
          (sum($"n_chars") / sum($"n_tok")).as("chars_per_token"))
        .orderBy($"lang")
    },
    Some("""
      SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        AVG(n_tok) AS avg_tokens,
        (SUM(n_chars) / SUM(n_tok)) AS chars_per_token
      FROM (SELECT lang, len(string_split(text, ' ')) AS n_tok, n_chars
            FROM documents)
      GROUP BY lang ORDER BY lang"""))

  /** BPE-ish token counting: lowercase runs, digit runs, or single
    * non-space symbols — the standard pre-tokenizer shape. */
  val qTokenCount: QueryDef = QueryDef(
    "q71_text_token_count",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"source", graft.api.Graft.bpeTokenCount($"text").as("n_bpe_tok"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_bpe_tok").cast(LongType).as("total_bpe"),
          max($"n_bpe_tok").as("max_bpe"))
        .orderBy($"source")
    },
    Some("""
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(n) AS BIGINT) AS total_bpe, MAX(n) AS max_bpe
      FROM (SELECT source,
              len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n
            FROM documents)
      GROUP BY source ORDER BY source"""))

  /** Per-document quality score — length band, stopword ratio, mean word
    * length; weights arbitrary but identical across engines (pure integer
    * ratios, exact double division). */
  val qQuality: QueryDef = QueryDef(
    "q72_text_quality",
    (s, d) => {
      import s.implicits._
      val words = split(lower($"text"), " ")
      val nTok = size(words).cast(DoubleType)
      val nStop = size(filter(words,
        w => w.isInCollection(stopwords))).cast(DoubleType)
      val lenScore = when(size(words).between(30, 90), 1.0).otherwise(0.5)
      val stopRatio = nStop / nTok
      val meanWordLen = ($"n_chars".cast(DoubleType) - (nTok - 1.0)) / nTok
      t(s, d, "documents")
        .select($"doc_id",
          round(lenScore * 0.4 + stopRatio * 0.3
            + when(meanWordLen.between(3.0, 8.0), 0.3).otherwise(0.1), 6)
            .as("quality"))
        .orderBy($"doc_id")
    },
    Some(s"""
      SELECT doc_id, round(
        (CASE WHEN n_tok BETWEEN 30 AND 90 THEN 1.0 ELSE 0.5 END) * 0.4
        + (n_stop / CAST(n_tok AS DOUBLE)) * 0.3
        + (CASE WHEN (n_chars - (n_tok - 1.0)) / n_tok BETWEEN 3.0 AND 8.0
                THEN 0.3 ELSE 0.1 END), 6) AS quality
      FROM (
        SELECT doc_id, n_chars,
          CAST(len(w) AS DOUBLE) AS n_tok,
          CAST(len(list_filter(w, x -> list_contains(
            [${stopwords.map("'" + _ + "'").mkString(",")}], x))) AS DOUBLE) AS n_stop
        FROM (SELECT doc_id, n_chars, string_split(lower(text), ' ') AS w
              FROM documents))
      ORDER BY doc_id"""))

  /** Stopword-lexicon language scoring — the n-gram-heuristic shape of a
    * language-ID pass (lexicon hit-rate per doc, thresholded). */
  val qLangId: QueryDef = QueryDef(
    "q73_text_langid",
    (s, d) => {
      import s.implicits._
      val words = split(lower($"text"), " ")
      val hitRatio = size(filter(words, w => w.isInCollection(stopwords)))
        .cast(DoubleType) / size(words)
      val predicted = when(hitRatio >= 0.08, "en_like").otherwise("other")
      t(s, d, "documents")
        .select($"lang", predicted.as("predicted"))
        .groupBy($"lang", $"predicted").agg(count(lit(1)).as("n"))
        .orderBy($"lang", $"predicted")
    },
    Some(s"""
      SELECT lang, predicted, COUNT(*) AS n FROM (
        SELECT lang,
          CASE WHEN CAST(len(list_filter(w, x -> list_contains(
                 [${stopwords.map("'" + _ + "'").mkString(",")}], x))) AS DOUBLE)
               / len(w) >= 0.08
          THEN 'en_like' ELSE 'other' END AS predicted
        FROM (SELECT lang, string_split(lower(text), ' ') AS w FROM documents))
      GROUP BY lang, predicted ORDER BY lang, predicted"""))

  /** Content-defined fingerprint per doc (md5 prefix as 64-bit-ish key) +
    * collision census per source — the building block for url/document
    * dedup joins. */
  val qDocFingerprint: QueryDef = QueryDef(
    "q74_text_fingerprint",
    (s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select($"source", substring(md5($"text"), 1, 16).as("fp64"))
        .groupBy($"source")
        .agg(countDistinct($"fp64").as("n_unique"), count(lit(1)).as("n"))
        .orderBy($"source")
    },
    Some("""
      SELECT source, COUNT(DISTINCT substring(md5(text), 1, 16)) AS n_unique,
             COUNT(*) AS n
      FROM documents GROUP BY source ORDER BY source"""))

  override def defs: Seq[QueryDef] = Seq(
    qTokenStats, qTokenCount, qQuality, qLangId, qDocFingerprint)
}
