package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._
import graft.sources.Tables

/** Text-analysis queries over `documents` (SURVEY §2 X3 / north-star
  * training-data ops). Single-pass, codegen'd, exactly mirrored in
  * DuckDB SQL. */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  val all: Map[String, Q] = Map(
    // ---- heuristic language ID: confusion matrix vs the label ------
    "x3_lang_id" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), langId(col("text")).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // ---- per-doc quality features + gate ----------------------------
    "x3_quality" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"),
          alphaPct(col("text")).as("alpha_pct"),
          punctCount(col("text")).as("n_punct"),
          isGoodDoc(col("text")).as("is_good"))
        .orderBy("doc_id")
    }),

    // ---- BPE-ish pre-token counts by language -----------------------
    "x3_bpe_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), bpeishCount(col("text")).as("n_bpe"),
          size(tokens(col("text"))).cast("long").as("n_ws"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_bpe").as("total_bpe"),
          sum("n_ws").as("total_ws"))
        .orderBy("lang")
    }),

    // ---- content-hash train/test split (deterministic, cross-engine)
    "x3_train_test_split" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          graft.operators.Sampling.splitColumn(col("text")).as("split"))
        .groupBy("lang", "split").agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    }),

    // ---- content fingerprints (exact + winnowing) -------------------
    "x3_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          fingerprint(col("text")).as("fp"),
          winnowFingerprint(col("text"), 5).as("fp_winnow"))
        .orderBy("doc_id")
    })
  )

  private val langLex =
    """['the','and','of','to','a','in','is','that','it','for']"""
  private val langLexEs =
    """['el','la','de','que','y','en','un','una','los','por']"""
  private val langLexDe =
    """['der','die','das','und','ist','von','mit','den','nicht','ein']"""

  private val perDocLang =
    s"""SELECT lang,
       |  CASE WHEN length(text) - length(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) > 0 THEN 'zh'
       |       WHEN len(list_filter(toks, x -> list_contains($langLexEs, x))) > len(list_filter(toks, x -> list_contains($langLex, x)))
       |        AND len(list_filter(toks, x -> list_contains($langLexEs, x))) >= len(list_filter(toks, x -> list_contains($langLexDe, x))) THEN 'es'
       |       WHEN len(list_filter(toks, x -> list_contains($langLexDe, x))) > len(list_filter(toks, x -> list_contains($langLex, x)))
       |        AND len(list_filter(toks, x -> list_contains($langLexDe, x))) > len(list_filter(toks, x -> list_contains($langLexEs, x))) THEN 'de'
       |       ELSE 'en' END AS predicted
       |FROM (SELECT lang, text,
       |        list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '') AS toks
       |      FROM documents) d""".stripMargin

  val oracle: Map[String, String] = Map(
    "x3_lang_id" ->
      s"""SELECT lang, predicted, COUNT(*) AS n FROM ($perDocLang) p
         |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,

    "x3_quality" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')) AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN length(text) = 0 THEN 0
        |       ELSE length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 100 // length(text) END AS BIGINT) AS alpha_pct,
        |  CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS n_punct,
        |  (CASE WHEN length(text) = 0 THEN 0
        |        ELSE length(regexp_replace(lower(text), '[^a-z]', '', 'g')) * 100 // length(text) END) >= 70
        |   AND len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')) >= 20 AS is_good
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x3_bpe_tokens" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe,
        |  CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x != ''))) AS BIGINT) AS total_ws
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // first md5 nibble < 13 ⇒ train (13/16 ≈ 81%)
    "x3_train_test_split" ->
      """SELECT lang,
        |CASE WHEN ('0x' || substr(md5(text), 1, 1))::INT < 13 THEN 'train' ELSE 'test' END AS split,
        |COUNT(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x3_fingerprint" ->
      """WITH d AS (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g AS (SELECT doc_id, text,
        |        CASE WHEN len(w) >= 5
        |             THEN list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] for i in range(1, len(w)-3)])
        |             ELSE [array_to_string(w, ' ')] END AS grams
        |      FROM d)
        |SELECT doc_id, md5(text) AS fp,
        |       list_aggregate([md5(x) for x in grams], 'min') AS fp_winnow
        |FROM g ORDER BY doc_id""".stripMargin
  )
}
