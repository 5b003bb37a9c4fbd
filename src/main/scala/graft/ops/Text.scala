package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.model.Tables._
import graft.functions.Det._
import graft.functions.TextFeatures._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * exact deduplication, token counting, quality scoring, language ID
  * heuristics, and document fingerprinting. All pure `Column`
  * expressions — at 100 TB each of these is a single scan (plus one
  * hash-partitioned shuffle for the dedup groupings), never a collect.
  */
object Text {

  private val docCols = Seq("doc_id", "text")

  val all: Seq[Q] = Seq(
    // --- q30: exact dedup via normalized-text fingerprint. The corpus is
    // doubled with whitespace-perturbed copies (doc_id + 1,000,000) so the
    // operator provably collapses them: output maps every duplicate to its
    // canonical (min) doc_id. Scale: one shuffle on the 128-bit
    // fingerprint; canonical pick is min-over-group (no sort).
    Q(
      "q30_dedup_exact",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, concat('  ', text, ' ') FROM documents
         |), f AS (
         |  SELECT doc_id, md5(${oNorm("text")}) AS fp FROM corpus
         |), c AS (
         |  SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id FROM f
         |)
         |SELECT doc_id, canonical_id, fp FROM c
         |WHERE doc_id <> canonical_id
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d)
      val corpus = docs.select(docCols.map(col): _*)
        .unionByName(docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("  "), col("text"), lit(" ")).as("text")))
      corpus
        .withColumn("fp", md5(norm(col("text"))))
        .withColumn("canonical_id", min("doc_id").over(Window.partitionBy("fp")))
        .filter(col("doc_id") =!= col("canonical_id"))
        .select("doc_id", "canonical_id", "fp")
        .orderBy("doc_id")
    },

    // --- q31: token counting — whitespace tokens, word-regex tokens, and
    // punctuation chars (a BPE-ish pre-tokenization census).
    Q(
      "q31_token_count",
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9'']+')) AS INTEGER) AS word_tokens,
        |  CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS INTEGER) AS punct_chars,
        |  CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z0-9']+"), lit(0))).as("word_tokens"),
          size(regexp_extract_all(col("text"), lit("[^a-z0-9\\s]"), lit(0))).as("punct_chars"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id")
    },

    // --- q32: quality scoring — length / word-shape / stopword-ratio
    // heuristics, bucketed. Ratio arithmetic is written identically on
    // both engines (single IEEE division of identical operands).
    Q(
      "q32_quality_score",
      s"""WITH f AS (
         |  SELECT doc_id, ${oWords("text")} AS w,
         |         length(replace(${oNorm("text")}, ' ', '')) AS letters
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CAST(len(w) AS INTEGER) AS n_words,
         |  CAST(letters AS DOUBLE) / len(w) AS avg_word_len,
         |  CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
         |    / len(w) AS stop_ratio,
         |  CASE WHEN len(w) BETWEEN 20 AND 400
         |            AND CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(w) >= 0.02
         |       THEN 'good'
         |       WHEN len(w) >= 5 THEN 'fair'
         |       ELSE 'poor' END AS quality
         |FROM f
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val stops = Seq("the", "a", "of", "and", "to", "in", "is")
      val base = documents(s, d).select(
        col("doc_id"),
        words(col("text")).as("w"),
        length(regexp_replace(norm(col("text")), " ", "")).as("letters"))
      val stopRatio =
        size(filter(col("w"), x => x.isin(stops: _*))).cast("double") / size(col("w"))
      base.select(
          col("doc_id"),
          size(col("w")).as("n_words"),
          (col("letters").cast("double") / size(col("w"))).as("avg_word_len"),
          stopRatio.as("stop_ratio"),
          when(size(col("w")).between(20, 400) && stopRatio >= 0.02, "good")
            .when(size(col("w")) >= 5, "fair")
            .otherwise("poor").as("quality"))
        .orderBy("doc_id")
    },

    // --- q33: language-ID heuristic — stopword-hit voting per language
    // with a fixed priority tie-break. (The synthetic corpus is English
    // word salad, so this demonstrates the operator's mechanics, not its
    // accuracy.)
    Q(
      "q33_lang_id",
      s"""WITH f AS (
         |  SELECT doc_id, list_distinct(${oWords("text")}) AS w FROM documents
         |), h AS (
         |  SELECT doc_id,
         |    len(list_filter(w, x -> x IN ('the','a','of','and','to'))) AS hits_en,
         |    len(list_filter(w, x -> x IN ('der','die','das','und','ist'))) AS hits_de,
         |    len(list_filter(w, x -> x IN ('le','la','et','les','des'))) AS hits_fr,
         |    len(list_filter(w, x -> x IN ('el','los','una','por','con'))) AS hits_es
         |  FROM f
         |)
         |SELECT doc_id,
         |  CAST(hits_en AS INTEGER) AS hits_en, CAST(hits_de AS INTEGER) AS hits_de,
         |  CAST(hits_fr AS INTEGER) AS hits_fr, CAST(hits_es AS INTEGER) AS hits_es,
         |  CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'und'
         |       WHEN hits_en >= greatest(hits_de, hits_fr, hits_es) THEN 'en'
         |       WHEN hits_de >= greatest(hits_fr, hits_es) THEN 'de'
         |       WHEN hits_fr >= hits_es THEN 'fr'
         |       ELSE 'es' END AS pred_lang
         |FROM h
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      def hits(c: Column, ws: Seq[String]) =
        size(filter(c, x => x.isin(ws: _*)))
      val base = documents(s, d).select(
        col("doc_id"), array_distinct(words(col("text"))).as("w"))
      val (en, de, fr, es) = (
        hits(col("w"), Seq("the", "a", "of", "and", "to")),
        hits(col("w"), Seq("der", "die", "das", "und", "ist")),
        hits(col("w"), Seq("le", "la", "et", "les", "des")),
        hits(col("w"), Seq("el", "los", "una", "por", "con")))
      base.select(
          col("doc_id"),
          en.as("hits_en"), de.as("hits_de"), fr.as("hits_fr"), es.as("hits_es"))
        .withColumn("pred_lang",
          when(greatest(col("hits_en"), col("hits_de"), col("hits_fr"), col("hits_es")) === 0, "und")
            .when(col("hits_en") >= greatest(col("hits_de"), col("hits_fr"), col("hits_es")), "en")
            .when(col("hits_de") >= greatest(col("hits_fr"), col("hits_es")), "de")
            .when(col("hits_fr") >= col("hits_es"), "fr")
            .otherwise("es"))
        .orderBy("doc_id")
    },

    // --- q66: deterministic train/val/test split + per-split token
    // budget. Split assignment is a pure hash of the document id
    // (h60(id) mod 100 → 80/10/10), so it is reproducible across runs,
    // engines, and cluster sizes, needs no shuffle to assign, and any
    // future document lands in a stable split — the standard way a
    // 100 TB corpus is split without a global sort or sample().
    Q(
      "q66_hash_split",
      s"""WITH s AS (
         |  SELECT doc_id,
         |         ${oH60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
         |         len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens
         |  FROM documents
         |)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(ws_tokens) AS BIGINT) AS n_tokens,
         |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM s
         |GROUP BY 1
         |ORDER BY split""".stripMargin
    ) { (s, d) =>
      val bucket = h60(col("doc_id").cast("string")) % 100
      documents(s, d)
        .select(
          col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("ws_tokens"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("ws_tokens").as("n_tokens"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
        .orderBy("split")
    },

    // --- q34: document fingerprinting — whole-document 60-bit hash plus
    // the min shingle hash (a 1-permutation MinHash, the rolling-hash
    // analog). Deterministic md5-derived hashing (see Det.h60).
    Q(
      "q34_fingerprint",
      s"""WITH f AS (
         |  SELECT doc_id, ${oNorm("text")} AS nt, ${oWords("text")} AS w FROM documents
         |)
         |SELECT doc_id,
         |  ${oH60("nt")} AS fp_doc,
         |  list_min(list_transform(${oShingles("w")}, s -> ${oH60("s")})) AS fp_min_shingle
         |FROM f
         |WHERE len(w) >= 3
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"), norm(col("text")).as("nt"), words(col("text")).as("w"))
        .filter(size(col("w")) >= 3)
        .select(
          col("doc_id"),
          h60(col("nt")).as("fp_doc"),
          array_min(transform(shingles(col("w")), sh => h60(sh))).as("fp_min_shingle"))
        .orderBy("doc_id")
    }
  )
}
