package graft.ops

import org.apache.spark.sql.{Column, Encoder}
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

    // --- q67: TF-IDF-style term relevance, top-3 terms per document.
    // The idf surrogate ((N-df+1)·10⁶ ÷ (df+1), floored) is rational —
    // monotone in df exactly like log(N/df) but bit-identical across
    // engines, where a cross-engine `ln` could differ in the last ulp
    // and flip a ranking. Scale shape: explode → (doc,term) partial+
    // final count; df is a second agg keyed on term (its own shuffle —
    // vocab-sized, small relative to the corpus); N is a broadcast
    // 1-row join, never a driver collect; top-k runs as
    // WindowGroupLimit partial/final, so no doc's full term list is
    // ever sorted globally.
    Q(
      "q67_tfidf_topk",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${oWords("text")}) AS term FROM documents
         |), tf AS (
         |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
         |), df AS (
         |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
         |), n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |         tf.tf * CAST(floor((n.n_docs - df.df + 1) * 1000000.0 / (df.df + 1)) AS BIGINT) AS score
         |  FROM tf JOIN df USING (term) CROSS JOIN n
         |), ranked AS (
         |  SELECT *, CAST(ROW_NUMBER() OVER (
         |      PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rnk
         |  FROM scored
         |)
         |SELECT doc_id, rnk, term, tf, df, score
         |FROM ranked WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d)
      val tf = docs
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf") * floor((col("n_docs") - col("df") + 1) * lit(1000000.0) / (col("df") + 1)))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "tf", "df", "score")
        .orderBy("doc_id", "rnk")
    },

    // --- q123: Okapi BM25 retrieval scoring — the classic lexical
    // ranking a RAG/data-curation pipeline runs before (or alongside)
    // embedding search. k1=1.2, b=0.75 folded into exact integer
    // arithmetic: with k1=6/5, b=3/4 the saturation term
    // tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) equals
    // 44·tf·T / (20·T·tf + 6·T + 18·dl·N) after clearing denominators
    // (avgdl = T/N), and the idf keeps q67's rational floor surrogate —
    // monotone like ln((N−df+.5)/(df+.5)) but bit-identical across
    // engines. Every double intermediate stays < 2^53 (exact), so the
    // one IEEE division is deterministic on both engines. Scale shape:
    // explode → (doc,term) partial+final agg; the 4-term query and the
    // two 1-row corpus totals broadcast; per-term score joins df (vocab-
    // sized) and dl (doc-sized) on their natural keys; global top-10 is
    // TakeOrderedAndProject (no all-rows window).
    Q(
      "q123_bm25_topk",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${oWords("text")}) AS term FROM documents
         |), toks2 AS (
         |  SELECT doc_id, term FROM toks WHERE term <> ''
         |), tf AS (
         |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM toks2 GROUP BY doc_id, term
         |), dl AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
         |  FROM toks2 GROUP BY doc_id
         |), df AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
         |), corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_toks FROM toks2),
         |q AS (SELECT * FROM (VALUES ('data'), ('join'), ('vector'), ('scan')) AS q(term)),
         |scored AS (
         |  SELECT tf.doc_id,
         |         CAST(floor((n_docs - df + 1) * 1000000.0 / (df + 1)) AS BIGINT)
         |         * CAST(floor((44.0 * tf * t_toks * 1000000.0) /
         |             CAST(20 * t_toks * tf + 6 * t_toks + 18 * dl * n_docs AS DOUBLE)) AS BIGINT) AS s
         |  FROM tf JOIN q USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
         |  CROSS JOIN corpus CROSS JOIN tot
         |), doc_scores AS (
         |  SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score
         |  FROM scored GROUP BY doc_id
         |), ranked AS (
         |  SELECT doc_id, score, CAST(ROW_NUMBER() OVER (
         |      ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
         |  FROM doc_scores
         |)
         |SELECT rnk, doc_id, score FROM ranked WHERE rnk <= 10
         |ORDER BY rnk""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d)
      val toks = docs
        .select(col("doc_id"), explode(words(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tToks = toks.agg(count(lit(1)).as("t_toks"))
      import s.implicits._
      val q = Seq("data", "join", "vector", "scan").toDF("term")
      val scored = tf
        .join(broadcast(q), "term")
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(nDocs))
        .crossJoin(broadcast(tToks))
        .withColumn("s",
          floor((col("n_docs") - col("df") + 1) * lit(1000000.0) / (col("df") + 1)) *
          floor((lit(44.0) * col("tf") * col("t_toks") * lit(1000000.0)) /
            (lit(20L) * col("t_toks") * col("tf") + lit(6L) * col("t_toks") +
              lit(18L) * col("dl") * col("n_docs")).cast("double")))
      val w = Window.orderBy(col("score").desc, col("doc_id"))
      scored.groupBy("doc_id").agg(sum(col("s")).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(10)
        .withColumn("rnk", row_number().over(w))
        .select("rnk", "doc_id", "score")
        .orderBy("rnk")
    },

    // --- q68: repetition-based quality metrics (Gopher-style filters):
    // duplicate-word fraction and most-common-bigram share, with a
    // categorical verdict. The explode branch emits ONLY (doc_id,
    // bigram): any doc-level expression carried through a Generate ends
    // up in the projection above it and is re-evaluated once per
    // exploded row — measured 16× slower here (the regex tokenization
    // ran per bigram instead of per document). The per-doc word stats
    // are a separate cheap branch joined back after the bigram
    // aggregation has already reduced to one row per document.
    Q(
      "q68_rep_quality",
      s"""WITH f AS (
         |  SELECT doc_id, ${oWords("text")} AS w FROM documents
         |), base AS (
         |  SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS ndw,
         |         list_transform(range(len(w) - 1), i -> (w)[i+1] || ' ' || (w)[i+2]) AS bg
         |  FROM f WHERE len(w) >= 2
         |), ex AS (
         |  SELECT doc_id, nw, ndw, unnest(bg) AS b FROM base
         |), bc AS (
         |  SELECT doc_id, MAX(nw) AS nw, MAX(ndw) AS ndw, b, COUNT(*) AS c
         |  FROM ex GROUP BY doc_id, b
         |), agg AS (
         |  SELECT doc_id, MAX(nw) AS nw, MAX(ndw) AS ndw,
         |         MAX(c) AS top_bigram_count, COUNT(*) AS n_distinct_bigrams
         |  FROM bc GROUP BY doc_id
         |)
         |SELECT doc_id,
         |  CAST(nw AS INTEGER) AS n_words,
         |  CAST(ndw AS INTEGER) AS n_distinct_words,
         |  CAST(nw - ndw AS DOUBLE) / nw AS dup_word_frac,
         |  top_bigram_count,
         |  n_distinct_bigrams,
         |  CAST(top_bigram_count AS DOUBLE) / (nw - 1) AS top_bigram_share,
         |  CASE WHEN CAST(top_bigram_count AS DOUBLE) / (nw - 1) > 0.08
         |         OR CAST(nw - ndw AS DOUBLE) / nw > 0.55
         |       THEN 'repetitive' ELSE 'ok' END AS verdict
         |FROM agg
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val docsW = documents(s, d)
        .select(col("doc_id"), words(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
      val stats = docsW.select(
        col("doc_id"),
        size(col("w")).as("nw"),
        size(array_distinct(col("w"))).as("ndw"))
      val bc = docsW
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), size(col("w")) - 2),
          i => concat_ws(" ", element_at(col("w"), i + 1), element_at(col("w"), i + 2))
        )).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      val agg = bc.groupBy("doc_id")
        .agg(max("c").as("top_bigram_count"), count(lit(1)).as("n_distinct_bigrams"))
        .join(stats, "doc_id")
      val dupFrac = (col("nw") - col("ndw")).cast("double") / col("nw")
      val topShare = col("top_bigram_count").cast("double") / (col("nw") - 1)
      agg.select(
          col("doc_id"),
          col("nw").as("n_words"),
          col("ndw").as("n_distinct_words"),
          dupFrac.as("dup_word_frac"),
          col("top_bigram_count"),
          col("n_distinct_bigrams"),
          topShare.as("top_bigram_share"),
          when(topShare > 0.08 || dupFrac > 0.55, "repetitive")
            .otherwise("ok").as("verdict"))
        .orderBy("doc_id")
    },

    // --- q69: corpus vocabulary census — global term counts with a
    // parts-per-million share, top 100. The 100 TB wordcount: explode →
    // partial+final hash agg on term; the corpus-total token count is a
    // 1-row broadcast (never a second scan of the exploded data, never a
    // collect); final top-100 is TakeOrderedAndProject.
    Q(
      "q69_vocab_topk",
      s"""WITH toks AS (
         |  SELECT unnest(${oWords("text")}) AS term FROM documents
         |), tc AS (
         |  SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
         |), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM tc)
         |SELECT term, cnt,
         |       CAST(floor(cnt * 1000000.0 / total) AS BIGINT) AS share_ppm
         |FROM tc CROSS JOIN tot
         |ORDER BY cnt DESC, term
         |LIMIT 100""".stripMargin
    ) { (s, d) =>
      val tc = documents(s, d)
        .select(explode(words(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val tot = tc.agg(sum("cnt").as("total"))
      tc.crossJoin(broadcast(tot))
        .select(col("term"), col("cnt"),
          floor(col("cnt") * lit(1000000.0) / col("total")).as("share_ppm"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(100)
    },

    // --- q73: PII scrubbing — regex redaction of emails and phone
    // numbers with per-doc match counts and a scrubbed-text fingerprint
    // proving byte-identical redaction across engines. The corpus is
    // word salad, so deterministic synthetic PII (derived from doc_id)
    // is appended first — the scrubber provably removes what was
    // planted. Regexes use the Java∩RE2 common subset (character
    // classes + bounded quantifiers; no backrefs/lookaround), so Spark
    // and DuckDB compile identical automata. Pure map-side scan at
    // scale: no shuffle until the final ORDER BY.
    Q(
      "q73_pii_scrub",
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
         |         '@example.com or +1-555-01' || CAST(doc_id % 100 AS VARCHAR) AS t
         |  FROM documents
         |), scrubbed AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS INTEGER) AS n_emails,
         |    CAST(len(regexp_extract_all(t, '\\+[0-9][0-9-]{4,}[0-9]')) AS INTEGER) AS n_phones,
         |    regexp_replace(regexp_replace(t,
         |      '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
         |      '\\+[0-9][0-9-]{4,}[0-9]', '<PHONE>', 'g') AS clean
         |  FROM seeded
         |)
         |SELECT doc_id, n_emails, n_phones,
         |       CAST(length(clean) AS INTEGER) AS clean_len,
         |       md5(clean) AS clean_fp
         |FROM scrubbed
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\+[0-9][0-9-]{4,}[0-9]"
      documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com or +1-555-01"), (col("doc_id") % 100).cast("string")).as("t"))
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("t"), lit(phoneRe), lit(0))).as("n_phones"),
          regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("clean"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("clean")).as("clean_len"), md5(col("clean")).as("clean_fp"))
        .orderBy("doc_id")
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
    },

    // --- q77: sequence packing (concat-then-chunk): the pre-training
    // step that concatenates documents in a deterministic order and
    // slices the token stream into fixed context windows. Distributed
    // shape: documents are hash-sharded (here 4 shards; a cluster uses
    // thousands), each shard packs INDEPENDENTLY — packing is
    // inherently sequential, so the shard is the unit of parallelism
    // and the only coordination is the shard hash itself. Within a
    // shard, one window cumsum (single sort, spillable) assigns each
    // doc the context window its first token lands in. No driver
    // involvement at any width.
    Q(
      "q77_seq_packing",
      s"""WITH t AS (
         |  SELECT doc_id,
         |         ${oH60("CAST(doc_id AS VARCHAR)")} % 4 AS shard,
         |         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, shard, toks,
         |         CAST(SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM t
         |)
         |SELECT shard, (cum - toks) // 256 AS bin_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(toks) AS BIGINT) AS n_tokens,
         |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c
         |GROUP BY shard, bin_id
         |ORDER BY shard, bin_id""".stripMargin
    ) { (s, d) =>
      val t = documents(s, d).select(
        col("doc_id"),
        (h60(col("doc_id").cast("string")) % 4).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.withColumn("cum", sum("toks").over(w))
        .withColumn("bin_id", expr("(cum - toks) div 256"))
        .groupBy("shard", "bin_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("toks").as("n_tokens"),
          min("doc_id").as("first_doc"),
          max("doc_id").as("last_doc"))
        .orderBy("shard", "bin_id")
    },

    // --- q80: chunk-level (line-level) dedup — the C4/RefinedWeb move:
    // split every document into non-overlapping 20-word chunks, keep
    // only the corpus-wide FIRST occurrence of each chunk (min doc_id,
    // then min position), and reassemble documents from their surviving
    // chunks. The corpus is doubled with suffix-extended copies so
    // whole-prefix chunks provably dedup while each copy's modified
    // tail chunk survives. Scale shape: explode is linear in tokens;
    // the only shuffle is the chunk-hash grouping (same key shape as
    // exact dedup); reassembly groups by doc_id. No all-pairs anything.
    Q(
      "q80_chunk_dedup",
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, concat(text, ' zz unique tail marker') FROM documents
         |), w AS (
         |  SELECT doc_id, ${oWords("text")} AS w FROM corpus
         |), ch AS (
         |  SELECT doc_id, unnest(range(0, CAST(ceil(len(w)/20.0) AS BIGINT))) AS pos, w
         |  FROM w
         |), chunks AS (
         |  SELECT doc_id, pos,
         |         array_to_string(w[(pos*20+1):(pos*20+20)], ' ') AS chunk
         |  FROM ch
         |), ranked AS (
         |  SELECT doc_id, pos, chunk,
         |         ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
         |  FROM chunks
         |)
         |SELECT doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
         |       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '')) AS clean_fp
         |FROM ranked
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val docs = documents(s, d)
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zz unique tail marker")).as("text")))
      val chunks = corpus
        .select(col("doc_id"), words(col("text")).as("w"))
        // empty/whitespace-only docs: size(w)=0 would make the sequence
        // bound -1 and Spark's sequence(0,-1) runs BACKWARDS ([0,-1]),
        // fabricating phantom chunks; the oracle's range(0,0) is empty,
        // so drop wordless docs to match (same guard shape as q78's
        // h0<=h1)
        .filter(size(col("w")) >= 1)
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(0), ceil(size(col("w")) / 20.0).cast("int") - 1),
            i => array_join(slice(col("w"), i * 20 + 1, lit(20)), " "))))
        .select(col("doc_id"), col("pos"), col("col").as("chunk"))
      val ranked = chunks.withColumn("rn",
        row_number().over(Window.partitionBy("chunk").orderBy("doc_id", "pos")))
      ranked.groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(col("rn") === 1, struct(col("pos"), col("chunk"))))),
              x => x.getField("chunk")),
            " ")).as("clean_fp"))
        .orderBy("doc_id")
    },

    // --- q81: stratified (per-language) deterministic sampling — the
    // data-mixing primitive: rebalance a corpus by sampling each
    // stratum at its own rate, reproducibly (hash of doc id, not rand,
    // so the sample is stable across runs, engines, and cluster
    // sizes). The rate table is a broadcast-of-tiny join, never a
    // driver loop; the scan stays a single narrow pass.
    Q(
      "q81_stratified_sample",
      s"""WITH t AS (
         |  SELECT lang, source,
         |         CASE WHEN lang = 'en' THEN 250 ELSE 800 END AS permille,
         |         ${oH60("concat('sample:', CAST(doc_id AS VARCHAR))")} % 1000 AS bucket,
         |         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS toks
         |  FROM documents
         |)
         |SELECT lang, source,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN bucket < permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(SUM(CASE WHEN bucket < permille THEN toks ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM t
         |GROUP BY lang, source
         |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      // per-stratum rates as data, not code: a real pipeline feeds this
      // from a config table; broadcast keeps the join shuffle-free
      val rates = Seq(("en", 250)).toDF("lang", "rate_permille")
      documents(s, d)
        .join(broadcast(rates), Seq("lang"), "left")
        .withColumn("permille", coalesce(col("rate_permille"), lit(800)))
        .withColumn("bucket",
          h60(concat(lit("sample:"), col("doc_id").cast("string"))) % 1000)
        .withColumn("toks", size(split(trim(col("text")), "\\s+")).cast("long"))
        .groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("bucket") < col("permille"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("bucket") < col("permille"), col("toks")).otherwise(0L)).as("kept_tokens"))
        .orderBy("lang", "source")
    },

    // --- q85: train/test contamination audit over q66's deterministic
    // split — the eval-integrity check every training pipeline runs
    // before publishing a benchmark number. A test doc is contaminated
    // when it shares >= 3 distinct word-3-gram shingles with some train
    // doc. Scale shape: inverted index (shingle -> train docs) joined
    // by the test side's shingles — candidates meet only on shared
    // shingles, never test × train. The df <= 64 cap drops
    // non-discriminative hot shingles BEFORE the join (inert at this
    // corpus, max df 7, but it is the bound that keeps per-key fan-out
    // O(K) when a common trigram's df grows linearly with corpus size —
    // the same Σdf² blowup q42 avoids via LSH bands). The test side is
    // ~10% of the corpus, so the joined index stays test-sized.
    Q(
      "q85_contamination",
      s"""WITH w AS (
         |  SELECT doc_id, ${oWords("text")} AS w FROM documents
         |), sh AS (
         |  SELECT doc_id, unnest(list_distinct(${oShingles("w")})) AS s
         |  FROM w WHERE len(w) >= 3
         |), sp AS (
         |  SELECT doc_id,
         |         CASE WHEN ${oH60("CAST(doc_id AS VARCHAR)")} % 100 < 80 THEN 'train'
         |              WHEN ${oH60("CAST(doc_id AS VARCHAR)")} % 100 < 90 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM documents
         |), tr AS (
         |  SELECT sh.s, sh.doc_id FROM sh JOIN sp USING (doc_id) WHERE sp.split = 'train'
         |), te AS (
         |  SELECT sh.s, sh.doc_id FROM sh JOIN sp USING (doc_id) WHERE sp.split = 'test'
         |), keep AS (
         |  SELECT s FROM tr GROUP BY s HAVING COUNT(*) <= 64
         |), tsz AS (
         |  SELECT doc_id AS test_doc, COUNT(*) AS n_test_shingles FROM te GROUP BY doc_id
         |), ov AS (
         |  SELECT te.doc_id AS test_doc, tr.doc_id AS train_doc, COUNT(*) AS shared
         |  FROM te JOIN keep USING (s) JOIN tr USING (s)
         |  GROUP BY 1, 2
         |)
         |SELECT ov.test_doc, ov.train_doc, CAST(ov.shared AS BIGINT) AS shared,
         |       CAST(tsz.n_test_shingles AS BIGINT) AS n_test_shingles,
         |       CAST(ov.shared AS DOUBLE) / tsz.n_test_shingles AS contam_frac
         |FROM ov JOIN tsz USING (test_doc)
         |WHERE ov.shared >= 3
         |ORDER BY test_doc, train_doc""".stripMargin
    ) { (s, d) =>
      val bucket = h60(col("doc_id").cast("string")) % 100
      // the split-tagged shingle table feeds four branches (test side,
      // test sizes, train index, df cap) — persist it once, exactly the
      // materialized intermediate a 100 TB run would write (lazy, so
      // construction stays side-effect-free; CacheManager dedupes by
      // canonicalized plan)
      val sh = documents(s, d)
        .select(
          col("doc_id"),
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"),
          words(col("text")).as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), col("split"), explode(array_distinct(shingles(col("w")))).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tr = sh.filter(col("split") === "train").select(col("s"), col("doc_id").as("train_doc"))
      val te = sh.filter(col("split") === "test").select(col("s"), col("doc_id").as("test_doc"))
      val keep = tr.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 64).select("s")
      val tsz = te.groupBy("test_doc").agg(count(lit(1)).as("n_test_shingles"))
      te.join(keep, Seq("s"))
        .join(tr, Seq("s"))
        .groupBy("test_doc", "train_doc")
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
        .join(tsz, Seq("test_doc"))
        .select(
          col("test_doc"), col("train_doc"), col("shared"), col("n_test_shingles"),
          (col("shared").cast("double") / col("n_test_shingles")).as("contam_frac"))
        .orderBy("test_doc", "train_doc")
    },

    // --- q89: URL parsing / provenance rollup — every web-scale corpus
    // carries a source URL, and the first governance question is "how
    // many docs and tokens per registrable host". The URL here is
    // synthesized deterministically from the doc's metadata (the
    // corpus tables carry no raw URL) and then parsed BACK with
    // Spark's parse_url — the point under test is the extraction
    // operator, a codegen scalar, not the synthesis. Scale shape: pure
    // projection + one partial+final agg on host (cardinality =
    // |sources|, tiny); the per-doc URL never shuffles.
    Q(
      "q89_url_extract",
      """WITH u AS (
        |  SELECT doc_id, lang,
        |         'https://' || source || '.example.com/' || lang || '/doc/' ||
        |           CAST(doc_id AS VARCHAR) || '?ref=r' || CAST(doc_id % 7 AS VARCHAR) AS url,
        |         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS toks
        |  FROM documents
        |), p AS (
        |  SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |         regexp_extract(url, 'https?://[^/]+([^?]*)', 1) AS path,
        |         regexp_extract(url, 'ref=([^&]+)', 1) AS ref,
        |         lang, toks
        |  FROM u
        |)
        |SELECT host, ref,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |       MIN(path) AS first_path
        |FROM p
        |GROUP BY host, ref
        |ORDER BY host NULLS FIRST, ref NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val u = documents(s, d).select(
        col("doc_id"), col("lang"),
        concat(
          lit("https://"), col("source"), lit(".example.com/"), col("lang"), lit("/doc/"),
          col("doc_id").cast("string"), lit("?ref=r"), (col("doc_id") % 7).cast("string")).as("url"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      u.select(
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"),
          col("lang"), col("toks"))
        .groupBy("host", "ref")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct("lang").as("n_langs"),
          sum("toks").as("n_tokens"),
          min("path").as("first_path"))
        .orderBy("host", "ref")
    },

    // --- q98: out-of-vocabulary rate per source — the tokenizer-prep
    // question "how much of each slice does a fixed vocab NOT cover".
    // The vocab is the corpus top-100 (count desc, term asc tie-break —
    // q69's ranking made deterministic by the tie-break) and is by
    // construction tiny → broadcast to the token stream; membership is
    // a broadcast LEFT join null-check, the per-source rollup is one
    // partial+final agg. At 100 TB the vocab side is a real tokenizer's
    // fixed table (32k–256k rows — still broadcast-sized) and the token
    // stream never shuffles on the term.
    Q(
      "q98_oov_rate",
      s"""WITH toks AS (
         |  SELECT d.source, unnest(${oWords("d.text")}) AS term FROM documents d
         |), tc AS (
         |  SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
         |), vocab AS (
         |  SELECT term FROM tc ORDER BY cnt DESC, term LIMIT 100
         |)
         |SELECT t.source,
         |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         |       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS oov_rate
         |FROM toks t LEFT JOIN vocab v ON v.term = t.term
         |GROUP BY t.source
         |ORDER BY t.source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val toks = documents(s, d)
        .select(col("source"), explode(words(col("text"))).as("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(100)
        .select(col("term").as("vterm"))
      toks
        .join(broadcast(vocab), col("term") === col("vterm"), "left")
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("vterm").isNull, 1L).otherwise(0L)).as("n_oov"),
          (sum(when(col("vterm").isNull, 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("oov_rate"))
        .orderBy("source")
    },

    // --- q101: data-mixture planning — given per-source mixture
    // weights and a global token budget, compute each source's target
    // token allocation, its sampling rate (< 1 = downsample), and its
    // oversampling factor (> 1 = repeat for multiple epochs). This is
    // the allocation table a training-data pipeline materializes before
    // building a mixture; the sampling itself is q81's deterministic
    // hash gate. Scale shape: one partial-agg pass over the corpus to
    // source-level rows, then a #sources-sized window for the totals —
    // nothing data-sized ever moves twice. Determinism: counts are
    // exact BIGINTs; the budget split is a single IEEE division of
    // exact-by-2⁵³ doubles (identical in any engine), floored back to
    // integer tokens.
    Q(
      "q101_mixture_weights",
      """WITH per_src AS (
        |  SELECT source,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS toks,
        |    CASE WHEN TRY_CAST(substr(source, 4) AS INTEGER) % 2 = 0 THEN 2 ELSE 1 END AS w
        |  FROM documents GROUP BY source
        |), tot AS (
        |  SELECT *,
        |    SUM(toks) OVER () AS total_toks,
        |    SUM(w) OVER () AS sum_w
        |  FROM per_src
        |)
        |SELECT source, n_docs, toks, CAST(w AS INTEGER) AS weight,
        |  CAST(floor(floor(0.6 * total_toks) * w / sum_w) AS BIGINT) AS target_toks,
        |  ROUND(LEAST(1.0, floor(floor(0.6 * total_toks) * w / sum_w) / toks), 12)
        |    AS sample_rate,
        |  ROUND(floor(floor(0.6 * total_toks) * w / sum_w) / toks, 12) AS epochs
        |FROM tot
        |ORDER BY source NULLS FIRST""".stripMargin
    ) { (s, d) =>
      val perSrc = documents(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("toks"))
        // weight as derived config (even-numbered sources get 2×): in a
        // real pipeline this is a broadcast config table, as in q81.
        // try_cast, not cast: a non-numeric source suffix is a weight-1
        // stratum, never a pipeline abort (ANSI cast would raise)
        .withColumn("w",
          when(expr("try_cast(substring(source, 4, 10) AS INT)") % 2 === 0, 2)
            .otherwise(1))
      val wAll = Window.partitionBy()
      val target = floor(floor(lit(0.6) * sum("toks").over(wAll)) * col("w") /
        sum("w").over(wAll))
      perSrc
        .select(col("source"), col("n_docs"), col("toks"), col("w").as("weight"),
          target.cast("long").as("target_toks"),
          round(least(lit(1.0), target / col("toks")), 12).as("sample_rate"),
          round(target / col("toks"), 12).as("epochs"))
        .orderBy("source")
    },

    // --- q106: exact heavy hitters via a mergeable Misra-Gries sketch
    // ([[graft.functions.MisraGries]]) — the 100 TB way to find every
    // token above a frequency threshold: pass 1 aggregates at most
    // k=255 counters per partition (map-side combine, one sketch row
    // per partition shuffled — never the token stream), guaranteed to
    // retain every term with freq > N/256; pass 2 exact-counts ONLY the
    // <= 255 candidates (broadcast semi-filter, candidate-sized
    // shuffle) and thresholds at N/100 > N/256. The output is therefore
    // EXACT and independent of sketch merge order — a naive global
    // groupBy(term) would shuffle every distinct token instead. The
    // token scan is shared by both passes via a lazy persist.
    Q(
      "q106_heavy_hitters",
      s"""WITH w AS (
         |  SELECT unnest(${oWords("text")}) AS term FROM documents
         |), tot AS (
         |  SELECT COUNT(*) AS total FROM w
         |), c AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY term
         |)
         |SELECT term, cnt, CAST(cnt AS DOUBLE) / total AS freq
         |FROM c, tot
         |WHERE cnt > total / 100.0
         |ORDER BY cnt DESC, term""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val toks = documents(s, d)
        .select(explode(words(col("text"))).as("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mg = new graft.functions.MisraGries(255, implicitly[Encoder[Seq[String]]])
      val cands = toks.as[String].select(mg.toColumn.name("cands"))
        .select(explode(col("cands")).as("cand"))
      val total = toks.agg(count(lit(1)).as("total"))
      toks
        .join(broadcast(cands), col("term") === col("cand"), "left_semi")
        .groupBy("term")
        .agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .filter(col("cnt") > col("total") / 100.0)
        .select(col("term"), col("cnt"),
          (col("cnt").cast("double") / col("total")).as("freq"))
        .orderBy(col("cnt").desc, col("term"))
    },

    // --- q108: bigram-LM quality scoring — the perplexity-style
    // quality filter (CCNet/Gopher lineage): train a bigram model ON
    // the corpus (one aggregation pass), score every document by how
    // predictable its word transitions are under that model. Scored as
    // mean/min conditional probability p(w2|w1) = c(w1,w2)/c(w1,·)
    // rather than mean log-prob: the integer-ratio IEEE division is
    // bit-identical across engines, while ln() is libm-dependent — the
    // score is order-equivalent for gating. Scale shape: the model is
    // vocabulary²-bounded (far below corpus-sized) and builds with
    // map-side combine; scoring is ONE equi-shuffle of the corpus
    // bigram stream against the model on (w1, w2) — no broadcast
    // assumption (AQE may still choose one when the model fits), no
    // window over the corpus. The unigram normalizer folds into the
    // model table with a vocabulary-keyed window, so the corpus joins
    // once, not twice. Mean is a decimal-exact dsum (order/partition
    // independent); min is order-free by definition.
    Q(
      "q108_lm_quality",
      s"""WITH t AS (
         |  SELECT doc_id, ${oWords("text")} AS w FROM documents
         |  WHERE len(${oWords("text")}) >= 2
         |), bg AS (
         |  SELECT doc_id, unnest(range(1, len(w))) AS g, w FROM t
         |), pairs AS (
         |  SELECT doc_id, w[g] AS w1, w[g + 1] AS w2 FROM bg
         |), model AS (
         |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM pairs GROUP BY w1, w2
         |), norm AS (
         |  SELECT w1, w2, cb, SUM(cb) OVER (PARTITION BY w1) AS cu FROM model
         |), p AS (
         |  SELECT pairs.doc_id,
         |         CAST(cb AS DOUBLE) / CAST(cu AS DOUBLE) AS p
         |  FROM pairs JOIN norm USING (w1, w2)
         |)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  ${oAvg("p")} AS avg_p,
         |  MIN(p) AS min_p
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // bigram stream feeds the model build AND the scoring join — lazy
      // persist, same materialize-once pattern as q42/q106 (at 100 TB
      // this is the intermediate the pipeline would write)
      val pairs = documents(s, d)
        .select(col("doc_id"), words(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          explode(sequence(lit(1), size(col("w")) - 1)).as("g"), col("w"))
        .select(col("doc_id"),
          element_at(col("w"), col("g")).as("w1"),
          element_at(col("w"), col("g") + lit(1)).as("w2"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val model = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        .withColumn("cu", sum("cb").over(Window.partitionBy("w1")))
      pairs.join(model, Seq("w1", "w2"))
        .withColumn("p", col("cb").cast("double") / col("cu").cast("double"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          davg(col("p")).as("avg_p"),
          min(col("p")).as("min_p"))
        .orderBy("doc_id")
    }
  )
}
