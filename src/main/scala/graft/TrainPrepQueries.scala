package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.queries.{QueryDef, Tables}
import graft.trainprep.{CorpusOverlap, TrainPrep}

/** Training-corpus preparation queries (TF-IDF, deterministic sampling, PII
  * redaction, sequence packing, corpus composition) plus the oracle-gated
  * streaming parity runs — every entry has a DuckDB oracle, so streaming
  * and train-prep correctness are CORRECTNESS rows, not just specs.
  */
object TrainPrepQueries {
  import Tables.t

  /** tokenCount's SQL twin (see TextFunctions.tokenCount / q_text_quality). */
  private val nTokSql =
    """(CASE WHEN length(text) = 0 THEN 0
      |  ELSE length(text) - length(replace(text, ' ', '')) + 1 END)""".stripMargin

  // shared by q_lm_backoff and its streaming twin
  private val lmBackoffOracle: String =
    """WITH tr_d AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
      |  FROM documents WHERE doc_id < 150),
      |sc_d AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
      |  FROM documents WHERE doc_id < 300),
      |uni AS (SELECT w, count(*)::BIGINT AS c
      |  FROM (SELECT unnest(ws) AS w FROM tr_d) GROUP BY w),
      |tot AS (SELECT count(*)::BIGINT AS t
      |  FROM (SELECT unnest(ws) AS w FROM tr_d)),
      |bi AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM (
      |    SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM tr_d,
      |      LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u)
      |  GROUP BY 1, 2),
      |sct AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM sc_d,
      |  LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u),
      |s AS (SELECT sct.doc_id,
      |    CASE WHEN bi.c12 IS NOT NULL
      |      THEN bi.c12::DOUBLE / u1.c::DOUBLE
      |      ELSE 0.4 * coalesce(u2.c, 1)::DOUBLE / tot.t::DOUBLE END AS sc,
      |    CASE WHEN bi.c12 IS NULL THEN 1.0 ELSE 0.0 END AS bo
      |  FROM sct LEFT JOIN bi ON sct.w1 = bi.w1 AND sct.w2 = bi.w2
      |    LEFT JOIN uni u1 ON sct.w1 = u1.w
      |    LEFT JOIN uni u2 ON sct.w2 = u2.w, tot)
      |SELECT doc_id, count(*)::BIGINT AS n_trans,
      |  round(avg(bo), 6) AS backoff_rate,
      |  round(avg(-ln(sc)), 6) AS avg_nll
      |FROM s GROUP BY doc_id""".stripMargin

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- TF-IDF weighting: explode → 2 hash-aggs → vocab-sized join ------
    "q_tfidf" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 100)
        TrainPrep.tfIdf(docs, "doc_id", "text")
          .select(col("doc_id"), col("token"), col("tf"), col("df"),
            round(col("idf"), 5).as("idf"), round(col("tfidf"), 5).as("tfidf"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |  FROM documents WHERE doc_id < 100),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
             |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents WHERE doc_id < 100)
             |SELECT doc_id, token, tf, df,
             |  round(ln((n + 1.0) / (df + 1.0)), 5) AS idf,
             |  round(tf * ln((n + 1.0) / (df + 1.0)), 5) AS tfidf
             |FROM tf JOIN df USING (token) CROSS JOIN n""".stripMargin)),

    // ---- BM25 ranked retrieval: ONE 1-row stats aggregate (N + avgdl +
    // per-term df as fused conditional sums) broadcast onto one scoring
    // scan with in-row tf filter-counts; top-k is TakeOrdered. The oracle
    // replays the identical arithmetic tree (assoc order matters for
    // float-exact compare) -------------------------------------------------
    "q_bm25" -> QueryDef(
      (s, dir) => TrainPrep.bm25TopK(
        t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("vector", "join", "scan"), k = 10),
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |st AS (SELECT count(*)::DOUBLE AS n, avg(len(toks)) AS avgdl,
             |  sum(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END)::DOUBLE AS df0,
             |  sum(CASE WHEN list_contains(toks, 'join') THEN 1 ELSE 0 END)::DOUBLE AS df1,
             |  sum(CASE WHEN list_contains(toks, 'scan') THEN 1 ELSE 0 END)::DOUBLE AS df2
             |  FROM d),
             |tfs AS (SELECT doc_id, len(toks)::DOUBLE AS dl,
             |  len(list_filter(toks, x -> x = 'vector'))::DOUBLE AS tf0,
             |  len(list_filter(toks, x -> x = 'join'))::DOUBLE AS tf1,
             |  len(list_filter(toks, x -> x = 'scan'))::DOUBLE AS tf2
             |  FROM d),
             |s AS (SELECT doc_id,
             |    ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |  + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
             |  + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS score
             |  FROM tfs CROSS JOIN st)
             |SELECT doc_id, round(score, 5) AS score FROM s
             |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin)),

    // ---- deterministic hash sampling: pure pushable filter, no RNG -------
    "q_sample_hash" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .filter(TrainPrep.hashSampleFilter(col("doc_id"), "15"))
          .select("doc_id", "source"),
      Some("""SELECT doc_id, source FROM documents
             |WHERE substr(sha256(doc_id::VARCHAR), 1, 2) < '15'""".stripMargin)),

    "q_sample_stratified" -> QueryDef(
      (s, dir) =>
        t(s, dir, "documents")
          .filter(TrainPrep.stratifiedSampleFilter(col("doc_id"), col("lang"),
            Seq("en" -> "40", "de" -> "20")))
          .select("doc_id", "lang"),
      Some("""SELECT doc_id, lang FROM documents
             |WHERE (lang = 'en' AND substr(sha256(doc_id::VARCHAR), 1, 2) < '40')
             |   OR (lang = 'de' AND substr(sha256(doc_id::VARCHAR), 1, 2) < '20')""".stripMargin)),

    // ---- PII redaction: RE2-compatible replace-all -----------------------
    "q_pii_redact" -> QueryDef(
      (s, dir) => {
        val synth = concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com tel 555-1234 from 10.20."), col("doc_id"),
          lit(".1 card 4111 1111 1111 111"), pmod(col("doc_id"), lit(10)),
          lit(" and 4000-1234-5678-9010"))
        t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), TrainPrep.redactPii(synth).as("redacted"))
      },
      Some("""SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             |    text || ' contact user' || doc_id || '@mail.example.com tel 555-1234'
             |      || ' from 10.20.' || doc_id || '.1 card 4111 1111 1111 111'
             |      || doc_id % 10 || ' and 4000-1234-5678-9010',
             |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
             |  '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
             |  '\b[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}\b', '<CARD>', 'g'),
             |  '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
             |FROM documents WHERE doc_id < 200""".stripMargin)),

    // ---- concat-then-chunk sequence packing (distributed prefix scan) ----
    "q_pack_chunks" -> QueryDef(
      (s, dir) =>
        TrainPrep.packChunks(t(s, dir, "documents"), "doc_id", "text", 4096L),
      Some(s"""WITH tokc AS (SELECT doc_id, $nTokSql::BIGINT AS n_tokens
              |  FROM documents),
              |cum AS (SELECT doc_id, n_tokens,
              |  sum(n_tokens) OVER (ORDER BY doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
              |  FROM tokc)
              |SELECT doc_id, n_tokens, (cum_tokens - n_tokens) AS start_offset,
              |  floor((cum_tokens - n_tokens) / 4096.0)::BIGINT AS chunk_id,
              |  floor(greatest(cum_tokens - 1, cum_tokens - n_tokens) / 4096.0)::BIGINT
              |    AS chunk_end_id
              |FROM cum""".stripMargin)),

    // ---- NO-SPLIT greedy packing (atomic samples, bounded groups) --------
    // packChunks' complement: docs never split across sequences; greedy
    // first-fit in deterministic global-rank order within 64-doc groups
    // (bins never cross groups — the bounded sequential scope); every
    // doc's bin replayed through a DuckDB recursive CTE running the same
    // fold
    "q_pack_nosplit" -> QueryDef(
      (s, dir) => TrainPrep.packNoSplit(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
        contextTokens = 256L, groupSize = 64),
      Some(s"""WITH RECURSIVE d AS (SELECT doc_id, $nTokSql::BIGINT AS n
              |  FROM documents WHERE doc_id < 300),
              |g AS (SELECT doc_id, n,
              |    row_number() OVER (ORDER BY doc_id) - 1 AS gid FROM d),
              |gg AS (SELECT doc_id, n, (gid // 64)::BIGINT AS grp,
              |    row_number() OVER (PARTITION BY gid // 64 ORDER BY gid) AS rn
              |  FROM g),
              |rec AS (
              |  SELECT grp, rn, doc_id, n, n AS filled, 0::BIGINT AS bin
              |    FROM gg WHERE rn = 1
              |  UNION ALL
              |  SELECT gg.grp, gg.rn, gg.doc_id, gg.n,
              |    CASE WHEN rec.filled > 0 AND rec.filled + gg.n > 256
              |      THEN gg.n ELSE rec.filled + gg.n END,
              |    CASE WHEN rec.filled > 0 AND rec.filled + gg.n > 256
              |      THEN rec.bin + 1 ELSE rec.bin END
              |  FROM rec JOIN gg ON gg.grp = rec.grp AND gg.rn = rec.rn + 1)
              |SELECT doc_id, n AS n_tokens, grp, bin AS bin_in_grp
              |FROM rec""".stripMargin)),

    // ---- first-fit-DECREASING packing (orderBy = lengthDesc) -------------
    // classic FFD inside the same bounded groups: docs fold in
    // (length DESC, rank ASC) order and each takes the FIRST open bin
    // with room (the id-order variant is streaming next-fit — one open
    // bin). Long docs place first, short ones backfill the gaps —
    // packNoSplitReport measures the padding delta (README table). The
    // oracle carries the per-bin fill LIST through the recursive CTE and
    // runs the identical first-fit probe with list_filter.
    "q_pack_nosplit_ffd" -> QueryDef(
      (s, dir) => TrainPrep.packNoSplit(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
        contextTokens = 256L, groupSize = 64, orderBy = "lengthDesc"),
      Some(s"""WITH RECURSIVE d AS (SELECT doc_id, $nTokSql::BIGINT AS n
              |  FROM documents WHERE doc_id < 300),
              |g AS (SELECT doc_id, n,
              |    row_number() OVER (ORDER BY doc_id) - 1 AS gid FROM d),
              |gg AS (SELECT doc_id, n, (gid // 64)::BIGINT AS grp,
              |    row_number() OVER (PARTITION BY gid // 64
              |      ORDER BY n DESC, gid) AS rn
              |  FROM g),
              |rec AS (
              |  SELECT grp, rn, doc_id, n, [n] AS fills, 0::BIGINT AS bin
              |    FROM gg WHERE rn = 1
              |  UNION ALL
              |  SELECT gg.grp, gg.rn, gg.doc_id, gg.n,
              |    CASE WHEN fit.i IS NULL THEN list_append(rec.fills, gg.n)
              |      ELSE list_transform(range(1, len(rec.fills) + 1),
              |        j -> CASE WHEN j = fit.i THEN rec.fills[j] + gg.n
              |             ELSE rec.fills[j] END) END,
              |    (coalesce(fit.i, len(rec.fills) + 1) - 1)::BIGINT
              |  FROM rec JOIN gg ON gg.grp = rec.grp AND gg.rn = rec.rn + 1,
              |  LATERAL (SELECT list_filter(range(1, len(rec.fills) + 1),
              |    j -> rec.fills[j] + gg.n <= 256)[1] AS i) fit)
              |SELECT doc_id, n AS n_tokens, grp, bin AS bin_in_grp
              |FROM rec""".stripMargin)),

    // ---- needle-in-a-haystack synthesis (long-context eval prep) ---------
    // needle 'the secret code is k<doc·31+di>' planted at 5 depths per
    // doc; the whole haystack TEXT plus the needle's word offset is
    // hash-compared verbatim, so splice arithmetic cannot drift
    "q_needle_haystack" -> QueryDef(
      (s, dir) => TrainPrep.needleHaystack(
        t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text"),
      Some("""WITH d AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
             |  FROM documents WHERE doc_id < 200),
             |x AS (SELECT doc_id, ws, di, f,
             |    floor(f * len(ws))::BIGINT AS p,
             |    'the secret code is k' || (doc_id * 31 + di) AS needle
             |  FROM d CROSS JOIN (VALUES (0, 0.0), (1, 0.25), (2, 0.5),
             |    (3, 0.75), (4, 1.0)) v(di, f))
             |SELECT doc_id, di::BIGINT AS depth_idx, f AS depth_frac,
             |  len(ws)::BIGINT AS n_words, p AS needle_start_word, needle,
             |  array_to_string(list_concat(list_concat(
             |    ws[1:p], [needle]), ws[p+1:]), ' ') AS haystack
             |FROM x""".stripMargin)),

    // ---- best-of-n rejection sampling (winner + runner-up margin) --------
    // 50 prompts × 6 scored candidates; winner = max score with the
    // lower-candidate tiebreak, margin = best − runner-up (NULL when no
    // runner-up); scores k/13 never hit a rounding tie
    "q_best_of_n" -> QueryDef(
      (s, dir) => graft.trainprep.SftPrep.bestOfN(
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          pmod(col("doc_id"), lit(50)).as("prompt_id"),
          col("doc_id").as("cand"),
          (pmod(col("doc_id") * 7, lit(13)).cast("double") / 13.0).as("score")),
        "prompt_id", "cand", "score"),
      Some("""WITH c AS (SELECT doc_id % 50 AS prompt_id, doc_id AS cand,
             |    round((doc_id * 7 % 13) / 13.0, 6) AS score
             |  FROM documents WHERE doc_id < 300),
             |r AS (SELECT prompt_id, cand, score,
             |    row_number() OVER (PARTITION BY prompt_id
             |      ORDER BY score DESC, cand ASC) AS rk
             |  FROM c)
             |SELECT prompt_id,
             |  max(CASE WHEN rk = 1 THEN cand END) AS best_cand,
             |  max(CASE WHEN rk = 1 THEN score END) AS best_score,
             |  count(*)::BIGINT AS n_cands,
             |  CASE WHEN count(*) > 1 THEN
             |    max(CASE WHEN rk = 1 THEN score END)
             |      - max(CASE WHEN rk = 2 THEN score END) END AS margin
             |FROM r GROUP BY 1""".stripMargin)),

    // ---- stride-scheduled source interleave (the data-loader order) ------
    // Waldspurger-style stride scheduling: item n of source s at pass
    // (n+0.5)/w_s, merged order = sort by pass — every prefix holds the
    // weighted mix, no RNG, reproducible and resumable; weights derived
    // from the source name so both engines compute them without a dim
    "q_mix_interleave" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.strideInterleave(
        t(s, dir, "documents").filter(col("doc_id") < 300)
          .withColumn("w", lit(1.0) + pmod(length(col("source")), lit(3))),
        "doc_id", "source", "w"),
      Some("""WITH d AS (SELECT doc_id, source,
             |    1.0 + length(source) % 3 AS w
             |  FROM documents WHERE doc_id < 300),
             |r AS (SELECT doc_id, source, w,
             |    row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
             |      AS rin FROM d)
             |SELECT doc_id, source, rin AS rank_in_source,
             |  row_number() OVER (ORDER BY (rin + 0.5) / w, source, doc_id) - 1
             |    AS mix_rank
             |FROM r""".stripMargin)),

    // ---- decontamination: training × benchmark word-n-gram overlap -------
    // GPT-3-style eval-set contamination check: docs < 50 stand in for the
    // benchmark, docs in [100, 600) for the training corpus; any shared
    // 8-gram is a contamination pair. The benchmark side broadcasts; the
    // training side is one scan pass.
    "q_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TrainPrep.contaminationPairs(
          docs.filter(col("doc_id") >= 100 && col("doc_id") < 600), "doc_id", "text",
          docs.filter(col("doc_id") < 50), "doc_id", "text",
          n = 8)
      },
      Some("""WITH tr AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE doc_id >= 100 AND doc_id < 600),
             |trs AS (SELECT doc_id AS train_id,
             |    array_to_string(tk[i:i+7], ' ') AS shingle
             |  FROM tr, UNNEST(generate_series(1, greatest(len(tk) - 7, 0))) AS t(i)),
             |be AS (SELECT doc_id, string_split(text, ' ') AS tk
             |  FROM documents WHERE doc_id < 50),
             |bes AS (SELECT DISTINCT doc_id AS bench_id,
             |    array_to_string(tk[i:i+7], ' ') AS shingle
             |  FROM be, UNNEST(generate_series(1, greatest(len(tk) - 7, 0))) AS t(i))
             |SELECT DISTINCT train_id, bench_id
             |FROM trs JOIN bes USING (shingle)""".stripMargin)),

    // ---- snapshot delta: incremental-ingest primitive --------------------
    // v2 is derived from v1 identically in both engines: every 7th doc
    // removed, every 5th survivor edited, 50 fresh ids appended. Digest
    // full-outer join on (id, sha256) — text never shuffles
    "q_corpus_delta" -> QueryDef(
      (s, dir) => {
        val v1 = t(s, dir, "documents")
        val v2 = v1.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" EDIT"))).otherwise(col("text")))
          .unionByName(v1.filter(col("doc_id") < 50)
            .withColumn("doc_id", col("doc_id") + 200000L))
        TrainPrep.corpusDelta(v1, v2, "doc_id", "text")
      },
      Some("""WITH v2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN text || ' EDIT' ELSE text END
             |      AS text, lang, source, n_chars
             |  FROM documents WHERE doc_id % 7 <> 0
             |  UNION ALL
             |  SELECT doc_id + 200000, text, lang, source, n_chars
             |  FROM documents WHERE doc_id < 50)
             |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
             |  CASE WHEN a.doc_id IS NULL THEN 'added'
             |       WHEN b.doc_id IS NULL THEN 'removed'
             |       WHEN a.text <> b.text THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id""".stripMargin)),

    // ---- corpus composition: filter → dedup → per-source stats -----------
    "q_corpus_stats" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("lang") === "en")
          .filter(round(TextFunctions.qualityScore(col("text")), 6) >= 0.5)
        // exact-dedup keeper per text hash, then per-source corpus stats
        val keepers = docs
          .withColumn("__h", sha2(col("text"), 256))
          .withColumn("__keep", min("doc_id").over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
          .filter(col("doc_id") === col("__keep"))
        keepers.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text"))).as("total_tokens"),
          round(avg(length(col("text"))), 4).as("avg_chars"))
      },
      Some(s"""WITH q AS (SELECT doc_id, text, source, round(
              |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
              |  (CASE WHEN (length(text)::DOUBLE - ($nTokSql - 1)) / $nTokSql
              |     BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.4
              |  + least(len(list_filter(string_split(text, ' '),
              |      w -> w IN ('the','a','of','and','to','is','in')))::DOUBLE
              |      / $nTokSql * 5.0, 1.0) * 0.4
              |  + (CASE WHEN (length(text) - length(replace(replace(replace(replace(replace(text,
              |      '.',''), ',',''), '!',''), '?',''), ';','')))::DOUBLE
              |      / length(text)::DOUBLE <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2
              |  END, 6) AS quality
              |  FROM documents WHERE lang = 'en'),
              |f AS (SELECT * FROM q WHERE quality >= 0.5),
              |k AS (SELECT *, min(doc_id) OVER (PARTITION BY sha256(text)) AS keep
              |  FROM f)
              |SELECT source, count(*) AS n_docs,
              |  sum($nTokSql)::BIGINT AS total_tokens,
              |  round(avg(length(text)), 4) AS avg_chars
              |FROM k WHERE doc_id = keep GROUP BY source""".stripMargin)),

    // ---- temperature-weighted corpus mixing (XLM-R / mC4 sampler) --------
    // alpha=0.5 flattens the language distribution toward low-resource
    // langs; target 120 of 500 docs. Both engines derive the same
    // 4-hex-digit threshold from round(rate, 6), then the same
    // deterministic sha256 row sample.
    "q_mix_temperature" -> QueryDef(
      (s, dir) =>
        TrainPrep.temperatureMix(t(s, dir, "documents"), "doc_id", "lang",
            alpha = 0.5, targetTotal = 120.0)
          .select("doc_id", "lang"),
      Some("""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
             |tot AS (SELECT sum(pow(cnt::DOUBLE, 0.5)) AS wsum FROM c),
             |thr AS (SELECT lang,
             |    CASE WHEN least(1.0, 120.0 * (pow(cnt::DOUBLE, 0.5) / wsum) / cnt) >= 1.0
             |      THEN 'g'
             |      ELSE lpad(lower(to_hex(floor(round(
             |        least(1.0, 120.0 * (pow(cnt::DOUBLE, 0.5) / wsum) / cnt),
             |        6) * 65536)::BIGINT)), 4, '0') END AS t
             |  FROM c, tot)
             |SELECT doc_id, lang FROM documents JOIN thr USING (lang)
             |WHERE substr(sha256(doc_id::VARCHAR), 1, 4) < t""".stripMargin)),

    // ---- corpus-wide frequent n-gram mining (boilerplate detection) ------
    "q_ngram_freq" -> QueryDef(
      (s, dir) =>
        TrainPrep.frequentNgrams(t(s, dir, "documents"), "doc_id", "text",
          n = 3, k = 20),
      Some("""WITH tr AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |sh AS (SELECT array_to_string(tk[i:i+2], ' ') AS ngram
             |  FROM tr, UNNEST(generate_series(1, greatest(len(tk) - 2, 0))) AS t(i))
             |SELECT ngram, count(*) AS cnt FROM sh GROUP BY 1
             |ORDER BY cnt DESC, ngram LIMIT 20""".stripMargin)),

    // ---- char-trigram LM quality scoring (CCNet-style, self-trained) -----
    "q_lm_trigram" -> QueryDef(
      (s, dir) =>
        TrainPrep.charTrigramNll(t(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH tri AS (SELECT doc_id, substr(text, i, 3) AS tri
             |  FROM documents, UNNEST(generate_series(1, greatest(length(text) - 2, 0))) AS t(i)),
             |cnt AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY 1),
             |pre AS (SELECT substr(tri, 1, 2) AS big, sum(c3) AS c2 FROM cnt GROUP BY 1),
             |v AS (SELECT count(*) AS vsz FROM cnt),
             |scored AS (SELECT t.doc_id, ln((c.c3 + 1.0) / (p.c2 + v.vsz)) AS lp
             |  FROM tri t JOIN cnt c USING (tri) JOIN pre p ON substr(t.tri, 1, 2) = p.big, v)
             |SELECT doc_id, count(*) AS n_trigrams, round(-avg(lp), 4) AS avg_nll
             |FROM scored GROUP BY 1""".stripMargin)),

    // ---- contiguous global ids (two-pass scan, no global-sort window) ----
    "q_global_ids" -> QueryDef(
      (s, dir) =>
        TrainPrep.assignGlobalIds(t(s, dir, "documents"), Seq("doc_id"))
          .select("doc_id", "gid"),
      Some("""SELECT doc_id,
             |  (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS gid
             |FROM documents""".stripMargin)),

    // ---- per-group top-k tokens: slice-level vocabulary monitoring — one
    // map-side-combined (lang, token) aggregate, rank window per group ----
    "q_top_tokens_group" -> QueryDef(
      (s, dir) => CorpusOverlap.topTokensPerGroup(
        t(s, dir, "documents"), "lang", "text", k = 5),
      Some("""WITH c AS (SELECT lang, unnest(string_split(text, ' ')) AS token
             |  FROM documents),
             |n AS (SELECT lang, token, count(*) AS cnt FROM c GROUP BY 1, 2),
             |r AS (SELECT lang, token, cnt,
             |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS rank
             |  FROM n)
             |SELECT lang, token, cnt, CAST(rank AS INT) AS rank
             |FROM r WHERE rank <= 5""".stripMargin)),

    // ---- deterministic per-epoch training order: rank by sha256(epoch:id)
    // (fresh uniform permutation every epoch, reproducible on any layout);
    // rank materializes via the bucketed two-pass scan, never a
    // single-partition global sort; shard is epoch-stable ------------------
    "q_epoch_order" -> QueryDef(
      (s, dir) => TrainPrep.epochOrder(
        t(s, dir, "documents").select("doc_id"), "doc_id", epoch = 3, nShards = 8)
        .select("doc_id", "epoch_rank", "shard"),
      Some("""SELECT doc_id,
             |  (row_number() OVER (ORDER BY sha256(concat('3:', doc_id::VARCHAR))) - 1)::BIGINT
             |    AS epoch_rank,
             |  CAST(('0x' || substr(sha256(doc_id::VARCHAR), 1, 4)) AS BIGINT) % 8 AS shard
             |FROM documents""".stripMargin)),

    // ---- SCD-2 dimension history: observations -> per-key validity
    // intervals [effective_from, effective_to), unchanged re-observations
    // collapse; ONE per-key exchange carries the change lag, the version
    // scan, the collapse and the effective_to lead --------------------------
    "q_dim_history" -> QueryDef(
      (s, dir) => {
        val obs = Tables.events(s, dir)
          .filter(col("user_id") < 6 && !isnan(col("value")))
          .select("user_id", "ts", "event_id", "event_type")
        graft.ops.TimeSeriesOps.dimensionHistory(
          obs, Seq("user_id"), "ts", Seq("event_type"), tiebreak = Seq("event_id"))
      },
      Some("""WITH o AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
             |  FROM events WHERE user_id < 6 AND NOT isnan(value)),
             |f AS (SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN row_number() OVER w = 1
             |           OR event_type IS DISTINCT FROM lag(event_type) OVER w
             |         THEN 1 ELSE 0 END AS chg
             |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |v AS (SELECT user_id, ts, event_type,
             |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
             |  FROM f),
             |g AS (SELECT user_id, version, min(ts) AS effective_from,
             |    min(event_type) AS event_type
             |  FROM v GROUP BY 1, 2)
             |SELECT user_id, effective_from, event_type, version,
             |  lead(effective_from) OVER (PARTITION BY user_id
             |    ORDER BY effective_from, version) AS effective_to
             |FROM g""".stripMargin)),

    // ---- point-in-time enrichment: each sampled observation picks up the
    // dimension version valid at its timestamp (the consumer side of
    // q_dim_history's SCD-2 intervals) — equi-join on the key with the
    // interval test as a residual predicate, never an interval cross
    // product; at most one version matches by the tiling invariant --------
    "q_pit_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .filter(col("user_id") < 6 && !isnan(col("value")))
        val hist = graft.ops.TimeSeriesOps.dimensionHistory(
          ev.select("user_id", "ts", "event_id", "event_type"),
          Seq("user_id"), "ts", Seq("event_type"), tiebreak = Seq("event_id"))
        val obs = ev.filter(pmod(col("event_id"), lit(7)) === 0)
          .select("user_id", "ts", "event_id")
        graft.ops.TimeSeriesOps.pointInTimeJoin(obs, hist, Seq("user_id"), "ts")
          .select("user_id", "ts", "event_id", "event_type", "version")
      },
      Some("""WITH o AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
             |  FROM events WHERE user_id < 6 AND NOT isnan(value)),
             |f AS (SELECT user_id, ts, event_id, event_type,
             |    CASE WHEN row_number() OVER w = 1
             |           OR event_type IS DISTINCT FROM lag(event_type) OVER w
             |         THEN 1 ELSE 0 END AS chg
             |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |v AS (SELECT user_id, ts, event_type,
             |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
             |  FROM f),
             |g AS (SELECT user_id, version, min(ts) AS effective_from,
             |    min(event_type) AS event_type
             |  FROM v GROUP BY 1, 2),
             |hist AS (SELECT user_id, effective_from, event_type, version,
             |    lead(effective_from) OVER (PARTITION BY user_id
             |      ORDER BY effective_from, version) AS effective_to
             |  FROM g),
             |sampled AS (SELECT user_id, ts, event_id FROM o WHERE event_id % 7 = 0)
             |SELECT s.user_id, s.ts, s.event_id, h.event_type, h.version
             |FROM sampled s LEFT JOIN hist h ON h.user_id = s.user_id
             |  AND s.ts >= h.effective_from
             |  AND (h.effective_to IS NULL OR s.ts < h.effective_to)""".stripMargin)),

    // ---- token-budget selection: fill each source's token quota with its
    // best docs — one window over one per-source sort; ranking runs on the
    // ROUNDED quality so engines agree on order, not just display ----------
    "q_budget_select" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"),
          round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
        TrainPrep.budgetSelect(d, "source", "doc_id", "n_tok", "quality", budget = 800L)
          .select(col("doc_id"), col("source"), col("quality"), col("cum_tokens"))
      },
      Some("""WITH q AS (SELECT doc_id, source, round(
             |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
             |  (CASE WHEN (length(text)::DOUBLE - (n_tokd - 1)) / n_tokd BETWEEN 3.0 AND 10.0
             |     THEN 1.0 ELSE 0.5 END) * 0.4
             |  + least(stop_hits / n_tokd * 5.0, 1.0) * 0.4
             |  + (CASE WHEN punct / length(text)::DOUBLE <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2
             |  END, 6) AS quality,
             |  n_tokd::BIGINT AS n_tok
             |FROM (SELECT doc_id, source, text,
             |  (CASE WHEN length(text) = 0 THEN 0
             |    ELSE length(text) - length(replace(text, ' ', '')) + 1 END)::DOUBLE AS n_tokd,
             |  len(list_filter(string_split(text, ' '),
             |      w -> w IN ('the','a','of','and','to','is','in')))::DOUBLE AS stop_hits,
             |  (length(text) - length(replace(replace(replace(replace(replace(text,
             |      '.',''), ',',''), '!',''), '?',''), ';','')))::DOUBLE AS punct
             |  FROM documents)),
             |c AS (SELECT doc_id, source, quality,
             |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
             |  FROM q)
             |SELECT doc_id, source, quality, cum_tokens FROM c
             |WHERE cum_tokens <= 800""".stripMargin)),

    // ---- CCNet perplexity bucketing: head/middle/tail by EXACT-RANK
    // thresholds over the corpus-trained trigram NLL — the boundary is a
    // value the data contains (lexicographic (nll, id) compare), never an
    // interpolated quantile whose ULPs differ across engines -------------
    "q_ppl_buckets" -> QueryDef(
      (s, dir) => TrainPrep.perplexityBuckets(
        t(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH tri AS (SELECT doc_id, substr(text, i, 3) AS tri
             |  FROM documents, UNNEST(generate_series(1, greatest(length(text) - 2, 0))) AS t(i)),
             |cnt AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY 1),
             |pre AS (SELECT substr(tri, 1, 2) AS big, sum(c3) AS c2 FROM cnt GROUP BY 1),
             |v AS (SELECT count(*) AS vsz FROM cnt),
             |scored AS (SELECT t.doc_id, ln((c.c3 + 1.0) / (p.c2 + v.vsz)) AS lp
             |  FROM tri t JOIN cnt c USING (tri) JOIN pre p ON substr(t.tri, 1, 2) = p.big, v),
             |sc AS (SELECT doc_id, round(-avg(lp), 4) AS nll FROM scored GROUP BY 1),
             |r AS (SELECT doc_id, nll, row_number() OVER (ORDER BY nll, doc_id) AS rn,
             |      count(*) OVER () AS n FROM sc),
             |h AS (SELECT nll AS h_nll, doc_id AS h_id FROM r WHERE rn = CAST(ceil(0.3 * n) AS BIGINT)),
             |m AS (SELECT nll AS m_nll, doc_id AS m_id FROM r WHERE rn = CAST(ceil(0.6 * n) AS BIGINT))
             |SELECT r.doc_id, r.nll,
             |  CASE WHEN nll < h_nll OR (nll = h_nll AND r.doc_id <= h_id) THEN 'head'
             |       WHEN nll < m_nll OR (nll = m_nll AND r.doc_id <= m_id) THEN 'middle'
             |       ELSE 'tail' END AS ppl_bucket
             |FROM r CROSS JOIN h CROSS JOIN m""".stripMargin)),

    // ---- CCNet-class word-bigram LM with STUPID BACKOFF (E162): train
    // on docs < 150, score docs < 300 — the held-out half exercises all
    // three branches (seen bigram c12/c1, unigram backoff α·c2/T, OOV
    // α·1/T) and the backoff_rate coverage diagnostic; every count ratio
    // and ln replays as plain SQL -----------------------------------------
    "q_lm_backoff" -> QueryDef(
      (s, dir) => {
        val train = t(s, dir, "documents").filter(col("doc_id") < 150)
        val uni = graft.trainprep.NgramLm.unigramCounts(train, "text")
        val bi = graft.trainprep.NgramLm.bigramCounts(train, "text")
        val total = uni.agg(sum(col("c"))).head().getLong(0)
        graft.trainprep.NgramLm.stupidBackoffNll(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", uni, bi, total)
      },
      Some(lmBackoffOracle)),

    // ---- source-pair Jensen–Shannon divergence (E163): the domain-
    // similarity matrix mixture planning reads — shared-word inner join
    // + the closed-form one-sided tail (a word on one side contributes
    // exactly p·ln2), so no full-outer join and a verbatim SQL replay ----
    "q_mix_jsd" -> QueryDef(
      (s, dir) => graft.trainprep.NgramLm.sourceJsDivergence(
        t(s, dir, "documents"), "source", "text"),
      Some("""WITH w AS (SELECT source AS src,
             |    unnest(list_filter(string_split(text, ' '),
             |      x -> len(x) > 0)) AS w
             |  FROM documents),
             |c AS (SELECT src, w, count(*)::BIGINT AS c FROM w GROUP BY 1, 2),
             |t AS (SELECT src, sum(c)::BIGINT AS t FROM c GROUP BY 1),
             |p AS (SELECT c.src, c.w, c.c::DOUBLE / t.t::DOUBLE AS p
             |  FROM c JOIN t USING (src)),
             |j AS (SELECT a.src AS source_a, b.src AS source_b,
             |    count(*)::BIGINT AS shared_words,
             |    sum(a.p * ln(2 * a.p / (a.p + b.p))
             |      + b.p * ln(2 * b.p / (a.p + b.p))) AS core,
             |    sum(a.p) AS sa, sum(b.p) AS sb
             |  FROM p a JOIN p b ON a.w = b.w AND a.src < b.src
             |  GROUP BY 1, 2)
             |SELECT source_a, source_b, shared_words,
             |  round(0.5 * core + 0.5 * ln(2) * ((1 - sa) + (1 - sb)), 6)
             |    AS js_div
             |FROM j""".stripMargin)),

    // ---- corpus integrity manifest (E164; two-level + injective leaf
    // r15): tamper-evident fingerprint — docs route by identity-hash
    // digits into (group, sub-group), each sub-group's sorted leaves fold
    // into a sha256 chain, each group's sub-chains fold (in sub order,
    // sub id included) into the group hash; flip one byte anywhere and
    // its group hash (and the root) changes. The leaf is the injective
    // fixed-width form sha256(sha256(id) ∥ flag ∥ sha256(text)).
    // Replayed with TWO recursive-CTE chain levels.
    "q_integrity_manifest" -> QueryDef(
      (s, dir) => graft.io.IntegrityManifest.manifest(
        t(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text", groups = 16, subGroups = 4),
      Some("""WITH RECURSIVE g AS (SELECT
             |    (('0x' || substr(sha256(doc_id::VARCHAR), 1, 8))::BIGINT % 16)
             |      AS grp,
             |    (('0x' || substr(sha256(doc_id::VARCHAR), 9, 4))::BIGINT % 4)
             |      AS sub,
             |    sha256(sha256(doc_id::VARCHAR) ||
             |      CASE WHEN text IS NULL THEN '1' ELSE '0' END ||
             |      sha256(coalesce(text, ''))) AS leaf
             |  FROM documents WHERE doc_id < 300),
             |r AS (SELECT grp, sub, leaf,
             |    row_number() OVER (PARTITION BY grp, sub ORDER BY leaf) AS rn
             |  FROM g),
             |rec AS (
             |  SELECT grp, sub, rn, sha256(repeat('0', 64) || leaf) AS h
             |    FROM r WHERE rn = 1
             |  UNION ALL
             |  SELECT r2.grp, r2.sub, r2.rn, sha256(rec.h || r2.leaf)
             |  FROM rec JOIN r r2
             |    ON r2.grp = rec.grp AND r2.sub = rec.sub AND r2.rn = rec.rn + 1),
             |sc AS (SELECT grp, sub, max(rn)::BIGINT AS n,
             |    max_by(h, rn) AS sub_hash
             |  FROM rec GROUP BY grp, sub),
             |s2 AS (SELECT grp, sub, n, sub_hash,
             |    row_number() OVER (PARTITION BY grp ORDER BY sub) AS rn2
             |  FROM sc),
             |rec2 AS (
             |  SELECT grp, rn2,
             |      sha256(repeat('0', 64) || sub::VARCHAR || ':' || sub_hash)
             |        AS h
             |    FROM s2 WHERE rn2 = 1
             |  UNION ALL
             |  SELECT x.grp, x.rn2, sha256(rec2.h || x.sub::VARCHAR || ':' ||
             |      x.sub_hash)
             |  FROM rec2 JOIN s2 x
             |    ON x.grp = rec2.grp AND x.rn2 = rec2.rn2 + 1),
             |nd AS (SELECT grp, sum(n)::BIGINT AS n_docs FROM sc GROUP BY grp),
             |gh AS (SELECT grp, max_by(h, rn2) AS group_hash
             |  FROM rec2 GROUP BY grp)
             |SELECT grp, n_docs, group_hash FROM nd JOIN gh USING (grp)"""
        .stripMargin)),

    // ---- streaming parity: real streaming jobs, batch oracles (§2.9) -----
    "q_stream_resample" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.resampleComplete(s, dir, 900),
      Some("""SELECT (epoch_ns(ts)-1) - ((epoch_ns(ts)-1) % 900000000000) + 900000000000 AS bucket_ns,
             |  count(*) AS n, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1""".stripMargin)),

    // ---- append-mode watermark parity (round 16): windowed counts with
    // PLANTED late events; the oracle replays Spark's drop rule — a late
    // row survives iff its window end clears the watermark the on-time
    // batch fixed (ms-truncated max − 15 days; sized so both fates occur) -----------------------------
    "q_stream_late_window" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.lateWindowAppend(s, dir),
      Some("""WITH ev AS (SELECT event_id, epoch_us(ts) AS us, user_id, value
             |  FROM events WHERE NOT isnan(value) AND user_id < 6),
             |on_time AS (SELECT * FROM ev WHERE event_id % 13 <> 0),
             |late AS (SELECT * FROM ev WHERE event_id % 13 = 0),
             |wm AS (SELECT ((max(us) // 1000) - 1296000000) * 1000 AS wm_us
             |  FROM on_time),
             |kept_late AS (SELECT l.* FROM late l, wm
             |  WHERE ((l.us // 3600000000) + 1) * 3600000000 > wm.wm_us),
             |final AS (SELECT * FROM on_time UNION ALL SELECT * FROM kept_late)
             |SELECT (us // 3600000000) * 3600 AS w_start, user_id,
             |  count(*) AS n_events, round(sum(value), 2) AS v_sum
             |FROM final GROUP BY 1, 2""".stripMargin)),

    "q_stream_distinct" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.distinctPairs(s, dir),
      Some("SELECT DISTINCT user_id, event_type FROM events")),

    "q_stream_maxtime" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.maxTimePerUser(s, dir),
      Some("""SELECT user_id, max(epoch_ns(ts)) AS max_ts_ns, count(*) AS n_events
             |FROM events GROUP BY user_id""".stripMargin)),

    // ---- streaming exact dedup at ingest ---------------------------------
    // running (min id, copies) per sha256 digest over the doc stream +
    // an id-shifted duplicate slice — must equal the batch digest groupBy
    // exactly once the stream drains
    "q_stream_dedup" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.dedupKeepers(s, dir),
      Some("""WITH u AS (SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100)
             |SELECT sha256(text) AS digest, min(doc_id) AS keeper_id,
             |  count(*) AS n_copies
             |FROM u GROUP BY 1""".stripMargin)),

    // ---- streaming OHLC bar compaction at ingest -------------------------
    // E88's aggregate as stream state: min_by/max_by/min/max/count are
    // mergeable and (ts, event_id) is unique, so bars are backfill-order-
    // insensitive — stream == batch == oracle. Shares q_ohlc's oracle.
    "q_stream_ohlc" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.ohlcBars(s, dir, stepSeconds = 86400),
      graft.queries.ParityQueries.defs.toMap.apply("q_ohlc").oracle),

    // ---- streaming decontamination at ingest -----------------------------
    // stream-static broadcast join against the eval-set digest table:
    // STATELESS (append mode, no state store), each microbatch one map
    // pass. Fixture plants id-shifted eval copies that must flag.
    "q_stream_decontam" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.decontaminateStream(s, dir),
      Some("""WITH ev AS (SELECT DISTINCT sha256(text) AS digest
             |  FROM documents WHERE doc_id < 50),
             |tr AS (SELECT doc_id, sha256(text) AS digest
             |    FROM documents WHERE doc_id >= 50
             |  UNION ALL
             |  SELECT doc_id + 200000, sha256(text)
             |    FROM documents WHERE doc_id < 50)
             |SELECT doc_id, digest IN (SELECT digest FROM ev) AS contaminated
             |FROM tr""".stripMargin)),

    // ---- streaming C4 page cleanup at ingest -----------------------------
    // stateless per-row gate (append mode); shares q_c4_gate's oracle —
    // batch, stream and oracle all gate the identical constructed pages.
    "q_stream_c4" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.c4GateStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_c4_gate").oracle),

    // ---- streaming confusion-matrix monitor -------------------------------
    // the E134 contingency cells as complete-mode category²-sized state;
    // counts are order-insensitive so the drained stream equals batch.
    // The stream stops at the cells (the report's marginals would chain a
    // second stateful aggregate); the oracle is the cells directly.
    "q_stream_confusion" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.confusionStream(s, dir),
      Some(s"""WITH ${graft.PipelineQueries.plantedLangPredCte}
             |SELECT a AS actual, p AS pred, count(*)::BIGINT AS n
             |FROM d GROUP BY 1, 2""".stripMargin)),

    // ---- streaming conversation-structure gate at ingest ------------------
    // stateless E152 gate over the stream-static SFT assembly (append
    // mode, no state store); shares q_chat_gate's oracle over the same
    // planted violations.
    "q_stream_chat_gate" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.chatGateStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_chat_gate").oracle),

    // ---- streaming LM quality scoring at ingest ----------------------------
    // the E162 stupid-backoff score as documents arrive, counts from
    // static offline-trained tables (stream-static joins + complete-mode
    // per-doc roll-up); shares q_lm_backoff's oracle.
    "q_stream_lm_backoff" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.lmBackoffStream(s, dir),
      Some(lmBackoffOracle)),

    // ---- streaming IVM delta over the change feed (E175 x §2.9) ------------
    // the sign-weighted per-source roll-up as a complete-mode aggregate
    // over statelessly-derived change rows, published onto the static
    // snapshot-0 base post-drain; shares q_agg_maintain's oracle.
    "q_stream_agg_maintain" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.aggMaintainStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_agg_maintain").oracle),

    // ---- streaming fuzzy-match fold at ingest ------------------------------
    // the E154 canonical key as a stateless append-mode map over arriving
    // rows; shares q_text_fold's oracle over the same planted fixture.
    "q_stream_text_fold" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.textFoldStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_text_fold").oracle),

    // ---- streaming calibration + Brier monitors ---------------------------
    // the E132/E138 metrics as live state over the deployed quality gate's
    // scored traffic: per-bin (n, Σscore, Σlabel) / global (n, Σe²) are
    // order-insensitive, state is bin-sized / one row; the per-doc score
    // is a stateless higher-order-aggregate map (scoreLinear's groupBy
    // can't chain under a streaming aggregate). Share the batch oracles.
    "q_stream_calibration" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.calibrationStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_calibration").oracle),
    "q_stream_brier" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.brierStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_brier").oracle),

    // ---- streaming per-slice vocabulary coverage --------------------------
    // complete-mode slice-sized state; sums/counts are order-insensitive
    // so the drained stream equals batch; shares q_vocab_coverage's oracle.
    "q_stream_vocab" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.vocabCoverageStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_vocab_coverage").oracle),

    // ---- streaming SFT assembly at ingest ---------------------------------
    // stream-static broadcast join (prompts arrive, completions static)
    // + the stateless E116 render; shares q_sft_render's oracle.
    "q_stream_sft" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.sftRenderStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_sft_render").oracle),

    // ---- streaming encoding-damage triage at ingest ----------------------
    "q_stream_encoding" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.encodingQualityStream(s, dir),
      graft.PipelineQueries.defs.toMap.apply("q_encoding_quality").oracle),

    // ---- streaming NEAR-dup candidate discovery at ingest ----------------
    // the LSH banding stage as a stream: rowwise md5-MinHash signature →
    // band keys (pure projection), one complete-mode groupBy per band
    // bucket. Must equal batch q_dedup_lsh_bands once the stream drains.
    "q_stream_lsh_bands" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.lshCandidateBuckets(s, dir),
      Some("""WITH u AS (SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100),
             |tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
             |  FROM u),
             |sig AS (SELECT doc_id, min(md5(t || '#0')) AS mh0, min(md5(t || '#1')) AS mh1,
             |  min(md5(t || '#2')) AS mh2, min(md5(t || '#3')) AS mh3 FROM tok GROUP BY doc_id),
             |bands AS (
             |  SELECT doc_id, 0 AS band, sha256(mh0 || '|' || mh1) AS band_hash FROM sig
             |  UNION ALL
             |  SELECT doc_id, 1 AS band, sha256(mh2 || '|' || mh3) AS band_hash FROM sig)
             |SELECT band, band_hash, string_agg(doc_id, ',' ORDER BY doc_id) AS ids_csv,
             |  count(*) AS n
             |FROM bands GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin)),

    // ---- streaming gap-based sessionization (native session_window) ------
    // sessions merge while consecutive per-user events are < gap apart;
    // session_window does NOT merge an event landing exactly at the
    // previous window's end, so the batch replay breaks on >= gap. The
    // oracle pre-aggregates per (user, ts) so duplicate-timestamp tie
    // order cannot smear rows across the island boundary.
    "q_stream_sessionize" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.sessionizePerUser(s, dir, 1800),
      Some("""WITH e AS (SELECT user_id, ts, count(*) AS n, sum(value) AS sv
             |  FROM events WHERE NOT isnan(value) GROUP BY 1, 2),
             |g AS (SELECT user_id, ts, n, sv,
             |    CASE WHEN epoch_ns(ts) - epoch_ns(lag(ts) OVER w) >= 1800000000000
             |         THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |s AS (SELECT user_id, ts, n, sv,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id, min(epoch_ns(ts)) AS start_ns,
             |  max(epoch_ns(ts)) + 1800000000000 AS end_ns,
             |  CAST(sum(n) AS BIGINT) AS n_events, round(sum(sv), 2) AS sum_value
             |FROM s GROUP BY user_id, sid""".stripMargin)),

    // ---- streaming HLL: the mergeable sketch registers AS stream state ---
    // the per-(lang, bucket) max-rank aggregate is the stream's single
    // stateful stage (state ≤ groups×256 rows regardless of volume); the
    // estimator finishes batch over the drained sink. Same oracle as the
    // batch q_hll_distinct — register max is backfill-order-insensitive.
    "q_stream_hll" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.hllDistinctStream(s, dir),
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
             |hx AS (SELECT lang, md5(t) AS h FROM tok),
             |rk AS (SELECT lang, substr(h, 1, 2) AS bucket,
             |    regexp_replace(substr(h, 3, 15), '^0+', '') AS s FROM hx),
             |r AS (SELECT lang, bucket,
             |    CASE WHEN length(s) = 0 THEN 61
             |      ELSE (15 - length(s)) * 4
             |        + (4 - CASE WHEN substr(s, 1, 1) IN ('8','9','a','b','c','d','e','f') THEN 4
             |                    WHEN substr(s, 1, 1) IN ('4','5','6','7') THEN 3
             |                    WHEN substr(s, 1, 1) IN ('2','3') THEN 2
             |                    ELSE 1 END) + 1 END AS rank
             |  FROM rk),
             |regs AS (SELECT lang, bucket, max(rank) AS m FROM r GROUP BY 1, 2),
             |agg AS (SELECT lang, sum(pow(2.0, -m)) AS sm, count(*) AS nb FROM regs GROUP BY 1),
             |est AS (SELECT lang, 256 - nb AS zeros,
             |    (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 / (sm + (256 - nb)) AS raw
             |  FROM agg)
             |SELECT lang, round(CASE WHEN raw <= 640 AND zeros > 0
             |    THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4) AS n_distinct_est
             |FROM est""".stripMargin)),

    // ---- streaming CMS: the counter aggregate as stream state ------------
    // depth×256 counters as the single stateful stage; estimation joins
    // the drained sink batch-side. Same oracle as the batch q_cms_counts.
    "q_stream_cms" -> QueryDef(
      (s, dir) => graft.streaming.StreamParity.cmsStream(s, dir),
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
             |rb AS (SELECT t, g.r, substr(md5(t || '#' || g.r), 1, 2) AS b
             |  FROM tok, UNNEST(generate_series(0, 3)) AS g(r)),
             |cms AS (SELECT r, b, count(*) AS cnt FROM rb GROUP BY 1, 2),
             |q AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS token
             |  FROM documents WHERE doc_id < 5),
             |qb AS (SELECT q.token, g.r, substr(md5(q.token || '#' || g.r), 1, 2) AS b
             |  FROM q, UNNEST(generate_series(0, 3)) AS g(r))
             |SELECT qb.token, min(cms.cnt) AS cnt_est
             |FROM qb JOIN cms ON cms.r = qb.r AND cms.b = qb.b
             |GROUP BY 1""".stripMargin)),

    // ---- retrieval-style sliding-window chunking (overlap keeps context
    // across cuts; windows never cross doc boundaries) ---------------------
    "q_chunk_sliding" -> QueryDef(
      (s, dir) =>
        graft.trainprep.TrainPrep.slidingChunks(
          t(s, dir, "documents").filter(col("doc_id") < 200),
          "doc_id", "text", chunkTokens = 32, strideTokens = 24),
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
             |  FROM documents WHERE doc_id < 200),
             |ch AS (SELECT doc_id, (i - 1) // 24 AS chunk_idx,
             |    array_to_string(ts[i : i + 31], ' ') AS chunk_text
             |  FROM tok, UNNEST(generate_series(1, greatest(len(ts), 1), 24)) AS t(i))
             |SELECT doc_id, chunk_idx, chunk_text,
             |  len(string_split(chunk_text, ' '))::BIGINT AS n_tokens
             |FROM ch""".stripMargin)),

    // ---- DSIR-style target-domain selection (Xie et al., NeurIPS 2023) ---
    // two add-one char-trigram LMs over a SHARED vocabulary — one fit on
    // the en-language target sample, one on the raw corpus — score each
    // raw doc by the mean per-trigram log importance ratio; top-100 kept.
    "q_dsir_select" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.trainprep.TrainPrep.dsirSelect(
          docs, docs.filter(col("lang") === "en"), "doc_id", "text", k = 100)
      },
      Some("""WITH rt AS (SELECT doc_id, substr(text, i, 3) AS tri
             |  FROM documents, UNNEST(generate_series(1, greatest(length(text) - 2, 0))) AS t(i)),
             |tt AS (SELECT substr(text, i, 3) AS tri
             |  FROM documents, UNNEST(generate_series(1, greatest(length(text) - 2, 0))) AS t(i)
             |  WHERE lang = 'en'),
             |cr AS (SELECT tri, count(*) AS cr FROM rt GROUP BY 1),
             |ct AS (SELECT tri, count(*) AS ct FROM tt GROUP BY 1),
             |voc AS (SELECT DISTINCT tri FROM (SELECT tri FROM cr UNION ALL SELECT tri FROM ct)),
             |v AS (SELECT count(*) AS vsz FROM voc),
             |prer AS (SELECT substr(tri, 1, 2) AS big, sum(cr) AS c2r FROM cr GROUP BY 1),
             |pret AS (SELECT substr(tri, 1, 2) AS big, sum(ct) AS c2t FROM ct GROUP BY 1),
             |lp AS (SELECT voc.tri,
             |    ln((coalesce(ct.ct, 0) + 1.0) / (coalesce(pret.c2t, 0) + v.vsz))
             |  - ln((coalesce(cr.cr, 0) + 1.0) / (coalesce(prer.c2r, 0) + v.vsz)) AS ratio
             |  FROM voc LEFT JOIN cr USING (tri) LEFT JOIN ct USING (tri)
             |  LEFT JOIN prer ON substr(voc.tri, 1, 2) = prer.big
             |  LEFT JOIN pret ON substr(voc.tri, 1, 2) = pret.big, v)
             |SELECT r.doc_id, round(avg(lp.ratio), 4) AS dsir_score
             |FROM rt r JOIN lp USING (tri)
             |GROUP BY 1 ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin)),

    // ---- DSIR over WORD n-grams (E165): Xie et al.'s actual feature
    // space, reusing the NgramLm transition machinery — bigram counts for
    // raw and target, shared-vocab add-one smoothing normalized per
    // leading word, log-ratio broadcast onto one raw transition scan,
    // distributed TakeOrdered top-k. Full replay like q_dsir_select. ----
    "q_dsir_words" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        graft.trainprep.NgramLm.dsirSelectWords(
          docs, docs.filter(col("lang") === "en"), "doc_id", "text", k = 100)
      },
      Some("""WITH rd AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
             |  FROM documents),
             |rt AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM rd,
             |  LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u),
             |td AS (SELECT
             |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS ws
             |  FROM documents WHERE lang = 'en'),
             |tt AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM td,
             |  LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) u),
             |cr AS (SELECT w1, w2, count(*) AS cr FROM rt GROUP BY 1, 2),
             |ct AS (SELECT w1, w2, count(*) AS ct FROM tt GROUP BY 1, 2),
             |voc AS (SELECT DISTINCT w1, w2 FROM
             |  (SELECT w1, w2 FROM cr UNION ALL SELECT w1, w2 FROM ct)),
             |v AS (SELECT count(*) AS vsz FROM voc),
             |prer AS (SELECT w1, sum(cr) AS c1r FROM cr GROUP BY 1),
             |pret AS (SELECT w1, sum(ct) AS c1t FROM ct GROUP BY 1),
             |lp AS (SELECT voc.w1, voc.w2,
             |    ln((coalesce(ct.ct, 0) + 1.0) / (coalesce(pret.c1t, 0) + v.vsz))
             |  - ln((coalesce(cr.cr, 0) + 1.0) / (coalesce(prer.c1r, 0) + v.vsz))
             |      AS ratio
             |  FROM voc LEFT JOIN cr USING (w1, w2) LEFT JOIN ct USING (w1, w2)
             |  LEFT JOIN prer ON voc.w1 = prer.w1
             |  LEFT JOIN pret ON voc.w1 = pret.w1, v)
             |SELECT r.doc_id, round(avg(lp.ratio), 4) AS dsir_score
             |FROM rt r JOIN lp USING (w1, w2)
             |GROUP BY 1 ORDER BY dsir_score DESC, doc_id LIMIT 100""".stripMargin)),

    // ---- token-distribution drift between slices (smoothed KL) -----------
    // the corpus-monitoring number: KL(en ∥ de) over the union vocab with
    // add-one smoothing — two hash-aggregates + one vocab-sized
    // full-outer join, corpus never shuffled beyond (token, count)
    "q_token_drift" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        CorpusOverlap.tokenDrift(
          d.filter(col("lang") === "en"), d.filter(col("lang") === "de"), "text")
      },
      Some("""WITH ta AS (SELECT unnest(string_split(text, ' ')) AS t
             |  FROM documents WHERE lang = 'en'),
             |tb AS (SELECT unnest(string_split(text, ' ')) AS t
             |  FROM documents WHERE lang = 'de'),
             |ca AS (SELECT t, count(*) AS c FROM ta GROUP BY 1),
             |cb AS (SELECT t, count(*) AS c FROM tb GROUP BY 1),
             |j AS (SELECT coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
             |  FROM ca FULL OUTER JOIN cb USING (t)),
             |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             |    CAST(sum(cb) AS BIGINT) AS nb, count(*) AS v FROM j)
             |SELECT v AS vocab, na AS n_a, nb AS n_b,
             |  round(sum(((ca + 1.0) / (na + v))
             |    * ln(((ca + 1.0) / (na + v)) / ((cb + 1.0) / (nb + v)))), 4) AS kl_nats
             |FROM j, tot GROUP BY 1, 2, 3""".stripMargin)),

    // ---- deterministic train/val/test split assignment -------------------
    // sha256-hash bands at 1/65536 granularity: no RNG, layout-stable,
    // and adding new rows never flips an existing row's band. Edge
    // literals in the oracle are round(cum*65536) of 0.8/0.1/0.1.
    "q_split_assign" -> QueryDef(
      (s, dir) => t(s, dir, "documents").select(col("doc_id"),
        TrainPrep.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("band")),
      Some("""SELECT doc_id,
             |  CASE WHEN p < 52429 THEN 'train'
             |       WHEN p < 58982 THEN 'val'
             |       ELSE 'test' END AS band
             |FROM (SELECT doc_id,
             |    CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4))
             |      AS BIGINT) AS p
             |  FROM documents)""".stripMargin)),

    // ---- deterministic upsample-by-weight (the data-recipe executor) -----
    // per-source epoch weights from a literal table; full copies
    // unconditional, the fractional copy by salted-hash share on the
    // same 1/65536 grid as splitAssign — every copy replayed exactly
    "q_upsample_weight" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val w = element_at(
          map(lit(0), lit(0.0), lit(1), lit(0.4), lit(2), lit(1.0),
            lit(3), lit(2.3), lit(4), lit(3.7)),
          substring(col("source"), 4, 10).cast("int") % 5)
        TrainPrep.upsampleByWeight(
          d.select(col("doc_id"), w.as("weight")), "doc_id", "weight")
      },
      Some("""WITH wts AS (SELECT doc_id,
             |    CAST(CASE CAST(substr(source, 4) AS INT) % 5
             |      WHEN 0 THEN 0.0 WHEN 1 THEN 0.4 WHEN 2 THEN 1.0
             |      WHEN 3 THEN 2.3 ELSE 3.7 END AS DOUBLE) AS weight
             |  FROM documents),
             |c AS (SELECT doc_id, weight,
             |    unnest(generate_series(0, CAST(ceil(weight) AS INT) - 1))
             |      AS copy_idx
             |  FROM wts WHERE weight > 0)
             |SELECT doc_id, weight, copy_idx FROM c
             |WHERE copy_idx < CAST(floor(weight) AS INT)
             |   OR CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)
             |       || ':upsample'), 1, 4)) AS BIGINT)
             |     < CAST(round((weight - floor(weight)) * 65536) AS BIGINT)""".stripMargin)),

    // ---- KMV bottom-k sample + exact rank quantiles over it --------------
    // the quantile member of the sketch family: bottom-200 of md5(doc_id)
    // is a deterministic uniform sample; the p50/p90 of n_chars over it
    // estimate the corpus quantiles with O(1/√k) error at ANY corpus
    // size, and the whole path replays in DuckDB (ORDER BY md5 LIMIT k,
    // then row_number rank pick).
    "q_kmv_quantile" -> QueryDef(
      (s, dir) => CorpusOverlap.kmvQuantiles(
        CorpusOverlap.bottomKSample(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", 200),
        "n_chars", Seq(0.5, 0.9)),
      Some("""WITH smp AS (SELECT n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents ORDER BY h LIMIT 200),
             |r AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars, h) AS rn,
             |    count(*) OVER () AS n FROM smp)
             |SELECT count(*) AS n,
             |  max(CASE WHEN rn = ceil(0.5 * n) THEN n_chars END) AS p50,
             |  max(CASE WHEN rn = ceil(0.9 * n) THEN n_chars END) AS p90
             |FROM r""".stripMargin)),

    // ---- exact heavy hitters with a sketch-pruned shuffle ----------------
    // pass 1 builds the xxhash64 CMS; pass 2 prunes tokens in-row against
    // the broadcast-literal counter table before the exact groupBy. CMS
    // never underestimates, so the result EQUALS brute force — the
    // sketch only shrinks the shuffle, which is why the oracle is the
    // plain HAVING query.
    "q_heavy_hitters" -> QueryDef(
      (s, dir) => CorpusOverlap.heavyHittersExact(
        t(s, dir, "documents"), "text", minCount = 400),
      Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
             |  FROM documents)
             |SELECT token, count(*) AS cnt FROM tok
             |GROUP BY 1 HAVING count(*) >= 400""".stripMargin)),

    // ---- per-group KMV quantiles (per-source length profiles) ------------
    "q_group_quantile" -> QueryDef(
      (s, dir) => CorpusOverlap.groupQuantiles(
        t(s, dir, "documents"), "source", "doc_id", "n_chars",
        k = 50, qs = Seq(0.5, 0.9)),
      Some("""WITH s AS (SELECT source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents),
             |r1 AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY h) AS rs
             |  FROM s),
             |smp AS (SELECT source, n_chars, h FROM r1 WHERE rs <= 50),
             |r2 AS (SELECT source, n_chars,
             |    row_number() OVER (PARTITION BY source ORDER BY n_chars, h) AS rn,
             |    count(*) OVER (PARTITION BY source) AS n
             |  FROM smp)
             |SELECT source, count(*) AS n,
             |  max(CASE WHEN rn = ceil(0.5 * n) THEN n_chars END) AS p50,
             |  max(CASE WHEN rn = ceil(0.9 * n) THEN n_chars END) AS p90
             |FROM r2 GROUP BY source""".stripMargin)),

    // ---- weighted sample without replacement (Efraimidis-Spirakis A-ES) --
    // token-weighted corpus sampling with NO RNG: priority ln(u)/w from a
    // md5-derived uniform, top-150 kept; md5-hex tiebreak under a
    // 9-decimal key round makes the draw bit-stable across engines.
    "q_sample_weighted" -> QueryDef(
      (s, dir) => TrainPrep.weightedSample(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", 150),
      Some("""WITH w AS (SELECT doc_id, n_chars,
             |    md5(CAST(doc_id AS VARCHAR)) AS h,
             |    round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
             |        AS BIGINT) + 1.0) / 281474976710656.0)
             |      / CAST(n_chars AS DOUBLE), 9) AS k
             |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
             |SELECT doc_id, n_chars FROM w ORDER BY k DESC, h LIMIT 150""".stripMargin))
  )
}
