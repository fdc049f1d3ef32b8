package graft

import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.dedup.Dedup
import graft.functions.{TextFunctions, VectorFunctions}
import graft.multimodal.Multimodal
import graft.queries.{QueryDef, Tables}
import graft.trainprep.{CorpusOverlap, QualityClassifier}

/** LLM-training-data pipeline operators over the `documents` and
  * `embeddings` tables: deduplication (exact / MinHash+LSH / SimHash /
  * n-gram Jaccard / embedding cosine), similarity search (brute-force +
  * LSH-bucketed ANN), text analysis (lang-id, quality, tokens,
  * fingerprints) and multimodal binary-column plumbing.
  *
  * Cross-engine determinism: hashes are md5/sha256 (identical hex in Spark
  * and DuckDB); vector math accumulates left-to-right and is rounded at 5-6
  * decimals before compare; candidate sets are bounded by id predicates so
  * the pairwise verifiers stay small at every scale factor.
  */
object PipelineQueries {
  import Tables.t

  /** documents ∪ a shifted copy of the first 100 ids — gives the dedup
    * operators real duplicates to find (the base table has none). */
  private def docsWithDups(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = t(s, dir, "documents")
    d.unionByName(d.filter(col("doc_id") < 100)
      .withColumn("doc_id", col("doc_id") + 100000L))
  }

  private val dupUnionSql =
    """(SELECT * FROM documents
      | UNION ALL
      | SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      | FROM documents WHERE doc_id < 100)""".stripMargin

  /** Paragraph-structured fixture for the paragraph-level dedup demo: the
    * synthetic texts are single-line, so doc i (i < 100) is built from base
    * texts 2i, 2i+1, 2i, 2i+2 joined with blank lines — base 2i repeats
    * WITHIN the doc, and base 2i+2 recurs as the opening paragraph of doc
    * i+1 (the boilerplate-prefix shape). Both engines assemble the
    * identical fixture from the same parquet rows. */
  /** Constructed sentence-bearing prose over the documents fixture (whose
    * raw text carries no punctuation/capitals): three capitalized
    * substrings with ./!/? joins, lengths keyed to doc_id; doc_id % 5 == 0
    * docs get a single boundary-less sentence. Shared by the sentence /
    * chunking / readability queries; each oracle replays it inline. */
  private def proseDocs(s: org.apache.spark.sql.SparkSession, dir: String) = {
    def cap(c: org.apache.spark.sql.Column) =
      concat(upper(substring(c, 1, 1)), substring(c, 2, 1000000))
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val prose = when(pmod(col("doc_id"), lit(5)) === 0,
      cap(substring(col("text"), 1, 30)))
      .otherwise(concat(
        cap(expr("substring(text, 1, 1 + doc_id % 35)")), lit(". "),
        cap(expr("substring(text, 8, 5 + doc_id % 29)")), lit("! "),
        cap(expr("substring(text, 15, 3 + doc_id % 44)")), lit("?")))
    d.select(col("doc_id"), prose.as("text"))
  }

  private def paraDocs(s: org.apache.spark.sql.SparkSession, dir: String,
      maxPid: Int = 100, reps: Int = 1) = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val base = d.select(col("doc_id").as("pid")).filter(col("pid") < maxPid)
      .join(d.select(col("doc_id").as("i1"), col("text").as("t1")),
        col("i1") === col("pid") * 2)
      .join(d.select(col("doc_id").as("i2"), col("text").as("t2")),
        col("i2") === col("pid") * 2 + 1)
      .join(d.select(col("doc_id").as("i3"), col("text").as("t3")),
        col("i3") === col("pid") * 2 + 2)
      .select(col("pid"),
        concat_ws("\n\n", col("t1"), col("t2"), col("t1"), col("t3")).as("text"))
    // reps > 1 replicates every doc verbatim at doc_id = pid + rep·1000 —
    // exact-duplicate groups of `reps` on top of the paragraph chains, so
    // the ~2k-doc paragraph fixtures actually engage occurrence caps and
    // multi-member buckets instead of staying under every threshold
    if (reps == 1) base.select(col("pid").as("doc_id"), col("text"))
    else base
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .select((col("pid") + col("rep").cast("long") * 1000L).as("doc_id"),
        col("text"))
  }

  /** The vec_id=0 embedding, the shared query vector of every ANN demo. */
  private def queryVec(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Float] =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)

  /** Exact cosine top-10 vs vec_id=0 — the oracle for brute-force KNN and
    * for both ANN paths in their provably-exact configurations
    * (maxHammingProbe = nBits / nProbe = nCentroids ⇒ candidate set = corpus). */
  private val knnOracleSql =
    """WITH q AS (SELECT embedding AS qv,
      |  sqrt(list_sum(list_transform(generate_series(1, 64),
      |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS qn
      |  FROM embeddings WHERE vec_id = 0),
      |s AS (SELECT vec_id,
      |  list_sum(list_transform(generate_series(1, 64),
      |    i -> embedding[i]::DOUBLE * qv[i]::DOUBLE)) AS dot,
      |  sqrt(list_sum(list_transform(generate_series(1, 64),
      |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm, qn
      |  FROM embeddings, q WHERE vec_id > 0)
      |SELECT vec_id, round(dot / (nrm * qn), 5) AS cos FROM s
      |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  /** DuckDB cosine over pre-cast DOUBLE lists, same shape as the codegen'd
    * `vec_cosine` (index-order sums, dot / (√na · √nb)). */
  private def duckCosD(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(generate_series(1, $dim), i -> $a[i] * $b[i]))" +
      s" / (sqrt(list_sum(list_transform(generate_series(1, $dim), i -> $a[i] * $a[i])))" +
      s" * sqrt(list_sum(list_transform(generate_series(1, $dim), i -> $b[i] * $b[i]))))"

  /** RRF hybrid oracle: the three shortlists (BM25 over documents, dense
    * and 16-dim-truncated cosine over embeddings) re-derived exactly as
    * their own oracles do, ranked by (rounded score DESC, id), fused as
    * c0 + c1 + c2 in list order — the same left-to-right double adds the
    * Spark plan performs. */
  private val rrfHybridOracleSql = {
    val okapi = (i: Int) =>
      s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * (1.2 + 1.0))" +
        s" / (tf$i + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))"
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
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
       |bm AS (SELECT doc_id, round(${okapi(0)} + ${okapi(1)} + ${okapi(2)}, 5) AS score
       |  FROM tfs CROSS JOIN st ORDER BY score DESC, doc_id LIMIT 20),
       |ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings),
       |q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
       |knn AS (SELECT vec_id AS doc_id,
       |  round(${duckCosD("v", "qv", 64)}, 5) AS score
       |  FROM ev, q WHERE vec_id > 0 ORDER BY score DESC, doc_id LIMIT 20),
       |tr AS (SELECT vec_id AS doc_id,
       |  round(${duckCosD("v", "qv", 16)}, 5) AS score
       |  FROM ev, q WHERE vec_id > 0 ORDER BY score DESC, doc_id LIMIT 20),
       |r0 AS (SELECT doc_id, 1.0::DOUBLE / (60 +
       |  row_number() OVER (ORDER BY score DESC, doc_id)) AS c FROM bm),
       |r1 AS (SELECT doc_id, 1.0::DOUBLE / (60 +
       |  row_number() OVER (ORDER BY score DESC, doc_id)) AS c FROM knn),
       |r2 AS (SELECT doc_id, 1.0::DOUBLE / (60 +
       |  row_number() OVER (ORDER BY score DESC, doc_id)) AS c FROM tr),
       |f AS (SELECT coalesce(r0.doc_id, r1.doc_id, r2.doc_id) AS doc_id,
       |    coalesce(r0.c, 0.0::DOUBLE) + coalesce(r1.c, 0.0::DOUBLE)
       |      + coalesce(r2.c, 0.0::DOUBLE) AS rrf
       |  FROM r0
       |  FULL OUTER JOIN r1 ON r0.doc_id = r1.doc_id
       |  FULL OUTER JOIN r2 ON coalesce(r0.doc_id, r1.doc_id) = r2.doc_id)
       |SELECT doc_id, round(rrf, 6) AS rrf FROM f
       |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  }

  /** MMR oracle: the greedy argmax unrolled as one selection CTE per step
    * (4 steps over the cosine top-12, λ = 0.7). rel and pairwise sims are
    * rounded to 5 decimals BEFORE the MMR arithmetic on both engines, the
    * (1 − λ) factor is written as `1.0 - 0.7` so its double value matches
    * the Scala `1.0 - lambda` bit-for-bit, and argmax ties break toward
    * the better shortlist rank — so selection order replays exactly. */
  private val mmrOracleSql = {
    val lam = "0.7::DOUBLE"
    val oneMinus = "(1.0::DOUBLE - 0.7::DOUBLE)"
    def prev(upTo: Int): String =
      (1 to upTo).map(j => s"SELECT r FROM s$j").mkString(" UNION ALL ")
    def step(i: Int): String =
      s"s$i AS (SELECT c.r, c.vec_id, $lam * c.rel - $oneMinus * (" +
        s"SELECT max(s) FROM sims WHERE ar = c.r AND br IN (${prev(i - 1)})" +
        s") AS mmr FROM short c WHERE c.r NOT IN (${prev(i - 1)}) " +
        "ORDER BY mmr DESC, c.r LIMIT 1)"
    "WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),\n" +
      "q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),\n" +
      s"sh AS (SELECT vec_id, v, round(${duckCosD("v", "qv", 64)}, 5) AS rel\n" +
      "  FROM ev, q WHERE vec_id > 0),\n" +
      "short AS (SELECT vec_id, v, rel,\n" +
      "    row_number() OVER (ORDER BY rel DESC, vec_id) AS r\n" +
      "  FROM sh ORDER BY rel DESC, vec_id LIMIT 12),\n" +
      s"sims AS (SELECT a.r AS ar, b.r AS br, round(${duckCosD("a.v", "b.v", 64)}, 5) AS s\n" +
      "  FROM short a JOIN short b ON a.r <> b.r),\n" +
      s"s1 AS (SELECT r, vec_id, $lam * rel - $oneMinus * 0.0::DOUBLE AS mmr\n" +
      "  FROM short ORDER BY mmr DESC, r LIMIT 1),\n" +
      (2 to 4).map(step).mkString(",\n") + "\n" +
      (1 to 4).map(i =>
        s"SELECT $i AS sel_rank, vec_id, round(mmr, 5) AS mmr FROM s$i")
        .mkString(" UNION ALL ")
  }

  /** Retrieval-metrics oracle: both ranked stages (truncated d=16 runs,
    * exact full-dim qrels with grade = 11 − rank) re-derived over the same
    * rounded cosines, then recall/MRR/nDCG@10 with the identical gain and
    * log2 arithmetic (2^g − 1, ln(r+1)/ln 2) the Spark operator performs. */
  private val retrievalMetricsCte =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id < 5),
       |corpus AS (SELECT vec_id AS doc_id, v FROM ev WHERE vec_id >= 5),
       |runs AS (SELECT query_id, doc_id,
       |    round(${duckCosD("v", "qv", 16)}, 5) AS score
       |  FROM corpus CROSS JOIN qs),
       |topk AS (SELECT * FROM (SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rnk FROM runs)
       |  WHERE rnk <= 10),
       |exact AS (SELECT query_id, doc_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY c DESC, doc_id) AS r
       |  FROM (SELECT query_id, doc_id,
       |      round(${duckCosD("v", "qv", 64)}, 5) AS c
       |    FROM corpus CROSS JOIN qs)),
       |qrels AS (SELECT query_id, doc_id, (11 - r)::DOUBLE AS g
       |  FROM exact WHERE r <= 10),
       |ideal AS (SELECT query_id, count(*)::BIGINT AS n_rel,
       |    sum(CASE WHEN ir <= 10
       |      THEN (pow(2.0, g) - 1.0) / (ln(ir + 1.0) / ln(2.0))
       |      ELSE 0.0 END) AS idcg
       |  FROM (SELECT query_id, g, doc_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY g DESC, doc_id) AS ir FROM qrels)
       |  GROUP BY query_id),
       |hits AS (SELECT t.query_id, t.rnk,
       |    CASE WHEN q.g IS NOT NULL THEN 1 ELSE 0 END AS hit, q.g
       |  FROM topk t LEFT JOIN qrels q
       |    ON t.query_id = q.query_id AND t.doc_id = q.doc_id),
       |per AS (SELECT query_id,
       |    sum(hit)::BIGINT AS rel_found,
       |    max(CASE WHEN hit = 1 THEN 1.0 / rnk END) AS rr,
       |    sum(CASE WHEN hit = 1 THEN cum::DOUBLE / rnk ELSE 0.0 END) AS apnum,
       |    sum(CASE WHEN hit = 1
       |      THEN (pow(2.0, g) - 1.0) / (ln(rnk + 1.0) / ln(2.0))
       |      ELSE 0.0 END) AS dcg
       |  FROM (SELECT *, sum(hit) OVER (PARTITION BY query_id
       |      ORDER BY rnk ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
       |    FROM hits)
       |  GROUP BY query_id),
       |m AS (SELECT i.query_id, i.n_rel,
       |  coalesce(p.rel_found, 0)::BIGINT AS rel_found,
       |  round(coalesce(p.rel_found, 0)::DOUBLE / i.n_rel::DOUBLE, 5) AS recall,
       |  round(coalesce(p.rr, 0.0), 5) AS mrr,
       |  round(coalesce(p.apnum, 0.0) / i.n_rel, 5) AS ap,
       |  round(coalesce(p.dcg, 0.0) / i.idcg, 5) AS ndcg
       |FROM ideal i LEFT JOIN per p USING (query_id))"""

  private val retrievalMetricsOracleSql =
    s"""$retrievalMetricsCte
       |SELECT query_id, n_rel, rel_found, recall, mrr, ap, ndcg FROM m""".stripMargin

  /** Retrieval-summary oracle: the macro means over the ROUNDED per-query
    * report (the ECE replay contract) — MAP is the ap mean. */
  private val retrievalSummaryOracleSql =
    s"""$retrievalMetricsCte
       |SELECT count(*)::BIGINT AS n_queries,
       |  round(avg(recall), 5) AS mean_recall,
       |  round(avg(mrr), 5) AS mean_mrr,
       |  round(avg(ap), 5) AS map,
       |  round(avg(ndcg), 5) AS mean_ndcg
       |FROM m""".stripMargin

  /** Shared margin-full fragment: the q_quality_lr scorer (hashed-bucket
    * weights) + the planted doc_id % 3 label, ending in CTE
    * `s(doc_id, score, y)`. Interpolated BEFORE the single stripMargin of
    * each consumer (nesting an already-stripped fragment would eat the
    * continuation bars). */
  private val qualityScoredCte =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents WHERE doc_id < 300),
      |b AS (SELECT doc_id,
      |    ('0x' || substr(md5(t), 1, 8))::BIGINT % 256 AS b
      |  FROM tok WHERE len(t) > 0),
      |z AS (SELECT doc_id,
      |    sum(((b * 96769) % 2000) / 1000.0 - 1.0) AS z
      |  FROM b GROUP BY doc_id),
      |s AS (SELECT d.doc_id,
      |    round(1.0 / (1.0 + exp(-coalesce(z.z, 0.0))), 5) AS score,
      |    CASE WHEN d.doc_id % 3 = 0 THEN 1 ELSE 0 END AS y
      |  FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
      |  LEFT JOIN z USING (doc_id))"""

  /** PR-sweep oracle: the q_quality_lr scorer replayed (hashed-bucket
    * weights), label = doc_id % 3 = 0, then cumulative TP/PP down the
    * descending distinct-score axis and the same double-division
    * precision/recall/F1 arithmetic, rounded at 5. */
  private val prSweepOracleSql =
    s"""$qualityScoredCte,
      |by_score AS (SELECT score AS threshold, sum(y)::BIGINT AS pos,
      |    count(*)::BIGINT AS n
      |  FROM s GROUP BY 1),
      |cum AS (SELECT threshold,
      |    sum(pos) OVER (ORDER BY threshold DESC)::BIGINT AS tp,
      |    sum(n) OVER (ORDER BY threshold DESC)::BIGINT AS pp
      |  FROM by_score),
      |tot AS (SELECT sum(y)::BIGINT AS p FROM s),
      |pr AS (SELECT threshold, tp, pp, p,
      |    tp::DOUBLE / pp::DOUBLE AS prec,
      |    CASE WHEN p > 0 THEN tp::DOUBLE / p::DOUBLE ELSE 0.0 END AS rec
      |  FROM cum CROSS JOIN tot)
      |SELECT threshold, tp, (pp - tp)::BIGINT AS fp, (p - tp)::BIGINT AS fn,
      |  round(prec, 5) AS "precision", round(rec, 5) AS recall,
      |  round(CASE WHEN prec + rec > 0 THEN 2.0 * prec * rec / (prec + rec)
      |    ELSE 0.0 END, 5) AS f1
      |FROM pr""".stripMargin

  /** The q_quality_lr scorer + planted doc_id % 3 label — the shared
    * fixture of the classifier-evaluation family (PR sweep, ROC AUC,
    * calibration): scores are 5-decimal sigmoids with natural ties,
    * labels deterministic on both engines. */
  private def qualityScored(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    QualityClassifier.scoreLinear(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
        weights = Array.tabulate(256)(b => ((b * 96769) % 2000) / 1000.0 - 1.0))
      .withColumn("label", pmod(col("doc_id"), lit(3)) === 0)

  /** ROC-AUC oracle: the Mann-Whitney rank-sum identity over the same
    * distinct-score cumulative — tie groups at average rank cn − (n−1)/2,
    * exact half-integer arithmetic until the final division. */
  private val rocAucOracleSql =
    s"""$qualityScoredCte,
       |by_score AS (SELECT score AS sc, sum(y)::BIGINT AS pos,
       |    count(*)::BIGINT AS n
       |  FROM s GROUP BY 1),
       |cum AS (SELECT pos, n,
       |    sum(n) OVER (ORDER BY sc ASC)::BIGINT AS cn FROM by_score),
       |sums AS (SELECT
       |    sum(pos::DOUBLE * (cn::DOUBLE - (n::DOUBLE - 1.0) / 2.0)) AS ranksum,
       |    sum(pos)::BIGINT AS p, sum(n)::BIGINT AS t FROM cum)
       |SELECT p AS n_pos, (t - p)::BIGINT AS n_neg,
       |  round(CASE WHEN p > 0 AND t > p
       |    THEN (ranksum - p::DOUBLE * (p::DOUBLE + 1.0) / 2.0)
       |      / (p::DOUBLE * (t - p)::DOUBLE) END, 6) AS auc
       |FROM sums""".stripMargin

  /** Calibration-report oracle: fixed equal-width bins over the sigmoid
    * scores, per-bin count / mean confidence / empirical accuracy. */
  private val calibrationOracleSql =
    s"""$qualityScoredCte,
       |binned AS (SELECT
       |    least(greatest(floor(score * 10), 0), 9)::BIGINT AS bin, score, y
       |  FROM s)
       |SELECT bin, count(*)::BIGINT AS n,
       |  round(sum(score) / count(*), 5) AS confidence,
       |  round(sum(y)::DOUBLE / count(*), 5) AS accuracy
       |FROM binned GROUP BY bin""".stripMargin

  /** ECE oracle: the weighted |accuracy − confidence| gap over the SAME
    * rounded per-bin report the calibration oracle emits. */
  private val eceOracleSql =
    s"""$qualityScoredCte,
       |binned AS (SELECT
       |    least(greatest(floor(score * 10), 0), 9)::BIGINT AS bin, score, y
       |  FROM s),
       |rep AS (SELECT bin, count(*)::BIGINT AS n,
       |    round(sum(score) / count(*), 5) AS confidence,
       |    round(sum(y)::DOUBLE / count(*), 5) AS accuracy
       |  FROM binned GROUP BY bin)
       |SELECT round(sum(n::DOUBLE * abs(accuracy - confidence)) / sum(n), 5)
       |  AS ece
       |FROM rep""".stripMargin

  /** Cohen's-kappa oracle: the same contingency/marginal arithmetic with
    * identical double subexpressions (po, pe/n², their quotient). */
  private val kappaOracleSql =
    """WITH r AS (SELECT (n_chars % 3)::VARCHAR AS a,
      |    ((n_chars + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END) % 3)::VARCHAR AS b
      |  FROM documents),
      |cell AS (SELECT a, b, count(*)::BIGINT AS c FROM r GROUP BY 1, 2),
      |base AS (SELECT sum(c)::BIGINT AS n,
      |    sum(CASE WHEN a = b THEN c ELSE 0 END)::BIGINT AS ag FROM cell),
      |ma AS (SELECT a, sum(c)::BIGINT AS na FROM cell GROUP BY 1),
      |mb AS (SELECT b, sum(c)::BIGINT AS nb FROM cell GROUP BY 1),
      |pef AS (SELECT coalesce(sum(na::DOUBLE * nb::DOUBLE), 0.0) AS pe
      |  FROM ma JOIN mb ON ma.a = mb.b)
      |SELECT n, round(ag::DOUBLE / n::DOUBLE, 5) AS po,
      |  round(pe / (n::DOUBLE * n::DOUBLE), 5) AS pe,
      |  round(CASE WHEN pe < n::DOUBLE * n::DOUBLE THEN
      |    (ag::DOUBLE / n::DOUBLE - pe / (n::DOUBLE * n::DOUBLE))
      |      / (1.0 - pe / (n::DOUBLE * n::DOUBLE)) END, 5) AS kappa
      |FROM base CROSS JOIN pef""".stripMargin

  /** Shared margin-full fragment for the classification-report pair: a
    * planted predictor over the documents' lang label (every zh and
    * every 4th doc predicted en — so one class is never predicted and
    * en is over-predicted), ending in the per-class CTE
    * `r(class, n_actual, n_pred, tp, prec, rec)`. */
  /** The planted lang predictor as a margin-full SQL fragment — the
    * single source interpolated into BOTH the batch report oracles and
    * the streaming confusion oracle (same no-drift contract as the Scala
    * [[plantedLangPred]]). Ends in CTE `d(a, p)`. */
  private[graft] val plantedLangPredCte =
    """d AS (SELECT lang AS a,
      |    CASE WHEN lang = 'zh' THEN 'en'
      |      WHEN doc_id % 4 = 0 THEN 'en' ELSE lang END AS p
      |  FROM documents)"""

  private val classReportCte =
    s"""WITH $plantedLangPredCte,
      |cell AS (SELECT a, p, count(*)::BIGINT AS c FROM d GROUP BY 1, 2),
      |am AS (SELECT a AS class, sum(c)::BIGINT AS n_actual FROM cell GROUP BY 1),
      |pm AS (SELECT p AS class, sum(c)::BIGINT AS n_pred FROM cell GROUP BY 1),
      |diag AS (SELECT a AS class, c::BIGINT AS tp FROM cell WHERE a = p),
      |j AS (SELECT coalesce(am.class, pm.class) AS class,
      |    coalesce(n_actual, 0)::BIGINT AS n_actual,
      |    coalesce(n_pred, 0)::BIGINT AS n_pred
      |  FROM am FULL OUTER JOIN pm ON am.class = pm.class),
      |r AS (SELECT j.class, n_actual, n_pred,
      |    coalesce(diag.tp, 0)::BIGINT AS tp,
      |    CASE WHEN n_pred > 0
      |      THEN coalesce(diag.tp, 0)::DOUBLE / n_pred::DOUBLE
      |      ELSE 0.0 END AS prec,
      |    CASE WHEN n_actual > 0
      |      THEN coalesce(diag.tp, 0)::DOUBLE / n_actual::DOUBLE
      |      ELSE 0.0 END AS rec
      |  FROM j LEFT JOIN diag ON j.class = diag.class)"""

  /** Classification-report oracle: per-class counts + P/R/F1 with the
    * sklearn zero-division conventions. */
  private val classReportOracleSql =
    s"""$classReportCte
       |SELECT class, n_actual, n_pred, tp,
       |  round(prec, 5) AS "precision", round(rec, 5) AS recall,
       |  round(CASE WHEN prec + rec > 0
       |    THEN 2.0 * prec * rec / (prec + rec) ELSE 0.0 END, 5) AS f1
       |FROM r""".stripMargin

  /** Classification-summary oracle: accuracy from the exact counts,
    * macro averages of the ROUNDED per-class values. */
  private val classSummaryOracleSql =
    s"""$classReportCte,
       |rr AS (SELECT n_actual, tp, round(prec, 5) AS p5, round(rec, 5) AS r5,
       |    round(CASE WHEN prec + rec > 0
       |      THEN 2.0 * prec * rec / (prec + rec) ELSE 0.0 END, 5) AS f5
       |  FROM r)
       |SELECT sum(n_actual)::BIGINT AS n,
       |  round(sum(tp)::DOUBLE / sum(n_actual)::DOUBLE, 5) AS accuracy,
       |  round(avg(p5), 5) AS macro_precision,
       |  round(avg(r5), 5) AS macro_recall,
       |  round(avg(f5), 5) AS macro_f1
       |FROM rr""".stripMargin

  /** The planted lang predictor — ONE definition shared by the batch
    * classification pair AND the streaming confusion monitor (their
    * stream-equals-batch parity depends on the copies never drifting). */
  private[graft] def plantedLangPred(lang: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(lang === "zh", lit("en"))
      .when(pmod(id, lit(4)) === 0, lit("en"))
      .otherwise(lang)

  /** The planted predictor frame shared by the classification pair. */
  private def classPredictions(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    t(s, dir, "documents").select(col("lang").as("actual"),
      plantedLangPred(col("lang"), col("doc_id")).as("pred"))

  /** The retrieval-eval fixture shared by q_retrieval_metrics and
    * q_retrieval_summary: runs = the matryoshka-d16 stage's scores,
    * qrels = graded judgments from the exact full-dim ranking
    * (grade = 11 − rank over the top 10). */
  /** One scored stage of the multi-query retrieval fixture: queries =
    * vec_id < 5, corpus = the rest, per-pair cosine on the first `dim`
    * dimensions rounded to 5 — the single construction every retrieval
    * eval query (metrics, summary, rank agreement, hard negatives)
    * derives its runs/qrels from. */
  private def scoredRun(s: org.apache.spark.sql.SparkSession, dir: String,
      dim: Int, scoreName: String) = {
    val emb = t(s, dir, "embeddings")
    val qs = broadcast(emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qv")))
    emb.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .crossJoin(qs)
      .select(col("query_id"), col("doc_id"),
        round(VectorFunctions.cosine(
          slice(col("embedding"), 1, dim), slice(col("__qv"), 1, dim)), 5)
          .as(scoreName))
  }

  private def retrievalEvalFixture(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    val runs = scoredRun(s, dir, 16, "score")
    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__cos").desc, col("doc_id"))
    val qrels = scoredRun(s, dir, 64, "__cos")
      .withColumn("__r", row_number().over(exactW))
      .filter(col("__r") <= 10)
      .select(col("query_id"), col("doc_id"),
        (lit(11) - col("__r")).as("grade"))
    (runs, qrels)
  }

  /** Rank-agreement oracle: both cosine rankings over the shared corpus,
    * distinct integer ranks (score desc, doc tiebreak), the exact
    * Spearman ρ over squared rank displacements 1 − 6Σd²/(n(n²−1)). */
  private val rankAgreementOracleSql =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id < 5),
       |scored AS (SELECT query_id, vec_id AS doc_id,
       |    round(${duckCosD("v", "qv", 64)}, 5) AS sa,
       |    round(${duckCosD("v", "qv", 16)}, 5) AS sb
       |  FROM ev CROSS JOIN qs WHERE vec_id >= 5),
       |ranked AS (SELECT query_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sa DESC, doc_id) AS ra,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sb DESC, doc_id) AS rb
       |  FROM scored)
       |SELECT query_id, count(*)::BIGINT AS n,
       |  round(CASE WHEN count(*) >= 2 THEN
       |    1.0 - 6.0 * sum(pow(ra - rb, 2))
       |      / (count(*)::DOUBLE * (count(*)::DOUBLE * count(*)::DOUBLE - 1.0))
       |    END, 5) AS spearman
       |FROM ranked GROUP BY query_id""".stripMargin

  /** Hard-negative oracle: relevance = the exact cosine top-3 per query,
    * negatives = the rank window over everything the anti-join keeps. */
  private val hardNegOracleSql =
    s"""WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id < 5),
       |runs AS (SELECT query_id, vec_id AS doc_id,
       |    round(${duckCosD("v", "qv", 64)}, 5) AS score
       |  FROM ev CROSS JOIN qs WHERE vec_id >= 5),
       |exact AS (SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS r
       |  FROM runs),
       |rels AS (SELECT query_id, doc_id FROM exact WHERE r <= 3),
       |neg AS (SELECT n.query_id, n.doc_id, n.score,
       |    row_number() OVER (PARTITION BY n.query_id
       |      ORDER BY n.score DESC, n.doc_id) AS neg_rank
       |  FROM runs n LEFT JOIN rels
       |    ON n.query_id = rels.query_id AND n.doc_id = rels.doc_id
       |  WHERE rels.doc_id IS NULL)
       |SELECT query_id, doc_id, score, neg_rank::INT AS neg_rank
       |FROM neg WHERE neg_rank <= 5""".stripMargin

  /** Bradley-Terry oracle: wins + unordered pair counts, then the MM
    * update unrolled twice from the uniform start (iteration-1 denom is
    * n/(1+1); strengths round to 6 after each iteration, exactly as the
    * operator does). */
  private val bradleyTerryOracleSql =
    """WITH p AS (SELECT a.lang AS w, b.lang AS l FROM documents a
      |  JOIN documents b ON b.doc_id = a.doc_id + 1 WHERE a.lang <> b.lang),
      |wins AS (SELECT w AS item, count(*)::DOUBLE AS wins FROM p GROUP BY 1),
      |pc AS (SELECT least(w, l) AS a, greatest(w, l) AS b,
      |    count(*)::DOUBLE AS n
      |  FROM p GROUP BY 1, 2),
      |items AS (SELECT DISTINCT item FROM
      |  (SELECT w AS item FROM p UNION ALL SELECT l FROM p)),
      |d1 AS (SELECT item, sum(c) AS d FROM (
      |    SELECT a AS item, n / (1.0 + 1.0) AS c FROM pc
      |    UNION ALL SELECT b, n / (1.0 + 1.0) FROM pc) GROUP BY 1),
      |w1 AS (SELECT i.item,
      |    CASE WHEN coalesce(wins.wins, 0.0) > 0
      |      THEN greatest(round(coalesce(wins.wins, 0.0) / d1.d, 6), 0.000001)
      |      ELSE 0.0 END AS s
      |  FROM items i JOIN d1 USING (item)
      |  LEFT JOIN wins ON wins.item = i.item),
      |d2 AS (SELECT item, sum(c) AS d FROM (
      |    SELECT pc.a AS item, pc.n / (wa.s + wb.s) AS c FROM pc
      |      JOIN w1 wa ON wa.item = pc.a JOIN w1 wb ON wb.item = pc.b
      |    UNION ALL
      |    SELECT pc.b, pc.n / (wa.s + wb.s) FROM pc
      |      JOIN w1 wa ON wa.item = pc.a JOIN w1 wb ON wb.item = pc.b)
      |  GROUP BY 1)
      |SELECT i.item,
      |  CASE WHEN coalesce(wins.wins, 0.0) > 0
      |    THEN greatest(round(coalesce(wins.wins, 0.0) / d2.d, 6), 0.000001)
      |    ELSE 0.0 END AS strength
      |FROM items i JOIN d2 USING (item)
      |LEFT JOIN wins ON wins.item = i.item""".stripMargin

  /** Batch-assembly oracle: whitespace token counts, global positions via
    * row_number over (n_tok, doc_id) and (doc_id), integer-divided into
    * batches of 32, per-batch max/sum/waste for both strategies. */
  private val batchAssemblyOracleSql =
    """WITH lens AS (SELECT doc_id,
      |    (CASE WHEN length(text) = 0 THEN 0
      |      ELSE length(text) - length(replace(text, ' ', '')) + 1
      |      END)::BIGINT AS n_tok
      |  FROM documents),
      |srt AS (SELECT doc_id, n_tok,
      |    (row_number() OVER (ORDER BY n_tok, doc_id) - 1) // 32 AS batch_id
      |  FROM lens),
      |arr AS (SELECT doc_id, n_tok,
      |    (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS batch_id
      |  FROM lens),
      |rep AS (SELECT 'length_sorted' AS strategy, batch_id,
      |    count(*)::BIGINT AS n_seqs, max(n_tok) AS max_tok,
      |    sum(n_tok)::BIGINT AS sum_tok
      |  FROM srt GROUP BY 2
      |  UNION ALL
      |  SELECT 'arrival', batch_id, count(*)::BIGINT, max(n_tok),
      |    sum(n_tok)::BIGINT
      |  FROM arr GROUP BY 2)
      |SELECT batch_id::BIGINT AS batch_id, n_seqs, max_tok, sum_tok,
      |  (max_tok * n_seqs - sum_tok)::BIGINT AS pad_tokens, strategy
      |FROM rep""".stripMargin

  /** Shared CTE chain (docs → tokens → md5 MinHash → bands → candidates →
    * Jaccard-verified pairs `ver`) — both keeper oracles and the recursive
    * CC oracle interpolate this so banding/tokenization changes happen in
    * one place. */
  private def verifiedPairsSqlAt(threshold: String,
      docsSql: String = s"SELECT * FROM $dupUnionSql"): String =
    s"""docs AS ($docsSql),
       |tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM docs),
       |sig AS (SELECT doc_id, min(md5(t || '#0')) AS mh0, min(md5(t || '#1')) AS mh1,
       |  min(md5(t || '#2')) AS mh2, min(md5(t || '#3')) AS mh3 FROM tok GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, sha256(mh0 || '|' || mh1) AS band_hash FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, sha256(mh2 || '|' || mh3) AS band_hash FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY 1),
       |inter AS (SELECT c.id_a, c.id_b, count(*) AS n FROM cand c
       |  JOIN tok ta ON ta.doc_id = c.id_a
       |  JOIN tok tb ON tb.doc_id = c.id_b AND tb.t = ta.t
       |  GROUP BY 1, 2),
       |ver AS (SELECT id_a, id_b FROM inter
       |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |  WHERE n * 1.0 / (sa.sz + sb.sz - n) >= $threshold)""".stripMargin

  private def keepersOracleSqlAt(threshold: String): String =
    s"""WITH ${verifiedPairsSqlAt(threshold)},
       |keep AS (SELECT id_b AS dup_id, min(id_a) AS keeper FROM ver GROUP BY 1)
       |SELECT d.doc_id AS doc_id, coalesce(k.keeper, d.doc_id) AS keeper_id
       |FROM docs d LEFT JOIN keep k ON k.dup_id = d.doc_id""".stripMargin

  private def keepersCcOracleSqlAt(threshold: String, docsSql: String): String =
    s"""WITH RECURSIVE ${verifiedPairsSqlAt(threshold, docsSql)},
       |edges AS (SELECT id_a AS src, id_b AS dst FROM ver
       |  UNION SELECT id_b, id_a FROM ver),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS comp FROM docs
       |  UNION
       |  SELECT e.dst AS id, r.comp AS comp
       |  FROM reach r JOIN edges e ON e.src = r.id)
       |SELECT id AS doc_id, min(comp) AS keeper_id FROM reach GROUP BY id""".stripMargin

  /** The q_text_bpe merge table — shared literal for the Spark query and
    * the generated DuckDB sweep so the two can never drift. Lowercase
    * ASCII only (keeps the generated SQL quoting trivial) and
    * causality-valid by construction (BpeMerges validates on use). */
  private[graft] val oracleBpePairs: IndexedSeq[(String, String)] = IndexedSeq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("o", "u"), ("s", "t"), ("in", "g"), ("e", "n"),
    ("a", "t"), ("o", "r"), ("e", "s"), ("t", "o"), ("i", "t"), ("a", "l"))

  /** DuckDB replay of greedy BPE as a rank-order replace() sweep: each
    * word's code points are wrapped as chr(2)sym·chr(3) units, each merge
    * becomes one replace of the adjacent wrapped pair (left-to-right,
    * non-overlapping — SQL replace's own semantics, matching the
    * encoder's leftmost-first rule), applied innermost-first in rank
    * order. Token count = chr(2) occurrences; the joined token stream is
    * rebuilt with chr(31) boundaries. Sentinel caveat: chr(2)/chr(3)
    * inside a document would corrupt the wrapping — impossible in the
    * synthetic fixture, and it would fail the compare loudly, not
    * silently. */
  /** The words → wrapped-code-points → rank-order-sweep CTE chain shared
    * by the q_text_bpe and q_bpe_fertility oracles. Yields CTEs `w`
    * (doc_id, i, w) and `merged` (doc_id, i, s). */
  private def bpeSweepCtes: String = bpeSweepCtesOver("doc_id",
    "(SELECT doc_id, text FROM documents WHERE doc_id < 300) src")

  /** The sweep chain over an arbitrary keyed text source — `srcSql` must
    * select `keys` plus a `text` column. Yields CTEs `w` (keys, i, w) and
    * `merged` (keys, i, s). */
  private def bpeSweepCtesOver(keys: String, srcSql: String): String = {
    oracleBpePairs.foreach { case (l, r) =>
      require((l + r).forall(c => c >= 'a' && c <= 'z'),
        s"oracle merge table must stay lowercase-ASCII: ($l, $r)")
    }
    def wrap(sym: String) = s"chr(2)||'$sym'||chr(3)"
    val mergedExpr = oracleBpePairs.foldLeft("s0") { case (acc, (l, r)) =>
      s"replace($acc, ${wrap(l)}||${wrap(r)}, ${wrap(l + r)})"
    }
    s"""w AS (
       |  SELECT $keys, i, ts[i] AS w FROM (
       |    SELECT $keys, regexp_split_to_array(text, '\\s+') AS ts,
       |      unnest(generate_series(1, len(regexp_split_to_array(text, '\\s+')))) AS i
       |    FROM $srcSql)
       |  WHERE ts[i] <> ''),
       |wrapped AS (SELECT $keys, i,
       |    chr(2) || array_to_string(regexp_extract_all(w, '.'), chr(3)||chr(2))
       |      || chr(3) AS s0
       |  FROM w),
       |merged AS (SELECT $keys, i, $mergedExpr AS s FROM wrapped)"""
  } // NOTE: margin-full — the composing oracle strips ONCE (double
    // stripMargin would eat the leading bar of every `||` continuation)

  /** (symbol → id) VALUES list for the q_bpe_ids / q_bpe_pack_ids
    * oracles — generated from the SAME literal table as the Spark side
    * (Bpe.vocabOf), so the id contract cannot drift. */
  private def bpeVocabValuesSql: String =
    graft.functions.Bpe.vocabOf(graft.expressions.BpeMerges(oracleBpePairs))
      .zipWithIndex
      .map { case (s, i) => s"('$s', ${i + 1})" }
      .mkString("(VALUES ", ", ", ") v(sym, id)")

  /** SQL IN-list of the oracle table's CLOSED vocabulary (single chars +
    * merge outputs) — the byte-fallback membership test, generated from
    * the same literal as the Spark-side `knownSymbols` set. */
  private def bpeKnownSymbolsInList: String =
    graft.functions.Bpe.vocabOf(graft.expressions.BpeMerges(oracleBpePairs))
      .map(s => s"'$s'").mkString("(", ", ", ")")

  /** The byte-fallback fixture: whitespace normalized to single interior
    * spaces (so the oracle can model separators as exactly one `<0x20>`
    * token between word streams) plus a planted multi-byte tail —
    * é (C3 A9), € (E2 82 AC), 🐕 (F0 9F 90 95) exercise 2/3/4-byte UTF-8
    * decomposition; the lowercase fixture itself already contains letters
    * outside the 13-letter merge alphabet (b, c, f, j, k, m, …), so
    * fallback fires on ordinary text too. Spark and SQL forms built from
    * the same shape so they cannot drift. */
  private def bpeBytesFixtureCol: org.apache.spark.sql.Column =
    concat(trim(regexp_replace(col("text"), "\\s+", " ")), lit(" é€🐕"))
  private def bpeBytesFixtureSrcSql: String =
    "(SELECT doc_id, source, trim(regexp_replace(text, '\\s+', ' ', 'g'))" +
      " || ' é€🐕' AS text FROM documents WHERE doc_id < 300) src"

  /** DuckDB replay of the BYTE-FALLBACK token stream: the rank-order
    * sweep (see [[bpeSweepCtesOver]]) yields each word's final symbols;
    * symbols outside the closed vocabulary expand to one `<0xAB>` token
    * per UTF-8 byte (`hex(encode(t))` split into byte pairs — uppercase
    * hex on both engines), and the single-space separators the fixture
    * guarantees become one `<0x20>` token between word streams. Yields
    * CTE `fbagg` (doc_id, j) with the chr(31)-joined lossless stream. */
  private def bpeFallbackCtes: String =
    s"""${bpeSweepCtesOver("doc_id", bpeBytesFixtureSrcSql)},
       |fb AS (SELECT doc_id, i,
       |    array_to_string(list_transform(
       |      string_split(trim(s, chr(2)||chr(3)), chr(3)||chr(2)),
       |      t -> CASE WHEN t IN $bpeKnownSymbolsInList THEN t
       |        ELSE array_to_string(list_transform(
       |          regexp_extract_all(hex(encode(t)), '..'),
       |          x -> '<0x' || x || '>'), chr(31)) END), chr(31)) AS ws
       |  FROM merged),
       |fbagg AS (SELECT doc_id,
       |    string_agg(ws, chr(31) || '<0x20>' || chr(31) ORDER BY i) AS j
       |  FROM fb GROUP BY 1)"""

  /** The constant system prompt of the SFT/DPO fixtures — interpolated
    * into BOTH engines' sides so the literal cannot drift. */
  private[graft] val SftSystemPrompt = "be concise"

  /** The fold-key fixture with accents planted in BOTH composed and
    * decomposed Unicode forms plus non-decomposable letters — shared by
    * q_text_fold and its streaming twin (one builder, one oracle; the
    * chatGateFixture anti-drift pattern). Input needs (doc_id, text). */
  private[graft] def textFoldFixture(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val composed = concat(lit("Hanw"), lit("ë"), lit("lla  St"),
      lit("ä"), lit("tion "), col("text").substr(1, 20),
      lit(" Øystein straße"))
    val decomposed = concat(lit("Hanwe"), lit("̈"), lit("lla  Sta"),
      lit("̈"), lit("tion "), col("text").substr(1, 20),
      lit(" Øystein straße"))
    docs.select(col("doc_id"),
      graft.functions.TextFunctions.foldForMatch(composed).as("folded"),
      (graft.functions.TextFunctions.foldForMatch(composed) ===
        graft.functions.TextFunctions.foldForMatch(decomposed))
        .as("forms_agree"))
  }

  /** The chat-gate fixture with planted structure violations, shared by
    * q_chat_gate AND its streaming twin (one builder so the two sides of
    * the shared oracle can never drift): conv %7 gets a whitespace-only
    * assistant turn, %11 swaps the user/assistant roles, %13 appends a
    * trailing user turn. Input: (conv_id, utext, atext). */
  private[graft] def chatGateFixture(
      convs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val m7 = pmod(col("conv_id"), lit(7)) === 0
    val m11 = pmod(col("conv_id"), lit(11)) === 0
    val m13 = pmod(col("conv_id"), lit(13)) === 0
    val arr4 = array(
      struct(lit("system").as("role"), lit(SftSystemPrompt).as("content")),
      struct(when(m11, "assistant").otherwise("user").as("role"),
        col("utext").as("content")),
      struct(when(m11, "user").otherwise("assistant").as("role"),
        when(m7, "  ").otherwise(col("atext")).as("content")),
      struct(lit("user").as("role"), lit("more please").as("content")))
    convs.select(col("conv_id"),
      when(m13, arr4).otherwise(slice(arr4, 1, 3)).as("turns"))
  }

  /** One 100-doc arm of the SFT/DPO fixtures: docs in [lo, lo+100),
    * keyed back to the conversation/pair id (doc_id − lo). */
  private def docArm(s: org.apache.spark.sql.SparkSession, dir: String,
      lo: Int, key: String, as: String): org.apache.spark.sql.DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") >= lo && col("doc_id") < lo + 100)
      .select((col("doc_id") - lo).as(key), col("text").as(as))

  /** SFT conversation fixture (shared by q_sft_render / q_sft_loss_spans
    * and, extended by a rejected arm, q_pref_pairs): conv i (< 100) pairs
    * doc i's text as the user turn with doc (i+100)'s text as the
    * assistant completion under the constant system prompt — three
    * ordered turns, deterministic on both engines. */
  private def sftConvs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    docArm(s, dir, 0, "conv_id", "utext")
      .join(docArm(s, dir, 100, "conv_id", "atext"), "conv_id")
      .select(col("conv_id"), array(
        struct(lit("system").as("role"), lit(SftSystemPrompt).as("content")),
        struct(lit("user").as("role"), col("utext").as("content")),
        struct(lit("assistant").as("role"), col("atext").as("content")))
        .as("turns"))

  /** The same fixture as [[sftConvs]] in SQL (margin-full; composing
    * oracle strips once): CTEs `conv` and `turns`. */
  private def sftTurnsCtes: String =
    s"""conv AS (SELECT u.doc_id AS conv_id, u.text AS utext, a.text AS atext
       |  FROM documents u JOIN documents a ON a.doc_id = u.doc_id + 100
       |  WHERE u.doc_id < 100),
       |turns AS (
       |  SELECT conv_id, 0 AS turn_idx, 'system' AS role,
       |    '$SftSystemPrompt' AS content FROM conv
       |  UNION ALL SELECT conv_id, 1, 'user', utext FROM conv
       |  UNION ALL SELECT conv_id, 2, 'assistant', atext FROM conv)"""

  private def bpeOracleSql: String =
    s"""WITH $bpeSweepCtes,
       |agg AS (SELECT doc_id,
       |    sum(length(s) - length(replace(s, chr(2), ''))) AS n,
       |    string_agg(replace(replace(replace(s, chr(3)||chr(2), chr(31)),
       |      chr(2), ''), chr(3), ''), chr(31) ORDER BY i) AS j
       |  FROM merged GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) AS n_bpe_tokens,
       |  coalesce(a.j, '') AS bpe_joined
       |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
       |LEFT JOIN agg a USING (doc_id)""".stripMargin

  private def bpeFertilityOracleSql: String =
    s"""WITH $bpeSweepCtes,
       |agg AS (SELECT doc_id, count(*) AS words,
       |    sum(length(s) - length(replace(s, chr(2), ''))) AS n
       |  FROM merged GROUP BY 1)
       |SELECT d.doc_id,
       |  CAST(coalesce(a.words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_bpe_tokens,
       |  CASE WHEN coalesce(a.words, 0) = 0 THEN 0.0
       |    ELSE round(a.n * 1.0 / a.words, 6) END AS fertility
       |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
       |LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Planted encoding damage keyed on doc_id (shared by
    * q_encoding_quality and its streaming twin): %3 docs gain U+FFFD
    * replacement chars, %5 a C0 control byte, %7 the mojibake digraph. */
  private[graft] def encodingFixtureText: org.apache.spark.sql.Column =
    concat(col("text"),
      when(col("doc_id") % 3 === 0,
        when(col("doc_id") % 2 === 0, lit("\uFFFD\uFFFD"))
          .otherwise(lit("\uFFFD"))).otherwise(lit("")),
      when(col("doc_id") % 5 === 0, lit("\u0007")).otherwise(lit("")),
      when(col("doc_id") % 7 === 0, lit(" caf\u00C3\u00A9"))
        .otherwise(lit("")))

  /** The constructed C4 fixture page (the raw fixture has no lines or
    * punctuation): kept lines, dropped lines, and planted page-level
    * failures keyed on doc_id. Shared by q_c4_gate and its streaming
    * twin so batch, stream and oracle all gate the same pages. */
  private[graft] def c4FixturePage: org.apache.spark.sql.Column = {
    val t0 = col("text")
    val l1 = concat(substring(t0, 1, 20), lit(". "),
      substring(t0, 21, 20), lit(". "), substring(t0, 41, 20), lit("."))
    val l5 = concat(substring(t0, 10, 20), lit("! "),
      substring(t0, 30, 20), lit("!"))
    concat_ws("\n",
      l1,
      substring(t0, 31, 20),
      lit("use javascript today."),
      lit("a b."),
      when(col("doc_id") % 4 =!= 0, l5),
      when(col("doc_id") % 5 === 0, lit("and lorem ipsum text here.")),
      when(col("doc_id") % 7 === 0, lit("config { block")))
  }

  val defs: Seq[(String, QueryDef)] = Seq(

    // ---- exact dedup: hash-groupBy, one shuffle on the digest ------------
    "q_dedup_exact" -> QueryDef(
      (s, dir) => Dedup.exact(docsWithDups(s, dir), "doc_id", "text"),
      // coalesce mirrors the engine's per-id NULL-text sentinel (NULL
      // texts are singletons, never one pooled NULL group)
      Some(s"""SELECT coalesce(sha256(text), '__null__' || doc_id) AS text_hash,
              |  min(doc_id) AS keeper_id, count(*) AS n_dups
              |FROM $dupUnionSql GROUP BY 1""".stripMargin)),

    // ---- source-provenance duplicate matrix ------------------------------
    // which source feeds duplicate content INTO which: a 'recrawl' slice
    // re-ingesting the first 100 docs must pair with each original source
    // by exactly its shared digest count (the fixture's sources never
    // overlap naturally — verified 0 cross-source dups in the raw corpus)
    "q_dedup_source_overlap" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val recrawl = d.filter(col("doc_id") < 100)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("source", lit("recrawl"))
        Dedup.sourceOverlapMatrix(d.unionByName(recrawl),
          "doc_id", "text", "source")
      },
      Some("""WITH u AS (SELECT doc_id, text, source FROM documents
             | UNION ALL
             | SELECT doc_id + 100000, text, 'recrawl'
             | FROM documents WHERE doc_id < 100),
             |cells AS (SELECT
             |    coalesce(sha256(text), '__null__' || doc_id) AS d,
             |    source AS s, count(*) AS n
             |  FROM u GROUP BY 1, 2)
             |SELECT a.s AS source_a, b.s AS source_b,
             |  count(*)::BIGINT AS shared_digests,
             |  sum(a.n)::BIGINT AS dup_docs_a, sum(b.n)::BIGINT AS dup_docs_b
             |FROM cells a JOIN cells b ON a.d = b.d AND a.s < b.s
             |GROUP BY 1, 2""".stripMargin)),

    // ---- bloom-prefiltered cross-corpus anti-join ------------------------
    // Incremental dedup: docs >= 100 are the "new crawl", every doc_id
    // divisible by 7 is the "already-trained" reference set; survivors are
    // new docs whose text digest is not in the reference. The result is
    // exactly the plain anti-join (no false negatives + exact re-check of
    // maybe-positives), which is what the oracle verifies; the high fpp
    // here deliberately exercises the positive-branch re-check.
    "q_dedup_bloom" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        Dedup.bloomPrefilteredAnti(
            d.filter(col("doc_id") >= 100).withColumn("__h", sha2(col("text"), 256)),
            "__h",
            d.filter(col("doc_id") % 7 === 0).select(sha2(col("text"), 256).as("__h")),
            "__h", expectedItems = 100L, fpp = 0.03)
          .select("doc_id", "source")
      },
      Some("""SELECT doc_id, source FROM documents
             |WHERE doc_id >= 100 AND sha256(text) NOT IN
             |  (SELECT sha256(text) FROM documents WHERE doc_id % 7 = 0)""".stripMargin)),

    // ---- MinHash signatures (shingle→minhash) ----------------------------
    "q_dedup_minhash" -> QueryDef(
      (s, dir) =>
        Dedup.minhashSignature(
          t(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text", 4),
      Some("""WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
             |  FROM documents WHERE doc_id < 200)
             |SELECT doc_id, min(md5(t || '#0')) AS mh0, min(md5(t || '#1')) AS mh1,
             |  min(md5(t || '#2')) AS mh2, min(md5(t || '#3')) AS mh3
             |FROM tok GROUP BY doc_id""".stripMargin)),

    // ---- duplicate-cluster size histogram (dataset-card view) -------------
    // The histogram FORCES full keeper materialization (a bare count() of
    // the keeper frame prunes the verify), so the md5-replayable pipeline
    // runs on a bounded sub-corpus: originals < 600 plus their shifted
    // twins — twins pool into 2-clusters, the rest stay singletons.
    "q_dedup_cluster_hist" -> QueryDef(
      (s, dir) => Dedup.dupClusterHistogram(
        Dedup.nearDupKeepers(
          docsWithDups(s, dir)
            .filter(col("doc_id") < 600 || col("doc_id") >= 100000L),
          "doc_id", "text", numHashes = 4, rowsPerBand = 2, threshold = 0.6)),
      Some(s"""WITH ${verifiedPairsSqlAt("0.6",
             s"SELECT * FROM $dupUnionSql WHERE doc_id < 600 OR doc_id >= 100000")},
              |keep AS (SELECT id_b AS dup_id, min(id_a) AS keeper
              |  FROM ver GROUP BY 1),
              |keepers AS (SELECT d.doc_id,
              |    coalesce(k.keeper, d.doc_id) AS keeper_id
              |  FROM docs d LEFT JOIN keep k ON k.dup_id = d.doc_id),
              |cs AS (SELECT keeper_id, count(*) AS cluster_size
              |  FROM keepers GROUP BY 1)
              |SELECT cluster_size, count(*) AS n_clusters,
              |  CAST(cluster_size * count(*) AS BIGINT) AS n_docs
              |FROM cs GROUP BY 1""".stripMargin)),

    // ---- MinHash Jaccard estimate vs exact (the estimator the S-curve
    // integrates): adjacent-id pairs give a spread of true similarities;
    // both the 4-component estimate and the exact token-set Jaccard are
    // replayed, so the estimator's VALUES (not a summary) are certified
    "q_minhash_est" -> QueryDef(
      (s, dir) => {
        val base = t(s, dir, "documents").filter(col("doc_id") < 120)
        val sig = Dedup.minhashSignature(base, "doc_id", "text", 4)
          .select(col("doc_id"),
            array(col("mh0"), col("mh1"), col("mh2"), col("mh3")).as("__sig"))
        val toks = base.select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("__toks"))
        val a = sig.join(toks, "doc_id")
          .select(col("doc_id").as("id_a"), col("__sig").as("__sa"),
            col("__toks").as("__ta"))
        val b = sig.join(toks, "doc_id")
          .select(col("doc_id").as("id_b"), col("__sig").as("__sb"),
            col("__toks").as("__tb"))
        a.join(b, col("id_b") === col("id_a") + 1)
          .select(col("id_a"), col("id_b"),
            Dedup.minhashJaccardEstimate(col("__sa"), col("__sb"))
              .as("est_jaccard"),
            round(size(array_intersect(col("__ta"), col("__tb")))
              .cast("double") /
              size(array_union(col("__ta"), col("__tb"))), 6)
              .as("exact_jaccard"))
      },
      Some("""WITH tok AS (SELECT doc_id,
             |    unnest(list_distinct(string_split(text, ' '))) AS t
             |  FROM documents WHERE doc_id < 120),
             |sig AS (SELECT doc_id,
             |    min(md5(t || '#0')) AS mh0, min(md5(t || '#1')) AS mh1,
             |    min(md5(t || '#2')) AS mh2, min(md5(t || '#3')) AS mh3
             |  FROM tok GROUP BY 1),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    round(((a.mh0 = b.mh0)::INT + (a.mh1 = b.mh1)::INT
             |      + (a.mh2 = b.mh2)::INT + (a.mh3 = b.mh3)::INT) / 4.0, 6)
             |      AS est_jaccard
             |  FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1),
             |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
             |inter AS (SELECT ta.doc_id AS id_a, tb.doc_id AS id_b,
             |    count(*) AS i
             |  FROM tok ta JOIN tok tb
             |    ON tb.doc_id = ta.doc_id + 1 AND tb.t = ta.t
             |  GROUP BY 1, 2)
             |SELECT p.id_a, p.id_b, p.est_jaccard,
             |  round(coalesce(i.i, 0) * 1.0
             |    / (sa.n + sb.n - coalesce(i.i, 0)), 6) AS exact_jaccard
             |FROM p
             |JOIN sz sa ON sa.doc_id = p.id_a
             |JOIN sz sb ON sb.doc_id = p.id_b
             |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b""".stripMargin)),

    // ---- LSH banding: near-dups collide in >=1 band ----------------------
    "q_dedup_lsh_bands" -> QueryDef(
      (s, dir) => {
        val sig = Dedup.minhashSignature(docsWithDups(s, dir), "doc_id", "text", 4)
        Dedup.lshCandidateGroups(sig, "doc_id", 4, 2)
          .select(col("band"), col("band_hash"),
            array_join(transform(col("ids"), _.cast("string")), ",").as("ids_csv"), col("n"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
              |  FROM $dupUnionSql),
              |sig AS (SELECT doc_id, min(md5(t || '#0')) AS mh0, min(md5(t || '#1')) AS mh1,
              |  min(md5(t || '#2')) AS mh2, min(md5(t || '#3')) AS mh3 FROM tok GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, sha256(mh0 || '|' || mh1) AS band_hash FROM sig
              |  UNION ALL
              |  SELECT doc_id, 1 AS band, sha256(mh2 || '|' || mh3) AS band_hash FROM sig)
              |SELECT band, band_hash, string_agg(doc_id, ',' ORDER BY doc_id) AS ids_csv,
              |  count(*) AS n
              |FROM bands GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin)),

    // ---- SimHash (32-bit md5-nibble variant; engine path uses xxhash64) --
    "q_dedup_simhash" -> QueryDef(
      (s, dir) => {
        val toks = t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"),
            explode(array_distinct(TextFunctions.tokens(col("text")))).as("tk"))
          .withColumn("h", md5(col("tk")))
        val votes = toks
          .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("b"))
          .withColumn("nib", expr("instr('0123456789abcdef', substr(h, CAST(b div 4 AS INT) + 1, 1)) - 1"))
          .withColumn("bit", expr("shiftright(nib, CAST(3 - b % 4 AS INT)) & 1"))
          .groupBy("doc_id", "b")
          .agg(sum(col("bit") * 2 - 1).as("vote"))
        votes.groupBy("doc_id")
          .agg(sum(when(col("vote") >= 0, expr("shiftleft(1L, CAST(b AS INT))"))
            .otherwise(0L)).as("simhash32"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tk
             |  FROM documents WHERE doc_id < 200),
             |bits AS (SELECT doc_id, md5(tk) AS h, unnest(generate_series(0, 31)) AS b FROM tok),
             |votes AS (SELECT doc_id, b,
             |  sum(2 * ((instr('0123456789abcdef', substr(h, b // 4 + 1, 1)) - 1)
             |      >> (3 - b % 4) & 1) - 1) AS vote
             |  FROM bits GROUP BY 1, 2)
             |SELECT doc_id, CAST(sum(CASE WHEN vote >= 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT)
             |  AS simhash32
             |FROM votes GROUP BY doc_id""".stripMargin)),

    // ---- n-gram (token-set) Jaccard near-dup pairs ------------------------
    "q_dedup_jaccard" -> QueryDef(
      (s, dir) => {
        Dedup.jaccardPairs(
            t(s, dir, "documents").filter(col("doc_id") < 60), "doc_id", "text", 0.9)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some("""WITH tok AS (SELECT doc_id AS id, unnest(list_distinct(string_split(text, ' '))) AS tk
             |  FROM documents WHERE doc_id < 60),
             |sz AS (SELECT id, count(*) AS sz FROM tok GROUP BY 1),
             |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n FROM tok a
             |  JOIN tok b ON a.tk = b.tk AND a.id < b.id GROUP BY 1, 2)
             |SELECT id_a, id_b, round(n / (sa.sz + sb.sz - n), 6) AS jaccard
             |FROM inter JOIN sz sa ON id_a = sa.id JOIN sz sb ON id_b = sb.id
             |WHERE n / (sa.sz + sb.sz - n) >= 0.9""".stripMargin)),

    // ---- directed containment pairs (prefix-filter set join) --------------
    // |A∩B|/|A| over word-3-gram shingles: the asymmetric relation Jaccard
    // misses (a doc quoted whole inside a longer one). Prefix filtering is
    // LOSSLESS, so the approximate-free Spark path must equal the
    // brute-force oracle exactly — exact-copy variants (ids ≥ 100000)
    // score 1.0 both ways, plus the corpus's natural subset pairs
    "q_dedup_contain" -> QueryDef(
      (s, dir) => Dedup.containmentPairs(
        docsWithDups(s, dir)
          .filter(col("doc_id") < 300 || col("doc_id") >= 100000L),
        "doc_id", "text", threshold = 0.9),
      Some(s"""WITH docs AS (SELECT * FROM $dupUnionSql d
             |    WHERE doc_id < 300 OR doc_id >= 100000),
             |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
             |sh AS (SELECT DISTINCT doc_id, s FROM (
             |  SELECT doc_id, unnest(list_transform(
             |    range(1, greatest(len(w) - 1, 1)),
             |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM w)),
             |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |inter AS (SELECT a.doc_id AS sub_id, b.doc_id AS sup_id,
             |    count(*) AS c
             |  FROM sh a JOIN sh b USING (s)
             |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
             |SELECT sub_id, sup_id, round(c::DOUBLE / n.n, 6) AS containment
             |FROM inter JOIN n ON n.doc_id = sub_id
             |WHERE c::DOUBLE / n.n >= 0.9""".stripMargin)),

    // ---- containment DROP rule over the same fixture ----------------------
    // the corpus filter built on the pairs: non-mutual subsets drop,
    // near-equal twins keep the lower id — oracled end to end so the
    // CorpusPrep stage's semantics are correctness-gated, not just spec'd
    "q_dedup_contain_drop" -> QueryDef(
      (s, dir) => Dedup.containmentDrop(
        docsWithDups(s, dir)
          .filter(col("doc_id") < 300 || col("doc_id") >= 100000L),
        "doc_id", "text", threshold = 0.9)
        .select("doc_id"),
      Some(s"""WITH docs AS (SELECT * FROM $dupUnionSql d
             |    WHERE doc_id < 300 OR doc_id >= 100000),
             |w AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs),
             |sh AS (SELECT DISTINCT doc_id, s FROM (
             |  SELECT doc_id, unnest(list_transform(
             |    range(1, greatest(len(w) - 1, 1)),
             |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM w)),
             |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
             |pairs AS (SELECT sub_id, sup_id FROM (
             |  SELECT a.doc_id AS sub_id, b.doc_id AS sup_id, count(*) AS c
             |  FROM sh a JOIN sh b USING (s)
             |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2) i
             |  JOIN n ON n.doc_id = i.sub_id
             |  WHERE c::DOUBLE / n.n >= 0.9),
             |drops AS (
             |  SELECT p.sub_id FROM pairs p
             |  WHERE NOT EXISTS (SELECT 1 FROM pairs q
             |    WHERE q.sub_id = p.sup_id AND q.sup_id = p.sub_id)
             |  UNION
             |  SELECT p.sub_id FROM pairs p
             |  WHERE p.sub_id > p.sup_id AND EXISTS (SELECT 1 FROM pairs q
             |    WHERE q.sub_id = p.sup_id AND q.sup_id = p.sub_id))
             |SELECT doc_id FROM docs
             |WHERE doc_id NOT IN (SELECT sub_id FROM drops)""".stripMargin)),

    // ---- declarative fuzzy join (FuzzyJoinRewrite optimizer rule) --------
    // the user writes the nested-loop-shaped `levenshtein(a, b) <= 1`
    // join; the Catalyst rule turns it into the FastSS bucketed
    // equi-join (PlanAuditSpec pins the plan) — and the ORACLE is the
    // brute-force join itself, so the rewrite's losslessness is a
    // CORRECTNESS row, not just a spec claim
    "q_fuzzy_join" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val a = d.filter(col("doc_id") < 300)
          .select(col("doc_id").as("id_a"), substring(col("text"), 1, 24).as("ta"))
        val b = d.filter(col("doc_id") >= 100 && col("doc_id") < 400)
          .select(col("doc_id").as("id_b"), substring(col("text"), 1, 24).as("tb"))
        a.join(b, levenshtein(col("ta"), col("tb")) <= 1 &&
            col("id_a") =!= col("id_b"))
          .select("id_a", "id_b")
      },
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |FROM (SELECT doc_id, substr(text, 1, 24) AS t FROM documents
             |      WHERE doc_id < 300) a
             |JOIN (SELECT doc_id, substr(text, 1, 24) AS t FROM documents
             |      WHERE doc_id >= 100 AND doc_id < 400) b
             |  ON levenshtein(a.t, b.t) <= 1 AND a.doc_id <> b.doc_id""".stripMargin)),

    // ---- cross-corpus near-dup (fuzzy decontamination) -------------------
    // train = docs < 300, ref = docs 200-399 under shifted ids: the 100
    // overlapping docs verify at jaccard 1.0 through the md5 band join,
    // plus whatever natural near-dups the band join surfaces — DuckDB
    // replays signatures, banding, candidates and the set-Jaccard verify
    // end to end
    "q_dedup_cross" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.dedup.Dedup.crossCorpusNearDupPairs(
          d.filter(col("doc_id") < 300), "doc_id", "text",
          d.filter(col("doc_id") >= 200 && col("doc_id") < 400)
            .select((col("doc_id") + 500000L).as("ref_id"), col("text")),
          "ref_id", "text",
          numHashes = 4, rowsPerBand = 2, threshold = 0.9,
          hashFn = Some(graft.dedup.Dedup.oracleHash))
      },
      Some("""WITH tr AS (SELECT doc_id AS tid, text FROM documents WHERE doc_id < 300),
             |rf AS (SELECT doc_id + 500000 AS rid, text FROM documents
             |  WHERE doc_id >= 200 AND doc_id < 400),
             |ttok AS (SELECT tid, unnest(list_distinct(string_split(text, ' '))) AS t FROM tr),
             |rtok AS (SELECT rid, unnest(list_distinct(string_split(text, ' '))) AS t FROM rf),
             |tsig AS (SELECT tid, min(md5(t || '#0')) AS mh0, min(md5(t || '#1')) AS mh1,
             |  min(md5(t || '#2')) AS mh2, min(md5(t || '#3')) AS mh3 FROM ttok GROUP BY tid),
             |rsig AS (SELECT rid, min(md5(t || '#0')) AS mh0, min(md5(t || '#1')) AS mh1,
             |  min(md5(t || '#2')) AS mh2, min(md5(t || '#3')) AS mh3 FROM rtok GROUP BY rid),
             |tband AS (
             |  SELECT tid, 0 AS band, sha256(mh0 || '|' || mh1) AS bh FROM tsig
             |  UNION ALL SELECT tid, 1, sha256(mh2 || '|' || mh3) FROM tsig),
             |rband AS (
             |  SELECT rid, 0 AS band, sha256(mh0 || '|' || mh1) AS bh FROM rsig
             |  UNION ALL SELECT rid, 1, sha256(mh2 || '|' || mh3) FROM rsig),
             |cand AS (SELECT DISTINCT tid, rid FROM tband JOIN rband USING (band, bh)),
             |tset AS (SELECT tid, list_distinct(string_split(text, ' ')) AS ts FROM tr),
             |rset AS (SELECT rid, list_distinct(string_split(text, ' ')) AS ts FROM rf),
             |j AS (SELECT tid, rid,
             |    len(list_intersect(tset.ts, rset.ts))
             |      / (len(tset.ts) + len(rset.ts)
             |         - len(list_intersect(tset.ts, rset.ts)))::DOUBLE AS jac
             |  FROM cand JOIN tset USING (tid) JOIN rset USING (rid))
             |SELECT tid AS train_id, rid AS ref_id, round(jac, 6) AS jaccard
             |FROM j WHERE jac >= 0.9""".stripMargin)),

    // ---- edit-distance similarity join (FastSS deletion neighborhoods) ---
    // fuzzy-KEY matching over 24-char title prefixes: the base corpus's
    // natural shared prefixes land at dist 0, and a planted slice with
    // the 24th char substituted lands at dist 1. Candidate generation is
    // lossless, so the result equals DuckDB's brute-force levenshtein
    // join (the fixture is pure ASCII — byte-based DuckDB levenshtein ==
    // codepoint-based Spark levenshtein here).
    "q_dedup_editdist" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        val titles = d.select(col("doc_id"),
          substring(col("text"), 1, 24).as("title"))
        val mut = d.filter(col("doc_id") < 100)
          .select((col("doc_id") + 200000L).as("doc_id"),
            concat(substring(col("text"), 1, 23), lit("~")).as("title"))
        Dedup.editDistancePairs(titles.unionByName(mut), "doc_id", "title",
            maxDist = 1)
          .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      },
      Some("""WITH ti AS (SELECT doc_id, substr(text, 1, 24) AS title
             |    FROM documents
             |  UNION ALL
             |  SELECT doc_id + 200000, substr(text, 1, 23) || '~'
             |    FROM documents WHERE doc_id < 100)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
             |FROM ti a JOIN ti b
             |  ON a.doc_id < b.doc_id
             |  AND abs(length(a.title) - length(b.title)) <= 1
             |WHERE levenshtein(a.title, b.title) <= 1""".stripMargin)),

    // ---- winnow-overlap candidate pairs -----------------------------------
    // docs sharing >= 30 winnowing fingerprints (k=8, w=4): the LOCAL
    // copying detector — md5 selection so DuckDB replays the window
    // minima (and therefore the pair counts) bit for bit; 30 keeps the
    // exact-copy pairs (their whole fp sets coincide) plus genuinely
    // overlapping naturals, and drops the shared-vocab noise floor
    "q_dedup_winnow_pairs" -> QueryDef(
      (s, dir) => Dedup.winnowCandidatePairs(
        docsWithDups(s, dir)
          .filter(col("doc_id") < 200 || col("doc_id") >= 100000L),
        "doc_id", "text", k = 8, w = 4, minShared = 30,
        hashFn = Some(md5(_))),
      Some(s"""WITH docs AS (SELECT * FROM $dupUnionSql d
             |    WHERE doc_id < 200 OR doc_id >= 100000),
             |h AS (SELECT doc_id,
             |  CASE WHEN length(text) >= 8 THEN
             |    list_transform(range(1, length(text) - 6),
             |      i -> md5(substr(text, i, 8)))
             |  ELSE NULL END AS hs FROM docs),
             |sel AS (SELECT doc_id,
             |  CASE WHEN hs IS NULL THEN NULL
             |    WHEN len(hs) <= 4 THEN [list_aggregate(hs, 'min')]
             |    ELSE list_distinct(list_transform(
             |      range(1, len(hs) - 2),
             |      i -> list_aggregate(hs[i:i+3], 'min'))) END AS fp
             |  FROM h),
             |ex AS (SELECT doc_id, unnest(fp) AS fp FROM sel)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  count(*) AS shared
             |FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 30""".stripMargin)),

    // ---- embedding-cosine near-dup pairs ----------------------------------
    "q_dedup_embed" -> QueryDef(
      (s, dir) => {
        // threshold applied to the ROUNDED cosine so the cut is identical
        // across engines despite sum-order fp noise
        Dedup.embeddingNearDupPairs(
            t(s, dir, "embeddings").filter(col("vec_id") < 300), "vec_id", "embedding", -2.0)
          .select(col("id_a"), col("id_b"), round(col("cos"), 5).as("cos"))
          .filter(col("cos") >= 0.45)
      },
      Some("""WITH e AS (SELECT vec_id, embedding,
             |  sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
             |  FROM embeddings WHERE vec_id < 300),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  list_sum(list_transform(generate_series(1, 64),
             |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm) AS cos
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
             |SELECT id_a, id_b, round(cos, 5) AS cos FROM p WHERE round(cos, 5) >= 0.45""".stripMargin)),

    // ---- embedding near-dup: transitive keepers over the cosine pairs -----
    // Same closure semantics as q_dedup_keepers_cc, over the embedding
    // edge set: star-contraction CC in Spark vs a recursive-CTE closure in
    // DuckDB, edges cut on the ROUNDED cosine so both engines see the
    // identical graph.
    "q_dedup_embed_keepers" -> QueryDef(
      (s, dir) => Dedup.embeddingNearDupKeepers(
        t(s, dir, "embeddings").filter(col("vec_id") < 300),
        "vec_id", "embedding", 0.45),
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding,
             |  sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
             |  FROM embeddings WHERE vec_id < 300),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  list_sum(list_transform(generate_series(1, 64),
             |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm) AS cos
             |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
             |ver AS (SELECT id_a, id_b FROM p WHERE round(cos, 5) >= 0.45),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM ver
             |  UNION SELECT id_b, id_a FROM ver),
             |reach AS (
             |  SELECT vec_id AS id, vec_id AS comp FROM e
             |  UNION
             |  SELECT ed.dst AS id, r.comp AS comp
             |  FROM reach r JOIN edges ed ON ed.src = r.id)
             |SELECT id AS vec_id, min(comp) AS keeper_id FROM reach GROUP BY id""".stripMargin)),

    // ---- SemDeDup: cluster-bounded semantic dedup (Abbas et al. 2023) ----
    // kmeansIters = 0 pins the codebook to the first 3 vectors in id order
    // so DuckDB replays the exact cell assignment (argmin L2, ties to the
    // lowest centroid index); edges are within-cell rounded-cosine pairs,
    // closed transitively by the recursive CTE.
    "q_semdedup" -> QueryDef(
      (s, dir) => Dedup.semDedupKeepers(
        t(s, dir, "embeddings").filter(col("vec_id") < 400),
        "vec_id", "embedding", nCentroids = 3, kmeansIters = 0,
        threshold = 0.45),
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400),
             |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS ci, embedding AS cv
             |  FROM e ORDER BY vec_id LIMIT 3),
             |d AS (SELECT e.vec_id, c.ci,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE)
             |         * (e.embedding[i]::DOUBLE - c.cv[i]::DOUBLE)))) AS dist
             |  FROM e CROSS JOIN c),
             |assign AS (SELECT vec_id, ci AS cell FROM (
             |    SELECT vec_id, ci,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, ci) AS rn FROM d)
             |  WHERE rn = 1),
             |en AS (SELECT e.vec_id, e.embedding, a.cell,
             |  sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) AS nrm
             |  FROM e JOIN assign a USING (vec_id)),
             |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  list_sum(list_transform(generate_series(1, 64),
             |    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) / (a.nrm * b.nrm) AS cos
             |  FROM en a JOIN en b ON a.cell = b.cell AND a.vec_id < b.vec_id),
             |ver AS (SELECT id_a, id_b FROM p WHERE round(cos, 5) >= 0.45),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM ver
             |  UNION SELECT id_b, id_a FROM ver),
             |reach AS (
             |  SELECT vec_id AS id, vec_id AS comp FROM e
             |  UNION
             |  SELECT ed.dst AS id, r.comp AS comp
             |  FROM reach r JOIN edges ed ON ed.src = r.id)
             |SELECT id AS vec_id, min(comp) AS keeper_id FROM reach GROUP BY id""".stripMargin)),

    // ---- full near-dup pipeline: MinHash→LSH→bucket-verify→keeper ---------
    "q_dedup_keepers" -> QueryDef(
      (s, dir) => Dedup.nearDupKeepers(docsWithDups(s, dir), "doc_id", "text",
        numHashes = 4, rowsPerBand = 2, threshold = 0.6),
      Some(keepersOracleSqlAt("0.6"))),

    // ---- same pipeline, signatures from the zero-shuffle custom expression
    // (xxhash64 family, not md5). Verified at threshold 1.0 — token-SET
    // equality — precisely because that is the regime where the output is
    // provably hash-family-agnostic: set-equal docs have identical MinHash
    // signatures under ANY hash (they always share every band → recall 1),
    // and chance band collisions are removed by the exact Jaccard = 1
    // verification. At 0.6 the md5 and xxhash bandings each miss a
    // different subset of borderline pairs, so no shared oracle exists —
    // that regime is covered by q_dedup_keepers, whose oracle replicates
    // the same md5 banding bit for bit.
    // maxBucketSize pinned UNCAPPED: the oracle models uncapped banding,
    // and the production default (10 000) dropping a bucket on some future
    // verification corpus would silently diverge the two engines
    "q_dedup_keepers_fast" -> QueryDef(
      (s, dir) => Dedup.nearDupKeepersRowwise(docsWithDups(s, dir),
        "doc_id", "text", numHashes = 4, rowsPerBand = 2, threshold = 1.0,
        maxBucketSize = Int.MaxValue),
      Some(keepersOracleSqlAt("1.0"))),

    // ---- transitive keepers: iterative min-label connected components in
    // Spark vs a recursive-CTE closure in DuckDB. Exact-dup collapse is
    // semantics-neutral here too: in the oracle's full graph every exact
    // group is a j=1 clique, so its components are exactly the engine's
    // rep-level components fanned back out.
    // Input bounded to the first 1000 ids (+ their shifted dups, same
    // precedent as q_dedup_minhash's doc_id < 200): the synthetic corpus
    // is one giant near-identical template cluster (~63% of unique texts
    // verify against each other), so the unbounded closure demo would
    // spend a minute verifying C(3161,2) pairs at sf0.1 — exactly the
    // shape the maxBucketSize cap exists for in production runs.
    "q_dedup_keepers_cc" -> QueryDef(
      (s, dir) => Dedup.nearDupKeepersTransitive(
        docsWithDups(s, dir).filter(col("doc_id") < 1000 || col("doc_id") >= 100000L),
        "doc_id", "text", numHashes = 4, rowsPerBand = 2, threshold = 0.6),
      Some(keepersCcOracleSqlAt("0.6",
        s"SELECT * FROM $dupUnionSql WHERE doc_id < 1000 OR doc_id >= 100000"))),

    // ---- leakage-safe train/test split: split by the near-dup COMPONENT
    // keeper's hash, never the doc's own id — a paraphrase of a training
    // doc cannot land in test. Same CC closure as q_dedup_keepers_cc plus
    // one hash projection; split is cluster-atomic and deterministic ------
    "q_leakage_split" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.leakageSafeSplit(
        docsWithDups(s, dir).filter(col("doc_id") < 1000 || col("doc_id") >= 100000L),
        "doc_id", "text", testThreshold = "40",
        numHashes = 4, rowsPerBand = 2, threshold = 0.6),
      Some(s"""SELECT doc_id, keeper_id,
              |  CASE WHEN substr(sha256(CAST(keeper_id AS VARCHAR)), 1, 2) < '40'
              |    THEN 'test' ELSE 'train' END AS split
              |FROM (${keepersCcOracleSqlAt("0.6",
                s"SELECT * FROM $dupUnionSql WHERE doc_id < 1000 OR doc_id >= 100000")})""".stripMargin)),

    // ---- transitive keepers, KEEP-BEST: the component winner is the
    // longest text (argmax coalesce(length, -1), ties to lowest id) — what
    // production pipelines retain — instead of the smallest id. Same CC
    // closure; input bounded like q_dedup_keepers_cc (template-cluster
    // economics) but to 500 ids so the two CC demos don't double-price the
    // bench ----------------------------------------------------------------
    "q_dedup_keepers_best" -> QueryDef(
      (s, dir) => Dedup.nearDupKeepersBest(
        docsWithDups(s, dir)
          .filter(col("doc_id") < 500 || col("doc_id") >= 100000L)
          .withColumn("score", coalesce(length(col("text")), lit(-1))),
        "doc_id", "text", "score", numHashes = 4, rowsPerBand = 2,
        threshold = 0.6),
      Some(s"""WITH RECURSIVE ${verifiedPairsSqlAt("0.6",
          s"SELECT * FROM $dupUnionSql WHERE doc_id < 500 OR doc_id >= 100000")},
             |edges AS (SELECT id_a AS src, id_b AS dst FROM ver
             |  UNION SELECT id_b, id_a FROM ver),
             |reach AS (
             |  SELECT doc_id AS id, doc_id AS comp FROM docs
             |  UNION
             |  SELECT e.dst AS id, r.comp AS comp
             |  FROM reach r JOIN edges e ON e.src = r.id),
             |comp AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
             |sc AS (SELECT c.id, c.comp, coalesce(length(d.text), -1) AS s
             |  FROM comp c JOIN docs d ON d.doc_id = c.id),
             |win AS (SELECT comp, id AS best FROM (
             |    SELECT comp, id,
             |      row_number() OVER (PARTITION BY comp ORDER BY s DESC, id) AS rn
             |    FROM sc) WHERE rn = 1)
             |SELECT sc.id AS doc_id, win.best AS keeper_id
             |FROM sc JOIN win USING (comp)""".stripMargin)),

    // ---- paragraph-level keep-first dedup ---------------------------------
    // The post-doc-level layer: boilerplate paragraphs recur across
    // otherwise-distinct docs. First occurrence in corpus order (min
    // (doc_id, pos) per paragraph hash) keeps the paragraph; later
    // occurrences — cross-doc or within-doc — drop. Spark: min(struct)
    // hash-aggregate + hash equi-join; oracle: row_number window.
    "q_dedup_paragraph" -> QueryDef(
      (s, dir) => Dedup.paragraphKeepFirst(
        paraDocs(s, dir, maxPid = 249, reps = 8), "doc_id", "text"),
      Some("""WITH spine AS (
             |  SELECT a.doc_id + r.rep * 1000 AS doc_id,
             |    p1.text || chr(10) || chr(10) || p2.text || chr(10) || chr(10)
             |      || p1.text || chr(10) || chr(10) || p3.text AS text
             |  FROM documents a
             |  JOIN documents p1 ON p1.doc_id = a.doc_id * 2
             |  JOIN documents p2 ON p2.doc_id = a.doc_id * 2 + 1
             |  JOIN documents p3 ON p3.doc_id = a.doc_id * 2 + 2
             |  CROSS JOIN (SELECT unnest(range(0, 8)) AS rep) r
             |  WHERE a.doc_id < 249),
             |p AS (SELECT doc_id, unnest(generate_series(1, len(ps))) AS pos,
             |    unnest(ps) AS para
             |  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
             |        FROM spine)),
             |norm AS (SELECT doc_id, pos, trim(para) AS para FROM p
             |  WHERE trim(para) <> ''),
             |ranked AS (SELECT doc_id, pos, para,
             |  row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
             |  FROM norm),
             |kept AS (SELECT doc_id,
             |    string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_dedup,
             |    count(*) AS n_kept
             |  FROM ranked WHERE rn = 1 GROUP BY doc_id)
             |SELECT s.doc_id AS doc_id, coalesce(k.text_dedup, '') AS text_dedup,
             |  coalesce(k.n_kept, 0) AS n_kept
             |FROM spine s LEFT JOIN kept k ON k.doc_id = s.doc_id""".stripMargin)),

    // ---- paragraph keep-first UNDER the occurrence cap: the mega-bucket
    // guardrail actually ENGAGING on an oracled fixture. With the 8×
    // replicated ~2k-doc spine, every base p1 paragraph occurs 24 times
    // (2 in-doc × 8 reps + 8 as the previous doc's tail) — over the cap of
    // 20, so it is dropped EVERYWHERE (boilerplate semantics), while p2/p3
    // paragraphs sit at 8–16 and keep their first occurrence. The capped
    // run attaches the graft_oversize CollectMetrics audit in-pass.
    "q_dedup_para_capped" -> QueryDef(
      (s, dir) => Dedup.paragraphKeepFirst(
        paraDocs(s, dir, maxPid = 249, reps = 8), "doc_id", "text",
        maxOccurrences = 20),
      Some("""WITH spine AS (
             |  SELECT a.doc_id + r.rep * 1000 AS doc_id,
             |    p1.text || chr(10) || chr(10) || p2.text || chr(10) || chr(10)
             |      || p1.text || chr(10) || chr(10) || p3.text AS text
             |  FROM documents a
             |  JOIN documents p1 ON p1.doc_id = a.doc_id * 2
             |  JOIN documents p2 ON p2.doc_id = a.doc_id * 2 + 1
             |  JOIN documents p3 ON p3.doc_id = a.doc_id * 2 + 2
             |  CROSS JOIN (SELECT unnest(range(0, 8)) AS rep) r
             |  WHERE a.doc_id < 249),
             |p AS (SELECT doc_id, unnest(generate_series(1, len(ps))) AS pos,
             |    unnest(ps) AS para
             |  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
             |        FROM spine)),
             |norm AS (SELECT doc_id, pos, trim(para) AS para FROM p
             |  WHERE trim(para) <> ''),
             |cnt AS (SELECT md5(para) AS h, count(*) AS n FROM norm GROUP BY 1),
             |ranked AS (SELECT doc_id, pos, para,
             |  row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
             |  FROM norm),
             |kept AS (SELECT doc_id,
             |    string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_dedup,
             |    count(*) AS n_kept
             |  FROM ranked JOIN cnt ON md5(ranked.para) = cnt.h
             |  WHERE rn = 1 AND cnt.n <= 20 GROUP BY doc_id)
             |SELECT s.doc_id AS doc_id, coalesce(k.text_dedup, '') AS text_dedup,
             |  coalesce(k.n_kept, 0) AS n_kept
             |FROM spine s LEFT JOIN kept k ON k.doc_id = s.doc_id""".stripMargin)),

    // ---- corpus-frequency boilerplate removal (CCNet shape): a paragraph
    // in > maxDocFreq distinct docs is template chrome and is removed
    // EVERYWHERE. On the 8×-replicated spine every paragraph has df ≥ 8
    // (its own replica group), so the threshold sits AT 8: p2 paragraphs
    // (df = 8) survive. p1 normally doubles as the PREVIOUS doc's tail
    // (df = 16) and is chrome — the boilerplate-chain shape — except at
    // the chain ends: doc 0's opening has no predecessor (df = 8) and
    // survives BOTH its in-doc occurrences (the case keep-first would
    // collapse), and the final doc's tail (no successor, df = 8) keeps ---
    "q_dedup_boilerplate" -> QueryDef(
      (s, dir) => Dedup.boilerplateParagraphRemove(
        paraDocs(s, dir, maxPid = 249, reps = 8),
        "doc_id", "text", maxDocFreq = 8),
      Some("""WITH spine AS (
             |  SELECT a.doc_id + r.rep * 1000 AS doc_id,
             |    p1.text || chr(10) || chr(10) || p2.text || chr(10) || chr(10)
             |      || p1.text || chr(10) || chr(10) || p3.text AS text
             |  FROM documents a
             |  JOIN documents p1 ON p1.doc_id = a.doc_id * 2
             |  JOIN documents p2 ON p2.doc_id = a.doc_id * 2 + 1
             |  JOIN documents p3 ON p3.doc_id = a.doc_id * 2 + 2
             |  CROSS JOIN (SELECT unnest(range(0, 8)) AS rep) r
             |  WHERE a.doc_id < 249),
             |p AS (SELECT doc_id, unnest(generate_series(1, len(ps))) AS pos,
             |    unnest(ps) AS para
             |  FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
             |        FROM spine)),
             |norm AS (SELECT doc_id, pos, trim(para) AS para FROM p
             |  WHERE trim(para) <> ''),
             |f AS (SELECT md5(para) AS h, count(DISTINCT doc_id) AS df
             |  FROM norm GROUP BY 1),
             |kept AS (SELECT n.doc_id, n.pos, n.para
             |  FROM norm n JOIN f ON md5(n.para) = f.h WHERE f.df <= 8),
             |tot AS (SELECT doc_id, count(*) AS n_paras FROM norm GROUP BY doc_id),
             |agg AS (SELECT doc_id,
             |    string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_clean,
             |    count(*) AS n_kept FROM kept GROUP BY doc_id)
             |SELECT s.doc_id AS doc_id, coalesce(a.text_clean, '') AS text_clean,
             |  coalesce(a.n_kept, 0) AS n_kept,
             |  coalesce(t.n_paras, 0) - coalesce(a.n_kept, 0) AS n_removed
             |FROM spine s LEFT JOIN tot t ON t.doc_id = s.doc_id
             |LEFT JOIN agg a ON a.doc_id = s.doc_id""".stripMargin)),

    // ---- duplicated token spans: the substring layer under paragraphs ----
    // Every 8-token sliding window hashed in-row; spans appearing in >1
    // doc are duplicated substrings, keep = the first occurrence in
    // corpus order. Same overlap fixture as q_dedup_paragraph, so docs
    // share whole paragraphs and the spans inside them.
    "q_dedup_spans" -> QueryDef(
      (s, dir) => Dedup.duplicatedSpans(paraDocs(s, dir), "doc_id", "text",
        windowTokens = 8, hashFn = Dedup.oracleParaHash),
      Some("""WITH spine AS (
             |  SELECT a.doc_id AS doc_id,
             |    p1.text || chr(10) || chr(10) || p2.text || chr(10) || chr(10)
             |      || p1.text || chr(10) || chr(10) || p3.text AS text
             |  FROM documents a
             |  JOIN documents p1 ON p1.doc_id = a.doc_id * 2
             |  JOIN documents p2 ON p2.doc_id = a.doc_id * 2 + 1
             |  JOIN documents p3 ON p3.doc_id = a.doc_id * 2 + 2
             |  WHERE a.doc_id < 100),
             |tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM spine),
             |spans AS (SELECT doc_id, i - 1 AS pos,
             |    md5(array_to_string(ts[i : i + 7], ' ')) AS span_hash
             |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS i
             |        FROM tok WHERE len(ts) >= 8)),
             |dup AS (SELECT span_hash FROM spans
             |  GROUP BY span_hash HAVING count(DISTINCT doc_id) > 1)
             |SELECT s.doc_id, s.pos, s.span_hash,
             |  row_number() OVER (PARTITION BY s.span_hash
             |    ORDER BY s.doc_id, s.pos) = 1 AS keep
             |FROM spans s JOIN dup USING (span_hash)""".stripMargin)),

    // ---- keep-first substring rewrite over the duplicated spans -----------
    // Later occurrences of any duplicated 8-token window are cut (after
    // merging overlaps into maximal islands); the oracle replays the
    // whole chain — spans → first-occurrence ranking → gaps-and-islands
    // merge → token anti-join → ordered re-join — in SQL.
    "q_dedup_span_rewrite" -> QueryDef(
      (s, dir) => Dedup.removeDuplicatedSpans(paraDocs(s, dir), "doc_id",
        "text", windowTokens = 8, hashFn = Dedup.oracleParaHash),
      Some("""WITH spine AS (
             |  SELECT a.doc_id AS doc_id,
             |    p1.text || chr(10) || chr(10) || p2.text || chr(10) || chr(10)
             |      || p1.text || chr(10) || chr(10) || p3.text AS text
             |  FROM documents a
             |  JOIN documents p1 ON p1.doc_id = a.doc_id * 2
             |  JOIN documents p2 ON p2.doc_id = a.doc_id * 2 + 1
             |  JOIN documents p3 ON p3.doc_id = a.doc_id * 2 + 2
             |  WHERE a.doc_id < 100),
             |tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM spine),
             |spans AS (SELECT doc_id, i - 1 AS pos,
             |    md5(array_to_string(ts[i : i + 7], ' ')) AS span_hash
             |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 7)) AS i
             |        FROM tok WHERE len(ts) >= 8)),
             |dup AS (SELECT span_hash FROM spans
             |  GROUP BY span_hash HAVING count(DISTINCT doc_id) > 1),
             |occ AS (SELECT s.doc_id, s.pos, s.pos + 8 AS e,
             |    row_number() OVER (PARTITION BY s.span_hash
             |      ORDER BY s.doc_id, s.pos) AS rn
             |  FROM spans s JOIN dup USING (span_hash)),
             |del AS (SELECT doc_id, pos, e FROM occ WHERE rn > 1),
             |isl AS (SELECT doc_id, pos, e,
             |    CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id
             |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |      -1) THEN 1 ELSE 0 END AS ni
             |  FROM del),
             |iv AS (SELECT doc_id, island, min(pos) AS s, max(e) AS e
             |  FROM (SELECT doc_id, pos, e,
             |      sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
             |    FROM isl)
             |  GROUP BY 1, 2),
             |cov AS (SELECT doc_id, unnest(generate_series(s, e - 1)) AS tp FROM iv),
             |toks AS (SELECT doc_id, unnest(generate_series(1, len(ts))) - 1 AS tp,
             |    unnest(ts) AS tk FROM tok),
             |kept AS (SELECT t.doc_id, t.tp, t.tk FROM toks t
             |  LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.tp = t.tp
             |  WHERE c.tp IS NULL),
             |agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY tp) AS text_dedup,
             |    count(*) AS n_kept FROM kept GROUP BY doc_id)
             |SELECT sp.doc_id,
             |  CASE WHEN d.doc_id IS NULL THEN sp.text
             |       ELSE coalesce(a.text_dedup, '') END AS text_dedup,
             |  CASE WHEN d.doc_id IS NULL THEN 0
             |       ELSE len(string_split(sp.text, ' ')) - coalesce(a.n_kept, 0)
             |  END AS n_removed
             |FROM spine sp
             |LEFT JOIN (SELECT DISTINCT doc_id FROM del) d ON d.doc_id = sp.doc_id
             |LEFT JOIN agg a ON a.doc_id = sp.doc_id""".stripMargin)),

    // ---- similarity search: exact brute-force cosine top-k ----------------
    "q_knn_cosine" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.bruteForceTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, 10, roundTo = 5)
      },
      Some(knnOracleSql)),

    // ---- batched multi-query ANN: a 100-query block, ONE corpus scan ------
    // the eval-sweep shape (E128/E136 consumers): query block broadcast,
    // per-task bounded top-k partial agg — the oracle is the full
    // brute-force cross join ranked per query
    "q_ann_batch" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.topKForQueries(
          emb.filter(col("vec_id") >= 100), "vec_id", "embedding",
          emb.filter(col("vec_id") < 100), "vec_id", "embedding",
          k = 5, roundTo = 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id,
             |  list_transform(embedding, x -> x::DOUBLE) AS qv
             |  FROM embeddings WHERE vec_id < 100),
             |c AS (SELECT vec_id,
             |  list_transform(embedding, x -> x::DOUBLE) AS cv
             |  FROM embeddings WHERE vec_id >= 100),
             |s AS (SELECT query_id, vec_id,
             |  round(${duckCosD("cv", "qv", 64)}, 5) AS cos FROM q, c),
             |r AS (SELECT query_id, vec_id, cos, row_number() OVER (
             |  PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn FROM s)
             |SELECT query_id, vec_id, cos, rn::INT AS rank FROM r
             |WHERE rn <= 5""".stripMargin)),

    // ---- ANN: Matryoshka-truncated top-k (first 16 of 64 dims) ------------
    // cosine of sliced vectors == the truncated-renormalized score; the
    // oracle recomputes it over the same 16-dim prefix
    "q_ann_truncated" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.truncatedTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, d = 16, k = 10, roundTo = 5)
      },
      Some("""WITH q AS (SELECT embedding AS qv,
             |  sqrt(list_sum(list_transform(generate_series(1, 16),
             |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS qn
             |  FROM embeddings WHERE vec_id = 0),
             |s AS (SELECT vec_id,
             |  list_sum(list_transform(generate_series(1, 16),
             |    i -> embedding[i]::DOUBLE * qv[i]::DOUBLE)) AS dot,
             |  sqrt(list_sum(list_transform(generate_series(1, 16),
             |    i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm, qn
             |  FROM embeddings, q WHERE vec_id > 0)
             |SELECT vec_id, round(dot / (nrm * qn), 5) AS cos_trunc FROM s
             |ORDER BY cos_trunc DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- ANN: int8 scalar-quantized top-k (asymmetric distance) -----------
    // per-dim (min,max) recomputed by the oracle from the same corpus;
    // codes, decode and the cosine are plain IEEE double expressions so
    // both engines derive identical values
    "q_ann_sq8" -> QueryDef(
      (s, dir) => {
        val corpus = t(s, dir, "embeddings").filter(col("vec_id") > 0)
        val (mins, maxs) = Similarity.sq8Train(corpus, "embedding", 64)
        Similarity.sq8TopK(corpus, "vec_id", "embedding", queryVec(s, dir),
          mins, maxs, k = 10, roundTo = 5)
      },
      Some("""WITH mm AS (
             |  SELECT i, min(embedding[i]::DOUBLE) AS mn,
             |    max(embedding[i]::DOUBLE) AS mx
             |  FROM embeddings, unnest(generate_series(1, 64)) AS _(i)
             |  WHERE vec_id > 0 GROUP BY i),
             |ml AS (SELECT list(mn ORDER BY i) AS mns,
             |  list(mx ORDER BY i) AS mxs FROM mm),
             |q AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS qv
             |  FROM embeddings WHERE vec_id = 0),
             |dec AS (SELECT vec_id,
             |    list_transform(generate_series(1, 64), i ->
             |      mns[i] + (CASE WHEN mxs[i] = mns[i] THEN 0
             |        ELSE least(greatest(round((embedding[i]::DOUBLE - mns[i])
             |          * 255.0 / (mxs[i] - mns[i]), 0), 0), 255) END)
             |        * (mxs[i] - mns[i]) / 255.0) AS dv
             |  FROM embeddings, ml WHERE vec_id > 0),
             |s AS (SELECT vec_id,
             |    list_sum(list_transform(generate_series(1, 64),
             |      i -> dv[i] * qv[i])) AS dot,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> dv[i] * dv[i]))) AS nd,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> qv[i] * qv[i]))) AS nq
             |  FROM dec, q)
             |SELECT vec_id, round(dot / (nd * nq), 5) AS cos_sq8 FROM s
             |ORDER BY cos_sq8 DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- ANN: binary-quantized Hamming top-k (sign bits, 2×32-bit words)
    // packing and distance replayed exactly: (1<<j) sums, xor + bit_count
    "q_ann_binary" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.binaryTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, k = 10)
      },
      Some("""WITH sig AS (SELECT vec_id,
             |  list_transform(generate_series(0, 1), w ->
             |    list_sum(list_transform(generate_series(0, 31), j ->
             |      CASE WHEN embedding[w * 32 + j + 1] > 0
             |        THEN (1::BIGINT << j) ELSE 0 END))) AS s
             |  FROM embeddings),
             |q AS (SELECT s AS qs FROM sig, embeddings e
             |  WHERE sig.vec_id = 0 AND e.vec_id = 0),
             |h AS (SELECT vec_id,
             |  CAST(list_sum(list_transform(generate_series(1, 2), w ->
             |    bit_count(xor(s[w], qs[w])))) AS BIGINT) AS hamming
             |  FROM sig, q WHERE vec_id > 0)
             |SELECT vec_id, hamming FROM h
             |ORDER BY hamming ASC, vec_id LIMIT 10""".stripMargin)),

    // ---- hybrid retrieval: reciprocal-rank fusion of a lexical BM25
    // shortlist with the dense and matryoshka-truncated cosine shortlists
    // (embeddings are the documents' by id). All three ranked stages and
    // the 1/(60+rank) fusion replayed exactly; contributions summed in
    // list order so the double adds agree bitwise -------------------------
    "q_rrf_hybrid" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        val emb = t(s, dir, "embeddings").filter(col("vec_id") > 0)
        val lexical = graft.trainprep.TrainPrep.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("vector", "join", "scan"), k = 20)
        val dense = Similarity.bruteForceTopK(
            emb, "vec_id", "embedding", q, 20, roundTo = 5)
          .select(col("vec_id").as("doc_id"), col("cos").as("score"))
        val coarse = Similarity.truncatedTopK(
            emb, "vec_id", "embedding", q, d = 16, k = 20, roundTo = 5)
          .select(col("vec_id").as("doc_id"), col("cos_trunc").as("score"))
        Similarity.rrfFuse(Seq(lexical, dense, coarse), "doc_id", "score",
          k = 10)
      },
      Some(rrfHybridOracleSql)),

    // ---- MMR diversification: greedy maximal-marginal-relevance pick of
    // 4 from the cosine top-12 (λ = 0.7). The sequential greedy argmax is
    // replayed in DuckDB as four unrolled selection CTEs over the same
    // rounded rel/sim values — identical IEEE arithmetic, identical order
    "q_mmr_select" -> QueryDef(
      (s, dir) => Similarity.mmrSelect(
        t(s, dir, "embeddings").filter(col("vec_id") > 0),
        "vec_id", "embedding", queryVec(s, dir), m = 12, k = 4),
      Some(mmrOracleSql)),

    // ---- retrieval-quality metrics: recall@10 / MRR@10 / nDCG@10 of the
    // matryoshka-truncated stage (d=16) against graded qrels derived from
    // the exact full-dim ranking (grade = 11 − exact rank) — the operator
    // that turns "quantized retrieval" into a measured dataset-card
    // number. Five query vectors (vec_id < 5), corpus = the rest; both
    // ranked stages and every metric replay exactly in DuckDB ------------
    "q_retrieval_metrics" -> QueryDef(
      (s, dir) => {
        val (runs, qrels) = retrievalEvalFixture(s, dir)
        graft.eval.EvalMetrics.retrievalMetrics(
          runs, qrels, "query_id", "doc_id", "score", "grade", k = 10)
      },
      Some(retrievalMetricsOracleSql)),

    // ---- the macro rollup a retrieval eval quotes: MAP and the mean
    // recall/MRR/nDCG over the ROUNDED per-query report ------------------
    "q_retrieval_summary" -> QueryDef(
      (s, dir) => {
        val (runs, qrels) = retrievalEvalFixture(s, dir)
        graft.eval.EvalMetrics.retrievalSummary(
          graft.eval.EvalMetrics.retrievalMetrics(
            runs, qrels, "query_id", "doc_id", "score", "grade", k = 10))
      },
      Some(retrievalSummaryOracleSql)),

    // ---- classifier PR sweep: precision/recall/F1 at every distinct
    // quality-classifier score threshold (the q_quality_lr scorer with a
    // planted doc_id%3 label). The cumulative TP/predicted-positive run
    // through the deterministic bucketed prefix scan — never a
    // single-partition data window — and the confusion arithmetic replays
    // in DuckDB over the identical rounded scores ------------------------
    "q_pr_sweep" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.prSweep(
        qualityScored(s, dir), "label", "quality_score"),
      Some(prSweepOracleSql)),

    // ---- hard-negative mining: per query the top-5 highest-scored NON-
    // relevant candidates (relevance = the exact top-3) — the contrastive
    // training set a dense-retriever trainer wants; anti-join + per-query
    // rank windows, replayed exactly --------------------------------------
    "q_hard_negatives" -> QueryDef(
      (s, dir) => {
        val runs = scoredRun(s, dir, 64, "score")
        val exactW = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
        val qrels = runs.withColumn("__r", row_number().over(exactW))
          .filter(col("__r") <= 3)
          .select(col("query_id"), col("doc_id"), lit(1).as("grade"))
        graft.trainprep.TrainPrep.hardNegatives(
          runs, qrels, "query_id", "doc_id", "score", "grade", k = 5)
      },
      Some(hardNegOracleSql)),

    // ---- Bradley-Terry preference strengths: the MM update unrolled for
    // two fixed iterations (the kmeansIters determinism contract) over
    // lang-vs-lang preference pairs planted from adjacent documents ------
    "q_bradley_terry" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("lang"))
        val pairs = d.join(
            d.select((col("doc_id") - 1).as("doc_id"),
              col("lang").as("__lang2")), "doc_id")
          .filter(col("lang") =!= col("__lang2"))
          .select(col("lang").as("winner"), col("__lang2").as("loser"))
        graft.trainprep.TrainPrep.bradleyTerryStrengths(
          pairs, "winner", "loser", iters = 2)
      },
      Some(bradleyTerryOracleSql)),

    // ---- forecast skill scores: MAE/RMSE/bias/NSE per series over the
    // (key, time) join of a planted forecast against the observed events
    // values — the verification step downstream of the extract pipeline,
    // Nash-Sutcliffe via the one-pass computational identity -------------
    "q_forecast_skill" -> QueryDef(
      (s, dir) => {
        val obs = graft.queries.Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"))
        // fcst stays UNROUNDED: the identical literal/op sequence is
        // bit-identical IEEE on both engines, while round(_, 2) on a
        // computed double hits .xx5 ties the engines break differently
        val fcst = obs.select(col("user_id"), col("event_id"),
          (col("value") * 1.07 + pmod(col("user_id"), lit(5)) * 0.3 - 0.6)
            .as("fcst"))
        graft.ops.TimeSeriesOps.forecastSkill(
          fcst, obs, Seq("user_id"), "event_id", "fcst", "value")
      },
      Some("""WITH o AS (SELECT user_id, event_id, value FROM events),
             |f AS (SELECT user_id, event_id,
             |    value * 1.07 + (user_id % 5) * 0.3 - 0.6 AS fcst
             |  FROM o),
             |j AS (SELECT o.user_id, f.fcst - o.value AS e, o.value AS ov
             |  FROM o JOIN f
             |    ON o.user_id = f.user_id AND o.event_id = f.event_id)
             |SELECT user_id, count(*)::BIGINT AS n,
             |  round(avg(abs(e)), 5) AS mae,
             |  round(sqrt(avg(e * e)), 5) AS rmse,
             |  round(avg(e), 5) AS bias,
             |  round(CASE WHEN sum(ov * ov) - sum(ov) * sum(ov) / count(*)::DOUBLE > 0
             |    THEN 1.0 - sum(e * e)
             |      / (sum(ov * ov) - sum(ov) * sum(ov) / count(*)::DOUBLE)
             |    END, 5) AS nse
             |FROM j GROUP BY user_id""".stripMargin)),

    // ---- Spearman rank agreement: how much does the matryoshka-d16
    // ORDER disagree with the exact full-dim one, per query — exact
    // integer rank-displacement sum over the shared set, replayed verbatim
    "q_rank_agreement" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.rankAgreement(
        scoredRun(s, dir, 64, "exact"), scoredRun(s, dir, 16, "coarse"),
        "query_id", "doc_id", "exact", "coarse"),
      Some(rankAgreementOracleSql)),

    // ---- exact tie-aware ROC AUC: the Mann-Whitney rank-sum identity
    // over the PR sweep's distinct-score cumulative — no global sort, tie
    // groups at average rank, exact half-integer arithmetic replayed -----
    "q_roc_auc" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.rocAuc(
        qualityScored(s, dir), "label", "quality_score"),
      Some(rocAucOracleSql)),

    // ---- reliability-diagram calibration report over the same scorer:
    // 10 fixed bins, per-bin confidence vs empirical accuracy -------------
    "q_calibration" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.calibrationReport(
        qualityScored(s, dir), "label", "quality_score", nBins = 10),
      Some(calibrationOracleSql)),

    // ---- expected calibration error: the weighted gap over the ROUNDED
    // per-bin report, so the scalar replays from any engine's report ------
    "q_calibration_ece" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.expectedCalibrationError(
        graft.eval.EvalMetrics.calibrationReport(
          qualityScored(s, dir), "label", "quality_score", nBins = 10)),
      Some(eceOracleSql)),

    // ---- multi-class classification report: per-class P/R/F1 from one
    // contingency aggregate over a planted predictor (zh never predicted,
    // en over-predicted — both zero-division conventions exercised) ------
    "q_class_report" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.classificationReport(
        classPredictions(s, dir), "actual", "pred"),
      Some(classReportOracleSql)),

    // ---- macro summary over the ROUNDED report (the ECE replay
    // contract): accuracy from exact counts, macro P/R/F1 means ----------
    "q_class_summary" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.classificationSummary(
        graft.eval.EvalMetrics.classificationReport(
          classPredictions(s, dir), "actual", "pred")),
      Some(classSummaryOracleSql)),

    // ---- Brier score: the proper scoring rule over the same scorer —
    // punishes miscalibration, not just misordering ----------------------
    "q_brier" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.brierScore(
        qualityScored(s, dir), "label", "quality_score"),
      Some(s"""$qualityScoredCte
             |SELECT count(*)::BIGINT AS n,
             |  round(avg((score - y) * (score - y)), 6) AS brier
             |FROM s""".stripMargin)),

    // ---- Murphy decomposition over the ROUNDED calibration report:
    // reliability / resolution / uncertainty — binned Brier = REL − RES
    // + UNC to rounding ---------------------------------------------------
    "q_brier_murphy" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.murphyDecomposition(
        graft.eval.EvalMetrics.calibrationReport(
          qualityScored(s, dir), "label", "quality_score", nBins = 10)),
      Some(s"""$qualityScoredCte,
             |binned AS (SELECT
             |    least(greatest(floor(score * 10), 0), 9)::BIGINT AS bin,
             |    score, y
             |  FROM s),
             |rep AS (SELECT bin, count(*)::BIGINT AS n,
             |    round(sum(score) / count(*), 5) AS confidence,
             |    round(sum(y)::DOUBLE / count(*), 5) AS accuracy
             |  FROM binned GROUP BY bin),
             |yb AS (SELECT sum(n * accuracy) / sum(n) AS ybar FROM rep)
             |SELECT sum(n)::BIGINT AS n,
             |  round(sum(n * (confidence - accuracy) * (confidence - accuracy))
             |    / sum(n), 5) AS reliability,
             |  round(sum(n * (accuracy - ybar) * (accuracy - ybar))
             |    / sum(n), 5) AS resolution,
             |  round(any_value(ybar) * (1.0 - any_value(ybar)), 5) AS uncertainty
             |FROM rep CROSS JOIN yb""".stripMargin)),

    // ---- Cohen's kappa: chance-corrected agreement between two planted
    // deterministic raters (n_chars-keyed, doc_id%4 disagreement) — the
    // preference-data QA number for the DPO/SFT family -------------------
    "q_kappa" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.cohenKappa(
        t(s, dir, "documents").select(
          pmod(col("n_chars"), lit(3)).as("rater_a"),
          pmod(col("n_chars")
            + when(pmod(col("doc_id"), lit(4)) === 0, 1).otherwise(0),
            lit(3)).as("rater_b")),
        "rater_a", "rater_b"),
      Some(kappaOracleSql)),

    // ---- McNemar's paired test: is classifier B actually better than A? --
    // planted paired predictors over the documents label (A errs on %5
    // docs, B on %7) — only the discordant counts carry signal; exact
    // integers until the final division, Edwards continuity correction
    "q_mcnemar" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.mcnemarTest(
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          pmod(col("doc_id"), lit(3)).as("label"),
          pmod(col("doc_id") + when(pmod(col("doc_id"), lit(5)) === 0, 1)
            .otherwise(0), lit(3)).as("pred_a"),
          pmod(col("doc_id") + when(pmod(col("doc_id"), lit(7)) === 0, 2)
            .otherwise(0), lit(3)).as("pred_b")),
        "label", "pred_a", "pred_b"),
      Some("""WITH p AS (SELECT doc_id % 3 AS label,
             |    (doc_id + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) % 3 AS pa,
             |    (doc_id + CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 0 END) % 3 AS pb
             |  FROM documents WHERE doc_id < 300),
             |agg AS (SELECT count(*)::BIGINT AS n,
             |    sum(CASE WHEN pa = label AND pb <> label THEN 1 ELSE 0 END)::BIGINT AS b,
             |    sum(CASE WHEN pa <> label AND pb = label THEN 1 ELSE 0 END)::BIGINT AS c
             |  FROM p)
             |SELECT n, b, c,
             |  CASE WHEN b + c > 0 THEN round(
             |    greatest(abs(b::DOUBLE - c::DOUBLE) - 1.0, 0.0)
             |      * greatest(abs(b::DOUBLE - c::DOUBLE) - 1.0, 0.0)
             |      / (b::DOUBLE + c::DOUBLE), 5) END AS chi2
             |FROM agg""".stripMargin)),

    // ---- Poisson-bootstrap accuracy CI: the distributed bootstrap --------
    // deterministic hash multiplicities (md5 integer vs Poisson(1) CDF
    // thresholds as INTEGER literals generated from the same series on
    // both engines), exact-rank percentiles over the resample values
    "q_bootstrap_ci" -> QueryDef(
      (s, dir) => graft.eval.EvalMetrics.bootstrapAccuracyCI(
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          col("doc_id"),
          (pmod(col("doc_id"), lit(3)) === 0 || pmod(col("n_chars"), lit(4)) === 1)
            .as("correct")),
        "doc_id", "correct", resamples = 40),
      Some {
        val ts = graft.eval.EvalMetrics.PoissonThresholds
          .map(_.toString).mkString("[", ", ", "]")
        s"""WITH d AS (SELECT doc_id,
           |    CASE WHEN doc_id % 3 = 0 OR n_chars % 4 = 1 THEN 1 ELSE 0 END AS x
           |  FROM documents WHERE doc_id < 300),
           |per AS (SELECT r,
           |    round(sum(m * x)::DOUBLE / greatest(sum(m), 1), 5) AS acc
           |  FROM (SELECT d.doc_id, d.x, r,
           |      len(list_filter($ts, t -> t <=
           |        ('0x' || substr(md5(d.doc_id::VARCHAR || '#' || r::VARCHAR),
           |          1, 8))::BIGINT)) AS m
           |    FROM d, unnest(generate_series(1, 40)) AS _(r))
           |  GROUP BY r),
           |ranked AS (SELECT acc, row_number() OVER (ORDER BY acc) AS rk
           |  FROM per)
           |SELECT 40 AS resamples,
           |  (SELECT round(sum(x)::DOUBLE / count(*), 5) FROM d) AS acc,
           |  (SELECT acc FROM ranked WHERE rk = 1) AS ci_lo,
           |  (SELECT acc FROM ranked WHERE rk = 39) AS ci_hi""".stripMargin
      }),

    // ---- Fleiss' kappa: multi-rater chance-corrected agreement -----------
    // three planted deterministic raters per document (the q_kappa pair
    // plus a third %5-keyed head) — n_ij cell arithmetic exact to the
    // final divisions
    "q_fleiss_kappa" -> QueryDef(
      (s, dir) => {
        val base = t(s, dir, "documents").filter(col("doc_id") < 300)
        def rater(shiftWhen: org.apache.spark.sql.Column, shift: Int) =
          pmod(col("n_chars")
          + when(shiftWhen, shift).otherwise(0), lit(3)).cast("string")
        val ratings = base.select(col("doc_id"),
            rater(lit(false), 0).as("r"))
          .unionByName(base.select(col("doc_id"),
            rater(pmod(col("doc_id"), lit(4)) === 0, 1).as("r")))
          .unionByName(base.select(col("doc_id"),
            rater(pmod(col("doc_id"), lit(5)) === 0, 2).as("r")))
        graft.eval.EvalMetrics.fleissKappa(ratings, "doc_id", "r")
      },
      Some("""WITH r AS (
             |  SELECT doc_id, (n_chars % 3)::VARCHAR AS j
             |    FROM documents WHERE doc_id < 300
             |  UNION ALL
             |  SELECT doc_id, ((n_chars + CASE WHEN doc_id % 4 = 0 THEN 1
             |    ELSE 0 END) % 3)::VARCHAR FROM documents WHERE doc_id < 300
             |  UNION ALL
             |  SELECT doc_id, ((n_chars + CASE WHEN doc_id % 5 = 0 THEN 2
             |    ELSE 0 END) % 3)::VARCHAR FROM documents WHERE doc_id < 300),
             |cells AS (SELECT doc_id, j, count(*)::BIGINT AS c
             |  FROM r GROUP BY 1, 2),
             |peritem AS (SELECT doc_id, sum(c * c) AS sq, sum(c) AS n
             |  FROM cells GROUP BY 1),
             |tot AS (SELECT count(*)::BIGINT AS items FROM peritem),
             |pbar AS (SELECT sum((sq - n)::DOUBLE)
             |    / (items * 3.0 * 2.0) AS pbar
             |  FROM peritem CROSS JOIN tot GROUP BY items),
             |pe AS (SELECT sum(power(nj::DOUBLE / (items * 3.0), 2)) AS pe
             |  FROM (SELECT j, sum(c) AS nj FROM cells GROUP BY 1)
             |  CROSS JOIN tot GROUP BY items)
             |SELECT (SELECT items FROM tot) AS n_items, 3::BIGINT AS n_raters,
             |  round(pbar, 5) AS pbar, round(pe, 5) AS pe,
             |  CASE WHEN pe < 1.0
             |    THEN round((pbar - pe) / (1.0 - pe), 5) END AS kappa
             |FROM pbar CROSS JOIN pe""".stripMargin)),

    // ---- length-bucketed batch assembly: sort-by-length batches of 32 vs
    // the arrival-order baseline, per-batch padding waste for both — the
    // report that justifies length bucketing (and the padded-batching
    // counterpart of q_pack_chunks). Batch membership rides the same
    // deterministic two-pass global-id scan as q_global_ids --------------
    "q_batch_assembly" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sorted = graft.trainprep.TrainPrep.batchAssembly(
          docs, "doc_id", "text", batchSize = 32)
        val arrival = graft.trainprep.TrainPrep.batchAssembly(
          docs, "doc_id", "text", batchSize = 32, orderByLength = false)
        graft.trainprep.TrainPrep.batchPaddingReport(sorted)
          .withColumn("strategy", lit("length_sorted"))
          .unionByName(graft.trainprep.TrainPrep.batchPaddingReport(arrival)
            .withColumn("strategy", lit("arrival")))
      },
      Some(batchAssemblyOracleSql)),

    // ---- ANN: LSH-bucketed top-k, approximate (the production shape). The
    // splitmix64 plane family is not DuckDB-expressible, so the oracle is
    // the EXACT cosine top-10: at this config (4 tables of 12-bit
    // signatures, Hamming-4 probes) the pruned candidate set — measured
    // ~58% of the corpus at every driver SF — provably contains the true
    // top-10 (recall@10 = 1.00). AnnPruningSpec pins BOTH properties on the
    // fixtures, so this row certifies "approximate path, exact answer",
    // not brute force in disguise ------------------------------------------
    "q_ann_lsh" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.lshTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, dim = 64, k = 10, nBits = 12,
          maxHammingProbe = 4, nTables = 4, roundTo = 5)
      },
      Some(knnOracleSql)),

    // ---- ANN: LSH with maxHammingProbe = nBits probes EVERY bucket — by
    // construction equal to brute-force top-k, so the exact cosine oracle
    // applies and certifies the signature/probe/rerank machinery ------------
    "q_ann_lsh_exact" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.lshTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, dim = 64, k = 10, nBits = 8, maxHammingProbe = 8,
          roundTo = 5)
      },
      Some(knnOracleSql)),

    // ---- ANN: IVF coarse-quantized top-k, approximate — probes only 4 of
    // 16 cells. kmeansIters = 0 pins the codebook to the first 16 corpus
    // vectors in id order (k-means refinement is spec-gated in RecallSpec),
    // so DuckDB replays the WHOLE pipeline: codebook → per-vector argmin
    // cell (ties to the lowest index) → 4 query-nearest probe cells → exact
    // cosine rerank inside them ---------------------------------------------
    "q_ann_ivf" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.ivfTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, k = 10, nCentroids = 16, nProbe = 4,
          roundTo = 5)
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 0),
             |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS cv
             |  FROM e ORDER BY vec_id LIMIT 16),
             |d AS (SELECT e.vec_id, s.c,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> (e.embedding[i]::DOUBLE - s.cv[i]::DOUBLE)
             |         * (e.embedding[i]::DOUBLE - s.cv[i]::DOUBLE)))) AS dist
             |  FROM e CROSS JOIN seeds s),
             |assign AS (SELECT vec_id, c AS cell FROM (
             |    SELECT vec_id, c,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM d)
             |  WHERE rn = 1),
             |qd AS (SELECT s.c,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> (q.qv[i]::DOUBLE - s.cv[i]::DOUBLE)
             |         * (q.qv[i]::DOUBLE - s.cv[i]::DOUBLE)))) AS dist
             |  FROM seeds s CROSS JOIN q),
             |probes AS (SELECT c FROM (
             |    SELECT c, row_number() OVER (ORDER BY dist, c) AS rn FROM qd)
             |  WHERE rn <= 4),
             |qn AS (SELECT qv, sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) AS qn FROM q),
             |s2 AS (SELECT e.vec_id,
             |  list_sum(list_transform(generate_series(1, 64),
             |    i -> e.embedding[i]::DOUBLE * qv[i]::DOUBLE)) AS dot,
             |  sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) AS nrm, qn
             |  FROM e JOIN assign a ON a.vec_id = e.vec_id
             |  JOIN probes p ON p.c = a.cell, qn)
             |SELECT vec_id, round(dot / (nrm * qn), 5) AS cos FROM s2
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- ANN: IVF with nProbe = nCentroids probes every cell — equal to
    // brute-force top-k, certified by the exact cosine oracle ---------------
    "q_ann_ivf_exact" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.ivfTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, k = 10, nCentroids = 16, nProbe = 16,
          roundTo = 5)
      },
      Some(knnOracleSql)),

    // ---- ANN: product quantization, ADC ranking (Jégou et al. 2011).
    // UNLIKE the LSH/IVF demos this approximate path is FULLY oracled:
    // kmeansIters = 0 pins each subspace codebook to the subvectors of the
    // first 8 corpus vectors in id order, so DuckDB replays codebook →
    // argmin byte-encode (ties to the lowest code) → squared-L2 ADC lookup
    // sum (in subspace order, matching the engine's left-to-right LUT
    // reduce) bit for bit ------------------------------------------------
    "q_ann_pq" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.pqAdcTopK(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, dim = 64, k = 10, m = 8, nCodes = 8,
          roundTo = 5)
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 0),
             |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS cv
             |  FROM e ORDER BY vec_id LIMIT 8),
             |d AS (SELECT e.vec_id, j.j, s.c,
             |    sqrt(list_sum(list_transform(generate_series(1, 8),
             |      i -> (e.embedding[j.j*8+i]::DOUBLE - s.cv[j.j*8+i]::DOUBLE)
             |         * (e.embedding[j.j*8+i]::DOUBLE - s.cv[j.j*8+i]::DOUBLE)))) AS dist
             |  FROM e CROSS JOIN generate_series(0, 7) AS j(j) CROSS JOIN seeds s),
             |assign AS (SELECT vec_id, j, c AS code FROM (
             |    SELECT vec_id, j, c,
             |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn FROM d)
             |  WHERE rn = 1),
             |adc AS (SELECT a.vec_id, a.j,
             |    list_sum(list_transform(generate_series(1, 8),
             |      i -> (q.qv[a.j*8+i]::DOUBLE - s.cv[a.j*8+i]::DOUBLE)
             |         * (q.qv[a.j*8+i]::DOUBLE - s.cv[a.j*8+i]::DOUBLE))) AS pd
             |  FROM assign a JOIN seeds s ON s.c = a.code CROSS JOIN q),
             |tot AS (SELECT vec_id, list_sum(list(pd ORDER BY j)) AS adc FROM adc GROUP BY vec_id)
             |SELECT vec_id, round(adc, 5) AS adc_dist FROM tot
             |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin)),

    // ---- ANN: PQ with exact rerank — the production recall shape: the ADC
    // pass ranks on stored byte codes alone (never reads the vector), then
    // only the 64-row shortlist is reranked by exact cosine. kmeansIters = 0
    // pins the 16-code subspace codebooks to seed subvectors (refinement is
    // spec-gated in RecallSpec), so DuckDB replays codebook → argmin encode
    // → ADC → rounded-ADC shortlist (ties by id) → cosine rerank ----------
    "q_ann_pq_rerank" -> QueryDef(
      (s, dir) => {
        val q = queryVec(s, dir)
        Similarity.pqTopKReranked(
          t(s, dir, "embeddings").filter(col("vec_id") > 0),
          "vec_id", "embedding", q, dim = 64, k = 10, m = 8, nCodes = 16,
          shortlist = 64, roundTo = 5)
      },
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
             |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 0),
             |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS cv
             |  FROM e ORDER BY vec_id LIMIT 16),
             |d AS (SELECT e.vec_id, j.j, s.c,
             |    sqrt(list_sum(list_transform(generate_series(1, 8),
             |      i -> (e.embedding[j.j*8+i]::DOUBLE - s.cv[j.j*8+i]::DOUBLE)
             |         * (e.embedding[j.j*8+i]::DOUBLE - s.cv[j.j*8+i]::DOUBLE)))) AS dist
             |  FROM e CROSS JOIN generate_series(0, 7) AS j(j) CROSS JOIN seeds s),
             |assign AS (SELECT vec_id, j, c AS code FROM (
             |    SELECT vec_id, j, c,
             |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn FROM d)
             |  WHERE rn = 1),
             |adc AS (SELECT a.vec_id, a.j,
             |    list_sum(list_transform(generate_series(1, 8),
             |      i -> (q.qv[a.j*8+i]::DOUBLE - s.cv[a.j*8+i]::DOUBLE)
             |         * (q.qv[a.j*8+i]::DOUBLE - s.cv[a.j*8+i]::DOUBLE))) AS pd
             |  FROM assign a JOIN seeds s ON s.c = a.code CROSS JOIN q),
             |tot AS (SELECT vec_id, round(list_sum(list(pd ORDER BY j)), 5) AS adc
             |  FROM adc GROUP BY vec_id),
             |short AS (SELECT vec_id FROM tot ORDER BY adc, vec_id LIMIT 64),
             |qn AS (SELECT qv, sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) AS qn FROM q),
             |s2 AS (SELECT e.vec_id,
             |  list_sum(list_transform(generate_series(1, 64),
             |    i -> e.embedding[i]::DOUBLE * qv[i]::DOUBLE)) AS dot,
             |  sqrt(list_sum(list_transform(generate_series(1, 64),
             |    i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) AS nrm, qn
             |  FROM e JOIN short sh ON sh.vec_id = e.vec_id, qn)
             |SELECT vec_id, round(dot / (nrm * qn), 5) AS cos FROM s2
             |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)),

    // ---- batched PQ/ADC retrieval (round 17): a 20-query block over the
    // SAME seed-codebook PQ pipeline as q_ann_pq_rerank — per-query ADC
    // LUTs ride the broadcast query block as array columns, ONE scan of
    // the byte codes shortlists every query, exact cosine reranks the
    // union shortlist; the oracle replays codebook → argmin encode →
    // per-query ADC → shortlist → rerank end to end ---------------------------
    "q_ann_batch_pq" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopKForQueries(
          emb.filter(col("vec_id") >= 100), "vec_id", "embedding",
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          dim = 64, k = 5, m = 8, nCodes = 16, kmeansIters = 0,
          shortlist = 20, roundTo = 5)
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
             |  FROM embeddings WHERE vec_id < 20),
             |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 100),
             |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS cv
             |  FROM e ORDER BY vec_id LIMIT 16),
             |d AS (SELECT e.vec_id, j.j, s.c,
             |    sqrt(list_sum(list_transform(generate_series(1, 8),
             |      i -> (e.embedding[j.j*8+i]::DOUBLE - s.cv[j.j*8+i]::DOUBLE)
             |         * (e.embedding[j.j*8+i]::DOUBLE - s.cv[j.j*8+i]::DOUBLE)))) AS dist
             |  FROM e CROSS JOIN generate_series(0, 7) AS j(j) CROSS JOIN seeds s),
             |assign AS (SELECT vec_id, j, c AS code FROM (
             |    SELECT vec_id, j, c,
             |      row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, c) AS rn FROM d)
             |  WHERE rn = 1),
             |adc AS (SELECT q.query_id, a.vec_id, a.j,
             |    list_sum(list_transform(generate_series(1, 8),
             |      i -> (q.qv[a.j*8+i]::DOUBLE - s.cv[a.j*8+i]::DOUBLE)
             |         * (q.qv[a.j*8+i]::DOUBLE - s.cv[a.j*8+i]::DOUBLE))) AS pd
             |  FROM assign a JOIN seeds s ON s.c = a.code CROSS JOIN q),
             |tot AS (SELECT query_id, vec_id,
             |    round(list_sum(list(pd ORDER BY j)), 5) AS adc
             |  FROM adc GROUP BY query_id, vec_id),
             |short AS (SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id,
             |      row_number() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rn
             |    FROM tot) WHERE rn <= 20),
             |qn AS (SELECT query_id, qv,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> qv[i]::DOUBLE * qv[i]::DOUBLE))) AS qn FROM q),
             |s2 AS (SELECT sh.query_id, e.vec_id,
             |    list_sum(list_transform(generate_series(1, 64),
             |      i -> e.embedding[i]::DOUBLE * qn.qv[i]::DOUBLE)) AS dot,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) AS nrm,
             |    qn.qn
             |  FROM short sh JOIN e ON e.vec_id = sh.vec_id
             |  JOIN qn ON qn.query_id = sh.query_id),
             |r AS (SELECT query_id, vec_id, round(dot / (nrm * qn), 5) AS cos,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY round(dot / (nrm * qn), 5) DESC, vec_id) AS rn
             |  FROM s2)
             |SELECT query_id, vec_id, cos, rn::INT AS rank FROM r
             |WHERE rn <= 5""".stripMargin)),

    // ---- Z-order (Morton) layout key: interleave (user, value-band) bits
    // so range-partitioned files are tight on BOTH dimensions — the
    // Delta/Iceberg OPTIMIZE ZORDER primitive as an unrolled codegen'd
    // mask/shift sum, bit-replayable in any engine --------------------------
    "q_zorder_key" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(!isnan(col("value")))
        ev.select(col("event_id"),
          graft.io.Layout.zOrderKey(
            col("user_id"), floor(col("value") / 10).cast("long"), 8).as("zkey"))
      },
      Some("""SELECT event_id,
             |  CAST(list_sum(list_transform(generate_series(0, 7), i ->
             |    (((user_id >> i) & 1) << (2 * i))
             |    + (((floor(value / 10)::BIGINT >> i) & 1) << (2 * i + 1))))
             |    AS BIGINT) AS zkey
             |FROM events WHERE NOT isnan(value)""".stripMargin)),

    // ---- Hilbert-curve clustering key (round 16): the 4-state machine
    // replayed in SQL — a recursive CTE walks the levels carrying the
    // 2-bit state, indexing the SAME literal digit/next tables as the
    // unrolled Catalyst expression, so the key is bit-exact across
    // engines ---------------------------------------------------------------
    "q_hilbert_key" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(!isnan(col("value")))
        ev.select(col("event_id"),
          graft.io.Layout.hilbertKey(
            col("user_id"), floor(col("value") / 10).cast("long"), 8).as("hkey"))
      },
      Some("""WITH RECURSIVE ev AS (
             |  SELECT event_id, (user_id & 255)::BIGINT AS x,
             |    (floor(value / 10)::BIGINT & 255) AS y
             |  FROM events WHERE NOT isnan(value)),
             |hil AS (
             |  SELECT event_id, x, y, 7 AS lvl, 0::BIGINT AS st, 0::BIGINT AS d
             |  FROM ev
             |  UNION ALL
             |  SELECT event_id, x, y, lvl - 1,
             |    ([1,0,2,0, 0,3,1,1, 2,2,0,3, 3,1,3,2])[
             |      (st * 4 + ((x >> lvl) & 1) * 2 + ((y >> lvl) & 1) + 1)::INT
             |    ]::BIGINT,
             |    ((d << 2) | ([0,1,3,2, 0,3,1,2, 2,1,3,0, 2,3,1,0])[
             |      (st * 4 + ((x >> lvl) & 1) * 2 + ((y >> lvl) & 1) + 1)::INT
             |    ]::BIGINT)
             |  FROM hil WHERE lvl >= 0)
             |SELECT event_id, d AS hkey FROM hil WHERE lvl = -1""".stripMargin)),

    // ---- 3-dimensional Hilbert key (round 17): the SAME machine shape at
    // d=3 — tables DERIVED from Hamilton's compact-Hilbert construction
    // (Layout.hilbertMachine, exhaustively bijectivity/adjacency-verified
    // in LayoutSpec) and interpolated into the SQL verbatim, so the
    // recursive CTE replays the identical generated tables the unrolled
    // Catalyst expression ships --------------------------------------------
    "q_hilbert3_key" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(!isnan(col("value")))
        ev.select(col("event_id"),
          graft.io.Layout.hilbertKeyN(Seq(
            col("user_id"), floor(col("value") / 10).cast("long"),
            col("event_id")), 4).as("hkey3"))
      },
      Some {
        val m = graft.io.Layout.Hilbert3
        val dig = m.digit.mkString("[", ",", "]")
        val nxt = m.next.mkString("[", ",", "]")
        val cell = "((x >> lvl) & 1) + ((y >> lvl) & 1) * 2 + ((z >> lvl) & 1) * 4"
        s"""WITH RECURSIVE ev AS (
           |  SELECT event_id, (user_id & 15)::BIGINT AS x,
           |    (floor(value / 10)::BIGINT & 15) AS y,
           |    (event_id & 15)::BIGINT AS z
           |  FROM events WHERE NOT isnan(value)),
           |hil AS (
           |  SELECT event_id, x, y, z, 3 AS lvl, 0::BIGINT AS st,
           |    0::BIGINT AS d
           |  FROM ev
           |  UNION ALL
           |  SELECT event_id, x, y, z, lvl - 1,
           |    ($nxt)[(st * 8 + $cell + 1)::INT]::BIGINT,
           |    ((d << 3) | ($dig)[(st * 8 + $cell + 1)::INT]::BIGINT)
           |  FROM hil WHERE lvl >= 0)
           |SELECT event_id, d AS hkey3 FROM hil WHERE lvl = -1""".stripMargin
      }),

    // ---- SemDeDup: embedding-space near-dup pruning — k-means cluster,
    // pairwise cosine ONLY within a cluster, greedy keep-first in id order.
    // kmeansIters = 0 pins the codebook to the first 16 corpus vectors in
    // id order (the q_ann_ivf pattern), so DuckDB replays codebook →
    // argmin cell → within-cell pairs → keep flag end to end ---------------
    "q_semdedup" -> QueryDef(
      (s, dir) => Similarity.semDedup(
        t(s, dir, "embeddings").filter(col("vec_id") > 0),
        "vec_id", "embedding", nClusters = 16, threshold = 0.3),
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id > 0),
             |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, embedding AS cv
             |  FROM e ORDER BY vec_id LIMIT 16),
             |d AS (SELECT e.vec_id, s.c,
             |    sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> (e.embedding[i]::DOUBLE - s.cv[i]::DOUBLE)
             |         * (e.embedding[i]::DOUBLE - s.cv[i]::DOUBLE)))) AS dist
             |  FROM e CROSS JOIN seeds s),
             |assign AS (SELECT vec_id, c AS cell FROM (
             |    SELECT vec_id, c,
             |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM d)
             |  WHERE rn = 1),
             |p AS (SELECT hi.vec_id,
             |    round(list_sum(list_transform(generate_series(1, 64),
             |        i -> eh.embedding[i]::DOUBLE * el.embedding[i]::DOUBLE))
             |      / (sqrt(list_sum(list_transform(generate_series(1, 64),
             |          i -> eh.embedding[i]::DOUBLE * eh.embedding[i]::DOUBLE)))
             |       * sqrt(list_sum(list_transform(generate_series(1, 64),
             |          i -> el.embedding[i]::DOUBLE * el.embedding[i]::DOUBLE)))), 5) AS cos
             |  FROM assign hi JOIN assign lo ON hi.cell = lo.cell AND lo.vec_id < hi.vec_id
             |  JOIN e eh ON eh.vec_id = hi.vec_id
             |  JOIN e el ON el.vec_id = lo.vec_id),
             |drp AS (SELECT DISTINCT vec_id FROM p WHERE cos >= 0.3)
             |SELECT a.vec_id, a.cell, dr.vec_id IS NULL AS keep
             |FROM assign a LEFT JOIN drp dr ON dr.vec_id = a.vec_id""".stripMargin)),

    // ---- per-dimension z-standardization of the embedding corpus ----------
    // Stats collapse map-side to dim-sized (mu, sigma) rows that ride back
    // as broadcast literals; the judged projection is %.5f CSV (raw float
    // arrays break the driver's pandas sort, the q_mm_features lesson).
    "q_embed_standardize" -> QueryDef(
      (s, dir) => Similarity.standardizeEmbeddings(
        t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"),
          array_join(transform(col("embedding"),
            v => format_string("%.5f", v)), ",").as("z_csv")),
      Some("""WITH e AS (SELECT vec_id, embedding FROM embeddings),
             |d AS (SELECT p, avg(embedding[p]::DOUBLE) AS mu,
             |    greatest(stddev_pop(embedding[p]::DOUBLE), 1e-12) AS sd
             |  FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS p)
             |  GROUP BY p),
             |st AS (SELECT list(mu ORDER BY p) AS mus, list(sd ORDER BY p) AS sds
             |  FROM d)
             |SELECT vec_id,
             |  array_to_string(list_transform(generate_series(1, 64),
             |    i -> printf('%.5f',
             |      round((embedding[i]::DOUBLE - mus[i]) / sds[i], 5))), ',') AS z_csv
             |FROM e CROSS JOIN st""".stripMargin)),

    // ---- embedding-space eval decontamination: the semantic twin of
    // q_decontaminate's n-gram purge — flag train vectors with cosine ≥ 0.3
    // to ANY eval vector; eval set rides the plan as literals, so the scan
    // is one shuffle-free map pass (K fused cosines + greatest) ------------
    "q_embed_decontaminate" -> QueryDef(
      (s, dir) => {
        val evalVecs = t(s, dir, "embeddings").filter(col("vec_id") < 10)
          .orderBy("vec_id").select("embedding")
          .collect().map(_.getSeq[Float](0)).toSeq
        Similarity.embeddingDecontaminate(
          t(s, dir, "embeddings").filter(col("vec_id") >= 10),
          "vec_id", "embedding", evalVecs, threshold = 0.3)
      },
      Some("""WITH ev AS (SELECT embedding AS qv FROM embeddings WHERE vec_id < 10),
             |tr AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 10),
             |s AS (SELECT tr.vec_id,
             |  list_sum(list_transform(generate_series(1, 64),
             |    i -> tr.embedding[i]::DOUBLE * ev.qv[i]::DOUBLE))
             |  / (sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> tr.embedding[i]::DOUBLE * tr.embedding[i]::DOUBLE)))
             |   * sqrt(list_sum(list_transform(generate_series(1, 64),
             |      i -> ev.qv[i]::DOUBLE * ev.qv[i]::DOUBLE)))) AS cos
             |  FROM tr CROSS JOIN ev),
             |m AS (SELECT vec_id, round(max(cos), 5) AS max_eval_cos FROM s GROUP BY 1)
             |SELECT vec_id, max_eval_cos, max_eval_cos < 0.3 AS keep FROM m""".stripMargin)),

    // ---- corpus-slice overlap: EXACT pairwise vocabulary Jaccard between
    // language slices — distinct tokens equi-joined on the token (a token
    // only meets its equal; never pairwise docs) ---------------------------
    "q_slice_overlap" -> QueryDef(
      (s, dir) => CorpusOverlap.sliceOverlapExact(
        t(s, dir, "documents").filter(col("doc_id") < 500), "lang", "text"),
      Some("""WITH tok AS (SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS t
             |  FROM documents WHERE doc_id < 500),
             |n AS (SELECT lang, count(*) AS n FROM tok GROUP BY lang),
             |i AS (SELECT a.lang AS slice_a, b.lang AS slice_b, count(*) AS ni
             |  FROM tok a JOIN tok b ON a.t = b.t AND a.lang < b.lang
             |  GROUP BY 1, 2)
             |SELECT i.slice_a, i.slice_b,
             |  round(ni::DOUBLE / (na.n + nb.n - ni), 6) AS jaccard
             |FROM i JOIN n na ON na.lang = i.slice_a
             |JOIN n nb ON nb.lang = i.slice_b""".stripMargin)),

    // ---- corpus-slice overlap, MinHash-sketch ESTIMATE: per-slice
    // min(md5(tok || '#k')) signatures compared component-wise. This md5
    // variant is the cross-engine-replayable twin of the production
    // minhash_sketch TypedImperativeAggregate (xxhash64 family, one
    // fixed 8·n-byte buffer per slice, no token explode — SketchSpec pins
    // the two paths' estimator behavior and the aggregate's merge
    // algebra) -------------------------------------------------------------
    "q_sketch_overlap" -> QueryDef(
      (s, dir) => CorpusOverlap.sliceOverlapMd5(
        t(s, dir, "documents").filter(col("doc_id") < 500), "lang", "text",
        numHashes = 4),
      Some("""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS t
             |  FROM documents WHERE doc_id < 500),
             |sig AS (SELECT lang,
             |    min(md5(t || '#0')) AS m0, min(md5(t || '#1')) AS m1,
             |    min(md5(t || '#2')) AS m2, min(md5(t || '#3')) AS m3
             |  FROM tok GROUP BY lang)
             |SELECT a.lang AS slice_a, b.lang AS slice_b,
             |  round(((a.m0 = b.m0)::INT + (a.m1 = b.m1)::INT +
             |    (a.m2 = b.m2)::INT + (a.m3 = b.m3)::INT)::DOUBLE / 4, 6)
             |    AS jaccard_est
             |FROM sig a JOIN sig b ON a.lang < b.lang""".stripMargin)),

    // ---- Unicode canonicalization under content hashing: composed é and
    // decomposed e+U+0301 must digest identically, or cross-producer dedup
    // silently misses byte-different same-text duplicates -------------------
    "q_text_canonical" -> QueryDef(
      (s, dir) => {
        // inject the hazard around each doc: NFD "Cafe"+combining-acute,
        // whitespace noise, uppercase composed É
        val messy = concat(lit("Café  "), col("text"), lit("\tCAFÉ"))
        t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"),
            TextFunctions.canonicalText(messy).as("canon"),
            sha2(TextFunctions.canonicalText(messy), 256).as("canon_digest"))
      },
      Some("""SELECT doc_id,
             |  trim(regexp_replace(lower(nfc_normalize(
             |    'Cafe' || chr(769) || '  ' || text || chr(9) || 'CAF' || chr(201))),
             |    '\s+', ' ', 'g')) AS canon,
             |  sha256(trim(regexp_replace(lower(nfc_normalize(
             |    'Cafe' || chr(769) || '  ' || text || chr(9) || 'CAF' || chr(201))),
             |    '\s+', ' ', 'g'))) AS canon_digest
             |FROM documents WHERE doc_id < 200""".stripMargin)),

    // ---- fuzzy-match FOLD key: accents stripped on top of canonical ------
    // the S5 station-name class: "Hanwëlla " from a degraded feed must
    // equi-join the dimension's "hanwella". Accents planted in BOTH
    // composed (ë = U+00EB) and decomposed (e + U+0308) forms plus
    // non-decomposable letters (ø, ß) that must pass through — folded
    // text AND the equality of the two forms hash-compared
    "q_text_fold" -> QueryDef(
      (s, dir) => textFoldFixture(
        t(s, dir, "documents").filter(col("doc_id") < 200)),
      Some("""WITH f AS (SELECT doc_id,
             |    'Hanw' || chr(235) || 'lla  St' || chr(228) || 'tion '
             |      || substr(text, 1, 20) || ' ' || chr(216) || 'ystein stra'
             |      || chr(223) || 'e' AS composed,
             |    'Hanwe' || chr(776) || 'lla  Sta' || chr(776) || 'tion '
             |      || substr(text, 1, 20) || ' ' || chr(216) || 'ystein stra'
             |      || chr(223) || 'e' AS decomposed
             |  FROM documents WHERE doc_id < 200),
             |g AS (SELECT doc_id,
             |    trim(regexp_replace(lower(strip_accents(nfc_normalize(composed))),
             |      '\s+', ' ', 'g')) AS fc,
             |    trim(regexp_replace(lower(strip_accents(nfc_normalize(decomposed))),
             |      '\s+', ' ', 'g')) AS fd
             |  FROM f)
             |SELECT doc_id, fc AS folded, fc = fd AS forms_agree
             |FROM g""".stripMargin)),

    // ---- URL canonicalization (the key layer of URL-keyed dedup) ---------
    // synthesized URLs exercise every rule: mixed-case scheme/host,
    // default :443 port, trailing path slash, tracking params, unsorted
    // query order, fragments — one zero-shuffle expression chain, every
    // step replayed by DuckDB's regexp + list functions
    "q_url_normalize" -> QueryDef(
      (s, dir) => {
        val url = concat(
          when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTPS://"))
            .otherwise(lit("https://")),
          upper(col("source")), lit(".example.com"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(":443")).otherwise(lit("")),
          lit("/Docs/"), col("doc_id"),
          when(pmod(col("doc_id"), lit(5)) === 0, lit("/")).otherwise(lit("")),
          lit("?z=9&utm_source=feed&a=1"),
          when(pmod(col("doc_id"), lit(4)) === 0, lit("&fbclid=abc"))
            .otherwise(lit("")),
          lit("#sec"))
        t(s, dir, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"), url.as("url"),
            TextFunctions.normalizeUrl(url).as("url_norm"))
      },
      Some("""WITH u AS (SELECT doc_id,
             |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END ||
             |     upper(source) || '.example.com' ||
             |     CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END ||
             |     '/Docs/' || doc_id ||
             |     CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
             |     '?z=9&utm_source=feed&a=1' ||
             |     CASE WHEN doc_id % 4 = 0 THEN '&fbclid=abc' ELSE '' END ||
             |     '#sec') AS url
             |  FROM documents WHERE doc_id < 400),
             |s2 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
             |s3 AS (SELECT *, regexp_replace(nofrag, '\?.*$', '') AS base,
             |    coalesce(regexp_extract(nofrag, '\?(.*)$', 1), '') AS q FROM s2),
             |s4 AS (SELECT *, regexp_extract(base,
             |    '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1) AS pre FROM s3),
             |s5 AS (SELECT *,
             |    regexp_replace(regexp_replace(lower(pre),
             |      '^(https://[^/:]*):443$', '\1'), '^(http://[^/:]*):80$', '\1') AS prenp,
             |    regexp_replace(substr(base, length(pre) + 1), '/+$', '') AS path FROM s4),
             |s6 AS (SELECT *, list_aggregate(list_sort(list_filter(string_split(q, '&'),
             |      x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)(=|$)')
             |        AND x <> '')), 'string_agg', '&') AS kept FROM s5)
             |SELECT doc_id, url, prenp || path ||
             |  CASE WHEN kept IS NULL OR kept = '' THEN '' ELSE '?' || kept END AS url_norm
             |FROM s6""".stripMargin)),

    // ---- portable deterministic HLL distinct-token estimate per lang -----
    // md5-derived registers (exact string/int rank extraction — no float
    // log2), so DuckDB replays the sketch bit for bit; the shuffle carries
    // ≤ groups×256 register rows at any corpus size
    "q_hll_distinct" -> QueryDef(
      (s, dir) => CorpusOverlap.hllDistinctTokens(
        t(s, dir, "documents"), "lang", "text"),
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

    // ---- portable count-min sketch: corpus token frequencies compressed
    // to depth×256 counters, estimates via min over md5-derived cells ------
    "q_cms_counts" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cms = CorpusOverlap.cmsTokenCounts(docs, "text")
        val queryToks = docs.filter(col("doc_id") < 5)
          .select(explode(split(col("text"), " ", -1)).as("token")).distinct()
        CorpusOverlap.cmsEstimate(cms, queryToks, "token")
      },
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

    // ---- hashed-feature linear quality scoring: the inference path of the
    // fastText-style classifier (QualityClassifier.trainLogReg is the
    // iterative trainer, spec-gated like the k-means codebooks). Weights
    // here are a fixed function of the bucket id so BOTH engines derive
    // them: w(b) = ((b·96769) mod 2000)/1000 − 1, bucket = first 8 md5 hex
    // digits mod 256 — engine-portable by construction ----------------------
    "q_quality_lr" -> QueryDef(
      (s, dir) => QualityClassifier.scoreLinear(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
        weights = Array.tabulate(256)(b => ((b * 96769) % 2000) / 1000.0 - 1.0)),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
             |  FROM documents WHERE doc_id < 300),
             |b AS (SELECT doc_id,
             |    ('0x' || substr(md5(t), 1, 8))::BIGINT % 256 AS b
             |  FROM tok WHERE len(t) > 0),
             |z AS (SELECT doc_id,
             |    sum(((b * 96769) % 2000) / 1000.0 - 1.0) AS z
             |  FROM b GROUP BY doc_id)
             |SELECT d.doc_id,
             |  round(1.0 / (1.0 + exp(-coalesce(z.z, 0.0))), 5) AS quality_score
             |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
             |LEFT JOIN z USING (doc_id)""".stripMargin)),

    // ---- rule-based sentence segmentation + per-doc sentence stats --------
    // The boundary regex is RE2-compatible (no lookarounds) and the stats
    // derive from two lengths and a count — no array materialization, no
    // HOF lambda, fully codegen'd. The fixture text carries no punctuation,
    // so prose is CONSTRUCTED from capitalized substrings of each doc,
    // lengths keyed to doc_id; every doc_id % 5 == 0 doc has no boundary
    // (one sentence) to pin the degenerate path.
    "q_text_sentences" -> QueryDef(
      (s, dir) => {
        val stats = TextFunctions.sentenceStats(col("text"))
        proseDocs(s, dir).select(col("doc_id"),
          stats.getField("n_sentences").as("n_sentences"),
          stats.getField("mean_sentence_chars").as("mean_sentence_chars"),
          element_at(TextFunctions.sentences(col("text")), 1).as("first_sentence"))
      },
      Some("""WITH prose AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN
             |      upper(substr(substr(text, 1, 30), 1, 1)) || substr(substr(text, 1, 30), 2)
             |    ELSE
             |      upper(substr(substr(text, 1, CAST(1 + doc_id % 35 AS INT)), 1, 1))
             |        || substr(substr(text, 1, CAST(1 + doc_id % 35 AS INT)), 2)
             |        || '. '
             |        || upper(substr(substr(text, 8, CAST(5 + doc_id % 29 AS INT)), 1, 1))
             |        || substr(substr(text, 8, CAST(5 + doc_id % 29 AS INT)), 2)
             |        || '! '
             |        || upper(substr(substr(text, 15, CAST(3 + doc_id % 44 AS INT)), 1, 1))
             |        || substr(substr(text, 15, CAST(3 + doc_id % 44 AS INT)), 2)
             |        || '?'
             |    END AS p
             |  FROM documents),
             |m AS (SELECT doc_id,
             |    regexp_replace(p, '([.!?])\s+(\p{Lu})', '\1' || chr(1) || '\2', 'g') AS marked
             |  FROM prose),
             |st AS (SELECT doc_id, marked,
             |    length(marked) - length(replace(marked, chr(1), '')) AS s
             |  FROM m)
             |SELECT doc_id, CAST(s + 1 AS BIGINT) AS n_sentences,
             |  round((length(marked) - s) * 1.0 / (s + 1), 2) AS mean_sentence_chars,
             |  string_split(marked, chr(1))[1] AS first_sentence
             |FROM st""".stripMargin)),

    // ---- sentence-aware chunking: cuts at sentence boundaries -------------
    // Same constructed prose as q_text_sentences; maxTokens = 4 forces
    // multi-chunk docs. Chunk membership is the prefix-sum partition
    // (⌊tokens-before / max⌋) — deterministic and window-replayable where
    // true greedy reset would be a sequential dependency.
    "q_sentence_chunks" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.sentenceChunks(
        proseDocs(s, dir), "doc_id", "text", maxTokens = 4),
      Some("""WITH prose AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN
             |      upper(substr(substr(text, 1, 30), 1, 1)) || substr(substr(text, 1, 30), 2)
             |    ELSE
             |      upper(substr(substr(text, 1, CAST(1 + doc_id % 35 AS INT)), 1, 1))
             |        || substr(substr(text, 1, CAST(1 + doc_id % 35 AS INT)), 2)
             |        || '. '
             |        || upper(substr(substr(text, 8, CAST(5 + doc_id % 29 AS INT)), 1, 1))
             |        || substr(substr(text, 8, CAST(5 + doc_id % 29 AS INT)), 2)
             |        || '! '
             |        || upper(substr(substr(text, 15, CAST(3 + doc_id % 44 AS INT)), 1, 1))
             |        || substr(substr(text, 15, CAST(3 + doc_id % 44 AS INT)), 2)
             |        || '?'
             |    END AS p
             |  FROM documents),
             |m AS (SELECT doc_id,
             |    string_split(regexp_replace(p, '([.!?])\s+(\p{Lu})',
             |      '\1' || chr(1) || '\2', 'g'), chr(1)) AS ss
             |  FROM prose),
             |sent AS (SELECT doc_id,
             |    unnest(generate_series(1, len(ss))) - 1 AS pos,
             |    unnest(ss) AS sent
             |  FROM m),
             |tk AS (SELECT doc_id, pos, sent,
             |    CASE WHEN length(sent) = 0 THEN 0
             |      ELSE length(sent) - length(replace(sent, ' ', '')) + 1
             |    END AS n
             |  FROM sent),
             |ck AS (SELECT doc_id, pos, sent, n,
             |    coalesce(sum(n) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4
             |      AS chunk_idx
             |  FROM tk)
             |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             |  string_agg(sent, ' ' ORDER BY pos) AS chunk_text,
             |  CAST(sum(n) AS BIGINT) AS n_tokens,
             |  count(*) AS n_sentences
             |FROM ck GROUP BY doc_id, chunk_idx""".stripMargin)),

    // ---- Flesch-style readability over the constructed prose --------------
    // words/sentence varies with the doc_id-keyed substring lengths and
    // syllable groups with the underlying text — a real spread of scores,
    // replayed term-for-term in SQL (vowel groups via regexp_extract_all).
    "q_text_readability" -> QueryDef(
      (s, dir) => proseDocs(s, dir).select(col("doc_id"),
        TextFunctions.readabilityScore(col("text")).as("flesch")),
      Some("""WITH prose AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN
             |      upper(substr(substr(text, 1, 30), 1, 1)) || substr(substr(text, 1, 30), 2)
             |    ELSE
             |      upper(substr(substr(text, 1, CAST(1 + doc_id % 35 AS INT)), 1, 1))
             |        || substr(substr(text, 1, CAST(1 + doc_id % 35 AS INT)), 2)
             |        || '. '
             |        || upper(substr(substr(text, 8, CAST(5 + doc_id % 29 AS INT)), 1, 1))
             |        || substr(substr(text, 8, CAST(5 + doc_id % 29 AS INT)), 2)
             |        || '! '
             |        || upper(substr(substr(text, 15, CAST(3 + doc_id % 44 AS INT)), 1, 1))
             |        || substr(substr(text, 15, CAST(3 + doc_id % 44 AS INT)), 2)
             |        || '?'
             |    END AS p
             |  FROM documents),
             |m AS (SELECT doc_id, p,
             |    regexp_replace(p, '([.!?])\s+(\p{Lu})', '\1' || chr(1) || '\2', 'g') AS marked
             |  FROM prose),
             |f AS (SELECT doc_id,
             |    CASE WHEN length(p) = 0 THEN 0
             |      ELSE length(p) - length(replace(p, ' ', '')) + 1 END AS words,
             |    length(marked) - length(replace(marked, chr(1), '')) + 1 AS sents,
             |    len(regexp_extract_all(p, '[aeiouyAEIOUY]+')) AS syl
             |  FROM m)
             |SELECT doc_id,
             |  CASE WHEN words = 0 THEN 0.0
             |    ELSE round(206.835 - 1.015 * (words * 1.0 / sents)
             |      - 84.6 * (syl * 1.0 / words), 2) END AS flesch
             |FROM f""".stripMargin)),

    // ---- duplicate-line repetition metrics (the Gopher line-level rule) ---
    // Over the paragraph spine: every doc repeats its opening paragraph
    // once (dup_line_frac = 0.5 uniformly) while the char-weighted
    // fraction varies with the paragraph lengths — the hashed value the
    // compare certifies. Shuffle carries line digests + counts, not text.
    "q_dup_lines" -> QueryDef(
      (s, dir) => TextFunctions.duplicateLineMetrics(
        paraDocs(s, dir), "doc_id", "text", sep = "\n\n"),
      Some("""WITH spine AS (
             |  SELECT a.doc_id AS doc_id,
             |    p1.text || chr(10) || chr(10) || p2.text || chr(10) || chr(10)
             |      || p1.text || chr(10) || chr(10) || p3.text AS text
             |  FROM documents a
             |  JOIN documents p1 ON p1.doc_id = a.doc_id * 2
             |  JOIN documents p2 ON p2.doc_id = a.doc_id * 2 + 1
             |  JOIN documents p3 ON p3.doc_id = a.doc_id * 2 + 2
             |  WHERE a.doc_id < 100),
             |l AS (SELECT doc_id, trim(para) AS l
             |  FROM (SELECT doc_id,
             |          unnest(string_split(text, chr(10) || chr(10))) AS para
             |        FROM spine)
             |  WHERE trim(para) <> ''),
             |pl AS (SELECT doc_id, l, count(*) AS c FROM l GROUP BY 1, 2),
             |tot AS (SELECT doc_id, sum(c) AS n_lines,
             |    coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS dl,
             |    sum(length(l) * c) AS ch,
             |    coalesce(sum(CASE WHEN c > 1 THEN length(l) * c END), 0) AS dch
             |  FROM pl GROUP BY 1)
             |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
             |  round(dl * 1.0 / n_lines, 6) AS dup_line_frac,
             |  round(dch * 1.0 / ch, 6) AS dup_char_frac
             |FROM tot""".stripMargin)),

    // ---- per-slice dataset-card report over the duplicated corpus ---------
    // Exact dup rate per source with NO Expand count-distinct: the
    // (slice, digest) pre-aggregate collapses map-side, so the shuffle
    // carries one row per distinct text per slice; token/char sums ride
    // the digest rows exactly (a digest group shares its text verbatim).
    "q_corpus_report" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.corpusReport(
        docsWithDups(s, dir), "doc_id", "text", "source"),
      Some(s"""WITH base AS (SELECT * FROM $dupUnionSql),
              |pd AS (SELECT source,
              |    coalesce(sha256(text), '__null__' || doc_id) AS h,
              |    count(*) AS copies,
              |    first(CASE WHEN text IS NULL OR length(text) = 0 THEN 0
              |      ELSE length(text) - length(replace(text, ' ', '')) + 1
              |      END) AS tok,
              |    first(coalesce(length(text), 0)) AS len
              |  FROM base GROUP BY 1, 2)
              |SELECT source, CAST(sum(copies) AS BIGINT) AS n_docs,
              |  count(*) AS n_distinct_texts,
              |  round(1.0 - count(*) * 1.0 / sum(copies), 6) AS dup_rate,
              |  CAST(sum(tok * copies) AS BIGINT) AS n_tokens,
              |  CAST(sum(len * copies) AS BIGINT) AS n_chars,
              |  round(sum(tok * copies) * 1.0 / sum(copies), 2) AS mean_doc_tokens
              |FROM pd GROUP BY 1""".stripMargin)),

    // ---- the full Gopher repetition gate over a mixed corpus --------------
    // Repetitive paragraph-spine docs (opening paragraph duplicated →
    // dup_line_frac 0.5) must FAIL while plain fixture docs mostly pass;
    // the oracle recomputes all five thresholds from scratch.
    "q_repetition_gate" -> QueryDef(
      (s, dir) => {
        val plain = t(s, dir, "documents")
          .filter(col("doc_id") >= 100 && col("doc_id") < 200)
          .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
        TextFunctions.repetitionGate(
          paraDocs(s, dir).unionByName(plain), "doc_id", "text",
          lineSep = "\n\n")
      },
      Some("""WITH spine AS (
             |  SELECT a.doc_id AS doc_id,
             |    p1.text || chr(10) || chr(10) || p2.text || chr(10) || chr(10)
             |      || p1.text || chr(10) || chr(10) || p3.text AS text
             |  FROM documents a
             |  JOIN documents p1 ON p1.doc_id = a.doc_id * 2
             |  JOIN documents p2 ON p2.doc_id = a.doc_id * 2 + 1
             |  JOIN documents p3 ON p3.doc_id = a.doc_id * 2 + 2
             |  WHERE a.doc_id < 100),
             |base AS (SELECT doc_id, text FROM spine
             |  UNION ALL
             |  SELECT doc_id + 5000, text FROM documents
             |  WHERE doc_id >= 100 AND doc_id < 200),
             |l AS (SELECT doc_id, trim(para) AS l
             |  FROM (SELECT doc_id,
             |          unnest(string_split(text, chr(10) || chr(10))) AS para
             |        FROM base)
             |  WHERE trim(para) <> ''),
             |pl AS (SELECT doc_id, l, count(*) AS c FROM l GROUP BY 1, 2),
             |lm AS (SELECT doc_id,
             |    round(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) * 1.0 / sum(c), 6)
             |      AS dup_line_frac,
             |    round(coalesce(sum(CASE WHEN c > 1 THEN length(l) * c END), 0) * 1.0
             |      / sum(length(l) * c), 6) AS dup_char_frac
             |  FROM pl GROUP BY 1),
             |tok AS (SELECT doc_id, string_split(text, ' ') AS ts,
             |    length(text) AS chars FROM base),
             |sh AS (SELECT doc_id, chars, n,
             |    array_to_string(ts[i : i + n - 1], ' ') AS g
             |  FROM (SELECT doc_id, chars, ts, n,
             |          unnest(generate_series(1, len(ts) - n + 1)) AS i
             |        FROM tok CROSS JOIN (SELECT unnest([2, 3, 4]) AS n)
             |        WHERE len(ts) >= n)),
             |c AS (SELECT doc_id, chars, n, g, count(*) AS c
             |  FROM sh GROUP BY 1, 2, 3, 4),
             |r AS (SELECT doc_id, n,
             |    round(CASE WHEN c IS NULL THEN 0.0
             |      ELSE least(1.0, c * length(g) * 1.0 / chars) END, 6) AS frac,
             |    row_number() OVER (PARTITION BY doc_id, n
             |      ORDER BY c DESC, g ASC) AS rn
             |  FROM c),
             |topn AS (SELECT b.doc_id,
             |    coalesce(max(CASE WHEN n = 2 THEN frac END), 0.0) AS f2,
             |    coalesce(max(CASE WHEN n = 3 THEN frac END), 0.0) AS f3,
             |    coalesce(max(CASE WHEN n = 4 THEN frac END), 0.0) AS f4
             |  FROM base b LEFT JOIN r ON r.doc_id = b.doc_id AND r.rn = 1
             |  GROUP BY 1)
             |SELECT b.doc_id, lm.dup_line_frac, lm.dup_char_frac,
             |  topn.f2 AS top2gram_frac, topn.f3 AS top3gram_frac,
             |  topn.f4 AS top4gram_frac,
             |  (lm.dup_line_frac <= 0.30 AND lm.dup_char_frac <= 0.20
             |    AND topn.f2 <= 0.20 AND topn.f3 <= 0.18 AND topn.f4 <= 0.16)
             |    AS pass
             |FROM base b JOIN lm ON lm.doc_id = b.doc_id
             |JOIN topn ON topn.doc_id = b.doc_id""".stripMargin)),

    // ---- top word-bigram repetition metrics (Gopher n-gram rule) ----------
    "q_top_ngram" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.topNgramMetrics(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
        n = 2),
      Some("""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts,
             |    length(text) AS chars
             |  FROM documents WHERE doc_id < 300),
             |sh AS (SELECT doc_id, chars, array_to_string(ts[i : i + 1], ' ') AS g
             |  FROM (SELECT doc_id, chars, ts,
             |          unnest(generate_series(1, len(ts) - 1)) AS i
             |        FROM tok WHERE len(ts) >= 2)),
             |c AS (SELECT doc_id, chars, g, count(*) AS c
             |  FROM sh GROUP BY 1, 2, 3),
             |r AS (SELECT doc_id, g, c, chars,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY c DESC, g ASC) AS rn
             |  FROM c)
             |SELECT d.doc_id, coalesce(r.g, '') AS top_ngram,
             |  CAST(coalesce(r.c, 0) AS BIGINT) AS top_ngram_count,
             |  round(CASE WHEN r.c IS NULL THEN 0.0
             |    ELSE least(1.0, r.c * length(r.g) * 1.0 / r.chars) END, 6)
             |    AS top_ngram_char_frac
             |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
             |LEFT JOIN r ON r.doc_id = d.doc_id AND r.rn = 1""".stripMargin)),

    // ---- token-repetition quality metrics (Gopher-style filters) ----------
    "q_text_repetition" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
        TextFunctions.repetitionMetrics(
          docs.select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("tok")),
          "doc_id", "tok")
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents WHERE doc_id < 500),
             |pt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
             |SELECT doc_id, sum(c)::BIGINT AS n_tokens,
             |  count(*)::BIGINT AS n_distinct,
             |  round(count(*)::DOUBLE / sum(c), 6) AS type_token_ratio,
             |  round(max(c)::DOUBLE / sum(c), 6) AS top_token_fraction
             |FROM pt GROUP BY doc_id""".stripMargin)),

    // ---- text analysis: token counting ------------------------------------
    "q_text_tokens" -> QueryDef(
      (s, dir) => {
        t(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).cast("long").as("len_chars"),
          size(TextFunctions.bpeishTokens(col("text"))).cast("long").as("n_lex_tokens"))
      },
      Some("""SELECT doc_id,
             |  CASE WHEN length(text) = 0 THEN 0
             |    ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS n_tokens,
             |  length(text) AS len_chars,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_lex_tokens
             |FROM documents""".stripMargin)),

    // ---- real BPE tokenization (merges-table-driven) ----------------------
    // The codegen'd greedy min-rank encoder vs a DuckDB replay of the SAME
    // literal merge table as a rank-order replace() sweep — the two
    // algorithms agree exactly on causality-valid tables (see BpeMerges
    // scaladoc; property-pinned in BpeSpec). Every token boundary is
    // certified: the joined token stream is compared, not just counts.
    "q_text_bpe" -> QueryDef(
      (s, dir) => {
        val m = graft.expressions.BpeMerges(oracleBpePairs)
        val toks = graft.functions.Bpe.tokens(col("text"), m)
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          col("doc_id"),
          size(toks).cast("long").as("n_bpe_tokens"),
          // unit-separator (U+001F) join: token BOUNDARIES are compared,
          // not just counts
          array_join(toks, "\u001f").as("bpe_joined"))
      },
      Some(bpeOracleSql)),

    // ---- tokenizer fertility (BPE tokens per word) ------------------------
    "q_bpe_fertility" -> QueryDef(
      (s, dir) => {
        val m = graft.expressions.BpeMerges(oracleBpePairs)
        val words = size(filter(split(col("text"), "\\s+", -1),
          w => length(w) > 0)).cast("long")
        val toks = size(graft.functions.Bpe.tokens(col("text"), m)).cast("long")
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          col("doc_id"), words.as("n_words"), toks.as("n_bpe_tokens"),
          when(words === 0, lit(0.0))
            .otherwise(round(toks.cast("double") / words, 6)).as("fertility"))
      },
      Some(bpeFertilityOracleSql)),

    // ---- sequence-length histogram + padding-waste report -----------------
    "q_seq_len_hist" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.seqLenHistogram(
        t(s, dir, "documents"), "doc_id", "text", contextTokens = 128),
      Some("""WITH l AS (SELECT CASE WHEN length(text) = 0 THEN 0
             |    ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS len
             |  FROM documents),
             |b AS (SELECT len,
             |    CASE WHEN len <= 16 THEN 16 WHEN len <= 32 THEN 32
             |      WHEN len <= 64 THEN 64 WHEN len <= 128 THEN 128
             |      WHEN len <= 256 THEN 256 WHEN len <= 512 THEN 512
             |      WHEN len <= 1024 THEN 1024 WHEN len <= 2048 THEN 2048
             |      WHEN len <= 4096 THEN 4096 ELSE 8192 END AS len_bucket,
             |    CAST(floor((len + 127) * 1.0 / 128) AS BIGINT) AS nseq
             |  FROM l)
             |SELECT len_bucket, count(*) AS n_docs,
             |  CAST(sum(len) AS BIGINT) AS sum_tokens,
             |  CAST(sum(nseq) AS BIGINT) AS n_sequences,
             |  CAST(sum(nseq * 128 - len) AS BIGINT) AS pad_waste_tokens
             |FROM b GROUP BY 1""".stripMargin)),

    // ---- the same histogram budgeted with REAL BPE counts -----------------
    // pins the tokenCountFn plug end-to-end: per-doc BPE counts replay
    // through the sweep chain, then the identical ladder/ceil arithmetic
    "q_seq_len_hist_bpe" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.seqLenHistogram(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
        contextTokens = 64,
        tokenCountFn = graft.functions.Bpe.tokenCount(_,
          graft.expressions.BpeMerges(oracleBpePairs))),
      Some(s"""WITH $bpeSweepCtes,
              |agg AS (SELECT doc_id,
              |    sum(length(s) - length(replace(s, chr(2), ''))) AS n
              |  FROM merged GROUP BY 1),
              |l AS (SELECT coalesce(a.n, 0) AS len
              |  FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
              |  LEFT JOIN agg a USING (doc_id)),
              |b AS (SELECT len,
              |    CASE WHEN len <= 16 THEN 16 WHEN len <= 32 THEN 32
              |      WHEN len <= 64 THEN 64 WHEN len <= 128 THEN 128
              |      WHEN len <= 256 THEN 256 WHEN len <= 512 THEN 512
              |      WHEN len <= 1024 THEN 1024 WHEN len <= 2048 THEN 2048
              |      WHEN len <= 4096 THEN 4096 ELSE 8192 END AS len_bucket,
              |    CAST(floor((len + 63) * 1.0 / 64) AS BIGINT) AS nseq
              |  FROM l)
              |SELECT len_bucket, count(*) AS n_docs,
              |  CAST(sum(len) AS BIGINT) AS sum_tokens,
              |  CAST(sum(nseq) AS BIGINT) AS n_sequences,
              |  CAST(sum(nseq * 64 - len) AS BIGINT) AS pad_waste_tokens
              |FROM b GROUP BY 1""".stripMargin)),

    // ---- BPE token IDS under the closed vocabulary ------------------------
    "q_bpe_ids" -> QueryDef(
      (s, dir) => {
        val m = graft.expressions.BpeMerges(oracleBpePairs)
        val ids = graft.functions.Bpe.tokenIds(col("text"), m)
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          col("doc_id"),
          size(ids).cast("long").as("n_ids"),
          size(filter(ids, i => i === 0)).cast("long").as("n_unk"),
          array_join(transform(ids, _.cast("string")), ",").as("ids_joined"))
      },
      Some(s"""WITH $bpeSweepCtes,
              |tok AS (SELECT doc_id, i, k, ts[k] AS t FROM (
              |    SELECT doc_id, i,
              |      string_split(replace(replace(replace(s, chr(3)||chr(2),
              |        chr(31)), chr(2), ''), chr(3), ''), chr(31)) AS ts
              |    FROM merged),
              |  unnest(generate_series(1, len(ts))) AS _(k)),
              |ids AS (SELECT doc_id, i, k, coalesce(v.id, 0) AS tid
              |  FROM tok LEFT JOIN $bpeVocabValuesSql ON v.sym = tok.t),
              |agg AS (SELECT doc_id, count(*) AS n,
              |    sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS unk,
              |    string_agg(tid::VARCHAR, ',' ORDER BY i, k) AS j
              |  FROM ids GROUP BY 1)
              |SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) AS n_ids,
              |  CAST(coalesce(a.unk, 0) AS BIGINT) AS n_unk,
              |  coalesce(a.j, '') AS ids_joined
              |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
              |LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    // ---- packed token-id sequences (the pretraining tensor shape) ---------
    "q_bpe_pack_ids" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.packedTokenIds(
        t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
        graft.expressions.BpeMerges(oracleBpePairs), contextTokens = 64),
      Some(s"""WITH $bpeSweepCtes,
              |tok AS (SELECT doc_id, i, k, ts[k] AS t FROM (
              |    SELECT doc_id, i,
              |      string_split(replace(replace(replace(s, chr(3)||chr(2),
              |        chr(31)), chr(2), ''), chr(3), ''), chr(31)) AS ts
              |    FROM merged),
              |  unnest(generate_series(1, len(ts))) AS _(k)),
              |ids AS (SELECT doc_id, i, k, coalesce(v.id, 0) AS tid
              |  FROM tok LEFT JOIN $bpeVocabValuesSql ON v.sym = tok.t),
              |g AS (SELECT tid,
              |    row_number() OVER (ORDER BY doc_id, i, k) - 1 AS gpos
              |  FROM ids)
              |SELECT CAST(floor(gpos / 64.0) AS BIGINT) AS seq_id,
              |  count(*) AS n_tokens,
              |  string_agg(tid::VARCHAR, ',' ORDER BY gpos) AS token_ids
              |FROM g GROUP BY 1""".stripMargin)),

    // ---- BPE DECODE: ids back to text (inspection round trip) -------------
    // decoded text is hash-compared verbatim; the roundtrip boolean pins
    // the whitespace-erased contract (true iff the doc is unk-free, since
    // an OOV code point decodes to the U+FFFD marker, never the original)
    "q_bpe_decode" -> QueryDef(
      (s, dir) => {
        val m = graft.expressions.BpeMerges(oracleBpePairs)
        val dec = graft.functions.Bpe.decodeIds(
          graft.functions.Bpe.tokenIds(col("text"), m), m)
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          col("doc_id"),
          dec.as("decoded"),
          (dec === regexp_replace(col("text"), "\\s+", ""))
            .as("roundtrip_ws_erased"))
      },
      Some(s"""WITH $bpeSweepCtes,
              |tok AS (SELECT doc_id, i, k, ts[k] AS t FROM (
              |    SELECT doc_id, i,
              |      string_split(replace(replace(replace(s, chr(3)||chr(2),
              |        chr(31)), chr(2), ''), chr(3), ''), chr(31)) AS ts
              |    FROM merged),
              |  unnest(generate_series(1, len(ts))) AS _(k)),
              |dec AS (SELECT doc_id,
              |    string_agg(CASE WHEN v.id IS NULL THEN chr(65533) ELSE t END,
              |      '' ORDER BY i, k) AS decoded
              |  FROM tok LEFT JOIN $bpeVocabValuesSql ON v.sym = tok.t
              |  GROUP BY 1)
              |SELECT d.doc_id, coalesce(dec.decoded, '') AS decoded,
              |  coalesce(dec.decoded, '') =
              |    regexp_replace(d.text, '\\s+', '', 'g') AS roundtrip_ws_erased
              |FROM (SELECT doc_id, text FROM documents WHERE doc_id < 300) d
              |LEFT JOIN dec USING (doc_id)""".stripMargin)),

    // ---- per-slice tokenizer vocabulary coverage ---------------------------
    // unk rates under the closed oracle vocabulary, per source slice —
    // token and unk sums replayed through the sweep + id chain
    "q_vocab_coverage" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.vocabCoverage(
        t(s, dir, "documents").filter(col("doc_id") < 300), "source", "text",
        graft.expressions.BpeMerges(oracleBpePairs)),
      Some(s"""WITH $bpeSweepCtes,
              |tok AS (SELECT doc_id, i, k, ts[k] AS t FROM (
              |    SELECT doc_id, i,
              |      string_split(replace(replace(replace(s, chr(3)||chr(2),
              |        chr(31)), chr(2), ''), chr(3), ''), chr(31)) AS ts
              |    FROM merged),
              |  unnest(generate_series(1, len(ts))) AS _(k)),
              |ids AS (SELECT doc_id, coalesce(v.id, 0) AS tid
              |  FROM tok LEFT JOIN $bpeVocabValuesSql ON v.sym = tok.t),
              |per AS (SELECT doc_id, count(*) AS n,
              |    sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS u
              |  FROM ids GROUP BY 1),
              |d AS (SELECT doc_id, source FROM documents WHERE doc_id < 300)
              |SELECT d.source AS slice, count(*) AS n_docs,
              |  CAST(coalesce(sum(per.n), 0) AS BIGINT) AS n_tokens,
              |  CAST(coalesce(sum(per.u), 0) AS BIGINT) AS n_unk,
              |  round(coalesce(sum(per.u), 0) * 1.0
              |    / greatest(coalesce(sum(per.n), 0), 1), 6) AS unk_rate
              |FROM d LEFT JOIN per USING (doc_id) GROUP BY 1""".stripMargin)),

    // ---- BYTE-FALLBACK BPE: the zero-unk lossless token stream ------------
    // every out-of-vocabulary symbol decomposes into <0xAB> byte tokens
    // (SentencePiece rendering) and whitespace separators are KEPT as byte
    // tokens, so decode(encode(text)) == text EXACTLY — the GPT-2-class
    // guarantee. The full token stream (boundaries included) is replayed
    // in DuckDB through the sweep + hex(encode()) byte expansion; the
    // roundtrip flag is asserted TRUE by the oracle and DEMONSTRATED by
    // Spark running the actual decodeIds∘tokenIds composition per row
    "q_bpe_bytes" -> QueryDef(
      (s, dir) => {
        val m = graft.expressions.BpeMerges(oracleBpePairs)
        val fixture = bpeBytesFixtureCol
        val toks = graft.functions.Bpe.tokens(fixture, m, byteFallback = true)
        val dec = graft.functions.Bpe.decodeIds(
          graft.functions.Bpe.tokenIds(fixture, m, byteFallback = true), m,
          byteFallback = true)
        t(s, dir, "documents").filter(col("doc_id") < 300).select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, tk => tk.startsWith("<0x"))).cast("long")
            .as("n_byte_tokens"),
          (dec === fixture).as("roundtrip_exact"),
          array_join(toks, "\u001f").as("bpe_joined"))
      },
      Some(s"""WITH $bpeFallbackCtes
              |SELECT d.doc_id,
              |  CAST(len(string_split(a.j, chr(31))) AS BIGINT) AS n_tokens,
              |  CAST(len(list_filter(string_split(a.j, chr(31)),
              |    t -> t LIKE '<0x%')) AS BIGINT) AS n_byte_tokens,
              |  TRUE AS roundtrip_exact,
              |  a.j AS bpe_joined
              |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
              |JOIN fbagg a USING (doc_id)""".stripMargin)),

    // ---- vocabulary coverage under byte fallback: unk is structurally 0 ---
    // same report as q_vocab_coverage but with the fallback encoder — the
    // unk column flips from a loss report to a health metric (any nonzero
    // value is a bug); the oracle computes unk honestly as tokens neither
    // in the closed vocabulary nor byte symbols
    "q_vocab_fallback" -> QueryDef(
      (s, dir) => graft.trainprep.TrainPrep.vocabCoverage(
        t(s, dir, "documents").filter(col("doc_id") < 300)
          .select(col("source"), bpeBytesFixtureCol.as("ftext")),
        "source", "ftext", graft.expressions.BpeMerges(oracleBpePairs),
        byteFallback = true),
      Some(s"""WITH $bpeFallbackCtes,
              |per AS (SELECT doc_id,
              |    len(string_split(j, chr(31))) AS n,
              |    len(list_filter(string_split(j, chr(31)),
              |      t -> NOT (t IN $bpeKnownSymbolsInList
              |        OR t LIKE '<0x%'))) AS u
              |  FROM fbagg),
              |d AS (SELECT doc_id, source FROM documents WHERE doc_id < 300)
              |SELECT d.source AS slice, count(*) AS n_docs,
              |  CAST(coalesce(sum(per.n), 0) AS BIGINT) AS n_tokens,
              |  CAST(coalesce(sum(per.u), 0) AS BIGINT) AS n_unk,
              |  round(coalesce(sum(per.u), 0) * 1.0
              |    / greatest(coalesce(sum(per.n), 0), 1), 6) AS unk_rate
              |FROM d LEFT JOIN per USING (doc_id) GROUP BY 1""".stripMargin)),

    // ---- SFT chat-template render (the instruction-tuning text) -----------
    "q_sft_render" -> QueryDef(
      (s, dir) => graft.trainprep.SftPrep.renderChat(
        sftConvs(s, dir), "conv_id", "turns"),
      Some(s"""WITH $sftTurnsCtes
              |SELECT conv_id,
              |  string_agg('<|' || role || '|>' || chr(10) || content
              |    || chr(10) || '<|end|>' || chr(10), '' ORDER BY turn_idx)
              |    AS text
              |FROM turns GROUP BY 1""".stripMargin)),

    // ---- conversation-STRUCTURE gate (SFT schema QA) ----------------------
    // planted violations over the sftConvs shape: %7 convs get a
    // whitespace-only assistant turn, %11 swap user/assistant roles, %13
    // append a trailing user turn — each must gate with ITS reason in the
    // gate's fixed precedence (empty_turn → bad_alternation →
    // no_assistant_end); the oracle derives the expected verdicts from
    // the same construction
    "q_chat_gate" -> QueryDef(
      (s, dir) => graft.trainprep.SftPrep.chatGate(
        chatGateFixture(docArm(s, dir, 0, "conv_id", "utext")
          .join(docArm(s, dir, 100, "conv_id", "atext"), "conv_id")),
        "conv_id", "turns"),
      Some("""WITH v AS (SELECT doc_id AS conv_id,
             |    CASE WHEN doc_id % 7 = 0 THEN 'empty_turn'
             |      WHEN doc_id % 11 = 0 THEN 'bad_alternation'
             |      WHEN doc_id % 13 = 0 THEN 'no_assistant_end'
             |      ELSE '' END AS reason,
             |    CASE WHEN doc_id % 13 = 0 THEN 4 ELSE 3 END AS n_turns
             |  FROM documents WHERE doc_id < 100)
             |SELECT conv_id, n_turns::BIGINT AS n_turns, TRUE AS has_system,
             |  reason = '' AS pass, reason
             |FROM v""".stripMargin)),

    // ---- completion-loss token spans over the rendered text ---------------
    // per-turn BPE token extents + the loss extent (assistant content +
    // end marker, header excluded); every boundary and count replayed
    // through the generalized sweep chain over the turn segments
    "q_sft_loss_spans" -> QueryDef(
      (s, dir) => graft.trainprep.SftPrep.completionLossSpans(
        sftConvs(s, dir), "conv_id", "turns",
        graft.functions.Bpe.tokenCount(_,
          graft.expressions.BpeMerges(oracleBpePairs))),
      Some(s"""WITH $sftTurnsCtes,
              |segs AS (
              |  SELECT conv_id, turn_idx, role, 0 AS part,
              |    '<|' || role || '|>' || chr(10) AS text FROM turns
              |  UNION ALL
              |  SELECT conv_id, turn_idx, role, 1,
              |    content || chr(10) || '<|end|>' || chr(10) FROM turns),
              |${bpeSweepCtesOver("conv_id, turn_idx, role, part", "segs")},
              |cnt AS (SELECT conv_id, turn_idx, role, part,
              |    sum(length(s) - length(replace(s, chr(2), ''))) AS n
              |  FROM merged GROUP BY 1, 2, 3, 4),
              |tt AS (SELECT conv_id, turn_idx, role,
              |    sum(CASE WHEN part = 0 THEN n ELSE 0 END) AS h,
              |    sum(n) AS n_tokens
              |  FROM cnt GROUP BY 1, 2, 3),
              |sp AS (SELECT conv_id, turn_idx, role, n_tokens, h,
              |    sum(n_tokens) OVER (PARTITION BY conv_id
              |      ORDER BY turn_idx) AS tok_end
              |  FROM tt)
              |SELECT conv_id, turn_idx, role,
              |  CAST(n_tokens AS BIGINT) AS n_tokens,
              |  CAST(tok_end AS BIGINT) AS tok_end,
              |  CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
              |  CAST(CASE WHEN role = 'assistant' THEN tok_end - n_tokens + h
              |    ELSE tok_end END AS BIGINT) AS loss_start,
              |  CAST(tok_end AS BIGINT) AS loss_end
              |FROM sp""".stripMargin)),

    // ---- loss masks for PACKED sequences -----------------------------------
    // conversations laid end-to-end in 64-token windows; each completion
    // span lands as in-window [start, end) rows split at boundaries —
    // offsets, splits and window ids all replayed
    "q_sft_pack_masks" -> QueryDef(
      (s, dir) => graft.trainprep.SftPrep.packedLossMasks(
        sftConvs(s, dir), "conv_id", "turns",
        graft.functions.Bpe.tokenCount(_,
          graft.expressions.BpeMerges(oracleBpePairs)),
        contextTokens = 64),
      Some(s"""WITH $sftTurnsCtes,
              |segs AS (
              |  SELECT conv_id, turn_idx, role, 0 AS part,
              |    '<|' || role || '|>' || chr(10) AS text FROM turns
              |  UNION ALL
              |  SELECT conv_id, turn_idx, role, 1,
              |    content || chr(10) || '<|end|>' || chr(10) FROM turns),
              |${bpeSweepCtesOver("conv_id, turn_idx, role, part", "segs")},
              |cnt AS (SELECT conv_id, turn_idx, role, part,
              |    sum(length(s) - length(replace(s, chr(2), ''))) AS n
              |  FROM merged GROUP BY 1, 2, 3, 4),
              |tt AS (SELECT conv_id, turn_idx, role,
              |    sum(CASE WHEN part = 0 THEN n ELSE 0 END) AS h,
              |    sum(n) AS n_tokens
              |  FROM cnt GROUP BY 1, 2, 3),
              |sp AS (SELECT conv_id, turn_idx, role, n_tokens, h,
              |    sum(n_tokens) OVER (PARTITION BY conv_id
              |      ORDER BY turn_idx) AS tok_end
              |  FROM tt),
              |tot AS (SELECT conv_id, max(tok_end) AS tot FROM sp GROUP BY 1),
              |off AS (SELECT conv_id,
              |    sum(tot) OVER (ORDER BY conv_id) - tot AS o FROM tot),
              |ls AS (SELECT s.conv_id, s.turn_idx,
              |    o.o + s.tok_end - s.n_tokens + s.h AS gs,
              |    o.o + s.tok_end AS ge
              |  FROM sp s JOIN off o USING (conv_id)
              |  WHERE s.role = 'assistant'
              |    AND s.tok_end - s.n_tokens + s.h < s.tok_end),
              |m AS (SELECT conv_id, turn_idx, gs, ge,
              |    unnest(generate_series(CAST(floor(gs / 64.0) AS BIGINT),
              |      CAST(floor((ge - 1) / 64.0) AS BIGINT))) AS seq_id
              |  FROM ls)
              |SELECT CAST(seq_id AS BIGINT) AS seq_id, conv_id, turn_idx,
              |  CAST(greatest(gs - seq_id * 64, 0) AS BIGINT)
              |    AS loss_start_in_seq,
              |  CAST(least(ge - seq_id * 64, 64) AS BIGINT)
              |    AS loss_end_in_seq
              |FROM m""".stripMargin)),

    // ---- DPO preference-pair prep ------------------------------------------
    // shared prompt + chosen/rejected completions → both rendered
    // sequences plus the trainer's token geometry (shared-prefix length,
    // loss start, per-side totals), all replayed through segment sweeps
    "q_pref_pairs" -> QueryDef(
      (s, dir) => {
        val pairs = docArm(s, dir, 0, "pair_id", "utext")
          .join(docArm(s, dir, 100, "pair_id", "chosen"), "pair_id")
          .join(docArm(s, dir, 200, "pair_id", "rejected"), "pair_id")
          .select(col("pair_id"), array(
            struct(lit("system").as("role"), lit(SftSystemPrompt).as("content")),
            struct(lit("user").as("role"), col("utext").as("content")))
            .as("prompt"),
            col("chosen"), col("rejected"))
        graft.trainprep.SftPrep.preferencePairPrep(
          pairs, "pair_id", "prompt", "chosen", "rejected",
          graft.functions.Bpe.tokenCount(_,
            graft.expressions.BpeMerges(oracleBpePairs)))
      },
      Some(s"""WITH base AS (
              |  SELECT u.doc_id AS pair_id,
              |    '<|system|>' || chr(10) || '$SftSystemPrompt' || chr(10)
              |      || '<|end|>' || chr(10) || '<|user|>' || chr(10)
              |      || u.text || chr(10) || '<|end|>' || chr(10) AS prompt,
              |    c.text AS chosen, r.text AS rejected
              |  FROM documents u
              |  JOIN documents c ON c.doc_id = u.doc_id + 100
              |  JOIN documents r ON r.doc_id = u.doc_id + 200
              |  WHERE u.doc_id < 100),
              |segs AS (
              |  SELECT pair_id, 0 AS part, prompt AS text FROM base
              |  UNION ALL SELECT pair_id, 1,
              |    '<|assistant|>' || chr(10) FROM base
              |  UNION ALL SELECT pair_id, 2,
              |    chosen || chr(10) || '<|end|>' || chr(10) FROM base
              |  UNION ALL SELECT pair_id, 3,
              |    rejected || chr(10) || '<|end|>' || chr(10) FROM base),
              |${bpeSweepCtesOver("pair_id, part", "segs")},
              |cnt AS (SELECT pair_id, part,
              |    sum(length(s) - length(replace(s, chr(2), ''))) AS n
              |  FROM merged GROUP BY 1, 2),
              |p AS (SELECT pair_id,
              |    sum(CASE WHEN part = 0 THEN n ELSE 0 END) AS c0,
              |    sum(CASE WHEN part = 1 THEN n ELSE 0 END) AS c1,
              |    sum(CASE WHEN part = 2 THEN n ELSE 0 END) AS c2,
              |    sum(CASE WHEN part = 3 THEN n ELSE 0 END) AS c3
              |  FROM cnt GROUP BY 1)
              |SELECT b.pair_id,
              |  b.prompt || '<|assistant|>' || chr(10) || b.chosen || chr(10)
              |    || '<|end|>' || chr(10) AS chosen_text,
              |  b.prompt || '<|assistant|>' || chr(10) || b.rejected || chr(10)
              |    || '<|end|>' || chr(10) AS rejected_text,
              |  CAST(p.c0 AS BIGINT) AS prompt_tokens,
              |  CAST(p.c0 + p.c1 AS BIGINT) AS loss_start,
              |  CAST(p.c0 + p.c1 + p.c2 AS BIGINT) AS chosen_tokens,
              |  CAST(p.c0 + p.c1 + p.c3 AS BIGINT) AS rejected_tokens
              |FROM base b JOIN p USING (pair_id)""".stripMargin)),

    // ---- C4 page cleanup gate (Raffel et al. 2020 §2.2) -------------------
    // The fixture text has no lines/punctuation, so pages are CONSTRUCTED
    // identically on both sides: kept lines (terminal punct, >=3 words),
    // dropped lines (no punct / too short / "javascript"), plus planted
    // page-level failures — doc_id%4==0 loses its second kept line (<5
    // sentences), %5==0 carries "lorem ipsum", %7==0 carries "{". The
    // line REWRITE (text_clean) is compared verbatim, not just verdicts.
    "q_c4_gate" -> QueryDef(
      (s, dir) => TextFunctions.c4Gate(
        t(s, dir, "documents").filter(col("doc_id") < 200)
          .select(col("doc_id"), PipelineQueries.c4FixturePage.as("text")),
        "doc_id", "text"),
      Some("""WITH base AS (SELECT doc_id,
             |    concat_ws(chr(10),
             |      substr(text, 1, 20) || '. ' || substr(text, 21, 20) || '. '
             |        || substr(text, 41, 20) || '.',
             |      substr(text, 31, 20),
             |      'use javascript today.',
             |      'a b.',
             |      CASE WHEN doc_id % 4 <> 0 THEN substr(text, 10, 20) || '! '
             |        || substr(text, 30, 20) || '!' END,
             |      CASE WHEN doc_id % 5 = 0 THEN 'and lorem ipsum text here.' END,
             |      CASE WHEN doc_id % 7 = 0 THEN 'config { block' END) AS t
             |  FROM documents WHERE doc_id < 200),
             |l AS (SELECT doc_id, i, trim(ts[i]) AS l
             |  FROM (SELECT doc_id, string_split(t, chr(10)) AS ts,
             |          unnest(generate_series(1, len(string_split(t, chr(10))))) AS i
             |        FROM base)),
             |kept AS (SELECT doc_id, i, l FROM l
             |  WHERE (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
             |    AND len(list_filter(string_split(l, ' '), w -> len(w) > 0)) >= 3
             |    AND NOT contains(lower(l), 'javascript')),
             |agg AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY i) AS text_clean,
             |    count(*) AS n_kept
             |  FROM kept GROUP BY 1),
             |page AS (SELECT b.doc_id,
             |    coalesce(a.text_clean, '') AS text_clean,
             |    CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_lines_kept,
             |    CAST(len(regexp_extract_all(coalesce(a.text_clean, ''), '[.!?]'))
             |      AS BIGINT) AS n_sentences,
             |    NOT contains(lower(b.t), 'lorem ipsum') AS r_lorem,
             |    NOT contains(b.t, '{') AS r_brace
             |  FROM base b LEFT JOIN agg a USING (doc_id))
             |SELECT doc_id, text_clean, n_lines_kept, n_sentences,
             |  n_sentences >= 5 AS r_sentences, r_lorem, r_brace,
             |  TRUE AS r_badwords,
             |  (n_sentences >= 5 AND r_lorem AND r_brace) AS pass
             |FROM page""".stripMargin)),

    // ---- encoding-damage metrics (mojibake / replacement / control) -------
    // Damage is PLANTED identically on both sides: %3==0 docs get U+FFFD
    // replacement chars, %5==0 a C0 control byte, %7==0 the Ã© digraph.
    "q_encoding_quality" -> QueryDef(
      (s, dir) => TextFunctions.encodingQualityMetrics(
        t(s, dir, "documents").filter(col("doc_id") < 400)
          .select(col("doc_id"), PipelineQueries.encodingFixtureText.as("text")),
        "doc_id", "text"),
      Some("""WITH base AS (SELECT doc_id, text ||
             |    CASE WHEN doc_id % 3 = 0 THEN
             |      CASE WHEN doc_id % 2 = 0 THEN chr(65533) || chr(65533)
             |        ELSE chr(65533) END ELSE '' END ||
             |    CASE WHEN doc_id % 5 = 0 THEN chr(7) ELSE '' END ||
             |    CASE WHEN doc_id % 7 = 0 THEN ' caf' || chr(195) || chr(169)
             |      ELSE '' END AS t
             |  FROM documents WHERE doc_id < 400),
             |m AS (SELECT doc_id,
             |    CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT)
             |      AS n_replacement,
             |    CAST(len(regexp_extract_all(t, '[\x00-\x08\x0b\x0c\x0e-\x1f]'))
             |      AS BIGINT) AS n_control,
             |    CAST(len(regexp_extract_all(t,
             |      '[' || chr(195) || chr(194) || '][\x{80}-\x{BF}]')) AS BIGINT)
             |      AS n_mojibake,
             |    length(t) AS chars
             |  FROM base)
             |SELECT doc_id, n_replacement, n_control, n_mojibake,
             |  CASE WHEN chars = 0 THEN 0.0
             |    ELSE round((n_replacement + n_control + n_mojibake * 2) * 1.0
             |      / chars, 6) END AS bad_char_ratio,
             |  (CASE WHEN chars = 0 THEN 0.0
             |    ELSE round((n_replacement + n_control + n_mojibake * 2) * 1.0
             |      / chars, 6) END) <= 0.001 AS clean
             |FROM m""".stripMargin)),

    // ---- MinHash-LSH S-curve (the banding design equation) ----------------
    // lshPlan(8, 0.8) must pick (b=2, r=4) — threshold (1/2)^(1/4)=0.841,
    // the closest factorization — and the collision probability replays as
    // pure arithmetic over a jaccard grid derived from doc ids.
    "q_lsh_scurve" -> QueryDef(
      (s, dir) => {
        val plan = Dedup.lshPlan(8, 0.8)
        require(plan == (2, 4), s"lshPlan(8, 0.8) must choose (2,4), got $plan")
        val j = round((col("doc_id") + 1) / 100.0, 6)
        t(s, dir, "documents").filter(col("doc_id") < 99).select(
          col("doc_id"), j.as("jaccard"),
          round(Dedup.lshCollisionProb(j, plan._1, plan._2), 6).as("p_planned"),
          round(Dedup.lshCollisionProb(j, 4, 2), 6).as("p_b4_r2"),
          round(Dedup.lshCollisionProb(j, 8, 1), 6).as("p_b8_r1"))
      },
      Some("""SELECT doc_id,
             |  round((doc_id + 1) / 100.0, 6) AS jaccard,
             |  round(1 - pow(1 - pow(round((doc_id + 1) / 100.0, 6), 4), 2), 6)
             |    AS p_planned,
             |  round(1 - pow(1 - pow(round((doc_id + 1) / 100.0, 6), 2), 4), 6)
             |    AS p_b4_r2,
             |  round(1 - pow(1 - pow(round((doc_id + 1) / 100.0, 6), 1), 8), 6)
             |    AS p_b8_r1
             |FROM documents WHERE doc_id < 99""".stripMargin)),

    // ---- per-doc contamination fraction (GPT-3 appendix-C reporting) ------
    "q_contam_frac" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents")
        graft.trainprep.TrainPrep.contaminationFraction(
          d.filter(col("doc_id") >= 100 && col("doc_id") < 300), "doc_id", "text",
          d.filter(col("doc_id") < 5), "doc_id", "text", n = 5)
      },
      Some("""WITH tr AS (SELECT DISTINCT doc_id,
             |    array_to_string(ts[i : i + 4], ' ') AS shingle
             |  FROM (SELECT doc_id, ts, unnest(generate_series(1, len(ts) - 4)) AS i
             |        FROM (SELECT doc_id, string_split(text, ' ') AS ts
             |              FROM documents WHERE doc_id >= 100 AND doc_id < 300)
             |        WHERE len(ts) >= 5)),
             |bs AS (SELECT DISTINCT array_to_string(ts[i : i + 4], ' ') AS shingle
             |  FROM (SELECT ts, unnest(generate_series(1, len(ts) - 4)) AS i
             |        FROM (SELECT string_split(text, ' ') AS ts
             |              FROM documents WHERE doc_id < 5)
             |        WHERE len(ts) >= 5)),
             |per AS (SELECT tr.doc_id, count(*) AS n_shingles,
             |    sum(CASE WHEN bs.shingle IS NOT NULL THEN 1 ELSE 0 END)
             |      AS n_contaminated
             |  FROM tr LEFT JOIN bs USING (shingle) GROUP BY 1)
             |SELECT d.doc_id,
             |  CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
             |  CAST(coalesce(per.n_contaminated, 0) AS BIGINT) AS n_contaminated,
             |  round(coalesce(per.n_contaminated * 1.0 / per.n_shingles, 0.0), 6)
             |    AS contaminated_frac
             |FROM (SELECT doc_id FROM documents
             |      WHERE doc_id >= 100 AND doc_id < 300) d
             |LEFT JOIN per USING (doc_id)""".stripMargin)),

    // ---- text analysis: language-ID heuristic ------------------------------
    "q_text_langid" -> QueryDef(
      (s, dir) => {
        t(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.wordSetHits(col("text"), TextFunctions.StopwordsEn).as("en_hits"),
          TextFunctions.langIdHeuristic(col("text")).as("pred_lang"))
      },
      Some(s"""SELECT doc_id,
              |  len(list_filter(string_split(text, ' '),
              |      w -> w IN ('the','a','of','and','to','is','in'))) AS en_hits,
              |  CASE
              |    WHEN greatest(
              |      len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','is','in'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','nicht'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est','dans'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('el','la','los','y','es','en')))) = 0
              |      THEN 'und'
              |    WHEN len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','is','in'))) = greatest(
              |      len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','is','in'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','nicht'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est','dans'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('el','la','los','y','es','en')))) THEN 'en'
              |    WHEN len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','nicht'))) = greatest(
              |      len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','is','in'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','nicht'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est','dans'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('el','la','los','y','es','en')))) THEN 'de'
              |    WHEN len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est','dans'))) = greatest(
              |      len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','to','is','in'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist','nicht'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est','dans'))),
              |      len(list_filter(string_split(text,' '), w -> w IN ('el','la','los','y','es','en')))) THEN 'fr'
              |    ELSE 'es' END AS pred_lang
              |FROM documents""".stripMargin)),

    // ---- TRAINED language ID: one-vs-rest logistic heads, one pass --------
    // The scoring path of LangIdClassifier (training is spec-gated in
    // LangIdSpec, like trainLogReg / the k-means codebooks): four heads'
    // margins in ONE (doc, bucket) aggregate, argmax with the head-order
    // tiebreak. Weights are a fixed function of (bucket, head offset) so
    // both engines derive them — the q_quality_lr portability contract.
    "q_text_langid_lr" -> QueryDef(
      (s, dir) => {
        val heads = Seq("en", "de", "fr", "es").zipWithIndex.map {
          case (lang, k) => graft.trainprep.LangIdClassifier.Head(lang,
            Array.tabulate(256)(b =>
              ((b * 96769 + k * 777) % 2000) / 1000.0 - 1.0).toSeq, 0.0)
        }
        graft.trainprep.LangIdClassifier.scoreArgmax(
          t(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", heads)
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
             |  FROM documents WHERE doc_id < 300),
             |b AS (SELECT doc_id,
             |    ('0x' || substr(md5(t), 1, 8))::BIGINT % 256 AS b
             |  FROM tok WHERE len(t) > 0),
             |z AS (SELECT doc_id,
             |    sum(((b * 96769) % 2000) / 1000.0 - 1.0) AS z_en,
             |    sum(((b * 96769 + 777) % 2000) / 1000.0 - 1.0) AS z_de,
             |    sum(((b * 96769 + 1554) % 2000) / 1000.0 - 1.0) AS z_fr,
             |    sum(((b * 96769 + 2331) % 2000) / 1000.0 - 1.0) AS z_es
             |  FROM b GROUP BY doc_id),
             |s AS (SELECT d.doc_id,
             |    round(1.0 / (1.0 + exp(-coalesce(z_en, 0.0))), 5) AS score_en,
             |    round(1.0 / (1.0 + exp(-coalesce(z_de, 0.0))), 5) AS score_de,
             |    round(1.0 / (1.0 + exp(-coalesce(z_fr, 0.0))), 5) AS score_fr,
             |    round(1.0 / (1.0 + exp(-coalesce(z_es, 0.0))), 5) AS score_es
             |  FROM (SELECT doc_id FROM documents WHERE doc_id < 300) d
             |  LEFT JOIN z USING (doc_id))
             |SELECT doc_id, score_en, score_de, score_fr, score_es,
             |  CASE
             |    WHEN score_en = greatest(score_en, score_de, score_fr, score_es)
             |      THEN 'en'
             |    WHEN score_de = greatest(score_en, score_de, score_fr, score_es)
             |      THEN 'de'
             |    WHEN score_fr = greatest(score_en, score_de, score_fr, score_es)
             |      THEN 'fr'
             |    ELSE 'es' END AS pred_lang
             |FROM s""".stripMargin)),

    // ---- text analysis: Gopher-rule composite gate -------------------------
    // The standard pre-training document filter (Rae et al. 2021 A1.1) as
    // one zero-shuffle select: measured values + one boolean per rule +
    // the AND verdict, all cross-engine-exact (6-place rounding, explicit
    // 0.0 on empty docs)
    // minStopwordHits=1 here (paper default 2): the synthetic vocab carries
    // only "the" from the Gopher stop set, so 2 would fail every doc and
    // the verdict column would stop discriminating
    "q_text_gopher" -> QueryDef(
      (s, dir) => TextFunctions.gopherGate(
        t(s, dir, "documents"), "doc_id", "text", minStopwordHits = 1L),
      Some("""WITH base AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), w -> len(w) > 0) AS words,
             |    string_split(text, chr(10)) AS lines, text
             |  FROM documents),
             |m AS (SELECT doc_id,
             |  len(words)::BIGINT AS n_words,
             |  CASE WHEN len(words) = 0 THEN 0.0 ELSE round(
             |    list_sum(list_transform(words, w -> len(w)))::DOUBLE / len(words), 6)
             |    END AS mean_word_len,
             |  CASE WHEN len(words) = 0 THEN 0.0 ELSE round(
             |    ((len(text) - len(replace(text, '#', ''))) +
             |     (len(text) - len(replace(text, '...', ''))) / 3)::DOUBLE
             |    / len(words), 6) END AS symbol_ratio,
             |  round(len(list_filter(lines, l -> starts_with(l, '- ')
             |      OR starts_with(l, '* ') OR starts_with(l, '•')))::DOUBLE
             |    / len(lines), 6) AS bullet_frac,
             |  round(len(list_filter(lines, l -> ends_with(l, '...')
             |      OR ends_with(l, '…')))::DOUBLE / len(lines), 6) AS ellipsis_frac,
             |  CASE WHEN len(words) = 0 THEN 0.0 ELSE round(
             |    len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
             |    / len(words), 6) END AS alpha_frac,
             |  len(list_filter(['the','be','to','of','and','that','have','with'],
             |    s -> list_contains(words, s)))::BIGINT AS stop_hits
             |  FROM base)
             |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
             |  ellipsis_frac, alpha_frac, stop_hits,
             |  (n_words BETWEEN 50 AND 100000) AS r_words,
             |  (mean_word_len BETWEEN 3.0 AND 10.0) AS r_word_len,
             |  (symbol_ratio <= 0.1) AS r_symbol,
             |  (bullet_frac <= 0.9) AS r_bullet,
             |  (ellipsis_frac <= 0.3) AS r_ellipsis,
             |  (alpha_frac >= 0.8) AS r_alpha,
             |  (stop_hits >= 1) AS r_stop,
             |  (n_words BETWEEN 50 AND 100000
             |   AND mean_word_len BETWEEN 3.0 AND 10.0 AND symbol_ratio <= 0.1
             |   AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3
             |   AND alpha_frac >= 0.8 AND stop_hits >= 1) AS pass
             |FROM m""".stripMargin)),

    // ---- text analysis: winnowing fingerprints -----------------------------
    // MOSS-scheme positional fingerprints (Schleimer et al. SIGMOD'03):
    // k=8-char grams, w=4 window minima, distinct selected set. md5 hashes
    // so DuckDB replays the SELECTION (window minima depend on hash
    // values) bit for bit; production uses the winnow_hashes codegen
    // expression (WinnowSpec pins value-set equality)
    "q_text_winnow" -> QueryDef(
      (s, dir) => {
        val fp = TextFunctions.winnowFingerprints(col("text"), 8, 4)
        t(s, dir, "documents").select(col("doc_id"),
          size(fp).cast("long").as("n_fp"),
          array_join(fp, ",").as("fp_csv"))
      },
      Some("""WITH h AS (SELECT doc_id,
             |  CASE WHEN length(text) >= 8 THEN
             |    list_transform(range(1, length(text) - 6),
             |      i -> md5(substr(text, i, 8)))
             |  ELSE NULL END AS hs FROM documents),
             |sel AS (SELECT doc_id,
             |  CASE WHEN hs IS NULL THEN NULL
             |    WHEN len(hs) <= 4 THEN [list_aggregate(hs, 'min')]
             |    ELSE list_sort(list_distinct(list_transform(
             |      range(1, len(hs) - 2),
             |      i -> list_aggregate(hs[i:i+3], 'min')))) END AS fp
             |  FROM h)
             |SELECT doc_id, len(fp)::BIGINT AS n_fp,
             |  array_to_string(fp, ',') AS fp_csv
             |FROM sel""".stripMargin)),

    // ---- text analysis: quality scoring ------------------------------------
    "q_text_quality" -> QueryDef(
      (s, dir) => {
        t(s, dir, "documents").select(
          col("doc_id"), round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
      },
      Some("""SELECT doc_id, round(
             |  CASE WHEN length(text) = 0 THEN 0.0 ELSE
             |  (CASE WHEN (length(text)::DOUBLE - (n_tok - 1)) / n_tok BETWEEN 3.0 AND 10.0
             |     THEN 1.0 ELSE 0.5 END) * 0.4
             |  + least(stop_hits / n_tok * 5.0, 1.0) * 0.4
             |  + (CASE WHEN punct / length(text)::DOUBLE <= 0.1 THEN 1.0 ELSE 0.5 END) * 0.2
             |  END, 6) AS quality
             |FROM (SELECT doc_id, text,
             |  (CASE WHEN length(text) = 0 THEN 0
             |    ELSE length(text) - length(replace(text, ' ', '')) + 1 END)::DOUBLE AS n_tok,
             |  len(list_filter(string_split(text, ' '),
             |      w -> w IN ('the','a','of','and','to','is','in')))::DOUBLE AS stop_hits,
             |  (length(text) - length(replace(replace(replace(replace(replace(text,
             |      '.',''), ',',''), '!',''), '?',''), ';','')))::DOUBLE AS punct
             |  FROM documents)""".stripMargin)),

    // ---- text analysis: document fingerprints ------------------------------
    "q_text_fingerprint" -> QueryDef(
      (s, dir) => {
        t(s, dir, "documents").filter(col("doc_id") < 200).select(
          col("doc_id"),
          TextFunctions.fingerprint(col("text")).as("fp"),
          TextFunctions.minShingleFingerprint(col("text"), 5).as("min_shingle_fp"))
      },
      Some("""SELECT doc_id, sha256(lower(text)) AS fp,
             |  list_min(list_transform(generate_series(1, greatest(length(text) - 4, 1)),
             |    i -> md5(substr(text, i, 5)))) AS min_shingle_fp
             |FROM documents WHERE doc_id < 200""".stripMargin)),

    // ---- multimodal: binary columns + typed metadata + stub decode ---------
    "q_mm_decode" -> QueryDef(
      (s, dir) => {
        val media = Multimodal.syntheticMedia(t(s, dir, "documents"), "doc_id", "text")
        media.select(col("media_id"), col("kind"),
            Multimodal.decodeStub(col("bytes")).as("m"))
          .select(col("media_id"), col("kind"),
            col("m.width").as("width"), col("m.height").as("height"),
            col("m.duration_s").as("duration_s"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CASE WHEN doc_id % 3 = 0 THEN 'image'
             |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
             |  length(text) % 640 + 1 AS width,
             |  (length(text) * 7) % 480 + 1 AS height,
             |  length(text) / 100.0 AS duration_s
             |FROM documents""".stripMargin)),

    // ---- multimodal: REAL codec round trip ---------------------------------
    // Synthesize one actual PNG per doc (dims a pure function of doc_id),
    // decode it back through the JDK ImageIO path. The oracle predicts the
    // decoded header arithmetically — certifying the real encode→decode
    // machinery, not a stub.
    "q_mm_real_decode" -> QueryDef(
      (s, dir) => {
        val imgs = Multimodal.synthesizeImages(
          t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id")
        Multimodal.decodeImageBatch(imgs)
          .select(col("media_id"), col("width"), col("height"), col("format"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(doc_id % 31 + 1 AS INT) AS width,
             |  CAST(doc_id % 17 + 1 AS INT) AS height,
             |  'png' AS format
             |FROM documents WHERE doc_id < 300""".stripMargin)),

    // ---- multimodal: REAL perceptual dHash, exact arithmetic oracle --------
    // Full pixel decode + 9×8 integer-luminance difference hash of each
    // synthesized gradient PNG. Every step is integer-exact (BT.601
    // fixed-point luminance, cross-multiplied cell averages), so the
    // oracle replays the whole downsample+gradient pipeline in SQL and
    // predicts all 64 bits — certifying the real decode→hash machinery,
    // not a stub. Output as an MSB-first bit string: bit 63 would
    // overflow a signed SQL shift.
    "q_mm_dhash" -> QueryDef(
      (s, dir) => {
        val imgs = Multimodal.synthesizeImages(
          t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id")
        Multimodal.imageAHashes(imgs, "media_id", "bytes",
            Multimodal.imageDHash64)
          .select(col("id").as("media_id"),
            lpad(bin(col("ahash")), 64, "0").as("dhash_bits"))
      },
      Some("""WITH d AS (SELECT doc_id AS media_id,
             |    CAST(doc_id % 31 + 1 AS BIGINT) AS w,
             |    CAST(doc_id % 17 + 1 AS BIGINT) AS h
             |  FROM documents WHERE doc_id < 300),
             |xs AS (SELECT unnest(generate_series(0, 30)) AS x),
             |ys AS (SELECT unnest(generate_series(0, 16)) AS y),
             |px AS (SELECT media_id, w, h, x, y,
             |    (x * 255 // greatest(w - 1, 1)
             |     + y * 255 // greatest(h - 1, 1)) // 2 AS v
             |  FROM d CROSS JOIN xs CROSS JOIN ys
             |  WHERE x < w AND y < h),
             |cells AS (SELECT media_id,
             |    least(y * 8 // h, 7) AS cy, least(x * 9 // w, 8) AS cx,
             |    sum(1000 * v) AS s, count(*) AS n
             |  FROM px GROUP BY 1, 2, 3),
             |rs AS (SELECT unnest(generate_series(0, 7)) AS r),
             |cs AS (SELECT unnest(generate_series(0, 7)) AS c),
             |bits AS (SELECT d.media_id AS media_id, r, c,
             |    CASE WHEN coalesce(a.n, 0) > 0 AND coalesce(b.n, 0) > 0
             |          AND a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS bit
             |  FROM d CROSS JOIN rs CROSS JOIN cs
             |  LEFT JOIN cells a ON a.media_id = d.media_id AND a.cy = r AND a.cx = c
             |  LEFT JOIN cells b ON b.media_id = d.media_id AND b.cy = r AND b.cx = c + 1)
             |SELECT media_id,
             |  string_agg(CAST(bit AS VARCHAR), '' ORDER BY r DESC, c DESC) AS dhash_bits
             |FROM bits GROUP BY media_id""".stripMargin)),

    // ---- multimodal: REAL audio codec round trip ---------------------------
    // Same pattern for audio: one actual RIFF/WAVE payload per doc, decoded
    // back through javax.sound.sampled; header fields predicted
    // arithmetically by the oracle. duration = frames/rate in IEEE double
    // on both engines.
    "q_mm_real_audio" -> QueryDef(
      (s, dir) => {
        val wavs = Multimodal.synthesizeWavs(
          t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id")
        Multimodal.decodeAudioBatch(wavs)
          .select(col("media_id"), col("sample_rate_hz"), col("channels"),
            col("frames"), round(col("duration_s"), 6).as("duration_s"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(8000 + (doc_id % 8) * 1000 AS INT) AS sample_rate_hz,
             |  CAST(1 + doc_id % 2 AS INT) AS channels,
             |  CAST(doc_id % 100 + 1 AS BIGINT) AS frames,
             |  round(CAST(doc_id % 100 + 1 AS DOUBLE)
             |    / (8000 + (doc_id % 8) * 1000), 6) AS duration_s
             |FROM documents WHERE doc_id < 300""".stripMargin)),

    // ---- multimodal: perceptual audio fingerprint round trip ---------------
    // Triangle-wave WAVs (every decoded sample an INTEGER function of
    // (id, i)) through the REAL decode → 64-window energy aHash: the
    // window bits replay in SQL exactly — mean-|amplitude| comparisons are
    // integer cross-multiplications, the sign bit wraps two's-complement
    "q_mm_audio_hash" -> QueryDef(
      (s, dir) => {
        val wavs = Multimodal.synthesizeTriangleWavs(
          t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id")
        Multimodal.audioAHashes(wavs, "media_id", "bytes")
          .select(col("id").as("media_id"), col("ahash"))
      },
      Some("""WITH ids AS (SELECT doc_id AS media_id,
             |    200 + doc_id % 200 AS n
             |  FROM documents WHERE doc_id < 300),
             |s AS (SELECT media_id, n, i,
             |    abs(((i * 37 + media_id * 13) % 8000) - 4000)::BIGINT AS a,
             |    ((i * 64) // n)::INT AS w
             |  FROM (SELECT media_id, n, unnest(range(0, n)) AS i FROM ids)),
             |win AS (SELECT media_id, w, sum(a) AS sw, count(*) AS cw
             |  FROM s GROUP BY 1, 2),
             |tot AS (SELECT media_id, sum(a) AS ta, count(*) AS n
             |  FROM s GROUP BY 1),
             |bits AS (SELECT win.media_id,
             |    sum((1::HUGEINT << win.w)) AS h
             |  FROM win JOIN tot USING (media_id)
             |  WHERE win.sw * tot.n > tot.ta * win.cw
             |  GROUP BY 1)
             |SELECT ids.media_id,
             |  (CASE WHEN coalesce(bits.h, 0) >= 9223372036854775808::HUGEINT
             |     THEN coalesce(bits.h, 0) - 18446744073709551616::HUGEINT
             |     ELSE coalesce(bits.h, 0) END)::BIGINT AS ahash
             |FROM ids LEFT JOIN bits USING (media_id)""".stripMargin)),

    // ---- multimodal: REAL video container-header round trip ----------------
    // The JDK has no video codec, but duration/dimensions live in the
    // container HEADER — pure byte arithmetic. Even ids synthesize an MP4
    // (moov/mvhd/tkhd), odd ids an AVI (RIFF hdrl/avih); both decode back
    // through decodeVideo. Timescale/frame-period are 1/16 s, so duration
    // is an EXACT double and the oracle predicts every field bit-for-bit.
    "q_mm_real_video" -> QueryDef(
      (s, dir) => {
        val vids = Multimodal.synthesizeVideos(
          t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id")
        Multimodal.decodeVideoBatch(vids)
          .select(col("media_id"), col("width"), col("height"),
            col("duration_s"), col("format"))
      },
      Some("""SELECT doc_id AS media_id,
             |  CAST(doc_id % 64 + 16 AS INT) AS width,
             |  CAST(doc_id % 48 + 16 AS INT) AS height,
             |  CAST(doc_id % 500 + 1 AS DOUBLE) / 16 AS duration_s,
             |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS format
             |FROM documents WHERE doc_id < 300""".stripMargin)),

    // ---- multimodal: REAL video frame decode (MJPEG-in-AVI) ----------------
    // Every sampled frame is a genuine JPEG pulled out of the AVI `movi`
    // list and decoded by the JDK codec; the oracle predicts frame count,
    // sampling pattern, dimensions, AND that the decoded mean gray lands
    // within the JPEG round-trip tolerance of the synthesized level — a
    // fake decode cannot fake gray_ok.
    "q_mm_frames" -> QueryDef(
      (s, dir) => {
        val vids = Multimodal.synthesizeMjpegAvis(
          t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id")
        Multimodal.decodeAviFramesBatch(vids, "bytes", everyN = 2)
          .withColumn("gray_ok",
            abs(col("mean_gray") -
              pmod(col("media_id") * 7 + col("frame_idx") * 13, lit(240))
                .cast("double")) <= lit(3.0))
          .select(col("media_id"), col("frame_idx"), col("frame_w"),
            col("frame_h"), col("gray_ok"))
      },
      Some("""SELECT doc_id AS media_id, CAST(i AS INT) AS frame_idx,
             |  CAST(doc_id % 64 + 16 AS INT) AS frame_w,
             |  CAST(doc_id % 48 + 16 AS INT) AS frame_h,
             |  true AS gray_ok
             |FROM (SELECT doc_id, unnest(range(0, doc_id % 7 + 2)) AS i
             |      FROM documents WHERE doc_id < 300)
             |WHERE i % 2 = 0""".stripMargin)),

    // ---- multimodal: fixed-width frame sampling over opaque binaries -------
    // The codegen'd no-decode slicing path (binary substr, no UDF) for
    // essence the JDK cannot decode — kept alongside the real MJPEG path.
    "q_mm_byte_slices" -> QueryDef(
      (s, dir) => {
        val media = Multimodal.syntheticMedia(t(s, dir, "documents"), "doc_id", "text")
        Multimodal.sampleFrames(media, "bytes", frameBytes = 64, everyN = 2)
          .groupBy("media_id")
          .agg(count(lit(1)).as("n_sampled"),
            sum(length(col("frame"))).as("sampled_bytes"))
      },
      // nf = ceil(len/64); sampled idx 0,2,..; odd nf ends on the partial tail
      Some("""SELECT doc_id AS media_id,
             |  ((length(text) + 63) // 64 - 1) // 2 + 1 AS n_sampled,
             |  64 * (((length(text) + 63) // 64 - 1) // 2)
             |    + (CASE WHEN ((length(text) + 63) // 64) % 2 = 1
             |        THEN length(text) - (((length(text) + 63) // 64) - 1) * 64
             |        ELSE 64 END) AS sampled_bytes
             |FROM documents""".stripMargin)),

    // ---- multimodal: feature extraction, exact integer-lattice oracle ------
    // The raw array<float> column crashes the driver's pandas sort, so the
    // judged projection is the integer lattice the floats are built from
    // (features = lattice / 1000 cast float — tied together in
    // MultimodalSpec) joined to a csv string plus a per-row element sum.
    "q_mm_features" -> QueryDef(
      (s, dir) => {
        val media = Multimodal.syntheticMedia(
          t(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text")
        val lat = Multimodal.featureLattice(col("bytes"), 16)
        media.select(col("media_id"),
          array_join(transform(lat, _.cast("string")), ",").as("features_csv"),
          aggregate(lat, lit(0), (acc, v) => acc + v).cast("long").as("features_sum"))
      },
      Some("""WITH lat AS (
             |  SELECT doc_id AS media_id,
             |    list_transform(generate_series(0, 15), i ->
             |      (ascii(substr(md5(text || '#' || CAST(i AS VARCHAR)), 1, 1)) * 17
             |       + ascii(substr(md5(text || '#' || CAST(i AS VARCHAR)), 2, 1)) * 7
             |       + ascii(substr(md5(text || '#' || CAST(i AS VARCHAR)), 3, 1))) % 1000) AS l
             |  FROM documents WHERE doc_id < 100)
             |SELECT media_id,
             |  array_to_string(list_transform(l, v -> CAST(v AS VARCHAR)), ',') AS features_csv,
             |  CAST(list_sum(l) AS BIGINT) AS features_sum
             |FROM lat""".stripMargin)),

    // ---- change data feed of a corpus upsert (E172) ------------------------
    // The row-image feed a merge emits (Delta CDF shape): corpus = docs with
    // id % 7 != 0, update batch = docs with id % 3 == 0 re-crawled with new
    // text — ids in both become an update (pre + post image), batch ids new
    // to the corpus (multiples of 21, which %7 excluded) become inserts.
    // LakeMerge.changeFeed is a PURE function of the two frames, so the
    // oracle replays it with two IN-subqueries; the lake-side capture
    // (merge(captureChanges = true) → _changes/seq=N) writes exactly this
    // frame — LakeCdfSpec pins written == pure and the replay soundness.
    "q_lake_changes" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "source", "text")
        val cur = d.filter(col("doc_id") % 7 =!= 0)
        val upd = d.filter(col("doc_id") % 3 === 0)
          .withColumn("text", concat(lit("v2:"), substring(col("text"), 1, 40)))
        graft.io.LakeMerge.changeFeed(Some(cur), upd, Seq("doc_id"))
          .withColumnRenamed(graft.io.LakeMerge.ChangeTypeCol, "change_type")
      },
      Some("""WITH cur AS (
             |  SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0),
             |upd AS (
             |  SELECT doc_id, source, 'v2:' || substr(text, 1, 40) AS text
             |  FROM documents WHERE doc_id % 3 = 0)
             |SELECT c.doc_id, c.source, c.text, 'update_preimage' AS change_type
             |  FROM cur c WHERE c.doc_id IN (SELECT doc_id FROM upd)
             |UNION ALL
             |SELECT u.doc_id, u.source, u.text, 'update_postimage' AS change_type
             |  FROM upd u WHERE u.doc_id IN (SELECT doc_id FROM cur)
             |UNION ALL
             |SELECT u.doc_id, u.source, u.text, 'insert' AS change_type
             |  FROM upd u WHERE u.doc_id NOT IN (SELECT doc_id FROM cur)""".stripMargin)),

    // ---- keyed delete of a corpus (E174) ------------------------------------
    // The GDPR/takedown purge as a pure frame function: corpus = docs with
    // id % 7 != 0, purge set = ids % 5 == 0. Output = the delete-typed feed
    // rows (full pre-images — LakeMerge.deleteFeed, what a
    // delete(captureChanges = true) publishes at _changes/seq=N) plus the
    // surviving rows tagged 'kept' (what the post-delete lake holds — the
    // broadcast anti-join the partition rewrite runs). LakeDeleteSpec pins
    // the lake side effects (partition rewrite, empty-partition drop, crash
    // recovery, time travel) against these same semantics.
    "q_lake_delete" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "source", "text")
        val cur = d.filter(col("doc_id") % 7 =!= 0)
        val keys = d.filter(col("doc_id") % 5 === 0).select("doc_id")
        val feed = graft.io.LakeMerge.deleteFeed(cur, keys, Seq("doc_id"))
          .withColumnRenamed(graft.io.LakeMerge.ChangeTypeCol, "change_type")
        val kept = cur.join(broadcast(keys), Seq("doc_id"), "left_anti")
          .withColumn("change_type", lit("kept"))
        feed.unionByName(kept)
      },
      Some("""WITH cur AS (
             |  SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0),
             |ks AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0)
             |SELECT doc_id, source, text, 'delete' AS change_type
             |  FROM cur WHERE doc_id IN (SELECT doc_id FROM ks)
             |UNION ALL
             |SELECT doc_id, source, text, 'kept' AS change_type
             |  FROM cur WHERE doc_id NOT IN (SELECT doc_id FROM ks)""".stripMargin)),

    // ---- incremental aggregate maintenance from the change feed (E175) -----
    // Classic IVM over additive aggregates: the per-source (count, char-sum)
    // card numbers maintained through TWO feed commits — a re-crawl merge
    // (insert/pre/post images) then a purge (delete images) — must equal the
    // direct recompute over the final corpus. The oracle computes the direct
    // side; the Spark side never touches the final corpus, only snapshot-0
    // plus the two pure feeds, so equality IS the maintenance proof.
    "q_agg_maintain" -> QueryDef(
      (s, dir) => {
        val d = t(s, dir, "documents").select("doc_id", "source", "text")
        val cur = d.filter(col("doc_id") % 7 =!= 0)
        val upd = d.filter(col("doc_id") % 3 === 0)
          .withColumn("text", concat(lit("v2:"), substring(col("text"), 1, 40)))
        val merged = cur.join(upd, Seq("doc_id"), "left_anti").unionByName(upd)
        val delKeys = d.filter(col("doc_id") % 5 === 0).select("doc_id")
        val measures = Seq("chars" -> length(col("text")))
        val agg0 = graft.io.FeedMaintain.snapshotAgg(cur, Seq("source"), measures)
        val afterMerge = graft.io.FeedMaintain.maintain(agg0,
          graft.io.LakeMerge.changeFeed(Some(cur), upd, Seq("doc_id")),
          Seq("source"), measures)
        graft.io.FeedMaintain.maintain(afterMerge,
          graft.io.LakeMerge.deleteFeed(merged, delKeys, Seq("doc_id")),
          Seq("source"), measures)
      },
      Some("""WITH cur AS (
             |  SELECT doc_id, source, text FROM documents WHERE doc_id % 7 <> 0),
             |upd AS (
             |  SELECT doc_id, source, 'v2:' || substr(text, 1, 40) AS text
             |  FROM documents WHERE doc_id % 3 = 0),
             |merged AS (
             |  SELECT * FROM cur WHERE doc_id NOT IN (SELECT doc_id FROM upd)
             |  UNION ALL SELECT * FROM upd),
             |final AS (
             |  SELECT * FROM merged
             |  WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 5 = 0))
             |SELECT source, COUNT(*) AS n_rows,
             |  CAST(SUM(length(text)) AS BIGINT) AS chars
             |FROM final GROUP BY source""".stripMargin)),

    // ---- CDF-maintained exact-dedup keepers (round 16, E175's dedup
    // consumer): the keeper table maintained through a merge feed (text
    // rewrites move docs between digests) and a delete feed that kills
    // KEEPERS whose duplicate twins survive (the retraction-re-election
    // case: min folds forward, the member list makes it retractable) —
    // the oracle is the FULL RECOMPUTE over the final corpus, which is
    // exactly what the maintained table must always equal ---------------
    "q_dedup_maintain" -> QueryDef(
      (s, dir) => {
        val base = docsWithDups(s, dir).select("doc_id", "text")
        val cur = base.filter(col("doc_id") % 7 =!= 0)
        val upd = base.filter(col("doc_id") % 3 === 0)
          .withColumn("text", concat(lit("v2:"), substring(col("text"), 1, 40)))
        val merged = cur.join(upd, Seq("doc_id"), "left_anti").unionByName(upd)
        // originals only: each %5 keeper's +100000 twin SURVIVES and must
        // re-elect as its digest's keeper
        val delKeys = base.filter(col("doc_id") % 5 === 0 &&
          col("doc_id") < 100000L).select("doc_id")
        val state0 = Dedup.keeperState(cur, "doc_id", "text")
        val s1 = Dedup.maintainKeepers(state0,
          graft.io.LakeMerge.changeFeed(Some(cur), upd, Seq("doc_id")),
          "doc_id", "text")
        val s2 = Dedup.maintainKeepers(s1,
          graft.io.LakeMerge.deleteFeed(merged, delKeys, Seq("doc_id")),
          "doc_id", "text")
        Dedup.keepersOf(s2)
      },
      Some(s"""WITH base AS (
             |  SELECT doc_id, text FROM $dupUnionSql),
             |cur AS (SELECT * FROM base WHERE doc_id % 7 <> 0),
             |upd AS (SELECT doc_id, 'v2:' || substr(text, 1, 40) AS text
             |  FROM base WHERE doc_id % 3 = 0),
             |merged AS (
             |  SELECT * FROM cur WHERE doc_id NOT IN (SELECT doc_id FROM upd)
             |  UNION ALL SELECT * FROM upd),
             |final AS (SELECT * FROM merged
             |  WHERE NOT (doc_id % 5 = 0 AND doc_id < 100000))
             |SELECT coalesce(sha256(text), '__null__' || doc_id) AS text_hash,
             |  min(doc_id) AS keeper_id, count(*) AS n_dups
             |FROM final GROUP BY 1""".stripMargin))
  )
}
