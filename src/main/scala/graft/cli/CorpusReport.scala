package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.trainprep.TrainPrep

/** Dataset-card generator — the one-command REPORTING complement of
  * CorpusPrep (which transforms): everything a training run publishes
  * about a corpus, computed once and written as parquet sections plus a
  * one-line JSON summary.
  *
  *   - `slices/`    per-`--group-col` composition (E100 corpusReport:
  *                  docs, EXACT duplicate rate, token/char sums)
  *   - `seq_len/`   sequence-length histogram + padding waste at
  *                  `--context` (E111; `--token-counter bpe` swaps in
  *                  real BPE counts, E101)
  *   - `clusters/`  exact-duplicate cluster-size histogram (E107 over
  *                  E1's digest groups)
  *   - summary      corpus-level gate pass rates — Gopher (E29), C4
  *                  (E103), Gopher-repetition (E99), encoding triage
  *                  (E104) — plus doc/token/distinct-text totals
  *
  * Scale shape: every section is one aggregate over a map pass (the gate
  * rates are conditional sums fused into ONE shared scan — the gates are
  * per-row predicates except the repetition gate, whose id-keyed
  * aggregate pipeline is the priced exception); nothing here is pairwise
  * and nothing collects beyond the bucket/slice-sized section tables.
  *
  *   - `embedding_drift/` (with `--embedding-lake <lake>`) per-cell
  *                  drift of an IVF-partitioned embedding lake — the
  *                  EMBEDDING-health half of the card (codebook from the
  *                  lake's `_codebook/`); add `--lake-baseline
  *                  <driftReport.parquet>` for the per-cell
  *                  retrain/compact verdict, summarized as
  *                  `lake_retrain_cells`
  *
  *   - `integrity/` (with `--integrity <groups>`) the tamper-evident
  *                  [[graft.io.IntegrityManifest]], its root published
  *                  in the card JSON (`integrity_root`); add
  *                  `--integrity-baseline <manifest.parquet>` for
  *                  `integrity_diff/` + per-verdict counts against a
  *                  prior published manifest
  *
  * `runMain graft.cli.CorpusReport --in <docs.parquet> --out <dir>
  *   [--group-col source] [--context 4096] [--token-counter bpe]
  *   [--embedding-lake <lake> [--embedding-col embedding]
  *    [--lake-baseline <driftReport.parquet>]]
  *   [--integrity <groups> [--integrity-baseline <manifest.parquet>]]`
  */
object CorpusReport {

  def run(spark: SparkSession, args: Map[String, String]): Map[String, Long] = {
    val in = args("in")
    val out = args("out")
    val idCol = args.getOrElse("id-col", "doc_id")
    val textCol = args.getOrElse("text-col", "text")
    val groupCol = args.getOrElse("group-col", "source")
    val context = args.getOrElse("context", "4096").toInt
    // a baseline without a lake would be SILENTLY ignored — the user
    // believes the lake was checked (review finding; the SftExport
    // --oversize/--pack guard is the same flag-dependency shape). Up
    // HERE with the rest of the argument validation (second-review
    // finding): failing after the text sections were already computed
    // and overwritten would burn full-corpus scans and leave $out half
    // rewritten by a refused invocation.
    require(args.contains("embedding-lake") || !args.contains("lake-baseline"),
      "--lake-baseline only applies together with --embedding-lake")
    require(args.contains("integrity") || !args.contains("integrity-baseline"),
      "--integrity-baseline only applies together with --integrity <groups>")
    val docs = spark.read.parquet(in)
    require(docs.columns.contains(groupCol),
      s"--group-col '$groupCol' is not a column of the input " +
        s"(have: ${docs.columns.mkString(", ")})")
    // one merge-table load shared by the seq_len counter and the vocab
    // section — Some iff --token-counter bpe
    val bpeMerges: Option[graft.expressions.BpeMerges] =
      args.getOrElse("token-counter", "whitespace") match {
        case "whitespace" => None
        case "bpe" => Some(args.get("bpe-merges")
          .map(graft.functions.Bpe.loadMergesFile)
          .getOrElse(graft.functions.Bpe.defaultMerges))
        case other =>
          sys.error(s"--token-counter must be 'whitespace' or 'bpe', got '$other'")
      }
    val tokenCountFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      bpeMerges match {
        case None => TextFunctions.tokenCount
        case Some(m) => graft.functions.Bpe.tokenCount(_, m)
      }

    TrainPrep.corpusReport(docs, idCol, textCol, groupCol)
      .write.mode("overwrite").parquet(s"$out/slices")
    TrainPrep.seqLenHistogram(docs, idCol, textCol, context, tokenCountFn)
      .write.mode("overwrite").parquet(s"$out/seq_len")
    // tokenizer-fit section (E119): per-slice unk rates under the closed
    // BPE vocabulary — only meaningful when a real merge table counts
    bpeMerges.foreach { m =>
      TrainPrep.vocabCoverage(docs, groupCol, textCol, m)
        .write.mode("overwrite").parquet(s"$out/vocab")
    }
    // exact() already carries each digest group's size — the cluster
    // histogram is one more count-sized aggregate on top
    Dedup.exact(docs, idCol, textCol)
      .groupBy(col("n_dups").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"))
      .write.mode("overwrite").parquet(s"$out/clusters")

    // gate rates: per-row verdicts as conditional sums in ONE scan...
    val row = docs.agg(
      count(lit(1)).as("docs"),
      sum(coalesce(tokenCountFn(col(textCol)), lit(0L))).as("tokens"),
      sum(when(TextFunctions.gopherPass(col(textCol)), 1L).otherwise(0L))
        .as("gopher"),
      sum(when(TextFunctions.encodingClean(col(textCol)), 1L).otherwise(0L))
        .as("encoding")).head()
    // sum() over ZERO rows is NULL, not 0 — on an empty corpus a bare
    // getLong would NPE; shared guard (one definition for every CLI)
    def longOr0(r: org.apache.spark.sql.Row, i: Int): Long = CliArgs.longOr0(r, i)
    // ...plus the two gates that are frames, each one aggregate
    val c4Pass = longOr0(TextFunctions.c4Gate(docs, idCol, textCol)
      .agg(sum(when(col("pass"), 1L).otherwise(0L))).head(), 0)
    val repPass = longOr0(TextFunctions.repetitionGate(docs, idCol, textCol)
      .agg(sum(when(col("pass"), 1L).otherwise(0L))).head(), 0)
    val distinctTexts = longOr0(spark.read.parquet(s"$out/clusters")
      .agg(sum(col("n_clusters"))).head(), 0)

    // embedding-lake health section (r14): the dataset card reports TEXT
    // health above; --embedding-lake adds the EMBEDDING side — the
    // per-cell drift report of an IVF-partitioned lake (codebook read
    // from the lake's own _codebook/), and, when --lake-baseline names a
    // persisted training-time driftReport, the retrainAdvice verdict per
    // cell. Written as embedding_drift/; the summary carries cell/vector
    // totals and the number of cells flagged for retrain/compact.
    val lakeStats: Map[String, Long] = args.get("embedding-lake").map { lake =>
      val vecCol = args.getOrElse("embedding-col", "embedding")
      val cb = graft.io.EmbeddingLake.readCodebook(spark, lake)
      val current = graft.io.EmbeddingLake.driftReport(spark, lake, vecCol, cb)
      val section = args.get("lake-baseline") match {
        case Some(basePath) => graft.io.EmbeddingLake.retrainAdvice(
          spark.read.parquet(basePath), current)
        case None => current
      }
      section.write.mode("overwrite").parquet(s"$out/embedding_drift")
      val drift = spark.read.parquet(s"$out/embedding_drift")
      val retrain =
        if (drift.columns.contains("retrain"))
          drift.agg(sum(when(col("retrain"), 1L).otherwise(0L))).head()
        else null
      val nCol = if (drift.columns.contains("n")) "n" else "n_now"
      val totals = drift.agg(count(lit(1)), sum(col(nCol))).head()
      Map("lake_cells" -> totals.getLong(0),
        "lake_vectors" -> longOr0(totals, 1)) ++
        Option(retrain).map(r => "lake_retrain_cells" -> longOr0(r, 0))
    }.getOrElse(Map.empty)

    // integrity section (r15): `--integrity <groups>` emits the
    // tamper-evident manifest (integrity/) and the publishable root into
    // the card; `--integrity-baseline <manifest.parquet>` adds the diff
    // against a prior published manifest (integrity_diff/) with per-
    // verdict counts — the governance numbers a card consumer actually
    // reads ("same corpus?" → root match; "what moved?" → verdicts).
    val integrityStats: Map[String, Long] =
      args.get("integrity").map { g =>
        val m = graft.io.IntegrityManifest.manifest(
          docs, idCol, textCol, groups = g.toInt)
        m.write.mode("overwrite").parquet(s"$out/integrity")
        val written = spark.read.parquet(s"$out/integrity")
        val diffStats = args.get("integrity-baseline").map { basePath =>
          val d = graft.io.IntegrityManifest.diff(
            spark.read.parquet(basePath), written)
          d.write.mode("overwrite").parquet(s"$out/integrity_diff")
          val verdicts = spark.read.parquet(s"$out/integrity_diff")
            .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          Seq("group_added", "group_dropped", "count_changed",
            "content_changed")
            .map(v => s"integrity_$v" -> verdicts.getOrElse(v, 0L)).toMap
        }.getOrElse(Map.empty)
        Map("integrity_groups" -> written.count()) ++ diffStats
      }.getOrElse(Map.empty)
    // the root is a hex STRING — carried as a quoted JSON field beside
    // the numeric stats (and recomputable from integrity/ at any time)
    val integrityRoot: Option[String] = args.get("integrity").map { _ =>
      graft.io.IntegrityManifest.root(spark.read.parquet(s"$out/integrity"))
    }

    val stats = Map(
      "docs" -> row.getLong(0), "tokens" -> longOr0(row, 1),
      "distinct_texts" -> distinctTexts,
      "gopher_pass" -> longOr0(row, 2), "c4_pass" -> c4Pass,
      "repetition_pass" -> repPass, "encoding_clean" -> longOr0(row, 3)) ++
      lakeStats ++ integrityStats
    println((stats.map { case (k, v) => s""""$k":$v""" } ++
        integrityRoot.map(r => s""""integrity_root":"$r""""))
      .mkString("{\"metric\":\"corpus_report\",", ",", "}"))
    stats
  }

  def main(args: Array[String]): Unit =
    CliArgs.withSession("corpus-report")(s => run(s, CliArgs.parse(args)))
}
