package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tamper-evident corpus FINGERPRINT — the dataset-versioning /
  * attestation artifact a 100 TB training corpus publishes alongside its
  * card: flip one byte of one document (or add, drop, or re-id a row)
  * and the root hash changes, so two parties can verify they trained on
  * the same bytes without shipping the bytes (the Merkle-manifest idea
  * behind Delta/Iceberg snapshot checksums and artifact registries,
  * flattened to two levels so it stays two aggregates).
  *
  *  - LEAF: `sha256(id ':' nullFlag ':' text)` — binds identity AND
  *    content (a swap of two docs' texts changes two leaves), with NULL
  *    text distinguished from empty text by the flag, not a sentinel
  *    string a real document could collide with;
  *  - GROUP: docs bucket by their IDENTITY hash (`sha256(id)` first 4
  *    hex digits mod `groups` — uniform, so groups are
  *    corpus/groups-sized with tight concentration: the bounded-collect
  *    contract). Routing by identity, NOT by the content-bearing leaf,
  *    is what makes the audit local: an EDIT changes one group's hash
  *    with its count intact, instead of reading as a drop in one group
  *    plus an add in another. Each group's sorted leaves fold into a
  *    hash CHAIN: `h₀ = 64×'0'; hᵢ₊₁ = sha256(hᵢ ∥ leafᵢ)` — sorting
  *    makes the chain a pure function of the group's leaf SET,
  *    independent of partitioning, insertion order, or cluster layout;
  *  - ROOT: the groups-sized manifest folds driver-side in group order
  *    ([[root]]) — one scalar to publish, compare, or sign.
  *
  * Incremental audit property: a mismatch localizes — compare the two
  * manifests' group rows to find WHICH ~1/groups slice of the corpus
  * diverged, then diff leaves only there (the same prune-to-the-
  * difference shape as [[LakeMerge]]'s date pruning). Every hash is a
  * plain sha256 over hex strings, so DuckDB replays the manifest
  * verbatim (q_integrity_manifest). */
object IntegrityManifest {

  private val Zero64 = "0" * 64

  /** One row per group: (grp, n_docs, group_hash). */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
      groups: Int = 256): DataFrame = {
    require(groups >= 1 && groups <= 65536,
      s"groups must be in [1, 65536] (4 hex digits route them), got $groups")
    val leaf = sha2(concat(col(idCol).cast("string"), lit(":"),
      when(col(textCol).isNull, lit("1")).otherwise(lit("0")), lit(":"),
      coalesce(col(textCol), lit(""))), 256)
    val grp = pmod(conv(substring(
        sha2(col(idCol).cast("string"), 256), 1, 4), 16, 10).cast("long"),
      lit(groups.toLong))
    docs.select(grp.as("grp"), leaf.as("__leaf"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        aggregate(array_sort(collect_list(col("__leaf"))),
          lit(Zero64),
          (acc, l) => sha2(concat(acc, l), 256)).as("group_hash"))
  }

  /** The localization step of an integrity audit: which groups diverge
    * between two manifests (two snapshots, or publisher-vs-verifier).
    * One row per divergent group with both sides' counts/hashes and a
    * verdict — `group_added` / `group_dropped` (present on one side
    * only), `count_changed` (docs added or removed within the group),
    * `content_changed` (same count, different bytes — an in-place
    * edit). Empty result == identical corpora. Both inputs are
    * groups-sized, so this is a broadcast-trivial full-outer join; the
    * expensive leaf-level diff then runs only over the named groups'
    * ~1/groups slices. */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("grp"), col("n_docs").as("n_a"),
      col("group_hash").as("hash_a"))
    val r = b.select(col("grp"), col("n_docs").as("n_b"),
      col("group_hash").as("hash_b"))
    l.join(r, Seq("grp"), "full_outer")
      .filter(col("hash_a").isNull || col("hash_b").isNull ||
        col("hash_a") =!= col("hash_b"))
      .select(col("grp"), col("n_a"), col("n_b"),
        when(col("hash_a").isNull, "group_added")
          .when(col("hash_b").isNull, "group_dropped")
          .when(col("n_a") =!= col("n_b"), "count_changed")
          .otherwise("content_changed").as("verdict"))
  }

  /** Fold a [[manifest]] to the ONE publishable scalar: the group chains
    * re-chained in group order (driver-side — the manifest is
    * groups-sized by construction). Missing groups (no leaf routed
    * there) are skipped, not zero-filled: the group ID participates in
    * the chain, so the same set of present groups in the same order is
    * part of what the root attests. */
  def root(manifest: DataFrame): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def sha(s: String): String = {
      md.reset()
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"${b & 0xFF}%02x").mkString
    }
    manifest.select(col("grp").cast("long"), col("group_hash"))
      .collect().sortBy(_.getLong(0))
      .foldLeft(Zero64) { (acc, r) =>
        sha(acc + r.getLong(0).toString + ":" + r.getString(1))
      }
  }
}
