package graft.io

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Corpus integrity manifest (E164): tamper sensitivity, locality of the
  * mismatch, layout independence, and the NULL/empty distinction. */
class IntegrityManifestSpec extends SparkSpec {
  import spark.implicits._

  private val base = (0L until 120L).map(i => (i, s"document body $i")) :+
    (500L, null.asInstanceOf[String]) :+ (501L, "")

  private def mf(rows: Seq[(Long, String)], parts: Int = 1): DataFrame =
    IntegrityManifest.manifest(
      rows.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
      groups = 8)

  private def byGrp(df: DataFrame): Map[Long, (Long, String)] =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  test("one flipped byte changes exactly its group's hash, and the root") {
    val clean = byGrp(mf(base))
    val tampered = byGrp(mf(base.map {
      case (7L, _) => (7L, "document body 7!") // one byte appended
      case row => row
    }))
    assert(clean.keySet === tampered.keySet)
    val changed = clean.keySet.filter(g => clean(g) != tampered(g))
    assert(changed.size === 1,
      s"a one-doc edit must localize to one group, changed: $changed")
    assert(clean(changed.head)._1 === tampered(changed.head)._1,
      "an edit (not an add/drop) keeps the group's doc count")
    assert(IntegrityManifest.root(mf(base)) !==
      IntegrityManifest.root(mf(base.map {
        case (7L, _) => (7L, "document body 7!")
        case row => row
      })))
  }

  test("added, dropped and re-identified docs all flip the root") {
    val r0 = IntegrityManifest.root(mf(base))
    assert(r0 !== IntegrityManifest.root(mf(base :+ (999L, "new doc"))))
    assert(r0 !== IntegrityManifest.root(mf(base.tail)))
    // identity binds: swapping two docs' ids changes leaves even though
    // the text multiset is identical
    val swapped = base.map {
      case (0L, _) => (1L, "document body 0")
      case (1L, _) => (0L, "document body 1")
      case row => row
    }
    assert(r0 !== IntegrityManifest.root(mf(swapped)))
  }

  test("diff localizes: verdicts per divergent group, empty on identical corpora") {
    val m0 = mf(base).localCheckpoint(true)
    assert(IntegrityManifest.diff(m0, mf(base)).count() === 0L,
      "identical corpora must diff empty")
    // in-place edit: one group, content_changed, counts intact
    val edited = IntegrityManifest.diff(m0, mf(base.map {
      case (7L, _) => (7L, "edited body")
      case row => row
    })).collect()
    assert(edited.length === 1 && edited.head.getString(3) === "content_changed"
      && edited.head.getLong(1) === edited.head.getLong(2), edited.mkString)
    // added doc: its group reads count_changed (or group_added if new)
    val added = IntegrityManifest.diff(m0, mf(base :+ (999L, "new doc")))
      .collect()
    assert(added.length === 1 &&
      Set("count_changed", "group_added").contains(added.head.getString(3)),
      added.mkString)
    m0.unpersist()
  }

  test("incremental update == full recompute, hash-exact, on add/edit/drop") {
    val m0 = mf(base).localCheckpoint(true)
    // one batch exercising all three shapes at once: edit doc 7, add 999,
    // drop 11 — changedIds carries every touched id including the drop
    val after = base.map {
      case (7L, _) => (7L, "edited body 7")
      case row => row
    }.filterNot(_._1 == 11L) :+ (999L, "brand new doc")
    val changed = Seq(7L, 999L, 11L).map(i => (i, "")).toDF("doc_id", "text")
    val inc = IntegrityManifest.updated(m0, after.toDF("doc_id", "text"),
      changed, "doc_id", "text", groups = 8)
    val full = mf(after)
    assert(byGrp(inc) === byGrp(full),
      "incremental manifest must be hash-exact to the full recompute")
    assert(IntegrityManifest.root(inc) === IntegrityManifest.root(full))
    // an empty batch is the identity
    assert(byGrp(IntegrityManifest.updated(m0,
      base.toDF("doc_id", "text"),
      spark.emptyDataset[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", groups = 8)) === byGrp(m0))

    // a STAMPED published manifest round-trips as prev (review finding:
    // the extra as_of column used to break the splice's unionByName)
    val stampedPrev = IntegrityManifest.stamped(m0, "merge-1")
    assert(byGrp(IntegrityManifest.updated(stampedPrev,
      after.toDF("doc_id", "text"), changed, "doc_id", "text", groups = 8))
      === byGrp(full))

    // NULL ids refuse loudly in BOTH incremental inputs, exactly like the
    // full recompute (review finding: the group filter used to silently
    // DROP a null-id corpus row the full pipeline rejects)
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => String.valueOf(e.getMessage)).mkString(" | ")
    val nullCorpus = intercept[Exception] {
      IntegrityManifest.updated(m0,
        (after.map { case (i, t) => (java.lang.Long.valueOf(i), t) } :+
          ((null.asInstanceOf[java.lang.Long], "x")))
          .toDF("doc_id", "text"),
        changed, "doc_id", "text", groups = 8).collect()
    }
    assert(msgChain(nullCorpus).contains("NULL id"), msgChain(nullCorpus))
    val nullBatch = intercept[Exception] {
      IntegrityManifest.updated(m0, after.toDF("doc_id", "text"),
        Seq((null.asInstanceOf[java.lang.Long], "x")).toDF("doc_id", "text"),
        "doc_id", "text", groups = 8).collect()
    }
    assert(msgChain(nullBatch).contains("NULL id"), msgChain(nullBatch))
    m0.unpersist()
  }

  test("incremental update through a LakeMerge upsert, stamped with its merge id") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("im-lake").toString
    val docs = (0L until 60L)
      .map(i => (i, s"doc $i", f"2024-01-${(i % 3) + 1}%02d"))
      .toDF("doc_id", "text", "part")
    LakeMerge.writeLake(docs, dir, partitionCol = "part",
      seriesCol = "doc_id", timeCol = "doc_id")
    val m0 = IntegrityManifest.manifest(
      LakeMerge.readLake(spark, dir, "part"), "doc_id", "text", groups = 8)
      .localCheckpoint(true)
    val batch = Seq((7L, "doc 7 v2", "2024-01-02"),
      (100L, "new doc 100", "2024-01-01")).toDF("doc_id", "text", "part")
    val stats = LakeMerge.merge(spark, dir, batch, keyCols = Seq("doc_id"),
      partitionCol = "part", seriesCol = "doc_id", timeCol = "doc_id",
      requireUniqueKeys = false)
    val now = LakeMerge.readLake(spark, dir, "part")
    val inc = IntegrityManifest.stamped(
      IntegrityManifest.updated(m0, now, batch, "doc_id", "text", groups = 8),
      stats.mergeId)
    val full = IntegrityManifest.manifest(now, "doc_id", "text", groups = 8)
    assert(byGrp(inc.drop("as_of")) === byGrp(full))
    assert(inc.select(col("as_of")).distinct().collect()
      .map(_.getString(0)).toSeq === Seq(stats.mergeId))
    m0.unpersist()
  }

  test("mergeAndMaintain: the manifest lives in the lake, survives crashes by union-repair") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("im-maintain").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def full(): Map[Long, (Long, String)] = byGrp(IntegrityManifest.manifest(
      LakeMerge.readLake(spark, dir, "part"), "doc_id", "text", groups = 8))
    val docs = (0L until 60L)
      .map(i => (i, s"doc $i", f"2024-02-${(i % 3) + 1}%02d"))
      .toDF("doc_id", "text", "part")
    LakeMerge.writeLake(docs, dir, partitionCol = "part",
      seriesCol = "doc_id", timeCol = "doc_id")

    // first call on an unmanifested lake: FULL manifest, stamped
    val s1 = IntegrityManifest.mergeAndMaintain(spark, dir,
      Seq((100L, "new 100", "2024-02-01")).toDF("doc_id", "text", "part"),
      "doc_id", "text", partitionCol = "part", groups = 8)
    val m1 = IntegrityManifest.readLakeManifest(spark, dir).get
    assert(byGrp(m1.drop("as_of")) === full())
    assert(m1.select("as_of").distinct().head.getString(0) === s1.mergeId)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .forall(!_.getPath.getName.startsWith("._integrity_pending")),
      "markers must be consumed on success")

    // second call: INCREMENTAL maintenance, still hash-exact to full
    val s2 = IntegrityManifest.mergeAndMaintain(spark, dir,
      Seq((7L, "doc 7 v2", "2024-02-02")).toDF("doc_id", "text", "part"),
      "doc_id", "text", partitionCol = "part", groups = 8)
    val m2 = IntegrityManifest.readLakeManifest(spark, dir).get
    assert(byGrp(m2.drop("as_of")) === full())
    assert(m2.select("as_of").distinct().head.getString(0) === s2.mergeId)

    // crash between merge and maintenance, simulated exactly as it
    // happens: a pending marker left behind plus a PLAIN merge whose
    // manifest update never ran — the stored manifest is now stale
    val lostBatch = Seq((11L, "doc 11 v2", "2024-02-03"),
      (200L, "new 200", "2024-02-01")).toDF("doc_id", "text", "part")
    lostBatch.select(col("doc_id")).distinct().write
      .parquet(s"$dir/._integrity_pending-crashed")
    LakeMerge.merge(spark, dir, lostBatch, keyCols = Seq("doc_id"),
      partitionCol = "part", seriesCol = "doc_id", timeCol = "doc_id",
      requireUniqueKeys = false)
    assert(byGrp(IntegrityManifest.readLakeManifest(spark, dir).get
      .drop("as_of")) !== full(), "fixture: manifest must actually be stale")
    // the NEXT maintained merge repairs the crashed batch's groups too
    val s3 = IntegrityManifest.mergeAndMaintain(spark, dir,
      Seq((13L, "doc 13 v2", "2024-02-02")).toDF("doc_id", "text", "part"),
      "doc_id", "text", partitionCol = "part", groups = 8)
    val m3 = IntegrityManifest.readLakeManifest(spark, dir).get
    assert(byGrp(m3.drop("as_of")) === full(),
      "union-repair must heal the crashed predecessor's stale groups")
    assert(m3.select("as_of").distinct().head.getString(0) === s3.mergeId)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .forall(!_.getPath.getName.startsWith("._integrity_pending")))
  }

  test("deleteAndMaintain: the fingerprint forgets purged docs, hash-exact to full") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("im-delete").toString
    def full(): Map[Long, (Long, String)] = byGrp(IntegrityManifest.manifest(
      LakeMerge.readLake(spark, dir, "part"), "doc_id", "text", groups = 8))
    val docs = (0L until 60L)
      .map(i => (i, s"doc $i", f"2024-03-${(i % 3) + 1}%02d"))
      .toDF("doc_id", "text", "part")
    LakeMerge.writeLake(docs, dir, partitionCol = "part",
      seriesCol = "doc_id", timeCol = "doc_id")
    IntegrityManifest.mergeAndMaintain(spark, dir,
      Seq((100L, "new 100", "2024-03-01")).toDF("doc_id", "text", "part"),
      "doc_id", "text", partitionCol = "part", groups = 8)

    // the purge: a spread of ids across groups — the stored manifest must
    // STOP attesting them (the erasure loop the lake-maintained
    // fingerprint exists to close) and stay hash-exact to a recompute
    val purged = Seq(3L, 7L, 21L, 100L)
    val before = byGrp(IntegrityManifest.readLakeManifest(spark, dir).get
      .drop("as_of"))
    val s = IntegrityManifest.deleteAndMaintain(spark, dir,
      purged.map(i => Tuple1(i)).toDF("doc_id"), "doc_id", "text",
      partitionCol = "part", groups = 8)
    assert(s.rowsDeleted === 4L, s"$s")
    val m = IntegrityManifest.readLakeManifest(spark, dir).get
    assert(byGrp(m.drop("as_of")) === full(),
      "post-purge manifest must equal the full recompute")
    assert(byGrp(m.drop("as_of")) !== before,
      "the purge must actually change the fingerprint")
    assert(m.select("as_of").distinct().head.getString(0) === s.deleteId)

    // the purge keys must include the manifest id column
    val e = intercept[IllegalArgumentException] {
      IntegrityManifest.deleteAndMaintain(spark, dir,
        Seq(Tuple1("x")).toDF("other"), "doc_id", "text",
        keyCols = Seq("other"), partitionCol = "part", groups = 8)
    }
    assert(e.getMessage.contains("must include"), e.getMessage)
  }

  test("two-level chain: 2^20 groups work, sub level is exercised, buffers bound") {
    // a small corpus under a HUGE group space: routing must not overflow,
    // and the root/replay machinery is routing-width-agnostic
    val wide = IntegrityManifest.manifest(
      base.toDF("doc_id", "text"), "doc_id", "text", groups = 1 << 20)
    assert(wide.count() > 100,
      "at 2^20 groups almost every doc gets its own group")
    assert(IntegrityManifest.root(wide).length === 64)
    // sub-level exercised: groups=1 forces every doc into one group, so
    // the sub split is what keeps any single chain buffer small; the
    // result must equal the same corpus chained with a different
    // PARTITION layout (pure function of the leaf set), and differ from
    // a subGroups=1 single-chain manifest only in hash VALUE, never count
    val one = IntegrityManifest.manifest(
      base.toDF("doc_id", "text"), "doc_id", "text",
      groups = 1, subGroups = 8)
    val oneFlat = IntegrityManifest.manifest(
      base.toDF("doc_id", "text"), "doc_id", "text",
      groups = 1, subGroups = 1)
    assert(one.count() === 1L && oneFlat.count() === 1L)
    val (nSplit, hSplit) = byGrp(one)(0L)
    val (nFlat, hFlat) = byGrp(oneFlat)(0L)
    assert(nSplit === nFlat)
    assert(hSplit !== hFlat,
      "the sub level must participate in the chain (Merkle, not a no-op)")
    // guards
    intercept[IllegalArgumentException] {
      IntegrityManifest.manifest(base.toDF("doc_id", "text"),
        "doc_id", "text", groups = (1 << 24) + 1)
    }
    intercept[IllegalArgumentException] {
      IntegrityManifest.manifest(base.toDF("doc_id", "text"),
        "doc_id", "text", subGroups = 0)
    }
  }

  test("injective leaf: ':'-bearing ids cannot imitate another doc; NULL id is loud") {
    // the r14 encoding sha256(id ':' flag ':' text) collided
    // (id="a:0", text="x") with (id="a", text="0:x") once group routes
    // aligned; the fixed-width form keeps the leaves distinct
    val a = IntegrityManifest.root(IntegrityManifest.manifest(
      Seq(("a:0", "x")).toDF("doc_id", "text"), "doc_id", "text", groups = 1))
    val b = IntegrityManifest.root(IntegrityManifest.manifest(
      Seq(("a", "0:x")).toDF("doc_id", "text"), "doc_id", "text", groups = 1))
    assert(a !== b, "colon-shifted id/text pairs must hash differently")
    val err = intercept[Exception] {
      IntegrityManifest.manifest(
        Seq((null.asInstanceOf[String], "x")).toDF("doc_id", "text"),
        "doc_id", "text", groups = 1).collect()
    }
    val chain = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(e => String.valueOf(e.getMessage)).mkString(" | ")
    assert(chain.contains("NULL id"),
      s"NULL id must refuse loudly, got: $chain")
  }

  test("NULL text and empty text are distinct; layout never matters") {
    val r0 = IntegrityManifest.root(mf(base))
    // turn the NULL doc into an empty-string doc: must flip
    assert(r0 !== IntegrityManifest.root(mf(base.map {
      case (500L, null) => (500L, "")
      case row => row
    })))
    // same rows, wildly different partitioning → identical manifest
    assert(byGrp(mf(base, parts = 1)) === byGrp(mf(base, parts = 13)))
    assert(r0 === IntegrityManifest.root(mf(base, parts = 13)))
  }
}
