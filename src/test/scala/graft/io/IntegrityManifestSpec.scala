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
