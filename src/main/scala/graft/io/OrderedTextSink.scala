package graft.io

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered single-file text sink — SURVEY.md §2 K1/S10.
  *
  * The reference builds each DAT deck by appending formatted lines to one
  * local file (reference: input/raincell/gen_raincell.py:35-42,
  * input/outflow/gen_outflow.py:39-52). Distributed equivalent: global sort
  * on the deck's (section, seq) keys, then a single ordered text write.
  *
  * Scale posture: the sort is a range-partitioned shuffle (scales to any
  * input); only the final merge is single-stream, which is inherent to
  * "one text file" output. For decks too large for one stream, use
  * `writePartFiles` and concatenate parts — part file names preserve range
  * order.
  */
object OrderedTextSink {

  /** Sort by `orderCols` and write `lineCol` as ONE text file at `path`.
    * Writes through a temp directory then moves the single part file. */
  def writeSingleFile(df: DataFrame, path: String,
      orderCols: Seq[String] = Seq("section", "seq"),
      lineCol: String = "line"): Unit = {
    val tmp = path + ".__tmp__"
    df.orderBy(orderCols.map(col): _*)
      .select(col(lineCol))
      .coalesce(1)
      .write.mode("overwrite").text(tmp)
    val listing = Files.list(Paths.get(tmp))
    val part =
      try listing.toArray.map(_.toString)
        .filter(p => p.split('/').last.startsWith("part-")).sorted.head
      finally listing.close()
    Files.move(Paths.get(part), Paths.get(path), StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(Paths.get(tmp))
  }

  /** Range-ordered multi-part write: `part-00000` holds the lowest key range.
    * Concatenating parts in name order reproduces the exact deck. */
  def writePartFiles(df: DataFrame, dir: String, numParts: Int,
      orderCols: Seq[String] = Seq("section", "seq"),
      lineCol: String = "line"): Unit =
    df.repartitionByRange(numParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .select(col(lineCol))
      .write.mode("overwrite").text(dir)

  /** Idempotency guard (K6): reference skips generation when the target file
    * already exists (reference: input/raincell/gen_raincell.py:246-260). */
  def ifAbsent(path: String)(gen: => Unit): Boolean = {
    if (Files.exists(Paths.get(path))) false
    else { gen; true }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      val children = try listing.toArray(Array.ofDim[java.nio.file.Path](_))
        finally listing.close()
      children.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }
}
