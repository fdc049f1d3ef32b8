package graft.io

import java.nio.file.{Files, Paths}
import java.sql.{DriverManager, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** K5 archive sink: the ustar output must be readable by system tar; K3
  * run-metadata row lands with blob + JSON intact. */
class TarGzArchiveSpec extends AnyFunSuite {

  test("create writes a tar.gz that system tar lists and extracts byte-identically") {
    val dir = Files.createTempDirectory("targz")
    val f1 = dir.resolve("RAIN.DAT")
    val f2 = dir.resolve("INFLOW.DAT")
    Files.writeString(f1, "R 0.000 0.250 \n" * 40)
    Files.writeString(f2, "H 1.0 6.3\n")
    val out = dir.resolve("template.tar.gz").toString
    TarGzArchive.createFromDir(out, dir.toString,
      Seq("RAIN.DAT", "INFLOW.DAT", "MISSING.DAT"))

    val listed = Seq("tar", "-tzf", out).!!.trim.split("\n").toSeq
    assert(listed === Seq("RAIN.DAT", "INFLOW.DAT")) // missing file skipped

    val ex = Files.createTempDirectory("untar")
    assert(Seq("tar", "-xzf", out, "-C", ex.toString).! === 0)
    assert(Files.readString(ex.resolve("RAIN.DAT")) === Files.readString(f1))
    assert(Files.readString(ex.resolve("INFLOW.DAT")) === Files.readString(f2))
  }

  test("insertRunMetadata stores the row with JSON and template blob (K3)") {
    val url = "jdbc:derby:memory:metadb;create=true"
    val c0 = DriverManager.getConnection(url)
    c0.createStatement().execute(
      "CREATE TABLE run_metadata (source_id BIGINT, variable_id BIGINT, " +
        "sim_tag VARCHAR(32), fgt TIMESTAMP, metadata CLOB, template BLOB)")
    c0.close()
    JdbcUpsertSink.insertRunMetadata(url, "run_metadata", 7L, 3L, "daily_run",
      Timestamp.valueOf("2024-01-01 03:00:00"), """{"RAINCELL": "2024-01-01"}""",
      Some(Array[Byte](1, 2, 3)))
    val c = DriverManager.getConnection(url)
    val rs = c.createStatement().executeQuery(
      "SELECT source_id, sim_tag, metadata, template FROM run_metadata")
    assert(rs.next())
    assert(rs.getLong(1) === 7L)
    assert(rs.getString(2) === "daily_run")
    assert(rs.getString(3).contains("RAINCELL"))
    assert(rs.getBytes(4).toSeq === Seq[Byte](1, 2, 3))
    c.close()
  }
}
