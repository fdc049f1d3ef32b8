package graft.io

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPOutputStream

/** Event-sim template archive sink — SURVEY.md §2 K5.
  *
  * The reference shells out `tar -cvzf template.tar.gz <17 DAT files>`
  * (reference: output/extract_water_level.py:49-50,339-341, file list
  * res/template/files_included.txt). Java ships no tar writer, so this is a
  * minimal POSIX ustar implementation — regular files only, which is all a
  * deck template needs. Driver-side: archives are a few MB.
  */
object TarGzArchive {

  /** Archive `(nameInArchive, file)` entries into a .tar.gz at `out`. */
  def create(out: String, files: Seq[(String, Path)]): Unit = {
    val os = new GZIPOutputStream(new BufferedOutputStream(new FileOutputStream(out)))
    try {
      files.foreach { case (name, path) =>
        val data = Files.readAllBytes(path)
        os.write(ustarHeader(name, data.length, Files.getLastModifiedTime(path).toMillis / 1000))
        os.write(data)
        val pad = (512 - data.length % 512) % 512
        os.write(new Array[Byte](pad))
      }
      os.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
    } finally os.close()
  }

  /** Archive the listed file names out of `dir` (the reference's
    * files_included.txt contract). Missing files are skipped like tar -c
    * would error-and-continue with --ignore-failed-read. */
  def createFromDir(out: String, dir: String, names: Seq[String]): Unit =
    create(out, names.map(n => n -> Paths.get(dir, n)).filter(e => Files.exists(e._2)))

  private def ustarHeader(name: String, size: Long, mtime: Long): Array[Byte] = {
    require(name.getBytes(US_ASCII).length <= 100, s"name too long for ustar: $name")
    val h = new Array[Byte](512)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes(US_ASCII)
      System.arraycopy(b, 0, h, off, math.min(b.length, len))
    }
    def putOctal(v: Long, off: Int, len: Int): Unit =
      put(("%0" + (len - 1) + "o").format(v), off, len - 1)
    put(name, 0, 100)
    putOctal(420, 100, 8) // mode 0644
    putOctal(0, 108, 8) // uid
    putOctal(0, 116, 8) // gid
    putOctal(size, 124, 12)
    putOctal(mtime, 136, 12)
    put("        ", 148, 8) // checksum placeholder = spaces
    h(156) = '0' // regular file
    put("ustar", 257, 6)
    put("00", 263, 2)
    val checksum = h.map(b => b & 0xff).sum
    putOctal(checksum, 148, 7)
    h(155) = ' '
    h
  }
}
