package graft.io

import java.nio.file.{Files, Paths}

import scala.collection.immutable.ListMap

/** run_meta.json merge-writer — SURVEY.md §2 K4.
  *
  * Reference semantics: read the existing JSON object if present, merge the
  * new keys over it (last-writer-wins), rewrite the file (reference:
  * input/raincell/gen_raincell.py:17-32 — the same function is inlined in
  * all five generators). Driver-side: the file is a handful of keys.
  */
object RunMetaJson {

  def merge(path: String, updates: Map[String, String]): Map[String, String] = {
    val existing =
      if (Files.exists(Paths.get(path))) parse(Files.readString(Paths.get(path)))
      else ListMap.empty[String, String]
    val merged = existing ++ updates
    Files.writeString(Paths.get(path), render(merged))
    merged
  }

  private[io] def render(m: Map[String, String]): String =
    m.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Minimal flat string-to-string JSON object parser (the run_meta files
    * are exactly that shape). */
  private[io] def parse(s: String): Map[String, String] = {
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    ListMap(pair.findAllMatchIn(s).map(m => unescape(m.group(1)) -> unescape(m.group(2))).toSeq: _*)
  }

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
