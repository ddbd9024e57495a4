package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML → text extraction — the boilerplate strip every web corpus
  * runs before any text analysis (Common Crawl WET generation,
  * trafilatura-class preprocessing). From scratch on the public HTML5
  * tokenizer rules relevant to text recovery — no DOM, one linear
  * character pass:
  *
  *   - `<!-- … -->` comments and `<? … >` / `<! … >` declarations
  *     drop whole;
  *   - `<script>`/`<style>`/`<noscript>` are RAWTEXT: content skips
  *     until the matching case-insensitive close tag, so quoted
  *     markup inside scripts (`s = "</p>"`) never leaks into text;
  *   - tag attribute scans respect quoted values (`title="a > b"`);
  *   - block-level tags (p, div, li, headings, table rows, …) end
  *     the current LINE; inline tags (b, a, span, …) do not;
  *   - character references decode: the five named core entities,
  *     `&nbsp;` (to a plain space), and numeric `&#NN;`/`&#xHH;`
  *     code points; an unrecognized `&…` stays literal;
  *   - whitespace collapses per line (runs of the six ASCII
  *     whitespace chars → one space, edges trimmed — the exact class
  *     a SQL oracle replays as `[ \t\n\r\x0B\f]+`), empty lines drop,
  *     lines join with `\n`.
  *
  * A truncated or malformed document extracts best-effort (an open
  * comment or tag at EOF drops silently) — extraction is a RECALL
  * operation over messy real-world markup, unlike the binary codecs
  * whose corruption must be loud. Scalar String → String with no
  * Catalyst form, exposed as [[extract]] (UDF).
  */
object HtmlText {

  private val BlockTags = Set(
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "table", "td", "th", "blockquote", "pre", "section",
    "article", "header", "footer", "hr", "title", "head", "body",
    "html", "nav", "aside", "main", "figure", "figcaption", "form",
    "dt", "dd", "dl")

  private val RawTextTags = Set("script", "style", "noscript")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u000B' ||
      c == '\f'

  def extractText(html: String): String = {
    if (html == null) return null
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flushLine(): Unit = {
      // collapse the six-char whitespace class, trim edges
      val out = new StringBuilder
      var pendingSpace = false
      cur.foreach { c =>
        if (isWs(c)) pendingSpace = out.nonEmpty
        else {
          if (pendingSpace) out.append(' ')
          pendingSpace = false
          out.append(c)
        }
      }
      if (out.nonEmpty) lines += out.toString
      cur.clear()
    }
    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val next = html.charAt(i + 1)
        if (next == '!' || next == '?') {
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i + 1)
            i = if (end < 0) n else end + 1
          }
        } else if (next.isLetter || next == '/') {
          val closing = next == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // attribute scan to the tag end, honoring quoted values
          var quote = 0.toChar
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val a = html.charAt(j)
            if (quote != 0) { if (a == quote) quote = 0 }
            else if (a == '"' || a == '\'') quote = a
            j += 1
          }
          i = if (j < n) j + 1 else n
          if (!closing && RawTextTags(name)) {
            // RAWTEXT: skip to the matching case-insensitive close
            val close = s"</$name"
            var k = i
            var found = -1
            while (found < 0 && k + close.length <= n) {
              if (html.regionMatches(true, k, close, 0, close.length))
                found = k
              k += 1
            }
            if (found < 0) i = n
            else {
              val end = html.indexOf('>', found)
              i = if (end < 0) n else end + 1
            }
          }
          if (BlockTags(name)) flushLine()
        } else {
          cur.append(c); i += 1 // a bare '<' is text
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        val ref =
          if (semi > i && semi - i <= 10) html.substring(i + 1, semi)
          else null
        val decoded: String = ref match {
          case null => null
          case "amp" => "&"
          case "lt" => "<"
          case "gt" => ">"
          case "quot" => "\""
          case "apos" => "'"
          case "nbsp" => " "
          case r if r.startsWith("#x") || r.startsWith("#X") =>
            try new String(Character.toChars(
              Integer.parseInt(r.drop(2), 16)))
            catch { case _: Exception => null }
          case r if r.startsWith("#") =>
            try new String(Character.toChars(Integer.parseInt(r.drop(1))))
            catch { case _: Exception => null }
          case _ => null
        }
        if (decoded != null) { cur.append(decoded); i = semi + 1 }
        else { cur.append('&'); i += 1 }
      } else {
        cur.append(c); i += 1
      }
    }
    flushLine()
    lines.mkString("\n")
  }

  /** Column form (no Catalyst expression exists for a stateful
    * character-level tokenizer).
    */
  def extract(html: Column): Column = extractUdf(html)

  private val extractUdf = udf((s: String) => extractText(s))

  /** `href` targets of anchor tags, in document order — the crawl
    * frontier extraction that link-graph construction starts from.
    * The same tag scan as [[extractText]] (quoted attribute values,
    * case-insensitive names), entity-decoding each value (`&amp;` in
    * query strings is the classic trap); unquoted href values read
    * to the next whitespace or `>`. Best-effort like the text path.
    */
  def extractLinkTargets(html: String): Seq[String] = {
    if (html == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) i = n
      else if (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?') {
        // comments and declarations skip WHOLE, as in extractText: a
        // commented-out anchor is not a live link in the document
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        }
      } else if (!html.charAt(lt + 1).isLetter) i = lt + 1
      else {
        var j = lt + 1
        val nameStart = j
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        val tagName = html.substring(nameStart, j).toLowerCase
        val isAnchor = tagName == "a"
        // walk attributes to '>' honoring quotes; capture href
        var quote = 0.toChar
        var href: String = null
        while (j < n && (quote != 0 || html.charAt(j) != '>')) {
          val c = html.charAt(j)
          if (quote != 0) { if (c == quote) quote = 0; j += 1 }
          else if (c == '"' || c == '\'') { quote = c; j += 1 }
          else if (isAnchor && href == null &&
            html.regionMatches(true, j, "href", 0, 4) &&
            (j == lt + 2 || isWs(html.charAt(j - 1)))) {
            var k = j + 4
            while (k < n && isWs(html.charAt(k))) k += 1
            if (k < n && html.charAt(k) == '=') {
              k += 1
              while (k < n && isWs(html.charAt(k))) k += 1
              if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                val q = html.charAt(k)
                val end = html.indexOf(q, k + 1)
                if (end > 0) { href = html.substring(k + 1, end); k = end + 1 }
                else k = n
              } else {
                val vs = k
                while (k < n && !isWs(html.charAt(k)) &&
                  html.charAt(k) != '>') k += 1
                href = html.substring(vs, k)
              }
              j = k
            } else j += 4
          } else j += 1
        }
        if (href != null)
          out += extractText(href) // entity decode, no tags inside
        i = if (j < n) j + 1 else n
        if (RawTextTags(tagName)) {
          // RAWTEXT skips whole, as in extractText: markup inside a
          // script string ('<a href=…>') is data, not a live link
          val close = s"</$tagName"
          var k = i
          var found = -1
          while (found < 0 && k + close.length <= n) {
            if (html.regionMatches(true, k, close, 0, close.length))
              found = k
            k += 1
          }
          if (found < 0) i = n
          else {
            val end = html.indexOf('>', found)
            i = if (end < 0) n else end + 1
          }
        }
      }
    }
    out.toSeq
  }

  /** Column form of [[extractLinkTargets]]. */
  def extractLinks(html: Column): Column = extractLinksUdf(html)

  private val extractLinksUdf =
    udf((s: String) => extractLinkTargets(s))
}
