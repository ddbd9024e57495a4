package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SubRip (.srt) subtitle parsing — the caption format audio-visual
  * training corpora align transcripts with (YouTube exports,
  * OpenSubtitles dumps). From scratch on the de-facto public format:
  * blank-line-separated cues of `index`, `HH:MM:SS,mmm -->
  * HH:MM:SS,mmm`, then one or more text lines; CRLF or LF, an
  * optional UTF-8 BOM, and a `.` decimal separator (the common
  * WebVTT-contaminated variant) are all accepted.
  *
  * Unlike the HTML strip (a recall op over messy markup), SRT is a
  * STRUCTURED format: a cue whose timestamp line does not parse, or
  * whose end precedes its start, fails LOUDLY with the cue number —
  * a silently-dropped cue is a hole in the alignment no downstream
  * check can localize.
  */
object Subtitles {

  /** (declared cue index, start_ms, end_ms, text lines joined with
    * '\n') per cue, in file order.
    */
  def parseSrt(srt: String): Seq[(Int, Long, Long, String)] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"SRT: $msg")
    val body =
      if (srt.startsWith("\uFEFF")) srt.substring(1) else srt
    val lines = body.split("\r\n|\n", -1)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, String)]
    var i = 0
    def ts(s: String, cue: Int): Long = {
      // hours take arbitrary digits (long recordings exceed 99h)
      val m = "(\\d{1,6}):(\\d{2}):(\\d{2})[,.](\\d{3})".r
        .findPrefixMatchOf(s.trim).getOrElse(
          fail(s"cue $cue: bad timestamp '${s.trim.take(24)}'"))
      ((m.group(1).toLong * 60 + m.group(2).toLong) * 60 +
        m.group(3).toLong) * 1000 + m.group(4).toLong
    }
    while (i < lines.length) {
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val idxLine = lines(i).trim
        val cueNo = try idxLine.toInt catch {
          case _: NumberFormatException =>
            fail(s"cue ${out.size + 1}: index line '$idxLine' " +
              "is not a number")
        }
        i += 1
        if (i >= lines.length) fail(s"cue $cueNo: missing timing line")
        val timing = lines(i).split("-->")
        if (timing.length != 2)
          fail(s"cue $cueNo: timing line '${lines(i).take(40)}' " +
            "has no arrow")
        val start = ts(timing(0), cueNo)
        val end = ts(timing(1), cueNo)
        if (end < start)
          fail(s"cue $cueNo: end $end ms precedes start $start ms")
        i += 1
        val text = scala.collection.mutable.ArrayBuffer.empty[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          text += lines(i)
          i += 1
        }
        if (text.isEmpty) fail(s"cue $cueNo: no text lines")
        out += ((cueNo, start, end, text.mkString("\n")))
      }
    }
    out.toSeq
  }

  /** WebVTT (.vtt) cues — the OTHER caption format (YouTube's native
    * export, the W3C spec): a `WEBVTT` header line (with optional
    * trailing metadata up to the first blank line), `NOTE`/`STYLE`/
    * `REGION` blocks that drop whole, cues whose identifier line is
    * OPTIONAL, `.` millisecond separators, optional cue SETTINGS
    * after the end timestamp (`align:start line:0%` — dropped), the
    * short `MM:SS.mmm` timestamp form, and inline styling tags
    * (`<b>`, `<c.loud>`, `<00:00:01.000>`) stripped from cue text
    * via the HTML tag scan. Cue numbers are assigned 1-based in file
    * order (VTT identifiers are free text, not ordinals). Same loud
    * contract as [[parseSrt]] for malformed timing lines.
    */
  def parseVtt(vtt: String): Seq[(Int, Long, Long, String)] = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"VTT: $msg")
    val body =
      if (vtt.startsWith("\uFEFF")) vtt.substring(1) else vtt
    val lines = body.split("\r\n|\n", -1)
    if (lines.isEmpty || !lines(0).startsWith("WEBVTT"))
      fail("missing WEBVTT header")
    var i = 1
    while (i < lines.length && lines(i).trim.nonEmpty) i += 1 // header meta
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, String)]
    def ts(s: String, cue: Int): Long = {
      val t = s.trim
      val m = "(?:(\\d{1,6}):)?(\\d{2}):(\\d{2})[.,](\\d{3})".r
        .findPrefixMatchOf(t).getOrElse(
          fail(s"cue $cue: bad timestamp '${t.take(24)}'"))
      val h = Option(m.group(1)).map(_.toLong).getOrElse(0L)
      ((h * 60 + m.group(2).toLong) * 60 + m.group(3).toLong) * 1000 +
        m.group(4).toLong
    }
    while (i < lines.length) {
      while (i < lines.length && lines(i).trim.isEmpty) i += 1
      if (i < lines.length) {
        val first = lines(i).trim
        if (first.startsWith("NOTE") || first == "STYLE" ||
          first.startsWith("REGION")) {
          while (i < lines.length && lines(i).trim.nonEmpty) i += 1
        } else {
          val cueNo = out.size + 1
          // the identifier line is optional: a line without an arrow
          // is the id, the arrow line follows
          var timingLine = first
          if (!timingLine.contains("-->")) {
            i += 1
            if (i >= lines.length)
              fail(s"cue $cueNo: identifier without a timing line")
            timingLine = lines(i).trim
          }
          val arrow = timingLine.indexOf("-->")
          if (arrow < 0)
            fail(s"cue $cueNo: timing line '${timingLine.take(40)}' " +
              "has no arrow")
          val start = ts(timingLine.substring(0, arrow), cueNo)
          // settings after the end timestamp drop (ts reads a prefix)
          val end = ts(timingLine.substring(arrow + 3), cueNo)
          if (end < start)
            fail(s"cue $cueNo: end $end ms precedes start $start ms")
          i += 1
          val text = scala.collection.mutable.ArrayBuffer.empty[String]
          while (i < lines.length && lines(i).trim.nonEmpty) {
            // karaoke timestamp tags (<00:00:01.000>) start with a
            // digit — outside the HTML tag grammar — so drop them
            // first, then strip styling tags via the HTML tag scan
            val noKaraoke = lines(i).replaceAll("<\\d[^>]*>", "")
            text += HtmlText.extractText(noKaraoke)
            i += 1
          }
          if (text.isEmpty) fail(s"cue $cueNo: no text lines")
          out += ((cueNo, start, end, text.mkString("\n")))
        }
      }
    }
    out.toSeq
  }

  /** Explode (id, srt) rows into one row per cue:
    * (id, cue_no, start_ms, end_ms, text, duration_ms). Map-only.
    */
  def cues(df: DataFrame, id: Column, srt: Column): DataFrame =
    explodeCues(df, id, srt, udf((s: String) => parseSrt(s)))

  /** [[cues]] for WebVTT payloads. */
  def cuesVtt(df: DataFrame, id: Column, vtt: Column): DataFrame =
    explodeCues(df, id, vtt, udf((s: String) => parseVtt(s)))

  private def explodeCues(df: DataFrame, id: Column, payload: Column,
      parse: org.apache.spark.sql.expressions.UserDefinedFunction)
      : DataFrame =
    df.select(id.as("id"),
        explode(parse(payload)).as("__c"))
      .select(col("id"), col("__c._1").as("cue_no"),
        col("__c._2").as("start_ms"), col("__c._3").as("end_ms"),
        col("__c._4").as("text"),
        (col("__c._3") - col("__c._2")).as("duration_ms"))

  /** Fixture/test SRT writer — cues exactly as [[parseSrt]] reads
    * them back, CRLF line ends (the format's native convention).
    */
  def buildSrt(cues: Seq[(Int, Long, Long, String)]): String = {
    def ts(ms: Long): String = {
      require(ms >= 0, s"SRT build: negative timestamp $ms")
      f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:" +
        f"${ms / 1000 % 60}%02d,${ms % 1000}%03d"
    }
    cues.map { case (no, start, end, text) =>
      s"$no\r\n${ts(start)} --> ${ts(end)}\r\n" +
        text.split("\n", -1).mkString("\r\n")
    }.mkString("", "\r\n\r\n", "\r\n")
  }
}
