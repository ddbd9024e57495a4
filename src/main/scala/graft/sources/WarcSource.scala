package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed WARC (ISO 28500) reader — the container format web
  * corpora actually arrive in (Common Crawl ships ~90k .warc.gz files
  * per snapshot). Same grain as [[ZipSource]]: each archive file is
  * ONE `binaryFile` row expanded on an executor, so reading a crawl
  * fans out file-per-task with no driver materialization; the
  * per-file memory bound is the archive size (the standard ~1 GB
  * crawl segment), the cluster-landing contract ZipSource documents.
  *
  * Format notes (WARC/1.0 and 1.1): a record is a version line,
  * CRLF-terminated named header lines (case-insensitive names) up to
  * an empty line, exactly Content-Length payload bytes, then the
  * mandatory two CRLFs before the next record. Gzip archives are
  * detected by MAGIC BYTES (1f 8b), not filename — crawl mirrors
  * rename files — and per-record gzip members (the Common Crawl
  * layout) read transparently: `GZIPInputStream` concatenates
  * members. Malformed records fail LOUDLY with the record number and
  * what was seen (the ZipSource error contract): a silently-skipped
  * record is corpus loss no downstream check can catch.
  */
object WarcSource {

  /** One row per WARC record across every file under `path`:
    * (path, record_no, warc_type, target_uri, warc_date,
    * content_type, content_length, payload).
    */
  def warcRecords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // pathGlobFilter instead of a glob IN the path: a glob path makes
    // every load log a spurious FileStreamSink metadata-probe WARN
    // with a FileNotFoundException stack, and the filter also skips
    // _SUCCESS markers when pointed at a staged directory
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseAll(p, bytes) }
      .toDF("path", "record_no", "warc_type", "target_uri",
        "warc_date", "content_type", "content_length", "payload")
  }

  /** The text-pipeline view: `response` records only, HTTP headers
    * stripped, body decoded as UTF-8 — (target_uri, warc_date,
    * text). The input table every curation chain here starts from.
    */
  def warcResponses(spark: SparkSession, path: String): DataFrame =
    warcRecords(spark, path)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"), col("warc_date"),
        httpBodyUtf8(col("payload")).as("text"))

  /** Strip an HTTP response head (status line + headers + CRLFCRLF)
    * from a payload and decode the body as UTF-8; a payload that is
    * not an HTTP message decodes whole. Pure column expression —
    * codegen'd, no UDF.
    */
  private[sources] def httpBodyUtf8(payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val s = decode(payload, "UTF-8")
    val head = substring_index(s, "\r\n\r\n", 1)
    when(s.startsWith("HTTP/") && s.contains("\r\n\r\n"),
      s.substr(length(head) + lit(5), length(s)))
      .otherwise(s)
  }

  /** Stage a (uri, date, text) frame as per-record-gzip WARC response
    * archives under `root/name__fp<hex>`, once per `fingerprint` —
    * the [[JsonlSource.stage]] publish protocol (tmp write, stale-
    * sibling delete, atomic rename, _SUCCESS marker) so the
    * round-trip query can exercise the READER against a corpus whose
    * ground truth is known. The write is distributed: each partition
    * streams its own `part-NNNNN.warc.gz` (one gzip member per
    * record, the Common Crawl layout — so a downstream range reader
    * could seek to any record). A retried task truncates-and-
    * rewrites its own part file, and nothing publishes until the
    * whole action has succeeded. Dev/test harness plumbing: `root`
    * must be a filesystem every executor can reach (local dir here;
    * a shared mount or fuse point on a real cluster — production
    * corpora already ARRIVE as WARC, nothing writes them from Spark).
    */
  def stageResponses(df: DataFrame, root: String, name: String,
                     fingerprint: Long): String = {
    import df.sparkSession.implicits._
    val safe = name.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '-') c else '_')
    val dirName = s"${safe}__fp${java.lang.Long.toHexString(fingerprint)}"
    val dir = new java.io.File(root, dirName)
    val done = new java.io.File(dir, "_SUCCESS")
    if (!done.isFile) {
      def deleteTree(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
        f.delete(): Unit
      }
      Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(s"${safe}__fp") &&
          f.getName != dirName)
        .foreach(deleteTree)
      val tmp = new java.io.File(root, s".$dirName.tmp")
      deleteTree(tmp)
      tmp.mkdirs()
      val tmpPath = tmp.getAbsolutePath
      df.select(col("uri").cast("string"), col("date").cast("string"),
          col("text").cast("string"))
        .as[(String, String, String)]
        .foreachPartition { it: Iterator[(String, String, String)] =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val f = new java.io.File(tmpPath, f"part-$pid%05d.warc.gz")
          val fos = new java.io.FileOutputStream(f) // truncate = retry-safe
          try for ((uri, date, text) <- it) {
            val g = new java.util.zip.GZIPOutputStream(fos)
            g.write(responseRecord(uri, date, text))
            g.finish()
          } finally fos.close()
        }
      if (!tmp.renameTo(dir)) {
        deleteTree(tmp)
        if (!done.isFile)
          throw new java.io.IOException(
            s"WarcSource: could not publish $dir")
      } else {
        done.createNewFile(): Unit
      }
    }
    dir.toString
  }

  /** One WARC/1.0 response record (headers + HTTP head + UTF-8 body
    * + the mandatory trailing CRLFCRLF) — byte-identical to what
    * [[parseAll]] + [[httpBodyUtf8]] invert.
    */
  private[sources] def responseRecord(uri: String, date: String,
                                      text: String): Array[Byte] = {
    val body = text.getBytes(StandardCharsets.UTF_8)
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain; charset=utf-8\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val len = head.length + body.length
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\nWARC-Date: $date\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: $len\r\n\r\n").getBytes(StandardCharsets.UTF_8) ++
      head ++ body ++ "\r\n\r\n".getBytes(StandardCharsets.UTF_8)
  }

  // -- per-file record parser (executor-side) -------------------------

  private[sources] def parseAll(path: String, bytes: Array[Byte])
      : Iterator[(String, Int, String, String, String, String, Long,
        Array[Byte])] = {
    val raw = new ByteArrayInputStream(bytes)
    val in: InputStream =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) new GZIPInputStream(raw)
      else raw
    var no = 0
    new Iterator[(String, Int, String, String, String, String, Long,
        Array[Byte])] {
      private var nextRec: Option[(String, Int, String, String, String,
        String, Long, Array[Byte])] = None
      private var done = false
      private def advance(): Unit = if (!done && nextRec.isEmpty) {
        // skip inter-record blank lines; EOF here is a clean end
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { done = true; return }
        if (!line.startsWith("WARC/"))
          fail(s"record ${no + 1}: expected a WARC/ version line, " +
            s"got '${line.take(40)}'")
        no += 1
        val headers = scala.collection.mutable.Map[String, String]()
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i <= 0) fail(s"record $no: malformed header '${h.take(40)}'")
          headers(h.substring(0, i).trim.toLowerCase) =
            h.substring(i + 1).trim
          h = readLine(in)
        }
        if (h == null) fail(s"record $no: EOF inside the header block")
        val len = headers.getOrElse("content-length",
          fail(s"record $no: missing Content-Length")).toLong
        if (len < 0 || len > Int.MaxValue.toLong)
          fail(s"record $no: unreasonable Content-Length $len")
        val payload = new Array[Byte](len.toInt)
        var off = 0
        while (off < payload.length) {
          val r = in.read(payload, off, payload.length - off)
          if (r < 0) fail(s"record $no: EOF at payload byte $off of $len")
          off += r
        }
        nextRec = Some((path, no,
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""),
          headers.getOrElse("content-type", ""), len, payload))
      }
      override def hasNext: Boolean = { advance(); nextRec.isDefined }
      override def next(): (String, Int, String, String, String, String,
          Long, Array[Byte]) = {
        advance()
        val r = nextRec.getOrElse(throw new NoSuchElementException)
        nextRec = None
        r
      }
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"WARC parse: $msg")

  /** CRLF- (or bare-LF-) terminated line as ISO-8859-1 (header bytes
    * are ASCII by spec); null at EOF before any byte.
    */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(80)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') buf.write(b)
      b = in.read()
    }
    // EOF mid-line returns the partial line; only EOF at a line
    // START is null (the clean end-of-archive signal)
    new String(buf.toByteArray, StandardCharsets.ISO_8859_1)
  }
}
