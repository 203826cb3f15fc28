package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC/1.0 source + sink — the container web crawls actually land in
 * (ISO 28500; the Common-Crawl layout: one gzip MEMBER per record,
 * members concatenated into ~1 GB `.warc.gz` segment files).
 *
 * Scale model: WARC is NOT splittable (gzip members carry no sync
 * marks), so the unit of parallelism is the FILE — exactly how
 * production crawls process (thousands of ~1 GB segments, one task
 * each). `readWarc` uses Spark's `binaryFile` source; `writeWarc`
 * emits one `part-NNNNN.warc.gz` per partition through a crash-atomic
 * temp-file + rename (a crashed task leaves no partial visible file).
 *
 * Robustness contract (crawl segments contain junk): members are
 * decoded with a HAND-PARSED gzip header + raw `Inflater`, which
 * reports the EXACT compressed bytes consumed — so after a corrupt
 * member the reader knows precisely where it stopped and resumes at
 * the next gzip magic (1f 8b 08). Every failure emits ONE ok = false
 * quarantine row carrying the reason and file offset; records are
 * never silently dropped, and the member-per-record framing keeps
 * corruption locally contained (the reason the format won).
 *
 * Record layout written (and accepted):
 *   WARC/1.0\r\n  header lines\r\n  \r\n
 *   payload of exactly Content-Length bytes  \r\n\r\n
 * with WARC-Type: response payloads an HTTP/1.1 response whose body is
 * the page HTML (the Common-Crawl convention); other WARC-Types pass
 * through with the raw payload.
 */
object Warc {

  private val Crlf = "\r\n"

  /** Serialize one page as a WARC/1.0 response record (HTTP payload). */
  def recordBytes(url: String, tsIso: String, html: Array[Byte]): Array[Byte] = {
    val http = new ByteArrayOutputStream(html.length + 128)
    http.write(("HTTP/1.1 200 OK" + Crlf +
      "Content-Type: text/html; charset=UTF-8" + Crlf +
      s"Content-Length: ${html.length}" + Crlf + Crlf).getBytes(UTF_8))
    http.write(html)
    val payload = http.toByteArray
    val out = new ByteArrayOutputStream(payload.length + 256)
    out.write(("WARC/1.0" + Crlf +
      "WARC-Type: response" + Crlf +
      s"WARC-Target-URI: $url" + Crlf +
      s"WARC-Date: $tsIso" + Crlf +
      "Content-Type: application/http; msgtype=response" + Crlf +
      s"Content-Length: ${payload.length}" + Crlf + Crlf).getBytes(UTF_8))
    out.write(payload)
    out.write((Crlf + Crlf).getBytes(UTF_8))
    out.toByteArray
  }

  /** One gzip member per record (the Common-Crawl framing — a reader
    * resynchronizes at any member boundary). */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }

  /**
   * Write (url, iso-ts, html) rows as `part-NNNNN.warc.gz`, one file per
   * partition, each record its own gzip member. Returns files written.
   */
  def writeWarc(pages: Dataset[(String, String, Array[Byte])], dir: String): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val counts = pages.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val name = f"part-$pid%05d.warc.gz"
        val tmp = java.nio.file.Paths.get(dir, s".tmp-$name")
        val fin = java.nio.file.Paths.get(dir, name)
        val os = java.nio.file.Files.newOutputStream(tmp)
        var n = 0L
        try {
          it.foreach { case (url, tsIso, html) =>
            os.write(gzipMember(recordBytes(url, tsIso, html)))
            n += 1
          }
        } finally os.close()
        java.nio.file.Files.move(tmp, fin,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        Iterator.single(n)
      }
    }.collect()
    counts.length.toLong
  }

  /** One parsed record, or one quarantine row (ok = false). */
  final case class WarcRow(path: String, record_idx: Long, ok: Boolean,
                           err: String, url: String, warc_date: String,
                           warc_type: String, html: Array[Byte])

  /** Decode ONE gzip member at bytes[pos..]; returns (data, posAfter).
    * Hand-parsed header + raw Inflater so the consumed length is EXACT
    * (GZIPInputStream buffers ahead and cannot say where it stopped). */
  private[graft] def gunzipMember(bytes: Array[Byte], pos: Int): (Array[Byte], Int) = {
    if (pos + 10 > bytes.length) throw new EOFException("truncated gzip header")
    if ((bytes(pos) & 0xff) != 0x1f || (bytes(pos + 1) & 0xff) != 0x8b)
      throw new IllegalArgumentException("bad gzip magic")
    if (bytes(pos + 2) != 8)
      throw new IllegalArgumentException(s"unsupported CM ${bytes(pos + 2)}")
    val flg = bytes(pos + 3) & 0xff
    var p = pos + 10
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2 + xlen
    }
    if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, p, bytes.length - p)
      val out = new ByteArrayOutputStream(math.max(64, bytes.length - p))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput())
          throw new EOFException("truncated deflate stream")
        out.write(buf, 0, n)
      }
      val next = p + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE trailer
      if (next > bytes.length) throw new EOFException("truncated gzip trailer")
      (out.toByteArray, next)
    } finally inf.end()
  }

  /** Parse ONE uncompressed WARC record from the stream head; None on a
    * clean trailing blank region. */
  private[graft] def parseRecord(in: InputStream): Option[(Map[String, String], Array[Byte])] = {
    def readLine(eofOk: Boolean): Option[String] = {
      // accumulate BYTES and decode the whole line as UTF-8: writeWarc
      // encodes headers as UTF-8, so per-byte toChar (Latin-1) would
      // silently mojibake a non-ASCII WARC-Target-URI instead of
      // round-tripping it byte-for-byte
      val bos = new ByteArrayOutputStream(64)
      var b = in.read()
      if (b < 0) { if (eofOk) return None else throw new EOFException("eof in headers") }
      while (b >= 0 && b != '\n') { bos.write(b); b = in.read() }
      val s = new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      Some(if (s.endsWith("\r")) s.dropRight(1) else s)
    }
    var first = readLine(eofOk = true).getOrElse(return None)
    while (first.isEmpty) first = readLine(eofOk = true).getOrElse(return None)
    if (!first.startsWith("WARC/"))
      throw new IllegalArgumentException(s"bad record magic: '${first.take(20)}'")
    var headers = Map.empty[String, String]
    var line = readLine(eofOk = false).get
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i < 0) throw new IllegalArgumentException(s"bad header: '${line.take(40)}'")
      headers += line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
      line = readLine(eofOk = false).get
    }
    val len = headers.getOrElse("content-length",
      throw new IllegalArgumentException("missing Content-Length")).toInt
    if (len < 0) throw new IllegalArgumentException(s"negative Content-Length $len")
    val payload = new Array[Byte](len)
    var off = 0
    while (off < len) {
      val r = in.read(payload, off, len - off)
      if (r < 0) throw new EOFException(s"payload truncated at $off/$len")
      off += r
    }
    Some((headers, payload))
  }

  /** HTTP response payload -> body bytes (after the CRLFCRLF). */
  private[graft] def httpBody(payload: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i + 3 < payload.length &&
      !(payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')) i += 1
    if (i + 4 > payload.length) Array.emptyByteArray
    else java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
  }

  /** Next gzip magic (1f 8b 08) at offset >= from, or -1. */
  private def nextMagic(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    while (i + 2 < bytes.length) {
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
        bytes(i + 2) == 8) return i
      i += 1
    }
    -1
  }

  /** Parse one whole segment file; exact-resync quarantine semantics. */
  private[graft] def parseFile(path: String, bytes: Array[Byte]): Seq[WarcRow] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[WarcRow]
    var pos = 0
    var idx = 0L
    while (pos >= 0 && pos < bytes.length) {
      try {
        val (data, next) = gunzipMember(bytes, pos)
        val in = new ByteArrayInputStream(data)
        var more = true
        while (more) {
          parseRecord(in) match {
            case Some((h, payload)) =>
              val wtype = h.getOrElse("warc-type", "")
              val body = if (wtype == "response") httpBody(payload) else payload
              rows += WarcRow(path, idx, ok = true, "",
                h.getOrElse("warc-target-uri", ""),
                h.getOrElse("warc-date", ""), wtype, body)
              idx += 1
            case None => more = false
          }
        }
        pos = next
      } catch {
        case e: Exception =>
          rows += WarcRow(path, idx, ok = false,
            s"offset $pos: ${e.getClass.getSimpleName}: ${e.getMessage}",
            "", "", "", Array.emptyByteArray)
          idx += 1
          pos = nextMagic(bytes, pos + 1)
      }
    }
    rows.toSeq
  }

  /**
   * Read `.warc.gz` segments (path or glob) into one row per record
   * (plus ok = false quarantine rows). File-level parallelism: one task
   * decompresses one segment.
   */
  def readWarc(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseFile(path, bytes) }
      .toDF()
  }
}
