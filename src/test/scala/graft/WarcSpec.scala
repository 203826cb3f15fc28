package graft

import java.nio.charset.StandardCharsets.UTF_8
import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def pages(n: Int): Seq[(String, String, Array[Byte])] =
    (0 until n).map { i =>
      (s"https://example.org/d$i", f"2026-01-01T00:${i % 60}%02d:00Z",
        s"<html><body><p>doc $i body</p></body></html>".getBytes(UTF_8))
    }

  private def rowTuples(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
    (r.getString(0), r.getLong(1), r.getBoolean(2), r.getString(3),
      r.getString(4), r.getString(5), r.getString(6), r.getAs[Array[Byte]](7))
  }

  test("round trip: writeWarc -> readWarc reproduces every record byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("warc_rt").toString
    val ps = pages(25)
    val nFiles = Warc.writeWarc(ps.toDS().repartition(3), dir)
    assert(nFiles == 3L)
    val got = rowTuples(Warc.readWarc(spark, dir))
    assert(got.forall(_._3), "all records must parse ok")
    assert(got.length == 25)
    val byUrl = got.map(r => r._5 -> ((r._6, r._8))).toMap
    ps.foreach { case (url, ts, html) =>
      val (gts, ghtml) = byUrl(url)
      assert(gts == ts && java.util.Arrays.equals(ghtml, html), url)
    }
    assert(got.forall(_._8.startsWith("<html>".getBytes(UTF_8))),
      "http headers must be stripped from the body")
  }

  test("non-ASCII WARC-Target-URI round-trips byte-for-byte (UTF-8 headers)") {
    // regression (ADVICE r5): readLine decoded header bytes per-byte via
    // toChar (Latin-1) while writeWarc encodes UTF-8 — a non-ASCII URI
    // silently mojibake'd instead of round-tripping
    val url = "https://example.org/café/日本語"
    val rec = Warc.recordBytes(url, "2026-01-01T00:00:00Z",
      "<html><body>x</body></html>".getBytes(UTF_8))
    val rows = graft.sources.Warc.parseFile("f", Warc.gzipMember(rec))
    assert(rows.length == 1 && rows.head.ok, rows.map(_.err).mkString)
    assert(rows.head.url == url,
      s"URI must survive UTF-8 round-trip, got '${rows.head.url}'")
  }

  test("a corrupt middle member quarantines ONE row and the reader resyncs exactly") {
    val ps = pages(3)
    val members = ps.map { case (u, t, h) => Warc.gzipMember(Warc.recordBytes(u, t, h)) }
    val bytes = members(0) ++ members(1).updated(20, 0x55.toByte) ++ members(2)
    val rows = graft.sources.Warc.parseFile("f", bytes)
    val ok = rows.filter(_.ok)
    val bad = rows.filterNot(_.ok)
    assert(ok.map(_.url).toSet === Set(ps(0)._1, ps(2)._1),
      s"records 0 and 2 must survive; got ${rows.map(r => (r.ok, r.url, r.err))}")
    assert(bad.nonEmpty && bad.forall(_.err.nonEmpty),
      "the corrupt member must quarantine loudly")
  }

  test("a truncated segment quarantines the tail and keeps every complete record") {
    val ps = pages(3)
    val members = ps.map { case (u, t, h) => Warc.gzipMember(Warc.recordBytes(u, t, h)) }
    val whole = members.reduce(_ ++ _)
    val cut = whole.take(whole.length - members(2).length / 2)
    val rows = graft.sources.Warc.parseFile("f", cut)
    assert(rows.filter(_.ok).map(_.url) === Seq(ps(0)._1, ps(1)._1))
    assert(rows.exists(r => !r.ok && r.err.contains("truncated")))
  }

  test("non-response WARC types pass the raw payload through") {
    val meta = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "Content-Length: 11\r\n\r\nhello warc!\r\n\r\n").getBytes(UTF_8)
    val rows = graft.sources.Warc.parseFile("f", Warc.gzipMember(meta))
    assert(rows.length == 1 && rows.head.ok && rows.head.warc_type == "warcinfo")
    assert(new String(rows.head.html, UTF_8) == "hello warc!")
  }

  test("several records inside ONE gzip member all parse (framing tolerance)") {
    val ps = pages(4)
    val fat = Warc.gzipMember(
      ps.map { case (u, t, h) => Warc.recordBytes(u, t, h) }.reduce(_ ++ _))
    val rows = graft.sources.Warc.parseFile("f", fat)
    assert(rows.forall(_.ok) && rows.map(_.url) === ps.map(_._1))
  }
}
