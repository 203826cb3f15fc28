package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextExtract
import graft.gen.CorpusGen

class TextExtractSpec extends AnyFunSuite {

  test("entity decoding: named, decimal, hex, unknown left verbatim") {
    assert(TextExtract.decodeEntities("a &amp; b &lt;x&gt; &quot;q&quot; &#65; &#x42; &nope; &") ==
      "a & b <x> \"q\" A B &nope; &")
  }

  test("extractText strips tags, scripts, styles, comments, title") {
    val html = "<html><head><title>T</title><style>x{}</style></head>" +
      "<body><p>hello   world</p><script>var a=1;</script><div>bye</div><!-- c --></body></html>"
    assert(TextExtract.extractTextStr(html) == "hello world\nbye")
  }

  test("block tags produce line breaks, inline tags do not") {
    assert(TextExtract.extractTextStr("<b>a</b><i>b</i><br>c") == "ab\nc")
  }

  test("corpus generator roundtrip: extractText(htmlFor(text)) == expectedText(text)") {
    val texts = Seq(
      "the fast key order sort table scan merge part window small hash",
      "a", "x & y < z > w", "one two three four five six seven eight nine ten eleven twelve thirteen")
    for (t <- texts) {
      val html = CorpusGen.htmlFor(7L, t, "en", "src0")
      assert(TextExtract.extractText(html) == CorpusGen.expectedText(t), s"text=$t")
    }
  }

  test("roundtrip property: random token texts survive byte-identically (seeded)") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "X", "Y", "Z", "0", "1", "9", "&", "<", ">",
      "।", ".", "!", "?", "é", "漢", "😀") // code-point strings (incl. non-BMP)
    for (_ <- 1 to 200) {
      val nTok = 1 + rnd.nextInt(40)
      val t = Seq.fill(nTok) {
        val len = 1 + rnd.nextInt(8)
        Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      }.mkString(" ")
      val html = CorpusGen.htmlFor(1L, t, "xx", "s")
      assert(TextExtract.extractText(html) == CorpusGen.expectedText(t), s"text=[$t]")
    }
  }

  test("sentence split: newline, terminal punctuation, danda") {
    assert(TextExtract.sentences("a b. c d\ne f। g") ==
      Seq(Seq("a", "b."), Seq("c", "d"), Seq("e", "f।"), Seq("g")))
  }

  test("codePoints iterates code points, not UTF-16 chars (Python parity)") {
    val s = "a😀b" // a, 😀, b
    assert(TextExtract.codePoints(s).toSeq == Seq("a", "😀", "b"))
  }

  test("extraction is a pure function (same bytes -> same string, repeated)") {
    val html = CorpusGen.htmlFor(3L, "alpha beta & <gamma>", "en", "s")
    val a = TextExtract.extractText(html)
    val b = TextExtract.extractText(html.clone())
    assert(a == b)
  }
}
