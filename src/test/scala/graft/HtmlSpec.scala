package graft

import graft.ops.Html
import org.scalatest.funsuite.AnyFunSuite

/** HTML → text extraction: state-machine closed cases (tag soup is the
  * threat model — a crawl extractor must be lenient and deterministic,
  * never throwing), entity decode table, block segmentation, and the
  * encode ∘ extract closed form the q184 oracle replays.
  */
class HtmlSpec extends AnyFunSuite {

  private def ex(s: String) = Html.extract(s)

  test("plain text passes through normalized") {
    val e = ex("hello   world")
    assert(e.text === "hello world")
    assert(e.nTags === 0 && e.nBlocks === 1 && e.nEntities === 0)
  }

  test("inline tags strip without a break; block tags separate") {
    val e = ex("<div><a href='/'>home</a> | <a href='/x'>about</a></div><p>body text</p>")
    assert(e.text === "home | about\nbody text")
    assert(e.nBlocks === 2)
    assert(e.nTags === 8)
  }

  test("script and style bodies drop whole, including tag-like content") {
    val e = ex("<p>a</p><script>if (1 < 2) { document.write('<p>no</p>'); }</script><style>p > a { color: red }</style><p>b</p>")
    assert(e.text === "a\nb")
    assert(e.nScriptBlocks === 1 && e.nStyleBlocks === 1)
    // only the four p tags count; script/style open+close are counted
    // in their own block counters
    assert(e.nTags === 4)
  }

  test("case-insensitive tags and close-tag scan") {
    val e = ex("<P>a</P><SCRIPT>x</ScRiPt><BR>b")
    assert(e.text === "a\nb")
    assert(e.nScriptBlocks === 1)
  }

  test("comments drop, counted") {
    val e = ex("a<!-- hidden <p>not a tag</p> -->b")
    assert(e.text === "ab")
    assert(e.nComments === 1 && e.nTags === 0)
  }

  test("quoted '>' inside an attribute does not close the tag") {
    val e = ex("""<a title="1 > 0" href='q>r'>link</a>""")
    assert(e.text === "link")
    assert(e.nTags === 2)
  }

  test("entity decode: named, numeric, hex, nbsp, unknown passes through") {
    val e = ex("&amp;&lt;&gt;&quot;&apos;&#65;&#x42;x&nbsp;y &unknown; &amp")
    assert(e.text === "&<>\"'ABx y &unknown; &amp")
    assert(e.nEntities === 8)
  }

  test("lenient on malformation: unterminated tag, comment, script") {
    assert(ex("a<p unterminated").text === "a")
    assert(ex("a<!-- never closed").text === "a")
    assert(ex("a<script>never closed").text === "a")
    assert(ex("<>a").text === "a") // empty tag name
    assert(ex(null).text === "")
  }

  test("whitespace normalization: runs collapse, lines trim, empties drop") {
    val e = ex("<p>  a   b\t c </p><p>   </p><p>\r d</p>")
    assert(e.text === "a b c\nd")
    assert(e.nBlocks === 2)
  }

  test("boilerplate subtrees suppress: head, nav, aside, footer") {
    val e = ex("<html><head><title>Site &amp; Chrome</title></head><body>" +
      "<nav><a href='/'>home</a></nav><p>real content</p>" +
      "<aside>related links</aside><footer>© site</footer></body></html>")
    assert(e.text === "real content")
    assert(e.nBoilerplate === 4)
    // tags inside suppressed regions still count (title + a + closers)
    assert(e.nTags > 10)
    // the title's entity never decodes into the output — uncounted
    assert(e.nEntities === 0)
  }

  test("encode ∘ extract closed form (the q184 contract)") {
    val text = "first  line with & and <tags>\n\nsecond line > end\n"
    val e = ex(Html.encodePage(text))
    assert(e.text === "first line with & and <tags>\nsecond line > end")
    val rawLines = 4 // split("\n", -1) of the input
    assert(e.nTags === 15 + 2 * rawLines)
    assert(e.nScriptBlocks === 1 && e.nStyleBlocks === 1 && e.nComments === 1)
    assert(e.nEntities === 4) // the input's & < > > (head's &amp; suppressed)
    assert(e.nBlocks === 2)
    assert(e.nBoilerplate === 2) // head + nav
  }

  test("roundtrip property over random printable text") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val chars = "ab &<>\"'\n\t#."
      val text = Seq.fill(rnd.nextInt(60))(chars(rnd.nextInt(chars.length))).mkString
      val e = ex(Html.encodePage(text))
      val expected = text.split("\n", -1).toList
        .map(_.replaceAll("[ \t\r]+", " ").trim)
        .filter(_.nonEmpty).mkString("\n")
      assert(e.text === expected, s"for input ${text.map(_.toInt).mkString(",")}")
      assert(e.nEntities === text.count(c => c == '&' || c == '<' || c == '>'))
    }
  }
}
