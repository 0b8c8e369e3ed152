package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML → text boilerplate extraction — the operator every real crawl
  * pipeline runs on day one (CCNet/Gopher/RefinedWeb class): crawl
  * payloads are HTML, and everything downstream (quality rules, dedup,
  * decontamination, tokenization) wants clean text.
  *
  * [[extract]] is a single-pass character state machine (the
  * `view/Markup.scala` discipline — lenient on malformed input, never
  * throws: untrusted crawl bytes are the input, and a crawl extractor
  * that dies on tag soup extracts nothing):
  *
  *   - `<script …>…</script>` and `<style …>…</style>` dropped whole
  *     (case-insensitive close-tag scan), counted per block;
  *   - `<!-- … -->` comments dropped, counted;
  *   - every other `<…>` tag stripped (quote-aware: a `>` inside a
  *     quoted attribute does not close the tag), counted; BLOCK tags
  *     (p/div/br/li/h1–h6/tr/table/…) emit a line break, inline tags
  *     (a/span/b/i/em/strong/…) emit nothing — so "<a>read</a> |
  *     <a>more</a>" reads "read | more" and paragraphs separate;
  *   - BOILERPLATE subtrees (`head`, `nav`, `aside`, `footer`)
  *     suppress wholesale — metadata and page chrome never reach the
  *     token stream (counted per subtree; tags inside still count);
  *   - entities decoded in text runs: the named five (amp/lt/gt/quot/
  *     apos) + nbsp (→ space) + numeric `&#NNN;` / `&#xHH;`, counted;
  *     unknown `&foo;` passes through literally, uncounted;
  *   - normalization: per line, runs of spaces/tabs/CRs collapse to
  *     one space and the line is trimmed; empty lines drop; surviving
  *     lines (= blocks) join with '\n'.
  *
  * [[asHtml]] is the deterministic inverse-direction encoder (the WARC
  * `asWarcDocs` discipline): wraps plain text in a realistic page —
  * doctype, head with an entity-bearing title, a style block, a script
  * block, a comment, a nav with inline links, one `<p>` per raw
  * input line with `&`/`<`/`>` entity-encoded — so extract ∘ encode is
  * CLOSED FORM over the original text and the q184 DuckDB oracle
  * replays it exactly: the extracted text IS the normalized input
  * (head/nav suppress), and every per-rule count is arithmetic in the
  * input's line/char counts. The suppression is also what makes the
  * q186 crawl routing exact: an HTML page's SimHash tokens equal its
  * plain-text form's, so the wrapped twin pairs at Hamming 0 instead
  * of drifting on markup chrome.
  *
  * Scale shape: pure map-side (one projection, zero shuffles, zero
  * driver state); the state machine is O(bytes) with no backtracking.
  */
object Html {

  /** Result of one extraction. */
  final case class Extracted(
      text: String,
      nTags: Long,
      nScriptBlocks: Long,
      nStyleBlocks: Long,
      nComments: Long,
      nEntities: Long,
      nBlocks: Long,
      nBoilerplate: Long)

  /** Subtrees suppressed wholesale — the boilerplate-removal set every
    * real extraction pipeline applies: `<head>` is metadata, and
    * nav/aside/footer are page chrome that would otherwise pollute the
    * token stream of every page on a site (the mass-duplication the
    * dedup family then has to fight). Tags inside a suppressed region
    * still count (the walk continues), but no text, breaks or entities
    * emit.
    */
  private val SuppressTags: Set[String] = Set("head", "nav", "aside", "footer")

  /** Tags that separate blocks (emit a line break when opened OR
    * closed). Everything else is inline.
    */
  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "tr", "td", "th", "table",
    "thead", "tbody", "tfoot", "caption", "section", "article",
    "header", "footer", "nav", "aside", "main", "blockquote", "pre",
    "form", "fieldset", "title", "head", "body", "html",
    "figure", "figcaption", "address")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Single-pass extraction; lenient, never throws. */
  def extract(html: String): Extracted = {
    if (html == null) return Extracted("", 0, 0, 0, 0, 0, 0, 0)
    val n = html.length
    val out = new java.lang.StringBuilder(n / 2)
    var i = 0
    var nTags = 0L; var nScript = 0L; var nStyle = 0L
    var nComments = 0L; var nEntities = 0L
    var nBoiler = 0L
    var suppress = 0 // depth inside head/nav/aside/footer subtrees
    // scan for a case-insensitive "</name" and return the index AFTER
    // the closing '>' (or end of input when unterminated — lenient)
    def skipToCloseTag(from: Int, name: String): Int = {
      val needle = "</" + name
      var p = from
      while (p < n) {
        if (p + needle.length <= n &&
            html.regionMatches(true, p, needle, 0, needle.length)) {
          var q = p + needle.length
          while (q < n && html.charAt(q) != '>') q += 1
          return if (q < n) q + 1 else n
        }
        p += 1
      }
      n
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(false, i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          nComments += 1
          i = if (end < 0) n else end + 3
        } else {
          // read the tag name (letters/digits after optional '/')
          var p = i + 1
          val closing = p < n && html.charAt(p) == '/'
          if (closing) p += 1
          val nameStart = p
          while (p < n && (html.charAt(p).isLetterOrDigit)) p += 1
          val name = html.substring(nameStart, p).toLowerCase(java.util.Locale.ROOT)
          // advance to the tag's real end, honoring quoted attributes
          var q = p
          var quote: Char = 0
          while (q < n && (quote != 0 || html.charAt(q) != '>')) {
            val ch = html.charAt(q)
            if (quote == 0 && (ch == '"' || ch == '\'')) quote = ch
            else if (quote != 0 && ch == quote) quote = 0
            q += 1
          }
          val tagEnd = if (q < n) q + 1 else n
          if (!closing && name == "script") { nScript += 1; i = skipToCloseTag(tagEnd, "script") }
          else if (!closing && name == "style") { nStyle += 1; i = skipToCloseTag(tagEnd, "style") }
          else {
            nTags += 1
            if (SuppressTags(name)) {
              if (closing) suppress = math.max(0, suppress - 1)
              else { suppress += 1; nBoiler += 1 }
            }
            if (suppress == 0 && BlockTags(name)) out.append('\n')
            i = tagEnd
          }
        }
      } else if (suppress > 0) {
        i += 1 // suppressed text: nothing emits, entities uncounted
      } else if (c == '&') {
        // try to decode an entity; on failure the '&' is literal text
        var p = i + 1
        var decoded: String = null
        var after = i + 1
        if (p < n && html.charAt(p) == '#') {
          p += 1
          val hex = p < n && (html.charAt(p) == 'x' || html.charAt(p) == 'X')
          if (hex) p += 1
          val digStart = p
          while (p < n && (if (hex) Character.digit(html.charAt(p), 16) >= 0
                           else html.charAt(p).isDigit)) p += 1
          if (p > digStart && p < n && html.charAt(p) == ';' && p - digStart <= 6) {
            val cp = java.lang.Integer.parseInt(html.substring(digStart, p), if (hex) 16 else 10)
            if (Character.isValidCodePoint(cp)) {
              decoded = new String(Character.toChars(cp)); after = p + 1
            }
          }
        } else {
          val nameStart = p
          while (p < n && html.charAt(p).isLetter && p - nameStart < 8) p += 1
          if (p < n && html.charAt(p) == ';') {
            NamedEntities.get(html.substring(nameStart, p)) match {
              case Some(s) => decoded = s; after = p + 1
              case None    => ()
            }
          }
        }
        if (decoded != null) { out.append(decoded); nEntities += 1; i = after }
        else { out.append('&'); i += 1 }
      } else {
        out.append(c)
        i += 1
      }
    }
    // normalize: collapse space/tab/CR runs per line, trim, drop empties
    val lines = out.toString.split("\n", -1)
    val kept = new scala.collection.mutable.ArrayBuffer[String](lines.length)
    var li = 0
    while (li < lines.length) {
      val t = lines(li).replaceAll("[ \t\r]+", " ").trim
      if (t.nonEmpty) kept += t
      li += 1
    }
    Extracted(kept.mkString("\n"), nTags, nScript, nStyle, nComments,
      nEntities, kept.length, nBoiler)
  }

  /** Entity-encode the three structural characters. */
  private[graft] def encodeEntities(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic page around `text` — see the object scaladoc for
    * the closed-form contract the q184 oracle replays. 15 non-script/
    * style tags fixed (doctype + html/head/title/body/nav/2×a and
    * closers) + 2 per input line; 1 script, 1 style, 1 comment;
    * 2 boilerplate subtrees (head, nav — their text, including the
    * title's entity, is suppressed); entities = one per `&`/`<`/`>`
    * in the input; blocks = the nonempty normalized input lines; the
    * extracted text is exactly the normalized input.
    */
  private[graft] def encodePage(text: String): String = {
    val body = (if (text == null) Array("") else text.split("\n", -1))
      .map(l => s"<p>${encodeEntities(l)}</p>").mkString("\n")
    s"""<!DOCTYPE html><html><head><title>Doc &amp; Title</title><style>body { margin: 0; }</style><script>var x = 1 < 2;</script></head><body><!-- boilerplate comment --><nav><a href="/">home</a> | <a href="/about">about</a></nav>
$body</body></html>"""
  }

  /** (doc_id, html) frame wrapping each doc's text via [[encodePage]]. */
  def asHtml(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val enc = udf { (text: String) => encodePage(text) }
    docs.select(col(idCol).cast("long").as("doc_id"), enc(col(textCol)).as("html"))
  }

  /** Extraction over an (id, html) frame → (doc_id, text, per-rule
    * counts). Pure map-side.
    */
  def htmlText(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val ex = udf { (html: String) => extract(html) }
    docs.select(col(idCol).cast("long").as("doc_id"), ex(col(htmlCol)).as("e"))
      .select(
        col("doc_id"),
        col("e.text").as("text"),
        col("e.nTags").as("n_tags"),
        col("e.nScriptBlocks").as("n_script_blocks"),
        col("e.nStyleBlocks").as("n_style_blocks"),
        col("e.nComments").as("n_comments"),
        col("e.nEntities").as("n_entities"),
        col("e.nBlocks").as("n_blocks"),
        col("e.nBoilerplate").as("n_boilerplate"))
  }
}
