package graft.view

import scala.collection.immutable.SortedSet

/** JSON serialization of the view model, shape-compatible with the
  * reference's serde output (assemblage_view/src/model.rs): tagged
  * enums (`"type": "Text" | "Link" | "Cyclic" | "Sibling"`), PascalCase
  * style names, empty collections skipped, `hasMultipleParents`
  * casing — the frontend exchange format
  * (markup.rs markup_to_json: `{"type":"Text","spans":[{"type":"Text",
  * "styles":["Bold"],"text":"some markup"}]}`).
  */
object ViewJson {

  private val styleNames = Map(
    "BOLD" -> "Bold", "ITALIC" -> "Italic", "STRUCK" -> "Struck", "CODE" -> "Code",
    "HEADING" -> "Heading", "LIST" -> "List", "QUOTE" -> "Quote", "ASIDE" -> "Aside")

  /** Reference serde order = the enum-derived BTreeSet order, not
    * lexicographic (SpanStyle: Bold<Italic<Struck<Code; BlockStyle:
    * Heading<List<Quote<Aside).
    */
  private val enumOrder = Vector(
    "BOLD", "ITALIC", "STRUCK", "CODE", "HEADING", "LIST", "QUOTE", "ASIDE")
    .zipWithIndex.toMap

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def styles(st: SortedSet[String]): Option[String] =
    if (st.isEmpty) None
    else Some("\"styles\":[" + st.toSeq.sortBy(enumOrder.getOrElse(_, 99))
      .map(s => jstr(styleNames.getOrElse(s, s))).mkString(",") + "]")

  private def obj(fields: Option[String]*): String =
    fields.flatten.mkString("{", ",", "}")

  def span(s: VSpan): String = s match {
    case VSpan.Text(st, text) =>
      obj(Some("\"type\":\"Text\""), styles(st), Some("\"text\":" + jstr(text)))
    case VSpan.Link(st, link) =>
      obj(Some("\"type\":\"Link\""), styles(st), Some("\"link\":" + lineage(link)))
  }

  def block(b: VBlock): String = b match {
    case VBlock.Text(st, spans) =>
      obj(Some("\"type\":\"Text\""), styles(st),
        Some("\"spans\":[" + spans.map(span).mkString(",") + "]"))
    case VBlock.Cyclic => "{\"type\":\"Cyclic\"}"
  }

  def previewLink(p: PreviewLink): String =
    obj(Some("\"id\":" + jstr(p.id.toString)), Some("\"block\":" + block(p.block)))

  def lineage(l: Lineage): String =
    obj(
      Some("\"descendant\":" + previewLink(l.descendant)),
      l.ancestor.map(a => "\"ancestor\":" + previewLink(a)),
      Some("\"descent\":[" + l.descent.map(p =>
        obj(Some("\"id\":" + jstr(p.id.toString)), Some("\"index\":" + p.index))).mkString(",") + "]"))

  def branch(b: Branch): String =
    obj(Some("\"type\":\"Sibling\""),
      Some("\"link\":" + lineage(b.link)),
      Some("\"timestamp\":" + b.timestamp))

  def subsection(s: Subsection): String =
    obj(
      Some("\"id\":" + jstr(s.id.toString)),
      Some("\"block\":" + block(s.block)),
      if (s.before.isEmpty) None
      else Some("\"before\":[" + s.before.map(branch).mkString(",") + "]"),
      if (s.after.isEmpty) None
      else Some("\"after\":[" + s.after.map(branch).mkString(",") + "]"))

  def section(s: Section): String =
    obj(
      Some("\"id\":" + s.id.map(i => jstr(i.toString)).getOrElse("null")),
      Some("\"hasMultipleParents\":" + s.hasMultipleParents),
      Some("\"subsections\":[" + s.subsections.map(subsection).mkString(",") + "]"))

  def broadcastMeta(b: graft.core.BroadcastMeta): String =
    obj(
      Some("\"broadcast_id\":" + jstr(b.broadcastId.toString)),
      Some("\"node_id\":" + jstr(b.nodeId.toString)),
      Some("\"last_updated\":" + b.lastUpdated),
      b.expiration.map(e => "\"expiration\":" + e))

  def tile(t: Tile): String =
    obj(
      Some("\"id\":" + jstr(t.id.toString)),
      Some("\"preview\":" + block(t.preview)),
      Some("\"broadcasts\":[" + t.broadcasts.map(broadcastMeta).mkString(",") + "]"),
      Some("\"sections\":[" + t.sections.map(section).mkString(",") + "]"),
      Some("\"branches\":[" + t.branches.map(branch).mkString(",") + "]"))

  /** The markup_to_json entry (markup.rs, wasm bindings). */
  def markupToJson(markup: String): String = block(Markup.toBlock(markup))
}
