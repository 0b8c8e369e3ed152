package graft

import graft.core.GraftDb
import graft.model.{Child, Gid, Node}
import graft.view.{Bindings, SyncedSection, ViewJson}
import org.scalatest.funsuite.AnyFunSuite

/** JSON exchange format, shape-matched to the reference's serde output
  * (model.rs annotations + the documented markup_to_json expectation).
  */
class ViewJsonSpec extends AnyFunSuite {

  test("markup_to_json matches the reference's documented output") {
    assert(ViewJson.markupToJson("*some markup*") ===
      """{"type":"Text","spans":[{"type":"Text","styles":["Bold"],"text":"some markup"}]}""")
  }

  test("block styles serialize with PascalCase names, empty styles omitted") {
    assert(ViewJson.markupToJson("># quoted heading") ===
      """{"type":"Text","styles":["Heading","Quote"],"spans":[{"type":"Text","text":"quoted heading"}]}""")
  }

  test("json_to_markup parses field-order-free JSON and rejects non-markup blocks") {
    // reference markup.rs:225-231: JSON block -> block_to_markup
    assert(ViewJson.jsonToMarkup(
      """{"type":"Text","spans":[{"type":"Text","styles":["Bold"],"text":"some markup"}]}""")
      === "*some markup*")
    // field order is free in JSON; unicode + escape forms decode
    assert(ViewJson.jsonToMarkup(
      """{ "spans": [ {"text": "aA\\b", "type": "Text"} ], "styles": ["Quote"], "type": "Text" }""")
      === "> aA\\\\b")
    // no markup form: cyclic blocks and link spans throw, as in the
    // reference's Err results
    assertThrows[IllegalArgumentException](
      ViewJson.jsonToMarkup("""{"type":"Cyclic"}"""))
    assertThrows[IllegalArgumentException](
      ViewJson.jsonToMarkup(
        """{"type":"Text","spans":[{"type":"Link","link":{}}]}"""))
    assertThrows[IllegalArgumentException](
      ViewJson.jsonToMarkup("""{"type":"Text","spans":[]} trailing"""))
    assertThrows[IllegalArgumentException](
      ViewJson.jsonToMarkup("""{"type":"Text","spans":[{"type":"Text","text":"unterminat"""))
    // malformed \u escapes fail with the documented error, not
    // NumberFormatException / StringIndexOutOfBounds
    assertThrows[IllegalArgumentException](
      ViewJson.jsonToMarkup(
        "{\"type\":\"Text\",\"spans\":[{\"type\":\"Text\",\"text\":\"a\\" + "uZZ99b\"}]}"))
    assertThrows[IllegalArgumentException](
      ViewJson.jsonToMarkup(
        "{\"type\":\"Text\",\"spans\":[{\"type\":\"Text\",\"text\":\"a\\" + "u00"))
    // a valid \u escape still decodes
    assert(ViewJson.jsonToMarkup(
      "{\"type\":\"Text\",\"spans\":[{\"type\":\"Text\",\"text\":\"a\\" + "u0041b\"}]}") === "aAb")
  }

  test("tile serializes to stable tagged JSON") {
    val db = new GraftDb
    val bindings = new Bindings(db)
    val id1 = db.add(Node.text("foo"))
    db.push(Gid.root, Child.Lazy(id1))
    val tile = bindings.sync(Some(Gid.root), Vector(
      SyncedSection.Existing(id1),
      SyncedSection.Edited(Vector("# bar"))))
    val json = ViewJson.tile(tile)
    assert(json.startsWith("{\"id\":\"00000000-0000-0000-0000-000000000000\""))
    assert(json.contains("\"preview\":{\"type\":\"Text\""))
    assert(json.contains("\"hasMultipleParents\":false"))
    assert(json.contains("\"styles\":[\"Heading\"]"))
    assert(json.contains("\"text\":\"bar\""))
    // escaping round-trips control characters safely
    assert(ViewJson.markupToJson("a\\\"b\tc").contains("\\\"") )
  }
}
