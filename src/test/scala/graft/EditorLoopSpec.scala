package graft

import graft.core.GraftDb
import graft.model.{Child, Gid, Node}
import graft.view.{Bindings, Markup, SyncedSection, VBlock}
import org.scalatest.funsuite.AnyFunSuite

/** The full editor loop end-to-end: markup in → nodes → tile out →
  * markup out → sync back — content and styles survive the round trip
  * (the reference's refresh/sync contract).
  */
class EditorLoopSpec extends AnyFunSuite {

  test("tile blocks re-serialize to markup and sync back unchanged") {
    val db = new GraftDb
    val bindings = new Bindings(db)
    val sources = Vector(
      "# A Heading",
      "plain text with *bold* and _italic_ pieces",
      "> a quote with `code`",
      "- a list item, with ~struck~ text")

    val tile1 = bindings.sync(None, Vector(SyncedSection.Edited(sources)))
    val blocks1 = tile1.sections.flatMap(_.subsections).map(_.block)
    assert(blocks1.length === sources.length)

    // serialize the rendered blocks back to markup
    val markupOut = blocks1.map(Markup.fromBlock)
    assert(markupOut === sources)

    // edit round 2: sync the serialized markup back into the same tile
    val tile2 = bindings.sync(Some(tile1.id), Vector(SyncedSection.Edited(markupOut)))
    val blocks2 = tile2.sections.flatMap(_.subsections).map(_.block)
    assert(blocks2 === blocks1)

    // and the DB content is searchable
    assert(db.search("bold").nonEmpty)
    assert(db.search("a quote with").exists(_.score == 1.0f))
  }

  test("mixed existing + edited sync preserves untouched sections") {
    val db = new GraftDb
    val bindings = new Bindings(db)
    val keepId = db.add(Node.page(Node.Text("keep me intact")))
    db.push(Gid.root, Child.Lazy(keepId))

    val tile = bindings.sync(Some(Gid.root), Vector(
      SyncedSection.Existing(keepId),
      SyncedSection.Edited(Vector("new *content*"))))

    assert(db.get(keepId).isDefined)
    val texts = tile.sections.flatMap(_.subsections).map(_.block).collect {
      case VBlock.Text(_, spans) => spans.collect { case graft.view.VSpan.Text(_, t) => t }.mkString
    }
    assert(texts.contains("keep me intact"))
    assert(texts.contains("new content"))
  }
}
