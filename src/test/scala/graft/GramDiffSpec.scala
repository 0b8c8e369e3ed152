package graft

import graft.core.GramDiff
import graft.model.Gid
import org.scalatest.funsuite.AnyFunSuite

/** Diff semantics from assemblage_db/src/index.rs:768-813: per (gram,
  * id) the new occurrence count, 0 for vanished postings.
  */
class GramDiffSpec extends AnyFunSuite {
  private val id1 = Gid(0, 1)
  private val id2 = Gid(0, 2)

  test("added id contributes its occurrence counts") {
    val d = GramDiff(Map.empty[Gid, Array[Int]], Map(id1 -> Array(5, 5, 7)))
    assert(d.byGram === Map(5 -> Map(id1 -> 2), 7 -> Map(id1 -> 1)))
    assert(d.ids === Set(id1))
  }

  test("removed id zeroes all its grams") {
    val d = GramDiff(Map(id1 -> Array(5, 7)), Map.empty[Gid, Array[Int]])
    assert(d.byGram === Map(5 -> Map(id1 -> 0), 7 -> Map(id1 -> 0)))
  }

  test("changed id: vanished grams 0, kept/new grams get new counts") {
    val d = GramDiff(Map(id1 -> Array(1, 2, 2)), Map(id1 -> Array(2, 3)))
    assert(d.byGram === Map(1 -> Map(id1 -> 0), 2 -> Map(id1 -> 1), 3 -> Map(id1 -> 1)))
  }

  test("unchanged grams still appear with their counts (upsert semantics)") {
    val d = GramDiff(Map(id1 -> Array(1)), Map(id1 -> Array(1)))
    assert(d.byGram === Map(1 -> Map(id1 -> 1)))
  }

  test("multiple ids diff independently") {
    val d = GramDiff(Map(id1 -> Array(1)), Map(id1 -> Array(1), id2 -> Array(1)))
    assert(d.byGram === Map(1 -> Map(id1 -> 1, id2 -> 1)))
    assert(d.ids === Set(id1, id2))
  }
}
