package graft

import graft.bulk.GraphOps
import graft.core.GraftDb
import graft.model.{Child, Gid, Layout, Node}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The distributed swap obsolete-subtree fixpoint against the serving
  * path (GraftDb.swap) on randomized diamond graphs: for every random
  * graph + random swap, the id set the bulk fixpoint marks obsolete
  * must equal exactly the set the serving swap tombstones.
  */
class BulkSwapSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-bulkswap-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def childIds(n: Node): Seq[Gid] = n.children.map {
    case Child.Lazy(id) => id
    case Child.Eager(_) => fail("stored nodes are normalized to lazy children")
  }

  /** Random DAG: text leaves, then list layers whose children are
    * drawn from all earlier nodes WITH replacement across lists —
    * shared children (diamonds) occur constantly; a final page root
    * keeps some lists multi-parented.
    */
  private def randomGraph(rnd: Random): (GraftDb, Vector[Gid]) = {
    val db = new GraftDb
    val leaves = Vector.fill(3 + rnd.nextInt(4))(db.add(Node.Text(s"t${rnd.nextInt(1000)}")))
    var pool = leaves
    val lists = Vector.fill(2 + rnd.nextInt(3)) {
      val kids = Vector.fill(1 + rnd.nextInt(3))(pool(rnd.nextInt(pool.length)))
      val id = db.add(Node.List(Layout.Page, kids.map(Child.Lazy(_))))
      pool = pool :+ id
      id
    }
    val rootKids = rnd.shuffle(lists).take(1 + rnd.nextInt(lists.length))
    db.add(Node.List(Layout.Page, rootKids.map(Child.Lazy(_))))
    (db, lists)
  }

  test("bulk obsolete fixpoint equals serving-path swap tombstones on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(20260812L)
    for (round <- 0 until 12) {
      val (db, lists) = randomGraph(rnd)
      val target = lists(rnd.nextInt(lists.length))
      val oldChildren = childIds(db.get(target).get)
      // replacement keeps a random subset of the old children, maybe
      // adds another existing node (re-parenting), maybe a fresh leaf
      val kept = oldChildren.filter(_ => rnd.nextBoolean())
      val all = db.nodes.liveKeys.toVector
      val extra =
        (if (rnd.nextBoolean()) Seq(all(rnd.nextInt(all.length))) else Seq.empty)
          .filterNot(_ == target)
      val replacement = Node.List(Layout.Page,
        (kept ++ extra).distinct.map(Child.Lazy(_)).toVector)

      // flatten PRE-swap state
      val live = db.nodes.liveKeys.toVector
      val parentRows = live.flatMap(i => db.parents(i).map(p => (i.toString, p.id.toString)))
      val edgeRows = live.flatMap(i => childIds(db.get(i).get).map(c => (i.toString, c.toString)))
      val newChildren = childIds(replacement)
      val removed = oldChildren.toSet -- newChildren.toSet

      val obsolete = GraphOps.swapObsoleteFixpoint(
        parentRows.toDF("id", "parent_id"),
        edgeRows.toDF("parent_id", "child_id"),
        target.toString,
        removed.toSeq.map(_.toString).toDF("id"),
        newChildren.map(_.toString).toDF("id"))
        .collect().map(_.getString(0)).toSet

      db.swap(target, replacement)
      val tombstoned = live.filter(i => db.get(i).isEmpty).map(_.toString).toSet
      assert(obsolete === tombstoned,
        s"round $round: bulk=$obsolete serving=$tombstoned target=$target removed=$removed")
    }
  }
}
