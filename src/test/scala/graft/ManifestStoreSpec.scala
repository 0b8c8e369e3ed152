package graft

import graft.bulk.ManifestStore
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The parquet commit protocol: manifest-CAS visibility, optimistic
  * conflict on concurrent commits, crash-safety of killed writers and
  * compactors, and orphan GC.
  */
class ManifestStoreSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-manifest-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-manifest").toString

  private def versionedRows(rows: (Long, Long, Boolean, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("key", "version_ts", "is_removed", "payload")
  }

  test("commit makes staged slots visible; unstaged slots carry over") {
    val store = new ManifestStore(spark, tmpRoot())
    assert(store.currentVersion() === 0L)
    assert(store.read("nodes").isEmpty)

    assert(store.begin()
      .stage("nodes", versionedRows((1L, 10L, false, "a")))
      .stage("counts", versionedRows((1L, 10L, false, "c")))
      .commit() === Right(1L))
    assert(store.begin()
      .stage("nodes", versionedRows((1L, 10L, false, "a"), (2L, 20L, false, "b")))
      .commit() === Right(2L))

    assert(store.currentVersion() === 2L)
    assert(store.read("nodes").get.count() === 2) // updated
    assert(store.read("counts").get.count() === 1) // carried over from v1
  }

  test("concurrent commits from the same base: exactly one wins, the loser conflicts") {
    val store = new ManifestStore(spark, tmpRoot())
    store.begin().stage("nodes", versionedRows((1L, 10L, false, "base"))).commit()

    val t1 = store.begin().stage("nodes", versionedRows((1L, 11L, false, "t1")))
    val t2 = store.begin().stage("nodes", versionedRows((1L, 12L, false, "t2")))
    assert(t1.baseVersion === 1L && t2.baseVersion === 1L)

    assert(t1.commit() === Right(2L))
    t2.commit() match {
      case Left(c) => assert(c.baseVersion === 1L)
      case Right(v) => fail(s"second writer must conflict, committed v$v")
    }
    // the loser's rows are invisible
    val payloads = store.read("nodes").get.collect().map(_.getString(3)).toSet
    assert(payloads === Set("t1"))
  }

  test("a compactor killed before its CAS changes nothing; gc removes its orphans") {
    val root = tmpRoot()
    val store = new ManifestStore(spark, root)
    store.begin().stage("nodes", versionedRows(
      (1L, 10L, false, "old"), (1L, 20L, false, "new"), (2L, 5L, true, "gone"))).commit()

    // "kill during compaction": the rewrite dir is staged but the
    // process dies before commit — no visible change
    store.begin().stage("nodes",
      graft.bulk.VersionedTable.compact(store.read("nodes").get, "key"))
    assert(store.currentVersion() === 1L)
    assert(store.read("nodes").get.count() === 3) // full history still

    // orphaned rewrite dir exists on disk until gc
    def dataDirs = {
      val p = java.nio.file.Paths.get(root, "data", "nodes")
      java.nio.file.Files.list(p).count()
    }
    assert(dataDirs === 2)
    // default grace keeps the fresh orphan (it could be a live txn's
    // staged dir); grace 0 reclaims it
    store.gc(keepVersions = 1)
    assert(dataDirs === 2)
    store.gc(keepVersions = 1, graceMillis = 0L)
    assert(dataDirs === 1)

    // the re-run compaction commits and is correct: latest live only
    assert(store.compact("nodes", "key") === Right(2L))
    val rows = store.read("nodes").get.collect()
      .map(r => (r.getLong(0), r.getString(3))).toSet
    assert(rows === Set((1L, "new"))) // key 2's tombstone purged
  }

  test("name and size reflect the committed state") {
    val store = new ManifestStore(spark, tmpRoot())
    assert(store.name.startsWith("graft-manifest"))
    assert(store.size("nodes") === 0L)
    store.begin().stage("nodes", versionedRows((1L, 10L, false, "a"))).commit()
    val s1 = store.size("nodes")
    assert(s1 > 0L)
    // an uncommitted staging dir adds nothing to the live size
    store.begin().stage("nodes", versionedRows((1L, 10L, false, "a"), (2L, 10L, false, "b")))
    assert(store.size("nodes") === s1)
  }

  test("gc keeps every dir the retained manifests reference") {
    val store = new ManifestStore(spark, tmpRoot())
    store.begin().stage("a", versionedRows((1L, 1L, false, "x"))).commit()
    store.begin().stage("b", versionedRows((2L, 1L, false, "y"))).commit()
    store.gc(keepVersions = 1)
    // v2 references BOTH a's v1 dir (carried over) and b's dir
    assert(store.read("a").get.count() === 1)
    assert(store.read("b").get.count() === 1)
    assert(store.currentVersion() === 2L)
  }

  test("a txn whose staged dirs were gc-reclaimed conflicts instead of publishing dangling refs") {
    val store = new ManifestStore(spark, tmpRoot())
    store.begin().stage("nodes", versionedRows((1L, 1L, false, "a"))).commit()
    val txn = store.begin().stage("nodes", versionedRows((1L, 2L, false, "b")))
    // an aggressive gc (no grace — simulating a txn that outlived the
    // grace period) reclaims the staged dir before the commit
    store.gc(keepVersions = 1, graceMillis = 0L)
    assert(txn.commit().isLeft, "commit must re-verify staged dirs and conflict")
    // the committed state is still readable and intact
    assert(store.read("nodes").get.count() === 1)
  }

  test("two concurrent writers race the CAS: one wins, the loser conflicts, never a corrupt manifest") {
    // The kv conflict analog (assemblage_kv/src/lib.rs:528-546): both
    // writers contend for the SAME slot from the SAME base version and
    // release together on a latch, across enough rounds to hit
    // genuinely interleaved link(2) calls. Invariants per round:
    // exactly one Right, version advances by exactly 1, the manifest
    // parses, the visible slot content is the winner's payload, and
    // the loser's payload is nowhere visible.
    val store = new ManifestStore(spark, tmpRoot())
    assert(store.begin()
      .stage("nodes", versionedRows((1L, 10L, false, "seed")))
      .commit() === Right(1L))
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    try {
      for (round <- 1 to 12) {
        val base = store.currentVersion()
        // stage OUTSIDE the latched window: the race under test is the
        // manifest CAS, not parquet writing
        val txns = Seq("a", "b").map { tag =>
          tag -> store.begin().stage("contended",
            versionedRows((round.toLong, round.toLong, false, tag)))
        }
        val start = new CountDownLatch(1)
        val futures = txns.map { case (tag, txn) =>
          tag -> pool.submit(new java.util.concurrent.Callable[Either[store.Conflict, Long]] {
            def call(): Either[store.Conflict, Long] = { start.await(); txn.commit() }
          })
        }
        start.countDown()
        val byTag = futures.map { case (tag, f) => tag -> f.get() }.toMap
        assert(byTag.values.count(_.isRight) === 1,
          s"round $round: expected exactly one winner, got $byTag")
        assert(byTag.values.count(_.isLeft) === 1)
        assert(store.currentVersion() === base + 1, s"round $round: version skew")
        val winner = byTag.collectFirst { case (tag, Right(_)) => tag }.get
        val m = store.manifest() // must parse; carries prior slots
        assert(m.contains("nodes") && m.contains("contended"))
        val visible = store.read("contended").get
          .filter(s"version_ts = $round").select("payload")
          .collect().map(_.getString(0)).toSeq
        assert(visible === Seq(winner),
          s"round $round: visible payload $visible, winner $winner")
      }
      // the loser is not wedged: a fresh txn from the new base commits
      assert(store.begin()
        .stage("contended", versionedRows((999L, 999L, false, "retry")))
        .commit().isRight)
    } finally pool.shutdown()
  }
}
