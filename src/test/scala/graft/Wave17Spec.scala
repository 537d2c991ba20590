package graft

import org.apache.spark.sql.functions._
import graft.engine.{ConcurrentCommitException, Versioned}
import graft.ops.{IncrementalOps, MergeOps}

/** Round-9 wave: concurrent-writer safety, the retention-floor vacuum,
  * and the rollback/ledger composition (r8 verdict items 1-2 + the
  * medium advice item). The "two writers" are interleaved on one driver
  * thread — the protocol's safety argument is purely about on-disk
  * state transitions, so an interleaving that reproduces the racing
  * schedule IS the race. */
class Wave17Spec extends SparkTestBase {

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.delete(); d.getAbsolutePath
  }

  private def corpus(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, i * 10.0, if (i % 2 == 0) "E" else "O"))
      .toDF("k", "v", "p")
  }

  test("two writers racing one version: exactly one commit wins and the " +
       "loser's staged data is never visible") {
    import spark.implicits._
    val dir = freshDir("graft_race")
    MergeOps.mergeUpsert(spark, dir, corpus(20), "k", "p")        // v1
    val v = Versioned.currentVersion(spark, dir).get

    // Both writers compute the same next version and stage their own
    // UNIQUE dirs — the interleaving where round 8 lost a commit.
    val nv = Versioned.nextVersion(spark, dir)
    assert(nv == v + 1)
    val stageA = Versioned.newStageRel(nv)
    val stageB = Versioned.newStageRel(nv)
    assert(stageA != stageB, "stage dirs must be unique per attempt")
    Seq((1L, -111.0, "O")).toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/$stageA")
    Seq((1L, -222.0, "O")).toDF("k", "v", "p")
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/$stageB")

    val man1 = Versioned.manifest(spark, dir, v)
    def entriesFor(stage: String) = {
      val staged = Versioned.listStagedPartDirs(spark, dir, stage, "p")
      man1.filterNot(e => staged.exists(_._1 == e._1)) ++ staged
    }
    // A publishes first and wins; B's publish at the same version must
    // throw, not silently replace A's manifest (the round-8 lost update).
    Versioned.publish(spark, dir, nv, entriesFor(stageA))
    intercept[ConcurrentCommitException] {
      Versioned.publish(spark, dir, nv, entriesFor(stageB))
    }
    assert(Versioned.currentVersion(spark, dir).get == nv)
    val rows = Versioned.readCurrent(spark, dir, Some("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows(1L) == -111.0, "the winner's data must be what readers see")
    assert(!rows.values.exists(_ == -222.0),
      "the loser's staged rows must never be visible")

    // The loser's retry is the full redo at the next version: a plain
    // mergeUpsert re-reads the (now winner-including) current state.
    // (Writer A's hand-staged v2 replaced the whole O partition with its
    // one row, so the committed corpus is 10 evens + key 1 = 11 rows —
    // the retry must land on exactly that state.)
    MergeOps.mergeUpsert(spark, dir,
      Seq((1L, -222.0, "O")).toDF("k", "v", "p"), "k", "p")
    val after = Versioned.readCurrent(spark, dir, Some("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(after(1L) == -222.0 && after(2L) == 20.0 && after.size == 11)
    // and vacuum reclaims the loser's orphaned stage dir once current
    // has passed its version
    Versioned.vacuum(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$stageB")),
      "the losing attempt's unreferenced dir should be vacuumed")
  }

  test("a crashed writer's orphaned manifest burns its version: retries " +
       "skip past it and land cleanly") {
    import spark.implicits._
    val dir = freshDir("graft_orphan_manifest")
    MergeOps.mergeUpsert(spark, dir, corpus(10), "k", "p")        // v1
    // crash state: manifest for v2 written, NO marker (died mid-publish)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "manifest/2.txt"),
                        false)
    out.write("p=O\tdata/2/p=O\n".getBytes("UTF-8")); out.close()

    assert(Versioned.nextVersion(spark, dir) == 3L,
      "nextVersion must skip the burned version")
    MergeOps.mergeUpsert(spark, dir,
      Seq((1L, 111.0, "O")).toDF("k", "v", "p"), "k", "p")
    assert(Versioned.currentVersion(spark, dir).get == 3L)
    val rows = MergeOps.readCorpus(spark, dir, "p")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(rows.size == 10 && rows(1L) == 111.0 && rows(2L) == 20.0)
  }

  test("vacuum to a retention floor: time travel works down to the floor " +
       "and fails with a clear error below it") {
    import spark.implicits._
    val dir = freshDir("graft_floor")
    MergeOps.mergeUpsert(spark, dir, corpus(12), "k", "p")                // v1
    MergeOps.mergeUpsert(spark, dir,
      Seq((1L, -1.0, "O")).toDF("k", "v", "p"), "k", "p")                 // v2
    MergeOps.mergeUpsert(spark, dir,
      Seq((2L, -2.0, "E")).toDF("k", "v", "p"), "k", "p")                 // v3
    def snap(v: Long) = Versioned.readVersion(spark, dir, v, Some("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val s2 = snap(2L)
    val s3 = snap(3L)

    Versioned.vacuum(spark, dir, keepVersions = 2)                 // floor=2
    assert(Versioned.retentionFloor(spark, dir).contains(2L))
    assert(snap(2L) == s2 && snap(3L) == s3,
      "every version at or above the floor must still read back exactly")
    val e = intercept[IllegalArgumentException] { snap(1L) }
    assert(e.getMessage.contains("retention floor"),
      s"below-floor reads need a clear error, got: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Versioned.rollback(spark, dir, 1L)
    }
    assert(e2.getMessage.contains("retention floor"))
    // the floor is monotonic: a later, more generous vacuum cannot
    // resurrect reclaimed versions
    Versioned.vacuum(spark, dir, keepVersions = 10)
    assert(Versioned.retentionFloor(spark, dir).contains(2L))
  }

  test("rollup fold -> rollback -> re-fold: the ledger rolls back with " +
       "the data, so the batch re-applies instead of silently no-opping") {
    import spark.implicits._
    val dir = freshDir("graft_rollup_rb")
    def batch(day: Int, vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) =>
        (s"u$i", java.sql.Timestamp.valueOf(f"2024-03-$day%02d 12:00:0$i"), v)
      }.toDF("user_id", "ts", "value")
    IncrementalOps.foldBatch(spark, dir, batch(1, Seq(1.0, 2.0)), "b1") // v1
    IncrementalOps.foldBatch(spark, dir, batch(2, Seq(5.0)), "b2")      // v2
    def sums = IncrementalOps.readRollup(spark, dir)
      .select(col("day_s").cast("string"), col("sum_value").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums == Map("2024-03-01" -> 3.0, "2024-03-02" -> 5.0))

    Versioned.rollback(spark, dir, 1L)                                  // v3
    assert(sums == Map("2024-03-01" -> 3.0),
      "rollback must restore the day-1-only state")
    // THE r8 advice defect: without the ledger copy-forward this re-fold
    // would find the pre-rollback ledger, see b2 as applied, and no-op —
    // silently losing day 2 forever.
    IncrementalOps.foldBatch(spark, dir, batch(2, Seq(5.0)), "b2")
    assert(sums == Map("2024-03-01" -> 3.0, "2024-03-02" -> 5.0),
      "a rolled-back batch must re-apply after rollback")
    // and the exactly-once guarantee still holds on the restored line
    IncrementalOps.foldBatch(spark, dir, batch(2, Seq(5.0)), "b2")
    assert(sums == Map("2024-03-01" -> 3.0, "2024-03-02" -> 5.0),
      "replay of the re-applied batch must still be a no-op")
  }

  test("a crashed fold's orphaned ledger is not trusted: the batch " +
       "re-applies on retry") {
    import spark.implicits._
    val dir = freshDir("graft_ledger_orphan")
    def batch(day: Int, v: Double) =
      Seq(("u0", java.sql.Timestamp.valueOf(f"2024-03-$day%02d 12:00:00"), v))
        .toDF("user_id", "ts", "value")
    IncrementalOps.foldBatch(spark, dir, batch(1, 1.0), "b1")           // v1
    // crash state: a fold of b2 wrote ledger/2.txt then died pre-publish
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "ledger/2.txt"),
                        false)
    out.write("b1\nb2".getBytes("UTF-8")); out.close()
    // the retry must NOT see the uncommitted ledger's b2-as-applied claim
    IncrementalOps.foldBatch(spark, dir, batch(2, 7.0), "b2")
    val sums = IncrementalOps.readRollup(spark, dir)
      .select(col("day_s").cast("string"), col("sum_value").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums == Map("2024-03-01" -> 1.0, "2024-03-02" -> 7.0),
      s"the crashed fold's batch must land on retry, got $sums")
  }
}
