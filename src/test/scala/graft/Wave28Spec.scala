package graft

import org.apache.spark.sql.functions._
import graft.engine.Versioned
import graft.ops.MergeOps
import graft.streaming.StreamOps

/** Round-12 wave 4: the streaming CHANGE-FEED SOURCE — a versioned
  * store's computed CDC read exposed as a Structured Streaming source
  * (offset = source version), composed end-to-end with the exactly-once
  * mirror sink. */
class Wave28Spec extends SparkTestBase {

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.delete(); d.getAbsolutePath
  }

  private def corpus(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, i * 10.0, if (i % 2 == 0) "E" else "O"))
      .toDF("k", "v", "p")
  }

  private def readAll(dir: String): Map[Long, (Double, String)] =
    MergeOps.readCorpus(spark, dir, "p").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap

  test("feedStream bootstraps a mirror from version 0, tracks source " +
       "commits batch-for-batch, equals the batch syncMirror result, " +
       "and a checkpoint restart replays as a no-op") {
    import spark.implicits._
    val src = freshDir("graft_feed_src")
    val dst = freshDir("graft_feed_dst")
    val dstBatch = freshDir("graft_feed_dstb")
    val ck = freshDir("graft_feed_ck")
    MergeOps.mergeUpsert(spark, src, corpus(6), "k", "p")            // v1
    MergeOps.mergeUpsert(spark, src,
      Seq((7L, 70.0, "O")).toDF("k", "v", "p"), "k", "p")            // v2

    def runStream(): Unit = {
      val q = StreamOps.feedMirrorMaintenance(
          StreamOps.feedStream(spark, src, "k", "p", Some(0L)),
          dst, "k", "p")
        .option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runStream()
    assert(readAll(dst) === readAll(src))
    val dstV1 = Versioned.currentVersion(spark, dst).get

    // source advances: an update, a CoW delete, a MOR delete
    MergeOps.mergeUpsert(spark, src,
      Seq((1L, -1.0, "O")).toDF("k", "v", "p"), "k", "p")            // v3
    MergeOps.mergeDelete(spark, src, Seq(Tuple1(4L)).toDF("k"), "k", "p")
    MergeOps.mergeDeleteMor(spark, src, Seq(Tuple1(6L)).toDF("k"), "k", "p")
    runStream()
    assert(readAll(dst) === readAll(src))
    assert(!readAll(dst).contains(4L) && !readAll(dst).contains(6L))

    // batch-path equivalence: a syncMirror-built replica sees the same
    MergeOps.syncMirror(spark, src, dstBatch, "k", "p")
    assert(readAll(dst) === readAll(dstBatch))

    // replay: a fresh run on the same checkpoint with no source change
    // commits NOTHING (offset log + ledger both say done)
    val vBefore = Versioned.currentVersion(spark, dst).get
    runStream()
    assert(Versioned.currentVersion(spark, dst).contains(vBefore),
      "an idle restart must not commit new mirror versions")
    assert(vBefore > dstV1, "the second batch must have committed earlier")
  }

  test("a feed batch id replayed AFTER a checkpoint loss re-applies the " +
       "identical immutable version range and the mirror ledger no-ops " +
       "it — no duplicate versions, same content") {
    import spark.implicits._
    val src = freshDir("graft_feed_replay_src")
    val dst = freshDir("graft_feed_replay_dst")
    val ck1 = freshDir("graft_feed_replay_ck1")
    val ck2 = freshDir("graft_feed_replay_ck2")
    MergeOps.mergeUpsert(spark, src, corpus(5), "k", "p")            // v1
    def runOn(ck: String): Unit = {
      val q = StreamOps.feedMirrorMaintenance(
          StreamOps.feedStream(spark, src, "k", "p", Some(0L)),
          dst, "k", "p")
        .option("checkpointLocation", ck)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOn(ck1)
    val v1 = Versioned.currentVersion(spark, dst).get
    // checkpoint lost: a new stream re-emits batch 0 over the same
    // version range; the ledger's stream-feed-0 id no-ops the re-apply
    runOn(ck2)
    assert(Versioned.currentVersion(spark, dst).contains(v1),
      "a replayed bootstrap batch must not re-commit")
    assert(readAll(dst) === readAll(src))
  }

  test("startVersion=None streams only changes committed after stream " +
       "start; the classification and images match the batch changeFeed") {
    import spark.implicits._
    val src = freshDir("graft_feed_tail_src")
    MergeOps.mergeUpsert(spark, src, corpus(4), "k", "p")            // v1
    val out = freshDir("graft_feed_tail_out")
    val ck = freshDir("graft_feed_tail_ck")
    val q = StreamOps.feedStream(spark, src, "k", "p")
      .writeStream.outputMode("append")
      .option("checkpointLocation", ck)
      .format("parquet").option("path", out)
      .start()
    try {
      q.processAllAvailable()   // nothing past the base version yet
      MergeOps.mergeUpsert(spark, src,
        Seq((2L, -2.0, "E"), (9L, 90.0, "O")).toDF("k", "v", "p"),
        "k", "p")                                                    // v2
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select("k", "v", "p", "change_type").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
                 r.getString(3))).toSet
    assert(got === Set((2L, -2.0, "E", "update"), (9L, 90.0, "O", "insert")))
    // batch-path equivalence on the same range
    val batch = MergeOps.changeFeed(spark, src, 1L, 2L, "k", "p")
      .select("k", "v", "p", "change_type").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
                 r.getString(3))).toSet
    assert(got === batch)
  }
}
