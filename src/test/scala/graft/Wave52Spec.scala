package graft

import graft.engine.Versioned
import graft.ops.MergeOps

/** Round-16 wave 9: the observability procedures — DESCRIBE DETAIL /
  * HISTORY through `CALL graft.system.detail/history`, pinned against
  * the Scala surfaces they re-deliver. */
class Wave52Spec extends SparkTestBase {

  private val rootDir =
    new java.io.File(sys.props("java.io.tmpdir")).getAbsolutePath

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", rootDir)
  }

  private def clean(tbl: String): String = {
    val dir = new java.io.File(rootDir, tbl).getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  test("CALL graft.system.detail returns exactly the storeDetail row; " +
       "history returns one row per commit, store-clock ordered") {
    import spark.implicits._
    val tbl = "graft_w52_obs"
    val dir = clean(tbl); register()
    val df = (0 until 30).map(i => (i.toLong, i % 3, i * 2))
      .toDF("id", "grp", "x")
    MergeOps.mergeUpsert(spark, dir, df, "id", "grp")        // v1
    Thread.sleep(30)  // distinct store-clock instants
    MergeOps.mergeDeleteMor(spark, dir,
      Seq(3L, 4L).toDF("id"), "id", "grp")                   // v2
    val want = Versioned.storeDetail(spark, dir).collect()(0)
    val got = spark.sql(s"CALL graft.system.detail('$tbl')").collect()(0)
    val wantMap = Versioned.storeDetail(spark, dir).columns
      .zip(want.toSeq).toMap
    val gotMap = spark.sql(s"CALL graft.system.detail('$tbl')")
      .columns.zip(got.toSeq).toMap
    assert(gotMap == wantMap,
      s"CALL detail must re-deliver storeDetail: $gotMap vs $wantMap")
    assert(gotMap("version") == 2L && gotMap("dv_refs") != 0L)

    val hist = spark.sql(s"CALL graft.system.history('$tbl')").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "one row per commit, version-ordered")
    val t1 = hist(0).getTimestamp(1).getTime
    val t2 = hist(1).getTimestamp(1).getTime
    assert(t1 <= t2, "committed_at must follow the store clock")
    assert(hist.forall(_.getLong(2) == 3L),
      "both commits carry the three grp partitions")
    // unknown table: loud
    intercept[Exception] {
      spark.sql("CALL graft.system.history('w52_ghost')").collect()
    }
  }
}
