package graft

import graft.engine.Versioned
import graft.ops.{BranchOps, MergeOps}

/** Round-16 wave 11: the SQL branch surface — `graft.branches.`t@b``
  * tables and the WAP procedures. Pins two-way isolation (main writes
  * invisible to the branch head it forked from, branch writes
  * invisible to main), the OVERWRITE decline, and unknown-branch
  * resolution. */
class Wave54Spec extends SparkTestBase {

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

  test("branch tables: two-way isolation, OVERWRITE declines, unknown " +
       "branches resolve as missing tables") {
    import spark.implicits._
    val tbl = "graft_w54_iso"
    val dir = clean(tbl); register()
    MergeOps.mergeUpsert(spark,
      dir, (0 until 20).map(i => (i.toLong, i % 2, i))
        .toDF("id", "grp", "x"), "id", "grp")
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"CALL graft.system.create_branch('$tbl', 'b1')")
    // main moves AFTER the fork: the branch head must NOT see it
    // (positional VALUES follow the read order: id, x, grp)
    spark.sql(s"INSERT INTO graft.$tbl VALUES (100, 5, 0)")
    assert(spark.sql(s"SELECT count(*) FROM graft.branches.`$tbl@b1`")
      .head.getLong(0) == 20L,
      "a post-fork main write must be invisible to the branch head")
    // branch write invisible to main
    spark.sql(s"INSERT INTO graft.branches.`$tbl@b1` " +
      "VALUES (200, 9, 1)")
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl")
      .head.getLong(0) == 21L)
    assert(spark.sql(s"SELECT count(*) FROM graft.branches.`$tbl@b1`")
      .head.getLong(0) == 21L)
    // column pruning through the branch scan
    assert(spark.sql(s"SELECT x FROM graft.branches.`$tbl@b1` " +
      "WHERE id = 200").head.getInt(0) == 9)
    intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE graft.branches.`$tbl@b1` " +
        "VALUES (1, 0, 1)")
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM graft.branches.`$tbl@ghost`").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM graft.branches.`$tbl`").collect()
    }
    spark.sql(s"CALL graft.system.drop_branch('$tbl', 'b1')")
    assert(BranchOps.branches(spark, dir).isEmpty)
  }
}
