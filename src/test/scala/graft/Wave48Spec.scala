package graft

import org.apache.spark.sql.functions._
import graft.engine.Versioned
import graft.ops.MergeOps
import graft.sql.GraftDml

/** Round-16 wave 5: SQL UPDATE and MERGE INTO through the planner
  * strategy ([[graft.sql.GraftDmlStrategy]]). Pins the single-commit
  * shapes, the star actions, the loud declines (cardinality, non-key
  * ON, missing keyCol), the extensions-injection route, and MERGE over
  * a store with outstanding MOR deletion vectors (the changelog apply
  * must see the LIVE image). */
class Wave48Spec extends SparkTestBase {

  private val rootDir =
    new java.io.File(sys.props("java.io.tmpdir")).getAbsolutePath

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", rootDir)
    GraftDml.install(spark)
  }

  private def clean(tbl: String): String = {
    val dir = new java.io.File(rootDir, tbl).getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  private def seed(dir: String, n: Int = 40): Unit = {
    import spark.implicits._
    val df = (0 until n).map(i => (i.toLong, s"v$i", i % 4, i * 10))
      .toDF("id", "nm", "grp", "score")
    MergeOps.mergeUpsert(spark, dir, df, "id", "grp")
  }

  test("SQL UPDATE: one CoW commit, exact rows/columns, aligned " +
       "identity assignments dropped before the merge API") {
    val tbl = "graft_w48_upd"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"UPDATE graft.$tbl SET score = score + 1, " +
      s"nm = upper(nm) WHERE id BETWEEN 10 AND 12")
    assert(Versioned.currentVersion(spark, dir).contains(3L))
    val rows = spark.sql(s"SELECT id, nm, score FROM graft.$tbl " +
      "WHERE id IN (9, 10, 12, 13) ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSeq == Seq((9L, "v9", 90), (10L, "V10", 101),
                    (12L, "V12", 121), (13L, "v13", 130)))
    // missing keyCol property: loud decline, nothing published
    val tbl2 = "graft_w48_upd_nokey"
    val dir2 = clean(tbl2); seed(dir2)
    val failed =
      try { spark.sql(s"UPDATE graft.$tbl2 SET score = 0"); false }
      catch { case e: Exception =>
        e.getMessage.contains("keyCol") || e.getCause != null }
    assert(failed, "UPDATE without a persisted keyCol must fail")
    assert(Versioned.currentVersion(spark, dir2).contains(1L))
  }

  test("SQL MERGE: star actions (UPDATE SET * / INSERT *) apply; the " +
       "whole statement is ONE commit") {
    import spark.implicits._
    val tbl = "graft_w48_star"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    Seq((5L, "five", 1, 999), (100L, "hundred", 0, 7))
      .toDF("id", "nm", "grp", "score")
      .createOrReplaceTempView("w48_src")
    spark.sql(s"""MERGE INTO graft.$tbl t USING w48_src s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET *
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(Versioned.currentVersion(spark, dir).contains(3L),
      "seed was v1, ALTER v2; the whole MERGE must be exactly v3")
    val r = spark.sql(s"SELECT nm, score FROM graft.$tbl " +
      "WHERE id IN (5, 100) ORDER BY id").collect()
    assert(r.map(x => (x.getString(0), x.getInt(1))).toSeq ==
      Seq(("five", 999), ("hundred", 7)))
  }

  test("SQL MERGE loud declines publish NOTHING: duplicate source " +
       "keys (SQL cardinality rule) and a non-key ON") {
    import spark.implicits._
    val tbl = "graft_w48_decl"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    val v = Versioned.currentVersion(spark, dir).get
    Seq((7L, "a", 3, 1), (7L, "b", 3, 2)).toDF("id", "nm", "grp", "score")
      .createOrReplaceTempView("w48_dup")
    intercept[Exception] {
      spark.sql(s"""MERGE INTO graft.$tbl t USING w48_dup s
                   |ON t.id = s.id
                   |WHEN MATCHED THEN UPDATE SET score = s.score
                   |""".stripMargin)
    }
    intercept[Exception] {
      spark.sql(s"""MERGE INTO graft.$tbl t USING w48_dup s
                   |ON t.score = s.score
                   |WHEN MATCHED THEN UPDATE SET nm = s.nm
                   |""".stripMargin)
    }
    assert(Versioned.currentVersion(spark, dir).contains(v),
      "aborted MERGEs must leave the version untouched")
  }

  test("extensions route: a session built with " +
       "spark.sql.extensions=GraftExtensions runs UPDATE with no " +
       "install() call") {
    import org.apache.spark.sql.SparkSession
    val tbl = "graft_w48_ext"
    val dir = clean(tbl); seed(dir)
    val old = spark // keep the shared session restorable (Wave9 idiom)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      s2.conf.set("spark.sql.catalog.graft",
        classOf[graft.sql.GraftCatalog].getName)
      s2.conf.set("spark.sql.catalog.graft.root", rootDir)
      s2.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
      s2.sql(s"UPDATE graft.$tbl SET score = -1 WHERE id = 3")
      assert(s2.sql(s"SELECT score FROM graft.$tbl WHERE id = 3")
        .head.getInt(0) == -1)
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("WHEN NOT MATCHED BY SOURCE: the sync-to-source shape — " +
       "conditioned DELETE prunes exactly the unmatched band, in the " +
       "same single commit as the matched updates") {
    import spark.implicits._
    val tbl = "graft_w48_nbs"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    // source holds ids 0..19 only; NBS deletes unmatched ids >= 30,
    // leaving 20..29 untouched (the condition gates the clause)
    spark.range(0, 20).selectExpr("id", "'s' AS nm", 
        "CAST(id % 4 AS INT) AS grp", "CAST(id AS INT) AS score")
      .createOrReplaceTempView("w48_nbs_src")
    spark.sql(s"""MERGE INTO graft.$tbl t USING w48_nbs_src s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET score = -t.score
                 |WHEN NOT MATCHED BY SOURCE AND t.id >= 30 THEN DELETE
                 |""".stripMargin)
    assert(Versioned.currentVersion(spark, dir).contains(3L),
      "matched updates + NBS deletes must be ONE commit")
    val r = spark.sql(s"SELECT id, score FROM graft.$tbl ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    assert(r.length == 30, s"ids 30..39 must be gone, got ${r.length}")
    assert(r.take(20).forall { case (i, sc) => sc == -(i * 10) },
      "matched band negated")
    assert(r.drop(20).forall { case (i, sc) => sc == i * 10 },
      "the condition-gated band 20..29 must be untouched")
  }

  test("SQL MERGE over outstanding MOR deletion vectors applies on " +
       "the LIVE image: tombstoned keys are NOT matched and re-insert " +
       "cleanly") {
    import spark.implicits._
    val tbl = "graft_w48_mor"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    // MOR-delete ids 8 and 9 (tombstones outstanding, no restage)
    MergeOps.mergeDeleteMor(spark, dir,
      Seq(8L, 9L).toDF("id"), "id", "grp")
    Seq((8L, "back", 0, 88), (6L, "six", 2, 66))
      .toDF("id", "nm", "grp", "score")
      .createOrReplaceTempView("w48_mor_src")
    spark.sql(s"""MERGE INTO graft.$tbl t USING w48_mor_src s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET score = s.score + t.score
                 |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val r = spark.sql(s"SELECT id, score FROM graft.$tbl " +
      "WHERE id IN (6, 8, 9) ORDER BY id").collect()
    // 6 was live (score 60) -> matched: 66+60=126; 8 was tombstoned ->
    // NOT matched, re-inserted at 88; 9 stays deleted
    assert(r.map(x => (x.getLong(0), x.getInt(1))).toSeq ==
      Seq((6L, 126), (8L, 88)))
  }
}
