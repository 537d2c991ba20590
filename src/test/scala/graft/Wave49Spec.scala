package graft

import org.apache.spark.sql.functions._
import graft.engine.Versioned
import graft.ops.MergeOps
import graft.sql.GraftDml

/** Round-16 wave 6: metadata-tier schema evolution through SQL —
  * `ALTER TABLE ADD COLUMNS` persists declared columns as table
  * metadata (ExtraCols), reads null-fill them, row-level writes refuse
  * to touch them until materialized, MERGE is the materializing verb
  * the decline points at, and the stream gate declines while any
  * declared column is file-less. */
class Wave49Spec extends SparkTestBase {

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

  test("ADD COLUMNS: one metadata commit; pruned reads null-fill the " +
       "declared column; illegal shapes (nested, NOT NULL, existing " +
       "name) decline loudly") {
    val tbl = "graft_w49_add"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMNS (lang STRING)")
    assert(Versioned.currentVersion(spark, dir).contains(3L),
      "ADD COLUMNS must be exactly one commit (no data movement)")
    // a FILTERED read (pruning path) must null-fill too
    val r = spark.sql(s"SELECT id, lang FROM graft.$tbl " +
      "WHERE id = 7").collect()
    assert(r.length == 1 && r(0).isNullAt(1))
    // illegal shapes
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMNS (lang STRING)")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl " +
        "ADD COLUMNS (extra STRING NOT NULL)")
    }
    assert(Versioned.currentVersion(spark, dir).contains(3L),
      "declined ALTERs must publish nothing")
  }

  test("MERGE is the materializing verb: the target read null-fills " +
       "the declared column, so a MERGE SET carries it into files and " +
       "survivors null-fill through the changelog evolution") {
    import spark.implicits._
    val tbl = "graft_w49_mat"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMNS (lang STRING)")
    // UPDATE on the unmaterialized column declines (silent no-op would
    // be a wrong answer) and points here
    intercept[Exception] {
      spark.sql(s"UPDATE graft.$tbl SET lang = 'xx' WHERE id = 1")
    }
    Seq((1L, 0), (2L, 0)).toDF("id", "ignore")
      .createOrReplaceTempView("w49_src")
    spark.sql(s"""MERGE INTO graft.$tbl t USING w49_src s
                 |ON t.id = s.id
                 |WHEN MATCHED THEN UPDATE SET lang = 'en'
                 |""".stripMargin)
    val r = spark.sql(s"SELECT id, lang FROM graft.$tbl " +
      "WHERE id IN (1, 2, 3) ORDER BY id").collect()
    assert(r(0).getString(1) == "en" && r(1).getString(1) == "en")
    assert(r(2).isNullAt(1), "unmatched rows null-fill through evolution")
    // materialized now: UPDATE works
    spark.sql(s"UPDATE graft.$tbl SET lang = 'de' WHERE id = 3")
    assert(spark.sql(s"SELECT lang FROM graft.$tbl WHERE id = 3")
      .head.getString(0) == "de")
  }

  test("the engine refuses a SET of a column absent from the data " +
       "(the silent-drop hazard) on both the CoW and MOR update paths") {
    import spark.implicits._
    val tbl = "graft_w49_guard"
    val dir = clean(tbl); seed(dir)
    intercept[IllegalArgumentException] {
      MergeOps.mergeUpdateWhere(spark, dir, col("id") === 1,
        Seq("ghost" -> lit("x")), "id", "grp")
    }
    intercept[IllegalArgumentException] {
      MergeOps.mergeUpdateMor(spark, dir, col("id") === 1,
        Seq("ghost" -> lit("x")), "id", "grp")
    }
    assert(Versioned.currentVersion(spark, dir).contains(1L),
      "refused updates must publish nothing")
  }

  test("streaming declines while a declared column is unmaterialized " +
       "(row-image batches would be narrower than the table schema)") {
    val tbl = "graft_w49_stream"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMNS (lang STRING)")
    val ck = java.nio.file.Files
      .createTempDirectory("w49ck").toString
    val failed =
      try {
        val q = spark.readStream.table(s"graft.$tbl")
          .writeStream.format("memory").queryName("w49_mem")
          .option("checkpointLocation", ck).start()
        try { q.processAllAvailable(); false }
        finally q.stop()
      } catch { case e: Throwable =>
        def chain(t: Throwable): Seq[Throwable] =
          if (t == null) Nil else t +: chain(t.getCause)
        chain(e).exists(_.getMessage != null) }
    assert(failed, "the stream must decline loudly, not emit narrow rows")
  }
}
