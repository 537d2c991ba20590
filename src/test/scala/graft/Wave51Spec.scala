package graft

import org.apache.spark.sql.functions._
import graft.engine.Versioned
import graft.ops.MergeOps
import graft.sql.GraftDml

/** Round-16 wave 8: DROP COLUMN as a catalog-level mask. Pins that
  * restaging writes physically shed the masked column (the mask ages
  * into the files), that row-level DML stays consistent post-drop, and
  * that a declared-only column drops by leaving the declared list
  * (no mask entry, name reusable). */
class Wave51Spec extends SparkTestBase {

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

  private def seed(dir: String): Unit = {
    import spark.implicits._
    val df = (0 until 40)
      .map(i => (i.toLong, s"v$i", i % 4, i * 10, s"note$i"))
      .toDF("id", "nm", "grp", "score", "note")
    MergeOps.mergeUpsert(spark, dir, df, "id", "grp")
  }

  test("a restaging write physically sheds the masked column from the " +
       "touched partition's new files; untouched partitions keep the " +
       "bytes but the mask hides them everywhere") {
    val tbl = "graft_w51_shed"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl DROP COLUMN note")
    assert(!spark.table(s"graft.$tbl").columns.contains("note"))
    // UPDATE through the SQL door post-drop: mask-consistent
    spark.sql(s"UPDATE graft.$tbl SET score = score + 1 WHERE id = 5")
    // the INSERT (batch-authoritative) restages grp=2's partition —
    // positional VALUES follow the table order (id, nm, score, grp:
    // file columns then the partition-dir column)
    spark.sql(s"INSERT INTO graft.$tbl VALUES (100, 'new', 7, 2)")
    val v = Versioned.currentVersion(spark, dir).get
    val man = Versioned.manifest(spark, dir, v)
    val g2 = man.find(_._1 == "grp=2").get
    val staged = spark.read.parquet(s"$dir/${g2._2}")
    assert(!staged.columns.contains("note"),
      s"the restaged grp=2 files must shed note, got " +
        staged.columns.mkString(","))
    // a partition untouched since the drop still carries the bytes...
    val g1 = man.find(_._1 == "grp=1").get
    assert(spark.read.parquet(s"$dir/${g1._2}").columns.contains("note"))
    // ...but never surfaces them
    assert(!spark.sql(s"SELECT * FROM graft.$tbl WHERE id = 9")
      .columns.contains("note"))
  }

  test("dropping a DECLARED-only column leaves the declared list — no " +
       "mask entry, so the name is immediately reusable") {
    val tbl = "graft_w51_decl"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMNS (tag STRING)")
    assert(spark.table(s"graft.$tbl").columns.contains("tag"))
    spark.sql(s"ALTER TABLE graft.$tbl DROP COLUMN tag")
    assert(!spark.table(s"graft.$tbl").columns.contains("tag"))
    // never materialized -> no files can resurrect it -> reusable
    spark.sql(s"ALTER TABLE graft.$tbl ADD COLUMNS (tag INT)")
    assert(spark.table(s"graft.$tbl").schema("tag").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("a persisted CHECK referencing the column blocks the drop " +
       "until the constraint goes") {
    val tbl = "graft_w51_con"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl " +
      "ADD CONSTRAINT s_pos CHECK (score >= 0)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl DROP COLUMN score")
    }
    spark.sql(s"ALTER TABLE graft.$tbl DROP CONSTRAINT s_pos")
    spark.sql(s"ALTER TABLE graft.$tbl DROP COLUMN score")
    assert(!spark.table(s"graft.$tbl").columns.contains("score"))
  }
}
