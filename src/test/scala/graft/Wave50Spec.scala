package graft

import org.apache.spark.sql.functions._
import graft.engine.Versioned
import graft.ops.MergeOps

/** Round-16 wave 7: CHECK constraints as SQL DDL (Spark 4's DSv2
  * constraint API → the store's persisted CHECK machinery). Pins the
  * constraints() report, DROP CONSTRAINT IF EXISTS semantics, the
  * unknown-name loud drop, and that UNIQUE declarations decline like
  * PRIMARY KEY ones. */
class Wave50Spec extends SparkTestBase {

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

  private def seed(dir: String): Unit = {
    import spark.implicits._
    val df = (0 until 40).map(i => (i.toLong, s"v$i", i % 4, i * 10))
      .toDF("id", "nm", "grp", "score")
    MergeOps.mergeUpsert(spark, dir, df, "id", "grp")
  }

  test("ADD CONSTRAINT persists, reports through constraints() as " +
       "ENFORCED+VALID, and gates writes; DROP lifts the gate") {
    val tbl = "graft_w50_chk"
    val dir = clean(tbl); seed(dir); register()
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl " +
      "ADD CONSTRAINT score_nonneg CHECK (score >= 0)")
    val cons = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array.empty, tbl))
      .constraints()
    assert(cons.length == 1 && cons(0).name == "score_nonneg")
    assert(cons(0).enforced, "every write re-checks: ENFORCED")
    // gate bites through the Scala write door too (shared sidecar)
    import spark.implicits._
    intercept[Exception] {
      MergeOps.mergeUpsert(spark, dir,
        Seq((99L, "bad", 3, -5)).toDF("id", "nm", "grp", "score"),
        "id", "grp")
    }
    spark.sql(s"ALTER TABLE graft.$tbl DROP CONSTRAINT score_nonneg")
    MergeOps.mergeUpsert(spark, dir,
      Seq((99L, "ok", 3, -5)).toDF("id", "nm", "grp", "score"),
      "id", "grp")
    assert(spark.sql(s"SELECT score FROM graft.$tbl WHERE id = 99")
      .head.getInt(0) == -5)
  }

  test("DROP CONSTRAINT: unknown name is loud; IF EXISTS on a missing " +
       "name is a clean no-op (no commit)") {
    val tbl = "graft_w50_drop"
    val dir = clean(tbl); seed(dir); register()
    val v = Versioned.currentVersion(spark, dir).get
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl DROP CONSTRAINT ghost")
    }
    spark.sql(s"ALTER TABLE graft.$tbl DROP CONSTRAINT IF EXISTS ghost")
    assert(Versioned.currentVersion(spark, dir).contains(v),
      "neither form may commit a version")
  }

  test("UNIQUE and PRIMARY KEY declarations decline loudly — the " +
       "store cannot enforce them as write-time row predicates") {
    val tbl = "graft_w50_pk"
    val dir = clean(tbl); seed(dir); register()
    val v = Versioned.currentVersion(spark, dir).get
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl ADD CONSTRAINT u UNIQUE (id)")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl " +
        "ADD CONSTRAINT pk PRIMARY KEY (id)")
    }
    assert(Versioned.currentVersion(spark, dir).contains(v))
  }
}
