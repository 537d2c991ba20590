package graft

import graft.engine.Versioned
import graft.ops.MergeOps

/** Round-16 wave 10: partition management edges — mixed-layout
  * declines, unknown-partition drops, and the empty-table guard
  * reaching through DROP PARTITION. */
class Wave53Spec extends SparkTestBase {

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

  test("SHOW/DROP PARTITION edges: unknown drops are loud, dropping " +
       "every partition hits the empty-table guard, a mixed-layout " +
       "manifest declines rather than under-reports") {
    import spark.implicits._
    val tbl = "graft_w53_edge"
    val dir = clean(tbl); register()
    val df = (0 until 20).map(i => (i.toLong, i % 2, i))
      .toDF("id", "grp", "x")
    // key-range sidecars: the later spec-evolving write then carries
    // non-overlapping old entries verbatim (a genuinely MIXED manifest)
    MergeOps.mergeUpsert(spark, dir, df, "id", "grp",
      statsKeys = Seq("id"))
    assert(spark.sql(s"SHOW PARTITIONS graft.$tbl").collect()
      .map(_.getString(0)).sorted.sameElements(Seq("grp=0", "grp=1")))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl DROP PARTITION (grp = 9)")
    }
    spark.sql(s"ALTER TABLE graft.$tbl DROP PARTITION (grp = 1)")
    // the LAST partition: expiring everything is table deletion
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.$tbl DROP PARTITION (grp = 0)")
    }
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl")
      .head.getLong(0) == 10L)

    // mixed layout: evolve the spec by writing with a new partCol
    MergeOps.mergeUpsert(spark, dir,
      (100 until 110).map(i => (i.toLong, i % 2, i))
        .toDF("id", "grp", "x").withColumn("band",
          org.apache.spark.sql.functions.lit(7)),
      "id", "band", statsKeys = Seq("id"))
    val v = Versioned.currentVersion(spark, dir).get
    assert(Versioned.manifest(spark, dir, v).map(_._1)
      .exists(_.startsWith("grp=")), "old layout must carry verbatim")
    intercept[Exception] {
      spark.sql(s"SHOW PARTITIONS graft.$tbl").collect()
    }
  }
}
