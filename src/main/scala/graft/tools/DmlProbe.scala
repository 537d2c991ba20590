package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.MergeOps
import graft.sql.{GraftCatalog, GraftDml}

/** Scratch probe: can a runtime-installed planner strategy catch
  * UpdateTable/MergeIntoTable over a GraftTable, or does analysis
  * reject them first? Run: sbt "runMain graft.tools.DmlProbe". */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("dml-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rootDir = new java.io.File(sys.props("java.io.tmpdir"))
      .getAbsolutePath
    val dir = new java.io.File(rootDir, "graft_dmlprobe").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)

    val df = (0 until 100).map(i => (i.toLong, s"name_$i", i % 5, i * 10))
      .toDF("id", "nm", "grp", "score")
    MergeOps.mergeUpsert(spark, dir, df, "id", "grp")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", rootDir)
    spark.sql("ALTER TABLE graft.graft_dmlprobe " +
      "SET TBLPROPERTIES('keyCol'='id')")
    GraftDml.install(spark)

    println("=== UPDATE ===")
    spark.sql("UPDATE graft.graft_dmlprobe SET score = score + 1000, " +
      "nm = concat(nm, '!') WHERE id < 10")
    val got = spark.sql(
      "SELECT score FROM graft.graft_dmlprobe WHERE id = 3").head.getInt(0)
    println(s"id=3 score after update: $got (expect 1030)")
    assert(got == 1030)

    println("=== MERGE ===")
    (Seq((3L, "three", 3, 7), (200L, "twohundred", 0, 8),
        (5L, "five", 0, 9)))
      .toDF("id", "nm", "grp", "score")
      .createOrReplaceTempView("src")
    spark.sql("""MERGE INTO graft.graft_dmlprobe t USING src s
                |ON t.id = s.id
                |WHEN MATCHED AND s.id = 5 THEN DELETE
                |WHEN MATCHED THEN UPDATE SET score = s.score + t.score
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val r = spark.sql("SELECT id, nm, score FROM graft.graft_dmlprobe " +
      "WHERE id IN (3, 5, 200) ORDER BY id").collect()
    r.foreach(println)
    // id=3: 1030+7=1037 name unchanged 'name_3!'; id=5 deleted;
    // id=200 inserted score 8
    assert(r.length == 2, s"expected 2 rows, got ${r.length}")
    assert(r(0).getLong(0) == 3 && r(0).getInt(2) == 1037)
    assert(r(1).getLong(0) == 200 && r(1).getInt(2) == 8)
    println("=== MERGE STAR ===")
    Seq((7L, "seven", 2, 777), (300L, "threehundred", 0, 5))
      .toDF("id", "nm", "grp", "score")
      .createOrReplaceTempView("src2")
    spark.sql("""MERGE INTO graft.graft_dmlprobe t USING src2 s
                |ON t.id = s.id
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val r2 = spark.sql("SELECT id, nm, score FROM graft.graft_dmlprobe " +
      "WHERE id IN (7, 300) ORDER BY id").collect()
    r2.foreach(println)
    assert(r2.length == 2 && r2(0).getString(1) == "seven" &&
      r2(0).getInt(2) == 777 && r2(1).getInt(2) == 5,
      "star actions must apply")
    println("PROBE OK")
    spark.stop()
  }
}
