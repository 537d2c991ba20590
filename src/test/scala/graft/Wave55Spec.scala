package graft

import org.apache.spark.sql.functions._

import graft.engine.Versioned
import graft.ops.MergeOps

/** Round-16 wave 12: streaming WRITE into the versioned store through
  * the SQL catalog — `df.writeStream.toTable("graft.t")`. Pins the
  * epoch-per-version commit shape, exactly-once epoch replay through
  * the applied-batch ledger, update-as-append for streaming
  * aggregations, the loud complete-mode/missing-key declines,
  * persisted-constraint enforcement mid-stream, and staging cleanup. */
class Wave55Spec extends SparkTestBase {

  private val rootDir =
    new java.io.File(sys.props("java.io.tmpdir")).getAbsolutePath

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", rootDir)
  }

  private def clean(name: String): String = {
    val dir = new java.io.File(rootDir, name).getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    dir
  }

  test("writeStream.toTable: one version per micro-batch, upsert " +
       "semantics, staging cleaned, time travel sees each trigger") {
    import spark.implicits._
    val tbl = "graft_w55_sink"
    val dir = clean(tbl); val src = clean(s"${tbl}_src")
    val ck = clean(s"${tbl}_ck"); register()
    MergeOps.mergeUpsert(spark, dir,
      (0 until 40).map(i => (i.toLong, i % 4, i * 10))
        .toDF("id", "grp", "x"), "id", "grp")
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    val v0 = Versioned.currentVersion(spark, dir).get

    (40 until 60).map(i => (i.toLong, i % 4, i * 10))
      .toDF("id", "grp", "x")
      .write.mode("overwrite").parquet(src)
    val q = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
      .writeStream.option("checkpointLocation", ck)
      .toTable(s"graft.$tbl")
    try {
      q.processAllAvailable()   // epoch 0: the 20 inserts
      val v1 = Versioned.currentVersion(spark, dir).get
      assert(v1 > v0, "an epoch with data must commit a store version")
      // second drop: 5 updates (same keys, new x) — upsert, not append
      (0 until 5).map(i => (i.toLong, i % 4, 777))
        .toDF("id", "grp", "x")
        .write.mode("append").parquet(src)
      q.processAllAvailable()   // epoch 1
      val v2 = Versioned.currentVersion(spark, dir).get
      assert(v2 > v1, "each micro-batch must be its own version")
      // time travel between the triggers: epoch 0's snapshot still has
      // the original x for id 0
      assert(spark.sql(
        s"SELECT x FROM graft.$tbl VERSION AS OF $v1 WHERE id = 0")
        .head.getInt(0) == 0)
    } finally q.stop()
    val res = spark.sql(s"SELECT id, x FROM graft.$tbl ORDER BY id")
      .collect()
    assert(res.length == 60, "40 base + 20 streamed inserts, 5 upserts")
    assert(res.take(5).forall(_.getInt(1) == 777),
      "the second trigger must have REPLACED ids 0-4, not duplicated")
    assert(res(40).getInt(1) == 400)
    // staging fully reclaimed after the last commit
    val stage = new org.apache.hadoop.fs.Path(s"$dir/_streamstage")
    val fs = stage.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(stage) || fs.listStatus(stage).forall(st =>
      fs.listStatus(st.getPath).isEmpty),
      "every committed epoch's staging dir must be deleted")
  }

  test("epoch replay is exactly-once: a replayed commit no-ops on the " +
       "applied-batch ledger and still cleans its staging") {
    import spark.implicits._
    val tbl = "graft_w55_replay"
    val dir = clean(tbl); register()
    val df = (0 until 12).map(i => (i.toLong, i % 3, i)).toDF("id", "grp", "x")
    MergeOps.mergeUpsert(spark, dir, df, "id", "grp")
    val w = new graft.sql.GraftStreamingWrite(spark, dir, tbl,
      "q-replay-test", df.schema, "id", "grp")
    val factory = w.createStreamingWriterFactory(null)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(df.schema)
    def stageEpoch(epoch: Long): Array[
        org.apache.spark.sql.connector.write.WriterCommitMessage] = {
      val writer = factory.createWriter(0, epoch * 100, epoch)
      Seq((100L + epoch, 0, 5), (101L + epoch, 1, 6)).foreach { t =>
        writer.write(conv(org.apache.spark.sql.Row(t._1, t._2, t._3))
          .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      }
      Array(writer.commit())
    }
    val msgs = stageEpoch(7L)
    w.commit(7L, msgs)
    val v1 = Versioned.currentVersion(spark, dir).get
    // the CRASH-REPLAY shape: commit already published, cleanup may or
    // may not have run, the epoch re-runs with the same id — restage
    // the same files and commit again
    val msgs2 = stageEpoch(7L)
    w.commit(7L, msgs2)
    assert(Versioned.currentVersion(spark, dir).get == v1,
      "a replayed epoch must NO-OP (ledger hit), never double-apply")
    assert(spark.sql(
      s"SELECT count(*) FROM graft.$tbl WHERE id = 107").head.getLong(0)
      == 1L)
    // a NEW epoch still commits
    w.commit(9L, stageEpoch(9L))
    assert(Versioned.currentVersion(spark, dir).get == v1 + 1)
  }

  test("update mode routes through update-as-append: a streaming " +
       "aggregation upserts its refreshed rows by key") {
    import spark.implicits._
    val tbl = "graft_w55_agg"
    val dir = clean(tbl); val src = clean(s"${tbl}_src")
    val ck = clean(s"${tbl}_ck"); register()
    // seed the table with the aggregate's schema: (grp key, cnt)
    MergeOps.mergeUpsert(spark, dir,
      Seq((99L, 0L, 0L)).toDF("grp", "cnt", "bucket"), "grp", "bucket")
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='grp')")
    (0 until 10).map(i => (i.toLong % 2, i)).toDF("grp", "x")
      .write.mode("overwrite").parquet(src)
    val q = spark.readStream
      .schema(spark.read.parquet(src).schema).parquet(src)
      .groupBy($"grp").agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", lit(0L))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ck)
      .toTable(s"graft.$tbl")
    try {
      q.processAllAvailable()
      (0 until 6).map(i => (0L, i)).toDF("grp", "x")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.sql(
      s"SELECT grp, cnt FROM graft.$tbl WHERE grp < 99 ORDER BY grp")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((0L, 11L), (1L, 5L)),
      "update mode must refresh grp 0's count in place (5 -> 11), " +
        s"got ${out.toSeq}")
  }

  test("declines are loud: complete mode, missing keyCol; a " +
       "constraint-violating batch fails the query, publishes nothing") {
    import spark.implicits._
    val tbl = "graft_w55_decl"
    val dir = clean(tbl); val src = clean(s"${tbl}_src")
    register()
    MergeOps.mergeUpsert(spark, dir,
      (0 until 8).map(i => (i.toLong, i % 2, i)).toDF("id", "grp", "x"),
      "id", "grp")
    (8 until 10).map(i => (i.toLong, i % 2, i)).toDF("id", "grp", "x")
      .write.mode("overwrite").parquet(src)
    val srcSchema = spark.read.parquet(src).schema
    // complete mode: build-time decline (no keyCol even needed first)
    val e1 = intercept[Exception] {
      val q = spark.readStream.schema(srcSchema).parquet(src)
        .groupBy($"grp").agg(count(lit(1)).cast("int").as("x"),
          first($"id").as("id"))
        .select($"id", $"grp", $"x")
        .writeStream.outputMode("complete")
        .option("checkpointLocation", clean(s"${tbl}_ck1"))
        .toTable(s"graft.$tbl")
      try q.processAllAvailable() finally q.stop()
    }
    def deepMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(deepMsg(e1).contains("foreachBatch"),
      s"complete mode must name the sanctioned spelling, got: ${deepMsg(e1)}")
    // missing keyCol: loud before staging a byte
    val e2 = intercept[Exception] {
      val q = spark.readStream.schema(srcSchema).parquet(src)
        .writeStream.option("checkpointLocation", clean(s"${tbl}_ck2"))
        .toTable(s"graft.$tbl")
      try q.processAllAvailable() finally q.stop()
    }
    assert(deepMsg(e2).contains("merge key"),
      s"missing keyCol must fail loudly, got: ${deepMsg(e2)}")
    // persisted CHECK constraint: violating batch kills the query,
    // nothing publishes, the epoch staging is swept by abort
    spark.sql(s"ALTER TABLE graft.$tbl SET TBLPROPERTIES('keyCol'='id')")
    spark.sql(s"ALTER TABLE graft.$tbl " +
      "ADD CONSTRAINT x_nonneg CHECK (x >= 0)")
    val vBefore = Versioned.currentVersion(spark, dir).get
    Seq((50L, 0, -5)).toDF("id", "grp", "x")
      .write.mode("append").parquet(src)
    val e3 = intercept[Exception] {
      val q = spark.readStream.schema(srcSchema).parquet(src)
        .writeStream.option("checkpointLocation", clean(s"${tbl}_ck3"))
        .toTable(s"graft.$tbl")
      try q.processAllAvailable() finally q.stop()
    }
    val all3 = deepMsg(e3)
    assert(all3.toLowerCase.contains("constraint") ||
      all3.contains("x_nonneg"), s"expected a constraint failure: $all3")
    assert(Versioned.currentVersion(spark, dir).get == vBefore,
      "a failed epoch must publish NOTHING")
    assert(spark.sql(s"SELECT count(*) FROM graft.$tbl WHERE x < 0")
      .head.getLong(0) == 0L)
  }
}
