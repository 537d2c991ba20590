package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops._
import graft.engine.Pipeline
import graft.streaming.StreamOps
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Wave-4 tests: T3 streaming semantics (MemoryStream), multimodal
  * plumbing, the Pipeline façade, ANN recall, SimHash. */
class Wave4Spec extends SparkTestBase {

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("streaming tumbling agg drops data later than the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = StreamOps.tumblingCounts(in.toDF())
      .writeStream.format("memory").queryName("tumble")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(30), 1, "click", 1.0))
      q.processAllAvailable()
      // advance event time far past window end + watermark -> finalizes 10:00
      in.addData(Ev(3, t(180), 1, "click", 1.0))
      q.processAllAvailable()
      // this event is 3h late, watermark has passed: must be dropped
      in.addData(Ev(4, t(1), 1, "click", 99.0))
      q.processAllAvailable()
      val rows = spark.table("tumble").collect()
      assert(rows.length == 1, s"only the finalized 10:00 window: ${rows.toSeq}")
      assert(rows(0).getLong(2) == 2, "late row must not be counted")
    } finally q.stop()
  }

  test("streaming dedup within watermark removes duplicate event_ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = StreamOps.dedupWithinWatermark(in.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(Ev(1, t(0), 1, "click", 1.0), Ev(1, t(1), 1, "click", 1.0),
                 Ev(2, t(2), 1, "view", 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, t(3), 1, "click", 1.0)) // dup again, still in watermark
      q.processAllAvailable()
      assert(spark.table("dedup").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("foreachBatch sink writes every input row exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val in = MemoryStream[Ev]
    val q = StreamOps.foreachBatchParquet(in.toDF(), s"$dir/out").start()
    try {
      in.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Ev(3, t(2), 3, "click", 3.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
      assert(got.count() == 3)
      assert(got.select("event_id").distinct().count() == 3)
      assert(got.columns.contains("batch_id"))
    } finally q.stop()
  }

  test("streaming sessionize matches batch session_window on same data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evs = Seq(Ev(1, t(0), 1, "a", 0), Ev(2, t(10), 1, "a", 0),
                  Ev(3, t(60), 1, "a", 0), Ev(4, t(5), 2, "a", 0),
                  Ev(5, t(240), 1, "a", 0))
    val in = MemoryStream[Ev]
    val q = StreamOps.sessionize(in.toDF())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      in.addData(evs: _*)
      q.processAllAvailable()
      in.addData(Ev(99, t(600), 9, "a", 0)) // push watermark to finalize
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      val batch = evs.toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_window.start"),
                col("session_window.end"), col("n_events"))
        .collect().map(_.toSeq).toSet
      assert(batch.subsetOf(streamed ++ batch.filter(r =>
        r.head == 9L)), "finalized streaming sessions must match batch")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running counts across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = StreamOps.runningUserCounts(in.toDF())
      .writeStream.format("memory").queryName("runstate")
      .outputMode("update").start()
    try {
      in.addData(Ev(1, t(0), 7, "click", 0), Ev(2, t(1), 7, "view", 0))
      q.processAllAvailable()
      in.addData(Ev(3, t(2), 7, "click", 0), Ev(4, t(3), 8, "view", 0))
      q.processAllAvailable()
      val byBatch = spark.table("runstate").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // user 7: 2 after batch 1, then 3 after batch 2; user 8: 1
      assert(byBatch.contains((7L, 2L)) && byBatch.contains((7L, 3L)))
      assert(byBatch.contains((8L, 1L)))
    } finally q.stop()
  }

  test("streaming anomaly scores against pre-update state across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val q = StreamOps.streamingAnomaly(in.toDF())
      .writeStream.format("memory").queryName("sanom")
      .outputMode("append").start()
    try {
      // batch 1: five calm purchases — none scorable (state n < 5)
      in.addData((1 to 5).map(i =>
        Ev(i, t(i), 7, "purchase", 10.0 + i * 0.1)): _*)
      q.processAllAvailable()
      // batch 2: one calm value then a wild outlier; both score against
      // state built in batch 1 (proves state survives the batch boundary)
      in.addData(Ev(6, t(6), 7, "purchase", 10.3),
                 Ev(7, t(7), 7, "purchase", 500.0))
      q.processAllAvailable()
      val rows = spark.table("sanom").collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert((1 to 5).forall(i => rows(i.toLong).isEmpty),
        "first five rows must be unscored (n < 5)")
      // replay Welford in the test to the exact expected z for row 6
      var (n, mean, m2) = (0L, 0.0, 0.0)
      for (v <- Seq(10.1, 10.2, 10.3, 10.4, 10.5)) {
        n += 1; val d = v - mean; mean += d / n; m2 += d * (v - mean)
      }
      val z6 = (10.3 - mean) / math.sqrt(m2 / (n - 1))
      assert(math.abs(rows(6L).get - z6) < 1e-12,
        s"row 6 z ${rows(6L)} != replay $z6")
      assert(rows(7L).get > 100.0, "the outlier must score a huge z")
    } finally q.stop()
  }

  test("stream-stream join pairs purchases with preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val q = StreamOps.clickToPurchaseJoin(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData(Ev(1, t(0), 1, "click", 0), Ev(2, t(100), 2, "click", 0))
      purchases.addData(Ev(10, t(5), 1, "purchase", 0),   // 5 min after click 1
                        Ev(11, t(200), 2, "purchase", 0)) // 100 min after click 2
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(rows.toSeq == Seq((1L, 10L)),
        s"only the within-10-min pair joins: ${rows.toSeq}")
    } finally q.stop()
  }

  test("multimodal: features stub yields one 8-dim vector per asset, deterministic") {
    val assets = MultimodalOps.syntheticAssets(spark, sf)
    val f1 = MultimodalOps.extractFeaturesStub(assets).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val f2 = MultimodalOps.extractFeaturesStub(assets).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1.size == assets.count())
    assert(f1.values.forall(_.size == 8))
    assert(f1 == f2, "stub must be deterministic")
  }

  test("multimodal: resize truncates payload, frame sampling explodes video") {
    val assets = MultimodalOps.syntheticAssets(spark, sf)
    val resized = MultimodalOps.resizeStub(assets, 16)
    assert(resized.select(max(length(col("payload")))).collect()(0)
      .getInt(0) <= 16)
    assert(resized.schema("payload").dataType.typeName == "binary")
    val frames = MultimodalOps.frameSampleStub(assets, 32)
    assert(frames.count() > assets.where("kind = 'video'").count(),
      "sampling yields multiple frames per video")
    assert(frames.columns.toSeq == Seq("asset_id", "frame_no", "frame_bytes"))
  }

  test("pipeline facade wordcount equals operator wordcount") {
    val got = Pipeline.source(spark, s"$sf/documents.parquet")
      .flatMap(split(col("text"), " "), "token")
      .map(col("token"))
      .reduceByKey(Seq("token"), count(lit(1)).as("cnt"))
      .sort(col("cnt").desc, col("token").asc)
      .limit(20).df.collect().toSeq
    val want = ops.TextOps.textWordcount(spark, sf).collect().toSeq
    assert(got == want)
  }

  test("pipeline csv/json sources and sinks round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val p = Pipeline.source(spark, s"$sf/region.parquet")
    p.sinkCsv(s"$dir/csv")
    p.sinkJson(s"$dir/json")
    assert(Pipeline.csv(spark, s"$dir/csv").df.count() == 5)
    val j = Pipeline.json(spark, s"$dir/json").df
    assert(j.count() == 5 && j.columns.toSet == p.df.columns.toSet)
  }

  test("sim_ann_bucket: top-1 within bucket, sane recall vs brute force") {
    val ann = SimOps.simAnnBucket(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force top-1 neighbors
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = vecs.map { case (i, v) =>
      i -> vecs.filter(_._1 != i).maxBy(o => (cos(v, o._2), -o._1))._1
    }.toMap
    val recall = ann.count { case (q, n) => exact.get(q).contains(n) }
      .toDouble / exact.size
    assert(ann.nonEmpty && recall >= 0.8, s"ANN top-1 recall $recall")
    info(s"ANN top-1 recall vs brute force: $recall (coverage ${ann.size}/${exact.size})")
  }

  test("sim_ann_ivf: full coverage, deterministic, recall above floor") {
    val ivf = SimOps.simAnnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(ivf.length == n, "every vector gets a neighbor")
    // deterministic: same run twice
    val again = SimOps.simAnnIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.toSeq == again.toSeq)
    // recall floor vs brute force (IVF on isotropic data with nprobe=16
    // of ~sqrt(n) cells measures ~0.90; assert a safe floor)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exact = vecs.map { case (i, v) =>
      i -> vecs.filter(_._1 != i).maxBy(o => (cos(v, o._2), -o._1))._1
    }.toMap
    val recall = ivf.count { case (q, nb, _) => exact(q) == nb }
      .toDouble / exact.size
    assert(recall >= 0.85, s"IVF top-1 recall $recall")
    info(s"IVF top-1 recall vs brute force: $recall")
  }

  test("dedup_embedding_ann: precision 1.0 vs exact; bucketed plan") {
    val annPairs = SimOps.dedupEmbeddingAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exactPairs = SimOps.dedupEmbedding(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exact rerank → every emitted pair is a true qualifying pair
    assert(annPairs.subsetOf(exactPairs),
           s"false positives: ${annPairs.diff(exactPairs)}")
    info(s"dedup_embedding_ann recall on isotropic testdata: " +
         s"${annPairs.size}/${exactPairs.size}")
    // the scale-path plan must not contain an all-pairs join
    val plan = SimOps.dedupEmbeddingAnn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
           "ANN dedup must be bucketed, not all-pairs")
  }

  test("dedup_embedding_ann catches 100% of planted true near-dups") {
    // The real near-dup regime: planted copies at cos >= ~0.97. Perturb
    // each source vector by small deterministic noise; every (i, i+offset)
    // pair must come back — this is the property that holds at 100 TB.
    val src = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val offset = 1000000L
    val rnd = new scala.util.Random(13)
    val planted = src.map { case (i, v) =>
      (i + offset, v.map(x => x + 0.02 * rnd.nextGaussian()))
    }
    import spark.implicits._
    val all = (src ++ planted).toSeq.toDF("vec_id", "vd")
    graft.functions.VectorExprs.register(spark)
    val v = all.withColumn("nrm",
      sqrt(expr("graft_dot(vd, vd)"))).select("vec_id", "vd", "nrm")
    val found = SimOps.dedupEmbeddingAnnOn(v, tau = 0.9, tables = 4,
        targetBucket = 32, n = 2L * src.length).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = src.map(_._1).filterNot(i => found.contains((i, i + offset)))
    assert(missing.isEmpty,
           s"${missing.size} planted near-dup pairs missed: ${missing.take(5)}")
  }

  test("dedup_simhash finds identical docs at distance 0") {
    val out = SimOps.dedupSimhash(spark, sf).collect()
    val dups = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.filter(_.size > 1)
    val found = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    dups.foreach { ds =>
      val ids = ds.map(_._1).sorted
      for (Seq(x, y) <- ids.toSeq.combinations(2))
        assert(found.contains((x, y)), s"identical pair ($x,$y) missed")
    }
    out.foreach(r => assert(r.getLong(2) <= 3))
  }
}
