package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.SimOps
import graft.streaming.StreamOps

/** Round-8 wave: streaming maintenance of the minhash signature store
  * (r7 verdict item 5) — exactly-once per-batch appends and post-stream
  * parity with the batch-computed store. */
class Wave14Spec extends SparkTestBase {

  private def doc(i: Long): (Long, String) =
    (i, (0 until 12).map(j => s"tok${(i * 7 + j * 3) % 23}").mkString(" "))

  test("stream-maintained sig store: per-batch exactly-once, " +
       "post-stream parity with the batch store") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val storePath = java.nio.file.Files
      .createTempDirectory("graft_stream_sig").toString
    val in = MemoryStream[(Long, String)]
    val q = StreamOps.sigStoreMaintenance(
        in.toDF().toDF("doc_id", "text"), storePath)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_stream_ck").toString)
      .start()
    try {
      in.addData((1L to 5L).map(doc): _*)
      q.processAllAvailable()
      in.addData((6L to 9L).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamOps.readSigStore(spark, storePath)
    val batch = SimOps.minhashSignaturesOf(
      (1L to 9L).map(doc).toDF("doc_id", "text"))
    val a = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(a == b, "streamed store must equal the batch-computed " +
      s"signatures: ${a.size} vs ${b.size} rows")

    // exactly-once: a REPLAYED micro-batch (same batchId — the restart-
    // between-sink-and-checkpoint case) rewrites its own partition
    // instead of appending duplicates
    StreamOps.foldBatchIntoSigStore(
      (6L to 9L).map(doc).toDF("doc_id", "text"), batchId = 1L, storePath)
    // fresh read: the overwrite replaced batch 1's physical files, so the
    // pre-replay DataFrame's file listing is stale by design
    val replayedDf = StreamOps.readSigStore(spark, storePath)
    val replayed = replayedDf.collect().map(_.toSeq).toSet
    assert(replayed == b, "replaying a batch id must be a no-op")

    // the streamed store plugs straight into the incremental-dedup probe
    val probe = SimOps.minhashSignaturesOf(
      Seq((100L, doc(3L)._2)).toDF("doc_id", "text"))
    val dups = SimOps.dedupNewVsStore(probe, replayedDf).collect()
    assert(dups.exists(r => r.getLong(0) == 100L && r.getLong(1) == 3L &&
             r.getDouble(2) == 1.0),
      s"an exact duplicate of a stored doc must surface: ${dups.toSeq}")
  }

  private def vec(i: Long): (Long, String, Array[Float]) =
    (i, s"l${i % 3}",
     Array.tabulate(64)(j => (((i * 31 + j * 7) % 13) - 6).toFloat / 7f))

  test("stream-maintained embedding store: fixed geometry recorded, " +
       "exactly-once folds, probe-ready for incremental ANN") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_stream_emb")
    val (vecPath, sigPath) = (s"$root/vec", s"$root/sig")
    val bits = 5
    val in = MemoryStream[(Long, String, Array[Float])]
    val q = StreamOps.embStoreMaintenance(
        in.toDF().toDF("vec_id", "label", "embedding"),
        vecPath, sigPath, bits)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_emb_ck").toString)
      .start()
    try {
      in.addData((1L to 6L).map(vec): _*)
      q.processAllAvailable()
      in.addData((7L to 10L).map(vec): _*)
      q.processAllAvailable()
    } finally q.stop()

    val (oldVec, oldSig, gotBits) = StreamOps.readEmbStore(spark, vecPath, sigPath)
    assert(gotBits == bits, "geometry file must round-trip the pinned bits")
    // signature parity with a batch computation under the same geometry
    val all = (1L to 10L).map(vec).toDF("vec_id", "label", "embedding")
    val wantSig = SimOps.embStoreSigRows(SimOps.normedOf(spark, all), bits)
      .collect().map(_.toSeq).toSet
    assert(oldSig.collect().map(_.toSeq).toSet == wantSig,
      "streamed signatures must equal the batch computation")
    // replaying a batch id must not duplicate store rows
    StreamOps.foldBatchIntoEmbStore(
      (7L to 10L).map(vec).toDF("vec_id", "label", "embedding"),
      batchId = 1L, vecPath, sigPath, bits)
    assert(StreamOps.readEmbStore(spark, vecPath, sigPath)._1.count() == 10,
      "replayed fold must overwrite its own batch, not append")
    // the streamed store is probe-ready: an identical query vector finds
    // its stored twin at cosine 1.0 through the standard probe path
    val probe = SimOps.normedOf(spark,
      Seq((100L, "lx", vec(4L)._3)).toDF("vec_id", "label", "embedding"))
    val (pv, ps, pb) = StreamOps.readEmbStore(spark, vecPath, sigPath)
    val nn = SimOps.incrementalAnnProbe(spark, probe, pv, ps, pb).collect()
    assert(nn.length == 1 && nn.head.getLong(1) == 4L &&
           nn.head.getDouble(2) == 1.0,
      s"identical vector must surface as top-1 at cos 1.0: ${nn.toSeq}")
  }

  test("exact↔ANN dispatch: crossover decision both sides; below it the " +
       "auto entries reproduce the exact kernels") {
    assert(!SimOps.chooseAnn(SimOps.AnnCrossover - 1),
      "one under the crossover must stay exact")
    assert(SimOps.chooseAnn(SimOps.AnnCrossover),
      "at the crossover the bucketed kernel takes over")
    // sf0.001 has 500 vectors — the exact side of the dispatch; the auto
    // entries must be indistinguishable from the pinned exact baselines
    assert(SimOps.simCosineTopkAuto(spark, sf).collect().toSeq ==
           SimOps.simCosineTopk(spark, sf).collect().toSeq,
      "auto top-k must equal the exact kernel below the crossover")
    assert(SimOps.simKnnLabelAuto(spark, sf).collect().toSeq ==
           SimOps.simKnnLabel(spark, sf).collect().toSeq,
      "auto kNN must equal the exact kernel below the crossover")
    assert(SimOps.dedupEmbeddingAuto(spark, sf).collect().toSeq ==
           SimOps.dedupEmbedding(spark, sf).collect().toSeq,
      "auto dedup must equal the exact kernel below the crossover")
  }

  test("embedding store persists float32 vectors: format flagged, bytes " +
       "roughly halved vs the float64 form, dequantization exact") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val (vecPath, _) = SimOps.ensureEmbSignatureStore(spark, sf)
    val raw = spark.read.parquet(vecPath)
    assert(raw.schema("vf").dataType.asInstanceOf[ArrayType]
             .elementType == FloatType,
      "store must hold float32 vectors")
    // bytes: materialize the dequantized float64 twin and compare sizes
    val tmp = java.nio.file.Files.createTempDirectory("graft_vec64").toString
    SimOps.readEmbVecStore(spark, vecPath)
      .write.mode("overwrite").parquet(tmp)
    def dataBytes(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(hp).filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }
    val (f32, f64) = (dataBytes(vecPath), dataBytes(tmp))
    assert(f32 < (f64 * 0.7).toLong,
      s"float32 store should be well under the float64 form: $f32 vs $f64")
    // dequantized values must be EXACTLY the source embeddings (the
    // corpus is float32-native, so the round-trip is lossless)
    val src = SimOps.normed(spark, sf)
      .where(conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long").mod(100) < 90)
      .select("vec_id", "vd").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val back = SimOps.readEmbVecStore(spark, vecPath)
      .select("vec_id", "vd").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(back == src, "float32 round-trip must be bit-exact here")
  }
}
