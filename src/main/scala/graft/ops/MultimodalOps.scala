package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.engine.Tables._

/** Multimodal-column plumbing (builder brief): image/audio/video as opaque
  * binary columns with typed metadata. The container has no codec
  * libraries, so the decode/feature kernels are STUBS — deterministic
  * fakes clearly marked below — while the Spark-side plumbing (schema,
  * binary payloads, partition-wise batch processing, UDF signatures) is
  * real and tested.
  *
  * At 100 TB: assets live in parquet with the binary payload column
  * last (column pruning skips it for metadata-only queries), partitioned
  * by kind/date; per-partition batch decode amortizes codec init exactly
  * like the mapPartitions below. */
object MultimodalOps {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)
  ))

  /** Synthetic asset table derived from `documents` (no binary testdata
    * ships): payload = utf8 bytes of the text, kind cycles through the
    * three modalities, metadata derived deterministically. */
  def syntheticAssets(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("asset_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"),
      struct(
        (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("n_chars"), lit(480)) + 1).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms")).as("meta"))

  /** Metadata-only scan: oracle-checked. Column pruning means the binary
    * payload is read only for the digest/size, never decoded. */
  def mmMeta(s: SparkSession, d: String): DataFrame =
    syntheticAssets(s, d)
      .select(col("asset_id"), col("kind"),
              length(col("payload")).cast("long").as("n_bytes"),
              md5(col("payload")).as("digest"),
              col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy("asset_id")

  /** WebDataset-style shard manifest: assign every asset a shard and a
    * byte offset in its modality's concatenated stream, so a downstream
    * writer can emit fixed-budget training shards (tar/tfrecord) and a
    * reader can seek any asset without scanning — the packaging step
    * between a cleaned corpus and the training loader. Greedy
    * whole-asset packing: an asset belongs to the shard its START byte
    * falls in (shards may overhang the budget by < one asset, the
    * standard tar-shard rule; assets are never split).
    *
    * The byte offsets are a per-kind exclusive prefix sum computed with
    * the DISTRIBUTED prefix-sum machinery (range partition →
    * per-partition window → broadcast partition offsets), never a
    * per-kind global window — 3 modalities would mean 3 tasks doing all
    * the work at 100 TB (the text_pack_sequences argument, per-group). */
  def mmShardPack(s: SparkSession, d: String): DataFrame = {
    val budget = 65536L // shard byte budget (64 KiB at test scale)
    val t = syntheticAssets(s, d)
      .select(col("asset_id"), col("kind"),
              length(col("payload")).cast("long").as("n_bytes"))
    val nPart = math.max(1, s.sessionState.conf.numShufflePartitions)
    val ranged = t.repartitionByRange(nPart, col("kind"), col("asset_id"))
      .sortWithinPartitions("kind", "asset_id")
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy("pid", "kind").orderBy("asset_id")
    val withCum = ranged.withColumn("pcum", sum("n_bytes").over(w))
    val wOff = Window.partitionBy("kind").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("pid", "kind")
      .agg(sum("n_bytes").as("ptot"))
      .withColumn("poff", coalesce(sum("ptot").over(wOff), lit(0L)))
      .select("pid", "kind", "poff")
    withCum.join(broadcast(offsets), Seq("pid", "kind"))
      .withColumn("start_byte", col("pcum") - col("n_bytes") + col("poff"))
      .select(col("asset_id"), col("kind"), col("n_bytes"),
              expr(s"start_byte DIV $budget").as("shard_id"),
              col("start_byte"))
      .orderBy("asset_id")
  }

  /** STUB decode + feature extraction. A real implementation decodes the
    * payload with a codec and runs a vision/audio model per batch; this
    * deterministic fake hashes payload bytes into an 8-dim feature so the
    * partition-wise batch shape, schema, and downstream joins are real. */
  def extractFeaturesStub(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false)))
    val rdd = assets.select("asset_id", "kind", "payload").rdd
      .mapPartitions { it =>
        // codec/model init happens ONCE per partition (the batch shape
        // that matters at scale); the per-row body is the stub.
        it.map { r =>
          val bytes = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          val feat = Array.tabulate(8) { i =>
            var h = 1125899906842597L + i
            bytes.foreach(b => h = 31 * h + b)
            ((h % 1000).toFloat / 1000.0f)
          }
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("kind"), feat.toSeq)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize: a real kernel re-encodes pixels; the fake truncates the
    * payload and rewrites metadata, keeping the binary-in/binary-out
    * column contract. */
  def resizeStub(assets: DataFrame, maxBytes: Int): DataFrame =
    assets.select(
      col("asset_id"), col("kind"),
      expr(s"substring(payload, 1, $maxBytes)").as("payload"),
      struct(least(col("meta.width"), lit(maxBytes)).as("width"),
             least(col("meta.height"), lit(maxBytes)).as("height"),
             col("meta.duration_ms").as("duration_ms")).as("meta"))

  /** Declared resize query: payloads truncated to 256 bytes via
    * [[resizeStub]]; the output projects metadata (sizes), so the oracle
    * can mirror the byte arithmetic on the source text. */
  def mmResize(s: SparkSession, d: String): DataFrame =
    resizeStub(syntheticAssets(s, d), 256)
      .select(col("asset_id"), col("kind"),
              length(col("payload")).cast("long").as("n_bytes"),
              col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy("asset_id")

  /** Declared frame-sampling query: one row per 64-byte pseudo-frame of
    * each video asset ([[frameSampleStub]]); metadata projection keeps
    * the oracle textual. */
  def mmFrames(s: SparkSession, d: String): DataFrame =
    frameSampleStub(syntheticAssets(s, d), 64)
      .select(col("asset_id"), col("frame_no").cast("long").as("frame_no"),
              length(col("frame_bytes")).cast("long").as("n_bytes"))
      .orderBy("asset_id", "frame_no")

  /** Declared feature-extraction query (no oracle — the stub hash is not
    * SQL-expressible): per-asset 8-dim feature, CSV-serialized for the
    * driver comparator. */
  def mmFeatures(s: SparkSession, d: String): DataFrame =
    extractFeaturesStub(syntheticAssets(s, d))
      .select(col("asset_id"), col("kind"),
        concat_ws(",", transform(col("feature"),
          f => format_string("%.3f", f))).as("feature_csv"))
      .orderBy("asset_id")

  /** STUB frame sampling for video assets: every `stride`-th byte stands
    * in for every N-th frame; output is one row per sampled frame —
    * the explode shape a real frame sampler produces. */
  def frameSampleStub(assets: DataFrame, stride: Int): DataFrame =
    assets.where(col("kind") === "video")
      .select(col("asset_id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(length(payload) div $stride, 1))," +
          s" i -> substring(payload, (i - 1) * $stride + 1, $stride))")))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_bytes")
}
