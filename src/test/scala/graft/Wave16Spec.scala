package graft

import org.apache.spark.sql.functions._
import graft.engine.Versioned
import graft.ops.{IncrementalOps, Relational}

/** Round-8 wave: dynamic partition pruning and incremental rollup
  * maintenance (exactly-once partial-aggregate folding). */
class Wave16Spec extends SparkTestBase {

  test("scan_dpp: dim filter becomes a dynamic partition filter; " +
       "no rows lost vs the unpartitioned replay") {
    val q = Relational.scanDpp(spark, sf)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = graft.engine.Tables.orders(spark, sf)
      .where(col("o_orderstatus").isin("F", "P"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"DPP slice must match the direct replay: $got vs $want")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      "the fact scan must carry a dynamicpruning partition filter")
  }

  test("incremental rollup: folds merge exactly, replay is a no-op, " +
       "untouched days never restage") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rollup_t").toString
    def ev(day: String, vs: Double*) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.valueOf(s"$day 0${i % 10}:00:00"), v) }
    val base = (ev("2024-03-01", 10.0, 20.0) ++ ev("2024-03-02", 5.5))
      .toDF("ts", "value")
    IncrementalOps.foldBatch(spark, dir, base, "b0")
    // batch touches day 2 only; day 1 must keep its v1 manifest pointer
    IncrementalOps.foldBatch(spark, dir,
      ev("2024-03-02", 4.5, 1.0).toDF("ts", "value"), "b1")
    val v = Versioned.currentVersion(spark, dir).get
    assert(v == 2L)
    val man = Versioned.manifest(spark, dir, v).toMap
    assert(man("day_s=2024-03-01").contains("data/1/"),
      s"untouched day must still point at version 1: $man")
    assert(man("day_s=2024-03-02").contains("data/2/"),
      s"touched day must point at version 2: $man")
    // replaying b1 must be a no-op (no new version, same rows)
    IncrementalOps.foldBatch(spark, dir,
      ev("2024-03-02", 4.5, 1.0).toDF("ts", "value"), "b1")
    assert(Versioned.currentVersion(spark, dir).get == 2L,
      "replayed batch id must not create a version")
    val rows = IncrementalOps.readRollup(spark, dir)
      .select(col("day_s").cast("string"), col("n_events"),
              col("sum_value").cast("string"), col("min_value"),
              col("max_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
                           r.getDouble(3), r.getDouble(4))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("2024-03-01", 2L, "30.00", 10.0, 20.0),
      ("2024-03-02", 3L, "11.00", 1.0, 5.5)),
      s"merged rollup rows: ${rows.toSeq}")
  }
}
