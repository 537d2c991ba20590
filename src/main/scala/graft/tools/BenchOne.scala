package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: time one query N times (default 3) on a given sf dir.
  * Usage: runMain graft.tools.BenchOne <sfDir> <query> [n] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val q = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",    // Bench parity
        graft.engine.Scale.shufflePartitions(sfDir, cpus.toInt).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Mirror Bench's warm phase: run once on the warm dir (codegen classes
    // for the sfDir plan are identical modulo paths, so JIT/janino carry
    // over) before the timed runs.
    sys.env.get("SPARK_GRAFT_WARMUP_DIR").foreach { w =>
      try SparkEntry.queries(q)(spark, w).count()
      catch { case _: Throwable => () }
    }
    // Standing per-dataset artifacts (mirrors Bench's warm phase): build
    // them OUTSIDE the timed loop so run 1 isn't billed the one-time ETL.
    try graft.ops.Relational.ensureBucketedTables(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.ops.SimOps.ensureSignatureStore(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.ops.SimOps.ensureEmbSignatureStore(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.ops.StatsOps.ensureAnalyzedTables(spark, sfDir)
    catch { case _: Throwable => () }
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[benchone] $q run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
    }
    spark.stop()
  }
}
