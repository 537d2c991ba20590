package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: tune sim_cosine_topk_ann — for a (tables, targetBucket, probe)
  * grid, report whether the ANN form recovers the exact global top-10 and
  * how long it takes warm. Usage: runMain graft.tools.TopkProbe <sfDir> */
object TopkProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val exact = graft.ops.SimOps.simCosineTopk(spark, d).collect().toSeq
    println(s"exact top-10 cosines: ${exact.map(_.getDouble(2)).mkString(",")}")
    val v = graft.ops.SimOps.normed(spark, d).cache()
    val n = v.count()
    for {
      tables <- Seq(2, 4, 6, 8)
      tb <- Seq(16, 32, 64)
      probe <- Seq(false, true)
    } {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ann = graft.ops.SimOps
          .simCosineTopkAnnP(spark, v, tables, tb, n, probe = probe)
          .collect().toSeq
        ((System.nanoTime() - t0) / 1e9, ann == exact)
      }
      val best = runs.map(_._1).min
      val ok = runs.forall(_._2)
      println(f"tables=$tables tb=$tb probe=$probe exact_match=$ok best=$best%.3fs")
    }
    spark.stop()
  }
}
