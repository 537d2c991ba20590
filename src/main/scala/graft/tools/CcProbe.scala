package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of dedupClusters internals. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { run =>
      println(s"[cc] --- run $run ---")
      val pairs = t("pairs ckpt") {
        graft.ops.SimOps.cosinePairs(spark, d).where(col("cos_r") >= 0.40)
          .select(col("id_a"), col("id_b")).localCheckpoint()
      }
      val n = t("pairs count")(pairs.count())
      val edges = t("edges ckpt") {
        pairs.union(pairs.select(col("id_b"), col("id_a")))
          .toDF("u", "v").repartition(1, col("u")).localCheckpoint()
      }
      var labels = t("init labels") {
        edges.groupBy("u").agg(least(col("u"), min(col("v"))).as("l"))
          .localCheckpoint()
      }
      var changed = 1L; var rounds = 0
      while (changed > 0 && rounds < 20) {
        val stepped = edges
          .join(labels.select(col("u").as("v"), col("l").as("lv")), "v")
          .groupBy("u").agg(min(col("lv")).as("nm"))
          .join(labels, "u")
          .select(col("u"), least(col("l"), col("nm")).as("m"))
        val next = t(s"round $rounds ckpt") {
          stepped
            .join(stepped.select(col("u").as("m"), col("m").as("lm")), "m")
            .join(labels.select(col("u"), col("l").as("lo")), "u")
            .select(col("u"), col("lm").as("l"),
                    (col("lm") =!= col("lo")).as("chg"))
            .localCheckpoint()
        }
        changed = t(s"round $rounds count")(next.where(col("chg")).count())
        labels = next.select("u", "l")
        rounds += 1
      }
      println(s"[cc] rounds=$rounds n_pairs=$n")
    }
    spark.stop()
  }
}
