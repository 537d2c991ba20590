package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: measure IVF recall vs brute force at a given sf/nprobe. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (np <- Seq(4, 8, 12, 16, 20)) {
      val v = graft.ops.SimOps.normed(spark, d)
      val t0 = System.nanoTime()
      val ivf = graft.ops.SimOps.simAnnIvfP(spark, v, v.count(), np)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dt = (System.nanoTime() - t0) / 1e9
      val brute = graft.ops.SimOps.cosinePairs(spark, d).collect()
      val best = scala.collection.mutable.Map[Long, (Double, Long)]()
      brute.foreach { r =>
        val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        for ((q, n) <- Seq((a, b), (b, a))) {
          val cur = best.getOrElse(q, (-2.0, Long.MaxValue))
          if (c > cur._1 || (c == cur._1 && n < cur._2)) best(q) = (c, n)
        }
      }
      val recall = ivf.count { case (q, n) => best(q)._2 == n }.toDouble / best.size
      println(f"IVF np=$np recall=$recall%.3f time=$dt%.1fs coverage=${ivf.size}/${best.size}")
    }
    spark.stop()
  }
}
