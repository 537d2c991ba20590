package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump executed-plan summaries for plan-shape auditing. */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      println(s"== $name: exchanges=$exchanges")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Scan") ||
        l.contains("PushedFilters") || l.contains("Window") ||
        l.contains("Generate")).take(14).mkString("\n"))
    }
    spark.stop()
  }
}
