package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of dedup_ngram_jaccard's prefix-filter
  * pipeline, to locate where the sf0.1 wall-clock goes. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val sh = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("lang"), col("source"),
        array_sort(expr(
          """transform(array_distinct(
            |    transform(slice(toks, 1, greatest(size(toks) - 2, 0)),
            |      (x, i) -> concat_ws(' ', x, toks[i + 1], toks[i + 2]))),
            |  x -> xxhash64(x))""".stripMargin)).as("sh"))
    t("shingle")(sh.count())
    val tok = sh.select(col("doc_id"), col("lang"), col("source"),
                        explode(col("sh")).as("h"))
    val nTok = t("explode tok")(tok.count())
    val dfreq = tok.groupBy("h").agg(count(lit(1)).as("df"))
    val nDf = t("dfreq")(dfreq.count())
    val pref = tok.join(dfreq, "h")
      .groupBy("doc_id", "lang", "source")
      .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("ord"))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(expr(
          "transform(slice(ord, 1, size(ord) DIV 2 + 1), x -> x.h)"))
          .as("h"))
    val nPref = t("prefix rows")(pref.count())
    val candA = pref.select(col("h"), col("lang"), col("source"),
                            col("doc_id").as("doc_a"))
    val candB = pref.select(col("h").as("h_b"), col("lang").as("lang_b"),
                            col("source").as("source_b"),
                            col("doc_id").as("doc_b"))
    val candRaw = candA.join(candB,
        col("h") === col("h_b") && col("lang") === col("lang_b") &&
        col("source") === col("source_b") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    val nRaw = t("raw candidates")(candRaw.count())
    val cand = candRaw.distinct()
    val nCand = t("distinct candidates")(cand.count())
    println(s"[probe] tok=$nTok dfreq=$nDf prefRows=$nPref " +
            s"rawCand=$nRaw cand=$nCand")
    val full = graft.ops.SimOps.dedupNgramJaccard(spark, d)
    t("full query (1st)")(full.count())
    t("full query (2nd)")(graft.ops.SimOps.dedupNgramJaccard(spark, d).count())
    spark.stop()
  }
}
