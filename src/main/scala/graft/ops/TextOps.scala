package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Text / LLM-data-pipeline operators over `documents` (SURVEY.md §2.I).
  * Tokenization is `split(text, ' ')` — the corpus is space-separated
  * lowercase tokens with no punctuation (FIXTURES.md).
  *
  * Scale: explode(split) is the canonical map-reduce flatMap; at 100 TB the
  * token stream shuffles once for the groupBy with map-side combine, which
  * is the textbook wordcount plan. */
object TextOps {

  private def tokens(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"),
      explode(split(col("text"), " ")).as("token"))

  /** flatMap: one-to-many tokenize (the framework's flatMap verb). */
  def flatmapExplode(s: SparkSession, d: String): DataFrame =
    tokens(s, d).orderBy("doc_id", "token")

  /** Canonical map-reduce word count, top-20. The flagship `entry` query. */
  def textWordcount(s: SparkSession, d: String): DataFrame =
    tokens(s, d)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(20)

  /** Corpus stats per (lang, source): doc counts, avg chars, avg tokens. */
  def textStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_chars")), 2).as("avg_chars_r"),
           round(avg(size(split(col("text"), " "))), 2).as("avg_tokens_r"))
      .orderBy("lang", "source")

  /** Bigram counts, top-30. Bigrams are built inside the token array with a
    * positional transform (no per-token explode → self-join — that shape
    * shuffles the whole token stream twice at scale). */
  def textNgrams(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(explode(expr(
        "transform(slice(toks, 1, size(toks) - 1), (x, i) -> concat(x, ' ', toks[i + 1]))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(30)

  /** TF-IDF per (doc, term), top-50 by score. df and N are computed as
    * aggregates and joined back — no driver-side collect (SURVEY §4:
    * driver loops are the anti-pattern). */
  def textTfidf(s: SparkSession, d: String): DataFrame = {
    val tok = tokens(s, d).withColumnRenamed("token", "term")
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val n = documents(s, d).agg(count(lit(1)).as("n"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
              round(col("tf") * log(col("n").cast("double") / col("df")), 4)
                .as("tfidf_r"))
      .orderBy(col("tfidf_r").desc, col("doc_id").asc, col("term").asc)
      .limit(50)
  }

  /** Lexicon sentiment (EDBT'16-style scoring, PAPERS.md): +1 for positive
    * tokens, -1 for negative, summed per doc. The lexicon is a broadcast
    * dim — the scalable shape for dictionary joins. */
  def textSentiment(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lex = Seq(("fast", 1), ("big", 1), ("slow", -1), ("small", -1))
      .toDF("token", "w")
    tokens(s, d)
      .join(broadcast(lex), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("w"), lit(0))).as("sentiment"))
      .orderBy("doc_id")
  }
}
