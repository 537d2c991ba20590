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
}
