package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Similarity + dedup operators (SURVEY.md §2.I): exact dedup, brute-force
  * cosine top-k over `embeddings`. MinHash/LSH near-dup and kNN build on the
  * same kernels (later waves).
  *
  * Scale path (SURVEY §7.5): the brute-force O(n²) self-join is the
  * correctness baseline; at 100 TB similarity switches to an LSH-banded
  * bucket join (ClusterJoin, VLDB'14) so only candidate pairs are scored.
  * The pairwise kernel stays un-exploded — arrays never become
  * (pair × dimension) rows (that is the 64× blowup that kills the bench,
  * SURVEY §6). */
object SimOps {

  /** Exact dedup: canonical representative = min(doc_id) per md5(text). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "h")
      .orderBy("doc_id")

  /** Vectors with embeddings cast float→double plus precomputed L2 norm.
    * Casting once here (not per pair) keeps the O(n²) join cheap. */
  private[ops] def normed(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExprs.register(s)
    embeddings(s, d)
      .withColumn("vd", transform(col("embedding"), _.cast("double")))
      .withColumn("nrm", sqrt(expr("graft_dot(vd, vd)")))
      .select("vec_id", "label", "vd", "nrm")
  }

  /** All unordered pairs (id_a < id_b) with cosine rounded to 4 dp. */
  private[ops] def cosinePairs(s: SparkSession, d: String): DataFrame = {
    val a = normed(s, d).select(col("vec_id").as("id_a"), col("vd").as("va"),
                                col("nrm").as("na"))
    val b = normed(s, d).select(col("vec_id").as("id_b"), col("vd").as("vb"),
                                col("nrm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
              round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 4)
                .as("cos_r"))
  }

  /** Brute-force top-10 most-similar pairs by cosine. */
  def simCosineTopk(s: SparkSession, d: String): DataFrame =
    cosinePairs(s, d)
      .orderBy(col("cos_r").desc, col("id_a").asc, col("id_b").asc)
      .limit(10)
}
