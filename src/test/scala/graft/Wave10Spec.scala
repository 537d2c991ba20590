package graft

import org.apache.spark.sql.functions._
import graft.ops._
import graft.tools.FitBpe

/** Round-7 wave: BPE subword tokenization — the distributed replace-chain
  * encoder must agree byte-for-byte with the driver-side fit loop it was
  * trained by, and the token accounting must hold the obvious bounds. */
class Wave10Spec extends SparkTestBase {

  test("BPE engine encoder agrees with the fit-side reference encoder") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(50)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val engine = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("doc_id") < 50)
      .select(col("doc_id"), BpeOps.encodeExpr(col("text")).as("enc"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    docs.foreach { case (id, text) =>
      val ref = BpeOps.merges.foldLeft(FitBpe.toStream(text)) {
        case (acc, (a, b)) => FitBpe.applyMerge(acc, a, b)
      }
      assert(engine(id) == ref,
        s"doc $id: engine encoding diverges from the fit-side encoder")
    }
  }

  test("text_bpe_tokencount holds compression bounds") {
    val rows = BpeOps.textBpeTokencount(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("n_chars"),
              size(split(col("text"), " ")).as("n_words"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    rows.foreach { r =>
      val (id, nBpe) = (r.getLong(0), r.getLong(1))
      val (nChars, nWords) = docs(id)
      // Merges only ever shrink the stream, and no merge in the learned
      // table glues two '▁' into one symbol — each of the words-1
      // separators therefore sits in its own token: tokens ∈ [words-1, chars].
      assert(nBpe <= nChars, s"doc $id: more tokens than characters")
      assert(nBpe >= nWords - 1, s"doc $id: a symbol crossed two word " +
        "separators — impossible under the learned merge table")
      assert(r.getDouble(2) > 1.0, s"doc $id: no compression")
    }
    // Corpus-level: the learned table should roughly halve the stream.
    val ratio = rows.map(r => docs(r.getLong(0))._1.toLong).sum.toDouble /
      rows.map(_.getLong(1)).sum
    assert(ratio > 1.8 && ratio < 3.0, s"corpus compression $ratio")
  }
}
