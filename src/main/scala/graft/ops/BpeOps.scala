package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Subword (BPE-style) tokenization as a broadcast-model operator — the
  * first operator of a real pretraining text pipeline (byte-pair encoding
  * per Sennrich et al. 2016, the public algorithm behind GPT-2/SentencePiece
  * vocabularies).
  *
  * The MODEL is [[merges]]: an ordered merge-ranks table fit OFFLINE on the
  * corpus by [[graft.tools.FitBpe]] (the classic count-pairs/merge/repeat
  * loop) and shipped as a literal — same artifact pattern as the sentiment
  * lexicon and the perplexity vocab. Queries never fit; they only apply the
  * learned table, so the operator is a pure narrow map at any scale (at a
  * real vocab size the table would broadcast from parquet instead of
  * constant-folding, with the identical plan shape).
  *
  * ENCODING is deliberately engine-portable. A document becomes a symbol
  * stream where every symbol carries a '·' (U+00B7) prefix marker and the
  * space character is the '▁' (U+2581) symbol: "ab cd" → "·a·b·▁·c·d".
  * Applying merge (a, b) is then the LITERAL string replacement
  * "·a·b" → "·ab" — exact adjacent-pair semantics, because symbol content
  * never contains the marker, so a pattern can never match the tail of a
  * longer symbol; left-to-right non-overlapping replacement is exactly the
  * greedy order BPE specifies. The whole encoder is therefore a chain of
  * codegen'd `replace` calls (no UDF, no regex per merge, whole-stage
  * codegen keeps it in one generated function), the token count is just
  * the number of markers left, and DuckDB replays the identical chain as
  * the SQL oracle — which is what makes this operator ORACLE-CHECKED
  * rather than trust-me. Fit and encode share one definition of "apply a
  * merge" (java.lang.String.replace has the same literal non-overlapping
  * semantics), so the model is consistent with its own training loop —
  * property-tested in Wave10Spec by replaying the driver-side fit encoder
  * against the distributed one.
  */
object BpeOps {
  /** Symbol-prefix marker: U+00B7, never present in the corpus. */
  val Marker = "·"
  /** Whitespace symbol: U+2581, the SentencePiece convention. */
  val SpaceSym = "▁"

  /** Merge-ranks table learned by `runMain graft.tools.FitBpe
    * /root/testdata/sf0.01 48` (rank = position; '▁' is the space
    * symbol). 48 merges halve the token count on the fit corpus
    * (chars/token 2.07). */
  val merges: Seq[(String, String)] = Seq(
    ("▁", "s"), ("e", "r"), ("e", "▁"),
    ("i", "n"), ("o", "w"), ("o", "r"),
    ("ow", "▁"), ("er", "▁"), ("t", "▁"),
    ("a", "t"), ("l", "u"), ("a", "s"),
    ("a", "r"), ("p", "ar"), ("n", "▁"),
    ("h", "▁"), ("y", "▁"), ("g", "▁"),
    ("a", "▁"), ("j", "o"), ("jo", "in"),
    ("h", "as"), ("s", "t"), ("at", "c"),
    ("b", "atc"), ("m", "er"), ("c", "a"),
    ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("cu", "st"), ("cust", "o"),
    ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("a", "l"), ("al", "l"), ("m", "all"),
    ("mer", "g"), ("c", "t"), ("ct", "or"),
    ("e", "ctor"), ("or", "d"), ("v", "ector"),
    ("l", "in"), ("a", "b"), ("ab", "l"),
  )

  /** The encoded marker-prefixed symbol stream of `text`. */
  private[graft] def encodeExpr(text: Column): Column = {
    val stream = regexp_replace(
      replace(text, lit(" "), lit(SpaceSym)), "(.)", Marker + "$1")
    merges.foldLeft(stream) { case (acc, (a, b)) =>
      replace(acc, lit(Marker + a + Marker + b), lit(Marker + a + b))
    }
  }

  /** Declared query: BPE token count + compression ratio per document,
    * with the head of the encoded stream as a direct witness of the
    * segmentation. Narrow map end to end — the only exchange is the
    * deterministic output sort. */
  def textBpeTokencount(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), length(col("text")).as("n_chars"),
              encodeExpr(col("text")).as("enc"))
      .withColumn("n_bpe",
        (length(col("enc")) -
         length(replace(col("enc"), lit(Marker), lit("")))).cast("long"))
      .select(col("doc_id"), col("n_bpe"),
              round(col("n_chars").cast("double") / col("n_bpe"), 4)
                .as("ratio_r"),
              substring(col("enc"), 1, 48).as("bpe_prefix"))
      .orderBy("doc_id")

  /** The DuckDB oracle replays the identical replace chain (built from the
    * same [[merges]] constant, so the two sides cannot drift). */
  private[graft] def oracle: String = {
    val chain = merges.foldLeft("sym") { case (acc, (a, b)) =>
      s"replace($acc, '$Marker$a$Marker$b', '$Marker$a$b')"
    }
    s"""WITH s AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |         regexp_replace(replace(text, ' ', '$SpaceSym'),
       |                        '(.)', '$Marker\\1', 'g') AS sym
       |  FROM documents),
       |e AS (SELECT doc_id, n_chars, $chain AS enc FROM s)
       |SELECT doc_id,
       |       CAST(length(enc) - length(replace(enc, '$Marker', ''))
       |            AS BIGINT) AS n_bpe,
       |       round(CAST(n_chars AS DOUBLE) /
       |             (length(enc) - length(replace(enc, '$Marker', ''))), 4)
       |         AS ratio_r,
       |       substr(enc, 1, 48) AS bpe_prefix
       |FROM e
       |ORDER BY doc_id""".stripMargin
  }
}
