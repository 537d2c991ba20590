package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Wave-6 tests: stratified sampling, benchmark decontamination,
  * bucketed co-located join (round 5). */
class Wave6Spec extends SparkTestBase {

  test("sample_stratified keeps per-stratum fractions and is deterministic") {
    val out = TextOps.sampleStratified(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("de" -> 0.50, "en" -> 0.20, "es" -> 0.75,
                    "fr" -> 1.00, "zh" -> 0.10)
    for ((lang, rate) <- rates) {
      val frac = kept.getOrElse(lang, 0L).toDouble / total(lang)
      // relative tolerance so the zh=0.10 stratum can't pass with 0 rows
      assert(math.abs(frac - rate) < rate * 0.5,
        s"$lang kept $frac, wanted ~$rate")
      assert(kept.getOrElse(lang, 0L) > 0, s"$lang stratum kept zero rows")
    }
    // fr keeps everything (rate 100)
    assert(kept("fr") == total("fr"))
    // hash-based: two runs are row-identical (no RNG state)
    assert(out.collect().toSeq ==
           TextOps.sampleStratified(spark, sf).collect().toSeq)
  }

  test("sample_stratified buckets agree with data_split folds") {
    // same md5 fold ⇒ a doc's bucket matches across the two operators
    val s1 = TextOps.sampleStratified(spark, sf)
      .select("doc_id", "bucket")
    val s2 = TextOps.dataSplit(spark, sf).select("doc_id", "bucket")
    assert(s1.join(s2, Seq("doc_id", "bucket")).count() == s1.count())
  }

  test("text_decontaminate flags exactly the docs sharing a 5-gram with benchmark") {
    val out = TextOps.textDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    // brute-force oracle on the small fixture
    def grams(text: String): Set[String] = {
      val t = text.split(" ")
      (0 to t.length - 5).map(i => t.slice(i, i + 5).mkString(" ")).toSet
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val bench = docs.filter(_._1 % 50 == 0).values.flatMap(grams).toSet
    for ((id, nGrams, nOverlap, flag) <- out) {
      val g = grams(docs(id))
      assert(id % 50 != 0, "benchmark docs must not appear in output")
      assert(nGrams == g.size)
      assert(nOverlap == g.count(bench.contains).toLong)
      assert(flag == (if (nOverlap > 0) 1 else 0))
    }
    // every train doc with >=5 tokens is present
    val expected = docs.keys.filter(id => id % 50 != 0 &&
      grams(docs(id)).nonEmpty).toSet
    assert(out.map(_._1).toSet == expected)
  }

  test("join_bucketed equals the plain join") {
    val out = Relational.joinBucketed(spark, sf)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
              col("o_orderpriority"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
    assert(out.collect().toSeq == plain.collect().toSeq)
  }

  test("join_bucketed plan has no shuffle before the join") {
    val df = Relational.joinBucketed(spark, sf)
    df.collect() // materialize (AQE finalizes the plan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle either side:\n$plan")
  }
}
