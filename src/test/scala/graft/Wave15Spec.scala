package graft

import org.apache.spark.sql.functions._
import graft.ops.{RetrievalOps, TextOps}

/** Round-8 wave: lexical retrieval (BM25), bloom-prefiltered
  * decontamination, temperature mixture sampling. */
class Wave15Spec extends SparkTestBase {

  test("text_bm25_topk: well-formed ranking, score replayed exactly " +
       "for the top document") {
    val rows = RetrievalOps.textBm25Topk(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq,
      "rnk must be contiguous from 1")
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      s"scores must be non-increasing: ${scores.toSeq}")
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3),
      "n_terms must be within the 3-term query")

    // replay BM25 for the winner from raw text, straight from the formula
    val docs = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum / n
    val dft = RetrievalOps.QueryTerms
      .map(t => t -> docs.values.count(_.contains(t)).toDouble).toMap
    def score(id: Long): Double = {
      val toks = docs(id)
      RetrievalOps.QueryTerms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log((n - dft(t) + 0.5) / (dft(t) + 0.5) + 1.0) *
          (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks.size / avgdl))
      }.sum
    }
    val top = rows.head
    assert(math.abs(score(top.getLong(1)) - top.getDouble(3)) < 1e-3,
      s"top-1 score must replay: got ${top.getDouble(3)}")
    // and no unreturned doc outscores the returned cut (top-k is global)
    val cut = rows.last.getDouble(3)
    val returned = rows.map(_.getLong(1)).toSet
    val best = docs.keys.filterNot(returned).map(score)
    assert(best.isEmpty || best.max <= cut + 1e-3,
      "no unreturned document may outscore the returned cut")
  }

  test("text_decontaminate_bloom: identical to the exact path, " +
       "screened by a codegen'd bloom probe") {
    val exact = TextOps.textDecontaminate(spark, sf).collect().toSeq
    val bloom = RetrievalOps.textDecontaminateBloom(spark, sf)
    assert(bloom.collect().toSeq == exact,
      "bloom prefilter + confirm join must reproduce the exact result")
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"the candidate stage must screen through BloomFilterMightContain")
  }

  test("sample_token_budget: kept token mass lands within one document " +
       "of each language's budget — the exact-fill guarantee") {
    val kept = graft.ops.RetrievalOps.sampleTokenBudget(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val totals = graft.engine.Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ")).cast("long")
        .as("n")).collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sum }
    val maxDoc = totals.keys.map { l =>
      l -> kept.filter(_._1 == l).map(_._2).maxOption.getOrElse(0L) }.toMap
    totals.foreach { case (l, tot) =>
      val budget = tot / 2
      val got = kept.filter(_._1 == l).map(_._2).sum
      assert(got <= budget, s"$l: kept $got exceeds budget $budget")
      assert(budget - got <= math.max(maxDoc(l), 1L) * 2,
        s"$l: kept $got leaves more than ~a doc of budget $budget unfilled")
    }
  }

  test("dedup_containment: finds the planted near-identical pair, and " +
       "the kernel catches small-inside-big pairs Jaccard misses") {
    val rows = graft.ops.SimOps.dedupContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 1 && rows(0)._3 >= 0.97 && rows(0)._4 >= 0.97,
      s"the planted pair must surface with high containment: ${rows.toSeq}")
    // the asymmetric case the operator exists for: A (10 shingles)
    // fully inside B (40 shingles) → Jaccard 0.25 (under the 0.5
    // near-dup bar) but containment(A in B) = 1.0
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val a = (1L to 10L).toArray
    val b = (1L to 40L).toArray
    val r = Seq((a, b)).toDF("sa", "sb")
      .selectExpr("graft_jaccard(sa, sb) AS j",
                  "CAST(graft_overlap(sa, sb) AS DOUBLE) / size(sa) AS c")
      .collect()(0)
    assert(r.getDouble(0) == 0.25 && r.getDouble(1) == 1.0,
      s"jaccard ${r.getDouble(0)} should miss what containment " +
        s"${r.getDouble(1)} catches")
  }

  test("pipeline_pretrain_corpus: composition keeps a strict, " +
       "deterministic subset with every stage active") {
    val out = graft.ops.RetrievalOps.pipelinePretrainCorpus(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "pipeline must keep documents")
    val all = graft.engine.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (l, n, toks) =>
      assert(n > 0 && n < all(l),
        s"lang $l must keep a strict non-empty subset: $n of ${all(l)}")
      assert(toks >= 10 * n && toks <= 200 * n,
        s"lang $l token totals must respect the gate: $toks for $n docs")
    }
    val again = graft.ops.RetrievalOps.pipelinePretrainCorpus(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq, "pipeline must be deterministic")
  }

  test("sim_ann_pq: deterministic, full coverage, and the ADC shortlist " +
       "recovers most exact top-1 neighbors") {
    val pq = graft.ops.SimOps.simAnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = graft.engine.Tables.embeddings(spark, sf).count()
    assert(pq.length == n, s"every vector needs an ANN answer: ${pq.length}/$n")
    val again = graft.ops.SimOps.simAnnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pq.toSeq == again.toSeq, "PQ pipeline must be deterministic")
    // brute-force top-1 (the Wave4 replay idiom)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
           math.sqrt(b.map(x => x * x).sum))
    }
    val exact = vecs.map { case (i, v) =>
      i -> vecs.filter(_._1 != i).maxBy(o => (cos(v, o._2), -o._1))._1
    }.toMap
    val recall = pq.count { case (q, a, _) => exact.get(q).contains(a) }
      .toDouble / n
    assert(recall >= 0.5,
      f"IVFPQ top-1 recall vs brute force too low: $recall%.3f")
    info(f"IVFPQ top-1 recall vs brute force: $recall%.3f")
    // reported cosines are EXACT (full-precision rerank): each must
    // equal the true cosine of the reported pair at the 4-dp rounding
    pq.foreach { case (q, a, c) =>
      val t = (math.rint(cos(vecs.toMap.apply(q), vecs.toMap.apply(a))
                 * 1e4) / 1e4)
      assert(math.abs(t - c) < 2e-4,
        s"reported cosine must be the exact rerank value for ($q,$a): $c vs $t")
    }
  }

  test("sample_mixture: keep rule replays all-integer, " +
       "temperature favors tail domains") {
    val kept = RetrievalOps.sampleMixture(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val all = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nLang = all.groupBy(_._2).map { case (l, xs) => l -> xs.size.toLong }
    val w = nLang.map { case (l, nl) =>
      l -> BigInt(math.floor(math.sqrt(nl.toDouble) * 1000000.0).toLong) }
    val s = w.values.sum
    val t = BigInt(math.floor(nLang.values.sum * 0.5).toLong)
    def hash32(id: Long): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      BigInt(hex, 16)
    }
    val expect = all.filter { case (id, l) =>
      hash32(id) * s * BigInt(nLang(l)) < t * w(l) * BigInt(4294967296L)
    }.toSet
    assert(kept.toSet == expect,
      s"keep set must replay the integer rule: ${kept.length} vs ${expect.size}")
    assert(kept.length > 0 && kept.length < all.length,
      "mixture must keep a strict subset")
    // α=0.5 reweighting: realized keep-rate of the rarest domain must be
    // at least that of the most common one (ties allowed when both cap)
    val rate = nLang.map { case (l, nl) =>
      l -> kept.count(_._2 == l).toDouble / nl }
    val rare = nLang.minBy(_._2)._1
    val common = nLang.maxBy(_._2)._1
    assert(rate(rare) >= rate(common) - 1e-9,
      s"tail domain must not be down-weighted: $rate")
  }
}
