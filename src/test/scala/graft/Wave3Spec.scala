package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Wave-3 tests: MinHash vs exact Jaccard (the only guard for the
  * no-oracle LSH path, SURVEY §7.4.4), HLL error bound, sessionization
  * invariants. */
class Wave3Spec extends SparkTestBase {

  private def shingleSet(text: String): Set[String] =
    text.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet

  test("dedup_minhash estimates are within 0.25 of exact Jaccard") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleSet(r.getString(1))).toMap
    val out = SimOps.dedupMinhash(spark, sf).collect()
    assert(out.nonEmpty, "corpus has near-dups by construction")
    out.foreach { r =>
      val (a, b, est) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val (sa, sb) = (docs(a), docs(b))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(est - exact) < 0.25,
        s"pair ($a,$b): est=$est exact=$exact")
    }
    // no false negatives among truly identical docs: every exact-dup pair
    // (jaccard 1.0) must be caught by LSH
    val byText = docs.groupBy(_._2).values.filter(_.size > 1)
    val caught = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    byText.foreach { ds =>
      val ids = ds.map(_._1).toSeq.sorted
      for (Seq(x, y) <- ids.combinations(2))
        assert(caught.contains((x, y)), s"identical pair ($x,$y) missed")
    }
  }

  test("agg_approx_distinct within 5% of exact") {
    val apx = Relational.aggApproxDistinct(spark, sf).collect()(0)
    val exact = Relational.aggCountDistinct(spark, sf).collect()(0)
    assert(math.abs(apx.getLong(0) - exact.getLong(0)).toDouble / exact.getLong(0) < 0.05)
    assert(math.abs(apx.getLong(1) - exact.getLong(1)).toDouble / exact.getLong(1) < 0.05)
  }

  test("stream_session sessions are disjoint, gap-separated, and cover all events") {
    val out = EventOps.streamSession(spark, sf).collect()
    val nEvents = graft.engine.Tables.events(spark, sf).count()
    assert(out.map(_.getLong(3)).sum == nEvents)
    out.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getAs[java.time.LocalDateTime](1).toString)
      sorted.sliding(2).foreach {
        case Array(s1, s2) =>
          // next session starts at/after previous end (end = last ts + gap)
          assert(!s2.getAs[java.time.LocalDateTime](1)
            .isBefore(s1.getAs[java.time.LocalDateTime](2)))
        case _ =>
      }
    }
  }

  test("stream_sliding counts sum to 2x event count (each event in 2 windows)") {
    val out = EventOps.streamSliding(spark, sf)
    val n = graft.engine.Tables.events(spark, sf).count()
    assert(out.agg(sum("cnt")).collect()(0).getLong(0) == 2 * n)
  }

  test("sim_knn_label predicts every vector with 1-5 votes") {
    val out = SimOps.simKnnLabel(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out.length == n)
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 5))
    // NOTE: the testdata embeddings are NOT label-clustered (exact numpy
    // kNN also scores ~9% ≈ random across sf), so no accuracy assertion —
    // correctness is covered by the DuckDB oracle.
  }

  test("udaf_topk_acc lists equal naive per-group top-5") {
    val naive = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => (r.getDouble(2), r.getLong(1)))
          .sortBy(t => (-t._1, t._2)).take(5).map(_._2).toSeq }
    Udfs.udafTopkAcc(spark, sf).collect().foreach { r =>
      val got = r.getString(1).split(",").map(_.toLong).toSeq
      assert(got == naive(r.getLong(0)), s"cust ${r.getLong(0)}")
    }
  }
}
