package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.2): generated-data MinHash accuracy, full
  * run-twice determinism over every declared query, map-function surface. */
class PropertySpec extends SparkTestBase {

  test("minhash signature agreement tracks exact Jaccard on generated sets") {
    import spark.implicits._
    // deterministic scalacheck generation (fixed seed — no wall-clock)
    val vocab = (0 until 200).map(i => s"tok$i")
    val gen = for {
      base <- Gen.someOf(vocab)
      if base.size >= 20
      drop <- Gen.choose(0, base.size / 2)
    } yield (base.toSet, base.drop(drop).toSet)
    val params = Gen.Parameters.default
    val cases = (0 until 30).flatMap(i =>
      gen.apply(params, Seed(42L + i)).toSeq)
    assert(cases.size >= 20)
    val rows = cases.zipWithIndex.flatMap { case ((a, b), i) =>
      a.map(t => (i.toLong * 2, t)) ++ b.map(t => (i.toLong * 2 + 1, t))
    }
    val df = rows.toDF("doc_id", "sh")
    // same hash-once-then-rehash construction as SimOps.minhashSignatures
    val mins = (0 until 32).map(i =>
      min(xxhash64(lit(i), xxhash64(col("sh")))).as(s"h$i"))
    val sigs = df.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong).toVector)
      .toMap
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      val est = sigs(i * 2L).zip(sigs(i * 2L + 1))
        .count { case (x, y) => x == y } / 32.0
      // 32 hashes: stddev ~ sqrt(J(1-J)/32) <= 0.09; allow 4 sigma
      assert(math.abs(est - exact) < 0.36, s"case $i est=$est exact=$exact")
    }
  }

  test("every declared query is deterministic across two runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val r1 = fn(spark, sf).collect().map(_.toString).toSeq
      val r2 = fn(spark, sf).collect().map(_.toString).toSeq
      if (name == "agg_kll_quantiles") {
        // The ONE sanctioned exception: DataSketches KLL compaction draws
        // from a shared Random, so parallel partial-merge order legitimately
        // wobbles the estimates WITHIN the sketch's rank-error bound
        // (k=200 → ~1.65% rank ε). The driver runs a rows-only check here
        // (no-oracle allowlist); the Wave9 error-bound test pins accuracy.
        // Exact replay equality would be asserting a property the sketch
        // does not promise — compare quantile vectors within 5% instead.
        def qs(rows: Seq[String]): Seq[Double] =
          rows.mkString.replaceAll("[^0-9.,]", "").split(",")
            .filter(_.nonEmpty).map(_.toDouble).toSeq
        qs(r1).zip(qs(r2)).foreach { case (x, y) =>
          assert(math.abs(x - y) <= 0.05 * math.max(x, y),
            s"$name quantiles differ beyond KLL rank error: $r1 vs $r2")
        }
      } else {
        assert(r1 == r2, s"$name differs across runs")
      }
    }
  }

  test("map functions: build, inspect, and sort map data deterministically") {
    import spark.implicits._
    val df = Seq((1L, Seq(("a", 1), ("b", 2))), (2L, Seq(("c", 3))))
      .toDF("id", "kvs")
      .withColumn("m", map_from_entries(col("kvs")))
    val out = df.select(col("id"),
        map_keys(col("m")).as("ks"), map_values(col("m")).as("vs"),
        element_at(col("m"), "a").as("a_val"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) == Seq("a", "b"))
    assert(out(0).getSeq[Int](2) == Seq(1, 2))
    assert(out(0).getInt(3) == 1)
    assert(out(1).isNullAt(3))
    // maps never appear in declared query output (iteration order is not
    // contractual, SURVEY §7.3) — entries are exported as sorted arrays:
    val exported = df.select(col("id"),
        array_sort(map_entries(col("m"))).as("entries"))
      .orderBy("id").collect()
    assert(exported(0).getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
      == Seq("a", "b"))
  }

  test("declared queries never use nondeterministic functions") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.analyzed.toString
      Seq("rand(", "randn(", "monotonically_increasing_id",
          "current_timestamp", "current_date", "uuid(").foreach { f =>
        assert(!plan.contains(f), s"$name uses nondeterministic $f")
      }
    }
  }
}
