package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** r7 verdict item 3: a broken query must SURFACE in the bench JSON, not
  * vanish into a fast-looking total. */
class BenchEmitterSpec extends SparkTestBase {

  test("a deliberately-broken query lands in the errors field") {
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, _) => s.range(5).toDF("n")),
      "broken_query" -> ((_, _) =>
        throw new IllegalStateException("boom: synthetic\nsecond line")))
    val (results, errors) = Bench.runQueries(spark, sf, qs)
    assert(results.map(_._1).toSet == Set("ok_query", "broken_query"),
      "every query gets a timing row, broken or not")
    assert(errors.map(_._1) == Seq("broken_query"))
    assert(errors.head._2.contains("boom: synthetic") &&
           !errors.head._2.contains("second line"),
      s"first error line only: ${errors.head._2}")
    val json = Bench.renderJson(results, errors, results.map(_._2).sum, sf)
    assert(json.contains("\"errors\":{\"broken_query\":\""),
      s"errors object missing from: $json")
    assert(json.contains("IllegalStateException"))
    // the emitted line must stay machine-parseable (the driver JSON-parses
    // stdout): newline in the message must arrive escaped, not literal
    assert(!json.contains('\n') && json.startsWith("{") && json.endsWith("}"))
  }

  test("clean run emits an empty errors object") {
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok_query" -> ((s, _) => s.range(3).toDF("n")))
    val (results, errors) = Bench.runQueries(spark, sf, qs)
    assert(errors.isEmpty)
    val json = Bench.renderJson(results, errors, results.map(_._2).sum, sf)
    assert(json.contains("\"errors\":{}"), json)
  }
}
