package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables._

/** Scalar-function families (SURVEY.md §2.G) — one query per family, each
  * exercising several built-ins. All are codegen'd Spark built-ins (no
  * UDFs in the hot path, SURVEY §4).
  *
  * Typing rules for the oracle hash-match: Spark's int-returning functions
  * (length, year, ceil, ...) are cast to BIGINT to match DuckDB; every
  * computed floating output is rounded (SURVEY §7.3). */
object Functions {

  /** upper/lower/trim/substring/length/concat/replace/regexp/split. */
  def fnString(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_type")).as("low"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
      substring(col("p_name"), 1, 4).as("pre4"),
      length(col("p_name")).cast("long").as("len"),
      replace(col("p_name"), lit(" "), lit("_")).as("snake"),
      regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
      concat(col("p_type"), lit(":"), col("p_brand")).as("type_brand"),
      element_at(split(col("p_name"), " "), 2).as("tok2")
    ).orderBy("p_partkey")

  /** year/month/day/hour/minute, date_trunc, interval add, day diff. */
  def fnDatetime(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      year(col("ts")).cast("long").as("yr"),
      month(col("ts")).cast("long").as("mo"),
      dayofmonth(col("ts")).cast("long").as("dom"),
      hour(col("ts")).cast("long").as("hr"),
      minute(col("ts")).cast("long").as("mi"),
      // date_trunc returns a TZ timestamp even over an NTZ input; cast
      // back so both timestamp outputs read tz-naive like the oracle's.
      date_trunc("day", col("ts")).cast("timestamp_ntz").as("day_start"),
      (col("ts") + expr("INTERVAL 90 MINUTES")).as("plus90m"),
      datediff(col("ts"), lit("2024-01-01").cast("timestamp"))
        .cast("long").as("days_in")
    ).orderBy("event_id")

  /** Cryptographic/content hashes: md5 + sha256 (hex, both engines). */
  def fnHash(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      md5(col("p_name").cast("binary")).as("md5_name"),
      sha2(col("p_name").cast("binary"), 256).as("sha256_name")
    ).orderBy("p_partkey")

  /** Formatting + epoch conversions: date_format/strftime parity and
    * unix epoch seconds. */
  def fnDatetimeFmt(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm").as("fmt_minute"),
      date_format(col("ts"), "yyyy-MM").as("fmt_month"),
      unix_timestamp(col("ts").cast("timestamp")).as("epoch_s")
    ).orderBy("event_id")

  /** round/abs/ceil/floor/sqrt/ln/exp/pow/mod. */
  def fnMath(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      round(sqrt(col("l_extendedprice")), 4).as("sqrt_r"),
      round(log(col("l_extendedprice")), 4).as("ln_r"),
      round(exp(col("l_discount")), 4).as("exp_r"),
      round(pow(col("l_quantity"), 2), 2).as("pow_r"),
      ceil(col("l_extendedprice")).as("ceil_p"),
      floor(col("l_extendedprice")).as("floor_p"),
      round(abs(col("l_extendedprice") - 1000.0), 2).as("absdiff_r"),
      (col("l_orderkey") % 7).as("mod7")
    ).orderBy("l_orderkey", "l_linenumber")

  /** CASE WHEN / coalesce / nullif / least / greatest. */
  def fnConditional(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      when(col("o_totalprice") > 200000, "big")
        .when(col("o_totalprice") > 100000, "mid")
        .otherwise("small").as("bucket"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
        .as("status2"),
      least(col("o_totalprice"), lit(150000.0)).as("least_p"),
      greatest(col("o_totalprice"), lit(150000.0)).as("greatest_p")
    ).orderBy("o_orderkey")

  /** Binary encodings: base64 / hex / round-trip decode — the family an
    * opaque-payload (multimodal) pipeline leans on. Both engines hex
    * uppercase; the round-trip flag proves unbase64 ∘ base64 = id. */
  def fnEncode(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("s12", substring(col("text"), 1, 12))
      .select(col("doc_id"),
        base64(col("s12").cast("binary")).as("b64"),
        hex(col("s12")).as("hx"),
        (decode(unbase64(base64(col("s12").cast("binary"))), "UTF-8")
          === col("s12")).as("rt_ok"))
      .orderBy("doc_id")

  /** NULL-handling family: nullif / coalesce / ifnull / IS NOT DISTINCT
    * FROM (null-safe equality). The testdata carries no nulls, so the
    * query manufactures them with nullif — null propagation through
    * expressions is what a real pipeline must get right. */
  def fnNull(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"),
        expr("nullif(o_orderstatus, 'O')").as("st_or_null"),
        expr("coalesce(nullif(o_orderstatus, 'O'), 'OPEN')").as("st_filled"),
        expr("ifnull(nullif(o_orderpriority, o_orderpriority), 'none')")
          .as("always_none"),
        expr("nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL")
          .as("was_open"))
      .orderBy("o_orderkey")

  /** size/element_at/slice + higher-order transform/aggregate over the
    * embedding vectors. head3_r is serialized to a fixed-format string —
    * the driver comparator cannot hash array cells, and %.4f of an
    * already-4dp-rounded double is identical in both engines. */
  def fnArray(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("vd", transform(col("embedding"), _.cast("double")))
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        (round(element_at(col("vd"), 1), 4) + lit(0.0)).as("first_r"),
        (round(aggregate(col("vd"), lit(0.0), (acc, x) => acc + x * x), 4)
          + lit(0.0)).as("ssq_r"),
        (round(array_max(col("vd")), 4) + lit(0.0)).as("max_r"),
        // + 0.0 before formatting: ROUND of a tiny negative yields IEEE
        // -0.0, which %.4f prints as "-0.0000" — normalize on both sides.
        concat_ws(",", transform(slice(col("vd"), 1, 3),
          x => format_string("%.4f", round(x, 4) + lit(0.0)))).as("head3_r")
      ).orderBy("vec_id")

  /** Array set algebra over token sets. Set-op results are sorted before
    * output: Spark preserves left-operand order, DuckDB does not — sorted
    * form is the engine-independent contract. Not-found positions are 0
    * on both sides (array_position / list_position agree). */
  def fnArraySetops(s: SparkSession, d: String): DataFrame = {
    val lex = array(lit("fast"), lit("slow"), lit("join"), lit("table"))
    documents(s, d)
      .withColumn("ta", array_distinct(split(col("text"), " ")))
      .withColumn("tb", lex)
      .select(
        col("doc_id"),
        concat_ws(",", array_sort(array_intersect(col("ta"), col("tb"))))
          .as("inter"),
        concat_ws(",", array_sort(array_except(col("ta"), col("tb"))))
          .as("minus"),
        arrays_overlap(col("ta"), col("tb")).as("overlaps"),
        array_position(split(col("text"), " "), "fast").as("first_fast"))
      .orderBy("doc_id")
  }

  /** Map-typed column functions: construction (map_from_arrays /
    * map_concat), lookup (element_at), introspection (map_keys /
    * map_contains_key) and the higher-order transform_values — the
    * dynamic-schema escape hatch when per-row key sets vary. The output
    * contract is scalar columns (the driver comparator hashes scalars),
    * and the oracle states the equivalent direct computation — the
    * engine-independent semantics of each lookup, same style as the
    * sorted set-op outputs. All map expressions are codegen'd builtins. */
  def fnMap(s: SparkSession, d: String): DataFrame = {
    val base = map_from_arrays(
      array(lit("brand"), lit("name")),
      array(col("p_brand"), col("p_name")))
    val m = map_concat(base, map(lit("type"), col("p_type")))
    part(s, d).select(
      col("p_partkey"),
      element_at(m, "brand").as("brand"),
      element_at(m, "missing").as("absent"),
      size(map_keys(m)).cast("long").as("nkeys"),
      map_contains_key(m, "type").as("has_type"),
      element_at(transform_values(m, (_, v) => upper(v)), "name")
        .as("name_up"))
      .orderBy("p_partkey")
  }

  /** Struct-typed column functions: named_struct construction, field
    * access, and lexicographic struct comparison (the composite-key
    * idiom argmax/asof builds on). DuckDB compares ROW values with the
    * same field-order semantics, so the comparison output is an honest
    * cross-engine check, not a restatement. */
  def fnStruct(s: SparkSession, d: String): DataFrame = {
    val sc = struct(col("c_acctbal").as("bal"), col("c_custkey").as("key"))
    customer(s, d).select(
      col("c_custkey"),
      sc.getField("bal").as("bal"),
      (sc > struct(lit(5000.0).as("bal"), lit(0L).as("key"))).as("over_5k"),
      struct(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"))
        .getField("seg").as("seg"))
      .orderBy("c_custkey")
  }

  /** Binned aggregation (histogram): fixed-width price buckets. */
  def aggHistogram(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(floor(col("o_totalprice") / 25000).as("bucket"))
      .agg(count(lit(1)).as("cnt"),
           round(avg("o_totalprice"), 2).as("avg_price_r"))
      .orderBy("bucket")

  /** Padding/repeat/reverse/position/translate string functions. */
  def fnString2(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("lp"),
      rpad(col("p_brand"), 12, "*").as("rp"),
      repeat(col("p_type"), 2).as("rep"),
      reverse(col("p_name")).as("rev"),
      instr(col("p_name"), " ").cast("long").as("space_at"),
      translate(col("p_name"), "aeiou", "AEIOU").as("tr")
    ).orderBy("p_partkey")

  /** JSON extraction: group by props.k. from_json with an explicit schema,
    * not get_json_object — a fixed-schema parse is ~4x faster cold
    * (measured) and the right tool when the shape is known; both are
    * CodegenFallback. */
  def fnJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(from_json(col("props"),
                org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
                .getField("k").as("k"),
              col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value_r"))
      .orderBy("k")

  /** Bitwise AND/OR/XOR, shifts, popcount over BIGINT keys — all codegen
    * built-ins; bit_count's int result is widened to match DuckDB's cast. */
  def fnBitwise(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      col("o_orderkey").bitwiseAND(lit(255L)).as("band"),
      col("o_orderkey").bitwiseOR(lit(4096L)).as("bor"),
      col("o_orderkey").bitwiseXOR(col("o_custkey")).as("bxor"),
      shiftleft(col("o_orderkey").bitwiseAND(lit(15L)), 3).as("shl"),
      shiftright(col("o_orderkey"), 4).as("shr"),
      bit_count(col("o_orderkey")).cast("long").as("bcnt")
    ).orderBy("o_orderkey")

  /** Fuzzy string matching: each nation's closest OTHER nation name by
    * Levenshtein edit distance — the master-data / entity-resolution
    * shape (dirty dimension values → canonical names). The argmin is a
    * `min(struct(dist, name))` (lexicographic: distance, then name), so
    * ties break deterministically without a window sort.
    *
    * Scale: edit distance is only ever run dimension×dimension (both
    * sides broadcast-size); the fact-table variant is fact×broadcast-dim.
    * An n² self-compare over a FACT-scale column would be the blocked /
    * LSH dedup family's job instead ([[SimOps]]). */
  def fnFuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val a = nation(s, d).select(col("n_name").as("name"))
    val b = nation(s, d).select(col("n_name").as("other"))
    a.join(broadcast(b), col("name") =!= col("other"))
      .groupBy("name")
      .agg(min(struct(levenshtein(col("name"), col("other")).as("dist"),
                      col("other").as("closest"))).as("m"))
      .select(col("name"), col("m.dist").cast("long").as("dist"),
              col("m.closest").as("closest"))
      .orderBy("name")
  }
}
