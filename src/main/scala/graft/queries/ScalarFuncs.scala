package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Scalar function families F1–F9 (SURVEY.md §3.8).
  *
  * Reference usage: code/URL normalization in `base.clj`/`parsing.clj`
  * (lower-case, split on '/', regex extraction of Category/Page from
  * pmwiki URLs) and `next_update` scheduling math in `db.clj` — all
  * re-expressed as built-in Catalyst expressions (codegen'd, no UDFs).
  *
  * Cross-engine parity notes: only IEEE-exact math functions are used in
  * oracle-compared outputs (sqrt is correctly rounded; pow/exp/ln are
  * libm-dependent and excluded); md5 is the portable hash (xxhash64 is
  * Spark-only).
  */
object ScalarFuncs extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: string family — the base.clj normalization shapes.
    "f1_string" -> { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("lc"),
          substring(col("c_name"), 1, 8).as("prefix"),
          element_at(split(col("c_name"), "#"), 2).cast("long").as("name_id"),
          concat_ws("/", lower(col("c_mktsegment")), col("c_custkey")).as("code"),
          trim(lit("  padded  ")).as("trimmed"),
          length(col("c_name")).as("name_len"))
        .orderBy("c_custkey")
        .limit(200)
    },

    // F2: regex extract/replace/match (pmwiki URL-parsing shape).
    "f2_regexp" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_name").rlike("^[a-z]+ (widget|bolt)$"))
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "Brand#([0-9]+)", 1).cast("int").as("brand_id"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          regexp_extract(col("p_name"), "^([a-z]+) ", 1).as("first_word"))
        .orderBy("p_partkey")
    },

    // F3: date/time — extraction, truncation, interval add, epoch.
    "f3_datetime" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))
        .orderBy("o_orderkey")
        .limit(300)
    },

    // F4: math — IEEE-exact ops only (see class doc).
    "f4_math" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          sqrt(col("l_extendedprice")).as("sqrt_price"),
          abs(col("l_extendedprice") - col("l_quantity")).as("absdiff"),
          floor(col("l_quantity") / 7.0).cast("long").as("q_div7"),
          ceil(col("l_extendedprice") / 1000.0).cast("long").as("price_k"),
          (col("l_orderkey") % 97).as("okey_mod"),
          (col("l_discount") * col("l_discount")).as("disc_sq"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          round(col("l_extendedprice") / 3.0, 2).as("third"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    },

    // F6+F8: JSON parse → typed map access → aggregate.
    "f6_json" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("props_map",
          from_json(col("props"), org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
        .withColumn("k", element_at(col("props_map"), "k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k").cast(DecimalType(28, 0))).cast("long").as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // F7: array functions over the embedding column.
    "f7_array" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("first_dim"),
          round(aggregate(slice(transform(col("embedding"), _.cast("double")), 1, 8),
            lit(0.0), (acc, x) => acc + x * x), 6).as("head8_sq"),
          exists(col("embedding"), _ > 0.5f).as("has_hot_dim"))
        .orderBy("vec_id")
    },

    // F9: portable hashing — md5 fingerprints, bucketed counts.
    "f9_hash" -> { (s, d) =>
      Tables.customer(s, d)
        .withColumn("h", md5(col("c_name")))
        .groupBy(substring(col("h"), 1, 1).as("bucket"))
        .agg(count(lit(1)).as("n"), countDistinct(col("h")).as("n_distinct"))
        .orderBy("bucket")
    },

    // F10: bitwise family — AND/OR/XOR, shifts, popcount: integer-exact on
    // any engine (the primitives behind the Z-order keys, bitmap indexes,
    // and feature flags). All codegen'd column arithmetic.
    "f10_bitwise" -> { (s, d) =>
      val k = col("o_orderkey")
      Tables.orders(s, d)
        .select(k,
          k.bitwiseAND(lit(255L)).as("low_byte"),
          k.bitwiseOR(lit(4096L)).as("with_flag"),
          k.bitwiseXOR(shiftright(k, 3)).as("mixed"),
          shiftleft(k.bitwiseAND(lit(0xFFFFL)), 2).as("shifted"),
          bit_count(k).as("popcount"))
        .orderBy("o_orderkey")
        .limit(200)
    }
  )

  val oracle: Map[String, String] = Map(
    "f1_string" ->
      """SELECT c_custkey, LOWER(c_name) AS lc, substr(c_name, 1, 8) AS prefix,
        |  CAST(string_split(c_name, '#')[2] AS BIGINT) AS name_id,
        |  LOWER(c_mktsegment) || '/' || CAST(c_custkey AS VARCHAR) AS code,
        |  trim('  padded  ') AS trimmed, length(c_name) AS name_len
        |FROM customer ORDER BY c_custkey LIMIT 200""".stripMargin,

    "f2_regexp" ->
      """SELECT p_partkey,
        |  CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INT) AS brand_id,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  regexp_extract(p_name, '^([a-z]+) ', 1) AS first_word
        |FROM part WHERE regexp_matches(p_name, '^[a-z]+ (widget|bolt)$')
        |ORDER BY p_partkey""".stripMargin,

    "f3_datetime" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS m,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  epoch_us(o_orderdate) AS epoch_us
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin,

    "f4_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  sqrt(l_extendedprice) AS sqrt_price,
        |  abs(l_extendedprice - l_quantity) AS absdiff,
        |  CAST(floor(l_quantity / 7.0) AS BIGINT) AS q_div7,
        |  CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
        |  l_orderkey % 97 AS okey_mod,
        |  l_discount * l_discount AS disc_sq,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  round(l_extendedprice / 3.0, 2) AS third
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1000""".stripMargin,

    "f6_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "f7_array" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(CAST(embedding[1] AS DOUBLE), 6) AS first_dim,
        |  round(list_dot_product(CAST(embedding[1:8] AS DOUBLE[]), CAST(embedding[1:8] AS DOUBLE[])), 6) AS head8_sq,
        |  len(list_filter(embedding, x -> x > 0.5)) > 0 AS has_hot_dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "f9_hash" ->
      """SELECT substr(md5(c_name), 1, 1) AS bucket, COUNT(*) AS n,
        |  COUNT(DISTINCT md5(c_name)) AS n_distinct
        |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Spark bit_count returns INT; DuckDB bit_count(BIGINT) is TINYINT —
    // cast to match. Shifts/AND/OR/XOR are BIGINT on both.
    "f10_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low_byte,
        |  o_orderkey | 4096 AS with_flag,
        |  xor(o_orderkey, o_orderkey >> 3) AS mixed,
        |  (o_orderkey & 65535) << 2 AS shifted,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
        |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin
  )
}
