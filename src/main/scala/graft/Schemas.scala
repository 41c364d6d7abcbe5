package graft

import org.apache.spark.sql.types._

/** Explicit StructType constants for every engine table (SURVEY.md §7 M0:
  * "Schemas.scala — all StructTypes from FIXTURES.md").
  *
  * The parquet fixtures carry their own schemas; these constants are the
  * CONTRACT — `validate` catches silent drift (a regenerated fixture, a
  * schema-evolved upstream) before it corrupts downstream results. At
  * 100 TB these become the catalog table definitions.
  *
  * Note: `events.ts` is TIMESTAMP(NANOS) on disk (read via the nanos→µs
  * truncating accessor, see [[Tables.events]]); the contract records the
  * post-accessor µs timestamp the engine sees. The TPC-H-ish date columns
  * are TIMESTAMP without timezone in the fixtures → TimestampNTZType.
  */
object Schemas {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val all: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "supplier" -> supplier,
    "customer" -> customer, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Compare a loaded table against its contract, ignoring nullability
    * (parquet nullability varies by writer). Returns mismatch description
    * or None.
    */
  def validate(name: String, actual: StructType): Option[String] = {
    def strip(s: StructType): Seq[(String, DataType)] =
      s.fields.toSeq.map(f => (f.name, stripNullability(f.dataType)))
    def stripNullability(t: DataType): DataType = t match {
      case ArrayType(e, _) => ArrayType(stripNullability(e))
      case MapType(k, v, _) => MapType(stripNullability(k), stripNullability(v))
      case StructType(fs) => StructType(fs.map(f => f.copy(
        dataType = stripNullability(f.dataType), nullable = true)))
      case other => other
    }
    all.get(name) match {
      case None => Some(s"no contract for table $name")
      case Some(expected) =>
        val (e, a) = (strip(expected), strip(actual))
        if (e == a) None
        else Some(s"$name schema drift: expected $e, got $a")
    }
  }
}
