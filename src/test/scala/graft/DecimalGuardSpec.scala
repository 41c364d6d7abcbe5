package graft

import org.scalatest.funsuite.AnyFunSuite

/** No oracle-gated query may surface a DecimalType column: the driver's
  * comparator hashes stringified cells with an asymmetric fetch (arrow for
  * the Spark parquet, float path for the DuckDB oracle), so a decimal with
  * a trailing-zero fraction ('x.50' vs 'x.5') hash-mismatches on exactly
  * equal values — the round-8 s18/st12 red. See [[GateSchema]].
  *
  * This spec covers every gated query whose builder is lazily plannable
  * (same exclusion list as PlanLint: real-streaming / lifecycle builders
  * run work eagerly and are instead guarded at dump time by Verify's
  * require — which covers 100% of gated outputs, including those skipped
  * here, because it checks the schema of the DataFrame it is about to
  * write).
  */
class DecimalGuardSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // Builders that RUN eagerly (streams, multi-version lifecycle publishes):
  // too slow for a schema-only sweep; Verify guards them at dump time.
  private val skipPrefixes = Seq("st", "e5_", "s16_", "s19_", "s20_", "t17_", "t27_")

  private val gated = SparkEntry.queries.keys.toSeq.sorted
    .filter(SparkEntry.oracleSql.contains)
    .filterNot(n => skipPrefixes.exists(n.startsWith))

  test("gated batch query outputs carry no DecimalType column") {
    val offenders = gated.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sfDir).schema
      GateSchema.decimalPaths(schema).map(p => s"$name:$p")
    }
    assert(offenders.isEmpty,
      s"DecimalType on a gated output surface (cast to double on BOTH " +
        s"sides): ${offenders.mkString(", ")}")
  }

  test("decimalPaths finds nested decimals") {
    import org.apache.spark.sql.types._
    val dt = StructType(Seq(
      StructField("a", DecimalType(18, 2)),
      StructField("b", ArrayType(StructType(Seq(
        StructField("c", DecimalType(10, 0)))))),
      StructField("d", MapType(StringType, DecimalType(5, 2))),
      StructField("ok", DoubleType)))
    assert(GateSchema.decimalPaths(dt) == Seq("a", "b[].c", "d{value}"))
  }
}
