package graft

import org.scalatest.funsuite.AnyFunSuite

/** Schema contract: every fixture table at every scale factor matches the
  * declared StructType (drift in driver-generated data or accessor
  * behavior fails loudly here, not as a wrong query result).
  */
class SchemasSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  for (sf <- Seq("sf0.001", "sf0.01"); name <- Tables.names) {
    test(s"$name@$sf matches its schema contract") {
      val df = name match {
        case "events" => Tables.events(spark, s"/root/testdata/$sf")
        case n        => Tables.load(spark, s"/root/testdata/$sf", n)
      }
      assert(Schemas.validate(name, df.schema).isEmpty,
        Schemas.validate(name, df.schema).getOrElse(""))
    }
  }
}
