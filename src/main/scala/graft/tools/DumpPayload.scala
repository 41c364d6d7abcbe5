package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession
import graft.api.NetworkApi

/** Dev tool: write the E2 network payload JSON for a sf dir to a file
  * (used once to record the golden fixture; the spec compares against it).
  * Usage: runMain graft.tools.DumpPayload <sfDir> <outFile>
  */
object DumpPayload {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args.take(2)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-payload")
    val payload = NetworkApi.neighborhoodPayload(spark, sfDir)
      .collect()(0).getString(0)
    Files.writeString(Paths.get(outFile), payload)
    println(s"[payload] wrote ${payload.length} chars to $outFile")
    spark.stop()
  }
}
