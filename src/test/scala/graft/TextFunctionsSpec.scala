package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Property tests for the normalization/fingerprint functions (SURVEY.md
  * §6.4): generated strings evaluated through the actual Catalyst
  * expressions, asserting idempotence and case/punct invariance.
  */
class TextFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 300 deterministic samples from a scalacheck generator. */
  private def samples(g: Gen[String]): Seq[String] =
    (0 until 300).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val messy: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', ' ', '\t', '.', ',', '!', '?', '/', '#'),
    Gen.alphaChar.map(_.toUpper))).map(_.mkString)

  test("t37's BPE fold tiles greedily left-to-right without re-merging fresh symbols") {
    // The exact sentinel-string fold t37_bpe_apply chains per rank
    // (TextDedup.scala): a merge fires only on an exact symbol-boundary
    // match, so the classic BPE tiling falls out — "nanana" under (a,n)
    // is [n, an, an], never a cascade through the freshly merged symbol.
    def stage(p1: String, p2: String): String =
      s"""aggregate(filter(split(seg, '[|]'), x -> x != ''), '|',
         |  (acc, x) -> CASE WHEN endswith(acc, '|$p1|') AND x = '$p2'
         |    THEN concat(left(acc, length(acc) - 2), '$p1$p2|')
         |    ELSE concat(acc, x, '|') END) AS seg""".stripMargin
    val seg0 = Seq("that", "nanana", "ananan", "the", "x").toDF("word")
      .selectExpr("word", "concat('|', regexp_replace(word, '(.)', '$1|')) AS seg")
    val afterTh = seg0.selectExpr("word", stage("t", "h"))
    val afterAt = afterTh.selectExpr("word", stage("a", "n"))
      .selectExpr("word", stage("a", "t"))
    val got = afterAt.as[(String, String)].collect().toMap
    assert(got("the") === "|th|e|")          // th wins; h no longer pairable
    assert(got("that") === "|th|at|")        // two ranks compose
    assert(got("nanana") === "|n|an|an|a|") // greedy left tiling, odd tail
    assert(got("ananan") === "|an|an|an|")   // clean tiling of a pure run
    assert(got("x") === "|x|")               // single symbol untouched
  }

  test("normalize is idempotent") {
    val df = samples(messy).toDF("s")
      .select(normalize(col("s")).as("once"))
      .select(col("once"), normalize(col("once")).as("twice"))
    assert(df.filter(col("once") =!= col("twice")).count() === 0)
  }

  test("normalize output alphabet is [a-z0-9 ] with single spaces, no edge spaces") {
    val bad = samples(messy).toDF("s")
      .select(normalize(col("s")).as("n"))
      .filter(col("n").rlike("[^a-z0-9 ]") || col("n").rlike("  ") ||
        col("n").rlike("^ ") || col("n").rlike(" $"))
    assert(bad.count() === 0)
  }

  test("fingerprint is invariant under case and punctuation noise") {
    val df = samples(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
      .toDF("s")
      .select(
        fingerprint(col("s")).as("clean"),
        fingerprint(concat(lit("  "), upper(col("s")), lit("!! ..."))).as("noisy"))
    assert(df.filter(col("clean") =!= col("noisy")).count() === 0)
  }

  test("tokenCount counts whitespace-separated tokens") {
    val got = Seq("a b c", "one", "x y").toDF("s")
      .select(tokenCount(col("s")).as("n")).as[Int].collect().toSeq
    assert(got === Seq(3, 1, 2))
  }

  test("langId picks the language whose markers dominate") {
    val got = Seq(
      "the cat and the dog of the house",
      "el gato y la casa que vive",
      "der hund und die katze und der").toDF("s")
      .select(langId(col("s"))).as[String].collect().toSeq
    assert(got === Seq("en", "es", "de"))
  }
}
