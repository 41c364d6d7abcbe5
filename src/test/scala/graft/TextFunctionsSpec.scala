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

  test("t39's doubled-delimiter replace IS the greedy BPE tiling, and training learns real merges") {
    // One training round's rewrite is a plain non-rescanning
    // replace('|p1||p2|', '|p1p2|') over the doubled-delimiter form —
    // adjacent occurrences never share delimiter chars, so the replace
    // tiles exactly like t37's fold (its single-bar form would drop
    // every second adjacent match: '|a|a|a|a|' only merges once).
    def seg(w: String): String = w.map(c => s"|$c|").mkString
    def merge(s: String, p1: String, p2: String): String =
      s.replace(s"|$p1||$p2|", s"|$p1$p2|")
    assert(merge(seg("aaaa"), "a", "a") === "|aa||aa|")
    assert(merge(seg("aaa"), "a", "a") === "|aa||a|")
    assert(merge(seg("nanana"), "a", "n") === "|n||an||an||a|")
    assert(merge(merge(seg("that"), "t", "h"), "a", "t") === "|th||at|")
    // Multi-char later ranks stay atomic: (m, er) after (e, r).
    assert(merge(merge(seg("mer"), "e", "r"), "m", "er") === "|mer|")
    // Training on the real sf0.001 corpus: contiguous ranks, counts
    // non-increasing (a merge can only create pairs no more frequent
    // than the pair it consumed, and never raises an existing count),
    // and round 1 equals a brute-force census over the raw vocab.
    val got = graft.queries.TextDedup.queries("t39_bpe_train")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === (1 to 8))
    assert(got.map(_._4).toSeq.sliding(2).forall { case Seq(a, b) => a >= b })
    assert(got.forall(m => m._2.matches("[a-z]+") && m._3.matches("[a-z]+")))
    val vocab = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").count().as[(String, Long)].collect()
    val census = scala.collection.mutable.Map[(String, String), Long]()
    vocab.foreach { case (w, n) =>
      w.sliding(2).foreach { p =>
        if (p.length == 2) {
          val k = (p.substring(0, 1), p.substring(1, 2))
          census(k) = census.getOrElse(k, 0L) + n
        }
      }
    }
    val best = census.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.head
    assert((got.head._2, got.head._3) === best._1 && got.head._4 === best._2)
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
