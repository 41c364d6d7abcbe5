package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Merge, RangeJoin, Salting}
import graft.plans.TopKPerKey

/** Randomized operator-vs-reference properties for the custom operators.
  * The REFERENCE here is computed in plain Scala on the driver from the
  * same generated rows — an engine-independent second implementation,
  * complementing the window-formulation cross-checks (Spark vs Spark) in
  * the example specs. Domains are deliberately tiny (keys 0..4, times
  * 0..19) so every run exercises duplicate keys, equal timestamps,
  * boundary equality, empty match sets, and empty sides. Seeds are fixed
  * — failures reproduce.
  */
class OperatorPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def cases[A](g: Gen[A], n: Int, seed0: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed0 + i)))

  private def ts(sec: Int) = new Timestamp(sec * 1000L)

  // (key, time) pools with heavy collision rates.
  private val keyGen = Gen.choose(0, 4)
  private val timeGen = Gen.choose(0, 19)

  test("asOf: random data matches a plain-Scala reference (ties, boundaries, empty sides)") {
    import spark.implicits._
    val caseGen = for {
      nl <- Gen.choose(0, 25)
      nr <- Gen.choose(0, 25)
      lefts <- Gen.listOfN(nl, Gen.zip(keyGen, timeGen))
      rights <- Gen.listOfN(nr, Gen.zip(keyGen, timeGen, Gen.choose(0, 9)))
    } yield (lefts, rights)

    cases(caseGen, 12, seed0 = 101L).foreach { case (lefts, rights) =>
      val leftRows = lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
      val rightRows = rights.map { case (k, rt, tie) =>
        (k, ts(rt), tie.toLong, rt * 100L + tie) }
      val l = leftRows.toDF("id", "k", "t")
      val r = rightRows.toDF("rk", "rt", "tie", "payload")
      val got = AsOfJoin.asOf(l, r, leftKey = "k", rightKey = "rk",
          leftTime = "t", rightTime = "rt", tiebreak = "tie",
          rightCols = Seq("payload"))
        .select("id", "payload").as[(Long, Long)].collect().toSeq.sorted
      // Reference: latest right row per left row by (rt, tie), rt <= t.
      val want = leftRows.flatMap { case (id, k, t) =>
        val cands = rightRows.filter(rr => rr._1 == k && !rr._2.after(t))
        if (cands.isEmpty) None
        else Some(id -> cands.maxBy(rr => (rr._2.getTime, rr._3))._4)
      }.sorted
      assert(got == want, s"asOf mismatch on ${leftRows.size}x${rightRows.size}")

      // Outer form: every left row survives; matched subset identical.
      val outer = AsOfJoin.asOf(l, r, "k", "rk", "t", "rt", "tie",
        Seq("payload"), inner = false)
      assert(outer.count() == leftRows.size.toLong)
      val outerMatched = outer.filter(col("payload").isNotNull)
        .select("id", "payload").as[(Long, Long)].collect().toSeq.sorted
      assert(outerMatched == want)
    }
  }

  test("intervalJoin: random points × intervals match the all-pairs reference at several bucket widths") {
    import spark.implicits._
    val caseGen = for {
      np <- Gen.choose(0, 25)
      ni <- Gen.choose(0, 15)
      pts <- Gen.listOfN(np, Gen.zip(keyGen, timeGen))
      ivs <- Gen.listOfN(ni, Gen.zip(keyGen, timeGen, Gen.choose(0, 6)))
    } yield (pts, ivs)

    cases(caseGen, 10, seed0 = 202L).foreach { case (pts, ivs) =>
      val ptRows = pts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
      val ivRows = ivs.zipWithIndex.map { case ((k, s, len), i) =>
        (i.toLong, k, ts(s), ts(s + len)) }
      val l = ptRows.toDF("id", "k", "t")
      val r = ivRows.toDF("rid", "rk", "s", "e")
      val want = (for {
        (id, k, t) <- ptRows
        (rid, rk, s, e) <- ivRows
        if k == rk && !t.before(s) && !t.after(e)
      } yield (id, rid)).sorted
      for (width <- Seq(1L, 5L, 100L)) {
        val got = RangeJoin.intervalJoin(l, r, "k", "rk", "t", "s", "e", width)
          .select("id", "rid").as[(Long, Long)].collect().toSeq.sorted
        assert(got == want, s"intervalJoin mismatch at width=$width")
      }
    }
  }

  test("TopKPerKey: random data matches the sorted-take reference as a multiset") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(0, 40)
      rows <- Gen.listOfN(n, Gen.zip(keyGen, Gen.choose(0, 5), Gen.choose(0, 5)))
    } yield rows
    cases(caseGen, 10, seed0 = 303L).foreach { rows =>
      val df = rows.map { case (k, a, b) => (k, a.toLong, b.toLong) }
        .toDF("k", "a", "b")
      val got = TopKPerKey(df, Seq("k"), Seq("a" -> false, "b" -> true), k = 2)
        .as[(Int, Long, Long)].collect().toSeq.sorted
      val want = rows.map { case (k, a, b) => (k, a.toLong, b.toLong) }
        .groupBy(_._1).values.flatMap(g =>
          g.sortBy(r => (-r._2, r._3)).take(2)).toSeq.sorted
      assert(got == want, s"TopKPerKey mismatch on ${rows.size} rows")
    }
  }

  test("upsert: random base/updates match the map-override reference; idempotent") {
    import spark.implicits._
    val caseGen = for {
      nb <- Gen.choose(0, 20)
      nu <- Gen.choose(0, 20)
      base <- Gen.listOfN(nb, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 99)))
      ups <- Gen.listOfN(nu, Gen.zip(Gen.choose(0, 9), Gen.choose(100, 199)))
    } yield (base, ups)
    cases(caseGen, 10, seed0 = 404L).foreach { case (base0, ups0) =>
      // upsert contract: keys unique per side — dedup keeping max value.
      val base = base0.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }.toMap
      val ups = ups0.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).max }.toMap
      val b = base.toSeq.toDF("k", "v")
      val u = ups.toSeq.toDF("k", "v")
      val got = Merge.upsert(b, u, "k").as[(Int, Int)].collect().toSeq.sorted
      val want = (base ++ ups).toSeq.sorted
      assert(got == want)
      // Idempotence: applying the same updates twice equals once.
      val twice = Merge.upsert(Merge.upsert(b, u, "k"), u, "k")
        .as[(Int, Int)].collect().toSeq.sorted
      assert(twice == want)
    }
  }

  test("saltedSumCount: random skewed data matches exact per-key count/sum at several bucket counts") {
    import spark.implicits._
    val caseGen = for {
      n <- Gen.choose(0, 60)
      // 0 is the celebrity key: ~half of all rows land on it.
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.frequency(5 -> Gen.const(0), 5 -> keyGen), Gen.choose(-50L, 50L)))
    } yield rows
    cases(caseGen, 8, seed0 = 505L).foreach { rows =>
      val df = rows.toDF("k", "v")
      val want = rows.groupBy(_._1).map { case (k, g) =>
        (k, g.size.toLong, g.map(_._2).sum) }.toSeq.sorted
      for (buckets <- Seq(1, 3, 16)) {
        val got = Salting.saltedSumCount(df, Seq("k"), col("v"), buckets)
          .as[(Int, Long, Long)].collect().toSeq.sorted
        assert(got == want, s"saltedSumCount mismatch at buckets=$buckets")
      }
    }
  }
}
