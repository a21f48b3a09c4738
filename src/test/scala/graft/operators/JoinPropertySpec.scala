package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Randomized-equivalence tests: the distributed join operators must
  * agree with their brute-force definitions on arbitrary inputs — the
  * fixture specs pin known edge cases, these sweep the space (duplicate
  * timestamps, empty sides, negative times, key skew). Seeded, so runs
  * are reproducible.
  */
class JoinPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def cases(seed: Long, n: Int): Seq[scala.util.Random] =
    (0 until n).map(i => new scala.util.Random(seed + i))

  private def genRows(rnd: scala.util.Random, idBase: Long)
      : List[(String, Long, Long)] = {
    val n = rnd.nextInt(41)
    List.tabulate(n) { i =>
      ("abc" (rnd.nextInt(3)).toString, idBase + i, // unique ids
        (rnd.nextInt(401) - 200).toLong)            // t in [-200, 200]
    }
  }

  test("RangeJoin.banded == brute-force band join (seeded random sweeps)") {
    cases(42L, 12).foreach { rnd =>
      val ls = genRows(rnd, 0L)
      val rs = genRows(rnd, 10000L)
      val tol = Seq(1L, 7L, 100L)(rnd.nextInt(3))
      val got = RangeJoin.banded(
          ls.toDF("k", "l_id", "l_t"), rs.toDF("k", "r_id", "r_t"),
          Seq("k"), "l_t", "r_t", tol)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val want = (for {
        (lk, lid, lt) <- ls; (rk, rid, rt) <- rs
        if lk == rk && math.abs(lt - rt) <= tol
      } yield (lid, rid)).toSet
      assert(got == want, s"tol=$tol |L|=${ls.size} |R|=${rs.size}")
    }
  }

  test("AsofJoin.asof == brute-force latest-at-or-before (seeded sweeps)") {
    cases(7L, 12).foreach { rnd =>
      val ls = genRows(rnd, 0L)
      // operator contract: right side unique per (key, time)
      val rs = genRows(rnd, 10000L)
        .groupBy(r => (r._1, r._3))
        .map { case ((k, t), g) => (k, g.map(_._2).max, t) }.toList
      val got = AsofJoin.asof(
          ls.toDF("k", "l_id", "t"), rs.toDF("k", "r_id", "r_t"),
          Seq("k"), "t", "r_t")
        .select("l_id", "r_id").collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val want = ls.map { case (lk, lid, lt) =>
        val cands = rs.filter(rr => rr._1 == lk && rr._3 <= lt)
        lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._3)._2))
      }.toMap
      assert(got == want)
    }
  }

  test("vec_dot == HOF fold on random vectors incl. length mismatches") {
    cases(11L, 6).foreach { rnd =>
      val pairs = List.fill(8)((
        List.fill(rnd.nextInt(9))((rnd.nextInt(201) - 100) / 16.0),
        List.fill(rnd.nextInt(9))((rnd.nextInt(201) - 100) / 16.0)))
      val df = pairs.toDF("a", "b")
      val native = df.select(graft.functions.GraftFunctions.vecDot(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b"))).collect()
      val hof = df.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)")
        .collect()
      native.zip(hof).foreach { case (n, h) =>
        assert(n.isNullAt(0) == h.isNullAt(0))
        if (!n.isNullAt(0)) assert(n.getDouble(0) == h.getDouble(0))
      }
    }
  }
}
