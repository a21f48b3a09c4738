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

  test("d08 soundness: every rejected batch doc has a true Jaccard match in the corpus") {
    // LSH may MISS near-dups (false negatives are the banding trade-off,
    // bounded by the band/row choice), but it must never reject a doc
    // that has no true match: every rejection passed the exact Jaccard
    // verify. Sweep seeded random corpora drawn from a small word pool
    // so genuine near-dups occur, and check each rejection against the
    // brute-force shingle Jaccard.
    def shingleSet(text: String): Set[String] = {
      val t = text.trim.split("\\s+").toSeq
      if (t.size < 3) Set.empty
      else (0 to t.size - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
    }
    cases(77L, 4).foreach { rnd =>
      val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      def doc() = List.fill(4 + rnd.nextInt(4))(pool(rnd.nextInt(pool.size))).mkString(" ")
      val rows = (1L to 30L).map(i => (i, doc()))
      val admitted = DedupOps.incrementalDedupAdmit(rows.toDF("doc_id", "text"))
        .collect().map(_.getLong(0)).toSet
      val batch = rows.filter(_._1 % 3 == 0)
      val corpus = rows.filter(_._1 % 3 != 0)
      assert(admitted.subsetOf(batch.map(_._1).toSet))
      val rejected = batch.map(_._1).toSet -- admitted
      rejected.foreach { id =>
        val s = shingleSet(batch.find(_._1 == id).get._2)
        val hasTrueMatch = corpus.exists { case (_, ctext) =>
          val c = shingleSet(ctext)
          val union = (s ++ c).size
          union > 0 && s.intersect(c).size.toDouble / union >= 0.3
        }
        assert(hasTrueMatch, s"doc $id rejected without a true corpus match")
      }
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
