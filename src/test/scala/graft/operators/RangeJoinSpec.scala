package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val left = Seq(
    ("a", 1L, 100L), ("a", 2L, 250L), ("b", 3L, 100L), ("c", 4L, 500L)
  ).toDF("k", "l_id", "l_t")
  private val right = Seq(
    ("a", 10L, 0L),   // Δ=100 to l1 (= tol, inclusive); Δ=250 to l2 (out)
    ("a", 11L, 199L), // crosses a bucket edge vs l1 (buckets 0 vs 1)
    ("a", 12L, 360L), // Δ=110 to l2 (out), Δ=260 to l1 (out)
    ("b", 13L, 150L), // same bucket+Δ=50
    ("d", 14L, 100L)  // key with no left rows
  ).toDF("k", "r_id", "r_t")

  test("banded: inclusive tolerance, bucket-edge pairs found, keys respected") {
    val got = RangeJoin.banded(left, right, Seq("k"), "l_t", "r_t", 100L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    // brute-force truth
    val want = (for {
      l <- Seq(("a", 1L, 100L), ("a", 2L, 250L), ("b", 3L, 100L), ("c", 4L, 500L))
      r <- Seq(("a", 10L, 0L), ("a", 11L, 199L), ("a", 12L, 360L),
        ("b", 13L, 150L), ("d", 14L, 100L))
      if l._1 == r._1 && math.abs(l._3 - r._3) <= 100L
    } yield (l._2, r._2)).toSet
    assert(got == want)
    assert(got.contains((1L, 10L)))  // exactly at tolerance
    assert(got.contains((1L, 11L)))  // adjacent buckets
    assert(!got.exists(_._1 == 4L))  // key c matches nothing
  }

  test("banded: exact at epoch-nanosecond magnitudes (beyond 2^53)") {
    // double-division bucketing loses precision here; DIV must not
    val base = 1660000000000000000L
    val tol = 600000000000L
    val l = Seq(("a", 1L, base)).toDF("k", "l_id", "l_t")
    val r = Seq(("a", 2L, base - tol), ("a", 3L, base - tol - 1L),
      ("a", 4L, base + tol)).toDF("k", "r_id", "r_t")
    val got = RangeJoin.banded(l, r, Seq("k"), "l_t", "r_t", tol)
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(2L, 4L)) // both exactly-at-tolerance pairs, not the Δ=tol+1
  }

  test("banded: column names with spaces or operator characters work") {
    // the bucket expression is built from SQL text — identifiers must be
    // backtick-quoted or "t-1" parses as arithmetic and "event ms" errors
    val l = Seq(("a", 1L, 100L)).toDF("k", "l_id", "event ms")
    val r = Seq(("a", 2L, 150L), ("a", 3L, 900L)).toDF("k", "r_id", "t-1")
    val got = RangeJoin.banded(l, r, Seq("k"), "event ms", "t-1", 100L)
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("banded: no duplicate pairs from the 3-bucket fan-out") {
    val got = RangeJoin.banded(left, right, Seq("k"), "l_t", "r_t", 100L)
      .select("l_id", "r_id").collect()
    assert(got.length == got.map(r => (r.getLong(0), r.getLong(1))).toSet.size)
  }
}
