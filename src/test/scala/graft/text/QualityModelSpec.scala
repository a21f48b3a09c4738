package graft.text

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The learned quality filter separates natural prose from spammy text on
  * a held-out set, and its corpus-side scoring stays a narrow no-shuffle
  * projection (the 100 TB contract).
  */
class QualityModelSpec extends AnyFunSuite with graft.SparkTestSession {

  // deterministic synthetic corpus: prose-like positives (stopword-rich,
  // mixed word lengths) vs four spam families (digit runs, punctuation
  // bursts, shouting, single-char repetition)
  private def prose(i: Int) =
    s"the quick brown fox number $i jumps over a lazy dog and runs to " +
      s"the river of stones in the morning light is calm"
  private def spam(i: Int) = (i % 4) match {
    case 0 => s"00${i}11 2345 6789 ${i * 7} 01923 ${i} 88 ${i * 3} 4412 909"
    case 1 => s"!!! ### $$$$ %%% @@@ ((${i})) *** ??? ;;; :: !!!! ##"
    case 2 => s"BUY NOW CLICK HERE WIN BIG PRIZE ${i} FREE OFFER ACT FAST"
    case _ => ("z" * 40) + s" ${i} " + ("q" * 35)
  }

  private lazy val (trainDf, testDf): (DataFrame, DataFrame) = {
    import spark.implicits._
    val all = (0 until 60).map(i => (i.toLong, prose(i), 1.0)) ++
      (100 until 160).map(i => (i.toLong, spam(i), 0.0))
    val (tr, te) = all.partition(_._1 % 3 != 0) // 2/3 train, 1/3 held out
    (tr.toDF("doc_id", "text", "is_quality"),
      te.toDF("doc_id", "text", "is_quality"))
  }

  test("held-out separation: learned filter ranks prose above spam") {
    val model = QualityModel.train(trainDf)
    val scored = QualityModel.score(testDf, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pos = scored.filter(_._1 < 100).values
    val neg = scored.filter(_._1 >= 100).values
    assert(pos.nonEmpty && neg.nonEmpty)
    // hard floor: every held-out prose doc outranks every held-out spam doc
    assert(pos.min > neg.max,
      f"overlap: min(prose)=${pos.min}%.3f <= max(spam)=${neg.max}%.3f")
    // and the probability gap is decisive, not marginal
    assert(pos.sum / pos.size - neg.sum / neg.size > 0.5)
  }

  test("keep() retains exactly the above-threshold docs") {
    val model = QualityModel.train(trainDf)
    val cut = 0.5
    val scored = QualityModel.score(testDf, model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kept = QualityModel.keep(testDf, model, cut).collect()
      .map(_.getLong(0)).toSet
    assert(kept == scored.filter(_._2 >= cut).keySet)
  }

  test("keep() drops unscoreable blanks by default; passes them through on request") {
    import spark.implicits._
    val model = QualityModel.train(trainDf)
    val withBlanks = testDf.select("doc_id", "text", "is_quality")
      .unionByName(Seq((900L, "", 0.0), (901L, "     ", 0.0))
        .toDF("doc_id", "text", "is_quality"))
      .unionByName(Seq((902L, Option.empty[String], 0.0))
        .toDF("doc_id", "text", "is_quality"))
    val dropped = QualityModel.keep(withBlanks, model, 0.5).collect()
      .map(_.getLong(0)).toSet
    assert(Set(900L, 901L, 902L).forall(!dropped.contains(_)))
    val passed = QualityModel.keep(withBlanks, model, 0.5,
      keepUnscoreable = true).collect().map(_.getLong(0)).toSet
    assert(passed == dropped + 900L + 901L + 902L) // incl. null text
  }

  test("corpus-side scoring plans no shuffle (narrow projection)") {
    val model = QualityModel.train(trainDf)
    val plan = QualityModel.score(testDf, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }
}
