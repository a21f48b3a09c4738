package graft.tools

import graft.er.EntityResolution

/** Post-policy ER blocking attribution (r16 VERDICT Next #3): the
  * digit-gram drop bent the 100× candidate curve 622→248 pairs/label —
  * this probe names what owns the REMAINING growth, so the next lever is
  * attributed before it is attacked (the digit-gram precedent: the r13
  * family table attributed the saturation channel first, the r15/r16
  * rounds then cut it with the boundary measured).
  *
  * Per scale (1×/10×/100× of the reference's 3.6k labels, the
  * ErLoadProbe vocabulary), BOTH policy branches of
  * [[EntityResolution.blockPairsByFamily]] are measured same-run: word /
  * gram / gram_digit / gram_pure_digit (0 under the policy by
  * construction) / gram_digit_boundary (digit-bearing, not pure — the
  * surviving digit channel). The next-driver note names the policy-on
  * family with the steepest pairs-per-label growth over the last scale
  * decade. Alongside, [[EntityResolution.blockingAdvisory]] runs per
  * scale — the per-corpus opt-out advisory (r16 VERDICT Next #4) read on
  * the vocabulary whose 100× behavior motivated it.
  *
  * Merges the BENCH_ER `family` section (key-replace; rows carry both
  * branches) and a `family_advisory` section. Usage: ErFamilyProbe
  * [outPath]; env SPARK_GRAFT_ER_SCALES (default "1,10,100").
  */
object ErFamilyProbe {
  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("BENCH_ER.json")
    val scales = sys.env.getOrElse("SPARK_GRAFT_ER_SCALES", "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val spark = ToolSession.local()

    def famJson(fams: Seq[(String, Long)], nLabels: Long): String =
      fams.map { case (k, n) =>
        s""""$k":{"pairs":$n,"pairs_per_label":${f"${n.toDouble / nLabels}%.2f"}}"""
      }.mkString(",")

    val rows = new scala.collection.mutable.ArrayBuffer[String]
    val advRows = new scala.collection.mutable.ArrayBuffer[String]
    // (scale, policy-on family -> pairs/label) for the next-driver note
    val onCurve = new scala.collection.mutable.ArrayBuffer[(Int, Map[String, Double])]
    for (l <- scales) {
      val lbl = ErLoadProbe.labels(spark, l).cache()
      val nLabels = lbl.count()
      val t0 = System.nanoTime()
      val off = EntityResolution.blockPairsByFamily(lbl)
      val tOff = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val on = EntityResolution.blockPairsByFamily(lbl,
        dropPureDigitGrams = true)
      val tOn = (System.nanoTime() - t1) / 1e9
      onCurve += ((l, on.map { case (k, n) => k -> n.toDouble / nLabels }.toMap))
      val t2 = System.nanoTime()
      val adv = EntityResolution.blockingAdvisory(lbl)
      val tAdv = (System.nanoTime() - t2) / 1e9
      lbl.unpersist(blocking = true)
      val line = s"""{"scale":$l,"labels":$nLabels,""" +
        s""""policy_off":{${famJson(off, nLabels)},"sec":${f"$tOff%.1f"}},""" +
        s""""policy_on":{${famJson(on, nLabels)},"sec":${f"$tOn%.1f"}}}"""
      rows += line
      println(s"[erfamily] $line")
      val advLine = s"""{"scale":$l,"labels":$nLabels,""" +
        s""""verdict":"${adv.verdict}","dropped_pairs":${adv.droppedPairs},""" +
        s""""total_pairs":${adv.totalPairs},"fraction":${f"${adv.fraction}%.4f"},""" +
        s""""sec":${f"$tAdv%.1f"}}"""
      advRows += advLine
      println(s"[erfamily] advisory $advLine")
      flush()
    }

    def nextDriver: String =
      if (onCurve.size < 2) "insufficient scales for a growth reading"
      else {
        val (s0, c0) = onCurve(onCurve.size - 2)
        val (s1, c1) = onCurve.last
        val growth = c1.keys.map(k =>
          k -> (if (c0.getOrElse(k, 0.0) > 0) c1(k) / c0(k) else 0.0)).toMap
        val (top, g) = growth.maxBy(_._2)
        f"policy-on pairs-per-label growth ${s0}x -> ${s1}x: " +
          growth.toSeq.sortBy(-_._2).map { case (k, v) => f"$k $v%.2fx" }
            .mkString(", ") +
          f" — next driver: $top ($g%.2fx per decade)"
      }

    def flush(): Unit = {
      ArtifactJson.merge(outPath, "family",
        s"""{"what":"capped candidate pairs by blocking-key family, BOTH dropPureDigitGrams branches same-run (r17; families overlap so rows need not sum to the distinct union): word tokens / char 3-grams / digit-bearing grams / pure-digit grams (the policy's target population, 0 under policy_on by construction) / digit-bearing-not-pure boundary grams (the surviving digit channel). next_driver names the policy-on family with the steepest pairs-per-label growth over the last measured decade.",
 "rows":[${rows.mkString(",")}],
 "next_driver":"${nextDriver.replace("\"", "'")}"}""")
      ArtifactJson.merge(outPath, "family_advisory",
        s"""{"what":"EntityResolution.blockingAdvisory per scale on the ErLoadProbe vocabulary: fraction of the capped candidate-pair union reachable ONLY through pure-digit grams (= what the policy removes from blocking); fraction > 0.05 verdicts digit-identity-opt-out. The EntityN vocabulary crosses the boundary WITH SCALE: pair sets identical at 1x (policy-safe), pure-digit-only pairs dominate at 100x — the advisory is a per-corpus, per-scale reading, not a vocabulary constant.",
 "rows":[${advRows.mkString(",")}]}""")
    }
    flush()
    println(s"[erfamily] wrote family/family_advisory -> $outPath")
    spark.stop()
  }
}
