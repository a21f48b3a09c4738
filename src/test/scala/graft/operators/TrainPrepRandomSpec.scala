package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random parity pins for the round-9 training-prep ops: each
  * distributed implementation is replayed by an independent plain-Scala
  * reference on randomized inputs (the repo's Louvain/similarity-join
  * evidence convention) so the gates' fixed fixtures aren't the only
  * thing standing between a refactor and silent divergence.
  */
class TrainPrepRandomSpec extends AnyFunSuite with graft.SparkTestSession {

  private val rnd = new scala.util.Random(0xC0FFEE)

  test("t19 parity: bigram LM scores match a plain-Scala reference on random corpora") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val vocabPool = Vector("aa", "bb", "cc", "dd", "ee", "ff")
      val docsLocal = (1L to 40L).map { id =>
        val n = 1 + rnd.nextInt(12)
        (id, Seq.fill(n)(vocabPool(rnd.nextInt(vocabPool.size))).mkString(" "))
      }
      val got = TextOps.bigramLmScores(docsLocal.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
        .toMap

      // reference: same add-one model in plain Scala
      val toks = docsLocal.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val vocab = toks.flatMap(_._2).distinct.size
      val bigrams = toks.flatMap { case (id, ws) =>
        ws.zip(ws.drop(1)).map(p => (id, p)) }
      val cb = bigrams.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
      val cctx = bigrams.groupBy(_._2._1).map { case (w, xs) => w -> xs.size.toLong }
      val expected = bigrams.groupBy(_._1).map { case (id, xs) =>
        val lp = xs.map { case (_, p) =>
          math.log((cb(p) + 1.0) / (cctx(p._1) + vocab)) }
        id -> ((xs.size.toLong,
          BigDecimal(lp.sum / xs.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      assert(got.keySet == expected.keySet, s"trial $trial key sets differ")
      expected.foreach { case (id, (n, s)) =>
        assert(got(id)._1 == n, s"trial $trial doc $id n_bigrams")
        assert(math.abs(got(id)._2 - s) < 1e-9, s"trial $trial doc $id score")
      }
    }
  }

  test("d11 parity: semantic dedup matches a plain-Scala brute force on random embeddings") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val dim = 6
      val vecs = (0L until 50L).map { id =>
        (id, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)) }
      val kSeeds = 4
      val tau = 0.8
      val got = DedupOps
        .semanticDedup(vecs.toDF("vec_id", "emb"), kSeeds = kSeeds, tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .toSet

      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      def cos(a: Seq[Double], b: Seq[Double]) =
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      val seeds = vecs.filter(_._1 < kSeeds)
      val assign = vecs.map { case (id, v) =>
        // argmax cosine, ties to smallest c_id (same convention)
        val c = seeds.map { case (cid, cv) => (cid, cos(v, cv)) }
          .minBy { case (cid, s) => (-s, cid) }._1
        id -> c
      }.toMap
      val dropped = (for {
        (a, va) <- vecs; (b, vb) <- vecs
        if a < b && assign(a) == assign(b) && cos(va, vb) >= tau
      } yield b).toSet
      val expected = vecs.map { case (id, _) =>
        (id, assign(id), dropped.contains(id)) }.toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("BPE parity: local and distributed merge loops agree on random corpora") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val words = Vector("ab", "abc", "bc", "aab", "ca", "cab", "abab")
      val text = Seq.fill(30)(words(rnd.nextInt(words.size))).mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      val local = graft.text.BpeTrainer.train(docs, nMerges = 6)
      val dist = graft.text.BpeTrainer.train(docs, nMerges = 6, driverLimit = 0)
      assert(local == dist, s"trial $trial: $local vs $dist")
    }
  }

  test("t22 parity: the two-pass range-partitioned form matches the window form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    for (trial <- 1 to 3) {
      val docsLocal = (0L until 120L).map { id =>
        val src = s"s${id % 5}"
        (id, src, Seq.fill(1 + rnd.nextInt(20))("w").mkString(" "))
      }
      // scramble physical layout: the scalable form must not depend on it
      // (seeded rnd, not the global Random — a failing subset must replay)
      val docsDf = rnd.shuffle(docsLocal)
        .toDF("doc_id", "source", "text").repartition(7)
      val budget = 40L + rnd.nextInt(60)
      val viaWindow = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("k"), col("doc_id"))
        docsDf.filter(org.apache.spark.sql.functions.length(trim(col("text"))) > 0)
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
            md5(concat_ws(":", col("doc_id"), lit("budget42"))).as("k"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .filter(col("cum_tokens") <= budget)
          .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      }
      val viaTwoPass = TextOps.tokenBudgetSample(docsDf, budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(viaTwoPass == viaWindow, s"trial $trial (budget $budget)")
      assert(viaTwoPass.nonEmpty)
    }
  }

  test("t20 parity: positions replay the seeded md5 order on random id sets") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      val ids = rnd.shuffle((0L until 500L).toList)
        .take(100 + rnd.nextInt(200))
      val docsDf = ids.map(i => (i, s"d$i")).toDF("doc_id", "text")
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expected = ids.sortBy(i => (md5hex(s"$i:graft42"), i)).zipWithIndex
        .map { case (id, p) => (id, p.toLong) }
      val got = TextOps.corpusShuffle(docsDf).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._2).toList
      assert(got == expected, s"trial $trial")
    }
  }

  test("d15 parity: dup-span removal matches a plain-Scala reference on random corpora") {
    import spark.implicits._
    // small vocab + short docs force plenty of window collisions, both
    // cross-doc and within-doc, so the canonical tie-break and the
    // overlap-collapse paths all fire
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (trial <- 1 to 3) {
      val vocabPool = Vector("a", "b", "c")
      val docsLocal = (1L to 30L).map { id =>
        val n = rnd.nextInt(16) // 0..15 tokens: below-window docs included
        (id, Seq.fill(n)(vocabPool(rnd.nextInt(vocabPool.size))).mkString(" "))
      }
      val win = 8
      // reference: windows keyed by CONTENT (the md5 key is a stand-in for
      // it), canonical = lexicographically smallest (doc_id, start), a
      // position is removed iff covered by >= 1 non-canonical occurrence
      val toks = docsLocal.filter(_._2.trim.nonEmpty)
        .map { case (id, t) => id -> t.trim.split("\\s+").toVector }
      val occ = toks.flatMap { case (id, ws) =>
        (0 to ws.size - win).map(s => (ws.slice(s, s + win).mkString(" "), id, s))
      }
      val canon = occ.groupBy(_._1).filter(_._2.size >= 2)
        .map { case (h, os) => h -> os.map(o => (o._2, o._3)).min }
      val removedPos: Set[(Long, Int)] = occ
        .filter(o => canon.get(o._1).exists(_ != ((o._2, o._3))))
        .flatMap(o => (o._3 until o._3 + win).map(p => (o._2, p))).toSet
      val expected = toks.map { case (id, ws) =>
        val kept = ws.zipWithIndex.collect {
          case (w, p) if !removedPos((id, p)) => w }
        id -> ((ws.size.toLong, kept.size.toLong, (ws.size - kept.size).toLong,
          md5hex(kept.mkString(" "))))
      }.toMap

      val got = DedupOps.removeDupSpans(docsLocal.toDF("doc_id", "text"), win)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("d18 parity: maximal-span removal matches a plain-Scala reference on random corpora") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (trial <- 1 to 3) {
      val vocabPool = Vector("a", "b", "c")
      val docsLocal = (1L to 30L).map { id =>
        val n = rnd.nextInt(16)
        (id, Seq.fill(n)(vocabPool(rnd.nextInt(vocabPool.size))).mkString(" "))
      }
      val win = 8
      // reference: dup windows (corpus-wide count >= 2) chain per doc at
      // gap <= win into maximal runs; runs group by their covered-token
      // CONTENT; canonical = smallest (doc_id, s0); non-canonical runs
      // remove whole
      val toks = docsLocal.filter(_._2.trim.nonEmpty)
        .map { case (id, t) => id -> t.trim.split("\\s+").toVector }
      val occ = toks.flatMap { case (id, ws) =>
        (0 to ws.size - win).map(s => (ws.slice(s, s + win).mkString(" "), id, s))
      }
      val dupContents = occ.groupBy(_._1).filter(_._2.size >= 2).keySet
      val spans = toks.flatMap { case (id, ws) =>
        val starts = occ.collect {
          case (c, `id`, s) if dupContents(c) => s }.sorted
        if (starts.isEmpty) Nil
        else {
          val runs = starts.tail.foldLeft(List(List(starts.head))) {
            case (acc @ cur :: rest, s) =>
              if (s - cur.head <= win) (s :: cur) :: rest
              else List(s) :: acc
            case (Nil, s) => List(List(s))
          }
          runs.map { r =>
            val s0 = r.min; val e0 = r.max + win - 1
            (id, s0, e0, ws.slice(s0, e0 + 1).mkString(" "))
          }
        }
      }
      val canonOf = spans.groupBy(_._4)
        .map { case (c, ss) => c -> ss.map(x => (x._1, x._2)).min }
      val removedPos: Set[(Long, Int)] = spans
        .filter(sp => canonOf(sp._4) != ((sp._1, sp._2)))
        .flatMap(sp => (sp._2 to sp._3).map(p => (sp._1, p))).toSet
      // invariant d15 lacks: every kept canonical span is byte-intact
      // (runs within a doc are position-disjoint by maximality)
      spans.filter(sp => canonOf(sp._4) == ((sp._1, sp._2))).foreach { sp =>
        assert((sp._2 to sp._3).forall(p => !removedPos((sp._1, p))),
          s"trial $trial: canonical span of '${sp._4}' not intact")
      }
      val expected = toks.map { case (id, ws) =>
        val kept = ws.zipWithIndex.collect {
          case (w, p) if !removedPos((id, p)) => w }
        id -> ((ws.size.toLong, kept.size.toLong, (ws.size - kept.size).toLong,
          md5hex(kept.mkString(" "))))
      }.toMap
      val got = DedupOps
        .removeDupSpansMaximal(docsLocal.toDF("doc_id", "text"), win)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(got == expected, s"trial $trial")
    }
  }
}
