package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions.vecDot

/** Approximate/exact nearest-neighbor search over the `embeddings` table.
  *
  * a01 is the brute-force cosine top-k baseline: the (small) query set is
  * broadcast against the candidate scan, so the plan is a single pass over
  * the big side — the correct shape at 100 TB when |Q| is small. The dot
  * product is the native codegen'd [[graft.functions.VecDot]] — a
  * sequential double fold, so the result is bit-deterministic (and
  * bit-identical to the interpreted `aggregate(zip_with(...))` HOF form
  * it replaced).
  *
  * a02 is the scale path: random-hyperplane LSH (signs of md5-derived
  * pseudo-random projections) buckets vectors so only same-bucket pairs are
  * scored — the candidate join is an equi-join on the signature.
  */
object AnnOps {
  // native codegen'd sequential fold (graft.functions.VecDot) — replaces
  // the interpreted aggregate(zip_with(...)) HOF form, same bit pattern
  private def dotCol = vecDot(col("emb"), col("q_emb"))

  /** sign(h(p,d)) in {+1,-1} from md5("p_d") — the engine-agnostic
    * pseudo-random hyperplane convention shared by a02's signature gate,
    * [[lshKnn]], and the DuckDB oracles. The (plane x dim) matrix is a
    * CONSTANT: precomputed driver-side and inlined as literals so
    * executors do one multiply-add per element, not an md5 per
    * (row, plane, dim).
    */
  private[operators] def planeSign(p: Int, d: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_$d".getBytes("UTF-8"))
    if (((hex(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /** One "1"/"0" sign-bit Column per hyperplane for an `emb` column of
    * width `dim` (the fixed-width embedding contract).
    */
  private def planeBits(nPlanes: Int, dim: Int): Seq[org.apache.spark.sql.Column] =
    (0 until nPlanes).map { p =>
      val row = typedlit((0 until dim).map(d => planeSign(p, d)))
      when(vecDot(col("emb"), row) >= 0, "1").otherwise("0")
    }

  /** Brute-force cosine top-k for query vectors vec_id < 5 — the a01
    * gate body at its default depth, parameterized so callers that fuse
    * this ranking (a09's RRF) can ask for a deeper list without silently
    * fusing a truncated one.
    */
  private[graft] def denseTopK(s: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      .withColumn("norm", sqrt(vecDot(col("emb"), col("emb"))))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("norm").as("q_norm"))
    val scored = e.filter(col("vec_id") >= 5)
      .crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        (dotCol / (col("norm") * col("q_norm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Brute-force cosine top-k (k=10) for query vectors vec_id < 5. */
  val a01 = QueryDef(
    "a01_knn_cosine",
    "brute-force cosine top-k with broadcast query set",
    (s, dir) => denseTopK(s, dir),
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings),
      n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS norm FROM e),
      q AS (SELECT vec_id AS q_id, emb AS q_emb, norm AS q_norm FROM n WHERE vec_id < 5),
      sc AS (SELECT q_id, vec_id,
               list_dot_product(emb, q_emb) / (norm * q_norm) AS sim
             FROM n CROSS JOIN q WHERE vec_id >= 5)
      SELECT q_id, vec_id, rank, sim FROM (
        SELECT q_id, vec_id, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
        FROM sc) t
      WHERE rank <= 10 ORDER BY q_id, rank"""))

  /** Random-hyperplane LSH bucketing: 8-bit signature from sign hashes of
    * (plane, dimension) md5 values; emits bucket sizes (the index build).
    */
  val a02 = QueryDef(
    "a02_lsh_buckets",
    "random-hyperplane LSH signature + bucket histogram",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      // sign-matrix width comes from the data (first row; embeddings are
      // fixed-width by contract) — a hardcoded cap narrower than the
      // vectors would silently diverge from the oracle, which projects
      // over ALL dims (round-1 ADVICE). vec_dot requires equal lengths
      // (HOF-null semantics); the sign rows are built at exactly the
      // data's width.
      val maxDim = e.select(size(col("emb"))).take(1) // empty table → 0-dim
        .headOption.map(_.getInt(0)).getOrElse(0)
      val sig = e.select(col("vec_id"), concat(planeBits(8, maxDim): _*).as("sig"))
      sig.groupBy(col("sig"))
        .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))
        .orderBy(col("sig"))
    },
    Some {
      s"""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings),
        sig AS (SELECT vec_id, ${planeSql(8)} AS sig FROM e)
        SELECT sig, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec
        FROM sig GROUP BY sig ORDER BY sig"""
    })

  /** DuckDB replica of [[planeBits]] over a CTE exposing `emb`: one
    * projection term per plane p — sum over dims of +-emb[d], sign from
    * the same md5("p_d") convention — concatenated to an `nPlanes`-bit
    * "1"/"0" string. Shared by the a02 and a04 oracles.
    */
  private def planeSql(nPlanes: Int): String =
    (0 until nPlanes).map { p =>
      s"""CASE WHEN list_sum(list_transform(range(len(emb)), d ->
            CASE WHEN substring(md5('$p' || '_' || CAST(d AS VARCHAR)), 1, 1) < '8'
                 THEN emb[d + 1] ELSE -emb[d + 1] END)) >= 0
          THEN '1' ELSE '0' END"""
    }.mkString(" || ")

  /** Banded hyperplane-LSH top-k retrieval — the search companion to
    * a02's signature/index build: `nPlanes` sign bits split into
    * `nBands` bands; candidates are the vectors sharing ANY band value
    * with the query (OR-amplification — the d02 MinHash-band shape),
    * then ONLY candidates are scored exactly and ranked. At 100 TB the
    * candidate step is a (band, band_sig) equi-join, shuffle-partitioned
    * by bucket — never all-pairs — and the query side broadcasts.
    *
    * Retrieval quality (pinned by AnnRecallSpec on the synthetic
    * embeddings vs a01's exact top-k): the 8-plane/4-band default holds
    * mean recall@10 ≥ 0.7 (measured 0.82 at sf0.001) while pruning ~1/3
    * of the corpus from scoring. The band/width trade is real: 16x4
    * (4-bit bands) cuts candidates to ~26 % of the corpus but recall to
    * ~0.36 on this data — tune per corpus with the recall harness.
    */
  def lshKnn(s: SparkSession, dir: String, nPlanes: Int = 8,
             nBands: Int = 4, k: Int = 10): DataFrame = {
    require(nPlanes % nBands == 0, s"nBands ($nBands) must divide nPlanes ($nPlanes)")
    val perBand = nPlanes / nBands
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      .withColumn("norm", sqrt(vecDot(col("emb"), col("emb"))))
    val maxDim = e.select(size(col("emb"))).take(1)
      .headOption.map(_.getInt(0)).getOrElse(0)
    val bits = planeBits(nPlanes, maxDim)
    val bandCols = (0 until nBands).map(b =>
      concat(bits.slice(b * perBand, (b + 1) * perBand): _*))
    // (vec_id, band, band-signature) — one row per band, so same-band
    // matches are a plain equi-join on (band, bsig)
    val sig = e.select(col("vec_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bsig")))
    val qsig = sig.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("band"), col("bsig"))
    val cand = sig.filter(col("vec_id") >= 5)
      .join(broadcast(qsig), Seq("band", "bsig"))
      .select(col("q_id"), col("vec_id")).distinct()
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("norm").as("q_norm"))
    val scored = cand
      .join(e, Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dotCol / (col("norm") * col("q_norm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** The [[lshKnn]] default (8 planes x 4 bands, k=10) as a gated query:
    * banded-LSH retrieval vs the DuckDB band-join replica — the search
    * half of the a02 index build, oracled end-to-end (candidate
    * generation AND exact re-scoring), so approximation plumbing bugs
    * (band slicing, OR-amplification dedup, query-side exclusion) fail
    * the hash compare rather than just nudging recall.
    */
  val a04 = QueryDef(
    "a04_lsh_knn",
    "banded hyperplane-LSH top-k retrieval (8 planes x 4 bands)",
    (s, dir) => lshKnn(s, dir),
    Some {
      s"""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings),
        n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS norm FROM e),
        sig AS (SELECT vec_id, ${planeSql(8)} AS sig FROM e),
        bands AS (SELECT vec_id, CAST(b.range AS INT) AS band,
                    substring(sig, CAST(b.range AS INT) * 2 + 1, 2) AS bsig
                  FROM sig CROSS JOIN range(4) b),
        cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id
                 FROM bands c JOIN bands q USING (band, bsig)
                 WHERE c.vec_id >= 5 AND q.vec_id < 5),
        q AS (SELECT vec_id AS q_id, emb AS q_emb, norm AS q_norm FROM n WHERE vec_id < 5),
        sc AS (SELECT c.q_id, c.vec_id,
                 list_dot_product(qq.q_emb, v.emb) / (qq.q_norm * v.norm) AS sim
               FROM cand c JOIN q qq USING (q_id) JOIN n v ON v.vec_id = c.vec_id)
        SELECT q_id, vec_id, rank, sim FROM (
          SELECT q_id, vec_id, sim,
                 row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
          FROM sc) t
        WHERE rank <= 10 ORDER BY q_id, rank"""
    })

  /** Per-query retrieval recall of an approximate ANN result against the
    * exact baseline, both in the `(q_id, vec_id, rank, sim)` result shape
    * produced by [[a01]]/[[lshKnn]]/[[a03]] — the tuning signal for
    * band/probe choices (recall floors for the shipped defaults are
    * pinned in AnnRecallSpec). Output: `(q_id, n_exact, n_hit, recall)`,
    * one row per query; `avg(recall)` gives the corpus mean. Distributed:
    * one semi-join on (q_id, vec_id) + per-query counts — no collect, so
    * it scales to evaluation sets far beyond driver memory.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val ex = exact.select(col("q_id"), col("vec_id"))
    val hits = ex
      .join(approx.select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    ex.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
      .orderBy(col("q_id"))
  }

  /** The `embeddings` table in the ANN working shape:
    * (vec_id, emb double[], norm), cached and materialized — assignment,
    * probes and scoring all reuse it.
    */
  private[graft] def embTable(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      .withColumn("norm", sqrt(vecDot(col("emb"), col("emb"))))
      .cache()
    e.count()
    e
  }

  /** IVF search core shared by the seeded gate ([[a03]]) and the
    * k-means-trained path ([[ivfKnnTrained]]): assign every vector to its
    * nearest centroid by cosine (ties to the smallest c_id), probe the
    * `nProbes` nearest centroids per query (vec_id < 5, the gate's query
    * convention), and exactly score ONLY the probed cells. `cents` must
    * carry (c_id, c_emb, c_norm); a coarse quantizer is k << corpus by
    * definition, so it broadcasts unconditionally.
    */
  private[operators] def ivfSearch(e: DataFrame, cents: DataFrame,
      nProbes: Int = 2, topK: Int = 10): DataFrame =
    exactScoreCands(e, ivfCandidates(e, cents, nProbes), topK)

  /** [[ivfSearch]] from a PRE-COLLECTED seed panel (r18, r17 VERDICT Next
    * #5 — trim the seeded-collect round-trips): the seeded gate's queries
    * (vec_id < 5) are a subset of its centroids (vec_id < 16), so ONE
    * collect yields centroids, the per-query probe pick ([[probeRowsOf]],
    * driver-side over k·|Q| scalars), and the broadcast query panel —
    * where the r17 form paid a separate collect inside the assignment and
    * rebuilt probe/query frames from the cached corpus. Values identical:
    * same assignment expression ([[CentroidAssign.nearestOf]]), same
    * probe ordering, same literal floats (collected, not recomputed).
    */
  private[operators] def ivfSearchSeeded(e: DataFrame,
      seeds: Seq[(Long, Seq[Double], Double)],
      nProbes: Int = 2, topK: Int = 10): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val qs = seeds.filter(_._1 < 5)
    val probes = probeRowsOf(qs, seeds, nProbes).toDF("q_id", "c_id")
    val cand = broadcast(probes)
      .join(CentroidAssign.nearestOf(e, seeds), Seq("c_id"))
      .filter(col("vec_id") >= 5)
      .select(col("q_id"), col("vec_id"))
    exactScoreCands(e, cand, topK, qPanel = Some(qs))
  }

  /** The exact-cosine scoring + rank tail shared by [[ivfSearch]] and
    * [[ivfSearchSeeded]] — one definition of the score/tie-break/top-k
    * contract. `qPanel` substitutes a collected query panel for the
    * corpus-derived broadcast frame (same rows, literal floats).
    */
  private def exactScoreCands(e: DataFrame, cand: DataFrame, topK: Int,
      qPanel: Option[Seq[(Long, Seq[Double], Double)]] = None): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val q = qPanel match {
      case Some(rows) => rows.toDF("q_id", "q_emb", "q_norm")
      case None => e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
          col("norm").as("q_norm"))
    }
    val scored = cand
      .join(e, Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dotCol / (col("norm") * col("q_norm"))).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("rank"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** ONE collect of the seeded model panel (vec_id < kSeeds, with norms):
    * centroids, the PQ codebook grid ([[seededGrid]]), the probe pick and
    * the query panel all derive from these k rows driver-side — one
    * driver round-trip per gate invocation where r17 paid one per model
    * table (the honestly-recorded a03/a07 regression mechanism).
    */
  private[operators] def collectSeeds(e: DataFrame,
      kSeeds: Int): Seq[(Long, Seq[Double], Double)] =
    e.filter(col("vec_id") < kSeeds)
      .select(col("vec_id"), col("emb"), col("norm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq

  /** [[ivfProbes]]' per-query probe pick computed driver-side from
    * collected panels — value-identical to the window form: [[dotSeq]] ≡
    * vecDot bitwise, identical IEEE divide/multiply, and
    * `java.lang.Double.compare` orders NaN largest exactly as Spark's
    * double ordering (desc ⇒ NaN first), ties to the smallest c_id.
    */
  private def probeRowsOf(qs: Seq[(Long, Seq[Double], Double)],
      cents: Seq[(Long, Seq[Double], Double)],
      nProbes: Int): Seq[(Long, Long)] = {
    val ord = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2) // psim DESC, NaN first
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    qs.flatMap { case (qid, qe, qn) =>
      cents.map { case (cid, ce, cn) => (cid, dotSeq(qe, ce) / (qn * cn)) }
        .sorted(ord).take(nProbes).map { case (cid, _) => (qid, cid) }
    }
  }

  /** ONE definition of IVF candidate generation, shared by the
    * full-precision path ([[ivfSearch]] → a03/ivfKnnTrained) and the
    * PQ-ADC path ([[ivfPqAdcScored]] → a06/a07): assign every corpus
    * vector to its nearest centroid by cosine (ties to the smallest
    * c_id), pick the `nProbes` nearest cells per query (vec_id < 5, the
    * gate query convention), and emit the (q_id, vec_id) candidates in
    * the probed cells. Both families' oracles pin the same tie-break and
    * probe conventions, so a fix here reaches both by construction.
    */
  private def ivfCandidates(e: DataFrame, cents: DataFrame,
                            nProbes: Int): DataFrame =
    broadcast(ivfProbes(e, cents, nProbes))
      .join(CentroidAssign.nearest(e, cents), Seq("c_id"))
      .filter(col("vec_id") >= 5)
      .select(col("q_id"), col("vec_id"))

  /** The per-query probe pick alone (q_id, c_id) — factored from
    * [[ivfCandidates]] so the [[IndexStore]] query path can join it
    * against a PERSISTED assignment table instead of recomputing the
    * corpus assignment (the whole point of the at-rest index).
    */
  private[operators] def ivfProbes(e: DataFrame, cents: DataFrame,
                                   nProbes: Int): DataFrame = {
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("psim").desc, col("c_id"))
    e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("norm").as("q_norm"))
      .crossJoin(broadcast(cents))
      .select(col("q_id"), col("c_id"),
        (vecDot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
          .as("psim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbes)
      .select(col("q_id"), col("c_id"))
  }

  /** Deterministic-structure Lloyd (k-means) refinement for the IVF
    * coarse quantizer: start from a03's seed convention (first k
    * vec_ids), then `iters` rounds of cosine assignment + element-wise
    * mean. The mean is posexplode → avg → rebuild sorted by dimension
    * position, so the STRUCTURE is fully deterministic; the float VALUES
    * are partition-summation-order-dependent like any distributed mean —
    * which is why the trained path is spec-pinned (recall floor and
    * no-worse-than-seeded in AnnRecallSpec) instead of hash-oracled. An
    * emptied cell drops out (standard Lloyd degeneracy; k only shrinks).
    *
    * Scale shape per iteration: one broadcast-join assignment over the
    * corpus and one (c_id, dim)-keyed mean — shuffle volume rows × dim,
    * the standard distributed k-means cost; k and iters are small
    * constants. Centroids live in one in-memory DataFrame of k rows.
    */
  def kmeansCentroids(e: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    // seed with the k SMALLEST vec_ids present (TakeOrderedAndProject, no
    // full sort) — NOT `vec_id < k`: the input may be a filtered subset
    // (semanticDedupTrained over decile survivors) or an offset id space
    // (sharded corpora), where a literal id threshold finds few or zero
    // seeds and the quantizer silently degenerates (r10 review finding).
    // Identical to the old convention whenever ids are dense from 0.
    // r17 optimization (guide §2.2/§2.4): centroids are k rows by
    // definition, so each Lloyd round materializes them AT THE DRIVER
    // (the standard distributed-k-means shape) instead of threading a
    // lazy k-row frame through the next round's plan. Assignment then
    // runs through [[CentroidAssign.nearest]]'s inlined-literal form —
    // a narrow projection, where the old crossJoin + max_by shuffled
    // every corpus embedding once per iteration — and the element-wise
    // mean is the only exchange left per round: a map-side-combined
    // (c_id, pos) avg of k·dim rows per map partition. Assignment picks
    // identical centroids (same csim floats, same ordering); the mean's
    // float low bits may differ in summation order, which is why the
    // trained path was always spec-pinned (recall floors), never hashed.
    val s = e.sparkSession
    import s.implicits._
    var cents: Seq[(Long, Seq[Double], Double)] =
      e.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id"), col("emb"), col("norm")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    var i = 0
    while (i < iters && cents.nonEmpty) {
      val centsDf = cents.toDF("c_id", "c_emb", "c_norm")
      val means = CentroidAssign.nearest(e, centsDf, carry = Seq("emb"))
        .select(col("c_id"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("c_id"), col("pos")).agg(avg(col("v")).as("m"))
        .collect()
      // an emptied cell drops out (standard Lloyd degeneracy; k only shrinks)
      cents = means.groupBy(_.getLong(0)).toSeq.map { case (cid, rows) =>
        val emb = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        (cid, emb, math.sqrt(dotSeq(emb, emb)))
      }.sortBy(_._1)
      i += 1
    }
    cents.toDF("c_id", "c_emb", "c_norm")
  }

  /** IVF top-k with Lloyd-trained centroids — the production IVF shape
    * (train the quantizer, then probe): [[kmeansCentroids]] over the
    * corpus, then [[ivfSearch]] with the trained cells. Quality pinned by
    * AnnRecallSpec against a01's exact top-k.
    */
  def ivfKnnTrained(s: SparkSession, dir: String, k: Int = 16,
      iters: Int = 2, nProbes: Int = 2, topK: Int = 10): DataFrame = {
    val e = embTable(s, dir)
    // materialize the k trained rows once: ivfSearch references the
    // centroid frame twice, and each uncached reference would replay the
    // full Lloyd lineage (iters corpus-wide assignments) per use
    val cents = kmeansCentroids(e, k, iters).cache()
    cents.count()
    val out = ivfSearch(e, cents, nProbes, topK).localCheckpoint(true)
    Seq(cents, e).foreach(_.unpersist(blocking = false))
    out
  }

  /** IVF-Flat shape (the other standard ANN scale path next to a02's
    * LSH): a deterministic coarse quantizer — the first 16 vectors act as
    * centroids (seeded, no k-means iterations, so the DuckDB oracle can
    * replicate it exactly) — assigns every vector to its nearest centroid
    * by cosine; each query probes its 2 nearest centroids and scores
    * exactly ONLY the vectors in those cells. At 100 TB: assignment is
    * one broadcast join + max_by (no shuffle of the big side beyond the
    * cell groupBy), and search touches 2/16 of the corpus per query
    * instead of all of it. The Lloyd-trained variant of the same search
    * is [[ivfKnnTrained]].
    *
    * Retrieval quality (pinned by AnnRecallSpec): 2-probe of 16 cells
    * holds mean recall@10 ≥ 0.7 vs a01's exact top-k on the synthetic
    * embeddings (measured 0.82 at sf0.001) while scoring ~2/16 of the
    * corpus — raise probes for higher recall at linear scoring cost.
    */
  val a03 = QueryDef(
    "a03_ivf_knn",
    "IVF coarse-quantized cosine top-k (seeded centroids, 2 probes)",
    (s, dir) => {
      val e = embTable(s, dir)
      // ONE driver round-trip for the whole seeded model (r18): the 16
      // seed rows are centroids AND query panel; assignment, probe pick
      // and scoring all derive from this collect (r17 paid a separate
      // collect inside the assignment plus probe/query subtrees over the
      // cached corpus).
      val seeds = collectSeeds(e, 16)
      // materialize the small top-k result, then release the corpus-sized
      // embTable cache (r10 review: the hygiene fix freed only the k-row
      // frames while the corpus cache accumulated per call)
      val out = ivfSearchSeeded(e, seeds).localCheckpoint(true)
      e.unpersist(blocking = false)
      out
    },
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings),
      n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS norm FROM e),
      seeds AS (SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm FROM n WHERE vec_id < 16),
      assign AS (SELECT vec_id, c_id FROM (
          SELECT v.vec_id, s.c_id,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.emb, s.c_emb) / (v.norm * s.c_norm) DESC, s.c_id) AS rn
          FROM n v CROSS JOIN seeds s) t WHERE rn = 1),
      q AS (SELECT vec_id AS q_id, emb AS q_emb, norm AS q_norm FROM n WHERE vec_id < 5),
      probes AS (SELECT q_id, c_id FROM (
          SELECT qq.q_id, s.c_id,
                 row_number() OVER (PARTITION BY qq.q_id
                   ORDER BY list_dot_product(qq.q_emb, s.c_emb) / (qq.q_norm * s.c_norm) DESC, s.c_id) AS rn
          FROM q qq CROSS JOIN seeds s) t WHERE rn <= 2),
      cand AS (SELECT q_id, vec_id FROM probes JOIN assign USING (c_id) WHERE vec_id >= 5),
      sc AS (SELECT c.q_id, c.vec_id,
               list_dot_product(qq.q_emb, v.emb) / (qq.q_norm * v.norm) AS sim
             FROM cand c JOIN q qq USING (q_id) JOIN n v ON v.vec_id = c.vec_id)
      SELECT q_id, vec_id, rank, sim FROM (
        SELECT q_id, vec_id, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
        FROM sc) t
      WHERE rank <= 10 ORDER BY q_id, rank"""))

  /** Johnson–Lindenstrauss random projection — embedding COMPRESSION next
    * to the search family: project each vector onto k=8 ±1 hyperplanes
    * (the same md5-derived sign matrix a02/a04 binarize) and scale by
    * 1/sqrt(k), preserving pairwise distances to within the JL bound.
    * The shape that feeds a cheap pre-filter stage (score in 8-d, rescore
    * survivors in full-d) or shrinks an embedding store ~8x at rest.
    *
    * Per row this is k sequential-fold dot products ([[graft.functions.
    * VecDot]]) and one multiply — a narrow map with no shuffle at all, so
    * it streams at scan speed at 100 TB. Every op is bit-deterministic
    * (the fold is sequential; ±1 multiplies and the constant scale are
    * exact IEEE ops), which is why the gate hash-oracles real doubles
    * against DuckDB's list_dot_product rather than pinning invariants.
    */
  val a05 = QueryDef(
    "a05_jl_project",
    "Johnson-Lindenstrauss +-1 projection to 8 dims (1/sqrt(k) scale)",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      val maxDim = e.select(size(col("emb"))).take(1)
        .headOption.map(_.getInt(0)).getOrElse(0)
      val scale = lit(1.0 / math.sqrt(8.0))
      val pCols = (0 until 8).map { p =>
        val row = typedlit((0 until maxDim).map(d => planeSign(p, d)))
        (vecDot(col("emb"), row) * scale).as(s"p$p")
      }
      e.select(col("vec_id") +: pCols: _*).orderBy(col("vec_id"))
    },
    Some {
      val pExprs = (0 until 8).map { p =>
        s"""list_dot_product(emb, list_transform(range(len(emb)), d ->
              CASE WHEN substring(md5('$p' || '_' || CAST(d AS VARCHAR)), 1, 1) < '8'
                   THEN 1.0 ELSE -1.0 END)) * (1.0 / sqrt(8.0)) AS p$p"""
      }.mkString(",\n             ")
      s"""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings)
        SELECT vec_id,
             $pExprs
        FROM e ORDER BY vec_id"""
    })

  /** Product quantization + asymmetric distance (ADC) top-k — the
    * billion-scale MEMORY path the IVF/LSH gates don't cover: each
    * 64-dim vector compresses to eight 4-bit codes (one argmin per 8-dim
    * subspace against a 16-entry codebook), and queries score candidates
    * WITHOUT decompressing — the score is a sum of 8 codebook dot
    * products selected by code. This is how an embedding store shrinks
    * ~64× to fit hot memory at corpus scale; production pairs it with
    * the a03 IVF cells (IVF-PQ) so ADC only runs inside probed cells.
    *
    * Gate conventions: codebook = subvectors of the a03 seeds
    * (`vec_id < 16`), encode ties to the smallest code, queries are
    * `vec_id < 5` scored against the `≥ 5` corpus. Every distance/dot is
    * a bit-exact `vec_dot` fold; the 8-term ADC sum is aggregation-
    * ordered so it lands under ROUND(…, 6) (the t18/g04 float
    * convention) before the rank window, whose tie-break is vec_id.
    */
  val a06 = QueryDef(
    "a06_pq_adc",
    "product-quantization ADC top-k (8x8-dim subspaces, 16 seeded codes)",
    (s, dir) => {
      // r18 (guide §2.4, the r17 encode-inline applied to the gate body
      // it skipped): the old form joined every corpus subvector against
      // the broadcast 16-code table and ranked with a corpus-wide
      // (vec_id, s) window — an Exchange+sort of corpus×codes rows — and
      // re-scanned the table twice more for the codebook and query
      // subtrees. The codebook and queries are 16 rows of a model
      // constant: ONE pushdown-pruned collect yields the inline encode
      // grid ([[seededGrid]]/[[pqEncodeGrid]], the r17 a07/a11 form —
      // same d2 floats, same (d2, j) tie-break) and the ADC LUT
      // ([[adcLutRows]]: term = qs·cs with vecDot's exact summation).
      // Plan: one corpus scan + narrow codegen encode + one broadcast
      // LUT lookup + the ADC aggregate — the encode Exchange and two
      // extra table scans are gone. Values identical; the a06 oracle
      // hash is the arbiter.
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x AS double))").as("emb"))
      val subs = e
        .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("s"),
          col("emb"))
        .select(col("vec_id"), col("s"),
          expr("slice(emb, s * 8 + 1, 8)").as("xs"))
      val seedEmb = e.filter(col("vec_id") < 16)
        .select(col("vec_id"), col("emb")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      val (js, cs, n2) = seededGrid(seedEmb)
      val encJ = pqEncodeGrid(subs.filter(col("vec_id") >= 5), js, cs, n2)
        .select(col("vec_id"), col("s"), col("j"))
      val lut = adcLutRows(seedEmb.filter(_._1 < 5), js, cs)
        .toDF("q_id", "s", "j", "term")
      val scored = encJ.join(broadcast(lut), Seq("s", "j"))
        .groupBy(col("q_id"), col("vec_id"))
        .agg(round(sum(col("term")), 6).as("adc"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("adc").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("vec_id"), col("rank"), col("adc"))
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings),
      g AS (SELECT CAST(unnest(range(8)) AS INT) AS s),
      subs AS (SELECT vec_id, s, emb[s*8+1 : s*8+8] AS xs FROM e CROSS JOIN g),
      cb AS (SELECT vec_id AS j, s, xs AS cs FROM subs WHERE vec_id < 16),
      enc AS (SELECT vec_id, s, cs FROM (
          SELECT sub.vec_id, sub.s, c.cs,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY list_dot_product(sub.xs, sub.xs)
                            - 2 * list_dot_product(sub.xs, c.cs)
                            + list_dot_product(c.cs, c.cs), c.j) AS rn
          FROM subs sub JOIN cb c ON sub.s = c.s
          WHERE sub.vec_id >= 5) t WHERE rn = 1),
      q AS (SELECT vec_id AS q_id, s, xs AS qs FROM subs WHERE vec_id < 5),
      sc AS (SELECT q.q_id, enc.vec_id,
               ROUND(SUM(list_dot_product(q.qs, enc.cs)), 6) AS adc
             FROM enc JOIN q ON enc.s = q.s
             GROUP BY q.q_id, enc.vec_id)
      SELECT q_id, vec_id, rank, adc FROM (
        SELECT q_id, vec_id, adc,
               row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
        FROM sc) t
      WHERE rank <= 10 ORDER BY q_id, rank"""))

  /** Per-subspace L2 Lloyd refinement of the PQ codebooks — the trained
    * counterpart to a06's seed convention, exactly as [[kmeansCentroids]]
    * stands beside a03 (but under PQ's metric: codebooks minimize
    * EUCLIDEAN subspace distortion, so assignment is argmin d², update is
    * the per-(code, dim) mean). `subs` carries `(vec_id, s, xs)`; returns
    * `(s, j, cs)`. Deterministic structure: seeded start, fixed iteration
    * count, smallest-code tie-break; empty cells keep their previous
    * centroid (same migration argument as the cosine trainer).
    */
  def pqCodebooks(subs: DataFrame, k: Int = 16, iters: Int = 2): DataFrame = {
    // seed with the k SMALLEST vec_ids present — NOT `vec_id < k`: the
    // same degenerate-seed hazard kmeansCentroids fixed (r10 review
    // finding), which here silently trained EMPTY codebooks for any
    // offset id space (an EpochIndex epoch of appended ids, a retrain
    // over a live set whose low ids were deleted) and every downstream
    // ADC join produced zero candidates. Identical to the old convention
    // whenever ids are dense from 0.
    // r17 optimization (the kmeansCentroids shape applied per subspace,
    // guide §2.2/§2.4): the codebook is k·8 rows by definition, so each
    // Lloyd round materializes it AT THE DRIVER and the assignment runs
    // through the same inlined-literal argmin the encode uses
    // ([[codeArgmin]]) — a narrow projection, where the old broadcast
    // join + max_by shuffled every subvector row once per iteration
    // (plus replayed the whole prior-round lineage, lazily, per
    // reference). The per-(s, j, pos) mean is the only exchange left per
    // round, map-side-combined to k·8·8 rows per partition. NaN-edge
    // note: the old aggregate keyed max_by on struct(-d2, -j), which
    // ordered a NaN d2 FIRST; the argmin form orders it last, matching
    // the encode window's semantics ([[pqEncode]]) — the two paths now
    // share one ordering definition (finite data is unaffected; trained
    // floats were never hash-pinned).
    val s0 = subs.sparkSession
    import s0.implicits._
    val seedIds = subs.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k)
    var cb: Seq[(Long, Int, Seq[Double])] =
      subs.join(broadcast(seedIds), Seq("vec_id"))
        .select(col("vec_id").as("j"), col("s"), col("xs")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2))).toSeq
    var i = 0
    while (i < iters && cb.nonEmpty) {
      val cbDf = cb.toDF("j", "s", "cs")
      val means = collectCodebook(cbDf) match {
        case Some((js, cs, n2)) =>
          subs.withColumn("__best", codeArgmin(js, cs, n2))
            .select(col("s"), col("__best.j").as("j"),
              posexplode(col("xs")).as(Seq("pos", "v")))
        case None => // oversized/ragged codebook: broadcast-join argmin
          subs.join(broadcast(cbDf), Seq("s"))
            .withColumn("d2",
              vecDot(col("xs"), col("xs")) - lit(2) * vecDot(col("xs"), col("cs"))
                + vecDot(col("cs"), col("cs")))
            .groupBy(col("vec_id"), col("s"))
            .agg(min_by(col("j"), struct(col("d2"), col("j"))).as("j"),
              first(col("xs")).as("xs"))
            .select(col("s"), col("j"), posexplode(col("xs")).as(Seq("pos", "v")))
      }
      val trained: Map[(Long, Int), Seq[Double]] = means
        .groupBy(col("s"), col("j"), col("pos")).agg(avg(col("v")).as("m"))
        .collect()
        .groupBy(r => (r.getLong(1), r.getInt(0)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
        }
      // empty cells (no vectors assigned) keep their previous centroid
      cb = cb.map { case (j, si, prev) =>
        (j, si, trained.getOrElse((j, si), prev))
      }
      i += 1
    }
    cb.toDF("j", "s", "cs")
  }

  /** a06's search with trained codebooks: [[pqCodebooks]] replaces the
    * seeded table, everything downstream identical. Recall lift pinned
    * in AnnRecallSpec.
    */
  def pqAdcTrained(s: SparkSession, dir: String, k: Int = 16,
                   iters: Int = 2, topK: Int = 10): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("emb"))
    val subs = e
      .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("s"),
        col("emb"))
      .select(col("vec_id"), col("s"),
        expr("slice(emb, s * 8 + 1, 8)").as("xs"))
      .cache()
    subs.count() // single fill: codebook training + encode + queries
    val cb = pqCodebooks(subs, k).cache()
    cb.count() // materialize: ADC references it twice per downstream use
    // r17: the same encode [[pqEncode]] performs (argmin d2, ties to the
    // smallest j) — the inline window duplicated it; the shared form is
    // the narrow inlined-codebook projection, no Exchange
    val enc = pqEncode(subs.filter(col("vec_id") >= 5), cb)
      .select(col("vec_id"), col("s"), col("cs"))
    val q = subs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("s"), col("xs").as("qs"))
    val scored = enc.join(broadcast(q), Seq("s"))
      .withColumn("term", vecDot(col("qs"), col("cs")))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("term")), 6).as("adc"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    // materialize the (queries × topK)-row result, then release the cached
    // sub-vector table and codebook (r9 ADVICE session-cache hygiene)
    val out = scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("rank"), col("adc"))
      .orderBy(col("q_id"), col("rank"))
      .localCheckpoint(true)
    Seq(subs, cb).foreach(_.unpersist(blocking = false))
    out
  }

  /** IVF-PQ — the production pairing the a03/a06 docs point at: the
    * coarse quantizer prunes candidates to the probed cells (a03's
    * assignment + probe front half) and PQ codes score those candidates
    * by ADC (a06's back half), so FULL-PRECISION corpus vectors never
    * enter the search path — cells bound the work, codes bound the
    * memory, which is exactly how billion-vector serving fits a RAM
    * budget. Same conventions throughout: seeded cells and codebooks,
    * smallest-id ties, queries `vec_id < 5` vs the `≥ 5` corpus.
    */
  def ivfPqKnn(s: SparkSession, dir: String, kCells: Int = 16,
               nProbes: Int = 2, topK: Int = 10): DataFrame = {
    val e = embTable(s, dir)
    val scored = ivfPqAdcScored(e, kCells, nProbes)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val out = scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("rank"), col("adc"))
      .orderBy(col("q_id"), col("rank"))
      .localCheckpoint(true)
    e.unpersist(blocking = false)
    out
  }

  /** The IVF-PQ candidate scoring shared by [[ivfPqKnn]] and
    * [[ivfPqKnnRefined]]: probe cells, PQ-encode the corpus side, ADC
    * every in-cell candidate. Returns `(q_id, vec_id, adc)` — rounded
    * 6-dp before any rank window, the a06 float convention.
    *
    * r18 (r17 VERDICT Next #4/#5): ONE seed-panel collect feeds the
    * centroids, the probe pick, the codebook grid AND the ADC LUT —
    * r17's chain paid a collect in the assignment plus one in
    * [[collectCodebook]]; the scoring join (codes ⋈ codebook ⋈ query-
    * subvectors + per-row vecDot) collapses to one broadcast LUT lookup
    * ([[adcScoreLut]]). The seeded queries (vec_id < 5) are a subset of
    * the seeds (vec_id < kCells ≥ 16), so no second panel read exists.
    */
  private[operators] def ivfPqAdcScored(e: DataFrame, kCells: Int,
                             nProbes: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    // one collect covers both conventions: cells are vec_id < kCells,
    // the codebook is vec_id < 16 regardless of kCells
    val seeds = collectSeeds(e, math.max(kCells, 16))
    val cells = seeds.filter(_._1 < kCells)
    val qs = seeds.filter(_._1 < 5)
    val probes = probeRowsOf(qs, cells, nProbes).toDF("q_id", "c_id")
    val cand = broadcast(probes)
      .join(CentroidAssign.nearestOf(e, cells), Seq("c_id"))
      .filter(col("vec_id") >= 5)
      .select(col("q_id"), col("vec_id"))
    // the codebook convention is vec_id < 16 regardless of kCells
    val (js, cs, n2) = seededGrid(seeds.filter(_._1 < 16).map(t => (t._1, t._2)))
    val encJ = pqEncodeGrid(subvectors(e).filter(col("vec_id") >= 5), js, cs, n2)
      .select(col("vec_id"), col("s"), col("j"))
    val lut = adcLutRows(qs.map(t => (t._1, t._2)), js, cs)
      .toDF("q_id", "s", "j", "term")
    adcScoreLut(cand, encJ, lut)
  }

  // ---- factored IVF-PQ building blocks, shared verbatim with the
  // [[IndexStore]] persisted-index build + query paths (a11's parity
  // contract: the at-rest index must hold exactly what this in-memory
  // chain computes).

  /** a03/a06/a07 seeded-centroid convention: `vec_id < kCells`. */
  private[operators] def seededCents(e: DataFrame, kCells: Int): DataFrame =
    e.filter(col("vec_id") < kCells)
      .select(col("vec_id").as("c_id"), col("emb").as("c_emb"),
        col("norm").as("c_norm"))

  /** The 8×8-dim subvector explode of an (vec_id, emb) frame. */
  private[operators] def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("s"),
        col("emb"))
      .select(col("vec_id"), col("s"),
        expr("slice(emb, s * 8 + 1, 8)").as("xs"))

  /** a06's seeded codebook: subvectors of `vec_id < 16` as the 16 codes. */
  private[operators] def seededCodebook(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("j"), col("s"), col("xs").as("cs"))

  /** Driver-side dot product with [[graft.functions.ExpressionHelpers.vecDot]]'s
    * exact summation order — bit-identical, so literals precomputed here
    * substitute for the Spark expression inside hash-gated plans.
    */
  private def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Collected PQ codebook as an inlinable grid: code ids sorted asc,
    * centroids and their squared norms indexed [code][subspace]. None
    * when the grid is incomplete (a code missing some subspace) or too
    * large to inline as one expression tree — the caller then takes the
    * broadcast-join form. Bounds (r17 ADVICE doc alignment): the inline
    * cap is 64 CODES — per row the argmin is one struct candidate per
    * code, each with two vecDots, so 64 codes is where the codegen'd
    * expression tree stays comfortably under the JVM method-size limit;
    * this engine's 4-bit family (16 codes) always inlines, while a
    * 65–256-code (7/8-bit) codebook takes the broadcast min_by fallback —
    * value-identical, one map-side-combined shuffle instead of zero.
    * Codebook size is a model constant, not a data size, so which path
    * runs is fixed per deployment, not per corpus scale.
    */
  private def collectCodebook(cb: DataFrame)
      : Option[(Array[Long], Array[Array[Seq[Double]]], Array[Array[Double]])] = {
    val rows = cb.select(col("j").cast("long"), col("s").cast("int"), col("cs"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2)))
    if (rows.isEmpty) return None
    val js = rows.map(_._1).distinct.sorted
    val sMax = rows.map(_._2).max
    if (js.length > 64 || sMax > 63 || rows.exists(_._2 < 0)) return None
    val jIdx = js.zipWithIndex.toMap
    val cs = Array.fill(js.length)(Array.fill[Seq[Double]](sMax + 1)(null))
    rows.foreach { case (j, si, x) => cs(jIdx(j))(si) = x }
    if (cs.exists(_.exists(_ == null))) return None // incomplete grid
    Some((js, cs, cs.map(_.map(x => dotSeq(x, x)))))
  }

  /** Per-row argmin over an INLINED codebook for a `(s, xs)` row: one
    * candidate struct (d2, j, ji) per code — d2 in exactly the join
    * form's float grouping ((xs·xs − 2·xs·cs) + cs·cs, the cs·cs term a
    * driver-precomputed literal with [[dotSeq]]'s identical summation) —
    * and `least` picks min (d2, j) under the same interpreted ordering
    * the rank window used (nulls first, NaN last, ties to the smallest
    * code id). `ji` rides along so the caller can decode `cs` from the
    * same literal grid.
    */
  private def codeArgmin(js: Array[Long], cs: Array[Array[Seq[Double]]],
      n2: Array[Array[Double]]): Column = {
    val xsxs = vecDot(col("xs"), col("xs"))
    val cands = js.indices.map { ji =>
      struct(
        (xsxs - lit(2) * vecDot(col("xs"),
            element_at(typedLit(cs(ji).toSeq), col("s") + 1))
          + element_at(typedLit(n2(ji).toSeq), col("s") + 1)).as("d2"),
        lit(js(ji)).as("j"),
        lit(ji).as("ji"))
    }
    if (cands.size == 1) cands.head else least(cands: _*)
  }

  /** PQ-encode each (vec_id, s, xs) row against codebook `cb`: argmin L2,
    * ties to the smallest code j. Keeps BOTH the code id `j` (what an
    * at-rest index stores — the 64×-compression story) and the decoded
    * centroid `cs` (what ADC consumes directly).
    *
    * r17 optimization (guide §2.4): a codebook is a model CONSTANT
    * (16–256 codes × 8 subspaces), so the encode is logically a map —
    * the codebook is collected and inlined, and the whole encode becomes
    * one narrow codegen projection with ZERO shuffle. The pre-r17 form
    * (broadcast join × |codes|, then a corpus-wide rank window — a full
    * Exchange+sort of corpus × codes rows) survives as the fallback for
    * oversized/incomplete codebooks, upgraded from the window to a
    * map-side-combining min_by (16× fewer shuffled rows, no sort).
    * Value-identical either way: same d2 floats, same (d2, j) ordering.
    */
  private[operators] def pqEncode(subs: DataFrame, cb: DataFrame): DataFrame =
    collectCodebook(cb) match {
      case Some((js, cs, n2)) => pqEncodeGrid(subs, js, cs, n2)
      case None =>
        subs.join(broadcast(cb), Seq("s"))
          .withColumn("d2",
            vecDot(col("xs"), col("xs")) - lit(2) * vecDot(col("xs"), col("cs"))
              + vecDot(col("cs"), col("cs")))
          .groupBy(col("vec_id"), col("s"))
          .agg(min_by(struct(col("j"), col("cs")),
            struct(col("d2"), col("j"))).as("__b"))
          .select(col("vec_id"), col("s"), col("__b.j").as("j"),
            col("__b.cs").as("cs"))
    }

  /** The inline-encode body from a PRE-COLLECTED grid (r18): callers that
    * already hold the grid (the seeded gates derive it from one seed-
    * panel collect — [[seededGrid]]) skip [[collectCodebook]]'s driver
    * round-trip entirely.
    */
  private def pqEncodeGrid(subs: DataFrame, js: Array[Long],
      cs: Array[Array[Seq[Double]]], n2: Array[Array[Double]]): DataFrame = {
    val csLit = typedLit(cs.map(_.toSeq).toSeq) // [code][subspace] -> cs
    subs
      // behavior parity with the join fallback on RAGGED input (r17
      // ADVICE): a subs row whose subspace id exceeds the collected
      // grid was silently DROPPED by the inner join; without this
      // filter the inline element_at would null/throw (ANSI) on it.
      // Unreachable under the fixed 8-subspace contract — the
      // predicate codegens to two comparisons per row.
      .filter(col("s") >= 0 && col("s") < lit(cs.head.length))
      .withColumn("__best", codeArgmin(js, cs, n2))
      .select(col("vec_id"), col("s"), col("__best.j").as("j"),
        element_at(element_at(csLit, col("__best.ji") + 1),
          col("s") + 1).as("cs"))
  }

  /** The seeded codebook as [[collectCodebook]]'s grid shape, SLICED
    * driver-side from collected seed embeddings — the subvector slice
    * `emb.slice(s·8, s·8+8)` is exactly what `slice(emb, s*8+1, 8)`
    * yields, so the grid is bit-identical to collecting
    * [[seededCodebook]] while costing zero extra jobs.
    */
  private def seededGrid(seeds: Seq[(Long, Seq[Double])])
      : (Array[Long], Array[Array[Seq[Double]]], Array[Array[Double]]) = {
    val byId = seeds.toMap
    val js = seeds.map(_._1).distinct.sorted.toArray
    val cs = js.map(j => Array.tabulate(8)(si => byId(j).slice(si * 8, si * 8 + 8)))
    (js, cs, cs.map(_.map(x => dotSeq(x, x))))
  }

  /** Driver-side ADC lookup table (r17 VERDICT Next #4 — the classic
    * |Q|×8×|codes| LUT): term(q, s, j) = qsubs(q,s)·cs(j,s) with
    * [[dotSeq]]'s exact vecDot summation order, so every term is
    * bit-identical to the join form's `vecDot(qs, cs)`. Scoring then
    * needs ONE broadcast join of |Q|·8·|codes| literal rows instead of
    * codebook ⋈ query-subvector joins plus a per-row dot product.
    */
  private def adcLutRows(qs: Seq[(Long, Seq[Double])], js: Array[Long],
      cs: Array[Array[Seq[Double]]]): Seq[(Long, Int, Long, Double)] =
    for {
      (qid, qemb) <- qs
      si <- 0 until 8
      ji <- js.indices.toSeq
    } yield (qid, si, js(ji), dotSeq(qemb.slice(si * 8, si * 8 + 8), cs(ji)(si)))

  /** [[adcLutRows]] from raw (j, s, cs) codebook rows — the
    * [[IndexStore]] query path's shape, where the codebook is a parquet
    * table (possibly trained, any id set) rather than a seeded grid.
    */
  private[operators] def adcLutFromRows(qs: Seq[(Long, Seq[Double])],
      cb: Seq[(Long, Int, Seq[Double])]): Seq[(Long, Int, Long, Double)] =
    for {
      (qid, qemb) <- qs
      (j, si, csv) <- cb
    } yield (qid, si, j, dotSeq(qemb.slice(si * 8, si * 8 + 8), csv))

  /** ADC over candidates via the literal LUT: Σ_s term(q, s, code) per
    * (q_id, vec_id), ROUND 6 before any rank window — the [[adcScore]]
    * contract with the scoring join collapsed to one broadcast lookup.
    * `encJ` carries (vec_id, s, j); the join multiset is identical to
    * the cb⋈qsubs form (exactly one LUT row per (q_id, s, j)), so the
    * 8-term sums see the same values in the same partition order.
    */
  private[operators] def adcScoreLut(cand: DataFrame, encJ: DataFrame,
      lut: DataFrame): DataFrame =
    cand.join(encJ, Seq("vec_id"))
      .join(broadcast(lut), Seq("q_id", "s", "j"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("term")), 6).as("adc"))

  /** Query-side subvectors (vec_id < 5, the gate query convention). */
  private[operators] def querySubs(subs: DataFrame): DataFrame =
    subs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("s"), col("xs").as("qs"))

  /** ADC over candidates: Σ_s qs·cs per (q_id, vec_id), ROUND 6 (the a06
    * float convention) before any rank window.
    */
  private[operators] def adcScore(cand: DataFrame, enc: DataFrame,
                                  qsubs: DataFrame): DataFrame =
    cand.join(enc, Seq("vec_id"))
      .join(broadcast(qsubs), Seq("q_id", "s"))
      .withColumn("term", vecDot(col("qs"), col("cs")))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(round(sum(col("term")), 6).as("adc"))

  /** IVF-PQ with the standard REFINE step — the production retrieval
    * quality path (r9 VERDICT item 4): ADC ranks the probed candidates,
    * the top `refineFactor × topK` per query form a shortlist, and ONLY
    * those rows fetch their full-precision vectors (a vec_id equi-join —
    * `shortlist ≤ queries × refineFactor × topK` rows, never the corpus)
    * for an exact-cosine re-rank. This recovers the neighbours ADC's
    * 64×-compressed codes mis-rank while keeping the memory story: the
    * search path touches codes only; full vectors are point-fetched for
    * a bounded shortlist, exactly how a billion-vector store serves from
    * a PQ-resident index with refine-from-disk. Recall floor ≥ 0.7
    * mean / ≥ 0.5 min (the a03/a04 convention) pinned in AnnRecallSpec —
    * measured 0.88/0.80 at sf0.001 vs unrefined IVF-PQ's 0.46/0.30,
    * ABOVE full-precision 2-probe IVF's 0.82 (the bigger shortlist
    * reaches past cell-boundary mistakes the 2-probe search can't).
    * Tuning note from the sweep: shortlist size buys more than probe
    * count here (4 probes × 8·topK = 0.88; 8 probes × 8·topK = 0.84 —
    * extra cells add ADC distractors that crowd the shortlist).
    *
    * Deterministic end-to-end (seeded cells + codebooks, 6-dp rounds
    * before every rank window, vec_id tie-breaks), so the whole
    * composition is oracle-replayable — gate a07.
    */
  def ivfPqKnnRefined(s: SparkSession, dir: String, kCells: Int = 16,
                      nProbes: Int = 4, topK: Int = 10,
                      refineFactor: Int = 8): DataFrame = {
    val e = embTable(s, dir)
    val out = refineAdcShortlist(ivfPqAdcScored(e, kCells, nProbes), e,
      topK, refineFactor)
    e.unpersist(blocking = false)
    out
  }

  /** The refine back half shared with the [[IndexStore]] query path:
    * top `refineFactor × topK` ADC candidates per query point-fetch their
    * full-precision vectors from `e` for an exact-cosine re-rank.
    */
  private[operators] def refineAdcShortlist(scored: DataFrame, e: DataFrame,
      topK: Int, refineFactor: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val shortlist = scored.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= topK * refineFactor)
      .select(col("q_id"), col("vec_id"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("norm").as("q_norm"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    shortlist.join(e, Seq("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("cos", round(
        vecDot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("rank"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
      .localCheckpoint(true)
  }

  /** a07's full DuckDB replica, parameterized on an extra candidate-side
    * predicate (`candExtra`, ANDed into the cand CTE): the IVF-PQ delete
    * gate (IndexStore a14) needs "rebuild-without-vecs" semantics where
    * ONLY the candidate corpus shrinks — the frozen quantizer/codebooks
    * still derive from the full table, exactly as tombstone deletes leave
    * them on disk.
    */
  private[graft] def ivfPqRefineOracleSql(candExtra: String = ""): String =
    s"""WITH e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings),
      n AS (SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS norm FROM e),
      cents AS (SELECT vec_id AS c_id, emb AS c_emb, norm AS c_norm
                FROM n WHERE vec_id < 16),
      assign AS (SELECT vec_id, c_id FROM (
          SELECT v.vec_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.emb, c.c_emb)
                            / (v.norm * c.c_norm) DESC, c.c_id) AS rn
          FROM n v CROSS JOIN cents c) t WHERE rn = 1),
      probes AS (SELECT q_id, c_id FROM (
          SELECT v.vec_id AS q_id, c.c_id,
                 row_number() OVER (PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.emb, c.c_emb)
                            / (v.norm * c.c_norm) DESC, c.c_id) AS rn
          FROM n v CROSS JOIN cents c WHERE v.vec_id < 5) t
        WHERE rn <= 4),
      cand AS (SELECT p.q_id, a.vec_id
               FROM probes p JOIN assign a ON p.c_id = a.c_id
               WHERE a.vec_id >= 5$candExtra),
      g AS (SELECT CAST(unnest(range(8)) AS INT) AS s),
      subs AS (SELECT vec_id, s, emb[s*8+1 : s*8+8] AS xs FROM e CROSS JOIN g),
      cb AS (SELECT vec_id AS j, s, xs AS cs FROM subs WHERE vec_id < 16),
      enc AS (SELECT vec_id, s, cs FROM (
          SELECT sub.vec_id, sub.s, c.cs,
                 row_number() OVER (PARTITION BY sub.vec_id, sub.s
                   ORDER BY list_dot_product(sub.xs, sub.xs)
                            - 2 * list_dot_product(sub.xs, c.cs)
                            + list_dot_product(c.cs, c.cs), c.j) AS rn
          FROM subs sub JOIN cb c ON sub.s = c.s
          WHERE sub.vec_id >= 5) t WHERE rn = 1),
      qsubs AS (SELECT vec_id AS q_id, s, xs AS qs FROM subs WHERE vec_id < 5),
      sc AS (SELECT cand.q_id, cand.vec_id,
               ROUND(SUM(list_dot_product(qsubs.qs, enc.cs)), 6) AS adc
             FROM cand JOIN enc ON cand.vec_id = enc.vec_id
                       JOIN qsubs ON qsubs.q_id = cand.q_id AND qsubs.s = enc.s
             GROUP BY cand.q_id, cand.vec_id),
      shortlist AS (SELECT q_id, vec_id FROM (
          SELECT q_id, vec_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY adc DESC, vec_id) AS rn
          FROM sc) t WHERE rn <= 80),
      re AS (SELECT s2.q_id, s2.vec_id,
               ROUND(list_dot_product(v.emb, qv.emb) / (v.norm * qv.norm), 6)
                 AS cos
             FROM shortlist s2
             JOIN n v ON v.vec_id = s2.vec_id
             JOIN n qv ON qv.vec_id = s2.q_id)
      SELECT q_id, vec_id, rank, cos FROM (
        SELECT q_id, vec_id, cos,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
        FROM re) t
      WHERE rank <= 10 ORDER BY q_id, rank"""

  val a07 = QueryDef(
    "a07_ivfpq_refine",
    "IVF-PQ + exact re-rank of the ADC shortlist (4 probes, 8x refine)",
    (s, dir) => ivfPqKnnRefined(s, dir),
    Some(ivfPqRefineOracleSql()))

  val all: Seq[QueryDef] = Seq(a01, a02, a03, a04, a05, a06, a07)
}

/** The ONE nearest-centroid argmax for the whole centroid family —
  * AnnOps' IVF candidate generation (a03/a06/a07) AND DedupOps' SemDeDup
  * / diverse-sample assignment (d11/d14): cosine against a broadcast
  * centroid table (`c_id, c_emb, c_norm`), ties to the smallest c_id.
  * All five gates' oracles assume this single convention, so a change to
  * the tie-break / norm handling made here reaches every consumer by
  * construction — the r10 review found the definition duplicated across
  * the two modules, one as max_by, one as a window, silently free to
  * drift.
  *
  * `carry` names input columns to keep on the assigned rows (the dedup
  * consumers need emb+norm for their within-cluster pairwise pass). The
  * aggregate form (max_by over a carrying struct) gets map-side partial
  * aggregation — one shuffle of pre-reduced groups instead of the window
  * form's full sort.
  */
private[operators] object CentroidAssign {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._
  import graft.functions.GraftFunctions.vecDot

  /** Inline cap = 128 CENTROIDS (r17 ADVICE doc alignment): the inlined
    * form costs k vecDots per row in one codegen projection, and past
    * ~128 candidates the expression tree pushes the JVM method-size
    * limit; the aggregate form's broadcast shape is also simply right
    * once the quantizer stops being a handful of rows. The bound is a
    * codegen constant, independent of corpus scale — this engine's gate
    * quantizers (k = 16) and production coarse quantizers up to 128
    * cells assign with ZERO shuffle; larger ones take [[nearestAgg]]
    * (value-identical, one map-side-combined shuffle).
    */
  private val inlineK = 128

  /** Nearest centroid per row (r17 optimization, guide §2.4 "remove
    * shuffles outright"): a coarse quantizer is k << corpus by
    * definition, so the centroid table is COLLECTED (k rows) and inlined
    * as k candidate structs per row — `greatest` over
    * struct(csim, -c_id, c_id) picks max csim with ties to the smallest
    * c_id under exactly the interpreted struct ordering max_by used
    * (same TypeUtils ordering: NaN greatest, null-field smallest), so the
    * assignment is VALUE-IDENTICAL to the aggregate form while the plan
    * is one narrow whole-stage-codegen projection: the corpus-bytes
    * Exchange the groupBy(vec_id) paid (every emb under `carry` rode the
    * shuffle — d11's assignment shuffled the corpus embeddings) is gone.
    * The pre-r17 aggregate form survives as [[nearestAgg]] for quantizers
    * past [[inlineK]].
    *
    * API contract (r17 ADVICE): `cents` is COLLECTED EAGERLY at
    * DataFrame-construction time — constructing the returned frame
    * triggers a Spark job over `cents`, so the centroid frame must be
    * cheap: materialized (cache+count), a pushdown-prunable scan, or a
    * local relation. Passing an uncached trained-centroid frame replays
    * its full lineage here and again at any other reference.
    */
  def nearest(e: DataFrame, cents: DataFrame,
              carry: Seq[String] = Nil): DataFrame = {
    val rows = cents
      .select(col("c_id").cast("long"), col("c_emb"), col("c_norm")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    nearestOf(e, rows, carry)
  }

  /** [[nearest]] from PRE-COLLECTED centroid rows (r18, r17 VERDICT Next
    * #5): the seeded gates derive every model table from ONE collected
    * seed panel, so the assignment must not pay a second driver
    * round-trip to re-collect the same k rows. Same inline construction
    * and [[inlineK]]/empty fallbacks as [[nearest]].
    */
  private[operators] def nearestOf(e: DataFrame,
      rows: Seq[(Long, Seq[Double], Double)],
      carry: Seq[String] = Nil): DataFrame = {
    if (rows.isEmpty || rows.length > inlineK) {
      val s = e.sparkSession
      import s.implicits._
      nearestAgg(e, rows.toDF("c_id", "c_emb", "c_norm"), carry)
    } else {
      val cands: Seq[Column] = rows.map { case (cid, cemb, cnorm) =>
        struct(
          (vecDot(col("emb"), typedLit(cemb))
            / (col("norm") * lit(cnorm))).as("csim"),
          lit(-cid).as("neg"),
          lit(cid).as("c_id"))
      }
      val best = if (cands.size == 1) cands.head else greatest(cands: _*)
      e.select(col("vec_id") +: best.getField("c_id").as("c_id") +:
        carry.map(col): _*)
    }
  }

  /** The pre-r17 aggregate form: cross join against the broadcast
    * centroid table, max_by with map-side partial aggregation. One
    * shuffle of one row per vector (plus every carried column).
    */
  private def nearestAgg(e: DataFrame, cents: DataFrame,
              carry: Seq[String]): DataFrame = {
    val kept = "c_id" +: carry
    e.crossJoin(broadcast(cents))
      .withColumn("__csim",
        vecDot(col("emb"), col("c_emb")) / (col("norm") * col("c_norm")))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(kept.map(col): _*),
        struct(col("__csim"), -col("c_id"))).as("__best"))
      .select(col("vec_id") +: kept.map(c => col(s"__best.$c").as(c)): _*)
  }
}
