package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over an `array<float>` embedding column.
  *
  * Two paths, same output shape:
  *   - brute-force cosine top-k — exact; the baseline and the verifier.
  *     Scale shape: broadcast the (small) query set against the (huge)
  *     corpus, per-partition partial top-k via window rank — the corpus is
  *     scanned once, never shuffled whole.
  *   - random-hyperplane LSH ANN — the 100 TB path: bucket by sign-bit
  *     sketch, search only the colliding buckets. Recall is tunable by
  *     tables x bits; candidates per query are bounded by bucket size.
  *
  * All pairwise math uses the unrolled fixed-dim primitives (codegen'd;
  * the generic higher-order forms are interpreted and ~100x slower in a
  * join hot path), with per-vector norms hoisted out of the pair loop —
  * cos(a,b) = dot/(|a|*|b|) evaluates bit-identically either way.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector. `queries` must be small
    * (it is broadcast); `corpus` can be arbitrarily large.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                     dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      norm2Native(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm2Native(col("embedding")).as("c_norm"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotNative(col("embedding"), col("q_emb")) /
          (col("c_norm") * col("q_norm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Late-interaction (MaxSim) retrieval — the multi-vector scoring rule
    * of ColBERT-style retrievers: each embedding is treated as `nTokens`
    * contiguous sub-vectors ("token" vectors), and score(q, d) =
    * Σ over q's tokens of the MAX cosine against any of d's tokens.
    * Token granularity is what late interaction buys: a doc matching two
    * of a query's facets in different passages scores on both, where the
    * pooled single-vector cosine averages them away.
    *
    * Deterministic to the bit: max is order-free, and the final score
    * adds the `nTokens` per-token maxima in FIXED column order (m0+m1+…,
    * left-to-right IEEE), never through an order-nondeterministic SUM
    * aggregate — so the DuckDB oracle reproduces the doubles exactly.
    *
    * Scale shape: the query token set (|queries| x nTokens rows) is
    * broadcast against ONE pass over the corpus token projection; the
    * per-(query, doc) reduction is a single hash aggregate emitting the
    * nTokens maxima as columns of one row, and per-query top-k is the
    * WindowGroupLimit rank. For corpus-sized query sets, route candidate
    * generation through the IVF probed-cell path over pooled vectors
    * first and MaxSim-score only the survivors — the standard
    * retrieve-then-rerank split.
    */
  def lateInteractionTopK(corpus: DataFrame, queries: DataFrame,
                          k: Int = 3, nTokens: Int = 4,
                          subDim: Int = 16): DataFrame = {
    // the whole MaxSim score is ONE codegen'd projection per pair
    // (graft.functions.MaxSim — see its scaladoc for the 16x-row /
    // extra-aggregate cost of the exploded form it replaces, and
    // MaxSimSpec for the bit-parity proof against that form)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.MaxSim.maxSim(col("embedding"), col("q_emb"),
          nTokens, subDim).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** The exploded/composed MaxSim — slice to token sub-vectors,
    * 16x pair join, per-token max aggregate, fixed-order column sum.
    * Kept as the independent reference implementation the native
    * expression is bit-parity-tested against (MaxSimSpec); the shipped
    * path is [[lateInteractionTopK]].
    */
  private[graft] def lateInteractionComposed(corpus: DataFrame,
      queries: DataFrame, k: Int = 3, nTokens: Int = 4,
      subDim: Int = 16): DataFrame = {
    def tokens(df: DataFrame, idAs: String, subAs: String,
               normAs: String): DataFrame = {
      val subs = array((0 until nTokens).map(i =>
        slice(col("embedding"), 1 + i * subDim, subDim)): _*)
      df.select(col("vec_id").as(idAs), posexplode(subs))
        .select(col(idAs), col("pos").as(s"${idAs}_tok"),
          col("col").as(subAs), norm2Native(col("col")).as(normAs))
    }
    val q = tokens(queries, "query_id", "q_sub", "q_norm")
    val c = tokens(corpus, "vec_id", "d_sub", "d_norm")
    val cand = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("query_id_tok").as("qt"),
        (dotNative(col("d_sub"), col("q_sub")) /
          (col("d_norm") * col("q_norm"))).as("cos"))
    val maxima = (0 until nTokens).map(i =>
      max(when(col("qt") === i, col("cos"))).as(s"m$i"))
    val score = (1 until nTokens).foldLeft(col("m0"): Column)(
      (acc, i) => acc + col(s"m$i"))
    val scored = cand.groupBy(col("query_id"), col("vec_id"))
      .agg(maxima.head, maxima.tail: _*)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        score.as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the k most-similar corpus vectors carrying a DIFFERENT
    * label — the "looks alike, isn't" examples an embedding model trains
    * against. A `maxCos` ceiling excludes near-duplicates (a
    * label-conflicted near-copy is label noise, not a useful negative).
    * Same bit-exact cosine as [[bruteForceTopK]] (sequential double
    * accumulation over the float32 components, so Spark and the DuckDB
    * oracle agree to the last bit). Scale shape: queries broadcast
    * against a single corpus scan, per-query top-k via a rank window
    * that WindowGroupLimit caps per partition; for corpus-sized query
    * sets swap the broadcast scan for the IVF probed-cell path — the
    * label filter composes with either.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int = 3,
                    maxCos: Double = 0.95): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("label").as("q_label"),
      col("embedding").as("q_emb"),
      norm2Native(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id"), col("label"), col("embedding"),
      norm2Native(col("embedding")).as("c_norm"))
    val scored = c.join(broadcast(q), col("label") =!= col("q_label"))
      .select(col("query_id"), col("q_label"),
        col("vec_id").as("neighbor_id"), col("label").as("neg_label"),
        (dotNative(col("embedding"), col("q_emb")) /
          (col("c_norm") * col("q_norm"))).as("cos"))
      .filter(col("cos") <= lit(maxCos))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** kNN label propagation — the auto-labeling / weak-supervision pass a
    * curation pipeline runs to extend a labeled seed set: each unlabeled
    * vector takes the MAJORITY label of its k exact nearest labeled
    * neighbors (cosine; vote ties break to the SMALLER label, fully
    * deterministic), and the held-out true labels score the propagation
    * per label — the accuracy table that decides whether the auto-labels
    * are trustworthy enough to train on.
    *
    * Exactness: the same bit-exact cosine kernel as [[bruteForceTopK]];
    * the k-boundary breaks ties on neighbor_id, votes on (count desc,
    * label asc) — every step reproducible cross-engine. Scale shape: the
    * fixture run broadcasts the query set as the exactness baseline; for
    * corpus-sized unlabeled sets route candidate generation through the
    * IVF probed-cell path ([[ivfTopKWith]]) and vote over its survivors —
    * the vote/score half composes with either retrieval.
    */
  def knnLabel(pool: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val topk = bruteForceTopK(pool, queries, k)
    val votes = topk
      .join(pool.select(col("vec_id").as("neighbor_id"),
        col("label").as("n_label")), "neighbor_id")
      .groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("n_label").asc)
    val pred = votes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("n_label").as("pred_label"))
    pred
      .join(queries.select(col("vec_id").as("query_id"), col("label")),
        "query_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        coalesce(sum(when(col("pred_label") === col("label"), 1L)), lit(0L))
          .as("n_correct"))
      .select(col("label"), col("n_vecs"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_vecs").cast("double"))
          .as("accuracy"))
  }

  /** Seeded hyperplane values — the ONE generator for the Spark plan
    * constants and the oracle-SQL literal embedding (SimilaritySuite): both
    * sides must see bit-identical doubles.
    */
  def hyperplaneValues(nBits: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Deterministic seeded hyperplanes as literal array columns (plan
    * constants — broadcast for free with the task binary).
    */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Seq[Column] =
    hyperplaneValues(nBits, dim, seed).map(v => array(v.map(lit(_)).toSeq: _*))

  /** Sign-bit LSH bucket id per vector: nBits hyperplane sign bits packed
    * into a long, for each of `tables` independent tables. Output one row
    * per (vector, table) — the index build. Pure codegen'd projection, no
    * shuffle.
    */
  def lshIndex(corpus: DataFrame, dim: Int = 64, nBits: Int = 12,
               tables: Int = 4, seed: Long = 42L): DataFrame = {
    val perTable = (0 until tables).map { t =>
      val planes = hyperplanes(nBits, dim, seed + t * 1000)
      planes.zipWithIndex.map { case (h, i) =>
        shiftleft(signBit(col("embedding"), h), i)
      }.reduce(_.bitwiseOR(_))
    }
    corpus.select(col("vec_id"), col("embedding"),
      posexplode(array(perTable: _*)).as(Seq("table_id", "bucket")))
  }

  /** ANN top-k: candidates = corpus vectors sharing any (table, bucket) with
    * the query, then exact cosine re-rank within candidates. The join is
    * keyed on (table, bucket) — never a cross join.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
              dim: Int = 64, nBits: Int = 12, tables: Int = 4,
              seed: Long = 42L): DataFrame = {
    val idx = lshIndex(corpus, dim, nBits, tables, seed)
    val qIdx = lshIndex(queries, dim, nBits, tables, seed)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("table_id"), col("bucket"))
    // dedupe candidate PAIRS on ids only — distinct over rows that carry the
    // embedding arrays would shuffle and compare the vectors themselves
    val pairs = idx.join(broadcast(qIdx.select(col("query_id"), col("table_id"), col("bucket"))),
        Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val cand = pairs
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("neighbor_id"),
        (dotNative(col("embedding"), col("q_emb")) /
          (norm2Native(col("embedding")) * norm2Native(col("q_emb")))).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Primitive-array dot with sequential index-order accumulation — the one
    * kernel all exact paths share, so results are bit-identical across them
    * (and to the column-expression form / the DuckDB oracle). Symmetric
    * bit-exactly: s += x(i)*y(i) commutes term-by-term.
    */
  private def dotArr(x: Array[Float], y: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  /** Embedding near-dup pairs: all (a,b) with cosine above threshold —
    * EXACT all-pairs, fully distributed (no driver-side materialization).
    *
    * Block-pair decomposition: every vector is assigned a block
    * b = vec_id mod `blocks`, and replicated to each unordered block pair
    * {b, p} it participates in. One shuffle keys the corpus by block pair;
    * each task then runs the pairwise kernel over just its two blocks
    * (cross-block pairs for {i, j}, i<j; within-block pairs for {i, i}).
    * Every id pair lands in exactly one group, so no dedup pass is needed.
    *
    * Scale shape: shuffled volume = `blocks` x corpus (tunable), per-task
    * memory = 2n/blocks vectors — at 100 TB pick blocks so a block fits an
    * executor core's heap; there is no driver collect and no broadcast of
    * the corpus. (The relational theta-join form plans as
    * BroadcastNestedLoopJoin and materializes two embedding arrays per
    * candidate pair — measured 96 s at 5k vectors vs <1 s for this kernel.)
    * The output is inherently O(n^2) in the worst case; past what the
    * threshold filter tames, use nearDupPairsLsh — the same predicate over
    * LSH candidates.
    *
    * Floating-point note: accumulation is sequential in index order and
    * cos = dot / (|a| * |b|) — bit-identical to the column-expression form
    * and the DuckDB oracle.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double, dim: Int = 64,
                   blocks: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .select(col("vec_id"), col("embedding"),
        pmod(col("vec_id"), lit(blocks.toLong)).cast("int").as("blk"),
        explode(sequence(lit(0), lit(blocks - 1))).as("p"))
      // unordered pair key {blk, p}: each vector reaches pair {i,j} exactly
      // once (from p = the other block), and pair {b,b} exactly once (p = blk)
      .select(col("vec_id"), col("embedding"), col("blk"),
        least(col("blk"), col("p")).as("bi"),
        greatest(col("blk"), col("p")).as("bj"))
      .as[(Long, Array[Float], Int, Int, Int)]
      .groupByKey(r => (r._4, r._5))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Long, Array[Float], Int, Int, Int)]) =>
        val (bi, bj) = key
        // bounded buffer: the two blocks of this group (~2n/blocks vectors)
        val vecs = it.map(r => (r._1, r._2, r._3)).toArray.sortBy(_._1)
        val norms = vecs.map(v => math.sqrt(dotArr(v._2, v._2)))
        Iterator.range(0, vecs.length).flatMap { i =>
          val (idA, embA, blkA) = vecs(i)
          Iterator.range(i + 1, vecs.length)
            // same-block pairs belong to this group only when bi == bj
            .filter(j => bi == bj || vecs(j)._3 != blkA)
            .map(j => (idA, vecs(j)._1, dotArr(embA, vecs(j)._2) / (norms(i) * norms(j))))
            .filter(_._3 > threshold)
        }
      }
      .toDF("id_a", "id_b", "cos")
  }

  /** IVF (inverted-file) ANN — the other classic scale path: a coarse
    * quantizer assigns every vector to its nearest of `nCells` centroids
    * (one codegen'd pass over the corpus); a query searches only the
    * `nProbe` cells nearest to it. Centroids are pluggable: seeded random
    * unit directions (data-independent — exactly reproducible by the DuckDB
    * oracle) or a distributed k-means fit (tighter cells, higher recall at
    * equal nProbe — see kmeansCentroids).
    */
  /** Unit-norm seeded centroids — ONE generator for index build, query
    * probing AND the oracle-SQL literal embedding: IVF correctness depends
    * on all sides assigning against bit-identical centroids.
    */
  def ivfCentroids(nCells: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nCells) {
      val v = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
  }

  /** Distributed k-means centroids (mllib, seeded, deterministic): the
    * training is executor-side; only the k centroid vectors — a bounded,
    * O(nCells x dim) result — ever reach the driver, where they become plan
    * constants. This is a declared training step, not a data collect.
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int = 16, seed: Long = 42L,
                      maxIter: Int = 10): Seq[Seq[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
      .persist()
    // seeded random init: k-means|| spends ~5 extra passes choosing seeds,
    // which dominates wall-clock on a prepared-index fit whose Lloyd rounds
    // are already capped; random + the same maxIter converges within the
    // gates' margins (re-measured in RecallProbe) at a fraction of the jobs
    try new KMeans().setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random").fit(feats)
      .clusterCenters.map(_.toArray.toSeq).toSeq
    finally feats.unpersist(false)
  }

  private def cellAssign(centroids: Seq[Seq[Double]]): Column = {
    // nearest centroid by dot product (vectors need not be normalized for
    // argmax vs unit centroids under cosine up to per-vector scale)
    val best = centroids.zipWithIndex.map { case (c, i) =>
      struct(dotNative(col("embedding"),
        array(c.map(lit(_)): _*).cast("array<double>")).as("score"),
        lit(i).as("cell"))
    }
    greatest(best: _*).getField("cell")
  }

  def ivfIndexWith(corpus: DataFrame, centroids: Seq[Seq[Double]]): DataFrame =
    corpus.withColumn("cell", cellAssign(centroids))

  def ivfIndex(corpus: DataFrame, dim: Int = 64, nCells: Int = 16,
               seed: Long = 42L): DataFrame =
    ivfIndexWith(corpus, ivfCentroids(nCells, dim, seed))

  /** IVF top-k against explicit centroids: probe the nProbe best cells per
    * query, exact re-rank within the probed inverted lists. Join is keyed
    * on cell — never a cross join.
    */
  /** Top-`nProbe` IVF cells for a vector, best first — an array of
    * (score, cell) structs; ties break to the HIGHER cell, matching
    * [[cellAssign]] (the rank-1 entry IS the assigned cell). Shared by
    * the batch probe join and the streaming cell router so the two
    * paths cannot drift.
    */
  def probeCells(emb: Column, centroids: Seq[Seq[Double]],
                 nProbe: Int): Column = {
    val cellScores = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(dotNative(emb,
        array(c.map(lit(_)): _*).cast("array<double>")).as("score"),
        lit(i).as("cell"))
    }: _*)
    slice(reverse(array_sort(cellScores)), 1, nProbe)
  }

  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
                  centroids: Seq[Seq[Double]], nProbe: Int): DataFrame =
    ivfTopKFromIndex(ivfIndexWith(corpus, centroids), queries, k,
      centroids, nProbe)

  /** The IVF SEARCH tail against an ALREADY-BUILT index — `idx` carries
    * (vec_id, cell, embedding), whether assigned inline ([[ivfTopKWith]])
    * or LOADED from a persisted build (the build/serve split: serve
    * never re-scans or re-assigns the corpus; the probe side still
    * computes its own cells from the same centroid literals, which is
    * request processing, not an index rebuild).
    */
  def ivfTopKFromIndex(idx: DataFrame, queries: DataFrame, k: Int,
                       centroids: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    // top-nProbe cells per query, exploded to (query, cell) probe pairs
    val qProbes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probeCells(col("embedding"), centroids, nProbe)).as("probe"))
      .select(col("query_id"), col("q_emb"), col("probe.cell").as("cell"))
    val cand = idx.join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotNative(col("embedding"), col("q_emb")) /
          (norm2Native(col("embedding")) * norm2Native(col("q_emb")))).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
              dim: Int = 64, nCells: Int = 16, nProbe: Int = 4,
              seed: Long = 42L): DataFrame =
    ivfTopKWith(corpus, queries, k, ivfCentroids(nCells, dim, seed), nProbe)

  /** IVF top-k over k-means-trained centroids — same search plumbing, cells
    * shaped to the data. Training runs Spark jobs up front (bounded output:
    * nCells centroids), so this path is for prepared indexes, not the
    * construction-time-job-free query contract (see CollectLintSpec).
    */
  def ivfTopKKmeans(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                    nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
                    maxIter: Int = 10): DataFrame =
    ivfTopKWith(corpus, queries, k, kmeansCentroids(corpus, nCells, seed, maxIter), nProbe)

  /** Product quantization (PQ) — the ANN COMPRESSION path: the embedding
    * is split into nSub subvectors, each quantized to the nearest of k
    * centroids in its own codebook, so a dim-64 float vector compresses to
    * nSub byte-sized codes (64x smaller). Search is an ADC scan: the RAW
    * query is scored against each corpus vector's RECONSTRUCTION
    * (concatenated codebook entries) — no candidate pruning; the win is
    * memory traffic, not candidate count (compose with IVF cells for
    * both). Codebooks are seeded unit-free Gaussians (k-means would
    * tighten them, same plumbing as ivfTopKKmeans) — data-independent, so
    * the DuckDB oracle reproduces encode + reconstruct + rank exactly from
    * the same literals.
    */
  /** Codebook values — ONE generator for the Spark plan constants and the
    * oracle-SQL literals: [subvector][centroid][subDim]. Values are rounded
    * to FLOAT precision: the fixtures' embeddings are float-derived, and
    * float x float products are EXACT in double (24+24 <= 53 mantissa
    * bits), so the reconstruction dot products round identically across
    * engines regardless of mul+add vs FMA kernels — full-precision doubles
    * were measured to diverge in the last ulp.
    */
  def pqCodebooks(nSub: Int, subDim: Int, k: Int,
                  seed: Long): Seq[Seq[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nSub)(Seq.fill(k)(
      Array.fill(subDim)(rng.nextGaussian().toFloat.toDouble)))
  }

  /** Code assignment for one subvector: argmin squared-L2 to the codebook,
    * computed as argmax of (x . c - |c|^2/2) — the |x|^2 term is constant
    * per row. Ties break to the higher centroid index (greatest-of-structs
    * semantics); scores are continuous doubles, so ties do not occur.
    */
  private def pqCode(sub: Column, codebook: Seq[Array[Double]]): Column = {
    val scored = codebook.zipWithIndex.map { case (c, i) =>
      val cNormHalf = c.map(x => x * x).sum / 2.0
      struct((dotNative(sub, array(c.map(lit(_)).toSeq: _*).cast("array<double>"))
        - lit(cNormHalf)).as("score"), lit(i).as("idx"))
    }
    greatest(scored: _*).getField("idx")
  }

  /** PQ-encode the corpus: one small code per subvector. */
  def pqEncode(corpus: DataFrame, dim: Int = 64, nSub: Int = 4, k: Int = 16,
               seed: Long = 42L): DataFrame = {
    require(dim % nSub == 0, s"nSub ($nSub) must divide dim ($dim)")
    val subDim = dim / nSub
    val books = pqCodebooks(nSub, subDim, k, seed)
    val codes = (0 until nSub).map { s =>
      pqCode(slice(col("embedding"), s * subDim + 1, subDim), books(s)).as(s"code_$s")
    }
    corpus.select(col("vec_id") +: codes: _*)
  }

  /** Data-fitted codebooks: per-subvector k-means (seeded mllib) — the
    * quality path: random Gaussian codebooks quantize data they were never
    * fitted to (measured recall 0.22 vs >=0.6 fitted on clustered
    * vectors). Bounded driver output: nSub x k centroids.
    */
  def pqCodebooksKmeans(corpus: DataFrame, dim: Int = 64, nSub: Int = 4,
                        k: Int = 16, seed: Long = 42L,
                        maxIter: Int = 10): Seq[Seq[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val subDim = dim / nSub
    // one cached pass over the source; the nSub subspace fits slice it
    // from memory instead of re-scanning parquet per fit
    val base = corpus.select(col("embedding").cast("array<double>").as("e"))
      .persist()
    base.count()
    // the subspace fits are independent seeded chains of TINY jobs (random
    // init + capped Lloyd rounds) — run them concurrently so the cost is one
    // chain's scheduler latency, not nSub of them. Each fit is deterministic
    // (own seed, same cached input), so thread interleaving cannot change
    // the returned codebooks.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nSub)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val fits = (0 until nSub).map { s => Future {
        val feats = base.select(array_to_vector(
          slice(col("e"), s * subDim + 1, subDim)).as("features"))
        new KMeans().setK(k).setSeed(seed + s).setMaxIter(maxIter)
          .setInitMode("random").fit(feats)
          .clusterCenters.map(_.toArray).toSeq
      }}
      Await.result(Future.sequence(fits), Duration.Inf)
    } finally {
      pool.shutdown()
      base.unpersist(false)
    }
  }

  /** ADC top-k against explicit codebooks: score raw queries against
    * reconstructed corpus vectors. Reconstruction is a pure in-plan lookup
    * (element_at into the literal codebook arrays) — the corpus embeddings
    * are NOT read at scan time, which is the point of PQ.
    */
  /** Encode + decode in one plan: (vec_id, embedding, recon) — the recon
    * column is the quantized approximation the ADC scan scores against;
    * also the direct way to measure quantization error.
    */
  def pqReconstruct(corpus: DataFrame, books: Seq[Seq[Array[Double]]],
                    dim: Int): DataFrame = {
    val nSub = books.length
    val subDim = dim / nSub
    require(dim % nSub == 0, s"nSub ($nSub) must divide dim ($dim)")
    val codes = (0 until nSub).map { s =>
      pqCode(slice(col("embedding"), s * subDim + 1, subDim), books(s)).as(s"code_$s")
    }
    val encoded = corpus.select(col("vec_id") +: col("embedding") +: codes: _*)
    val recon = concat((0 until nSub).map { s =>
      val bookArr = array(books(s).map(c =>
        array(c.map(lit(_)).toSeq: _*).cast("array<double>")): _*)
      element_at(bookArr, col(s"code_$s").cast("int") + 1)
    }: _*)
    encoded.withColumn("recon", recon)
      .select(col("vec_id"), col("embedding"), col("recon"))
  }

  def pqTopKWith(corpus: DataFrame, queries: DataFrame, topK: Int,
                 books: Seq[Seq[Array[Double]]], dim: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"), norm2Native(col("embedding")).as("q_norm"))
    val scored = pqReconstruct(corpus, books, dim)
      .select(col("vec_id"), col("recon"))
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotNative(col("recon"), col("q_emb")) /
          (norm2Native(col("recon")) * col("q_norm"))).as("adc_cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  def pqTopK(corpus: DataFrame, queries: DataFrame, topK: Int = 5,
             dim: Int = 64, nSub: Int = 4, k: Int = 16,
             seed: Long = 42L): DataFrame =
    pqTopKWith(corpus, queries, topK,
      pqCodebooks(nSub, dim / nSub, k, seed), dim)

  /** IVF-PQ — the production ANN composition (the FAISS IVFADC shape): IVF
    * cells prune the candidate set, PQ reconstructions score the survivors
    * in the compressed domain. At 100 TB this is THE serving layout — the
    * raw embedding column is read once at index build; the search scans
    * only probed cells and only nSub-byte codes per candidate. Join is
    * keyed on cell (broadcast query probes), never a cross join; scoring
    * matches pqTopKWith's ADC convention so IVF-PQ degrades to PQ when
    * every cell is probed.
    */
  def ivfPqTopKWith(corpus: DataFrame, queries: DataFrame, topK: Int,
                    centroids: Seq[Seq[Double]], books: Seq[Seq[Array[Double]]],
                    nProbe: Int, dim: Int): DataFrame = {
    val recon = pqReconstruct(corpus, books, dim)
      .withColumn("cell", cellAssign(centroids))
      .select(col("vec_id"), col("recon"), col("cell"))
    val cellScores = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(dotNative(col("embedding"),
        array(c.map(lit(_)): _*).cast("array<double>")).as("score"),
        lit(i).as("cell"))
    }: _*)
    val qProbes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        norm2Native(col("embedding")).as("q_norm"),
        explode(slice(reverse(array_sort(cellScores)), 1, nProbe)).as("probe"))
      .select(col("query_id"), col("q_emb"), col("q_norm"),
        col("probe.cell").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id").asc)
    recon.join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotNative(col("recon"), col("q_emb")) /
          (norm2Native(col("recon")) * col("q_norm"))).as("adc_cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topK: Int = 5,
                dim: Int = 64, nCells: Int = 16, nProbe: Int = 4,
                nSub: Int = 4, k: Int = 16, seed: Long = 42L): DataFrame =
    ivfPqTopKWith(corpus, queries, topK, ivfCentroids(nCells, dim, seed),
      pqCodebooks(nSub, dim / nSub, k, seed), nProbe, dim)

  /** PQ over k-means-fitted codebooks — the quality path; training runs
    * Spark jobs up front (prepared-index API, like ivfTopKKmeans).
    */
  def pqTopKKmeans(corpus: DataFrame, queries: DataFrame, topK: Int = 5,
                   dim: Int = 64, nSub: Int = 4, k: Int = 16,
                   seed: Long = 42L, maxIter: Int = 10): DataFrame =
    pqTopKWith(corpus, queries, topK,
      pqCodebooksKmeans(corpus, dim, nSub, k, seed, maxIter), dim)

  /** Occupancy-targeted LSH width: expected bucket occupancy is n / 2^nBits and
    * within-bucket candidate work grows with its SQUARE, so a CONSTANT
    * nBits makes total candidate volume quadratic in n (measured: the
    * 2k -> 20k embeddings decade at fixed 6 bits ran within-decade slope
    * ~0.97, ~25M candidate pairs at 20k). Holding OCCUPANCY constant
    * instead — nBits = ceil(log2(n / targetOcc)) — keeps candidates
    * linear in n. The `floor` pins small corpora to the recall
    * calibration (6 bits below ~2k vectors at targetOcc 32), which also
    * keeps generated oracles static across the oracle-checked fixture
    * scales. Recall per table decays as bits grow ((1-theta/pi)^nBits);
    * `tables` is the recall knob and multiplies work linearly — the
    * caller trades them, this function only bounds the bucket load.
    */
  def autoBits(n: Long, floor: Int = 6, targetOcc: Int = 32): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOcc)) / math.log(2.0)).toInt
    math.max(floor, needed)
  }

  /** LSH-bucketed near-dup pairs — the scale path for nearDupPairs:
    * candidates from (table, bucket) collisions, verified by exact cosine
    * INSIDE the bucket self-join (see the inline rationale). Size `nBits`
    * with [[autoBits]] — at 10^9 vectors ~24 bits keeps occupancy at the
    * tens-of-vectors the recall calibration assumed; `tables` is the
    * recall knob and multiplies work linearly.
    */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double, dim: Int = 64,
                      nBits: Int = 12, tables: Int = 4, seed: Long = 42L): DataFrame = {
    // Verify cosine INSIDE the bucket self-join: the embeddings ride the
    // (table_id, bucket) shuffle once — n*tables rows — and every
    // candidate pair is scored in-stage, so only the SURVIVORS (actual
    // near-dups) reach the cross-table distinct. The previous shape
    // (distinct the raw candidate ids, then re-attach both embeddings
    // with two more joins) shuffled the candidate set — n*occupancy
    // rows, each carrying a dim-float payload after the first re-join —
    // three more times; at the 200k-vector scaling slice that was the
    // entire wall (the dot products themselves are ~2 GFLOP). A pair
    // colliding in several tables is now verified once per collision —
    // redundant COMPUTE traded for eliminated SHUFFLE, the right
    // direction at 100 TB — and the duplicate scores are bit-identical
    // (same operand order), so distinct() collapses them exactly.
    val idx = lshIndex(corpus, dim, nBits, tables, seed)
    idx.as("a").join(idx.as("b"),
        col("a.table_id") === col("b.table_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        (dotNative(col("a.embedding"), col("b.embedding")) /
          (norm2Native(col("a.embedding")) * norm2Native(col("b.embedding"))))
          .as("cos"))
      .filter(col("cos") > threshold)
      // dedupe cross-table collisions on the PAIR IDS, not the whole row:
      // the duplicate scores are bit-identical today (same operand order
      // per collision), but keying the dedup on (id_a, id_b) removes any
      // dependence on floating-point bit-equality surviving future
      // evaluation changes
      .dropDuplicates("id_a", "id_b")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic dedup:
    * assign every vector to its nearest centroid cell, then inside each
    * cell drop every vector that has a LOWER-id cell-mate with cosine
    * above `tau`. The paper keeps one arbitrary member per near-dup set;
    * keep-min-id makes that choice deterministic (and engine-reproducible).
    *
    * Scale shape: the self-join is keyed on the cell id, so candidate
    * pairs are bounded per cell — (n/k)^2 per cell instead of n^2 overall.
    * Clustering-first is exactly what makes semantic dedup feasible at
    * 100 TB; with k ~ n/10k the per-cell kernel stays task-sized. The
    * survivor filter is one LEFT ANTI hash join on the cell key with the
    * cosine predicate as the join residual — no driver state, no window.
    * Centroids are plan constants (seeded, or k-means-fit via
    * kmeansCentroids — bounded output, same contract as ivfTopKKmeans).
    */
  def semDedup(corpus: DataFrame, centroids: Seq[Seq[Double]],
               tau: Double): DataFrame = {
    val idx = ivfIndexWith(corpus, centroids)
      .select(col("vec_id"), col("embedding"), col("cell"),
        norm2Native(col("embedding")).as("nrm"))
    val mates = idx.select(col("cell").as("b_cell"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
    idx.join(mates,
        col("cell") === col("b_cell") && col("b_id") < col("vec_id") &&
          (dotNative(col("embedding"), col("b_emb")) /
            (col("nrm") * col("b_nrm"))) > tau,
        "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** Matryoshka prefix-dimension rerank (Kusupati et al. 2022,
    * arXiv:2205.13147): coarse top-`m` by cosine over the FIRST
    * `prefixDim` dims, then exact full-dim rerank of those m candidates
    * to top-`k`. With MRL-trained embeddings the information mass is
    * front-loaded, so the coarse pass at prefixDim = dim/4 reads (and
    * dots) 4x less data per candidate — at 100 TB the prefix scan is the
    * cheap first stage and the full vectors are touched only for m rows
    * per query. Both passes here are exact arithmetic, so the whole
    * pipeline is oracle-checkable; recall vs brute force is a property of
    * the embedding training, not of this plumbing.
    */
  def matryoshkaTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                     prefixDim: Int = 16, m: Int = 20): DataFrame = {
    def pre(c: Column): Column = slice(c, 1, prefixDim)
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      norm2Native(pre(col("embedding"))).as("q_pnorm"))
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm2Native(pre(col("embedding"))).as("c_pnorm"))
    // coarse pass: prefix cosine, ids only through the shuffle
    val coarseW = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val coarse = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dotNative(pre(col("embedding")), pre(col("q_emb"))) /
          (col("c_pnorm") * col("q_pnorm"))).as("pcos"))
      .withColumn("prank", row_number().over(coarseW))
      .filter(col("prank") <= m)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank: rejoin full vectors for just the m survivors per query
    val cand = coarse
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("neighbor_id"),
        (dotNative(col("embedding"), col("q_emb")) /
          (norm2Native(col("embedding")) * norm2Native(col("q_emb")))).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
