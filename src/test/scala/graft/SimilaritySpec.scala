package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // clustered synthetic vectors: 10 clusters x 20 members in 16 dims,
  // member = unit-ish center + small deterministic jitter
  private val dim = 16
  private lazy val vectors = {
    val rng = new scala.util.Random(7)
    val centers = Seq.fill(10)(Array.fill(dim)(rng.nextGaussian().toFloat))
    (0 until 200).map { id =>
      val c = centers(id % 10)
      val jitter = Array.fill(dim)((rng.nextGaussian() * 0.1).toFloat)
      (id.toLong, c.zip(jitter).map { case (a, b) => a + b })
    }
  }.toDF("vec_id", "embedding")

  test("vector functions: cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 2f), Array(-1f, -2f, -2f))
    ).toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b").as("c")).as[Double].collect()
    assert(math.abs(df(0) - 1.0) < 1e-12)
    assert(math.abs(df(1)) < 1e-12)
    assert(math.abs(df(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k: k rows per query, ranked by cosine, cluster-mates win") {
    val queries = vectors.filter($"vec_id" < 3)
    val got = Similarity.bruteForceTopK(vectors, queries, k = 5, dim = dim)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.length == 15)
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // ranks ordered by descending cosine
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // with tight clusters, every top-5 neighbor shares the query's cluster
    got.foreach { case (q, n, _, _) =>
      assert(n % 10 == q % 10, s"neighbor $n of query $q from wrong cluster")
    }
  }

  test("LSH ANN reaches >=60% recall of the exact top-5 on clustered data") {
    val queries = vectors.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vectors, queries, k = 5, dim = dim)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(vectors, queries, k = 5, dim = dim,
        nBits = 8, tables = 8)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall $recall too low")
  }

  test("IVF ANN reaches >=60% recall of the exact top-5 on clustered data") {
    val queries = vectors.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vectors, queries, k = 5, dim = dim)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vectors, queries, k = 5, dim = dim,
        nCells = 8, nProbe = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
  }

  test("PQ: ADC top-5 stays in-cluster; k-means codebooks cut recon error") {
    // PQ quantizes cluster-mates to the SAME reconstruction, so exact-top-5
    // recall is the wrong metric (ties collapse within-cluster order):
    // judge by (a) cluster-mate precision of the ADC scan and (b)
    // quantization error — the objective k-means provably minimizes
    val queries = vectors.filter($"vec_id" < 10)
    val km = Similarity.pqCodebooksKmeans(vectors, dim = dim, nSub = 4, k = 8)
    val rand = Similarity.pqCodebooks(4, dim / 4, 8, 42L)
    val got = Similarity.pqTopKWith(vectors, queries, 5, km, dim)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val precision = got.count { case (q, n) => n % 10 == q % 10 }.toDouble / got.length
    assert(precision >= 0.9, s"PQ cluster precision $precision too low")
    def mse(books: Seq[Seq[Array[Double]]]) =
      Similarity.pqReconstruct(vectors, books, dim)
        .select(avg(graft.functions.VectorFunctions.l2sq($"embedding", $"recon")))
        .as[Double].head()
    val (kmErr, randErr) = (mse(km), mse(rand))
    assert(kmErr < randErr / 2,
      s"k-means codebooks must at least halve quantization error: $kmErr vs $randErr")
  }

  test("k-means centroids beat random centroids at equal nProbe") {
    val queries = vectors.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(vectors, queries, k = 5, dim = dim)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val got = df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val rand = recallOf(Similarity.ivfTopK(vectors, queries, k = 5, dim = dim,
      nCells = 8, nProbe = 2))
    val km = recallOf(Similarity.ivfTopKKmeans(vectors, queries, k = 5,
      nCells = 8, nProbe = 2))
    // 10 true clusters: k-means cells align with them, random directions
    // split them — trained centroids must measurably improve recall
    assert(km > rand, s"k-means recall $km not above random-centroid $rand")
    assert(km >= 0.9, s"k-means recall $km below 0.9 on clustered data")
  }

  test("LSH near-dup pairs recover most exact pairs on clustered data") {
    val exact = Similarity.nearDupPairs(vectors, threshold = 0.95, dim = dim)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.nearDupPairsLsh(vectors, threshold = 0.95, dim = dim,
        nBits = 8, tables = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // every LSH pair must be a true pair (cosine verified), recall bounded
    assert(lsh.subsetOf(exact))
    assert(lsh.size.toDouble / exact.size >= 0.6, s"LSH pair recall too low: ${lsh.size}/${exact.size}")
  }

  test("autoBits targets occupancy: floor on fixtures, log2 growth beyond") {
    // every oracle-checked fixture scale sizes to the 6-bit floor — the
    // STATIC generated oracle (nearDupLshOracle) depends on this
    assert(Similarity.autoBits(500) == 6)
    assert(Similarity.autoBits(2000) == 6)
    assert(Similarity.autoBits(2048) == 6)
    // the scaling slices grow: occupancy n / 2^bits stays <= targetOcc
    assert(Similarity.autoBits(20000) == 10)
    assert(Similarity.autoBits(200000) == 13)
    Seq(500L, 2048L, 20000L, 200000L, 2000000L).foreach { n =>
      val b = Similarity.autoBits(n)
      assert(n.toDouble / (1L << b) <= 32.0,
        s"n=$n bits=$b occupancy ${n.toDouble / (1L << b)} exceeds target")
    }
    // monotone: more vectors never narrows the table
    val bs = (1 to 22).map(p => Similarity.autoBits(1L << p))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b })
    // and the ACTUAL driver fixtures all land on the floor — if a fixture
    // ever grows past 2,048 vectors this fails by name instead of the
    // wired query silently desyncing from its annBits-generated oracle
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val n = spark.read
        .parquet(s"/root/testdata/$sf/embeddings.parquet").count()
      assert(Similarity.autoBits(n) == 6,
        s"$sf embeddings grew to $n rows: regenerate nearDupLshOracle " +
          "at the new autoBits width")
    }
  }

  test("wider autoBits keeps LSH sound: still a verified subset of exact") {
    val exact = Similarity.nearDupPairs(vectors, threshold = 0.95, dim = dim)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // 200 vectors at targetOcc 8 -> wider than the floor; pairs must stay
    // exact-cosine-verified (precision 1.0) at ANY width
    val wide = Similarity.nearDupPairsLsh(vectors, threshold = 0.95, dim = dim,
        nBits = Similarity.autoBits(200, floor = 6, targetOcc = 8), tables = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(wide.subsetOf(exact))
  }

  test("near-dup pairs: symmetric-free ordering and threshold respected") {
    val pairs = Similarity.nearDupPairs(vectors, threshold = 0.95, dim = dim)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "tight clusters must produce >0.95 cosine pairs")
    pairs.foreach { case (a, b, c) =>
      assert(a < b); assert(c > 0.95 && c <= 1.0 + 1e-12)
    }
  }

  test("hard negatives: different label, near-dup ceiling, top-k by cosine") {
    // labeled clusters: label = cluster id (id % 10), so each query's
    // same-cluster near-copies carry the SAME label and must never mine
    val labeled = vectors.withColumn("label", (col("vec_id") % 10).cast("int"))
    val queries = labeled.filter($"vec_id" < 3)
    val got = Similarity.hardNegatives(labeled, queries, k = 3)
      .select($"query_id", $"q_label", $"neighbor_id", $"neg_label", $"cos", $"rank")
      .as[(Long, Int, Long, Int, Double, Int)].collect()
    assert(got.length == 9, s"3 queries x k=3, got ${got.length}")
    got.foreach { case (q, ql, n, nl, c, _) =>
      assert(nl != ql, s"query $q mined same-label neighbor $n")
      assert(ql == (q % 10) && nl == (n % 10))
      assert(c <= 0.95 + 1e-12, s"near-dup ceiling violated: $c")
    }
    // parity with a local brute force under the same constraints
    val all = labeled.select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i => d += a(i).toDouble * b(i)
        na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val (_, ql, qv) = all.find(_._1 == qid).get
      val want = all.filter(_._2 != ql)
        .map { case (id, _, v) => (id, cos(qv, v)) }
        .filter(_._2 <= 0.95)
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSeq
      assert(rows.sortBy(_._6).map(_._3).toSeq == want, s"query $qid")
    }
  }

  test("embedding drift: identical halves score 1, orthogonal halves 0") {
    // label 1: both halves on the x-axis -> drift_cos exactly 1.0
    // label 2: old half on x, new half on y -> exactly 0.0
    // label 3: only an even (old) vec -> dropped (no new half to compare)
    val emb = Seq(
      (0L, Array(1f, 0f), 1), (1L, Array(2f, 0f), 1),
      (2L, Array(1f, 0f), 1), (3L, Array(1f, 0f), 1),
      (4L, Array(1f, 0f), 2), (5L, Array(0f, 1f), 2),
      (6L, Array(1f, 1f), 3)).toDF("vec_id", "embedding", "label")
    val rows = graft.operators.SimilaritySuite.embeddingDriftOf(emb)
      .orderBy($"label")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(rows == Seq((1, 2L, 2L, 1.0), (2, 1L, 1L, 0.0)),
      s"drift table: $rows")
  }

  test("knn label propagation: cluster-mates vote, ties break to smaller label") {
    // labeled pool: two tight clusters around orthogonal axes
    val pool = Seq(
      (10L, Array(1f, 0f, 0.1f), 0), (11L, Array(1f, 0.1f, 0f), 0),
      (12L, Array(0.9f, 0f, 0f), 0),
      (20L, Array(0f, 1f, 0.1f), 7), (21L, Array(0.1f, 1f, 0f), 7),
      (22L, Array(0f, 0.9f, 0f), 7)).toDF("vec_id", "embedding", "label")
    // queries: one per cluster (true labels held out for scoring) and one
    // equidistant tie case whose 2-2 vote must break to the SMALLER label
    val queries = Seq(
      (1L, Array(1f, 0.05f, 0f), 0),     // cluster-0 query, correct
      (2L, Array(0.05f, 1f, 0f), 0),     // nearest cluster 7 -> wrong
      (3L, Array(1f, 1f, 0f), 7)         // symmetric tie -> pred 0, wrong
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabel(pool, queries, k = 4)
      .orderBy($"label").as[(Int, Long, Long, Double)].collect().toSeq
    // true-label 0 queries: q1 right, q2 wrong -> 1/2; true-label 7: q3
    // votes 2-2 between labels 0 and 7 (k=4 takes two per cluster), the
    // tie breaks to label 0 -> wrong -> 0/1
    assert(got == Seq((0, 2L, 1L, 0.5), (7, 1L, 0L, 0.0)),
      s"accuracy table: $got")
  }

  test("late interaction: MaxSim scores per-token maxima in fixed order") {
    // 2 tokens x 2 dims; hand-computable. Query [1,0 | 0,1]:
    //   doc 1 [1,0 | 0,1]  -> tok0 max 1, tok1 max 1        -> score 2
    //   doc 3 [1,1 | 1,0]  -> tok0 max(1/sqrt2, 1) = 1,
    //                         tok1 max(1/sqrt2, 0) = 1/sqrt2 -> 1 + 1/sqrt2
    //   doc 2 [0,1 | 0,1]  -> tok0 max 0, tok1 max 1        -> score 1
    // MaxSim credits doc 3's facet split; pooled 4-dim cosine would not.
    val docs = Seq(
      (1L, Array(1f, 0f, 0f, 1f)),
      (2L, Array(0f, 1f, 0f, 1f)),
      (3L, Array(1f, 1f, 1f, 0f))).toDF("vec_id", "embedding")
    val queries = Seq((0L, Array(1f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.lateInteractionTopK(docs, queries, k = 3,
      nTokens = 2, subDim = 2)
      .orderBy($"rank").as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 3L, 2L), s"MaxSim order wrong: $got")
    assert(got(0)._3 == 2.0 && got(2)._3 == 1.0, s"exact scores: $got")
    assert(math.abs(got(1)._3 - (1.0 + 1.0 / math.sqrt(2.0))) < 1e-15,
      s"doc 3 must score 1 + 1/sqrt(2): ${got(1)._3}")
  }

  test("hybrid IVF fusion keeps >=60% recall of the exact fusion (the calibration pairing)") {
    // hybrid_retrieval (exact brute-force semantic side) is the recall
    // calibration for hybrid_retrieval_ivf (probed-cell semantic side) —
    // the same pairing embed_topk/embed_ivf carry. Deterministic fixture,
    // so the recall is a fixed property, not a flaky sample.
    val dir = "/root/testdata/sf0.01"
    def top(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"cand_id")
      .as[(Long, Long)].collect().toSet
    val exact = top(graft.operators.SimilaritySuite.hybridRetrieval(spark, dir))
    val ivf = top(graft.operators.SimilaritySuite.hybridRetrievalIvf(spark, dir))
    assert(exact.nonEmpty, "exact fusion returned no rows")
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"fused IVF recall $recall too low vs exact fusion")
    // the lexical half is common to both fusions, so every query's OWN
    // doc (lexical rank 1, RRF-dominant) must survive in both top-5 sets
    for (q <- 0L until 5L) {
      assert(exact.contains((q, q)) && ivf.contains((q, q)),
        s"query $q must retrieve itself through both fusions")
    }
  }
}
