package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("v")).collect().head.get(0)

  test("tokens handles empty, blank and multi-space text") {
    assert(one("", size(tokens($"text"))) == 0)
    assert(one("   ", size(tokens($"text"))) == 0)
    assert(one("a  b\tc", size(tokens($"text"))) == 3)
  }

  test("tokens: tab/newline-edged text yields no empty tokens") {
    // trim() strips only spaces — the regex strip must handle \t \n edges
    assert(one("\ta b\n", size(tokens($"text"))) == 2)
    assert(one("\t\n ", size(tokens($"text"))) == 0)
    val toks = Seq("\tx y\t").toDF("text").select(tokens($"text").as("t"))
      .as[Seq[String]].collect().head
    assert(toks == Seq("x", "y"))
  }

  test("bpeish token count splits words, digits and symbols") {
    // "hello world42!" -> hello, world, 4, 2, !
    assert(one("hello world42!", bpeishTokenCount($"text")) == 5)
  }

  test("stopword and punct ratios") {
    assert(one("the cat sat", stopwordRatio($"text")) == 1.0 / 3)
    assert(one("a,b.c", punctRatio($"text")) == 2.0 / 5)
    assert(one("", punctRatio($"text")) == 0.0)
  }

  test("langId: marker votes and CJK override") {
    assert(one("the cat and the dog", langId($"text")) == "en")
    assert(one("der hund und die katze ist", langId($"text")) == "de")
    assert(one("le chat et la mer est", langId($"text")) == "fr")
    assert(one("el gato y los perros es", langId($"text")) == "es")
    assert(one("w中文 text", langId($"text")) == "zh")
    assert(one("xyzzy qwerty", langId($"text")) == "und")
  }

  test("normalization makes case/whitespace-variant texts collide") {
    val fp = Seq("Hello  World", "hello world", "HELLO WORLD ").toDF("text")
      .select(contentFingerprint($"text").as("f")).distinct().count()
    assert(fp == 1)
  }

  test("tfidf: term stats and real-valued score behave as expected") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry")).toDF("doc_id", "text")
    val stats = graft.operators.TextSuite.termStats(docs)
      .select($"doc_id", $"term", $"tf", $"df")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(stats.contains((1L, "apple", 2L, 1L)))   // tf 2 in doc 1, only doc 1
    assert(stats.contains((2L, "banana", 1L, 2L)))  // banana in 2 docs
    assert(stats.contains((3L, "cherry", 3L, 2L)))
    val scored = graft.operators.TextSuite.termStats(docs)
      .withColumn("score", graft.operators.TextSuite.tfidfScore(nDocs = 3L))
      .select($"doc_id", $"term", $"score").as[(Long, String, Double)].collect()
      .map { case (d, t, sc) => (d, t) -> sc }.toMap
    // equal tf and equal df score equally
    assert(scored((2L, "cherry")) == scored((2L, "banana")))
    // higher tf + rarer term must outscore a common single occurrence
    assert(scored((1L, "apple")) > scored((1L, "banana")))
  }

  private def shingleSeq(text: String): Seq[String] =
    Seq(text).toDF("text").select(shingles($"text").as("v"))
      .as[Seq[String]].collect().head

  test("shingles: distinct word n-grams, short docs yield none") {
    assert(shingleSeq("a b c d").toSet == Set("a b c", "b c d"))
    assert(shingleSeq("a b").isEmpty)
    // repeated shingle appears once (set semantics)
    val rep = shingleSeq("x y z x y z x y")
    assert(rep.size == rep.toSet.size)
  }

  test("winnowHashes: shared-run guarantee, density, and short-doc floor") {
    import graft.functions.TextFunctions.winnowHashes
    def fp(text: String): Set[Long] =
      Seq(text).toDF("text").select(winnowHashes($"text", 3, 4).as("v"))
        .as[Seq[Long]].collect().head.toSet
    // two documents sharing a run of w + n - 1 = 6 tokens MUST share a
    // selected fingerprint, regardless of hash values
    val a = fp("p q r one two three four five six s t u")
    val b = fp("x y one two three four five six z w v k")
    assert((a intersect b).nonEmpty, "winnowing guarantee violated")
    // density: far fewer fingerprints than shingles on a long doc
    val long = (1 to 200).map(i => s"tok$i").mkString(" ")
    val full = Seq(long).toDF("text")
      .select(graft.functions.TextFunctions.shingleHashes($"text", 3).as("v"))
      .as[Seq[Long]].collect().head
    assert(fp(long).size < full.size / 2, "winnowing did not thin the set")
    // short non-empty docs still carry at least one fingerprint
    assert(fp("a b c").nonEmpty)
    assert(fp("a b").isEmpty) // no 3-gram exists at all
  }

  test("winnowHashes: shared-run guarantee holds on generated documents") {
    import graft.functions.TextFunctions.winnowHashes
    import org.scalacheck.Gen
    // 60 random document pairs, each with an independently random prefix/
    // suffix around a planted shared run of exactly w + n - 1 = 6 tokens —
    // the minimal length the winnowing theorem covers
    val params = Gen.Parameters.default
    def words(n: Int, seed: Long): Seq[String] =
      (0 until n).flatMap(i => Gen.chooseNum(0, 9999).apply(
        params, org.scalacheck.rng.Seed(seed * 1000 + i)).map(v => s"w$v"))
    val pairs = (1 to 60).map { i =>
      val run = words(6, i).map(w => s"run${i}_$w") // run tokens unique per pair
      val a = (words(10, i * 7 + 1) ++ run ++ words(10, i * 7 + 2)).mkString(" ")
      val b = (words(4, i * 7 + 3) ++ run ++ words(14, i * 7 + 4)).mkString(" ")
      (a, b)
    }
    val fps = pairs.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((i, 0, a), (i, 1, b)) }
      .toDF("pair", "side", "text")
      .select($"pair", $"side", winnowHashes($"text", 3, 4).as("v"))
      .as[(Int, Int, Seq[Long])].collect()
      .groupBy(_._1).map { case (p, rows) =>
        p -> rows.sortBy(_._2).map(_._3.toSet)
      }
    fps.foreach { case (p, sides) =>
      assert((sides(0) intersect sides(1)).nonEmpty,
        s"pair $p: no shared fingerprint despite a planted 6-token run")
    }
    assert(fps.size == 60)
  }

  test("cms_estimate: overestimate-only contract and null pass-through") {
    import graft.functions.Cms
    val vals = Seq("a", "a", "a", "b", "b", "c").toDF("v")
    val sketch = vals.agg(Cms.cmsAgg($"v", 0.01, 0.99, 7).as("cms"))
    val got = Seq(("a", 3L), ("b", 2L), ("c", 1L), ("zz", 0L)).toDF("v", "exact")
      .select($"v", $"exact", Cms.estimate(sketch, $"v").as("est"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (v, exact, est) =>
      assert(est >= exact, s"CMS underestimated $v: $est < $exact")
    }
    val nullEst = Seq(Option.empty[String]).toDF("v")
      .select(Cms.estimate(sketch, $"v").as("est"))
      .collect().head
    assert(nullEst.isNullAt(0), "null item must probe to null")
  }

  test("shingle_hashes is SQL-callable and matches the Column API") {
    val viaSql = spark.sql(
      "SELECT shingle_hashes('a b c d', 2) AS s," +
        " shingle_hashes('x x x', 1, true) AS m")
      .as[(Seq[Long], Seq[Long])].collect().head
    val viaCol = Seq(("a b c d", "x x x")).toDF("t2", "t1")
      .select(graft.functions.TextFunctions.shingleHashes($"t2", 2).as("s"),
        graft.functions.TextFunctions.shingleHashesAll($"t1", 1).as("m"))
      .as[(Seq[Long], Seq[Long])].collect().head
    assert(viaSql == viaCol)
    assert(viaSql._1.size == 3 && viaSql._2.size == 3) // 3 bigrams; 3 occurrences kept
    // non-literal n must be rejected, not silently miscompiled
    val err = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b', CAST(rand()*2 AS INT))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"), err.getMessage)
  }

  private def enc(word: String): Seq[String] =
    Seq(word).toDF("w")
      .select(graft.operators.TextSuite.bpeTokens($"w").as("t"))
      .as[Seq[String]].collect().head

  test("bpe encode: rank-sequential merges, hand-verified sequences") {
    // t+h then th+e: both fire, in order
    assert(enc("the") == Seq("the"))
    // th from rank 1, in from rank 3
    assert(enc("thin") == Seq("th", "in"))
    // a+n (rank 5) must fire before an+d (rank 6)
    assert(enc("and") == Seq("and"))
    // e+r fires; the spent 'r' cannot also serve r+e
    assert(enc("hero") == Seq("h", "er", "o"))
    // after t h e r e -> the r e, e+r finds no pair (order is r,e) but
    // the later-rank r+e does: rank order is load-bearing
    assert(enc("there") == Seq("the", "re"))
    // leftmost-non-overlapping within one rank
    assert(enc("ononon") == Seq("on", "on", "on"))
    assert(enc("nono") == Seq("n", "on", "o"))
    assert(enc("") == Seq.empty)
  }

  test("bpe encode: token concatenation reconstructs the word (random)") {
    val rnd = new scala.util.Random(77001L)
    val words = Seq.fill(60)(
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    val rows = words.toDF("w")
      .select($"w", array_join(graft.operators.TextSuite.bpeTokens($"w"), "").as("j"))
      .as[(String, String)].collect()
    rows.foreach { case (w, j) => assert(j == w, s"$w -> $j") }
  }

  test("bm25TopKOf: hand-computed saturation + length-normalization ordering") {
    // crafted corpus, one query shingle h("q1 q2 q3") with df = 4 out of
    // N = 20 docs (under the df*4 <= N cap). Candidates differ ONLY in
    // the two dimensions BM25 adds over raw tf*idf:
    //   doc 0  (the query): tf=1, dl=1  — shortest, must self-retrieve
    //   doc 11: tf=3, dl=7  — saturation: more hits help, sub-linearly
    //   doc 10: tf=1, dl=7  — same length as 11, fewer hits
    //   doc 12: tf=1, dl=21 — same hits as 10, longer doc scores lower
    // A = 52 total corpus shingles; hand-computed SAT values (integer
    // division of 22000*tf*A by 10*tf*A + 3*A + 9*dl*N):
    //   SAT(1,1)=1336, SAT(3,7)=1153, SAT(1,7)=590, SAT(1,21)=256
    // so the expected ranking is 0 > 11 > 10 > 12, every score strictly
    // below the k1+1 saturation ceiling idf*2200. Raw tf*idf would rank
    // 11 THREE TIMES doc 10's score and see no length at all — this pins
    // exactly the two behaviors that distinguish the kernels.
    val filler = (1 to 16).map(i => s"f${i}a f${i}b f${i}c")
    val docs = (
      Seq(0L -> "q1 q2 q3") ++
        (1 to 4).map(i => i.toLong -> filler(i - 1)) ++
        (5 to 9).map(i => i.toLong -> filler(i - 1)) ++
        Seq(10L -> "q1 q2 q3 x1 x2 x3 x4 x5 x6",
          11L -> "q1 q2 q3 q1 q2 q3 q1 q2 q3",
          12L -> ("q1 q2 q3 " + (1 to 20).map(j => s"g$j").mkString(" "))) ++
        (13 to 19).map(i => i.toLong -> filler(i - 4))
      ).toDF("doc_id", "text")
    assert(docs.count() == 20)
    val tf = docs.select($"doc_id",
        explode(shingleHashesAll($"text", 3)).as("h"))
      .groupBy($"doc_id", $"h").agg(count(lit(1)).as("tf"))
    val got = graft.operators.TextSuite.bm25TopKOf(docs, tf, 5)
      .filter($"query_id" === 0L)
      .orderBy($"rnk")
      .select($"doc_id", $"score")
      .as[(Long, Long)].collect().toSeq
    val idf = (1000000L * 20) / 4 // fixed-point idf at df=4, N=20
    assert(got == Seq(
      (0L, idf * 1336), (11L, idf * 1153), (10L, idf * 590),
      (12L, idf * 256)), s"bm25 ranking: $got")
    assert(got.forall(_._2 < idf * 2200),
      s"saturation ceiling idf*(k1+1) violated: $got")
  }

  test("vocab coverage: hand-encodable fertility and single-piece fraction") {
    // under bpeMerges: "the"/"and"/"in" each encode to ONE piece;
    // "cat" has no merges -> 3 pieces; "there" -> the|re = 2 pieces
    //   src a: words the, and, cat          -> 5 pieces / 3 words,  2 single
    //   src b: words there, in              -> 3 pieces / 2 words,  1 single
    val docs = Seq(
      ("a", "The and CAT"),
      ("b", "there in")).toDF("source", "text")
    val got = graft.operators.TextSuite.vocabCoverageOf(docs)
      .orderBy($"source")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 3L, 5L, 5.0 / 3.0, 2.0 / 3.0),
      ("b", 2L, 3L, 1.5, 0.5)), s"audit rows: $got")
  }
}
