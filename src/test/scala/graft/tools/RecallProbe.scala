package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.model.Tables
import graft.operators.{Dedup, Similarity}

/** Dev probe: measures ANN/IVF/MinHash recall vs the exact answers on the
  * fixtures, to calibrate the recall-oracle queries (see SimilaritySuite
  * annRecall / ivfRecall, TextSuite minhashRecall). Not part of the driver
  * contract.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import spark.implicits._
    for (dir <- args) {
      println(s"== $dir")
      val emb = Tables.embeddings(spark, dir)
      val queries = emb.filter(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      for ((nb, nt) <- Seq((6, 8), (5, 8), (6, 12), (4, 8))) {
        val ann = Similarity.annTopK(emb, queries, k = 5, nBits = nb, tables = nt)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
        println(f"ann nBits=$nb tables=$nt recall=${(exact intersect ann).size.toDouble / exact.size}%.3f")
      }
      for ((nc, np) <- Seq((8, 3), (8, 4), (8, 6), (16, 8))) {
        val ivf = Similarity.ivfTopK(emb, queries, k = 5, nCells = nc, nProbe = np)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
        println(f"ivf nCells=$nc nProbe=$np recall=${(exact intersect ivf).size.toDouble / exact.size}%.3f")
      }
      for ((nc, np) <- Seq((8, 3), (8, 4), (16, 8))) {
        val ivfK = Similarity.ivfTopKKmeans(emb, queries, k = 5, nCells = nc, nProbe = np)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
        val perQ = exact.groupBy(_._1).map { case (q, s) =>
          (s intersect ivfK).size.toDouble / s.size }
        println(f"ivfKMEANS nCells=$nc nProbe=$np recall=${(exact intersect ivfK).size.toDouble / exact.size}%.3f minPerQuery=${perQ.min}%.3f")
      }
      for ((ns, kk) <- Seq((4, 16), (4, 32))) {
        val pqK = Similarity.pqTopKKmeans(emb, queries, topK = 5, nSub = ns, k = kk)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
        val perQ = exact.groupBy(_._1).map { case (q, s) =>
          (s intersect pqK).size.toDouble / s.size }
        println(f"pqKMEANS nSub=$ns k=$kk recall=${(exact intersect pqK).size.toDouble / exact.size}%.3f minPerQuery=${perQ.min}%.3f")
      }
      val docs = Tables.documents(spark, dir)
      val exactJac = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.05)
        .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)].collect()
      val mh = Dedup.minhashPairs(docs, threshold = 0.05)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      for (t <- Seq(0.1, 0.2, 0.3, 0.4, 0.5)) {
        val truePairs = exactJac.filter(_._3 >= t).map(p => (p._1, p._2)).toSet
        val found = (truePairs intersect mh).size
        println(f"minhash: true jaccard>=$t%.1f pairs=${truePairs.size} found=$found recall=${if (truePairs.isEmpty) 1.0 else found.toDouble / truePairs.size}%.3f")
      }
    }
    spark.stop()
  }
}
