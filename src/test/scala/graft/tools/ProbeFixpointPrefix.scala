package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.model.Tables
import graft.operators.Dedup

/** Interleaved in-JVM A/B behind connectedComponentsFixpoint's REJECTED
  * prefix-unrolling variant (see its scaladoc): unrolling the first 4
  * flooding rounds job-free into the initial plan vs the shipped
  * per-round-checkpoint form, on the wired cluster_split pair set.
  * Round-11 measurement (both arms under the same round-scoped
  * 8-partition session — the round-10 run was partition-confounded):
  * median 4.06 s prefixed vs 3.38 s plain at sf0.1 local[32] — the
  * chained 4-shuffle prefix job costs more than the small eager rounds
  * it replaces, so the plain form ships.
  * Run via: sbt "Test/runMain graft.tools.ProbeFixpointPrefix [sfDir]"
  */
object ProbeFixpointPrefix {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, dir)

    // the rejected variant, reproduced here so the measurement stays
    // repeatable: identical to connectedComponentsFixpoint except the
    // first `prefix` rounds fold into the seed plan before the loop.
    // Runs under the SAME round-scoped 8-partition child session as the
    // shipped baseline (ADVICE r10: the round-10 measurement ran this
    // variant at the 32-partition session default, confounding the prefix
    // effect with partition overhead — measured 7.1 vs 3.5 s on its own).
    def prefixedFixpoint(pairs0: DataFrame, prefix: Int,
                         roundPartitions: Int = 8): DataFrame = {
      import org.apache.spark.sql.types.DecimalType
      import org.apache.spark.storage.StorageLevel
      val child = Dedup.roundScopedSession(pairs0.sparkSession, roundPartitions)
      val pairs = if (child eq pairs0.sparkSession) pairs0
        else org.apache.spark.sql.GraftColumnBridge.ofRows(child, pairs0)
      val undirected = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val vertices = undirected.select(col("src")).distinct()
      val edges = undirected
        .union(vertices.select(col("src"), col("src").as("dst")))
        .repartition(col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      def round(l: DataFrame): DataFrame =
        edges.join(l, edges("dst") === l("doc_id"))
          .groupBy(edges("src").as("doc_id"))
          .agg(min(col("cluster_id")).as("cluster_id"))
      def labelSum(df: DataFrame): java.math.BigDecimal =
        df.agg(sum(col("cluster_id").cast(DecimalType(38, 0)))).head() match {
          case r if r.isNullAt(0) => java.math.BigDecimal.ZERO
          case r => r.getDecimal(0)
        }
      var seed = edges.filter(col("src") === col("dst"))
        .select(col("src").as("doc_id"), col("src").as("cluster_id"))
      (1 to prefix).foreach(_ => seed = round(seed))
      var labels = seed.localCheckpoint(true)
      var prevSum = labelSum(labels)
      var converged = false
      var rounds = 0
      while (!converged && rounds < 64) {
        val next = round(labels).localCheckpoint(true)
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = next
        rounds += 1
      }
      try labels finally edges.unpersist(blocking = false)
    }

    def run(prefix: Int): Double = {
      val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.2)
      val t0 = System.nanoTime()
      if (prefix > 0)
        prefixedFixpoint(pairs, prefix)
          .write.format("noop").mode("overwrite").save()
      else {
        Dedup.connectedComponentsFixpoint(pairs, roundPartitions = 8)
          .write.format("noop").mode("overwrite").save()
        Dedup.releaseComponentCache(spark)
      }
      (System.nanoTime() - t0) / 1e9
    }
    run(4); run(0) // warmup both plan shapes
    val (on, off) = (1 to 5).map { i =>
      val a = run(4)
      val b = run(0)
      println(f"[probe] round $i: prefix4 $a%6.2f s, prefix0 $b%6.2f s")
      (a, b)
    }.unzip
    println(f"[probe] median prefix4 ${on.sorted.apply(2)}%6.2f s, " +
      f"prefix0 ${off.sorted.apply(2)}%6.2f s")
    spark.stop()
  }
}
