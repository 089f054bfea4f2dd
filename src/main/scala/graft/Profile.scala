package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.model.Tables

/** Scratch stage profiler: times the component stages of the dedup-family
  * queries to locate the real cost. runMain graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, dir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }
    time("warmup count")(docs.count())
    time("tokens only")(docs.select(explode(tokens(col("text")))).count())
    time("shingles")(docs.select(explode(shingles(col("text"), 3))).count())
    time("shingleHashes")(docs.select(explode(shingleHashes(col("text"), 3))).count())
    time("minhash signatures")(
      graft.operators.Dedup.minhashSignatures(docs).count())
    time("simhash")(graft.operators.Dedup.simhash(docs).count())
    time("ngram join only") {
      val sh = docs.select(col("doc_id"), explode(shingleHashes(col("text"), 3)).as("h"))
      sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id")).count()
    }
    spark.stop()
  }
}
