package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Attribution probe for embed_neardup_lsh's scaling curve (round-12
  * verdict ask #4): is the 20k -> 200k decade's wall linear candidate-
  * verification work, or quadratic intra-cluster pair blowup?
  *
  * The fixture embeddings are gaussian resamples around the sf0.1 label
  * centroids, so bucket occupancy is SKEWED — mean occupancy n/2^bits
  * says nothing; the verify work is sum(occ^2) over buckets. This probe
  * measures, at each embeddings slice and the exact autoBits width the
  * wired query uses: raw bucket collisions (= cosine evaluations, the
  * in-stage verify work) and distinct candidate pairs. If collisions
  * grow ~10x for a 10x row step, the decade is linear verify work and
  * the occupancy targeting is doing its job; ~100x means the width
  * schedule is losing to cluster geometry.
  *
  * Run: sbt "Test/runMain graft.tools.ProbeLshCandidates"
  */
object ProbeLshCandidates {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dirs = Seq("/root/testdata/sf0.1/embeddings.parquet",
      "target/sf1x/embeddings.parquet", "target/sf3x/embeddings.parquet")
    dirs.foreach { p =>
      val emb = spark.read.parquet(p)
      val n = emb.count()
      val bits = Similarity.autoBits(n)
      val idx = Similarity.lshIndex(emb, dim = 64, nBits = bits,
        tables = 8, seed = 42L).select(col("vec_id"), col("table_id"),
        col("bucket"))
      // raw collisions: per-(table,bucket) occ*(occ-1)/2, summed — the
      // number of cosine evaluations the in-join verify performs
      val collisions = idx.groupBy(col("table_id"), col("bucket"))
        .agg(count(lit(1)).as("occ"))
        .agg(sum(col("occ") * (col("occ") - 1)).as("c"))
        .collect()(0).getLong(0) / 2
      val distinctPairs = idx.as("a").join(idx.as("b"),
          col("a.table_id") === col("b.table_id") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
      val occTop = idx.groupBy(col("table_id"), col("bucket"))
        .agg(count(lit(1)).as("occ")).orderBy(col("occ").desc)
        .limit(3).collect().map(_.getLong(2)).mkString(",")
      // survivors = the OUTPUT of the wired query at its 0.4 threshold:
      // if this grows ~quadratically the task itself is pair-dense on
      // this clustered fixture and any correct kernel pays >= output
      val survivors = Similarity.nearDupPairsLsh(emb, threshold = 0.4,
        dim = 64, nBits = bits, tables = 8, seed = 42L).count()
      println(f"[probe] $p%-40s n=$n%7d bits=$bits " +
        f"collisions=$collisions%12d distinct_pairs=$distinctPairs%12d " +
        f"survivors=$survivors%12d top_occ=$occTop")
    }
    spark.stop()
  }
}
