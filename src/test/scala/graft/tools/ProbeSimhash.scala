package graft.tools
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.model.Tables
import graft.operators.Dedup
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    for (dir <- args) {
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
      val sh = Dedup.simhash(docs)
      val j = pairs
        .join(sh.select($"doc_id".as("doc_a"), $"simhash".as("sh_a")), "doc_a")
        .join(sh.select($"doc_id".as("doc_b"), $"simhash".as("sh_b")), "doc_b")
        .select($"jaccard", bit_count($"sh_a".bitwiseXOR($"sh_b")).as("hamming"))
        .as[(Double, Int)].collect()
      val maxH = if (j.isEmpty) -1 else j.map(_._2).max
      println(s"[sh] $dir pairs=${j.length} maxHamming=$maxH " +
        s"byJac=${j.sortBy(_._1).take(3).mkString(",")}")
    }
    spark.stop()
  }
}
