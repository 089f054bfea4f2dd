package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Emulated Kafka topic (reference topics T1/T2/T4,
  * application.properties:12,21,26,27).
  *
  * No spark-sql-kafka connector jar ships in /opt/spark/jars (SURVEY.md
  * §7.1), so transport is a directory of JSON files: append-only and
  * replayable-by-offset — the two properties a Structured Streaming source
  * needs — with the reference's exact JSON wire format on disk. The operator
  * layer never sees the transport: swap `FileTopic` for a `format("kafka")`
  * reader/writer behind the same trait in a connector-present deployment.
  */
trait Topic {
  def name: String
  def schema: StructType

  /** Producer side (≙ KafkaProducer / StreamBridge.send). */
  def append(df: DataFrame): Unit

  /** Streaming consumer side (≙ KStream source). */
  def stream(spark: SparkSession): DataFrame

  /** Batch view of everything published so far (for parity tests / oracles). */
  def batch(spark: SparkSession): DataFrame

  /** Streaming sink side: write each micro-batch of a query to this topic.
    * Implementations MUST be idempotent per batchId: foreachBatch
    * re-delivers a batch after recovery, and at-least-once appends would
    * show duplicates to every downstream consumer. Deliberately abstract —
    * a default that appended would silently violate the contract for any
    * implementation that forgot to override it.
    */
  def sinkBatch(df: DataFrame, batchId: Long): Unit
}

/** @param wireFormat any file-based datasource name or FileFormat class —
  *   "json" (default; the reference's human-readable wire) or e.g. the
  *   Avro FileFormat for a compact binary wire. The operator layer is
  *   identical either way; that indifference is the Topic contract.
  */
final class FileTopic(val name: String, val schema: StructType, root: String,
                      wireFormat: String = "json")
    extends Topic {
  val dir = s"$root/$name"
  new java.io.File(dir).mkdirs()

  override def append(df: DataFrame): Unit =
    df.write.mode("append").format(wireFormat).save(dir)

  /** Exactly-once under foreachBatch replay: each micro-batch lands in a
    * batchId-named subpath. A replayed batchId whose _SUCCESS marker exists
    * is skipped; a partial dir from a crash (no marker) is overwritten.
    * The marker check goes through the Hadoop FileSystem resolved from the
    * path — java.io.File would silently report "absent" for every
    * non-local root (hdfs://, s3a://), turning the skip into dead code on
    * exactly the deployments the Topic swap point is for.
    */
  override def sinkBatch(df: DataFrame, batchId: Long): Unit = {
    val path = s"$dir/batch-$batchId"
    val marker = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val fs = marker.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker))
      df.write.mode("overwrite").format(wireFormat).save(path)
  }

  override def stream(spark: SparkSession): DataFrame =
    spark.readStream.schema(schema)
      // bound per-trigger work so a large backlog replays incrementally
      // instead of as one giant first micro-batch
      .option("maxFilesPerTrigger", 64)
      // batch subpaths from sinkBatch live one level down
      .option("recursiveFileLookup", "true")
      .format(wireFormat).load(dir)

  override def batch(spark: SparkSession): DataFrame =
    spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .format(wireFormat).load(dir)
}

object Topics {
  /** The reference's topic wiring (application.properties is authoritative
    * over the README — SURVEY.md §2.3.6): /publish -> T1 -> console;
    * supplier -> T2 -> stream job -> T4.
    */
  val T1 = "T1"
  val T2 = "T2"
  val T4 = "T4"
}
