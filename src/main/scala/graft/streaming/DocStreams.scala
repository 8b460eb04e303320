package graft.streaming

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming document curation/dedup: the incremental form of the
  * corpus pipeline — documents arrive as files, per-doc quality metrics
  * are stateless scan-side transforms (identical code path to batch),
  * and near-duplicate detection runs as MinHash-LSH with per-bucket
  * keyed state: each arriving document is banded scan-side
  * ([[Dedup.withMinHashSignature]] — no shuffle, no streaming agg) and
  * matched against previously-seen documents in its LSH buckets via
  * `flatMapGroupsWithState`.
  *
  * Scale notes: state is per (band_idx, band_hash) bucket — keys are
  * hashes, so state partitions evenly across executors; each bucket
  * holds only the doc ids that collided there (near-dup clusters),
  * not the corpus. Production deployments bound state with a timeout
  * (dedup horizons are typically windows, not forever); the NoTimeout
  * form here matches the batch semantics for parity testing.
  */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** File-backed stream of JSON-lines document files dropped into `dir`. */
  def readJsonStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).json(dir)

  /** Per-doc repetition quality metrics on a stream: stateless, so the
    * batch operator runs unchanged. */
  def repetitionStats(docs: DataFrame): DataFrame =
    Curation.repetitionStats(docs, "doc_id", "text")

  final case class BandedDoc(doc_id: Long, band_idx: Int, band_hash: String)
  final case class CandidatePair(id_a: Long, id_b: Long)

  /** Scan-side signature + banding for a (doc_id, text) frame — works on
    * batch and streaming frames identically. */
  def banded(docs: DataFrame, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 16, seed: Long = 42L,
      portable: Boolean = false): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    Dedup.bandedSignatures(
      Dedup.withMinHashSignature(docs, "doc_id", "text",
        shingleN, numHashes, seed, portable),
      "doc_id", bands, numHashes / bands, portable)
      .select(col("doc_id"), col("band_idx"), col("band_hash"))
      .as[BandedDoc]
  }

  /** Stateful LSH bucket matcher: every document joining a bucket emits
    * a candidate pair with each document already in that bucket. Pairs
    * may repeat across buckets/micro-batches (exactly like the batch
    * self-join before its distinct); consumers dedup downstream. */
  def lshCandidates(bandedDocs: Dataset[BandedDoc]): Dataset[CandidatePair] = {
    import bandedDocs.sparkSession.implicits._
    bandedDocs.groupByKey(b => (b.band_idx, b.band_hash))
      .flatMapGroupsWithState[Seq[Long], CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, docs: Iterator[BandedDoc], state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty[Long])
          val newIds = docs.map(_.doc_id).toVector.distinct.sorted
            .filterNot(seen.contains)
          val pairs = for {
            (id, idx) <- newIds.zipWithIndex
            other <- seen ++ newIds.take(idx)
          } yield
            if (other < id) CandidatePair(other, id) else CandidatePair(id, other)
          if (newIds.nonEmpty) state.update(seen ++ newIds)
          pairs.distinct.iterator
      }
  }

  /** Run a streaming query over `inputDir` into an in-memory table,
    * processing everything currently available (test/demo utility). */
  def runToMemory(spark: SparkSession, inputDir: String, name: String,
      transform: DataFrame => DataFrame,
      outputMode: OutputMode = OutputMode.Append()): DataFrame = {
    val q = transform(readJsonStream(spark, inputDir))
      .writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
