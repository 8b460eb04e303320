package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * (image/audio/video) ride through the engine as opaque `binary`
  * columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-local iterator transforms
  * (`mapPartitions` — the Scala analog of arrow-batched Python UDFs:
  * one JVM-side pass per partition, no per-row driver involvement, no
  * shuffle).
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[FakeCodec]] derives deterministic pseudo-metadata and
  * pseudo-features from the bytes (md5-seeded). The Spark-side
  * contract — schemas, null handling, batch shape, partition
  * parallelism — is the real thing; swap [[FakeCodec]] for a JNI/lib
  * codec without touching the dataflow.
  *
  * Scale notes: all operators are narrow (scan-side) transformations —
  * media blobs are never shuffled; only extracted metadata/features
  * (small) flow into downstream joins/aggregations. Partition sizing
  * for blob tables is governed by files.maxPartitionBytes, not row
  * count.
  */
object Multimodal {

  /** Deterministic stand-in for a real media codec (???-equivalent,
    * clearly marked): every output is a pure function of the input
    * bytes via md5, so tests and oracles can replay it exactly. */
  object FakeCodec {
    def headerHash(bytes: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(bytes)

    /** Pseudo image metadata: (width, height, channels). A real
      * implementation reads the codec header instead. */
    def imageMeta(bytes: Array[Byte]): (Int, Int, Int) = {
      val h = headerHash(bytes)
      (64 + (((h(0) & 0xFF) << 8 | (h(1) & 0xFF)) % 1985),
        64 + (((h(2) & 0xFF) << 8 | (h(3) & 0xFF)) % 1985),
        3)
    }

    /** Pseudo feature vector: `dim` floats folded from the digest. A
      * real implementation runs a vision/audio model on the batch. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val h = headerHash(bytes)
      Array.tabulate(dim) { i =>
        val b = h((i * 7 + 3) % h.length) & 0xFF
        (b.toFloat / 255.0f) * 2.0f - 1.0f
      }
    }

    /** Pseudo frame offsets for an every-nth-frame sample of a "video"
      * of `frameCount` frames. */
    def frameOffsets(byteLen: Long, frameCount: Int, everyN: Int): Seq[Long] = {
      val frameSize = math.max(byteLen / math.max(frameCount, 1), 1L)
      (0 until frameCount by everyN).map(_ * frameSize)
    }
  }

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** Decode-metadata pass: binary column → metadata struct, one
    * partition-local iterator pass (rows with null payload get a null
    * struct). Output schema = input ++ metaCol struct. */
  def withImageMeta(df: DataFrame, binCol: String,
      metaCol: String = "media_meta"): DataFrame = {
    val schema = df.schema.add(metaCol, imageMetaSchema, nullable = true)
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta = if (r.isNullAt(idx)) null else {
          val bytes = r.getAs[Array[Byte]](idx)
          val (w, h, c) = FakeCodec.imageMeta(bytes)
          Row(bytes.length.toLong, w, h, c)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Feature-extraction pass: binary column → Array[Float] embedding
    * (batched per partition; the place a real pipeline would hand the
    * buffer batch to a model runtime). */
  def withFeatures(df: DataFrame, binCol: String, dim: Int,
      featCol: String = "features"): DataFrame = {
    val schema = df.schema.add(featCol, ArrayType(FloatType), nullable = true)
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = if (r.isNullAt(idx)) null
          else FakeCodec.features(r.getAs[Array[Byte]](idx), dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** [[withFeatures]] with FIXED-SIZE MICRO-BATCHING inside each
    * partition — the GPU/accelerator inference shape: a model scores
    * `batchSize` payloads per call (amortizing per-call overhead and
    * filling device memory), rows stream through without materializing
    * the partition. The batch function receives the raw byte payloads
    * of one micro-batch and returns one feature array per payload,
    * order-preserving; null payloads bypass the batch (null features).
    * [[FakeCodec]] stands in for the model; the batching, ordering,
    * and null contracts are the real thing. */
  def withFeaturesBatched(df: DataFrame, binCol: String, dim: Int,
      batchSize: Int,
      featCol: String = "features"): DataFrame = {
    require(batchSize > 0)
    val schema = df.schema.add(featCol, ArrayType(FloatType), nullable = true)
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val payloads = batch.collect {
          case r if !r.isNullAt(idx) => r.getAs[Array[Byte]](idx)
        }
        // one "model call" per micro-batch (here: FakeCodec per item)
        val feats = payloads.map(FakeCodec.features(_, dim)).iterator
        batch.map { r =>
          val f = if (r.isNullAt(idx)) null else feats.next()
          Row.fromSeq(r.toSeq :+ f)
        }
      }
    }(enc)
  }

  /** Frame-sampling pass for "video" payloads: every-nth-frame offsets
    * as an exploded (id, frame_idx, byte_offset) frame table. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameCount: Int, everyN: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("byte_offset", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(binIdx)) Iterator.empty
        else {
          val len = r.getAs[Array[Byte]](binIdx).length.toLong
          FakeCodec.frameOffsets(len, frameCount, everyN).zipWithIndex.iterator
            .map { case (off, i) => Row(r.get(idIdx), i * everyN, off) }
        }
      }
    }(enc)
  }
}
