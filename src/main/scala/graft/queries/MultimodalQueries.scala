package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing coverage: documents' text re-encoded as a binary
  * payload column, then pushed through the mapPartitions decode /
  * frame-sample operators. The stub codec is md5-derived, so DuckDB can
  * replay the exact metadata — the oracle checks the whole binary
  * round-trip (encode → bytes → digest → struct), not just SQL math.
  */
object MultimodalQueries {

  /** Image-metadata decode over a binary column. */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.withImageMeta(withPayload, "payload")
      .select(col("doc_id"),
        col("media_meta.byte_len").as("byte_len"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        col("media_meta.channels").as("channels"))
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text))::BIGINT AS byte_len,
      |  64 + ('0x'||substr(md5(text),1,4))::INT % 1985 AS width,
      |  64 + ('0x'||substr(md5(text),5,4))::INT % 1985 AS height,
      |  3 AS channels
      |FROM documents""".stripMargin

  /** Every-6th-frame sampling of a 24-"frame" payload. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.sampleFrames(withPayload, "doc_id", "payload",
      frameCount = 24, everyN = 6)
  }

  val frameSampleSql: String =
    """SELECT doc_id, f AS frame_idx,
      |  (f * greatest(octet_length(encode(text)) // 24, 1))::BIGINT AS byte_offset
      |FROM documents, unnest([0, 6, 12, 18]) t(f)""".stripMargin

  /** Feature extraction (Array[Float] embedding per payload). The
    * registered output lifts each float32 feature to a scaled long
    * (`round(f * 1e6)`) rendered as a CSV string — the same
    * integer-lift pattern as money-to-cents — because raw array<float>
    * columns aren't orderable by the harness canonicalizer. The oracle
    * replays the EXACT float32 pipeline via DuckDB FLOAT4 arithmetic
    * (verified bit-equal to JVM float math for all 256 byte values), so
    * this checks the real float path, not just the digest bytes. The
    * raw-array path stays spec-tested in MultimodalSpec. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.withFeatures(withPayload, "payload", dim = 16)
      .select(col("doc_id"),
        array_join(transform(col("features"),
          f => round(f.cast("double") * 1e6).cast("long").cast("string")),
          ",").as("features_scaled"))
  }

  /** One FLOAT4 term per feature dim, mirroring FakeCodec.features:
    * byte j = digest((i*7+3) % 16); f = (j/255f)*2f - 1f. */
  val mediaFeaturesSql: String = {
    val terms = (0 until 16).map { i =>
      val j = (i * 7 + 3) % 16
      s"round((((('0x'||substr(md5(text),${j * 2 + 1},2))::INT::FLOAT4 / 255::FLOAT4) * 2::FLOAT4) - 1::FLOAT4)::DOUBLE * 1000000)::BIGINT::VARCHAR"
    }
    s"""SELECT doc_id, concat_ws(',', ${terms.mkString(",\n  ")}) AS features_scaled
       |FROM documents""".stripMargin
  }

  /** Doc-level multimodal FUSION (the composition the pieces exist
    * for): image-text pair dedup where candidates come from either
    * modality's blocking (text MinHash bands ∪ image LSH buckets) and
    * pairs survive a fused Jaccard+cosine score. The oracle replays
    * EVERYTHING: the FLOAT4 stub-codec embedding, the literal
    * hyperplane projections, the md5-portable MinHash banding, exact
    * shingle Jaccard, and the fused-score arithmetic.
    *
    * Blocking shape: an oracle pin must be a FIXED bucket function
    * (static SQL can't read the corpus count), so this query pins the
    * shape the ADAPTIVE default path chooses at the largest corpus the
    * driver benches (sf1.0, 50k docs): 12 image bits
    * ([[graft.operators.Similarity.adaptiveHyperplaneBits]](50000)) and
    * 8×6 text bands ([[graft.operators.Dedup.adaptiveBandShape]]
    * (50000)). r9 pinned the sf0.01-ish shape (8 bits, 4×4) and paid
    * 15.3× wall at 10× data from saturated buckets — a pinned shape
    * should be sized for the biggest corpus it will ever see, and the
    * un-pinned operator default self-sizes (fusionscale row: ≤5.6× at
    * 10×). */
  val FusionBits = 12
  val FusionBands = 8
  val FusionRows = 6
  def multimodalFusion(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        encode(col("text"), "UTF-8").as("payload"))
    graft.operators.Fusion.imageTextNearDupPairs(withPayload,
      "doc_id", "text", "payload", dim = 16, shingleN = 3,
      numHashes = FusionBands * FusionRows, bands = FusionBands,
      nBits = FusionBits, minFused = 0.6,
      seed = 42L, planeSeed = 7L, portable = true)
  }

  val multimodalFusionSql: String = {
    import graft.operators.{Dedup, Similarity}
    val P = Dedup.MersennePrime31
    // FLOAT4 stub-codec features (q31 replay), kept as FLOAT4 columns;
    // every consumer widens with ::DOUBLE exactly like the JVM
    val featCols = (0 until 16).map { j =>
      val k = (j * 7 + 3) % 16
      s"((('0x'||substr(md5(text),${k * 2 + 1},2))::INT::FLOAT4 / 255::FLOAT4) * 2::FLOAT4 - 1::FLOAT4) AS f$j"
    }.mkString(",\n  ")
    // hyperplane projections: strict left-to-right Σ f_j * plane_ij in
    // double — the VectorDot fold order
    val planes = Similarity.hyperplanes(dim = 16, nBits = FusionBits, seed = 7L)
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      val proj = (0 until 16).map(j => s"f$j::DOUBLE * (${p(j)})").mkString(" + ")
      s"(CASE WHEN ($proj) > 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END)"
    }.mkString(" + ")
    val normExpr = (0 until 16).map(j => s"f$j::DOUBLE * f$j::DOUBLE")
      .mkString("sqrt(", " + ", ")")
    val dotExpr = (0 until 16).map(j => s"fa.f$j::DOUBLE * fb.f$j::DOUBLE")
      .mkString(" + ")
    // portable MinHash + banding at the pinned sf1.0-adaptive shape
    val nh = FusionBands * FusionRows
    val mins = Dedup.hashParams(nh, 42L).zipWithIndex.map { case ((a, b), i) =>
      s"min((h*$a + $b) % $P) AS mh_$i"
    }.mkString(",\n  ")
    val bandSelects = (0 until FusionBands).map { b =>
      val comps = (0 until FusionRows).map(r => s"mh_${b * FusionRows + r}").mkString(",")
      s"SELECT doc_id, $b AS band_idx, md5(array_to_string([$comps], ',')) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${DedupQueries.shingleCtes(3)},
       |f AS MATERIALIZED (SELECT doc_id,
       |  $featCols
       |  FROM documents WHERE text IS NOT NULL),
       |b AS MATERIALIZED (SELECT doc_id, $bucketExpr AS ibucket, $normExpr AS inorm FROM f),
       |h AS MATERIALIZED (SELECT doc_id, ('0x'||substr(md5(shingle),1,15))::BIGINT % $P AS h
       |      FROM sh WHERE shingle IS NOT NULL),
       |sig AS MATERIALIZED (SELECT doc_id,
       |  $mins
       |  FROM h GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  $bandSelects),
       |tc AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b
       |       FROM bands x JOIN bands y
       |         ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
       |        AND x.doc_id < y.doc_id),
       |ic AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b
       |       FROM b x JOIN b y
       |         ON x.ibucket = y.ibucket AND x.doc_id < y.doc_id),
       |cand AS (SELECT id_a, id_b FROM tc UNION SELECT id_a, id_b FROM ic),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |common AS (SELECT id_a, id_b, count(*) AS common
       |           FROM cand
       |           JOIN sh a ON a.doc_id = id_a
       |           JOIN sh b ON b.doc_id = id_b AND b.shingle = a.shingle
       |           GROUP BY 1, 2),
       |v AS (SELECT c.id_a, c.id_b,
       |        coalesce(cm.common, 0)::DOUBLE
       |          / (sa.n_sh + sb.n_sh - coalesce(cm.common, 0)) AS jaccard,
       |        (1000000 * coalesce(cm.common, 0))
       |          // (sa.n_sh + sb.n_sh - coalesce(cm.common, 0)) AS jac_ppm,
       |        round(($dotExpr) / (na.inorm * nb.inorm), 6) AS cosine
       |      FROM cand c
       |      LEFT JOIN common cm ON cm.id_a = c.id_a AND cm.id_b = c.id_b
       |      JOIN sizes sa ON sa.doc_id = c.id_a
       |      JOIN sizes sb ON sb.doc_id = c.id_b
       |      JOIN f fa ON fa.doc_id = c.id_a
       |      JOIN f fb ON fb.doc_id = c.id_b
       |      JOIN b na ON na.doc_id = c.id_a
       |      JOIN b nb ON nb.doc_id = c.id_b)
       |SELECT id_a, id_b, jaccard, cosine,
       |  (jac_ppm + CAST(floor(cosine*1000000 + 0.5) AS BIGINT)) // 2
       |    AS fused_ppm
       |FROM v
       |WHERE (jac_ppm + CAST(floor(cosine*1000000 + 0.5) AS BIGINT)) // 2
       |  >= 600000""".stripMargin
  }

  /** Ingestion-order multimodal dedup: q80's incremental fold with
    * q79's fused blocking — docs arrive in 4 batches (doc_id % 4) and
    * a doc is admitted only if NEITHER its text MinHash bands NOR its
    * image hyperplane bucket collide with a same-batch smaller id or
    * an earlier-batch admitted doc ([[graft.streaming.StreamingDedup
    * .fusedBlocks]]). The steady-state shape of multimodal corpus
    * ingestion. */
  def fusedIncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val withPayload = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        encode(col("text"), "UTF-8").as("payload"))
    graft.streaming.StreamingDedup.incrementalDedupBlocked(
      withPayload, "doc_id",
      pmod(col("doc_id"), lit(4)).cast("int"), nBatches = 4,
      graft.streaming.StreamingDedup.fusedBlocks("doc_id", "text",
        "payload", dim = 16, shingleN = 3, numHashes = 16, bands = 4,
        nBits = 16, seed = 42L, planeSeed = 7L, portable = true))
  }

  val fusedIncrementalDedupSql: String = {
    import graft.operators.{Dedup, Similarity}
    val P = Dedup.MersennePrime31
    val featCols = (0 until 16).map { j =>
      val k = (j * 7 + 3) % 16
      s"((('0x'||substr(md5(text),${k * 2 + 1},2))::INT::FLOAT4 / 255::FLOAT4) * 2::FLOAT4 - 1::FLOAT4) AS f$j"
    }.mkString(",\n  ")
    val planes = Similarity.hyperplanes(dim = 16, nBits = 16, seed = 7L)
    val bucketExpr = planes.zipWithIndex.map { case (p, i) =>
      val proj = (0 until 16).map(j => s"f$j::DOUBLE * (${p(j)})").mkString(" + ")
      s"(CASE WHEN ($proj) > 0 THEN (1::BIGINT << $i) ELSE 0::BIGINT END)"
    }.mkString(" + ")
    val mins = Dedup.hashParams(16, 42L).zipWithIndex.map { case ((a, b), i) =>
      s"min((h*$a + $b) % $P) AS mh_$i"
    }.mkString(",\n  ")
    val bandSelects = (0 until 4).map { b =>
      val comps = (0 until 4).map(r => s"mh_${b * 4 + r}").mkString(",")
      s"SELECT doc_id, $b AS band_idx, md5(array_to_string([$comps], ',')) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    // same novelty unrolling as q80, over the fused block-key relation
    val novelCtes = (0 until 4).map { k =>
      val cross = if (k == 0) "" else {
        val prev = (0 until k).map(j => s"SELECT doc_id FROM novel$j")
          .mkString(" UNION ALL ")
        s"""
           |  AND NOT EXISTS (SELECT 1 FROM blocks x JOIN blocks y
           |    ON x.bk = y.bk
           |    WHERE x.doc_id = bt.doc_id AND y.doc_id IN ($prev))""".stripMargin
      }
      s"""novel$k AS (SELECT doc_id FROM bt WHERE b = $k
         |  AND NOT EXISTS (SELECT 1 FROM w WHERE w.doc_id = bt.doc_id)$cross)""".stripMargin
    }.mkString(",\n")
    val admitted = (0 until 4).map(k => s"SELECT doc_id FROM novel$k")
      .mkString(" UNION ALL ")
    s"""WITH ${DedupQueries.shingleCtes(3)},
       |f AS MATERIALIZED (SELECT doc_id,
       |  $featCols
       |  FROM documents WHERE text IS NOT NULL),
       |ib AS (SELECT doc_id, $bucketExpr AS ibucket FROM f),
       |h AS MATERIALIZED (SELECT doc_id, ('0x'||substr(md5(shingle),1,15))::BIGINT % $P AS h
       |      FROM sh WHERE shingle IS NOT NULL),
       |sig AS MATERIALIZED (SELECT doc_id,
       |  $mins
       |  FROM h GROUP BY doc_id),
       |bands AS MATERIALIZED (
       |  $bandSelects),
       |blocks AS (SELECT doc_id,
       |             't:'||band_idx::VARCHAR||':'||band_hash AS bk
       |           FROM bands
       |           UNION ALL
       |           SELECT doc_id, 'i:'||ibucket::VARCHAR FROM ib),
       |bt AS (SELECT doc_id, (doc_id % 4)::INT AS b FROM documents),
       |w AS (SELECT DISTINCT y.doc_id
       |      FROM blocks x JOIN blocks y
       |        ON x.bk = y.bk AND x.doc_id < y.doc_id
       |      JOIN bt bx ON bx.doc_id = x.doc_id
       |      JOIN bt byy ON byy.doc_id = y.doc_id AND byy.b = bx.b),
       |$novelCtes
       |SELECT doc_id, b AS ingest_batch FROM bt
       |WHERE doc_id IN ($admitted)""".stripMargin
  }

  def all: Seq[Q] = Seq(
    Q("q29_media_meta", mediaMeta, Some(mediaMetaSql)),
    Q("q30_frame_sample", frameSample, Some(frameSampleSql)),
    Q("q31_media_features", mediaFeatures, Some(mediaFeaturesSql)),
    Q("q79_multimodal_fusion", multimodalFusion, Some(multimodalFusionSql)),
    Q("q81_fused_incremental_dedup", fusedIncrementalDedup,
      Some(fusedIncrementalDedupSql)))
}
