package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the lexical sibling of [[IvfIndex]]: the
  * build-once/query-many shape for term lookups over a corpus too
  * large to re-tokenize per query (decontamination probes, "which
  * documents mention X" audits, candidate retrieval feeding
  * [[Retrieval.bm25TopK]] re-ranking).
  *
  * Layout (mirrors IvfIndex's contract exactly):
  *
  *   path/postings/ingest_batch=N/bucket=B/   (term, doc_id, tf)
  *   path/gen/gen=G/{postings/bucket=B, stats} (committed compaction folds)
  *   path/meta                                (n_buckets)
  *
  * `bucket = portable_hash(term) mod n_buckets` is a DISCOVERED
  * partition column, so a query's term list compiles into a literal
  * `bucket IN (…)` predicate and the scan prunes every non-probed
  * bucket directory — a q-term lookup reads ~q/n_buckets of the index
  * no matter how large the corpus grows. The hash is the engine-exact
  * portable one ([[Dedup.stringHash]]), recomputable driver-side, so
  * routing needs no Spark job. Each increment lands in its own
  * `ingest_batch=N` directory with overwrite: a crashed-then-replayed
  * append replaces its own torn output (same idempotency contract as
  * IvfIndex.append / StreamingDedup's index). Append batches must be
  * NEW documents — per-(term,doc) tf rows are unioned across batch
  * directories at read time, so re-ingesting a doc under a new batch
  * id would double-count it (dedup upstream; [[Dedup]] is the tool).
  *
  * Tokenization is the corpus convention shared with Retrieval /
  * TextAnalysis (lower → trim → whitespace split), so oracle SQL
  * replays the postings relation verbatim.
  */
object InvertedIndex {

  /** The portable 60-bit string hash, computed driver-side: identical
    * to `Dedup.stringHash(c, portable = true)` (first 15 hex chars of
    * md5 as a long), so term→bucket routing never needs a Spark job. */
  def portableHashLocal(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  def bucketOfLocal(term: String, nBuckets: Int): Int =
    java.lang.Math.floorMod(portableHashLocal(term), nBuckets.toLong).toInt

  /** Postings relation of one batch: (term, doc_id, tf[, positions],
    * bucket) — positions are the 0-based token offsets, sorted, which
    * makes the index PHRASE-capable (see [[phraseSearch]]) at the cost
    * of one int per token occurrence; `positional = false` skips them
    * for BM25/lookup-only indexes (r7 measured the position arrays at
    * ~2× search wall on sf1.0 — pay for phrase capability only when a
    * caller needs it). */
  private def postingsOf(batch: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, positional: Boolean): DataFrame = {
    // denormalized doc length (the search-engine norm-in-posting layout,
    // so BM25 scoring off the index needs no doclens join at query
    // time) is computed SCAN-SIDE before the explode: len_d = Σtf over
    // the doc's terms ≡ the doc's non-empty token count, a size() on
    // the token array — where the previous shape paid a full
    // shuffle+sort window over the posting rows at every build/append
    // to recover a number the scan already knew (guide §2.4: remove
    // shuffles outright). The array is materialized in its own
    // projection before the HOF references it (lambda-inlined
    // expressions re-evaluate per element — the Dedup.shingles rule).
    val grouped = batch
      .select(col(idCol).as("doc_id"),
        TextAnalysis.whitespaceTokens(lower(trim(col(textCol)))).as("__toks"))
      // array_remove, NOT the filter() HOF: higher-order functions are
      // CodegenFallback and would break whole-stage codegen for the
      // entire tokenize+explode stage (measured 1.5× on q110)
      .select(col("doc_id"),
        size(array_remove(col("__toks"), "")).cast("long").as("__len"),
        posexplode(col("__toks")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id"))
    val agged =
      if (positional)
        grouped.agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("pos"))).as("positions"),
          max(col("__len")).as("len_d"))
      else grouped.agg(count(lit(1)).as("tf"), max(col("__len")).as("len_d"))
    agged
      .withColumn("bucket",
        pmod(Dedup.stringHash(col("term"), portable = true),
          lit(nBuckets.toLong)).cast("int"))
  }

  private def writeIncrement(batch: DataFrame, idCol: String,
      textCol: String, nBuckets: Int, positional: Boolean, path: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    postingsOf(batch, idCol, textCol, nBuckets, positional)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$path/postings/ingest_batch=$batchId")
    // per-batch corpus stats (docs with ≥1 token, total tokens) read
    // back from the 2 written columns — KBs, summed across batches at
    // query time; same overwrite idempotency as the postings
    spark.read.parquet(s"$path/postings/ingest_batch=$batchId")
      .groupBy(col("doc_id")).agg(max(col("len_d")).as("len_d"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len_d")).as("tot_len"))
      .write.mode("overwrite").parquet(s"$path/stats/ingest_batch=$batchId")
  }

  /** Build the index from scratch (deletes any previous tree first —
    * stale increments of an older index must not survive).
    * `positions = false` builds the lean lookup/BM25-only variant;
    * the flag is recorded in meta so appends stay schema-consistent
    * and [[phraseSearch]] can refuse loudly. */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, path: String, positions: Boolean = true): Unit = {
    require(nBuckets >= 1, s"nBuckets $nBuckets")
    val spark = corpus.sparkSession
    val root = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.delete(root, true)
    // stats increments of the previous index must die with it too —
    // load() sums the whole stats dir, so a stale stats/ingest_batch=N
    // from before the rebuild would inflate n_docs/tot_len and skew
    // every bm25Search score — and so must compaction folds and
    // retention marks of the previous index
    Seq("stats", "gen", "retention").foreach { sub =>
      val p = new org.apache.hadoop.fs.Path(s"$path/$sub")
      if (fs.exists(p)) fs.delete(p, true)
    }
    writeIncrement(corpus, idCol, textCol, nBuckets, positions, path,
      batchId = 0L)
    import spark.implicits._
    Seq((nBuckets, positions)).toDF("n_buckets", "positional")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Append an increment of NEW documents without rebuilding; the
    * increment inherits the index's recorded positional mode. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String, batchId: Option[Long] = None): Long = {
    val (nBuckets, positional) = loadMeta(spark, path)
    val id = batchId.getOrElse(nextBatchId(spark, path))
    writeIncrement(batch, idCol, textCol, nBuckets, positional, path, id)
    id
  }

  def nextBatchId(spark: SparkSession, path: String): Long = {
    val fs = hfs(spark, path)
    val maxInc = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/postings"), "ingest_batch=")
      .map(_._1).maxOption.map(_ + 1).getOrElse(0L)
    // ids below a committed fold are COVERED (their directories are
    // retention-reclaimed) and must never be reissued
    val (boundary, _) = coveredBoundary(spark, path)
    math.max(maxInc, if (boundary == Long.MinValue) 0L else boundary)
  }

  private def listNumDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, prefix: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { s =>
      val name = s.getPath.getName
      val suffix = name.stripPrefix(prefix)
      if (name.startsWith(prefix) && suffix.nonEmpty &&
        suffix.forall(_.isDigit))
        scala.util.Try(suffix.toLong).toOption.map(n => (n, s.getPath))
      else None
    }

  private def hfs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** The compaction boundary: increments strictly below it are folded
    * into (and shadowed by) the newest COMMITTED `gen=` fold under
    * `path/gen` ([[HammingIndex]]'s covered-boundary contract).
    * Long.MinValue when never compacted. */
  private def coveredBoundary(spark: SparkSession, path: String)
      : (Long, Option[org.apache.hadoop.fs.Path]) = {
    val fs = hfs(spark, path)
    listNumDirs(fs, new org.apache.hadoop.fs.Path(s"$path/gen"), "gen=")
      .filter { case (_, p) =>
        Seq("_SUCCESS", "_GRAFT_COMMITTED").exists(m =>
          fs.exists(new org.apache.hadoop.fs.Path(p, m)))
      }
      .sortBy(_._1).lastOption
      .map { case (g, p) => (g, Some(p)) }
      .getOrElse((Long.MinValue, None))
  }

  private def loadMeta(spark: SparkSession, path: String): (Int, Boolean) = {
    val row = spark.read.parquet(s"$path/meta")
      .select(col("n_buckets"), col("positional")).head()
    (row.getInt(0), row.getBoolean(1))
  }

  final case class Index(postings: DataFrame, nBuckets: Int,
      positional: Boolean, stats: DataFrame)

  /** Served postings/stats: the newest committed compaction fold (if
    * any) plus the `ingest_batch=` increments it does not cover —
    * increments below the boundary are shadowed even if their
    * directories still exist (retention sweeps them one janitor cycle
    * AFTER the fold that covered them; serving must not double-count
    * in the window). Bucket stays a discovered partition column on both
    * legs, so term-probe pruning is unchanged. */
  def load(spark: SparkSession, path: String): Index = {
    val (nBuckets, positional) = loadMeta(spark, path)
    val (boundary, genDir) = coveredBoundary(spark, path)
    val fs = hfs(spark, path)
    val liveBatches = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/postings"), "ingest_batch=")
      .filter(_._1 >= boundary)
    val livePostings =
      if (liveBatches.isEmpty) None
      else Some(spark.read.option("basePath", s"$path/postings")
        .parquet(liveBatches.map(_._2.toString): _*)
        .drop("ingest_batch"))
    val genPostings = genDir.map(p =>
      spark.read.parquet(s"${p.toString}/postings"))
    val postings = (genPostings, livePostings) match {
      case (Some(g), Some(l)) => g.unionByName(l)
      case (Some(g), None) => g
      case (None, Some(l)) => l
      case (None, None) => throw new IllegalStateException(
        s"InvertedIndex at $path has no postings (no increments, no fold)")
    }
    val liveStats = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/stats"), "ingest_batch=")
      .filter(_._1 >= boundary).map(_._2.toString)
    val statsDirs = genDir.map(p => s"${p.toString}/stats").toSeq ++ liveStats
    Index(postings, nBuckets, positional,
      spark.read.parquet(statsDirs: _*)
        .select(col("n_docs"), col("tot_len")))
  }

  /** IN-PLACE compaction + retention for a forever-appended index: fold
    * the previous committed fold and every increment strictly below
    * `upTo` into one committed `path/gen/gen=upTo` unit (postings
    * re-partitioned by bucket + the summed stats row, one atomic
    * CAS-published directory), then MARK the covered increment and
    * superseded fold directories for the next janitor pass to sweep
    * ([[graft.streaming.Retention.markSweepUnits]] — one cycle of
    * reader grace, the [[HammingIndex.compactIncrements]] contract).
    * Serving stays correct at every point: [[load]] reads the newest
    * committed fold plus uncovered increments only. Stats fold by
    * SUMMING (append batches are disjoint documents — the documented
    * ingest contract), so compaction never rescans document text. */
  def compactPostings(spark: SparkSession, path: String,
      upTo: Long): Unit = {
    require(upTo > 0, s"upTo must be positive, got $upTo")
    val fs = hfs(spark, path)
    val (boundary, genDir) = coveredBoundary(spark, path)
    val allIncs = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/postings"), "ingest_batch=")
      .filter(_._1 < upTo)
    val live = allIncs.filter(_._1 >= boundary)
    // replay/race with gen=upTo already committed: skip the re-fold,
    // proceed to the marks (sweeping an earlier pass's marks on the way)
    val dstCommitted = boundary == upTo
    if (!dstCommitted && (genDir.nonEmpty || live.nonEmpty)) {
      val livePostings =
        if (live.isEmpty) None
        else Some(spark.read.option("basePath", s"$path/postings")
          .parquet(live.map(_._2.toString): _*).drop("ingest_batch"))
      val folded = (genDir.map(p =>
        spark.read.parquet(s"${p.toString}/postings")).toSeq ++
        livePostings.toSeq).reduce(_ unionByName _)
      val statsSrcs = genDir.map(p => s"${p.toString}/stats").toSeq ++
        live.flatMap { case (n, _) =>
          val sp = new org.apache.hadoop.fs.Path(
            s"$path/stats/ingest_batch=$n")
          if (fs.exists(sp)) Some(sp.toString) else None
        }
      val dst = s"$path/gen/gen=$upTo"
      val won = AtomicCommit.publishParquet(spark, dst) { tmp =>
        folded.write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$tmp/postings")
        spark.read.parquet(statsSrcs: _*)
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("tot_len")).as("tot_len"))
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/stats")
        fs.create(new org.apache.hadoop.fs.Path(tmp, "_GRAFT_COMMITTED"),
          true).close()
      }
      if (!won && !Seq("_SUCCESS", "_GRAFT_COMMITTED").exists(m =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$dst/$m"))))
        throw new ConcurrentWriteException(
          s"InvertedIndex.compactPostings: gen=$upTo at $path lost its " +
            "publish and the destination is not committed")
    }
    if (dstCommitted || genDir.nonEmpty || live.nonEmpty)
      graft.streaming.Retention.markSweepUnits(fs, path,
        allIncs.map { case (n, _) => s"postings/ingest_batch=$n" } ++
          allIncs.flatMap { case (n, _) =>
            val sp = new org.apache.hadoop.fs.Path(
              s"$path/stats/ingest_batch=$n")
            if (fs.exists(sp)) Some(s"stats/ingest_batch=$n") else None
          } ++
          listNumDirs(fs,
            new org.apache.hadoop.fs.Path(s"$path/gen"), "gen=")
            .filter(_._1 < upTo).map { case (g, _) => s"gen/gen=$g" })
  }

  /** Sweep whatever an earlier [[compactPostings]] marked without
    * folding anything new — the janitor tick for an index whose ingest
    * has gone quiet. */
  def vacuum(spark: SparkSession, path: String): Unit =
    graft.streaming.Retention.markSweepUnits(hfs(spark, path), path, Nil)

  /** Multi-term lookup, partition-pruned: rank docs by
    * (matched distinct terms desc, summed tf desc, doc_id) and keep
    * the top k. The bucket set is computed driver-side from the term
    * literals — no routing job, and the scan prunes every bucket not
    * probed. Output: (doc_id, n_matched, tf_sum). */
  /** Exact phrase lookup through the positional postings: a doc
    * matches where the phrase terms appear at CONSECUTIVE positions.
    * Each term's postings load bucket-pruned (as in [[search]]); the
    * i-th term's positions shift by −i, and the occurrence count is
    * the size of the intersection of the shifted arrays — the classic
    * positional-postings merge as one join chain plus array
    * intersections, no re-tokenization of any document. Output:
    * (doc_id, n_occurrences) top-k. */
  def phraseSearch(index: Index, phrase: Seq[String], k: Int): DataFrame = {
    require(index.positional,
      "phraseSearch needs a positional index — build(positions = true)")
    require(phrase.size >= 2, "phraseSearch: need >= 2 terms")
    val terms = phrase.map(_.toLowerCase)
    val buckets = terms.map(bucketOfLocal(_, index.nBuckets)).distinct
    val posted = index.postings
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(terms.distinct: _*))
    val frames = terms.zipWithIndex.map { case (t, i) =>
      posted.filter(col("term") === t)
        .select(col("doc_id"),
          transform(col("positions"), p => p - i).as(s"__p_$i"))
    }
    val joined = frames.reduce((a, b) => a.join(b, "doc_id"))
    val inter = (1 until terms.size).foldLeft(col("__p_0")) {
      (acc, i) => array_intersect(acc, col(s"__p_$i"))
    }
    joined.withColumn("n_occurrences", size(inter))
      .filter(col("n_occurrences") > 0)
      .select(col("doc_id"), col("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(k)
  }

  /** Fixed-point BM25 ([[Retrieval]]'s exact integer formula) scored
    * entirely off the index: tf and the denormalized len_d come from
    * the bucket-pruned postings scan, per-term df is a tiny aggregate
    * over the same pruned rows, and (N, totLen) is the sum of the
    * per-batch stats files — so a q-term query reads ~q/n_buckets of
    * the postings and NOTHING else, versus [[Retrieval.bm25TopK]]'s
    * full corpus re-tokenization. Identical output contract to
    * bm25TopK: (doc_id, n_terms, score), same ranking, same scores
    * (spec-pinned and oracle-gated by the same SQL). */
  def bm25Search(index: Index, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25Search: empty term list")
    val distinctTerms = terms.map(_.toLowerCase).distinct
    val buckets = distinctTerms.map(bucketOfLocal(_, index.nBuckets)).distinct
    val posted = index.postings
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(distinctTerms: _*))
    val stats = index.stats
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("tot_len")).as("tot_len"))
    val dfT = posted.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    posted
      .join(broadcast(dfT), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf6",
        expr("((2*(n_docs - df) + 1) * 1000000) div (2*df + 1)"))
      .withColumn("kd6",
        expr("(12 * (250000 + (750000 * len_d * n_docs) div tot_len)) div 10"))
      .withColumn("contrib",
        expr("(((tf * 2200000 * 1000000) div (tf * 1000000 + kd6)) * idf6) div 1000000"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def search(index: Index, terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "search: empty term list")
    val distinctTerms = terms.map(_.toLowerCase).distinct
    val buckets = distinctTerms.map(bucketOfLocal(_, index.nBuckets)).distinct
    index.postings
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(distinctTerms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_matched"),
        sum(col("tf")).as("tf_sum"))
      .orderBy(col("n_matched").desc, col("tf_sum").desc, col("doc_id"))
      .limit(k)
  }
}
