package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Long-lived-session safety for every operator that materializes
  * intermediates (dedup/curation pair generators, iterative closure /
  * components): after the call returns, ZERO new entries may remain in
  * `sc.getPersistentRDDs` — internals are either unpersisted
  * explicitly or left as scratch tables on disk, never pinned in
  * executor storage. The round-3 q65 regression was exactly this
  * class of leak (persisted shingle frames surviving across bench
  * runs, making timings cache-state-dependent); GC-driven
  * ContextCleaner cleanup cannot be relied on (measured: dropped
  * checkpoint RDDs survive repeated full GCs — see Lifecycle).
  */
class PersistLifecycleSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def assertReleasesAll(op: => Unit): Unit = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    op
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"operator left pinned storage behind: " +
        leaked.map(id => s"$id=${sc.getPersistentRDDs(id).name}"))
  }

  private def docs = Tables.documents(spark, d)

  test("ngramJaccardPairs (capped) releases shingle + candidate frames") {
    assertReleasesAll {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = Some(50)).count()
    }
  }

  test("ngramJaccardPairs (exact) releases the shingle frame") {
    assertReleasesAll {
      Dedup.ngramJaccardPairs(docs.limit(100), "doc_id", "text",
        n = 3, minJaccard = 0.5).count()
    }
  }

  test("minHashPairs releases the shingle frame") {
    assertReleasesAll {
      Dedup.minHashPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, minJaccard = 0.5).count()
    }
  }

  test("simHashPairs releases the signature frame") {
    assertReleasesAll {
      Dedup.simHashPairs(docs, "doc_id", "text",
        shingleN = 3, maxHamming = 3).count()
    }
  }

  test("splitContamination releases the (doc, shingle) frame") {
    assertReleasesAll {
      val split = DataMix.trainTestSplit(docs, "doc_id", 0.2)
      Curation.splitContamination(split, "doc_id", "text", "split",
        n = 5, maxDocFreq = 50).count()
    }
  }

  test("connectedComponents releases edge + every round's label frame") {
    assertReleasesAll {
      val edges = spark.range(0, 3000).select(
        col("id").as("a"), (col("id") % 700).as("b"))
      Components.connectedComponents(edges, "a", "b").count()
    }
  }

  test("connectedComponentsStar releases node + every round's edge frame") {
    assertReleasesAll {
      val chain = spark.range(1, 2000)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      Components.connectedComponentsStar(chain, "a", "b").count()
    }
  }

  test("ancestorClosure releases every frontier") {
    assertReleasesAll {
      val nodes = spark.range(1, 5000).select(col("id"),
        when(col("id") <= 250, lit(null).cast("long"))
          .otherwise(col("id") - 250).as("parent"))
      Hierarchy.ancestorClosure(nodes, "id", "parent", maxDepth = 32).count()
    }
  }

  test("q65 curate-corpus composition leaves nothing pinned") {
    // the flagship composed pipeline: exact dedup -> quality gate ->
    // near-dup components -> split, all internally materialized
    assertReleasesAll {
      graft.queries.CurationQueries.curateCorpus(spark, d).count()
    }
  }

  test("q166 LLM-corpus capstone composition leaves nothing pinned") {
    // the end-to-end training-data chain: BPE tokenize -> perplexity
    // gate -> near-dup drop -> quota -> packing -> shard shuffle; four
    // scratch materializations inside, zero pinned RDDs after
    assertReleasesAll {
      graft.queries.CurationQueries.curateLlmCorpus(spark, d).count()
    }
  }

  test("repeated minHashPairs calls do not accrete pinned storage") {
    // the per-batch service shape: N calls, zero monotone growth
    assertReleasesAll {
      (1 to 3).foreach { _ =>
        Dedup.minHashPairs(docs, "doc_id", "text",
          shingleN = 3, numHashes = 16, bands = 4, minJaccard = 0.5).count()
      }
    }
  }

  test("Lifecycle.release deletes the scratch tables behind a result") {
    // the DISK side of the contract: a long-lived service frees a
    // consumed result's scratch files the way it unpersists a cache
    val m = Lifecycle.materializeToScratch(
      spark.range(100).toDF("id"))
    def backingDirs(df: org.apache.spark.sql.DataFrame): Seq[java.io.File] = {
      val root = java.nio.file.Paths.get(
        Lifecycle.scratchRoot(spark)).toAbsolutePath.normalize
      var out = List.empty[java.io.File]
      df.queryExecution.analyzed.foreach { p =>
        if (p.getClass.getSimpleName == "LogicalRelation") {
          val rel = p.getClass.getMethod("relation").invoke(p)
          val loc = rel.getClass.getMethod("location").invoke(rel)
          loc.getClass.getMethod("rootPaths").invoke(loc)
            .asInstanceOf[Seq[org.apache.hadoop.fs.Path]]
            .foreach { hp =>
              val f = new java.io.File(hp.toUri.getPath)
              if (f.toPath.toAbsolutePath.normalize.startsWith(root))
                out ::= f
            }
        }
      }
      out
    }
    val dirs = backingDirs(m)
    assert(dirs.nonEmpty && dirs.forall(_.exists()))
    assert(m.count() == 100)
    Lifecycle.release(m)
    assert(dirs.forall(!_.exists()))
    // an eager operator's result releases the same way, and scans
    // OUTSIDE the scratch root are never touched
    val pairs = Dedup.minHashPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4, minJaccard = 0.5)
    val pDirs = backingDirs(pairs)
    assert(pDirs.nonEmpty)
    Lifecycle.release(pairs, docs)
    assert(pDirs.forall(!_.exists()))
    assert(docs.count() > 0) // source table unaffected
  }

  test("caller-owned scratch root is namespaced by applicationId") {
    // two applications (or a restarted one) sharing one configured
    // scratch dir must not clobber each other's m<N> tables
    val owned = java.nio.file.Files.createTempDirectory("owned_scratch")
    spark.conf.set("graft.scratch.dir", owned.toString)
    try {
      val root = Lifecycle.scratchRoot(spark)
      assert(root ==
        s"$owned/${spark.sparkContext.applicationId}")
      val m = Lifecycle.materializeToScratch(spark.range(10).toDF("id"))
      assert(m.count() == 10)
      val appDir = new java.io.File(root)
      assert(appDir.isDirectory && appDir.list().nonEmpty)
      Lifecycle.release(m) // Hadoop-FS delete works on the owned root
      // only the liveness heartbeat may remain — no table data
      assert(appDir.list().forall(_ == Lifecycle.HeartbeatName))
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("pruneScratch enforces TTL then size cap, oldest first") {
    val owned = java.nio.file.Files.createTempDirectory("prune_scratch")
    spark.conf.set("graft.scratch.dir", owned.toString)
    try {
      val frames = (1 to 4).map { i =>
        Lifecycle.materializeToScratch(
          spark.range(100L * i).toDF("id"))
      }
      val root = new java.io.File(Lifecycle.scratchRoot(spark))
      val dirs = root.listFiles().filter(_.getName.matches("m\\d+"))
        .sortBy(_.getName.stripPrefix("m").toLong)
      assert(dirs.length == 4)
      // age the first two past a 1-hour TTL
      val old = System.currentTimeMillis() - 2 * 3600 * 1000L
      dirs.take(2).foreach { d =>
        d.setLastModified(old)
        d.listFiles().foreach(_.setLastModified(old))
      }
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(!dirs(0).exists() && !dirs(1).exists())
      assert(dirs(2).exists() && dirs(3).exists())
      // size cap: dirs(3) alone is under any sane cap; dirs(2)+dirs(3)
      // exceed a cap of dirs(3)'s size, so the OLDER dirs(2) goes
      // (FILE mtimes pinned — age is read from child files now —
      // same-millisecond creation would make oldest-first ambiguous;
      // dirs(2) aged past the cap pass's min-age floor, dirs(3)
      // fresh = protected even if over cap)
      dirs(2).listFiles()
        .foreach(_.setLastModified(System.currentTimeMillis() - 20 * 60000L))
      dirs(3).listFiles()
        .foreach(_.setLastModified(System.currentTimeMillis()))
      val keepBytes = dirs(3).listFiles().map(_.length()).sum
      Lifecycle.pruneScratch(spark, ttlMillis = Long.MaxValue,
        maxBytes = keepBytes + 1)
      assert(!dirs(2).exists() && dirs(3).exists())
      frames.foreach(_ => ()) // frames beyond pruned ones unused
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("pruneScratch reclaims previous applications' namespaces under a shared root") {
    // the appId namespacing means a restarted service leaves its old
    // run's subtree behind; the janitor must prune the CONFIGURED
    // root across appIds, or the shared scratch dir grows forever
    val owned = java.nio.file.Files.createTempDirectory("prune_xapp")
    spark.conf.set("graft.scratch.dir", owned.toString)
    try {
      val mine = Lifecycle.materializeToScratch(spark.range(10).toDF("id"))
      val dead = owned.resolve("application_000_0001/m1")
      java.nio.file.Files.createDirectories(dead)
      java.nio.file.Files.write(dead.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3))
      val old = System.currentTimeMillis() - 2 * 3600 * 1000L
      // age the FILE: expiry is decided by child-file mtimes (real on
      // object stores), never the synthetic directory status
      dead.resolve("part-0.parquet").toFile.setLastModified(old)
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(!dead.toFile.exists(), "dead app's scratch table survived")
      assert(!dead.getParent.toFile.exists(), "empty dead namespace survived")
      assert(mine.count() == 10, "live app's fresh scratch was pruned")
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("expiry reads child-file mtimes, not the directory status") {
    // object stores report synthetic directory statuses (mtime 0 or
    // listing time): a table whose DIR looks ancient but whose files
    // are fresh is live and must survive; the reverse must be pruned
    // (covered by the cross-app test above)
    val owned = java.nio.file.Files.createTempDirectory("prune_mtime")
    spark.conf.set("graft.scratch.dir", owned.toString)
    try {
      val fresh = owned.resolve("application_000_0002/m1")
      java.nio.file.Files.createDirectories(fresh)
      java.nio.file.Files.write(fresh.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3))
      val old = System.currentTimeMillis() - 48 * 3600 * 1000L
      fresh.toFile.setLastModified(old)           // dir looks ancient
      fresh.getParent.toFile.setLastModified(old) // namespace too
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(fresh.toFile.exists(),
        "table with fresh files was pruned off a stale dir status")
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("a live application's heartbeat shields its namespace from other janitors") {
    val owned = java.nio.file.Files.createTempDirectory("prune_hb")
    spark.conf.set("graft.scratch.dir", owned.toString)
    try {
      // simulate ANOTHER app: expired table but fresh heartbeat
      val other = owned.resolve("application_000_0003")
      val table = other.resolve("m1")
      java.nio.file.Files.createDirectories(table)
      java.nio.file.Files.write(table.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3))
      val old = System.currentTimeMillis() - 2 * 3600 * 1000L
      table.resolve("part-0.parquet").toFile.setLastModified(old)
      java.nio.file.Files.write(other.resolve(Lifecycle.HeartbeatName),
        Array.emptyByteArray)
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(table.toFile.exists(),
        "another live app's expired-by-TTL intermediate was deleted")
      // heartbeat gone stale: normal TTL pruning resumes, and a
      // namespace left holding only the stale marker is swept
      other.resolve(Lifecycle.HeartbeatName).toFile.setLastModified(old)
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(!table.toFile.exists(), "stale-heartbeat table survived")
      assert(!other.toFile.exists(), "stale-heartbeat namespace survived")
      // the janitor's OWN namespace is never heartbeat-shielded: its
      // expired tables prune under the TTL the app itself chose
      val mine = Lifecycle.materializeToScratch(spark.range(5).toDF("id"))
      val myDir = new java.io.File(Lifecycle.scratchRoot(spark))
      val myTables = myDir.listFiles().filter(_.getName.matches("m\\d+"))
      assert(myTables.nonEmpty)
      myTables.foreach(t => t.listFiles().foreach(_.setLastModified(old)))
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(myTables.forall(!_.exists()),
        "own namespace's expired tables must still prune")
      mine // consumed above; deletion after expiry is the test's point
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("empty-dir sweep touches only Spark-appId-named namespaces") {
    val owned = java.nio.file.Files.createTempDirectory("prune_foreign")
    spark.conf.set("graft.scratch.dir", owned.toString)
    try {
      val foreign = owned.resolve("some_other_tools_dir")
      java.nio.file.Files.createDirectories(foreign)
      val ours = owned.resolve("local-12345")
      java.nio.file.Files.createDirectories(ours)
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(foreign.toFile.exists(),
        "another tool's empty dir under a shared root was deleted")
      assert(!ours.toFile.exists(), "empty appId-named namespace survived")
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("legacy pre-namespacing m<N> tables under a configured root still prune") {
    val owned = java.nio.file.Files.createTempDirectory("prune_legacy")
    spark.conf.set("graft.scratch.dir", owned.toString)
    try {
      val legacy = owned.resolve("m7")
      java.nio.file.Files.createDirectories(legacy)
      java.nio.file.Files.write(legacy.resolve("part-0.parquet"),
        Array[Byte](1, 2, 3))
      val old = System.currentTimeMillis() - 2 * 3600 * 1000L
      legacy.resolve("part-0.parquet").toFile.setLastModified(old)
      Lifecycle.pruneScratch(spark, ttlMillis = 3600 * 1000L)
      assert(!legacy.toFile.exists(),
        "legacy top-level m<N> table became permanent litter")
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("the reflected private[sql] surface resolves on the bundled Spark") {
    // Lifecycle also asserts this at class load; the spec names the
    // same members so a Spark upgrade fails here with a clear message
    Lifecycle.assertReflectedSurface()
    Seq(
      ("org.apache.spark.sql.execution.LogicalRDD", "rdd"),
      ("org.apache.spark.sql.execution.datasources.LogicalRelation", "relation"),
      ("org.apache.spark.sql.execution.datasources.HadoopFsRelation", "location"),
      ("org.apache.spark.sql.execution.datasources.FileIndex", "rootPaths")
    ).foreach { case (cls, m) =>
      assert(Class.forName(cls).getMethods.exists(_.getName == m),
        s"$cls.$m missing")
    }
  }
}
