package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Generated-class cache sized to the suite (STATIC conf — must be
      // set before the session exists). The default 100 entries is far
      // below the ~205-query suite's distinct codegen'd stages, so every
      // rep recompiled (janino) nearly every stage it had already run —
      // pure fixed cost the guide's §1.2 step 2 says to remove before
      // touching plans. Not a local[32]-only trick: any long-lived
      // driver serving a query library this size wants its generated
      // classes resident (~100 KB each; 8000 ≤ ~800 MB driver heap,
      // measured heap high-water 2.0 GB of the 8 GB -Xmx). 2000 was
      // STILL thrashing: the back-to-back r14 A/B (same env window)
      // read 276.1 s at 2000 vs 239.0 s at 8000 with 170/205 queries
      // faster on the per-query MIN (median ratio 0.80) — the eviction
      // fingerprint, broad and strongest on small queries. (The
      // calibration probe is itself a codegen'd stage, so under a
      // thrashing cache the probe recompiles too and over-reports env
      // inflation — compare raw/min totals across cache sizes, not
      // cal_total.) Env-overridable so cache experiments don't need a
      // rebuild; the default IS the benched value.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SchemaCanary.preflight(spark, sfDir)
    // Untimed JVM/codegen warmup at the smallest sf: the first queries
    // in a cold JVM otherwise absorb ~5-10 s of one-time class-loading
    // and codegen cost that says nothing about steady-state throughput.
    // noop sink: materializes every output column. A bare count() lets
    // Catalyst prune scalar projections, so scan-side queries would
    // under-report their real cost.
    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()
    // Optional subset (comma-separated names): perf experiments that
    // need the full-suite harness shape but only some queries — e.g.
    // isolating whether a query's in-suite cost comes from a
    // predecessor's storage still draining (the r4→r5 q20 question).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a misspelled name would silently bench nothing — fail loudly
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not registered: ${unknown.mkString(", ")}")
      require(names.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but empty")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val warmupDir = "/root/testdata/sf0.001"
    // Warmup stays untimed in the report, but its wall time is recorded:
    // single-rep queries (streaming family, benchReps=1) use it as their
    // contention yardstick. Those queries warm at the BENCH sf, not
    // sf0.001: a 3-run median implicitly reported the warm steady state
    // (runs 2-3 dominate the median), so the rep=1 replacement must
    // time a warm run too — a cold-run number would read as a fake
    // +8s-per-query regression while actually measuring first-run
    // state-store setup. Net suite cost: 2 full-sf executions instead
    // of 1 tiny + 3 full.
    // ── calibration probe ────────────────────────────────────────────
    // The driver environment drifts 1.4-2.9x intra-day with zero code
    // change (NOTES r11/r12: same tree measured 334s morning / 487s
    // afternoon; q20's r11 "regression" was a sustained contention
    // episode). A 2x acceptance gate with a 1.6x env band leaves ~0.4x
    // of real signal, so every timed phase now opens with a fixed
    // CPU-bound, data-independent probe — xxhash64 folded over a
    // deterministic range at full parallelism — whose cost moves with
    // machine-wide contention and with NOTHING in this repo's plans.
    // Per-query times are reported raw AND calibrated (raw divided by
    // the phase's probe inflation over the best observed probe): a
    // real plan regression moves calibrated numbers, env drift doesn't.
    val calibProbes = scala.collection.mutable.ArrayBuffer[Double]()
    def calibrate(): Double = {
      import org.apache.spark.sql.functions.{col, sum, xxhash64}
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, cpus.toInt)
        .select(sum(xxhash64(col("id")) % 1000000L).as("h")).collect()
      val c = (System.nanoTime() - t0) / 1e9
      calibProbes += c
      c
    }
    val benchReps = SparkEntry.registered.map(q => q.name -> q.benchReps).toMap
    calibrate() // probe the warmup phase's env too (single-rep yardstick)
    val warmupT: Map[String, Double] = selected.map { case (name, fn) =>
      val dir = if (benchReps.getOrElse(name, 3) == 1) sfDir else warmupDir
      val t0 = System.nanoTime()
      try exec(fn, dir) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // 3 timed runs per query, report the MEDIAN: r2→r3 showed 2-5×
    // run-to-run swings on individual queries (warmup/ordering noise)
    // that masked a real regression (q65); medians cut that band to
    // where a 20% drift is signal. min/max ship alongside as "spread".
    //
    // Contention robustness (r5→r6): the driver environment twice wrote
    // an 8× q20 spike (median 15.4s, min 1.41s in the SAME 3-run set)
    // that controlled runs could not reproduce — the signature of
    // external CPU/IO contention landing on 2 of 3 runs, not of a plan
    // regression. Two defenses: (1) a query whose spread exceeds
    // OUTLIER_SPREAD gets up to 2 retry runs, and the median is taken
    // over ALL its runs, so a transient spike needs to win 3+ of 5 runs
    // to move the median; (2) the per-query MIN ships as a first-class
    // "mins" map — min is the contention-free estimator (contention
    // only ever adds time), so a median/min gap >3× reads as
    // environment, a min shift reads as a real plan change.
    val OutlierSpread = 3.0
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // keep the suite running on a query failure, but NEVER silently:
      // a swallowed crash reads as an impossibly fast time (the r5 q81
      // registration bug hid exactly this way)
      try exec(fn, sfDir) catch { case t: Throwable =>
        System.err.println(s"BENCH ERROR $name: " +
          s"${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // REP-MAJOR order (r11→r12): the whole suite runs once per rep, so
    // one query's reps are separated by minutes of other work instead of
    // landing in a single ~30 s window. Motivation: the r11 driver bench
    // measured q20 at 9.55 s median with min 8.16 s across reps while
    // FOUR same-tree/same-data/same-cpu controlled runs (isolated,
    // predecessor subset, and two full-suite positions) read 1.4–2.4 s —
    // a sustained external-contention episode covering the adjacent rep
    // window defeats both the median and the min when reps are
    // back-to-back (the r5/r6 q20 spikes were the 2-of-3 variant of the
    // same signature). Time-decorrelated reps turn any episode shorter
    // than a full suite pass into a ≤1-rep outlier the median ignores.
    val repsOf = selected.map { case (name, _) =>
      name -> benchReps.getOrElse(name, 3)
    }.toMap
    // every run is stored with the calibration probe of the phase it ran
    // in, so calibrated statistics can be formed per run, not per query
    val runsByName =
      scala.collection.mutable.Map[String, Vector[(Double, Double)]]()
    val maxReps = repsOf.values.maxOption.getOrElse(0)
    for (r <- 1 to maxReps) {
      val c = calibrate()
      for ((name, fn) <- selected if r <= repsOf(name))
        runsByName(name) = runsByName.getOrElse(name, Vector()) :+
          (timeOne(name, fn), c)
    }
    // extra runs (escalations/retries) open their own probe: they run
    // minutes after the rep that triggered them, under whatever env is
    // live THEN
    def extraRun(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      val c = calibrate()
      (timeOne(name, fn), c)
    }
    val allRuns = selected.map { case (name, fn) =>
      val reps = repsOf(name)
      var times: Vector[(Double, Double)] = runsByName(name)
      def raws = times.map(_._1)
      // Single-rep guard (streaming family): with one run there is no
      // spread to inspect, so the yardstick is the query's own warmup —
      // the same query at the same sf (see above). >3x warmup (floored
      // at 1s so tiny warmups can't trip it) ⇒ suspected contention ⇒
      // escalate to the standard 3-run median.
      if (reps == 1 && raws.head > 3.0 * math.max(warmupT(name), 1.0)) {
        System.err.println(f"BENCH ESCALATE $name: single run ${raws.head}%.2f" +
          f"s > 3x warmup ${warmupT(name)}%.2fs — taking 3-run median")
        times = times ++ (1 to 2).map(_ => extraRun(name, fn))
      }
      var retries = 0
      while (times.size >= 3 && retries < 2 &&
          raws.max / math.max(raws.min, 1e-9) > OutlierSpread) {
        System.err.println(f"BENCH RETRY $name: spread [${raws.min}%.2f, " +
          f"${raws.max}%.2f] exceeds ${OutlierSpread}%.1fx — rerunning")
        times = times :+ extraRun(name, fn)
        retries += 1
      }
      (name, times)
    }
    // calibrated stats formed AFTER every probe (including extra-run
    // probes) has landed, so one calRef governs all queries. A probe
    // BELOW calRef never inflates a query (factor floored at 1).
    val calRef = math.max(calibProbes.min, 1e-9)
    val results = allRuns.map { case (name, times) =>
      val sorted = times.map(_._1).sorted
      val calSorted = times
        .map { case (t, c) => t / math.max(c / calRef, 1.0) }.sorted
      (name, sorted(sorted.size / 2), sorted.head, sorted.last,
        calSorted(calSorted.size / 2))
    }
    val qs = results.map { case (k, med, _, _, _) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, lo, _, _) => s"\"" + k + "\":" + lo }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, lo, hi, _) =>
      s"\"" + k + "\":[" + lo + "," + hi + "]"
    }.mkString("{", ",", "}")
    val qsCal = results.map { case (k, _, _, _, cm) => s"\"" + k + "\":" + cm }
      .mkString("{", ",", "}")
    val calibJson = calibProbes.map(c => f"$c%.3f").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val minTotal = results.map(_._3).sum
    val calTotal = results.map(_._5).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","min_total":$minTotal,"cal_total":$calTotal,"calib":$calibJson,"queries":$qs,"mins":$mins,"queries_cal":$qsCal,"spread":$spread,"sf":"$sfDir"}"""
    println(json)
    // The driver's stdout capture keeps only a ~2000-char TAIL, which
    // truncates the full per-query map mid-stream (every BENCH_r*.json
    // so far has parsed:null). Print a compact self-describing summary
    // LAST — headline totals + the 10 slowest queries — so whatever
    // tail survives is a complete, parseable JSON line.
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, med, _, _, _) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    // Distinct metric name: consumers keying on "metric" must be able
    // to tell the compact tail-surviving summary from the full line
    // above (same-name duplicates made grep-first pick the wrong one).
    println(
      s"""{"metric":"total_summary","value":$total,"unit":"sec","min_total":$minTotal,"cal_total":$calTotal,"calib":$calibJson,"n_queries":${results.size},"slowest":$slowest,"sf":"$sfDir"}""")
    // Also persist the whole JSON line to a file: the driver's stdout
    // capture head-truncates long lines, which cost round 2 its q01-q19
    // numbers; a file survives whole.
    val outFile =
      if (only.isDefined) "BENCH_SUBSET.json" else "BENCH_LOCAL.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
