package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same pin as Verify: q78's calendar binning asserts a UTC session
      // timezone (loudly, by design) — without this, a non-UTC driver JVM
      // would poison the bench artifact instead of measuring
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev knobs (the driver sets none): SPARK_GRAFT_ONLY=q30,q22 runs a
    // subset; SPARK_GRAFT_REPEAT=3 times each query thrice and keeps the min
    // (steady-state); SPARK_GRAFT_EXPLAIN=1 prints each physical plan
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // min-of-3 by default so per-query regressions are separable from JIT
    // noise (round-2 judge: q34/q37/q09/q31/q32/q16 moved 2x between rounds
    // with n=1 timings)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    // Untimed per-query throwaway at the TARGET scale factor before its
    // timed trials (default ON; SPARK_GRAFT_WARMUP=0 disables). The
    // sf0.001 pass below warms codegen, but the first timed trial still
    // absorbed target-SF page-cache misses and loop-shape JIT — q01's
    // recorded spread reached 1.67x from warm-up alone (VERDICT r8 task
    // 5); the throwaway moves that cost out of the min-of-N.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    // Warmup pass on the smallest scale factor: triggers Janino codegen
    // compilation and JIT of every query's generated classes, so the timed
    // numbers below measure engine throughput rather than first-run
    // compilation (cold-run noise was ±5s on individual queries).
    val warmDir = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }

    if (explain) selected.foreach { case (name, fn) =>
      println(s"==== $name ====")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    // Per-query GROUPED repeats (trial 1..N back-to-back per query), the
    // methodology of the whole BENCH series. An interleaved variant (pass
    // 1 runs every query once, then pass 2, …) was measured in r7 and
    // REJECTED: with ~80 queries' generated classes churning between a
    // query's trials, every min-of-3 lands ~1.3x slower uniformly (code
    // cache + scan buffer pollution) — it times a cold-cache regime and
    // breaks round-over-round comparability. Sustained machine contention
    // cannot be min'd away under either scheme; it is made VISIBLE
    // instead, via the per-query spread artifact below.
    // A query that throws is recorded as an ERROR, excluded from every
    // total, and fails the whole run (non-zero exit). Round 7's artifact
    // silently timed 47 analysis errors as ~0.05s "successes" because this
    // loop swallowed Throwable — never again: an errored bench must be
    // visibly red in the artifact AND red to the driver.
    // ---- machine-load sentinel (VERDICT r9 task 1) -----------------------
    // A fixed CPU-bound Spark action (~30ms idle on 32 threads) timed
    // before every trial. Its idle duration is a property of the machine,
    // so the ratio of a sample to the RUN-WIDE MINIMUM sample measures
    // contention at that instant — the r9 official artifact was captured
    // on a contended host (72.6s vs the 48.9s idle anchor for the same
    // tree) and the inflation was invisible in the artifact itself.
    // The sentinel is the same kind of work a query does (scheduled
    // executor tasks + codegen arithmetic), so external CPU pressure
    // inflates both comparably.
    // built ONCE; each sample runs ONE stage of `cpus` fixed CPU-loop
    // tasks (no shuffle, no re-planning) — it times task scheduling plus
    // raw per-core arithmetic, the same resources query execution uses,
    // at ~15-25 ms idle so 126 samples cost ~3 s per full run
    val sentinelRdd = spark.sparkContext
      .range(0, 4L * 1000 * 1000, numSlices = cpus.toInt)
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.sparkContext.runJob(sentinelRdd, (it: Iterator[Long]) => {
        var s = 0L; it.foreach(x => s += x * 3 + 7); s
      })
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).foreach(_ => sentinel()) // codegen/JIT warm for the sentinel itself
    // A query block's times are trusted when the sentinels BRACKETING the
    // block (one sample between consecutive blocks — ~25 ms each, ~3 s
    // per full 125-query run) ran within this band of the run minimum;
    // queries whose best block is outside the band get temporally
    // separated re-runs below.
    val band = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_BAND", "1.5").toDouble
    // PER-QUERY-RELATIVE slack (VERDICT r10 task 1 — the r10 fixed 50 ms
    // absolute slack only flagged blocks above ~5.4x the ~11 ms floor, so
    // 81/127 blocks sat above the 1.5x band unflagged): a block is
    // contended when its bracket ratio r exceeds the band AND the implied
    // query inflation (r-1)·best exceeds max(slack, relSlack·best) — the
    // sentinel and a query share the same resources, so the sentinel
    // ratio is the best available estimate of the query's own inflation
    // factor. For queries ≥ ~50 ms this reduces to r > band; sub-50 ms
    // queries need proportionally larger ratios (r > 1 + slack/best), so
    // scheduler jitter on the ~11 ms sentinel floor — which flagged ~40%
    // of an idle run's blocks under a pure ratio test — still cannot
    // flag a query it cannot materially inflate.
    val slack = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_SLACK", "0.025").toDouble
    val relSlack = sys.env.getOrElse("SPARK_GRAFT_SENTINEL_RELSLACK", "0.15").toDouble
    val extraRounds = sys.env.getOrElse("SPARK_GRAFT_RERUNS", "2").toInt

    val names = selected.keys.toSeq.sorted
    // per-query blocks: (trial times, sentinelBefore, sentinelAfter)
    // gcMs: total JVM GC pause time accrued across the block's trials —
    // the CPU sentinel cannot see GC/safepoint stalls (they inflate a
    // query without inflating the sentinel's own sample), so the r12
    // driver re-run's unexplained q95 6.4x reading was unadjudicable
    // from the artifact alone. Recording the delta per block makes the
    // next such reading diagnosable: high gc_ms → JVM pause, low gc_ms
    // with clean sentinels → external (disk/page-cache) weather.
    def gcTotalMs(): Long = {
      val it = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.iterator()
      var s = 0L
      while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) s += t }
      s
    }
    final case class Block(times: Vector[Double], sBefore: Double,
      sAfter: Double, gcMs: Long)
    val blocks = scala.collection.mutable.LinkedHashMap[String, Vector[Block]]()
    val errMap = scala.collection.mutable.LinkedHashMap[String, String]()
    // re-run failures on queries that already own valid blocks (ADVICE
    // r10: a transient throw on a contention-triggered re-run must not
    // convert a successfully measured query into a run-failing error) —
    // recorded separately, prior measurements kept
    val rerunErrs = scala.collection.mutable.LinkedHashMap[String, String]()
    var lastSentinel = sentinel()
    def runBlock(name: String, doWarmup: Boolean, isRerun: Boolean = false): Unit = {
      if (errMap.contains(name)) return
      if (doWarmup) // errors are recorded (and fail the run) in timed trials
        try selected(name)(spark, sfDir).count() catch { case _: Throwable => () }
      val sB = lastSentinel
      val gc0 = gcTotalMs()
      var failed: Option[String] = None
      val ts = Vector.fill(repeat) {
        val t0 = System.nanoTime()
        if (failed.isEmpty)
          try { selected(name)(spark, sfDir).count() } catch {
            case e: Throwable =>
              failed = Some(s"${e.getClass.getSimpleName}: " +
                Option(e.getMessage).getOrElse("").replace('\n', ' ').take(300))
          }
        (System.nanoTime() - t0) / 1e9
      }
      lastSentinel = sentinel()
      failed match {
        case None =>
          blocks(name) = blocks.getOrElse(name, Vector.empty) :+
            Block(ts, sB, lastSentinel, gcTotalMs() - gc0)
        case Some(msg) if isRerun && blocks.contains(name) =>
          rerunErrs(name) = msg
        case Some(msg) =>
          errMap(name) = msg
      }
    }
    // Discarded warm-up blocks before q01 (VERDICT r10 task 1): the first
    // timed blocks of an official run carried 1.5-2.2x inflation over
    // their idle minima with sentinel ratios 2.8-5.1 — target-SF page
    // cache, code-cache churn from the sf0.001 warm pass, and allocator
    // ramp all land on whoever runs first. Full blocks of the first
    // queries are run and THROWN AWAY (errors survive in errMap — a
    // genuinely broken query fails the run regardless of where it first
    // ran), then the measured loop starts with the JVM in its
    // steady-state regime.
    val warmBlocks = sys.env.getOrElse("SPARK_GRAFT_WARMUP_BLOCKS", "2").toInt
    names.take(warmBlocks).foreach(runBlock(_, warmup))
    blocks.clear()
    names.foreach(runBlock(_, warmup))
    // run-wide sentinel floor: if ANY quiet instant existed, this is the
    // machine's idle sentinel; under wall-to-wall contention every ratio
    // stays near 1 and the absolute floor itself is the tell (recorded).
    def sentinelRef: Double =
      blocks.values.flatten.flatMap(b => Seq(b.sBefore, b.sAfter))
        .foldLeft(lastSentinel)(math.min)
    // bracket ratio of the block holding the query's reported (min) time
    def minBlockRatio(bs: Vector[Block]): Double = {
      val best = bs.minBy(_.times.min)
      math.min(best.sBefore, best.sAfter) / sentinelRef
    }
    def isContended(bs: Vector[Block]): Boolean = {
      val best = bs.minBy(_.times.min)
      val s = math.min(best.sBefore, best.sAfter)
      val r = s / sentinelRef
      val qBest = best.times.min
      r > band && (r - 1.0) * qBest > math.max(slack, relSlack * qBest)
    }
    // Re-run queries whose best block ran under contention: temporally
    // separated passes over the flagged set (min can only improve; a
    // clean-bracket block clears the flag).
    var round = 0
    var flagged = names.filter(n => blocks.get(n).exists(isContended))
    while (round < extraRounds && flagged.nonEmpty) {
      System.err.println(s"[bench] sentinel re-run round ${round + 1}: " +
        s"${flagged.size} contended queries: ${flagged.take(8).mkString(",")}")
      flagged.foreach(runBlock(_, doWarmup = false, isRerun = true))
      flagged = names.filter(n => blocks.get(n).exists(isContended))
      round += 1
    }
    val errors = errMap.toSeq
    val ok = names.filterNot(errMap.contains)
    val results = ok.flatMap(n =>
      blocks.get(n).map(bs => n -> bs.flatMap(_.times)))
    // per-block clean test (same rule as isContended, applied to ONE
    // block): a block whose bracketing sentinels ran clean — or whose
    // implied inflation cannot materially move the query — contributes
    // its passes to the query's reported dispersion. Passes from
    // contended blocks stay in the artifact (`passes`, `spread_all`) but
    // are excluded from `spread`: a re-run that CLEARS a contention flag
    // must not leave the flagged block's inflated passes poisoning the
    // stability metric the flag existed to protect (r11 close-out: one
    // mid-run contention window left 18 cleared queries with spreads
    // 2-5x from their own re-run history, indistinguishable in the old
    // artifact from genuine engine variance).
    def blockClean(b: Block): Boolean = {
      val s = math.min(b.sBefore, b.sAfter)
      val r = s / sentinelRef
      val qBest = b.times.min
      !(r > band && (r - 1.0) * qBest > math.max(slack, relSlack * qBest))
    }
    val cleanTimes: Map[String, Vector[Double]] = ok.flatMap(n =>
      blocks.get(n).map { bs =>
        val ct = bs.filter(blockClean).flatMap(_.times)
        n -> (if (ct.nonEmpty) ct else bs.flatMap(_.times))
      }).toMap
    val contended = flagged.filterNot(errMap.contains) // outside band after re-runs
    val ratios = ok.flatMap(n => blocks.get(n).map(bs => n -> minBlockRatio(bs)))
    // Locale.ROOT: the f interpolator uses the default JVM locale, which can
    // emit a comma decimal separator and break the JSON artifact.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    // sorted, fixed-precision per-query map: keeps the stdout line short
    // and deterministic, and lands in its OWN file too — the r5 bench
    // artifact carried a truncated tail that hid 5 queries from the audit
    val qs = results
      .map { case (k, ts) => "\"" + k + "\":" + fmt(ts.min) }
      .mkString("{", ",", "}")
    def qstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val errJson = errors
      .map { case (k, m) => qstr(k) + ":" + qstr(m) }.mkString("{", ",", "}")
    val rerunErrJson = rerunErrs.toSeq
      .map { case (k, m) => qstr(k) + ":" + qstr(m) }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    // contention annotation: the judge can discount `contended` queries
    // (their reported min never coincided with a clean sentinel even after
    // re-runs) and read `sentinel_ref` as the machine's quietest instant
    val contJson = contended.map(qstr).mkString("[", ",", "]")
    // config-mismatch tripwire (VERDICT r13 task 7): floors and every
    // committed close-out were captured at the measured-optimal -Xmx8g
    // (the r12/r13 sweeps put 96g runs 8-14% slower with 2-4x the
    // contended count — G1 pause shape, not engine). A driver re-running
    // at a different heap is comparing against floors from another JVM
    // config; say so in the transcript instead of letting the delta read
    // as a regression.
    val heapGb = Runtime.getRuntime.maxMemory / 1e9
    if (heapGb < 7.0 || heapGb > 10.0)
      println(f"[bench] WARNING heap_max_gb=$heapGb%.1f deviates from the " +
        "floor-era config (-Xmx8g, measured optimal r12/r13) — totals are " +
        "not comparable to bench_floors.json or committed close-outs")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""errors":$errJson,"err_count":${errors.size},""" +
        s""""rerun_errors":$rerunErrJson,""" +
        s""""sentinel_ref":${fmt(sentinelRef)},"sentinel_band":${fmt(band)},""" +
        s""""contended":$contJson,"contended_count":${contended.size},""" +
        // measurement-config provenance: the r12 heap sweep measured the
        // SAME engine at 42.4-47.7 s depending on heap sizing alone
        // (8g-fixed optimal; 24g lengthens G1 pauses) — an artifact
        // without its JVM config is not comparable across rounds
        s""""heap_max_gb":${fmt(Runtime.getRuntime.maxMemory / 1e9)},""" +
        s""""cpus":"$cpus","repeat":$repeat,""" +
        s""""sf":"$sfDir"}"""
    // Compact stdout line (r16, VERDICT r15 task 1): the driver keeps only
    // the LAST 2000 characters of stdout, and the full-name per-query map
    // (135 keys, ~4 KB) has overflowed that tail in every round — 15
    // rounds of BENCH_r*.json carry `parsed: null` and the driver's PERF
    // per-query comparison has never run. The stdout line therefore keys
    // queries by their unique `qNN` prefix at 3 decimals (~1.7 KB, fits
    // the tail with sbt's trailing [success] line); the FULL-name map and
    // every diagnostic (sentinels, contended list, dispersion) still land
    // verbatim in bench_queries.json / bench_dispersion.json, which are
    // committed each round. Same timings, same methodology, same queries —
    // only the stdout serialization of the names is shortened.
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qsShort = results
      .map { case (k, ts) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt3(ts.min) }
      .mkString("{", ",", "}")
    val shortLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",""" +
        s""""queries":$qsShort,"errors":$errJson,"err_count":${errors.size},""" +
        s""""cpus":"$cpus","sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_queries.json"), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_queries.json write failed: ${e.getMessage}")
    }
    // Dispersion artifact: every pass time per query, plus max/min ratio.
    // A contended run is then VISIBLE in the artifact (high ratios across
    // many queries) instead of silently inflating the headline number.
    val ratioOf = ratios.toMap
    def spreadOf(ts: Vector[Double]): Double =
      if (ts.nonEmpty && ts.min > 0) ts.max / ts.min else 1.0
    val disp = results.map { case (k, ts) =>
      // gc_ms: GC pause time accrued across the block holding the
      // reported min — separates JVM-pause inflation (high gc_ms) from
      // external weather (clean gc_ms + clean sentinels) in post-hoc
      // adjudication of an outlier query
      val bestGc = blocks.get(k).map(_.minBy(_.times.min).gcMs).getOrElse(0L)
      "\"" + k + "\":{\"passes\":[" + ts.map(fmt).mkString(",") +
        "],\"spread\":" + fmt(spreadOf(cleanTimes.getOrElse(k, ts))) +
        ",\"spread_all\":" + fmt(spreadOf(ts)) +
        ",\"sentinel_ratio\":" + fmt(ratioOf.getOrElse(k, 1.0)) +
        ",\"gc_ms\":" + bestGc + "}"
    }.mkString("{", ",", "}")
    val worst = results.map { case (k, ts) =>
      (spreadOf(cleanTimes.getOrElse(k, ts)), k)
    }.sortBy(-_._1).take(5)
    val dispLine =
      s"""{"repeat":$repeat,"queries":$disp,"errors":$errJson,"worst_spread":[${
        worst.map { case (r, k) => "[\"" + k + "\"," + fmt(r) + "]" }.mkString(",")
      }]}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_dispersion.json"), dispLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_dispersion.json write failed: ${e.getMessage}")
    }
    println(shortLine)
    if (shortLine.length > 1800)
      System.err.println(s"[bench] WARNING stdout line ${shortLine.length} B " +
        "exceeds the 1800 B tail budget — the driver may fail to parse it")
    rerunErrs.foreach { case (n, m) =>
      System.err.println(s"[bench] rerun-only failure (prior blocks kept) $n: $m")
    }
    spark.stop()
    if (errors.nonEmpty) {
      errors.foreach { case (n, m) => System.err.println(s"[bench] ERR $n: $m") }
      System.err.println(s"[bench] ${errors.size} queries errored — failing the run")
      sys.exit(1)
    }
  }
}
