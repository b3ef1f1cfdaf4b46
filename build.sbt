ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "orange3timeseriesspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
scalacOptions += "-deprecation"

// Dead-code guard (VERDICT r5 task 8): fail the build when a public
// def/val in src/main is referenced nowhere else in the tree (main or
// test) and is not on the documented exempt list. Name-based — coarse by
// design (overload-blind, same-name collisions count as references), but
// it is exactly the sweep rounds 4/5 ran by hand, now permanent. Run via
// `sbt deadCodeSweep`; `sbt check` = test + sweep.
lazy val deadCodeSweep = taskKey[Unit](
  "fail on unreferenced public members outside tools/deadcode_exempt.txt")
deadCodeSweep := {
  val log = streams.value.log
  val mainFiles = ((Compile / scalaSource).value ** "*.scala").get
  val allFiles = mainFiles ++ ((Test / scalaSource).value ** "*.scala").get
  val exemptFile = baseDirectory.value / "tools" / "deadcode_exempt.txt"
  val exempt = (if (exemptFile.exists) IO.readLines(exemptFile) else Nil)
    .map(_.trim).filterNot(l => l.isEmpty || l.startsWith("#")).toSet
  // names with language/contract meaning that a textual sweep must skip
  val builtin = Set("apply", "unapply", "main", "toString", "equals",
    "hashCode", "compare", "value", "gradient", "dataType", "nullable",
    "eval", "doGenCode", "child", "children", "withNewChildrenInternal",
    "withNewChildInternal", "nullSafeEval", "prettyName", "left", "right",
    // Catalyst DeclarativeAggregate + Breeze DiffFunction contract members
    "aggBufferAttributes", "initialValues", "updateExpressions",
    "mergeExpressions", "evaluateExpression", "calculate")
  val defRe = ("""(?m)^\s*(?:@\w+\s+)?(?:final\s+|override\s+|implicit\s+|""" +
    """lazy\s+|case\s+)*(?:def|val)\s+([A-Za-z_][A-Za-z0-9_]*)""").r
  val decls: Seq[(String, String)] = mainFiles.flatMap { f =>
    val src = IO.read(f)
    // strip line comments so commented-out code never declares
    val code = src.linesIterator.filterNot { l =>
      val t = l.trim; t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
    }.mkString("\n")
    defRe.findAllMatchIn(code)
      .filterNot(m => m.matched.contains("private"))
      .map(m => m.group(1) -> f.getName)
      .filterNot { case (n, _) => builtin(n) || exempt(n) || n.startsWith("_") }
  }
  // count whole-word occurrences across the full tree (decls included)
  val corpus = allFiles.map(IO.read(_)).mkString("\n")
  val counts = decls.groupBy(_._1).map { case (n, ds) =>
    val occ = ("""\b""" + java.util.regex.Pattern.quote(n) + """\b""").r
      .findAllMatchIn(corpus).size
    (n, ds.map(_._2).distinct, occ, ds.size)
  }
  val dead = counts.filter { case (_, _, occ, nDecl) => occ <= nDecl }.toSeq
  if (dead.nonEmpty) {
    dead.sortBy(_._1).foreach { case (n, fs, occ, _) =>
      log.error(s"unreferenced public member: $n (${fs.mkString(", ")}, $occ occurrence(s))")
    }
    sys.error(s"deadCodeSweep: ${dead.size} unreferenced public member(s); " +
      "delete them or justify in tools/deadcode_exempt.txt")
  } else log.info(s"deadCodeSweep: ${decls.size} public members checked, 0 dead")
}
addCommandAlias("check", ";test;deadCodeSweep")

// Per-query perf regression tripwire (VERDICT r10 task 5): run the full
// bench at sf0.1, compare each contention-clean query against its
// checked-in idle floor (tools/bench_floors.json, maintained by
// tools/update_floors.py — floors only ever move DOWN), and for any
// query above 1.5x its floor run a SECOND temporally-separated pass.
// A query above the bar in two consecutive contention-clean
// measurements is a real regression -> red. Dev knob: SPARK_GRAFT_ONLY
// restricts the first pass (used by the negative test).
lazy val benchCheck = taskKey[Unit](
  "fail when a contention-clean query exceeds 1.5x its checked-in floor twice")
benchCheck := {
  import scala.sys.process._
  val log = streams.value.log
  val cp = (Runtime / fullClasspath).value.files.map(_.getAbsolutePath)
    .mkString(java.io.File.pathSeparator)
  val base = baseDirectory.value
  val bar = sys.env.getOrElse("BENCHCHECK_BAR", "1.5").toDouble
  val floorsFile = base / "tools" / "bench_floors.json"
  // real JSON parsing of floors + artifacts (ADVICE r11: the regex
  // scrape would silently corrupt the map on an error string containing
  // '"q12": 1.5' or on artifact-format drift; python3 is already a
  // build-time dependency via gateSweep/compare.py, so parse with it and
  // fail loudly on malformed JSON instead)
  val pyExtract =
    """import json,sys
      |d = json.load(open(sys.argv[1]))
      |src = d.get('queries') if isinstance(d.get('queries'), dict) else d
      |for k, v in src.items():
      |    if isinstance(v, (int, float)) and k.startswith('q'):
      |        print('Q\t%s\t%.6f' % (k, v))
      |for q in d.get('contended', []):
      |    print('C\t%s' % q)
      |if isinstance(d.get('sentinel_ref'), (int, float)):
      |    print('S\t%.6f' % d['sentinel_ref'])
      |if isinstance(d.get('_floor_sentinel_ref'), (int, float)):
      |    print('F\t%.6f' % d['_floor_sentinel_ref'])
      |""".stripMargin
  // (floors file only; artifacts never carry _floor_sentinel_ref)
  def parseArtifact(f: java.io.File)
      : (Map[String, Double], Set[String], Option[Double], Option[Double]) = {
    val out = Process(Seq("python3", "-c", pyExtract, f.getAbsolutePath)).!!
    val lines = out.linesIterator.map(_.split('\t')).toVector
    (lines.collect { case Array("Q", q, t) => q -> t.toDouble }.toMap,
      lines.collect { case Array("C", q) => q }.toSet,
      lines.collectFirst { case Array("S", s) => s.toDouble },
      lines.collectFirst { case Array("F", s) => s.toDouble })
  }
  val parsedFloors = parseArtifact(floorsFile)
  val floors = parsedFloors._1
  // floor-provenance machine speed: floors were captured on a host whose
  // idle sentinel_ref was this value (tools/bench_floors.json, r12
  // run-7). Logged against each pass's own sentinel_ref, and consumed by
  // the mechanical slow-host adjudication below (r13: a 13-52% elevated
  // sentinel floor with gc_ms=0 inflated 13 unrelated queries past the
  // bar — weather, not engine). Parsed by the same pyExtract pass as the
  // floors themselves (ADVICE r13: no second python subprocess, and a
  // non-numeric value is skipped by the isinstance guard, which the
  // adjudication treats as missing provenance -> no advisory).
  val floorSentinel = parsedFloors._4
  if (floors.isEmpty) sys.error(s"benchCheck: no floors parsed from $floorsFile")
  def runBench(dir: java.io.File, only: Option[String])
      : (Map[String, Double], Set[String], Option[Double]) = {
    IO.createDirectory(dir)
    val jcmd = Seq("java") ++ jdk17AddOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-cp", cp, "graft.Bench")
    val env = Seq("SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.1",
      "SPARK_GRAFT_CPUS" -> "32") ++ only.map("SPARK_GRAFT_ONLY" -> _)
    val code = Process(jcmd, dir, env: _*).!
    if (code != 0) sys.error(s"benchCheck: Bench exited $code in $dir")
    val p = parseArtifact(dir / "bench_queries.json")
    (p._1, p._2, p._3)
  }
  // Every pass runs the SAME full query set (re-running only the
  // violators was measured to inflate cheap queries 1.5-2x — a 2-query
  // JVM lacks the grouped run's code-cache/scan-buffer warmth — which
  // would confirm false regressions against full-run floors). Per-query
  // verdict state across passes:
  //   clean measurement <= bar·floor        -> CLEARED
  //   two clean measurements  > bar·floor   -> CONFIRMED over-bar; fed to
  //     the mechanical slow-host adjudication below — red unless the
  //     recorded evidence (sentinel ratio, gc_ms, family breadth)
  //     satisfies the weather rule, in which case the gate is a loudly
  //     annotated green ("OVER-BAR/SLOW-HOST (advisory)"). A confirmation
  //     no longer ends the run early: the remaining unresolved queries
  //     still get their retry passes, since the confirm may adjudicate
  //     advisory rather than red.
  //   contended in every pass                -> UNRESOLVED, red (ADVICE
  //     r11: a real regression under persistent contention must not
  //     pass green — extra passes retry it, and running out of passes
  //     without one clean measurement fails loudly)
  val only = sys.env.get("SPARK_GRAFT_ONLY")
  val maxPasses = sys.env.getOrElse("BENCHCHECK_MAX_PASSES", "3").toInt
  val overCount = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
  val cleared = scala.collection.mutable.Set[String]()
  // (query, confirming time, floor, confirming PASS index — ADVICE r14:
  // the adjudication discounts t by ITS OWN pass's gc_ms, not a pause
  // recorded in a pass that did not produce the measurement)
  val confirmedRegs = scala.collection.mutable.ArrayBuffer[(String, Double, Double, Int)]()
  // evidence for the mechanical slow-host adjudication (VERDICT r13
  // task 3): per-pass sentinel ratios, every over-bar-in-a-clean-pass
  // query (family breadth), and the dispersion artifacts (gc_ms)
  val passSentinels = scala.collection.mutable.ArrayBuffer[Double]()
  val passDirs = scala.collection.mutable.ArrayBuffer[java.io.File]()
  val overbarAny = scala.collection.mutable.Set[String]()
  var openQs: Set[String] = Set("bootstrap")
  var pass = 0
  while (pass < maxPasses && openQs.nonEmpty) {
    pass += 1
    if (pass > 1) log.warn(s"benchCheck pass $pass: ${openQs.size} " +
      s"unresolved (${openQs.toSeq.sorted.mkString(", ")}) — full re-run")
    val passDir = file(s"/tmp/benchcheck_pass$pass")
    val (tn, cn, sref) = runBench(passDir, only)
    passDirs += passDir
    sref.foreach(passSentinels += _)
    for (s0 <- floorSentinel; s1 <- sref)
      log.info(f"benchCheck pass $pass machine speed: sentinel_ref $s1%.4f " +
        f"vs floor-era $s0%.4f (${s1 / s0}%.2fx slower-is-higher)")
    tn.foreach { case (q, t) =>
      floors.get(q) match {
        case None =>
          if (pass == 1) log.warn(s"benchCheck: $q has no floor (new query?) — skipped")
        case Some(f) if !cn.contains(q) && !cleared.contains(q) =>
          if (t <= bar * f) cleared += q
          else {
            overCount(q) += 1
            overbarAny += q
            log.warn(f"benchCheck: $q over bar in clean pass $pass " +
              f"($t%.3f vs floor $f%.3f, ${t / f}%.2fx)")
            // exactly-once append: later full re-run passes keep
            // measuring a confirmed query (the re-runs exist for the
            // still-open ones) and must not duplicate its entry
            if (overCount(q) == 2) confirmedRegs += ((q, t, f, pass))
          }
        case _ => ()
      }
    }
    openQs = tn.keySet.filter(q => floors.contains(q) &&
      !cleared.contains(q) && overCount(q) < 2)
  }
  if (confirmedRegs.nonEmpty) {
    confirmedRegs.foreach { case (q, t, f, _) =>
      log.error(f"benchCheck confirmed over-bar $q: $t%.3f s vs floor $f%.3f s " +
        f"(${t / f}%.2fx > ${bar}x) in two contention-clean passes")
    }
    // Mechanical slow-host adjudication (VERDICT r13 task 3; replaces
    // the per-round prose verdicts of r11-r13): tools/weather_verdict.py
    // applies the recorded-evidence rule — every pass's machine speed
    // >= 1.15x the floor era AND confirmed queries' gc_ms <= 50 AND the
    // over-bar set spans >= 3 name-derived families — and exits 0 for
    // "OVER-BAR/SLOW-HOST (advisory)" (loud green) or 2 for a real
    // REGRESSION (the historical red). The evidence file is committed
    // next to the transcript so the verdict replays.
    val evFile = file("/tmp/benchcheck_weather_events.json")
    def jarr(xs: Seq[String]) = xs.map(s => "\"" + s + "\"").mkString("[", ",", "]")
    IO.write(evFile, s"""{"bar":$bar,
      |"floor_sentinel":${floorSentinel.getOrElse("null")},
      |"pass_sentinels":[${passSentinels.mkString(",")}],
      |"confirmed":[${confirmedRegs.map { case (q, t, f, p) =>
          s"""{"q":"$q","t":$t,"floor":$f,"pass":$p}""" }.mkString(",")}],
      |"overbar_any":${jarr(overbarAny.toSeq.sorted)},
      |"dispersion_files":${jarr(passDirs.map(d =>
          (d / "bench_dispersion.json").getAbsolutePath))}}
      |""".stripMargin)
    val wcode = Process(Seq("python3",
      (base / "tools" / "weather_verdict.py").getAbsolutePath,
      evFile.getAbsolutePath)).!
    if (wcode == 0)
      log.warn(s"benchCheck: ${confirmedRegs.size} confirmed over-bar " +
        "quer(ies) adjudicated OVER-BAR/SLOW-HOST (advisory) — gate " +
        s"green with this annotation; evidence: $evFile")
    else
      sys.error(s"benchCheck: ${confirmedRegs.size} persistent perf " +
        "regression(s) — weather_verdict: REGRESSION (see rule output above)")
  }
  if (openQs.nonEmpty) {
    val neverClean = openQs.filter(q => overCount(q) == 0)
    val onceOver = openQs -- neverClean
    sys.error(s"benchCheck: ${openQs.size} queries unresolved after $maxPasses " +
      s"passes — over-bar awaiting a clean confirm: ${onceOver.toSeq.sorted.mkString(", ")}; " +
      s"contended in every pass: ${neverClean.toSeq.sorted.mkString(", ")}")
  }
  // Spread bar (r13, formalizing the criterion rounds are graded on —
  // tools/bench_floors.json `_policy`): >=85% of contention-clean queries
  // must show max/min pass spread <= 1.25 within the run. Computed from
  // the FIRST pass's dispersion artifact (later passes exist only to
  // retry floor violations). Override with BENCHCHECK_SPREAD_MIN; 0
  // disables (idle single runs have been observed to swing 68-88%, so a
  // knowingly-contended host can opt down rather than re-run weather).
  // A failing bar is no longer an unconditional red (VERDICT r14 task 1
  // — the r13/r14 rounds each ended hand-adjudicating exactly this):
  // tools/weather_verdict.py --spread applies the recorded-evidence rule
  // (slow/noisy host sentinel + gc-discounted spreads + family breadth)
  // and exits 0 for a loudly-annotated advisory green or 2 for the
  // historical red. The evidence file replays the verdict.
  val spreadMin = sys.env.getOrElse("BENCHCHECK_SPREAD_MIN", "0.85").toDouble
  if (spreadMin > 0) {
    val pySpread =
      """import json,sys
        |d = json.load(open(sys.argv[1]))
        |qs = [(k, v) for k, v in d['queries'].items()
        |      if isinstance(v, dict) and 'spread' in v]
        |ok = sum(1 for _, v in qs if v['spread'] <= 1.25)
        |print('%d\t%d' % (ok, len(qs)))
        |""".stripMargin
    val dispFile = file("/tmp/benchcheck_pass1/bench_dispersion.json")
    if (dispFile.exists) {
      val Array(ok, tot) = Process(Seq("python3", "-c", pySpread,
        dispFile.getAbsolutePath)).!!.trim.split('\t').map(_.toInt)
      val pct = if (tot > 0) ok.toDouble / tot else 1.0
      log.info(f"benchCheck spread: $ok/$tot clean queries <= 1.25x " +
        f"(${pct * 100}%.0f%% vs ${spreadMin * 100}%.0f%% bar)")
      if (pct < spreadMin) {
        val sevFile = file("/tmp/benchcheck_spread_events.json")
        IO.write(sevFile, s"""{"spread_bar":1.25,"spread_min":$spreadMin,
          |"pass1_sentinel":${passSentinels.headOption.getOrElse("null")},
          |"floor_sentinel":${floorSentinel.getOrElse("null")},
          |"dispersion_file":"${dispFile.getAbsolutePath}"}
          |""".stripMargin)
        val scode = Process(Seq("python3",
          (base / "tools" / "weather_verdict.py").getAbsolutePath,
          "--spread", sevFile.getAbsolutePath)).!
        if (scode == 0)
          log.warn(f"benchCheck: spread bar missed (${pct * 100}%.0f%% < " +
            f"${spreadMin * 100}%.0f%%) but adjudicated OVER-SPREAD/" +
            s"SLOW-HOST (advisory) — gate green with this annotation; " +
            s"evidence: $sevFile")
        else
          sys.error(f"benchCheck: only ${pct * 100}%.0f%% of queries within " +
            f"1.25x spread (< ${spreadMin * 100}%.0f%% bar) — " +
            "weather_verdict[spread]: REGRESSION (see rule output above)")
      }
    } else log.warn("benchCheck: no dispersion artifact for the spread bar")
  }
  log.info(s"benchCheck: ${cleared.size} queries within ${bar}x of their floors" +
    (if (pass > 1) s" (resolved in $pass passes)" else ""))
}

// Three-SF oracle sweep + enforced margin audit (VERDICT r9 tasks 6/7):
// the manual sf0.001/sf0.1 sweeps caught two real cross-engine flakes in
// r9 (q105 epoch rounding, q86 6dp landings) — this makes the sweep one
// command so every round runs it. q31/q32/q33/q127 are per-SF golden
// oracles with no sf0.001 tag (documented exemption); the margin audit
// runs --enforce against tools/margin_baseline.json so a testdata
// regeneration or engine upgrade that reopens the q81/q86 boundary-flake
// class fails loudly here instead of flipping a gate hash later.
lazy val gateSweep = taskKey[Unit](
  "three-SF Verify + DuckDB oracle compare + enforced margin audit")
gateSweep := {
  import scala.sys.process._
  val log = streams.value.log
  val cp = (Runtime / fullClasspath).value.files.map(_.getAbsolutePath)
    .mkString(java.io.File.pathSeparator)
  val base = baseDirectory.value
  val goldenExempt =
    "q31_arima_forecast,q32_var_forecast,q33_model_eval,q127_fit_on_interp_glue"
  Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
    val out = s"/tmp/gatesweep_$sf"
    log.info(s"gateSweep: graft.Verify at $sf -> $out")
    val jcmd = Seq("java") ++ jdk17AddOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-cp", cp, "graft.Verify", s"/root/testdata/$sf", out)
    val code = Process(jcmd, base, "SPARK_GRAFT_CPUS" -> "8").!
    if (code != 0) sys.error(s"gateSweep: Verify exited $code at $sf")
    val errs = IO.read(file(s"$out/errors.json")).trim
    if (errs != "{}") sys.error(s"gateSweep: query errors at $sf: $errs")
    val ex = if (sf == "sf0.001") goldenExempt else ""
    val cmp = Process(Seq("python3", "tools/compare.py",
      s"/root/testdata/$sf", out, ex), base).!
    if (cmp != 0) sys.error(s"gateSweep: oracle compare FAILED at $sf")
    log.info(s"gateSweep: $sf green")
  }
  val ma = Process(Seq("python3", "tools/margin_audit.py",
    "/root/testdata/sf0.01", "/tmp/gatesweep_sf0.01", "1e-9", "--enforce"),
    base).!
  if (ma != 0) sys.error("gateSweep: margin audit FAILED")
  log.info("gateSweep: all three SFs green, margins enforced")
}
