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
  val qRe = """"(q\d+\w*)":\s*([0-9.]+)""".r
  def parseMap(s: String): Map[String, Double] =
    qRe.findAllMatchIn(s).map(m => m.group(1) -> m.group(2).toDouble).toMap
  val floors = parseMap(IO.read(floorsFile))
  def runBench(dir: java.io.File, only: Option[String]): (Map[String, Double], Set[String]) = {
    IO.createDirectory(dir)
    val jcmd = Seq("java") ++ jdk17AddOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-cp", cp, "graft.Bench")
    val env = Seq("SPARK_GRAFT_SF_DIR" -> "/root/testdata/sf0.1",
      "SPARK_GRAFT_CPUS" -> "32") ++ only.map("SPARK_GRAFT_ONLY" -> _)
    val code = Process(jcmd, dir, env: _*).!
    if (code != 0) sys.error(s"benchCheck: Bench exited $code in $dir")
    val art = IO.read(dir / "bench_queries.json")
    val contended = """"contended":\[([^\]]*)\]""".r
      .findFirstMatchIn(art).map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSet
    (parseMap(art.substring(art.indexOf("\"queries\""))), contended)
  }
  val (t1, c1) = runBench(file("/tmp/benchcheck_pass1"), sys.env.get("SPARK_GRAFT_ONLY"))
  def violators(ts: Map[String, Double], contended: Set[String]): Seq[(String, Double, Double)] =
    ts.toSeq.flatMap { case (q, t) =>
      floors.get(q) match {
        case None => log.warn(s"benchCheck: $q has no floor (new query?) — skipped"); None
        case Some(f) if t > bar * f && !contended.contains(q) => Some((q, t, f))
        case _ => None
      }
    }
  val v1 = violators(t1, c1)
  if (v1.isEmpty) log.info(s"benchCheck: ${t1.size} queries within ${bar}x of their floors")
  else {
    log.warn(s"benchCheck: ${v1.size} first-pass violators: " +
      v1.map { case (q, t, f) => f"$q ($t%.3f vs floor $f%.3f)" }.mkString(", "))
    // pass 2 keeps the SAME query set as pass 1 (full run unless the
    // SPARK_GRAFT_ONLY dev knob narrowed it): re-running only the
    // violators was measured to inflate cheap queries 1.5-2x (a 2-query
    // JVM lacks the grouped run's code-cache/scan-buffer warmth), which
    // would confirm false regressions against full-run floors
    val (t2, c2) = runBench(file("/tmp/benchcheck_pass2"), sys.env.get("SPARK_GRAFT_ONLY"))
    // a violator whose SECOND measurement is itself contended is
    // unresolved, not cleared — surfaced loudly, but only two CLEAN
    // over-bar measurements constitute a confirmed regression
    v1.filter { case (q, _, _) => c2.contains(q) }.foreach { case (q, _, _) =>
      log.warn(s"benchCheck: $q over bar in pass 1 but pass 2 was contended — unresolved")
    }
    val v2 = violators(t2, c2).filter { case (q, _, _) => v1.exists(_._1 == q) }
    if (v2.nonEmpty) {
      v2.foreach { case (q, t, f) =>
        log.error(f"benchCheck REGRESSION $q: $t%.3f s vs floor $f%.3f s " +
          f"(${t / f}%.2fx > ${bar}x) in two contention-clean passes")
      }
      sys.error(s"benchCheck: ${v2.size} persistent perf regression(s)")
    }
    log.info("benchCheck: all first-pass violators cleared on the second pass")
  }
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
