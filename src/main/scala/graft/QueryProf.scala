package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

// Per-query cost-shape profiler for the optimization rounds (guide §1):
// wall time plus the distributed-shape counters the bench's single wall
// number cannot show — driver-visible job count (each extra job is a
// driver-side loop iteration or eager action inside the operator), stage
// and task counts, shuffle bytes crossing each exchange, executor CPU vs
// wall. Run: SPARK_GRAFT_ONLY=q58,q72 sbt "runMain graft.QueryProf".
// Reuses Bench's env contract (SF dir, cpu count) so shapes line up with
// the numbers the driver measures.
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    // SPARK_GRAFT_STAGES=1: additionally print per-stage task counts and
    // summed executor run time — attributes a query's exec_s to its
    // stages (r16: q30's 14 exec-s were invisible in the aggregate)
    val perStage = sys.env.contains("SPARK_GRAFT_STAGES")
    object L extends SparkListener {
      var jobs, stages, tasks = 0
      var shufRead, shufWrite, runMs, gcMs, spillB = 0L
      val stageAgg = scala.collection.mutable.LinkedHashMap[Int, (Int, Long, Long)]()
      val stageNames = scala.collection.mutable.Map[Int, String]()
      def reset(): Unit = synchronized {
        jobs = 0; stages = 0; tasks = 0
        shufRead = 0; shufWrite = 0; runMs = 0; gcMs = 0; spillB = 0
        stageAgg.clear(); stageNames.clear()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1
          if (perStage) stageNames(sc.stageInfo.stageId) =
            sc.stageInfo.name.takeWhile(_ != '\n').take(70)
        }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        tasks += 1
        val m = te.taskMetrics
        if (m != null) {
          shufRead += m.shuffleReadMetrics.totalBytesRead
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          runMs += m.executorRunTime
          gcMs += m.jvmGCTime
          spillB += m.diskBytesSpilled
          if (perStage) {
            val (c, r, d) = stageAgg.getOrElse(te.stageId, (0, 0L, 0L))
            stageAgg(te.stageId) =
              (c + 1, r + m.executorRunTime, d + m.executorDeserializeTime)
          }
        }
      }
      def stageReport(): String = synchronized {
        stageAgg.toSeq.sortBy(-_._2._2).map { case (sid, (c, r, d)) =>
          f"    stage $sid%5d tasks=$c%4d run_s=${r / 1e3}%7.2f " +
            f"deser_s=${d / 1e3}%6.2f  ${stageNames.getOrElse(sid, "")}%s"
        }.mkString("\n")
      }
    }
    spark.sparkContext.addSparkListener(L)

    // same warm pass as Bench: sf0.001 first for codegen/JIT, then one
    // throwaway at the target SF (page cache + loop-shape JIT)
    val warmDir = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
    val names = selected.keys.toSeq.sorted
    names.foreach { n =>
      try selected(n)(spark, warmDir).count() catch { case _: Throwable => () }
      try selected(n)(spark, sfDir).count() catch { case _: Throwable => () }
    }
    println(f"${"query"}%-36s ${"sec"}%7s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s " +
      f"${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"exec_s"}%7s ${"gc_ms"}%6s ${"spill_MB"}%8s")
    // SPARK_GRAFT_PASSES=N: run each measured query N times and report
    // every pass — pass 1 pays janino compiles of any codegen unit whose
    // BODY differs from the warm passes'; later passes are the
    // steady-state the bench's min-of-3 actually measures (r16: q30's
    // "21 exec-s stats stage" was 69% codegen-compile lock convoy, which
    // jstack showed and this flag separates)
    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(1)
    // janino compile activity from Spark's own codegen metrics source —
    // count and total wall of CodeGenerator.compile cache loads
    val cgHist = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
    names.foreach { n =>
      (1 to passes).foreach { pass =>
        // settle in-flight listener events from the previous query
        Thread.sleep(200); L.reset()
        val cg0 = cgHist.getCount
        val t0 = System.nanoTime()
        try selected(n)(spark, sfDir).count() catch {
          case e: Throwable => println(s"$n ERROR ${e.getMessage.take(120)}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        val cgN = cgHist.getCount - cg0
        println(f"$n%-36s $sec%7.3f ${L.jobs}%5d ${L.stages}%4d ${L.tasks}%6d " +
          f"${L.shufRead / 1e6}%9.1f ${L.shufWrite / 1e6}%9.1f ${L.runMs / 1e3}%7.1f " +
          f"${L.gcMs}%6d ${L.spillB / 1e6}%8.1f" +
          (if (passes > 1 || cgN > 0) f"  pass=$pass compiles=$cgN" else ""))
        if (perStage) println(L.stageReport())
      }
    }
    spark.stop()
  }
}
