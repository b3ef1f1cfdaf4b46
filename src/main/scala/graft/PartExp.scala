package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PartExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        if (te.taskMetrics != null)
          bytes += te.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def run(tag: String, lay: Boolean, aqe: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val base = spark.range(4000000).select(col("id"),
        pmod(col("id"), lit(977)).as("bucket"))
      val idx = if (lay) base.repartition(col("bucket")) else base
      idx.persist(); idx.count()
      Thread.sleep(300)
      val b0 = bytes
      val batch = spark.range(5000).select(pmod(col("id"), lit(977)).as("bucket"),
        col("id").as("bid"))
      batch.join(idx, Seq("bucket")).count()
      Thread.sleep(300)
      println(f"$tag: joinShuffleMB=${(bytes - b0) / 1e6}%.1f")
      idx.unpersist()
    }
    run("layout+aqeOn ", lay = true, aqe = true)
    run("nolayout+aqeOn", lay = false, aqe = true)
    run("layout+aqeOff", lay = true, aqe = false)
    spark.stop()
  }
}
