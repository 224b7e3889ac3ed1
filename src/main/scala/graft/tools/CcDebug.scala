package graft.tools
import org.apache.spark.sql.SparkSession
object CcDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dumper = new Thread(() => {
      var t = 0
      while (t < 20) {
        Thread.sleep(1000); t += 1
        val traces = Thread.getAllStackTraces
        val it = traces.entrySet().iterator()
        var printed = 0
        while (it.hasNext && printed < 2) {
          val e = it.next()
          val n = e.getKey.getName
          val frames = e.getValue
          if (n.startsWith("Executor task launch") && frames.nonEmpty
              && !frames.exists(_.toString.contains("getTask"))) {
            System.err.println(s"[dump] t=$t thread $n state=${e.getKey.getState}")
            frames.take(16).foreach(f => System.err.println(s"[dump]   $f"))
            printed += 1
          }
        }
      }
    })
    dumper.setDaemon(true); dumper.start()
    graft.queries.DvQueries.streamEventsJoin(spark, "/root/testdata/sf0.1")
      .write.format("noop").mode("overwrite").save()
    spark.stop()
  }
}
