package graft

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[graft.tools.ClusterSmoke]] — the DV family under
  * `local-cluster[2,2,2048]` (two real executor JVMs) — in its OWN JVM:
  * a second SparkContext cannot share the suite JVM with TestSpark's
  * `local[4]` context. Skipped (assume) where the standalone executor
  * launch environment is unavailable: executors spawn through
  * `$SPARK_HOME/bin/spark-class`, so no runnable spark-class ⇒ no
  * local-cluster anywhere. Where it IS available, a failure here is a real
  * failure — a serialization seam the single-JVM suites cannot cross. */
class ClusterSmokeSpec extends AnyFunSuite {

  test("DV family (flow + current view + streaming hub/sat) under local-cluster[2,2,2048]") {
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(sparkHome, "bin/spark-class").canExecute,
      s"no runnable $sparkHome/bin/spark-class — standalone executors cannot launch")

    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val cmd = Seq(javaBin) ++ graft.tools.ClusterSmoke.Jdk17AddOpens ++ Seq(
      "-Xmx2g", "-cp", sys.props("java.class.path"), "graft.tools.ClusterSmoke")
    val pb = new ProcessBuilder(cmd: _*)
    // cwd in a temp dir: the standalone Worker drops executor work/ dirs
    // under its cwd — keep them out of the repo
    val cwd = java.nio.file.Files.createTempDirectory("graft_cluster_smoke_cwd_").toFile
    pb.directory(cwd)
    pb.environment().put("SPARK_HOME", sparkHome)
    pb.environment().put("JAVA_HOME", sys.props("java.home"))
    // the in-process Worker builds the executor command WITHOUT
    // bin/load-spark-env.sh, so the launcher can't infer the scala version
    // ("Cannot find any build directories") unless told explicitly
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    p.getOutputStream.close()
    // watchdog: a wedged cluster launch must fail the test, not hang sbt
    val watchdog = new Thread(() =>
      try {
        if (!p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)) {
          p.descendants().forEach(h => { h.destroyForcibly(); () })
          p.destroyForcibly(); ()
        }
      } catch { case _: InterruptedException => () })
    watchdog.setDaemon(true)
    watchdog.start()
    val out = try new String(p.getInputStream.readAllBytes(), "UTF-8")
    finally watchdog.interrupt()
    val exit = p.waitFor()
    val tail = out.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(exit == 0, s"cluster smoke exited $exit; last lines:\n$tail")
    assert(out.contains("[cluster-smoke] OK"), s"missing OK line; last lines:\n$tail")
  }
}
