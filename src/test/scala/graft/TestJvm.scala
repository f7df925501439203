package graft

import scala.sys.process._

/** Shared subprocess launcher for specs that need a SparkContext with
  * creation-time configuration the suite's shared session can't provide
  * (Hive metastore, custom shuffle manager): one place owns the JDK-17
  * --add-opens list and classpath plumbing, so a future JDK bump is a
  * one-file change. */
object TestJvm {

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run `mainClass args...` in a fresh JVM; returns (exit code, stdout). */
  def run(mainClass: String, args: Seq[String],
      sysProps: Seq[(String, String)] = Nil,
      env: Seq[(String, String)] = Nil): (Int, String) = {
    val cmd = Seq("java") ++ addOpens ++ Seq("-Xmx2g",
      "-Dspark.ui.enabled=false") ++
      sysProps.map { case (k, v) => s"-D$k=$v" } ++
      Seq("-cp", System.getProperty("java.class.path"), mainClass) ++ args
    val out = new StringBuilder
    // stderr is captured too (prefixed) — a subprocess crash is otherwise
    // undiagnosable from the spec's failure message
    val code = Process(cmd, None, env: _*) ! ProcessLogger(
      l => out.synchronized { out.append(l).append('\n') },
      l => out.synchronized { out.append("[stderr] ").append(l).append('\n') })
    (code, out.toString)
  }
}
