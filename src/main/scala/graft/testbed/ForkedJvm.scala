package graft.testbed

/** Fork a second JVM running a testbed main with the repo classes +
  * the Spark jars on the classpath — the shared scaffolding of the
  * two-process rehearsals ([[CrossProcess]], [[CasRace]]): a genuinely
  * separate process with its own SparkSession and manifest cache,
  * nothing shared with the parent but the filesystem. Stderr goes to
  * a temp file (Spark logs); stdout is the rehearsal protocol. */
object ForkedJvm {

  final case class Child(process: Process,
      stdout: java.io.BufferedReader) {
    /** Wait, drain stdout, and require exit 0; returns the protocol
      * lines. */
    def awaitLines(timeoutSec: Long, what: String): Seq[String] = {
      require(process.waitFor(timeoutSec,
        java.util.concurrent.TimeUnit.SECONDS), s"$what did not finish")
      val lines = Iterator.continually(stdout.readLine())
        .takeWhile(_ != null).toSeq
      require(process.exitValue() == 0,
        s"$what failed (exit ${process.exitValue()}): " +
          lines.mkString(" | "))
      lines
    }
  }

  def spawn(mainClass: String, args: Seq[String],
      maxHeap: String = "4g"): Child = {
    val cp = Seq("target/scala-2.13/classes",
      "/opt/spark/jars/*").mkString(java.io.File.pathSeparator)
    val moduleFlags = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").toSeq
    val cmd = Seq("java") ++ moduleFlags ++
      Seq(s"-Xmx$maxHeap", "-cp", cp, mainClass) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(
      java.io.File.createTempFile("forked-child", ".err"))
    val p = pb.start()
    Child(p, new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream)))
  }
}
