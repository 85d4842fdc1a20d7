package graft.bench

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

/** Benchmark log hygiene.
  *
  * The driver captures only the LAST ~2000 chars of the bench process's
  * combined stdout+stderr; round 4's artifact was unparseable because Spark
  * session/executor startup INFO lines flooded that window (BENCH_r04.json
  * tail is all `INFO Executor:`/`INFO BlockManager:` noise). `install()`
  * forces the driver JVM's log4j2 root logger to ERROR *before* the first
  * SparkSession exists (setLogLevel only applies after creation), and
  * `executorConfigFile` writes an ERROR-level log4j2 config that
  * local-cluster executor JVMs load via `-Dlog4j2.configurationFile`, so
  * spawned processes stay silent too.
  */
object Quiet {
  def install(): Unit = {
    try {
      // point any not-yet-initialized log4j context at the ERROR config
      // (wins over Spark's INFO-level log4j2-defaults.properties), then
      // force the level on the current context in case something already
      // initialized logging in this JVM
      if (sys.props.get("log4j2.configurationFile").isEmpty)
        System.setProperty("log4j2.configurationFile", s"file:$executorConfigFile")
      org.apache.logging.log4j.core.config.Configurator.setRootLevel(
        org.apache.logging.log4j.Level.ERROR)
    } catch { case _: Throwable => () } // log4j-core absent: nothing to quiet
  }

  /** Path to an ERROR-level log4j2 properties file for executor JVMs
    * (written once per process under java.io.tmpdir; same box, so the path
    * is valid on the executor side of local-cluster mode). */
  lazy val executorConfigFile: String = {
    val p = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft-log4j2-error.properties")
    val body =
      """status = error
        |rootLogger.level = error
        |rootLogger.appenderRef.stderr.ref = stderr
        |appender.stderr.type = Console
        |appender.stderr.name = stderr
        |appender.stderr.target = SYSTEM_ERR
        |""".stripMargin
    Files.write(p, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    p.toString
  }
}
