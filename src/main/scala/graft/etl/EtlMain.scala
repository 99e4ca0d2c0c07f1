package graft.etl

import graft.GraftSession
import graft.sources.IniConfig

/** CLI entry with the reference's exact flag surface (redcap-etl.py:15-29),
  * so an operator of the reference can run the Spark engine with the same
  * invocation:
  *
  * {{{
  * spark-submit --class graft.etl.EtlMain graft.jar \
  *   -c config.ini [-f] [-d] [-p] [-w out.ndjson]
  * }}}
  *
  *  - `-c/--configfile` (default `config.ini`) — the INI config
  *  - `-f/--fake`       — write envelopes locally instead of POSTing
  *  - `-d/--debug`      — verbose logging (Spark log level INFO)
  *  - `-p/--pub-debug`  — also write the wide record×field debug CSV
  *  - `-w/--writeout`   — stream every chunk document into one NDJSON file
  */
object EtlMain {

  final case class Args(configFile: String = "config.ini", fake: Boolean = false,
      debug: Boolean = false, pubDebug: Boolean = false,
      writeout: Option[String] = None)

  def parse(argv: Seq[String]): Args = {
    @annotation.tailrec
    def go(rest: List[String], acc: Args): Args = rest match {
      case Nil => acc
      case ("-c" | "--configfile") :: v :: t => go(t, acc.copy(configFile = v))
      case ("-f" | "--fake") :: t => go(t, acc.copy(fake = true))
      case ("-d" | "--debug") :: t => go(t, acc.copy(debug = true))
      case ("-p" | "--pub-debug") :: t => go(t, acc.copy(pubDebug = true))
      case ("-w" | "--writeout") :: v :: t => go(t, acc.copy(writeout = Some(v)))
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
    }
    go(argv.toList, Args())
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toIndexedSeq)
    val spark = GraftSession.builder("graft-etl").getOrCreate()
    if (args.debug) spark.sparkContext.setLogLevel("INFO")
    else spark.sparkContext.setLogLevel("WARN")
    try {
      val config = IniConfig.load(args.configFile)
      EtlJob.run(spark, config, fake = args.fake, pubDebug = args.pubDebug,
        writeout = args.writeout)
    } finally spark.stop()
  }
}
