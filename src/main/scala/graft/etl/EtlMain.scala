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
      // argparse's --flag=value form
      case a :: t if a.startsWith("--") && a.contains("=") =>
        val Array(k, v) = a.split("=", 2)
        go(k :: v :: t, acc)
      case ("-c" | "--configfile") :: v :: t => go(t, acc.copy(configFile = v))
      case ("-f" | "--fake") :: t => go(t, acc.copy(fake = true))
      case ("-d" | "--debug") :: t => go(t, acc.copy(debug = true))
      case ("-p" | "--pub-debug") :: t => go(t, acc.copy(pubDebug = true))
      case ("-w" | "--writeout") :: v :: t => go(t, acc.copy(writeout = Some(v)))
      case (f @ ("-c" | "--configfile" | "-w" | "--writeout")) :: Nil =>
        throw new IllegalArgumentException(s"missing value for $f")
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
      val out = EtlJob.run(spark, config, fake = args.fake,
        pubDebug = args.pubDebug, writeout = args.writeout)
      if (!args.fake) {
        // the reference's default path POSTs to the datalake — fail fast if
        // there is nowhere to deliver, never silently discard the run
        val endpoint = config.resolved("datalake", "api_endpoint").getOrElse(
          throw new IllegalArgumentException(
            "config: [datalake] api_endpoint required without --fake"))
        val post = Sinks.httpPost(endpoint) _
        post(out.header) // header document first (reference chunk 1)
        Sinks.transmit(out.envelopes, post)
        out.recordEnvelopes.foreach(Sinks.transmit(_, post))
      }
    } finally spark.stop()
  }
}
