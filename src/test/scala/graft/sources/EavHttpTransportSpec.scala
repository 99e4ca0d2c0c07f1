package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** The connector through the REAL HTTP path: a loopback stub server speaks
  * the REDCap form-POST protocol (records[i]=, fields=, type=flat ids
  * request) and the spec asserts both the RESULTS (≡ file transport on the
  * same data) and the PROTOCOL (per-chunk requests, server-side field
  * restriction, abort on 4xx, bounded retry then success on 5xx —
  * /root/reference/redcap-etl.py:104-121 error semantics). */
class EavHttpTransportSpec extends SparkSpec {
  import spark.implicits._

  private val header =
    "record_id,redcap_event_name,redcap_repeat_instrument,redcap_repeat_instance,field_name,value"
  private val data: Seq[String] = (1 to 25).flatMap { r =>
    Seq(s"r$r,screening_arm_1,,,age,${20 + r % 60}",
        s"r$r,screening_arm_1,,,np_dob,1990-01-0${r % 9 + 1}",
        s"r$r,followup_arm_1,,,visit_date,2001-06-15")
  }

  private def decode(body: String): Map[String, String] =
    body.split("&").filter(_.nonEmpty).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap

  /** Start a stub that answers the ids request and per-chunk extraction
    * requests from `data`, recording each decoded request. `prelude`
    * can fail the first n requests with a status code. */
  private def withServer(failFirst: Int = 0, failCode: Int = 500)
      (body: (String, java.util.List[Map[String, String]]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[Map[String, String]]())
    val failures = new AtomicInteger(failFirst)
    server.createContext("/api", (ex: HttpExchange) => {
      val params = decode(new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8))
      seen.add(params)
      if (failures.getAndDecrement() > 0) {
        respond(ex, failCode, "server sad")
      } else if (params.get("type").contains("flat")) {
        // ids-only universe request (≙ get_study_ids)
        val ids = data.map(_.split(",", -1)(0)).distinct
        respond(ex, 200, ("record_id" +: ids).mkString("\n"))
      } else {
        // chunk extraction: honor records[i]= and (optionally) fields=
        val ids = params.collect {
          case (k, v) if k.startsWith("records[") => v
        }.toSet
        val fields = params.get("fields").map(_.split(",").toSet)
        val rows = data
          .filter(l => ids.isEmpty || ids.contains(l.split(",", -1)(0)))
          .filter(l => fields.forall(_.contains(l.split(",", -1)(4))))
        respond(ex, 200, (header +: rows).mkString("\n"))
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/api", seen)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, code: Int, text: String): Unit = {
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def httpRead(url: String) = spark.read.format("graft-eav")
    .option("url", url).option("token", "t0k3n").option("chunk_size", 10)

  test("http transport: full extraction ≡ file transport, chunked protocol") {
    withServer() { (url, seen) =>
      val df = httpRead(url).load()
      assert(df.count() == 75)
      assert(df.rdd.getNumPartitions == 3) // 25 ids / 10-id chunks
      val chunkReqs = seen.toArray.map(_.asInstanceOf[Map[String, String]])
        .filter(_.get("type").contains("eav"))
      assert(chunkReqs.nonEmpty)
      // every extraction request is a form POST with token + records[i]=
      assert(chunkReqs.forall(p => p("token") == "t0k3n" &&
        p("content") == "record" && p.keys.exists(_.startsWith("records["))))
      // no chunk asked for more ids than chunk_size
      assert(chunkReqs.forall(_.keys.count(_.startsWith("records[")) <= 10))
    }
  }

  test("http transport: field_name pushdown becomes the fields= param") {
    withServer() { (url, seen) =>
      val df = httpRead(url).load().filter($"field_name" === "age")
      assert(df.count() == 25)
      assert(df.select("value").as[String].collect().forall(_.toInt >= 20))
      val chunkReqs = seen.toArray.map(_.asInstanceOf[Map[String, String]])
        .filter(_.get("type").contains("eav"))
      // the restriction rode the request — server-side row reduction, the
      // same wire contract as the reference's fields= usage
      assert(chunkReqs.nonEmpty && chunkReqs.forall(_.get("fields").contains("age")))
    }
  }

  test("http transport: 5xx retried with backoff, then succeeds") {
    withServer(failFirst = 2) { (url, seen) =>
      val df = httpRead(url).option("max_retries", "3").load()
      assert(df.count() == 75) // the two 500s were absorbed by retries
    }
  }

  test("http transport: 4xx aborts the extraction (no silent partials)") {
    withServer(failFirst = 1, failCode = 403) { (url, _) =>
      val e = intercept[Exception] {
        httpRead(url).load().count()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("HTTP 403")))
    }
  }

  test("http transport: 5xx beyond max_retries aborts") {
    withServer(failFirst = 100) { (url, _) =>
      val e = intercept[Exception] {
        httpRead(url).option("max_retries", "1").load().count()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(m =>
        m.contains("failed after") || m.contains("HTTP 500")))
    }
  }
}
