package graft.service

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.DataFrame

import graft.operators.Provenance

/** Lineage API service layer: the reference's five FastAPI endpoints
  * (reference: api/app.py:63-152) served over the JDK's built-in HTTP
  * server — zero extra dependencies, same routes, same JSON row shapes:
  *
  *   GET /provenance/batch/{batch_id}      → one batch object | 404
  *   GET /provenance/steps/{batch_id}      → step list (time asc)
  *   GET /provenance/rules/{batch_id}      → applied-rule list
  *   GET /provenance/source/{name}?limit=N → latest N batches desc
  *   GET /provenance/search?status=&source=&limit=N → filtered batches
  *     desc, capped at N (default 20; the reference's search is
  *     unbounded, the cap is the robust choice for a collect-and-serve)
  *
  * Each route delegates to the corresponding [[Provenance]] DataFrame
  * query (batchById / batchTimeline / batchRules / latestBatches /
  * search) and serializes with Dataset.toJSON, so the service is a thin
  * driver-side veneer — all real work stays distributed Spark plans.
  * Control-plane result sets are small by construction (per-batch rows,
  * top-N), which is what makes collect-and-serve correct here.
  */
final class LineageService(provenance: Provenance, bindPort: Int = 0) {

  private var server: HttpServer = _

  /** Start listening; returns the bound port (ephemeral when 0). */
  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", bindPort), 0)
    server.createContext("/provenance/", handler)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def jsonRows(df: DataFrame): Seq[String] = df.toJSON.collect().toSeq

  private def arr(rows: Seq[String]): String = rows.mkString("[", ",", "]")

  private def route(path: String, params: Map[String, String]): (Int, String) =
    path.split("/").filter(_.nonEmpty).toList match {
      case "provenance" :: "batch" :: id :: Nil =>
        jsonRows(provenance.batchById(id)).headOption
          .map((200, _)).getOrElse((404, """{"detail":"Batch ID not found"}"""))
      case "provenance" :: "steps" :: id :: Nil =>
        (200, arr(jsonRows(provenance.batchTimeline(id))))
      case "provenance" :: "rules" :: id :: Nil =>
        (200, arr(jsonRows(provenance.batchRules(id))))
      case "provenance" :: "source" :: name :: Nil =>
        val limit = params.get("limit").flatMap(_.toIntOption).getOrElse(20)
        (200, arr(jsonRows(provenance.latestBatches(Some(name), limit))))
      case "provenance" :: "search" :: Nil =>
        // ?limit= caps the collect (default 20, like /source) — the
        // reference's search is unbounded (api/app.py:136-152), but an
        // unfiltered search over a large control plane must not pull
        // every batch row onto the service thread
        val limit = params.get("limit").flatMap(_.toIntOption).getOrElse(20)
        (200, arr(jsonRows(provenance.search(params.get("status"),
          params.get("source")).limit(limit))))
      case _ => (404, """{"detail":"Not Found"}""")
    }

  private def handler: HttpHandler = (ex: HttpExchange) => {
    val (code, body) =
      try route(ex.getRequestURI.getPath, parseQuery(ex.getRequestURI.getQuery))
      catch {
        case e: Throwable =>
          (500, s"""{"detail":${escape(Option(e.getMessage).getOrElse("error"))}}""")
      }
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def parseQuery(q: String): Map[String, String] =
    Option(q).getOrElse("").split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      URLDecoder.decode(k, "UTF-8") -> URLDecoder.decode(v, "UTF-8")
    }.toMap

  private def escape(s: String): String = Provenance.jsonEscape(s)
}
