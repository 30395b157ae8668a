package graft.extract

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Minimal injectable HTTP seam for the extract stage.
  *
  * The reference (`extract_script.py:77-123`) uses `requests` for two
  * calls per job tick: an OAuth2 token POST and one bounded-payload GET.
  * That is control-plane work — a single small payload per cron tick —
  * so it stays a driver-side client, never a distributed source
  * (SURVEY.md §2.1 S1/S2). The trait exists so tests inject canned
  * responses; production uses [[JdkHttpBackend]].
  */
final case class HttpReply(status: Int, body: String)

trait HttpBackend {
  /** POST `application/x-www-form-urlencoded`. */
  def postForm(url: String, form: Map[String, String]): HttpReply
  /** GET with query params + headers. */
  def get(url: String, params: Map[String, String],
      headers: Map[String, String]): HttpReply
}

object HttpBackend {
  def encode(params: Map[String, String]): String =
    params.toSeq.sortBy(_._1).map { case (k, v) =>
      URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" +
        URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")

  /** Append query params to a URL that may already carry a query
    * string (e.g. an endpoint configured as '/states/all?extended=1'):
    * '&' then, '?' otherwise. A second literal '?' would make the
    * server read everything after it as part of the first param's
    * value — the bbox params silently dropped and a full-globe payload
    * returned into a band that believes it fetched one slice. */
  def withParams(url: String, params: Map[String, String]): String =
    if (params.isEmpty) url
    else url + (if (url.contains("?")) "&" else "?") + encode(params)
}

/** java.net.http implementation (JDK 11+, no extra dependency). */
final class JdkHttpBackend(timeout: Duration = Duration.ofSeconds(30))
    extends HttpBackend {
  // follow redirects like the reference's `requests` does — the JDK
  // default is NEVER, under which a 301 from the token endpoint
  // surfaces as "no access_token" and a redirected states GET parses
  // the HTML body as an empty payload (a SILENT data outage)
  private val client = HttpClient.newBuilder().connectTimeout(timeout)
    .followRedirects(HttpClient.Redirect.NORMAL).build()

  override def postForm(url: String, form: Map[String, String]): HttpReply = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(HttpBackend.encode(form)))
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    HttpReply(res.statusCode(), res.body())
  }

  override def get(url: String, params: Map[String, String],
      headers: Map[String, String]): HttpReply = {
    val full = HttpBackend.withParams(url, params)
    val b = HttpRequest.newBuilder(URI.create(full)).timeout(timeout).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val res = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    HttpReply(res.statusCode(), res.body())
  }
}
