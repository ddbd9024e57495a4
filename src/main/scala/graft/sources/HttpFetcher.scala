package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers
import java.net.CookieManager
import java.nio.charset.StandardCharsets
import java.time.Duration

/** S1 (Angelo_ETL_Task.py:131-147): authenticated HTTP POST fetch.
  * Driver-side I/O, not a relational op — kept behind a trait so
  * pipelines depend on `Fetcher`, tests inject a stub, and the engine
  * core never touches the network. The reference logs into loinc.org
  * with a session cookie then POSTs for two ZIP bodies; `JdkFetcher`
  * reproduces that shape (cookie-managed session + form POSTs) with
  * the JDK's HttpClient.
  */
trait Fetcher {
  /** POST `form` (urlencoded) and return the response body bytes. */
  def post(url: String, form: Map[String, String]): Array[Byte]
}

final class JdkFetcher(timeout: Duration = Duration.ofMinutes(5))
    extends Fetcher {
  private val client = HttpClient.newBuilder()
    .cookieHandler(new CookieManager()) // session cookies across posts
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(timeout)
    .build()

  private def encode(form: Map[String, String]): String =
    form.map { case (k, v) =>
      java.net.URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" +
        java.net.URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")

  override def post(url: String, form: Map[String, String]): Array[Byte] = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout)
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(BodyPublishers.ofString(encode(form)))
      .build()
    val resp = client.send(req, BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 400)
      throw new java.io.IOException(
        s"POST $url failed: HTTP ${resp.statusCode()}")
    resp.body()
  }
}

/** In-memory fetcher for tests: serves canned bytes per URL. */
final class StubFetcher(responses: Map[String, Array[Byte]])
    extends Fetcher {
  override def post(url: String, form: Map[String, String]): Array[Byte] =
    responses.getOrElse(url,
      throw new java.io.IOException(s"no stub response for $url"))
}
