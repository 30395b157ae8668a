package graft.extract

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.{Clock, Instant, ZoneId}
import java.time.format.DateTimeFormatter
import scala.jdk.CollectionConverters._

/** The extract stage (SURVEY.md E1): OAuth2 → REST states endpoint →
  * raw CSV landing + job-run ledger. Mirrors `extract_script.py`'s
  * behavior end to end:
  *
  *  - S2 token: POST `grant_type=client_credentials` form, take
  *    `access_token` from the JSON reply (`:77-104`).
  *  - S1 fetch: GET `{base_url}{endpoint}` with the bbox params
  *    `lamin/lomin/lamax/lomax` and `Authorization: Bearer` (`:106-123`).
  *  - F6 guards: missing `states` key → no file; empty `states` array →
  *    no file; both still COMPLETE the run (`:195-201, 275-280`).
  *  - K1/T5: fixed 17-column header, positional rows, file named
  *    `states_{job}_{yyyyMMdd_HHmmss}.csv`, output dir auto-created
  *    (`:205-233`).
  *  - A1: payload row count (reported in the completion message).
  *  - K4/K5/F7: STARTED → COMPLETED|FAILED job log with 500-char
  *    message truncation (`:157-189`); a failure after start is
  *    recorded, never rethrown into the scheduler (`:282-286`).
  *
  * Cell rendering matches Python's `csv.writer` over parsed JSON:
  * null → empty, true/false → `True`/`False` (this is exactly why the
  * captured extracts carry capitalized booleans — see the T4 strict
  * map), integral numbers bare, floats via their shortest decimal
  * form. The `Clock` is injectable so T5 filenames are testable.
  */
object ExtractJob {

  /** Raw landing header (17 cols, `extract_script.py:222-227`) — the
    * same fixed list the staging kernel expects. */
  val CsvHeader: Seq[String] = graft.etl.FlightStates.RawColumns

  private val mapper = new ObjectMapper()
  private val fileTsFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneId.of("UTC"))

  final case class RunResult(logId: Long, status: String,
      savedFile: Option[String], rows: Long)

  // ---------- S2: OAuth2 client-credentials token ----------

  def getAccessToken(http: HttpBackend, tokenUrl: String,
      clientId: String, clientSecret: String): String = {
    val reply = http.postForm(tokenUrl, Map(
      "grant_type" -> "client_credentials",
      "client_id" -> clientId,
      "client_secret" -> clientSecret))
    if (reply.status == 401)
      sys.error("401 acquiring token: check client_id/client_secret in job_definitions")
    if (reply.status >= 400)
      sys.error(s"HTTP ${reply.status} acquiring token")
    val node = mapper.readTree(reply.body)
    Option(node.get("access_token")).map(_.asText())
      .getOrElse(sys.error("token reply has no access_token"))
  }

  // ---------- S1: bounded states fetch ----------

  def callStatesApi(http: HttpBackend, job: Map[String, String],
      accessToken: String): JsonNode = {
    val url = job("base_url") + job("endpoint")
    val params = Seq("lamin", "lomin", "lamax", "lomax")
      .flatMap(k => job.get(k).map(k -> _)).toMap
    val reply = http.get(url, params,
      Map("Authorization" -> s"Bearer $accessToken"))
    if (reply.status >= 400) sys.error(s"HTTP ${reply.status} from states API")
    mapper.readTree(reply.body)
  }

  // ---------- K1/T5/F6/A1: CSV landing ----------

  /** Python-csv-compatible cell rendering of a JSON value (also the
    * cell semantics of the distributed [[graft.sources]] reader, so
    * both ingest paths feed the staging kernel identical strings).
    *
    * Floating-point cells format like Python's `str(float)` in its
    * plain-notation window (|v| ∈ [1e-4, 1e16)) — Java's default
    * flips to scientific notation at 1e7/1e-3, which would diverge
    * the raw CSV from the reference's captured extracts for values
    * like 0.0005 or 12345678.0. Array cells (the API's `sensors`
    * field) render like Python's `str(list)` — previously
    * `JsonNode.asText()` silently rendered any container as "". */
  private[graft] def renderCell(n: JsonNode): String =
    if (n == null || n.isNull) ""
    else if (n.isBoolean) { if (n.asBoolean()) "True" else "False" }
    else if (n.isArray)
      n.elements().asScala.map(renderPyRepr).mkString("[", ", ", "]")
    else if (n.isFloatingPointNumber) pyDouble(n.asDouble())
    else n.asText()

  /** Python `repr(...)` of a list ELEMENT (str(list) reprs elements). */
  private def renderPyRepr(n: JsonNode): String =
    if (n == null || n.isNull) "None"
    else if (n.isBoolean) { if (n.asBoolean()) "True" else "False" }
    else if (n.isTextual)
      "'" + n.asText().replace("\\", "\\\\").replace("'", "\\'") + "'"
    else if (n.isFloatingPointNumber) pyDouble(n.asDouble())
    else if (n.isArray)
      n.elements().asScala.map(renderPyRepr).mkString("[", ", ", "]")
    else n.asText()

  private[extract] def pyDouble(d: Double): String = {
    val abs = math.abs(d)
    // Python renders these as 'nan'/'inf'/'-inf'; Java's String.valueOf
    // would give 'NaN'/'Infinity'. Jackson's default parser cannot
    // produce them from standard JSON, but a lenient payload could.
    if (d.isNaN) "nan"
    else if (d == Double.PositiveInfinity) "inf"
    else if (d == Double.NegativeInfinity) "-inf"
    // ±0.0 before the BigDecimal path: BigDecimal drops the sign of
    // zero, but Python's str(-0.0) is '-0.0' (a legal JSON value for
    // e.g. vertical_rate) — detect the sign bit via 1/d
    else if (d == 0.0) { if (1.0 / d < 0.0) "-0.0" else "0.0" }
    else if (abs < 1e-4 || abs >= 1e16)
      String.valueOf(d) // outside Python's plain window — not a state field range
    else {
      val s = new java.math.BigDecimal(java.lang.Double.toString(d))
        .stripTrailingZeros().toPlainString
      if (s.contains('.')) s else s + ".0"
    }
  }

  /** Minimal-quoting CSV field, like Python's csv.writer defaults. */
  private[extract] def csvField(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Returns the written path, or None under the F6 empty guards. */
  def saveStatesCsv(payload: JsonNode, outputDir: String, jobName: String,
      clock: Clock): Option[String] = {
    if (payload == null || !payload.has("states") || payload.get("states").isNull)
      return None
    val states = payload.get("states")
    if (!states.isArray || states.isEmpty) return None

    val ts = fileTsFmt.format(clock.instant())
    val dir = Paths.get(outputDir)
    Files.createDirectories(dir)
    val file = dir.resolve(s"states_${jobName}_$ts.csv")
    val sb = new StringBuilder(CsvHeader.mkString("", ",", "\r\n"))
    states.elements().asScala.foreach { row =>
      sb.append(row.elements().asScala.map(c => csvField(renderCell(c)))
        .mkString("", ",", "\r\n"))
    }
    // Write-then-rename so the file NEVER exists partially at its
    // discoverable name: the staging discovery predicate
    // (`states_*.csv`) can run concurrently with this tick, and a
    // partial read would be marked processed in the ledger — the tail
    // rows then permanently lost (the known-set skips the completed
    // file). The '.tmp' suffix fails endswith('.csv'), so discovery
    // never lists it; ATOMIC_MOVE makes the final name appear whole.
    val tmp = dir.resolve(file.getFileName.toString + ".tmp")
    Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, file, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        // Some network/overlay mounts cannot rename atomically. Fall
        // back to a plain move: the whole-file-appears guarantee
        // weakens to rename-usually-instantaneous, but a hard failure
        // of every extract tick on such mounts is strictly worse — the
        // discovery race window shrinks from "whole write" to "one
        // rename" either way.
        Files.move(tmp, file,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    Some(file.toString)
  }

  // ---------- the job tick (`main`, `extract_script.py:241-292`) ----------

  def run(jobName: String, control: JobControl, http: HttpBackend,
      clock: Clock = Clock.systemUTC()): RunResult = {
    val job = control.jobConfig(jobName)
    val tokenUrl = control.systemConfig("opensky_token_url")
    val logId = control.logJobStart(jobName, clock.instant())
    try {
      val token = getAccessToken(http, tokenUrl,
        job("client_id"), job("client_secret"))
      val payload = callStatesApi(http, job, token)
      val saved = saveStatesCsv(payload, job("output_path"), jobName, clock)
      val rows = saved.map(_ =>
        payload.get("states").size().toLong).getOrElse(0L)
      val msg = saved match {
        case Some(path) => s"Downloaded $rows rows to $path"
        case None => "Completed (no new data)."
      }
      control.logJobEnd(logId, "COMPLETED", Some(msg), clock.instant())
      RunResult(logId, "COMPLETED", saved, rows)
    } catch {
      // NonFatal mirrors the reference's `except Exception`
      // (`extract_script.py`): HTTP/parse failures are recorded as a
      // FAILED run; process-fatal throwables (OOM, interrupt) propagate.
      case scala.util.control.NonFatal(e) =>
        control.logJobEnd(logId, "FAILED",
          Some(String.valueOf(e.getMessage)), clock.instant())
        RunResult(logId, "FAILED", None, 0L)
    }
  }
}
