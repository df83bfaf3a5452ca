package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's paginated REST JSON source (S1,
  * `harvard_artifacts_app.py:105-152`) re-shaped for Spark: a tiny
  * driver-side page loop lands raw JSONL files; all decoding happens on
  * executors via `spark.read.schema(...).json` — the network-bound part
  * stays sequential and polite (the reference rate-limits at 0.1 s/page,
  * `:143`), the CPU-bound part distributes.
  *
  * `fetchPage` abstracts the HTTP GET (`:127`): tests inject a local
  * fake; production injects a real client. Returns records-as-JSON-lines
  * per page, `None` when pagination is exhausted (≙ absent `info.next`,
  * `:137`).
  */
object PagedJsonIngest {

  /** Pull pages until `targetRecords` records (truncating the last page,
    * `:133-135`) or pagination end; land one JSONL file per page under
    * `landingDir`. Returns the number of records landed. */
  def land(fetchPage: Int => Option[Seq[String]],
           targetRecords: Int,
           landingDir: String,
           rateLimitMs: Long = 0L): Int = {
    Files.createDirectories(Paths.get(landingDir))
    var total = 0
    var page = 1
    var done = false
    while (!done && total < targetRecords) {
      fetchPage(page) match {
        case None => done = true
        case Some(records) =>
          val keep = records.take(targetRecords - total)
          Files.write(
            Paths.get(landingDir, f"page_$page%05d.jsonl"),
            keep.mkString("\n").getBytes(StandardCharsets.UTF_8))
          total += keep.size
          page += 1
          if (rateLimitMs > 0) Thread.sleep(rateLimitMs)
      }
    }
    total
  }

  /** Production `fetchPage`: real HTTP GET over `java.net.http` against
    * a paginated REST API (reference `harvard_artifacts_app.py:127`):
    * `baseUrl?{params}&page=N` per page, records under `recordsField`
    * re-emitted one-JSON-object-per-line, pagination exhausted when the
    * `nextPath` pointer is absent (`:137`) or the page is empty / a
    * non-200. Driver-side by design — the network loop is the
    * sequential, polite part; decode distributes via [[read]].
    *
    * Jackson (shipped with Spark) does the driver-side parse; records
    * pass through verbatim as canonical single-line JSON. */
  def httpFetchPage(baseUrl: String,
                    params: Map[String, String] = Map.empty,
                    recordsField: String = "records",
                    nextPath: Seq[String] = Seq("info", "next"),
                    client: java.net.http.HttpClient =
                      java.net.http.HttpClient.newHttpClient())
      : Int => Option[Seq[String]] = {
    import java.net.{URI, URLEncoder}
    import java.net.http.{HttpRequest, HttpResponse}
    import java.nio.charset.StandardCharsets.UTF_8
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var exhausted = false // reference stops after the page lacking info.next
    page => {
      if (exhausted) None
      else {
        val qs = (params + ("page" -> page.toString))
          .map { case (k, v) =>
            s"${URLEncoder.encode(k, UTF_8)}=${URLEncoder.encode(v, UTF_8)}" }
          .mkString("&")
        val req = HttpRequest.newBuilder(URI.create(s"$baseUrl?$qs")).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() != 200) None
        else {
          val root = mapper.readTree(resp.body())
          val recs = root.get(recordsField)
          if (recs == null || !recs.isArray || recs.isEmpty) None
          else {
            val next = nextPath.foldLeft(Option(root.asInstanceOf[
              com.fasterxml.jackson.databind.JsonNode])) {
              (n, f) => n.flatMap(x => Option(x.get(f)))
            }
            if (next.forall(_.isNull)) exhausted = true
            Some((0 until recs.size()).map(i =>
              mapper.writeValueAsString(recs.get(i))))
          }
        }
      }
    }
  }

  /** One-call production ingest: HTTP page loop (0.1 s/page rate limit,
    * reference `:143`) → JSONL landing dir. */
  def landFromHttp(baseUrl: String, params: Map[String, String],
                   targetRecords: Int, landingDir: String,
                   rateLimitMs: Long = 100L): Int =
    land(httpFetchPage(baseUrl, params), targetRecords, landingDir, rateLimitMs)

  /** Decode a landing dir on executors with a declared schema —
    * schema-on-read with a fixed target: unknown fields drop, missing
    * fields null (the `.get(k, default)` projection then runs in
    * [[graft.etl.ArtifactEtl]]). */
  def read(spark: SparkSession, landingDir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(landingDir)

  /** Malformed-line-tolerant decode: DROPMALFORMED skips lines the
    * schema can't parse (truncated page writes, upstream API garbage)
    * instead of surfacing them as all-null rows — a real ingest always
    * needs an explicit policy here, and silently-null rows are the
    * wrong default for a 100 TB load. */
  def readClean(spark: SparkSession, landingDir: String,
                schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(landingDir)

  /** Streaming variant of the same landing dir — the S1 row of
    * SURVEY.md §2.1 maps to `readStream` for continuous ingest. */
  def readStream(spark: SparkSession, landingDir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(landingDir)
}
