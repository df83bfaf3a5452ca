package graft

import java.nio.file.Files

import graft.etl.ArtifactEtl
import graft.model.ArtifactSchemas
import graft.sources.PagedJsonIngest

/** S1 source semantics (reference `harvard_artifacts_app.py:105-152`):
  * page loop, target-record truncation, pagination-end stop, then
  * schema-on-read decode feeding the ETL. */
class PagedJsonIngestSpec extends SparkSpec {

  private def record(id: Int): String =
    s"""{"id": $id, "title": "Object $id", "culture": "Byzantine",
       | "classification": "Coins", "imagecount": ${id % 3},
       | "colors": [{"hue": "Grey", "percent": 0.5}],
       | "unknown_api_field": "dropped by schema"}""".stripMargin.replace("\n", "")

  private def fakeApi(pageSize: Int, totalAvailable: Int): Int => Option[Seq[String]] =
    page => {
      val start = (page - 1) * pageSize
      if (start >= totalAvailable) None
      else Some((start until math.min(start + pageSize, totalAvailable)).map(record))
    }

  test("lands exactly targetRecords, truncating the final page") {
    val dir = Files.createTempDirectory("ingest").toString
    val n = PagedJsonIngest.land(fakeApi(pageSize = 10, totalAvailable = 100),
                                 targetRecords = 25, landingDir = dir)
    assert(n == 25)
    val df = PagedJsonIngest.read(spark, dir, ArtifactSchemas.rawApiSchema)
    assert(df.count() == 25)
    // page files: 3 pages (10 + 10 + 5)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".jsonl")) == 3)
  }

  test("stops at pagination end when source has fewer records than target") {
    val dir = Files.createTempDirectory("ingest").toString
    val n = PagedJsonIngest.land(fakeApi(pageSize = 10, totalAvailable = 17),
                                 targetRecords = 2500, landingDir = dir)
    assert(n == 17)
  }

  test("http fetchPage pulls pages from a live local server and stops at pagination end") {
    import com.sun.net.httpserver.HttpServer
    val totalAvailable = 23
    val pageSize = 10
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", { exchange =>
      val q = exchange.getRequestURI.getQuery
      val page = q.split("&").collectFirst {
        case kv if kv.startsWith("page=") => kv.drop(5).toInt }.getOrElse(1)
      val start = (page - 1) * pageSize
      val recs = (start until math.min(start + pageSize, totalAvailable)).map(record)
      val next = if (start + pageSize < totalAvailable)
        s""""next": "page ${page + 1}"""" else """"next": null"""
      val body =
        s"""{"info": {$next, "totalrecords": $totalAvailable},
           | "records": [${recs.mkString(",")}]}""".stripMargin
      val bytes = body.getBytes("UTF-8")
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/api"
      val dir = Files.createTempDirectory("http-ingest").toString
      val fetch = PagedJsonIngest.httpFetchPage(url, Map("apikey" -> "test"))
      // target above availability: must stop at the absent info.next
      val n = PagedJsonIngest.land(fetch, targetRecords = 2500, landingDir = dir)
      assert(n == totalAvailable)
      val df = PagedJsonIngest.read(spark, dir, ArtifactSchemas.rawApiSchema)
      assert(df.count() == totalAvailable)
      // truncation path over HTTP too
      val dir2 = Files.createTempDirectory("http-ingest2").toString
      val n2 = PagedJsonIngest.land(
        PagedJsonIngest.httpFetchPage(url, Map("apikey" -> "test")),
        targetRecords = 15, landingDir = dir2)
      assert(n2 == 15)
    } finally server.stop(0)
  }

  test("malformed landing lines are dropped by the clean read, kept null by default") {
    val dir = Files.createTempDirectory("ingest-corrupt").toString
    PagedJsonIngest.land(fakeApi(10, 20), 10, dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "page_99999.jsonl"),
      "{\"id\": 777, \"title\": \"ok\"}\nTHIS IS NOT JSON {{{\n".getBytes("UTF-8"))
    val clean = PagedJsonIngest.readClean(spark, dir, ArtifactSchemas.rawApiSchema)
    assert(clean.count() == 11) // 10 landed + 1 valid line; garbage dropped
    val permissive = PagedJsonIngest.read(spark, dir, ArtifactSchemas.rawApiSchema)
    assert(permissive.count() == 12) // garbage surfaces as an all-null row
    assert(permissive.filter("id IS NULL").count() == 1)
  }

  test("schema-on-read drops unknown fields and feeds the ETL end-to-end") {
    val dir = Files.createTempDirectory("ingest").toString
    PagedJsonIngest.land(fakeApi(10, 30), 12, dir)
    val raw = PagedJsonIngest.read(spark, dir, ArtifactSchemas.rawApiSchema)
    assert(!raw.columns.contains("unknown_api_field"))
    val (meta, media, colors) = ArtifactEtl.transform(raw.cache())
    assert(meta.count() == 12 && media.count() == 12 && colors.count() == 12)
    assert(meta.columns.toSeq == ArtifactSchemas.metadataSchema.fieldNames.toSeq)
  }
}
