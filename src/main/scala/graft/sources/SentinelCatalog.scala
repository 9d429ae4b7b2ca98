package graft.sources

import org.apache.spark.sql.SparkSession

/** Sentinel-2 product SEARCH + mosaic selection — the last
  * reference-adjacent ingest gap (r18 verdict item 6): the reference's
  * `CopernicusClient.findProducts(area, year, quartile)`
  * (copernicus_resource.py:34-38) delegates to
  * `Sentinel2Loader.getAreaMosaics` configured with
  * `cloudCoverage=(0, 100), mosaic=True` and then
  * `downloadAll(products, checksum=False)`. The selection logic lives
  * in the external sentinelloader library; its CONTRACT — quartile
  * date windowing, cloud-cover range filtering, per-tile
  * dedup-to-mosaic selection, then a bulk resumable download — is what
  * this seam reproduces engine-side.
  *
  *  - [[quartileRange]]: year + quartile (1-4) → inclusive [from, to]
  *    date strings (the mosaic period).
  *  - [[searchProducts]]: paged catalog GET (`from`/`to`/`bbox`/`page`
  *    query params) through the [[CdsJobs.control]] retry/auth seam;
  *    the response is a flat-object JSON product list parsed with the
  *    same minimal scanner as the CDS control bodies.
  *  - [[selectMosaic]]: cloud-cover range filter + per-tile selection:
  *    LOWEST cloud cover wins, ties to the LATEST date then smallest
  *    id — one product per tile, the mosaic's input set.
  *  - [[findProducts]]: the composed contract; downloads land through
  *    [[HttpFetch.fetchAll]]'s resumable manifest (exactly-once on
  *    re-run — the engine twin of `downloadAll(checksum=False)`).
  */
object SentinelCatalog {

  final case class Product(id: String, tile: String, date: String,
      cloudCover: Double, url: String)

  /** Inclusive date window of a year's quartile (the reference passes
    * `quartile` straight to sentinelloader's mosaic period).
    */
  def quartileRange(year: Int, quartile: Int): (String, String) = {
    require(quartile >= 1 && quartile <= 4, s"quartile $quartile not in 1..4")
    val from = java.time.LocalDate.of(year, (quartile - 1) * 3 + 1, 1)
    val to = from.plusMonths(3).minusDays(1)
    (from.toString, to.toString)
  }

  /** Scan a flat-object JSON array body and return each object's
    * source text ("products": [ {...}, {...} ] — objects carry no
    * nested braces, like the CDS control bodies).
    */
  private[sources] def flatObjects(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = body.indexOf('[')
    if (i < 0) return out.toSeq
    var start = -1
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '{' && start < 0) start = i
      else if (c == '}' && start >= 0) {
        out += body.substring(start, i + 1)
        start = -1
      } else if (c == ']' && start < 0) return out.toSeq
      i += 1
    }
    out.toSeq
  }

  private[sources] def parseProducts(body: String): Seq[Product] =
    flatObjects(body).map { o =>
      val id = CdsJobs.jsonField(o, "id")
      val tile = CdsJobs.jsonField(o, "tile")
      val date = CdsJobs.jsonField(o, "date")
      val url = CdsJobs.jsonField(o, "url")
      val ccm = java.util.regex.Pattern
        .compile("\"cloud_cover\"\\s*:\\s*([0-9.]+)").matcher(o)
      require(id != null && tile != null && date != null && url != null &&
        ccm.find(), s"catalog product missing fields: $o")
      Product(id, tile, date, ccm.group(1).toDouble, url)
    }

  /** Paged catalog search: GET
    * `catalogUrl?from=..&to=..&bbox=..&page=K` (page from 1) until a
    * page returns no products. 5xx/IO retried per policy inside each
    * page; auth rides in `headers`.
    */
  def searchProducts(catalogUrl: String, bbox: String,
      from: String, to: String,
      policy: HttpFetch.RetryPolicy = HttpFetch.ReferencePolicy,
      headers: Map[String, String] = Map.empty,
      maxPages: Int = 1000,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 60000): Seq[Product] = {
    val all = scala.collection.mutable.ArrayBuffer.empty[Product]
    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      val sep = if (catalogUrl.contains("?")) "&" else "?"
      val url = s"$catalogUrl${sep}from=$from&to=$to&bbox=" +
        java.net.URLEncoder.encode(bbox, "UTF-8") + s"&page=$page"
      val body = CdsJobs.control(url, "GET", None, policy, headers,
        connectTimeoutMs, readTimeoutMs)
      val ps = parseProducts(body)
      if (ps.isEmpty) done = true
      else { all ++= ps; page += 1 }
    }
    require(done, s"catalog paging did not terminate in $maxPages pages")
    all.toSeq
  }

  /** Cloud-cover range filter + per-tile mosaic selection: lowest
    * cloud cover, ties to the latest date, then the smallest id —
    * deterministic regardless of catalog order.
    */
  def selectMosaic(products: Seq[Product],
      cloudCoverage: (Double, Double) = (0.0, 100.0)): Seq[Product] = {
    val (lo, hi) = cloudCoverage
    products
      .filter(p => p.cloudCover >= lo && p.cloudCover <= hi)
      .groupBy(_.tile)
      .map { case (_, ps) =>
        ps.minBy(p => (p.cloudCover, reverseOrd(p.date), p.id))
      }
      .toSeq.sortBy(_.tile)
  }

  /** Lexically order-reversing wrapper for ISO dates (latest first
    * inside minBy).
    */
  private def reverseOrd(iso: String): String =
    iso.map(c => (255 - c.toInt).toChar)

  /** The composed reference contract: search the window, filter +
    * select the mosaic set, download every product through the
    * resumable manifest. Returns (selected products, fetch results).
    */
  def findProducts(spark: SparkSession, catalogUrl: String, bbox: String,
      year: Int, quartile: Int, destDir: String, manifestPath: String,
      cloudCoverage: (Double, Double) = (0.0, 100.0),
      policy: HttpFetch.RetryPolicy = HttpFetch.ReferencePolicy,
      headers: Map[String, String] = Map.empty)
      : (Seq[Product], Seq[HttpFetch.FetchResult]) = {
    val (from, to) = quartileRange(year, quartile)
    val found = searchProducts(catalogUrl, bbox, from, to, policy, headers)
    // defense in depth: the server already windows, but a product
    // outside [from, to] must never reach the mosaic. Compare the
    // 10-char DATE prefix: a catalog returning timestamped ISO dates
    // ("2023-06-30T10:00:00Z") would otherwise lexically exceed the
    // plain yyyy-MM-dd upper bound and silently drop the window's
    // entire last day.
    val windowed = found.filter(p =>
      p.date.take(10) >= from && p.date.take(10) <= to)
    val selected = selectMosaic(windowed, cloudCoverage)
    val items = selected.map(p => (p.url, s"$destDir/${p.id}.zip"))
    val fetched = HttpFetch.fetchAll(spark, items, manifestPath,
      policy, headers)
    (selected, fetched)
  }
}
