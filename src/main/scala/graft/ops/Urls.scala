package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL operators — first-class stages in every public crawl pipeline
  * (CCNet/Gopher/RefinedWeb class): normalization, registered-domain
  * extraction, per-domain quota sampling, and URL-level exact dedup
  * with revisit-aware precedence. All pure map-side except the
  * grouping stages, which shuffle on the URL/domain key.
  *
  * Normalization rules (deterministic, engine-reproducible):
  *   - scheme and host lowercase;
  *   - default port stripped (`:80` for http, `:443` for https),
  *     any other port kept;
  *   - fragment stripped;
  *   - query parameters sorted by (key, value) and rejoined with `&`
  *     (an empty query keeps no `?`);
  *   - empty path becomes `/`; path case/content otherwise untouched
  *     (paths are case-significant, unlike hosts).
  *
  * Registered domain: the last two host labels, or the last THREE when
  * the last two form a known second-level public suffix (an embedded
  * mini suffix list — co.uk/org.uk/ac.uk/gov.uk/com.au/net.au/org.au/
  * co.jp/ne.jp/com.br/co.in/co.nz — documented as a subset of the
  * public suffix list; a production deployment swaps in the full PSL
  * snapshot, the operator shape is identical). IP-literal and
  * single-label hosts return the host unchanged.
  */
object Urls {

  private val SecondLevelSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "com.br", "co.in", "co.nz")

  /** Lenient structural parse; never throws (crawl URIs are untrusted).
    * Unparseable inputs normalize to themselves (documented no-op).
    */
  private def splitUrl(url: String): Option[(String, String, String, String, String)] = {
    val si = url.indexOf("://")
    if (si <= 0) return None
    val scheme = url.substring(0, si)
    if (!scheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return None
    val rest = url.substring(si + 3)
    val hostEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val authority = if (hostEnd < 0) rest else rest.substring(0, hostEnd)
    val tail = if (hostEnd < 0) "" else rest.substring(hostEnd)
    if (authority.isEmpty) return None
    val fragStart = tail.indexOf('#')
    val noFrag = if (fragStart < 0) tail else tail.substring(0, fragStart)
    val qStart = noFrag.indexOf('?')
    val path = if (qStart < 0) noFrag else noFrag.substring(0, qStart)
    val query = if (qStart < 0) "" else noFrag.substring(qStart + 1)
    Some((scheme, authority, path, query,
      if (fragStart < 0) "" else tail.substring(fragStart + 1)))
  }

  /** Normalize one URL by the object-doc rules; lenient. */
  def normalizeUrl(url: String): String = {
    if (url == null) return null
    splitUrl(url) match {
      case None => url
      case Some((scheme0, authority0, path, query, _)) =>
        val scheme = scheme0.toLowerCase(java.util.Locale.ROOT)
        val authority = authority0.toLowerCase(java.util.Locale.ROOT)
        val (host, port) = authority.lastIndexOf(':') match {
          case -1 => (authority, "")
          case i if authority.substring(i + 1).nonEmpty &&
              authority.substring(i + 1).forall(_.isDigit) =>
            (authority.substring(0, i), authority.substring(i + 1))
          case _ => (authority, "")
        }
        val keptPort =
          if (port.isEmpty) ""
          else if (scheme == "http" && port == "80") ""
          else if (scheme == "https" && port == "443") ""
          else s":$port"
        val normPath = if (path.isEmpty) "/" else path
        val normQuery =
          if (query.isEmpty) ""
          else "?" + query.split("&", -1).filter(_.nonEmpty).sorted.mkString("&")
        s"$scheme://$host$keptPort$normPath$normQuery"
    }
  }

  /** Registered domain of a (lowercased) host; see the object doc. */
  def registeredDomain(host: String): String = {
    if (host == null) return null
    val h = host.toLowerCase(java.util.Locale.ROOT)
    if (h.forall(c => c.isDigit || c == '.')) return h // IPv4 literal
    val labels = h.split("\\.", -1)
    if (labels.length <= 2) return h
    val lastTwo = labels.takeRight(2).mkString(".")
    if (SecondLevelSuffixes(lastTwo)) labels.takeRight(3).mkString(".")
    else lastTwo
  }

  /** Host of a normalized URL ("" when structurally unparseable). */
  def hostOf(url: String): String =
    splitUrl(if (url == null) "" else url) match {
      case None => ""
      case Some((_, authority, _, _, _)) =>
        val a = authority.toLowerCase(java.util.Locale.ROOT)
        a.lastIndexOf(':') match {
          case -1 => a
          case i if a.substring(i + 1).nonEmpty && a.substring(i + 1).forall(_.isDigit) =>
            a.substring(0, i)
          case _ => a
        }
    }

  /** Per-row URL profile over any frame carrying a URI column:
    * (…, url_norm, host, registered_domain). One projection.
    */
  def urlProfile(df: DataFrame, uriCol: String): DataFrame = {
    val norm = udf { (u: String) => normalizeUrl(u) }
    val host = udf { (u: String) => hostOf(u) }
    val dom = udf { (h: String) => registeredDomain(h) }
    df.withColumn("url_norm", norm(col(uriCol)))
      .withColumn("host", host(col(uriCol)))
      .withColumn("registered_domain", dom(col("host")))
  }

  /** Per-registered-domain quota (the CCNet-class domain budget):
    * [[Curation.quotaSample]] with the domain as the stratum — the
    * first `k` docs of every domain in md5(text) order. Map-side
    * WindowGroupLimit pre-truncation makes a mega-domain ship
    * O(k × maps), not its crawl share.
    */
  def domainQuotaSample(
      profiled: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame =
    Curation.quotaSample(profiled, Seq("registered_domain"), idCol, textCol, k)

  /** URL-level exact dedup with revisit-aware precedence over
    * [[WarcStream.warcRevisitDocsUri]] rows: group captures by
    * NORMALIZED URL; the canonical capture of a URL is its lowest-id
    * NON-revisit capture (revisits carry no payload — they already
    * resolve to their original via q178's equi-join, so they can never
    * be the kept copy; a URL seen only via dangling revisits has a
    * null canonical). Returns (doc_id, url_norm, is_revisit,
    * url_canonical_id, keep). One shuffle on url_norm.
    */
  def urlDedupRevisitAware(revisitRows: DataFrame): DataFrame = {
    val norm = udf { (u: String) => normalizeUrl(u) }
    val rows = revisitRows.withColumn("url_norm", norm(col("target_uri")))
    val canon = rows.filter(col("is_revisit") === 0L)
      .groupBy("url_norm")
      .agg(min(col("doc_id")).as("url_canonical_id"))
    rows.join(canon, Seq("url_norm"), "left")
      .select(
        col("doc_id"), col("url_norm"), col("is_revisit"),
        col("url_canonical_id"),
        (col("is_revisit") === 0L &&
          col("doc_id") === col("url_canonical_id")).as("keep"))
  }
}
