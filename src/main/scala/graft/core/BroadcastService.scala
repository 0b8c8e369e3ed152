package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.model.{Child, Gid, Layout, Node, Styles}

import scala.collection.immutable.SortedSet

/** Wire codec for export blobs — a compact binary frame (counts +
  * UTF strings), the transport twin of the parquet slot row shapes.
  * Round-trip-exact for every node kind (BroadcastServiceSpec).
  */
object BlobCodec {

  def encode(blob: ExportBlob): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(blob.nodes.length)
    blob.nodes.foreach { case (id, node) =>
      out.writeUTF(id.toString)
      node match {
        case Node.Text(line) =>
          out.writeByte(0); out.writeUTF(line)
        case Node.List(layout, elems) =>
          out.writeByte(if (layout == Layout.Chain) 1 else 2)
          out.writeInt(elems.length)
          elems.foreach(c => out.writeUTF(childId(c).toString))
        case Node.Styled(styles, child) =>
          val (tag, st) = styles match {
            case Styles.Block(s) => (3, s)
            case Styles.Span(s)  => (4, s)
          }
          out.writeByte(tag)
          out.writeInt(st.size)
          st.foreach(out.writeUTF)
          out.writeUTF(childId(child).toString)
      }
    }
    out.writeInt(blob.parents.size)
    blob.parents.foreach { case (id, ps) =>
      out.writeUTF(id.toString)
      out.writeInt(ps.size)
      ps.foreach { p => out.writeUTF(p.id.toString); out.writeInt(p.index) }
    }
    out.flush()
    bytes.toByteArray
  }

  def decode(bytes: Array[Byte]): ExportBlob = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nNodes = in.readInt()
    val nodes = Vector.fill(nNodes) {
      val id = Gid.parse(in.readUTF())
      val node = in.readByte() match {
        case 0   => Node.Text(in.readUTF())
        case tag => decodeTail(tag, in)
      }
      id -> node
    }
    val nParents = in.readInt()
    val parents = Map.newBuilder[Gid, Set[Parent]]
    (0 until nParents).foreach { _ =>
      val id = Gid.parse(in.readUTF())
      val n = in.readInt()
      parents += id -> Set.fill(n)(Parent(Gid.parse(in.readUTF()), in.readInt()))
    }
    ExportBlob(nodes, parents.result())
  }

  private def decodeTail(tag: Int, in: DataInputStream): Node = tag match {
    case 1 | 2 =>
      val n = in.readInt()
      Node.List(if (tag == 1) Layout.Chain else Layout.Page,
        Vector.fill(n)(Child.Lazy(Gid.parse(in.readUTF())): Child))
    case 3 | 4 =>
      val n = in.readInt()
      val st = SortedSet.empty[String] ++ Seq.fill(n)(in.readUTF())
      val styles = if (tag == 3) Styles.Block(st) else Styles.Span(st)
      Node.Styled(styles, Child.Lazy(Gid.parse(in.readUTF())))
  }

  private def childId(c: Child): Gid = c match {
    case Child.Lazy(id) => id
    case Child.Eager(_) =>
      throw new IllegalStateException("export blobs carry lazy children only")
  }
}

/** The broadcast worker's REST surface (assemblage_broadcast/src/
  * lib.rs:42-228), served over the in-process hub with the JDK
  * HttpServer — same routes, same bearer-token auth, same status
  * codes:
  *
  *   POST   /broadcast?episode=<ts>   blob → 201 {broadcast_id, token, expiration}
  *   GET    /broadcast/<bid>          → 200 [episode timestamps] | 404 (unknown/expired;
  *                                      a DELETEd broadcast is 200 [])
  *   GET    /broadcast/<bid>/<ts>     → 200 blob bytes | 404 (blobs are immutable,
  *                                      TTL-reaped, and survive DELETE — keep-alive
  *                                      12 h past the manifest, lib.rs:191-199)
  *   PUT    /broadcast/<bid>/<ts>     Bearer token, blob → 201 new | 200 overwrite,
  *                                      {expiration} | 401 | 404 (expiration fixed
  *                                      at creation — never extended)
  *   DELETE /broadcast/<bid>          Bearer token → 200 (clears the episode
  *                                      list only) | 401 | 404
  *
  * Bound to loopback with an ephemeral port: the sandboxed twin of the
  * reference's edge worker (which fronts a KV namespace the same way
  * this fronts the hub).
  */
final class BroadcastService(hub: BroadcastHub) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  def port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"

  private def respond(ex: HttpExchange, status: Int, body: Array[Byte] = Array.empty): Unit = {
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def bearer(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getQuery).flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith(s"$key=") => kv.stripPrefix(s"$key=")
    })

  server.createContext("/broadcast", (ex: HttpExchange) => {
    try {
      val parts = ex.getRequestURI.getPath.stripPrefix("/").split("/").toList
      (ex.getRequestMethod, parts) match {
        case ("POST", "broadcast" :: Nil) =>
          queryParam(ex, "episode") match {
            case None =>
              // episode-less creation: body ignored, empty episode list
              // (reference lib.rs:110-121)
              val (bid, token, expiration) = hub.postEmpty()
              respond(ex, 201,
                s"""{"broadcast_id":"$bid","token":"$token","expiration":$expiration}"""
                  .getBytes(UTF_8))
            case Some(raw) => raw.toLongOption match {
              case None => respond(ex, 400) // present but malformed
              case Some(ts) =>
                val blob = BlobCodec.decode(ex.getRequestBody.readAllBytes())
                val (bid, token, expiration) = hub.post(blob, ts)
                respond(ex, 201,
                  s"""{"broadcast_id":"$bid","token":"$token","expiration":$expiration}"""
                    .getBytes(UTF_8))
            }
          }
        case ("GET", "broadcast" :: bid :: Nil) =>
          hub.episodeList(Gid.parse(bid)) match {
            case Some(eps) => respond(ex, 200, eps.mkString("[", ",", "]").getBytes(UTF_8))
            case None      => respond(ex, 404)
          }
        case ("GET", "broadcast" :: bid :: ts :: Nil) =>
          ts.toLongOption.flatMap(t =>
            scala.util.Try(hub.episode(Gid.parse(bid), t)).toOption) match {
            case Some(blob) => respond(ex, 200, BlobCodec.encode(blob))
            case None       => respond(ex, 404)
          }
        case ("PUT", "broadcast" :: bid :: ts :: Nil) =>
          (bearer(ex), ts.toLongOption) match {
            case (Some(token), Some(t)) =>
              val blob = BlobCodec.decode(ex.getRequestBody.readAllBytes())
              try {
                val (expiration, isNew) = hub.putEpisode(Gid.parse(bid), token, t, blob)
                respond(ex, if (isNew) 201 else 200,
                  s"""{"expiration":$expiration}""".getBytes(UTF_8))
              } catch {
                case _: IllegalArgumentException => respond(ex, 401)
                case _: NoSuchElementException   => respond(ex, 404)
              }
            case _ => respond(ex, 401)
          }
        case ("DELETE", "broadcast" :: bid :: Nil) =>
          bearer(ex) match {
            case Some(token) =>
              try { hub.delete(Gid.parse(bid), token); respond(ex, 200) }
              catch {
                case _: IllegalArgumentException => respond(ex, 401)
                case _: NoSuchElementException   => respond(ex, 404)
              }
            case None => respond(ex, 401)
          }
        case _ => respond(ex, 400)
      }
    } catch { case _: Exception => respond(ex, 400) }
  })

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

/** HTTP client with the hub's interface, so BroadcastClient's
  * publish/fetch loop runs unchanged against a remote worker — the
  * reference's broadcast.rs push/pull over HTTP.
  */
final class HttpBroadcastEndpoint(baseUrl: String) extends BroadcastEndpoint {
  private val http = HttpClient.newHttpClient()

  private def uri(path: String) = java.net.URI.create(s"$baseUrl$path")

  /** Minimal JSON field extraction for the worker's three response
    * shapes: anchored regex per field, tolerant of whitespace, field
    * order, extra fields, and escaped quotes in string values — any
    * CONFORMING worker parses, and a missing/malformed field raises a
    * clear error instead of a split-index ArrayIndexOutOfBounds.
    */
  private object MiniJson {
    def string(body: String, key: String): String = {
      val re = ("\"" + java.util.regex.Pattern.quote(key) +
        "\"\\s*:\\s*(?:\"((?:[^\"\\\\]|\\\\.)*)\"|(-?[0-9]+))").r
      re.findFirstMatchIn(body) match {
        case Some(m) =>
          val s = m.group(1)
          if (s != null) s.replace("\\\"", "\"").replace("\\\\", "\\") else m.group(2)
        case None =>
          throw new IllegalArgumentException(
            s"missing or malformed JSON field '$key' in worker response: $body")
      }
    }
    def long(body: String, key: String): Long = string(body, key).toLong
  }

  def post(blob: ExportBlob, episodeTs: Long): (Gid, String, Long) = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(s"/broadcast?episode=$episodeTs"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(BlobCodec.encode(blob))).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 201, s"POST failed: ${resp.statusCode()}")
    val body = resp.body()
    (Gid.parse(MiniJson.string(body, "broadcast_id")),
      MiniJson.string(body, "token"),
      MiniJson.long(body, "expiration"))
  }

  def put(bid: Gid, token: String, episodeTs: Long, blob: ExportBlob): Long = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(s"/broadcast/$bid/$episodeTs"))
        .header("Authorization", s"Bearer $token")
        .PUT(HttpRequest.BodyPublishers.ofByteArray(BlobCodec.encode(blob))).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 401) throw new IllegalArgumentException("invalid broadcast token")
    if (resp.statusCode() == 404) throw new NoSuchElementException(s"broadcast $bid")
    MiniJson.long(resp.body(), "expiration")
  }

  def episodeTimestamps(bid: Gid): Vector[Long] = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(s"/broadcast/$bid")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 404) Vector.empty
    else resp.body().stripPrefix("[").stripSuffix("]").split(",")
      .map(_.trim).filter(_.nonEmpty).map(_.toLong).toVector
  }

  def episode(bid: Gid, ts: Long): ExportBlob = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(s"/broadcast/$bid/$ts")).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 200, s"GET episode failed: ${resp.statusCode()}")
    BlobCodec.decode(resp.body())
  }

  def delete(bid: Gid, token: String): Unit = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(s"/broadcast/$bid"))
        .header("Authorization", s"Bearer $token")
        .DELETE().build(),
      HttpResponse.BodyHandlers.discarding())
    if (resp.statusCode() == 401) throw new IllegalArgumentException("invalid broadcast token")
    if (resp.statusCode() == 404) throw new NoSuchElementException(s"broadcast $bid")
  }
}
