package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.command.Json
import graft.engine.GraftDb
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

/** HTTP API in front of the engine — same surface as the reference's hyper
  * service (`http/src/service.rs:111-148`): `GET /ping` → "pong",
  * `POST /db/execute`, 404 elsewhere, 400 on bad JSON — plus the
  * `POST /db/query` route the reference designed but never wired (its
  * `DB::query` exists at `db/src/db.rs:223` with no route). Store access
  * serializes inside GraftDb's lock, the analog of the reference's global
  * `Arc<Mutex<store>>` (`http/src/service.rs:31`).
  */
final class HttpApi(db: GraftDb, port: Int = 0, threads: Int = 4,
                    cluster: Option[graft.engine.ClusterControl] = None) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(Executors.newFixedThreadPool(threads))

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val (method, path) = (ex.getRequestMethod, ex.getRequestURI.getPath)
      (method, path) match {
        case ("GET", "/ping") => respond(ex, 200, "pong")
        case ("GET", "/status") => handleStatus(ex)
        case ("POST", "/db/execute") => handleExecute(ex)
        case ("POST", "/db/query") => handleQuery(ex)
        case _ => respond(ex, 404, "")
      }
    }
  })

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  /** Cluster diagnostics — the reference's RaftControl surface
    * (`store/src/lib.rs:18-28`) mapped onto Spark's cluster manager via
    * [[graft.engine.SparkClusterControl]]. */
  private def handleStatus(ex: HttpExchange): Unit = {
    val leader = Json.escape(cluster.map(_.leaderId).getOrElse("unknown"))
    val members = cluster.map(_.members).getOrElse(Nil)
      .map(m => "\"" + Json.escape(m) + "\"").mkString("[", ",", "]")
    respond(ex, 200, s"""{"leader":"$leader","members":$members}""")
  }

  private def handleExecute(ex: HttpExchange): Unit =
    Json.parseRequest(body(ex)) match {
      case Left(err) => respond(ex, 400, err)
      case Right(req) => db.execute(req) match {
        case Right(rs) => respond(ex, 200, Json.responses(rs))
        case Left(err) => respond(ex, 400, err)
      }
    }

  /** `?level=none|weak|strong` selects the read-consistency level
    * (rqlite's query-parameter surface; default weak);
    * `?version=N` reads the batch against snapshot version N instead
    * (time travel — [[graft.engine.GraftDb.queryAsOf]]). */
  private def handleQuery(ex: HttpExchange): Unit = {
    val params = Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
    params.collectFirst { case Array("version", v) => v }.foreach { v =>
      v.toLongOption match {
        case None => respond(ex, 400, s"invalid version: $v")
        case Some(ver) => Json.parseRequest(body(ex)) match {
          case Left(err) => respond(ex, 400, err)
          case Right(req) => db.queryAsOf(req, ver) match {
            case Right(rs) => respond(ex, 200, Json.rowsSeq(rs))
            case Left(err) => respond(ex, 400, err)
          }
        }
      }
      return
    }
    val levelParam = params
      .collectFirst { case Array("level", v) => v }
    val level = levelParam match {
      case None => graft.engine.ReadLevel.Weak
      case Some(v) => graft.engine.ReadLevel.parse(v) match {
        case Some(l) => l
        case None =>
          respond(ex, 400, s"invalid consistency level: $v"); return
      }
    }
    Json.parseRequest(body(ex)) match {
      case Left(err) => respond(ex, 400, err)
      case Right(req) => db.query(req, level) match {
        case Right(rs) => respond(ex, 200, Json.rowsSeq(rs))
        case Left(err) => respond(ex, 400, err)
      }
    }
  }

  private def respond(ex: HttpExchange, code: Int, text: String): Unit = {
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  /** Bound port (use port=0 in tests — same trick as the reference's
    * ephemeral-port tests, `http/src/service.rs:104-108`). */
  def listeningPort: Int = server.getAddress.getPort
}
