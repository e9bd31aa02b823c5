package graft.alerts

import java.util.concurrent.{ConcurrentLinkedQueue, ScheduledExecutorService, TimeUnit}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** One configured room (reference
  * `/root/reference/src/io/matrix/RoomSetup.java`): `url` is the room id
  * on the homeserver, `entering` is announced after a successful join
  * (`{user}` macro).
  */
final case class RoomSetup(id: String, url: String, entering: String = "",
    leaving: String = "", greet: String = "")

/** Matrix settings (reference `MatrixClient.readFromXML`): `user` in
  * `@name:homeserver` form; empty `server` derives `http://<homeserver>`.
  */
final case class MatrixCfg(
    user: String,
    pass: String,
    server: String = "",
    rooms: Seq[RoomSetup] = Seq.empty,
    macros: Map[String, String] = Map.empty) {
  require(user.startsWith("@") && user.contains(":"),
    s"matrix user must be @username:server, got $user")
  def userName: String = user.substring(1, user.indexOf(':'))
  def baseUrl: String = {
    val s = if (server.nonEmpty) server else "http://" + user.drop(user.indexOf(':') + 1)
    if (s.endsWith("/")) s.dropRight(1) else s
  }
}

/** The K8 Matrix alert channel re-expressed
  * (`/root/reference/src/io/matrix/MatrixClient.java:35-894`): password
  * login with step-backoff retry, a long-poll `/sync` loop, read
  * receipts, room joins with entering announcements, text messages as
  * `m.text` with an html `formatted_body`, failed sends queued and
  * flushed after the next successful sync, and the reference's chat-side
  * command plane — `das`/username-addressed messages run engine commands
  * (reply posted back to the room), `x=5` stores a numeric ref,
  * `solve expr` / `expr=?` evaluates arithmetic over stored refs,
  * `hello?` gets `Yes?`.
  *
  * Synchronous HTTP on scheduler threads (the reference uses an async
  * client on a 2-thread pool — same effective concurrency).
  */
class MatrixClient(
    cfg: MatrixCfg,
    execute: (String, String => Unit) => Unit = (_, _) => (),
    retryStepMillis: Long = 15000,
    retryMaxMillis: Long = 90000,
    syncTimeoutMillis: Int = 10000) {

  // own 2-thread pool like the reference (the blocking long-poll sync
  // must not monopolize the shared collector scheduler)
  private val scheduler: ScheduledExecutorService =
    java.util.concurrent.Executors.newScheduledThreadPool(2, r => {
      val t = new Thread(r, "graft-matrix")
      t.setDaemon(true)
      t
    })

  private val mapper = new ObjectMapper()
  private val rooms = mutable.LinkedHashMap.empty[String, RoomSetup]
  cfg.rooms.foreach(r => rooms(r.id) = r)
  /** file-id -> mxc url of received file/image links. */
  val fileLinks = mutable.LinkedHashMap.empty[String, String]
  private val numericRefs = mutable.HashMap.empty[String, Double]
  private val failedMessages = new ConcurrentLinkedQueue[(String, String)]()
  @volatile private var accessToken = ""
  @volatile private var deviceId = ""
  @volatile private var since = ""
  @volatile private var retry = retryStepMillis
  @volatile private var stopped = false
  /** Sent m.room.message bodies, newest last (console listing / tests). */
  val sent = new ConcurrentLinkedQueue[(String, String)]()
  /** Completed sync count (0 until the state-priming first sync ends). */
  @volatile var syncCount: Long = 0

  def roomListing: Seq[String] = synchronized(rooms.values.map(r => s"${r.id} -> ${r.url}").toSeq)
  def loggedIn: Boolean = accessToken.nonEmpty
  def pendingFailed: Int = failedMessages.size

  private def tokenQ: String =
    if (accessToken.isEmpty) "" else s"?access_token=$accessToken"

  // ---- login / sync loop ----

  /** Password login (reference `login()`); on success starts the sync
    * loop and joins the configured rooms; on failure reschedules with
    * the 15 s -> 90 s step backoff.
    */
  def login(): Unit = {
    if (stopped) return
    try {
      val body = mapper.createObjectNode()
      body.put("type", "m.login.password")
      body.set[ObjectNode]("identifier",
        mapper.createObjectNode().put("type", "m.id.user").put("user", cfg.userName))
      body.put("password", cfg.pass)
      val res = HttpLite.post(s"${cfg.baseUrl}/_matrix/client/v3/login", body.toString)
      if (res.status == 200) {
        val j = mapper.readTree(res.body)
        accessToken = j.path("access_token").asText()
        deviceId = j.path("device_id").asText()
        retry = retryStepMillis
        scheduler.execute(() => syncOnce(first = true))
        rooms.values.foreach(joinRoom)
      } else rescheduleLogin()
    } catch { case _: Exception => rescheduleLogin() }
  }

  private def rescheduleLogin(): Unit = {
    if (!stopped) scheduler.schedule(runnable(() => login()), retry, TimeUnit.MILLISECONDS)
    if (retry < retryMaxMillis) retry += retryStepMillis
  }

  def stop(): Unit = { stopped = true; scheduler.shutdownNow(); () }

  /** One long-poll sync (reference `sync(boolean)`): on success flush
    * queued failed messages, advance `since`, process room events
    * (except on the first, state-priming call), immediately re-sync; on
    * failure retry after the backoff.
    */
  def syncOnce(first: Boolean): Unit = {
    if (stopped) return
    try {
      val url = s"${cfg.baseUrl}/_matrix/client/v3/sync$tokenQ" +
        s"&timeout=$syncTimeoutMillis&set_presence=online" +
        (if (since.isEmpty) "" else s"&since=$since")
      val res = HttpLite.get(url, timeoutMillis = syncTimeoutMillis + 5000)
      if (res.status == 200) {
        if (stopped) return // in-flight sync raced stop(): don't touch state
        retry = retryStepMillis
        var delay = 0L
        while (!stopped && !failedMessages.isEmpty) {
          val (room, msg) = failedMessages.poll()
          // a rejected schedule (scheduler shut down between the stopped
          // check and here) must not lose the polled message
          try scheduler.schedule(runnable(() => sendMessage(room, msg)), delay,
            TimeUnit.SECONDS)
          catch {
            case _: java.util.concurrent.RejectedExecutionException =>
              failedMessages.add((room, msg)); return
          }
          delay += 1
        }
        val body = mapper.readTree(res.body)
        since = body.path("next_batch").asText(since)
        if (!first) processRoomEvents(body)
        syncCount += 1
        scheduler.execute(() => syncOnce(first = false))
      } else
        scheduler.schedule(runnable(() => syncOnce(false)), retry, TimeUnit.MILLISECONDS)
    } catch {
      case _: Exception =>
        if (!stopped)
          scheduler.schedule(runnable(() => syncOnce(false)), retry, TimeUnit.MILLISECONDS)
        if (retry < retryMaxMillis) retry += retryStepMillis
    }
  }

  private def runnable(f: () => Unit): Runnable = () => f()

  def joinRoom(room: RoomSetup): Unit = {
    try {
      val res = HttpLite.post(
        s"${cfg.baseUrl}/_matrix/client/v3/rooms/${room.url}/join$tokenQ",
        mapper.createObjectNode().put("reason", "Feel like it").toString)
      if (res.status == 200 && room.entering.nonEmpty)
        sendMessage(room.url, room.entering.replace("{user}", cfg.userName))
    } catch { case _: Exception => () }
  }

  // ---- events ----

  /** Reference `processRoomEvents`: walk rooms.join.<room>.timeline
    * .events, receipt everything, skip own echo, dispatch messages.
    */
  private[alerts] def processRoomEvents(js: JsonNode): Unit = {
    val join = js.path("rooms").path("join")
    if (!join.isObject) return
    join.fields().asScala.foreach { entry =>
      val originRoom = entry.getKey
      val events = entry.getValue.path("timeline").path("events")
      if (events.isArray) events.asScala.foreach { event =>
        val eventId = event.path("event_id").asText("")
        val from = event.path("sender").asText("")
        if (eventId.nonEmpty) confirmRead(originRoom, eventId)
        if (!from.equalsIgnoreCase(cfg.user)) {
          event.path("type").asText("") match {
            case "m.room.message" =>
              val content = event.path("content")
              val body = content.path("body").asText("")
              content.path("msgtype").asText("") match {
                case "m.image" | "m.file" =>
                  fileLinks(body) = content.path("url").asText("")
                case "m.text" => onText(originRoom, body)
                case _ => ()
              }
            case _ => ()
          }
        }
      }
    }
  }

  /** The chat command plane for addressed messages. */
  private def onText(originRoom: String, rawBody: String): Unit = {
    val name = cfg.userName
    if (rawBody.startsWith("das") || rawBody.startsWith(name)) {
      // quote the username (regex metachars would throw) and strip only the
      // leading address prefix — user "st" must not mangle "status"
      val quoted = java.util.regex.Pattern.quote(name)
      val body = rawBody.replaceFirst(s"^($quoted|das):?\\s*", "").trim
      if (body.matches(".+=[0-9]*$")) {
        // store a numeric ref: "x=5" ("x=" with no number is invalid)
        val sp = body.split("=")
        sp.lift(1).map(_.trim).flatMap(parseDouble) match {
          case Some(d) =>
            synchronized { numericRefs(sp(0).trim) = d }
            sendMessage(originRoom, s"Stored ${sp(1)} as ${sp(0)}")
          case None =>
            sendMessage(originRoom, s"Invalid number given, can't parse '$body'")
        }
      } else if (body.startsWith("solve ") || body.matches(".+=[a-zA-Z?]+?")) {
        val split = body.split("=")
        val op = split(0).replace("solve ", "").trim
        MatrixMath.solve(op, synchronized(numericRefs.toMap)) match {
          case None => sendMessage(originRoom, s"Failed to process: $op")
          case Some(d) =>
            val res = if (d == math.rint(d)) d.toLong.toString else d.toString
            if (split.length == 1 || split(1).equalsIgnoreCase("?"))
              sendMessage(originRoom,
                if (res.length == 1) s"No offense but... *raises $res fingers*"
                else s"$op = $res")
            else {
              synchronized { numericRefs(split(1)) = d }
              sendMessage(originRoom, s"Stored $res as ${split(1)}")
            }
        }
      } else
        // engine command; the reply writes back into the room
        execute(body, line => sendMessage(originRoom, line))
    } else if (rawBody.equalsIgnoreCase("hello?")) sendMessage(originRoom, "Yes?")
  }

  private def parseDouble(s: String): Option[Double] =
    try Some(s.toDouble) catch { case _: NumberFormatException => None }

  def confirmRead(room: String, eventId: String): Unit =
    try HttpLite.post(
      s"${cfg.baseUrl}/_matrix/client/v3/rooms/$room/receipt/m.read/$eventId$tokenQ", "{}")
    catch { case _: Exception => () }

  // ---- sending ----

  /** PUT an `m.room.message` (reference `sendMessage`): html body with a
    * plain-text fallback, the "unknown command" joke rewrite, failures
    * queued for the post-sync flush.
    */
  def sendMessage(room: String, message0: String): Unit = {
    val message =
      if (message0.toLowerCase.startsWith("unknown command"))
        "Either you made a typo or i lost that cmd... ;)"
      else message0
    val nohtml = message.replace("<br>", "\r\n").replaceAll("<.?b>|<.?u>", "")
    val j = mapper.createObjectNode()
    j.put("body", nohtml)
    j.put("msgtype", "m.text")
    j.put("formatted_body", message)
    j.put("format", "org.matrix.custom.html")
    val txn = java.util.UUID.randomUUID().toString
    try {
      val res = HttpLite.put(
        s"${cfg.baseUrl}/_matrix/client/v3/rooms/$room/send/m.room.message/$txn$tokenQ",
        j.toString)
      // like the reference: only network failures queue for the
      // post-sync flush — a non-200 (bad room, auth) would retry forever
      if (res.status == 200) { sent.add((room, nohtml)); () }
    } catch { case _: Exception => failedMessages.add((room, message)); () }
  }

  /** Send to every configured room (reference `broadcast`). */
  def broadcast(message: String): Unit =
    synchronized(rooms.values.toSeq).foreach(r => sendMessage(r.url, message))

  // ---- media (reference MatrixClient.java:434-530) ----

  /** Where downloaded files land (reference `dlFolder`, default
    * `downloads/` under the working dir).
    */
  @volatile var downloadDir: java.nio.file.Path = java.nio.file.Paths.get("downloads")

  /** Upload a file to the homeserver's media repo and share the returned
    * `mxc://` link into the room (reference `sendFile`:436-466 — POST
    * `/_matrix/media/v3/upload`, then `shareFile` posts an `m.file`
    * message holding the link). `roomId` may be a configured room id or a
    * raw `!room:server` address; empty uploads without sharing.
    */
  def sendFile(roomId: String, path: java.nio.file.Path): String = {
    if (!java.nio.file.Files.exists(path)) return s"! No such file: $path"
    val name = path.getFileName.toString
    try {
      val bytes = java.nio.file.Files.readAllBytes(path)
      val url = s"${cfg.baseUrl}/_matrix/media/v3/upload" +
        s"$tokenQ${if (accessToken.isEmpty) "?" else "&"}filename=" +
        java.net.URLEncoder.encode(name, "UTF-8")
      val res = HttpLite.postBytes(url, bytes)
      if (res.status != 200) return s"! File upload failed: ${res.body}"
      val mxc = mapper.readTree(res.body).path("content_uri").asText("")
      if (mxc.isEmpty) return "! File upload failed: no content_uri"
      fileLinks(name) = mxc
      if (roomId.nonEmpty) {
        val target = room(roomId).map(_.url).getOrElse(roomId)
        shareFile(target, mxc, name)
      }
      "File upload succeeded"
    } catch { case e: Exception => s"! File upload failed: ${e.getMessage}" }
  }

  /** Post an `m.file` message holding an uploaded `mxc://` link
    * (reference `shareFile`:504-530).
    */
  def shareFile(roomUrl: String, mxc: String, filename: String): Unit = {
    val j = mapper.createObjectNode()
    j.put("body", filename)
    j.put("url", mxc)
    j.put("mimetype", "text/plain")
    j.put("msgtype", "m.file")
    val txn = java.util.UUID.randomUUID().toString
    try {
      val res = HttpLite.put(
        s"${cfg.baseUrl}/_matrix/client/v3/rooms/$roomUrl/send/m.room.message/$txn$tokenQ",
        j.toString)
      if (res.status == 200) { sent.add((roomUrl, s"file:$filename")); () }
    } catch { case _: Exception => () }
  }

  /** Download a previously shared file by its listing id into
    * [[downloadDir]] (reference `downloadFile`:468-503 — GET
    * `/_matrix/media/v3/download/<server>/<mediaId>`). The stored name is
    * sanitized to its basename so a malicious `body` can't escape the
    * download directory (same guard as the email attachment path).
    */
  def downloadFile(id: String): String = {
    val mxc = synchronized(fileLinks.get(id)).getOrElse(return s"! No such file id: $id")
    if (!mxc.startsWith("mxc://")) return s"! Not an mxc link: $mxc"
    try {
      val res = HttpLite.getBytes(
        s"${cfg.baseUrl}/_matrix/media/v3/download/${mxc.stripPrefix("mxc://")}$tokenQ")
      if (res.status != 200) return s"! File download failed with code: ${res.status}"
      val safe = java.nio.file.Paths.get(id).getFileName.toString
      java.nio.file.Files.createDirectories(downloadDir)
      val dest = downloadDir.resolve(safe)
      java.nio.file.Files.write(dest, res.bytes)
      s"File received: $dest"
    } catch { case e: Exception => s"! File download failed: ${e.getMessage}" }
  }

  /** The Writable hook: `room|from|data` lines from the command plane. */
  def writeLine(data: String): Boolean = {
    val d = data.split("\\|")
    if (d.length >= 3) { sendMessage(d(0), d(2)); true } else false
  }

  def addRoom(r: RoomSetup): Unit = synchronized { rooms(r.id) = r }
  def room(id: String): Option[RoomSetup] = synchronized(rooms.get(id))
}

/** Scalar arithmetic for the chat `solve` feature: + - * / % ^ with
  * parentheses and named refs (the reference routes this through
  * MathForward's op solver over `{d:matrix_x}` rtvals; the grammar here
  * is the same infix subset).
  */
object MatrixMath {

  def solve(expr: String, refs: Map[String, Double]): Option[Double] = {
    val p = new Parser(expr, refs)
    try {
      val v = p.parseExpr()
      p.skipWs()
      if (p.pos != p.s.length || v.isNaN) None else Some(v)
    } catch { case _: Exception => None }
  }

  private final class Parser(val s: String, refs: Map[String, Double]) {
    var pos = 0
    def skipWs(): Unit = while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000' // EOF sentinel

    def parseExpr(): Double = {
      var v = parseTerm()
      skipWs()
      while (peek == '+' || peek == '-') {
        val op = peek; pos += 1
        val r = parseTerm()
        v = if (op == '+') v + r else v - r
        skipWs()
      }
      v
    }
    def parseTerm(): Double = {
      var v = parsePow()
      skipWs()
      while (peek == '*' || peek == '/' || peek == '%') {
        val op = peek; pos += 1
        val r = parsePow()
        v = op match { case '*' => v * r; case '/' => v / r; case _ => v % r }
        skipWs()
      }
      v
    }
    def parsePow(): Double = {
      val base = parseFactor()
      skipWs()
      if (peek == '^') { pos += 1; math.pow(base, parsePow()) } else base
    }
    def parseFactor(): Double = {
      skipWs()
      peek match {
        case '(' =>
          pos += 1
          val v = parseExpr()
          skipWs()
          require(peek == ')', "missing )")
          pos += 1
          v
        case '-' => pos += 1; -parseFactor()
        case c if c.isDigit || c == '.' =>
          val start = pos
          while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
          s.substring(start, pos).toDouble
        case c if c.isLetter || c == '_' =>
          val start = pos
          while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_'))
            pos += 1
          refs.getOrElse(s.substring(start, pos), Double.NaN)
        case other => throw new IllegalArgumentException(s"unexpected '$other'")
      }
    }
  }
}
