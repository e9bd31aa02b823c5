package graft

import java.io.{BufferedInputStream, OutputStreamWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import org.scalatest.funsuite.AnyFunSuite

import graft.alerts._

/** Embedded mini Matrix homeserver: login, long-poll sync with an
  * injectable event queue, room join, m.room.message PUT, read receipts.
  */
class MiniMatrixServer {
  private val mapper = new ObjectMapper()
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  def url: String = s"http://127.0.0.1:$port"
  @volatile private var running = true
  private var batch = 0

  /** (room, plain body) of every message PUT to the server. */
  val messages = new ConcurrentLinkedQueue[(String, String)]()
  /** (room, eventId) read receipts. */
  val receipts = new ConcurrentLinkedQueue[(String, String)]()
  val joined = new ConcurrentLinkedQueue[String]()
  /** Events waiting for the next sync: (room, sender, msgtype, body). */
  private val pending = new ConcurrentLinkedQueue[(String, String, String, String)]()
  /** (filename, bytes) of every media upload; served back on download. */
  val uploads = new ConcurrentLinkedQueue[(String, Array[Byte])]()
  private val media = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  /** (room, filename, mxc) of every m.file share PUT to the server. */
  val shares = new ConcurrentLinkedQueue[(String, String, String)]()

  /** Pre-seed a media id the next injected m.file event can point at. */
  def seedMedia(mediaId: String, bytes: Array[Byte]): Unit =
    media.put(mediaId, bytes)

  def inject(room: String, sender: String, body: String, msgtype: String = "m.text"): Unit =
    pending.add((room, sender, msgtype, body))

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock))
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => }
    }
  })
  acceptor.setDaemon(true); acceptor.start()

  private def handle(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      sb.toString
    }
    val reqLine = readLine()
    if (reqLine.isEmpty) { sock.close(); return }
    val Array(method, pathQ, _*) = reqLine.split(" ")
    var contentLength = 0
    var line = readLine()
    while (line.nonEmpty) {
      if (line.toLowerCase.startsWith("content-length:"))
        contentLength = line.split(":")(1).trim.toInt
      line = readLine()
    }
    val bodyBytes = {
      val buf = new Array[Byte](contentLength)
      var off = 0
      while (off < contentLength) {
        val r = in.read(buf, off, contentLength - off)
        if (r < 0) throw new RuntimeException("short body")
        off += r
      }
      buf
    }
    val body = new String(bodyBytes, StandardCharsets.UTF_8)
    val path = pathQ.split("\\?")(0)
    val query = pathQ.split("\\?").lift(1).getOrElse("")
    def queryParam(name: String): Option[String] =
      query.split("&").find(_.startsWith(name + "="))
        .map(kv => java.net.URLDecoder.decode(kv.drop(name.length + 1), "UTF-8"))
    val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.ISO_8859_1)
    def respondBytes(status: Int, bytes: Array[Byte], contentType: String): Unit = {
      out.write(s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
        s"Content-Length: ${bytes.length}\r\nConnection: close\r\n\r\n")
      out.flush()
      sock.getOutputStream.write(bytes)
      sock.getOutputStream.flush()
      sock.close()
    }
    def respond(status: Int, json: String): Unit =
      respondBytes(status, json.getBytes(StandardCharsets.UTF_8), "application/json")

    (method, path) match {
      case ("POST", p) if p.endsWith("/login") =>
        respond(200, """{"access_token":"tok123","device_id":"dev1","user_id":"@graft:x"}""")
      case ("GET", p) if p.endsWith("/sync") =>
        // real homeservers hold the long-poll open; pace the loop
        if (pending.isEmpty) Thread.sleep(100)
        batch += 1
        val root = mapper.createObjectNode()
        root.put("next_batch", s"b$batch")
        if (!pending.isEmpty) {
          val byRoom = Iterator.continually(pending.poll())
            .takeWhile(_ != null).toList.groupBy(_._1)
          val joinNode = mapper.createObjectNode()
          byRoom.foreach { case (room, evs) =>
            val events = mapper.createArrayNode()
            evs.zipWithIndex.foreach { case ((_, sender, msgtype, text), i) =>
              val e = mapper.createObjectNode()
              e.put("event_id", s"ev$batch-$i")
              e.put("sender", sender)
              e.put("type", "m.room.message")
              val c = mapper.createObjectNode()
              c.put("msgtype", msgtype)
              c.put("body", text)
              if (msgtype != "m.text") c.put("url", "mxc://x/abc")
              e.set[com.fasterxml.jackson.databind.JsonNode]("content", c)
              events.add(e)
            }
            val timeline = mapper.createObjectNode()
            timeline.set[com.fasterxml.jackson.databind.JsonNode]("events", events)
            val roomNode = mapper.createObjectNode()
            roomNode.set[com.fasterxml.jackson.databind.JsonNode]("timeline", timeline)
            joinNode.set[com.fasterxml.jackson.databind.JsonNode](room, roomNode)
          }
          val roomsNode = mapper.createObjectNode()
          roomsNode.set[com.fasterxml.jackson.databind.JsonNode]("join", joinNode)
          root.set[com.fasterxml.jackson.databind.JsonNode]("rooms", roomsNode)
        }
        respond(200, root.toString)
      case ("POST", p) if p.contains("/rooms/") && p.endsWith("/join") =>
        val room = p.split("/rooms/")(1).stripSuffix("/join")
        joined.add(room)
        respond(200, s"""{"room_id":"$room"}""")
      case ("PUT", p) if p.contains("/send/m.room.message/") =>
        val room = p.split("/rooms/")(1).split("/send/")(0)
        val j = mapper.readTree(body)
        if (j.path("msgtype").asText() == "m.file")
          shares.add((room, j.path("body").asText(), j.path("url").asText()))
        else messages.add((room, j.path("body").asText()))
        respond(200, """{"event_id":"$ev"}""")
      case ("POST", p) if p.contains("/media/") && p.contains("/upload") =>
        val name = queryParam("filename").getOrElse(s"up${uploads.size}")
        uploads.add((name, bodyBytes))
        val mediaId = s"x/up${uploads.size}"
        media.put(mediaId, bodyBytes)
        respond(200, s"""{"content_uri":"mxc://$mediaId"}""")
      case ("GET", p) if p.contains("/media/") && p.contains("/download/") =>
        val mediaId = p.split("/download/")(1)
        media.get(mediaId) match {
          case null => respond(404, """{"errcode":"M_NOT_FOUND"}""")
          case bytes => respondBytes(200, bytes, "application/octet-stream")
        }
      case ("POST", p) if p.contains("/receipt/m.read/") =>
        val room = p.split("/rooms/")(1).split("/receipt/")(0)
        receipts.add((room, p.split("/receipt/m.read/")(1)))
        respond(200, "{}")
      case _ => respond(200, "{}")
    }
  }

  def close(): Unit = { running = false; server.close() }
}

/** K8 Matrix channel vs the reference semantics
  * (`/root/reference/src/io/matrix/MatrixClient.java`): login + join +
  * entering announcement, addressed chat commands with room replies,
  * numeric refs and solve, receipts, failed-send queue flush.
  */
class MatrixSpec extends AnyFunSuite {

  private def awaitCond(ms: Long = 20000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(cond, "condition not met in time")
  }

  test("login joins configured rooms and announces entering") {
    val srv = new MiniMatrixServer
    val m = new MatrixClient(
      MatrixCfg("@graft:x", "pw", srv.url,
        rooms = Seq(RoomSetup("ops", "!ops:x", entering = "Mounted and ready, {user} here"))),
      retryStepMillis = 50, syncTimeoutMillis = 500)
    try {
      m.login()
      awaitCond()(m.loggedIn)
      awaitCond()(srv.joined.asScala.toSeq == Seq("!ops:x"))
      awaitCond()(srv.messages.asScala.exists(_._2.contains("graft here")))
      m.stop()
    } finally srv.close()
  }

  test("addressed chat message runs a command and replies into the room") {
    val srv = new MiniMatrixServer
    val executed = new ConcurrentLinkedQueue[String]()
    val m = new MatrixClient(
      MatrixCfg("@graft:x", "pw", srv.url),
      execute = (cmd, sink) => { executed.add(cmd); sink(s"$cmd done") },
      retryStepMillis = 50, syncTimeoutMillis = 300)
    try {
      m.login()
      awaitCond()(m.loggedIn && m.syncCount >= 1)
      srv.inject("!ops:x", "@boss:x", "graft:st")
      awaitCond()(executed.asScala.toSeq == Seq("st"))
      awaitCond()(srv.messages.asScala.exists { case (r, b) => r == "!ops:x" && b == "st done" })
      // events get read receipts
      awaitCond()(srv.receipts.asScala.nonEmpty)
      // unaddressed chatter is ignored, hello? gets Yes?
      srv.inject("!ops:x", "@boss:x", "just chatting")
      srv.inject("!ops:x", "@boss:x", "hello?")
      awaitCond()(srv.messages.asScala.exists(_._2 == "Yes?"))
      assert(executed.size == 1)
      // own echo ignored
      srv.inject("!ops:x", "@graft:x", "graft:st")
      Thread.sleep(300)
      assert(executed.size == 1)
      m.stop()
    } finally srv.close()
  }

  test("numeric refs store and solve like the reference chat math") {
    val srv = new MiniMatrixServer
    val m = new MatrixClient(MatrixCfg("@graft:x", "pw", srv.url),
      retryStepMillis = 50, syncTimeoutMillis = 300)
    try {
      m.login()
      awaitCond()(m.loggedIn && m.syncCount >= 1)
      srv.inject("!r:x", "@boss:x", "das x=6")
      awaitCond()(srv.messages.asScala.exists(_._2 == "Stored 6 as x"))
      srv.inject("!r:x", "@boss:x", "das solve 3*x+2=?")
      awaitCond()(srv.messages.asScala.exists(_._2 == "3*x+2 = 20"))
      srv.inject("!r:x", "@boss:x", "das solve 2*2=?")
      awaitCond()(srv.messages.asScala.exists(_._2.contains("raises 4 fingers")))
      srv.inject("!r:x", "@boss:x", "das 2*x=y")
      awaitCond()(srv.messages.asScala.exists(_._2 == "Stored 12 as y"))
      m.stop()
    } finally srv.close()
  }

  test("unknown-command replies get the joke rewrite; failed sends queue") {
    val srv = new MiniMatrixServer
    val m = new MatrixClient(MatrixCfg("@graft:x", "pw", srv.url),
      execute = (cmd, sink) => sink(s"Unknown command $cmd"),
      retryStepMillis = 50, syncTimeoutMillis = 300)
    try {
      m.login()
      awaitCond()(m.loggedIn && m.syncCount >= 1)
      srv.inject("!r:x", "@boss:x", "das gibberish")
      awaitCond()(srv.messages.asScala.exists(_._2.contains("made a typo")))
      m.stop()
    } finally srv.close()
    // a dead endpoint lands the send in the failed queue. Deliberately a
    // FRESH client on port 1 (always connection-refused, never bindable)
    // — reusing srv's closed ephemeral port races parallel suites, whose
    // own stub servers can rebind it between close() and the send
    val dead = new MatrixClient(MatrixCfg("@graft:x", "pw", "http://127.0.0.1:1"),
      retryStepMillis = 50, syncTimeoutMillis = 300)
    dead.sendMessage("!r:x", "too late")
    assert(dead.pendingFailed == 1)
    dead.stop()
  }

  test("media upload shares an m.file link; download round-trips the bytes") {
    val srv = new MiniMatrixServer
    val m = new MatrixClient(
      MatrixCfg("@graft:x", "pw", srv.url,
        rooms = Seq(RoomSetup("ops", "!ops:x"))),
      retryStepMillis = 50, syncTimeoutMillis = 300)
    val dlDir = java.nio.file.Files.createTempDirectory("graft-matrix-dl")
    m.downloadDir = dlDir
    try {
      m.login()
      awaitCond()(m.loggedIn && m.syncCount >= 1)

      // upload: POST to the media repo, then m.file share into the room
      val report = java.nio.file.Files.createTempFile("statuslog", ".txt")
      java.nio.file.Files.write(report, "all systems nominal\n".getBytes("UTF-8"))
      assert(m.sendFile("ops", report) == "File upload succeeded")
      awaitCond()(srv.uploads.asScala.exists { case (name, bytes) =>
        name == report.getFileName.toString &&
          new String(bytes, "UTF-8") == "all systems nominal\n"
      })
      awaitCond()(srv.shares.asScala.exists { case (room, name, mxc) =>
        room == "!ops:x" && name == report.getFileName.toString &&
          mxc.startsWith("mxc://")
      })
      // the uploaded file is now listed (console matrix:files)
      assert(m.fileLinks.contains(report.getFileName.toString))

      // download: a shared m.file event lands in fileLinks, down fetches it
      srv.seedMedia("x/abc", "from-the-bridge".getBytes("UTF-8"))
      srv.inject("!ops:x", "@boss:x", "bridge.txt", msgtype = "m.file")
      awaitCond()(m.fileLinks.contains("bridge.txt"))
      val res = m.downloadFile("bridge.txt")
      assert(res.startsWith("File received"), res)
      val dl = dlDir.resolve("bridge.txt")
      assert(java.nio.file.Files.exists(dl))
      assert(new String(java.nio.file.Files.readAllBytes(dl), "UTF-8") == "from-the-bridge")

      // unknown id and traversal-shaped ids stay inside the download dir
      assert(m.downloadFile("nope.bin").startsWith("! No such file id"))
      m.stop()
    } finally srv.close()
  }

  test("DcafsXml.parseMatrix reads the reference matrix node") {
    val xml =
      """<dcafs><matrix user="@unit1:chat.host" pass="pw">
        |  <server>chat.host:8008</server>
        |  <macro id="t">temperature</macro>
        |  <room id="ops"><url>!abc:chat.host</url>
        |    <entering>Hello!</entering><leaving>Bye :(</leaving>
        |    <greet>Welcome</greet></room>
        |</matrix></dcafs>""".stripMargin
    val cfg = DcafsXml.parseMatrix(xml).get
    assert(cfg.userName == "unit1")
    assert(cfg.baseUrl == "http://chat.host:8008")
    assert(cfg.rooms == Seq(RoomSetup("ops", "!abc:chat.host", "Hello!", "Bye :(", "Welcome")))
    assert(cfg.macros == Map("t" -> "temperature"))
    // server defaults to the user's homeserver when the node is absent
    val bare = DcafsXml.parseMatrix("""<matrix user="@u:hs.example" pass="p"/>""").get
    assert(bare.baseUrl == "http://hs.example")
  }

  test("MatrixMath solves the infix subset with refs") {
    assert(MatrixMath.solve("3*4+2", Map.empty).contains(14.0))
    assert(MatrixMath.solve("2^10", Map.empty).contains(1024.0))
    assert(MatrixMath.solve("(1+2)*x", Map("x" -> 5.0)).contains(15.0))
    assert(MatrixMath.solve("10%3", Map.empty).contains(1.0))
    assert(MatrixMath.solve("-x+1", Map("x" -> 2.0)).contains(-1.0))
    assert(MatrixMath.solve("nope+1", Map.empty).isEmpty) // unknown ref
    assert(MatrixMath.solve("3*", Map.empty).isEmpty)
  }
}
