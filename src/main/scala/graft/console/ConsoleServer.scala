package graft.console

import java.io.{BufferedOutputStream, InputStream, OutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Named line channels fanning out to attached per-client targets — the
  * Spark twin of the reference's Writable-target forwarding
  * (`/root/reference/src/io/stream/StreamManager.java:1049-1070`
  * `addForwarding`): a telnet session asks for `raw:<id>` and becomes a
  * target of that stream until it sends an empty line / `stop`
  * (`StreamManager.java:618-622`).
  */
class LineHub {
  private val targets =
    new ConcurrentHashMap[String, java.util.concurrent.CopyOnWriteArraySet[String => Unit]]()

  def attach(id: String, target: String => Unit): Unit =
    targets
      .computeIfAbsent(id, _ => new java.util.concurrent.CopyOnWriteArraySet[String => Unit]())
      .add(target)

  /** Remove the target from every channel (the reference's
    * `removeWritable`).
    */
  def detach(target: String => Unit): Unit =
    targets.values.forEach(_.remove(target))

  /** Remove the target from one channel only. */
  def detach(id: String, target: String => Unit): Unit = {
    val set = targets.get(id)
    if (set != null) { set.remove(target); () }
  }

  /** Publish to every target; a target that throws (dead client socket)
    * is detached instead of letting the exception bubble into the
    * publishing pump's foreachBatch — one gone client must not kill the
    * shared streaming pump for everyone else.
    */
  def publish(id: String, line: String): Unit = {
    val set = targets.get(id)
    if (set != null) set.forEach { t =>
      try t(line)
      catch { case _: Exception => set.remove(t) }
    }
  }

  /** True if anyone is listening on the channel (lets pumps idle cheap). */
  def hasListeners(id: String): Boolean = {
    val set = targets.get(id)
    set != null && !set.isEmpty
  }
}

/** The reference's front door: a telnet-style TCP listener serving the
  * [[GraftConsole]] command surface plus live `raw:<id>` stream
  * subscriptions (`/root/reference/src/io/telnet/TelnetServer.java:29`,
  * `TelnetHandler.java:104-175`).
  *
  * Each accepted client gets a session thread: banner, `>` prompt, one
  * command per line, multi-line responses CRLF-terminated. `raw:<id>`
  * against a *streaming* temp view attaches the client as a live target —
  * a bounded foreachBatch pump publishes the view's `line` column into
  * [[LineHub]] and every subscribed session's socket; an empty line or
  * `stop` detaches (reference `StreamManager.replyToCommand`:618-622).
  * `raw:` against a batch view falls through to the console's sampling
  * form. Everything else is [[GraftConsole.execute]].
  *
  * Scale stance: this is the operator plane, not the data plane — one
  * human at a terminal. The pump collects at most [[maxLinesPerBatch]]
  * rows per micro-batch to the driver (same bound pattern as
  * `RuleEngine.alerts`), so a misdirected subscription to a firehose view
  * degrades to sampling instead of OOMing the driver.
  */
class ConsoleServer(
    spark: SparkSession,
    console: GraftConsole,
    port: Int = 0,
    title: String = "graft",
    maxLinesPerBatch: Int = 1000) {

  val hub = new LineHub
  private val server = new ServerSocket(port)
  private val stopped = new AtomicBoolean(false)
  private val pumps = new ConcurrentHashMap[String, StreamingQuery]()
  private val sessions =
    java.util.Collections.newSetFromMap(new ConcurrentHashMap[Socket, java.lang.Boolean]())

  /** Actual bound port (useful with port=0 / ephemeral). */
  def boundPort: Int = server.getLocalPort

  private val acceptor = new Thread(s"graft-console-$boundPort") {
    override def run(): Unit = {
      while (!stopped.get()) {
        try {
          val client = server.accept()
          sessions.add(client)
          val t = new Thread(() => runSession(client),
            s"graft-console-session-${client.getRemoteSocketAddress}")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: SocketException => // closed during stop()
        }
      }
    }
  }
  acceptor.setDaemon(true)

  def start(): ConsoleServer = { acceptor.start(); this }

  def stop(): Unit = {
    stopped.set(true)
    server.close()
    sessions.forEach(s => try s.close() catch { case _: Exception => })
    pumps.values.forEach(q => try q.stop() catch { case _: Exception => })
    pumps.clear()
    pumpCheckpoints.keySet().forEach(dropCheckpoint)
  }

  // ---- per-session ----------------------------------------------------

  private def runSession(socket: Socket): Unit = {
    val out = new BufferedOutputStream(socket.getOutputStream)
    // this session's push target: raw hub lines go straight to the socket
    val target: String => Unit = line => writeLine(out, line)
    try {
      // whole-line color wrap (reference TelnetHandler's green banner via
      // TelnetCodes): ANSI-capable clients render it, line-mode machine
      // clients substring-match the uncolored text between the codes
      writeLine(out, TelnetCodes.TEXT_GREEN + s"Welcome to $title!" + TelnetCodes.TEXT_RESET)
      writeLine(out, "> Common commands: help, ss, st, rtvals, raw:<id>, exit...")
      prompt(out)
      val reader = new TelnetLineReader(socket.getInputStream, out)
      // per-session wizard (reference Configurator is telnet-session state)
      var wizard: Option[Configurator] = None
      var line: String = reader.readLine()
      while (line != null && !stopped.get()) {
        val trimmed = line.trim
        trimmed match {
          case _ if wizard.nonEmpty =>
            val (reply, finished) = wizard.get.reply(trimmed)
            if (finished) wizard = None
            reply.linesIterator.foreach(writeLine(out, _))
            prompt(out)
            line = reader.readLine()
          case c if c == "cfg" || c.startsWith("cfg,") =>
            val f = if (c.startsWith("cfg,")) c.stripPrefix("cfg,").trim
              else "settings.xml"
            val w = new Configurator(java.nio.file.Paths.get(f))
            wizard = Some(w)
            w.start().linesIterator.foreach(writeLine(out, _))
            prompt(out)
            line = reader.readLine()
          case "exit" | "bye" =>
            writeLine(out, "Bye!")
            socket.close()
            line = null
          case "" | "stop" =>
            hub.detach(target)
            stopIdlePumps()
            writeLine(out, "Ok.")
            prompt(out)
            line = reader.readLine()
          case c if c.startsWith("raw:") || c.startsWith("stream:") =>
            writeLine(out, subscribe(c, target))
            prompt(out)
            line = reader.readLine()
          case cmd =>
            val reply =
              try console.execute(cmd)
              catch { case e: Exception => s"! ${e.getMessage}" }
            reply.linesIterator.foreach(writeLine(out, _))
            prompt(out)
            line = reader.readLine()
        }
      }
    } catch {
      case _: java.io.IOException => // client went away
    } finally {
      hub.detach(target)
      stopIdlePumps()
      sessions.remove(socket)
      try socket.close() catch { case _: Exception => }
    }
  }

  /** Stop and forget pump queries whose channel has no listeners left —
    * otherwise every once-subscribed view keeps a 100 ms-trigger query
    * (and its temp checkpoint dir) running forever after the last client
    * detaches.
    */
  private def stopIdlePumps(): Unit =
    pumps.forEach { (id, q) =>
      if (!hub.hasListeners(id)) {
        // snapshot THIS pump's checkpoint dir before unregistering: once
        // pumps.remove lands, a concurrent subscribe may re-create the
        // pump and map a NEW checkpoint under the same id — an
        // unconditional dropCheckpoint(id) would then delete the live
        // query's dir from under it. Two-arg removes pair the reap to the
        // exact (query, dir) this loop observed.
        val dir = pumpCheckpoints.get(id)
        if (pumps.remove(id, q)) {
          try q.stop() catch { case _: Exception => () }
          if (dir != null && pumpCheckpoints.remove(id, dir)) deleteDir(dir)
        }
      }
    }

  /** Temp checkpoint dirs per pump, deleted when the pump is reaped —
    * a long-lived console session must not accrete one /tmp tree per
    * once-subscribed view.
    */
  private val pumpCheckpoints = new ConcurrentHashMap[String, java.nio.file.Path]()

  private def dropCheckpoint(id: String): Unit = {
    val dir = pumpCheckpoints.remove(id)
    if (dir != null) deleteDir(dir)
  }

  private def deleteDir(dir: java.nio.file.Path): Unit =
    try {
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    } catch { case _: java.io.IOException => () }

  /** `raw:<id>[,N]`: live-attach for streaming views, sample for batch. */
  private def subscribe(cmd: String, target: String => Unit): String = {
    val body = cmd.dropWhile(_ != ':').drop(1)
    val id = body.split(",")(0).trim
    val table =
      try Some(spark.table(id))
      catch { case _: Exception => None }
    table match {
      case Some(df) if df.isStreaming =>
        // a failing pump start (analysis error, checkpoint IO) must reply
        // to THIS client, not escape the IOException-only session handler
        // and silently kill the session thread. Attach before starting the
        // pump: a concurrent stopIdlePumps then sees a listener and leaves
        // the pump alone.
        hub.attach(id, target)
        try {
          ensurePump(id)
          s"Request for raw:$id ok"
        } catch {
          case e: Exception =>
            hub.detach(id, target)
            // do NOT pumps.remove(id) here: computeIfAbsent installs no
            // mapping when its function throws, so there is nothing of
            // OURS to remove — and a concurrent subscriber may have just
            // installed a healthy pump under the same id, which a blind
            // remove would orphan (running forever, unreachable by
            // stopIdlePumps). ensurePump cleans its own partial state.
            s"! raw:$id pump failed to start: ${e.getMessage}"
        }
      case Some(_) =>
        try console.execute(cmd)
        catch { case e: Exception => s"! ${e.getMessage}" }
      case None => s"Request for raw:$id failed"
    }
  }

  /** One pump query per subscribed streaming view: collect a bounded
    * slice of each micro-batch on the driver and publish to the hub.
    */
  private def ensurePump(id: String): Unit =
    pumps.computeIfAbsent(id, _ => {
      val df = spark.table(id)
      val lineCol =
        if (df.columns.contains("line")) "line" else df.columns.head
      val checkpointDir = java.nio.file.Files.createTempDirectory(s"graft-hub-$id")
      try startPump(id, df, lineCol, checkpointDir)
      catch {
        case e: Exception =>
          // a failed start must not leak its temp checkpoint tree (each
          // retry would otherwise abandon one) or a stale checkpoint entry
          deleteDir(checkpointDir)
          throw e
      }
    })

  private def startPump(id: String,
      df: org.apache.spark.sql.DataFrame, lineCol: String,
      checkpointDir: java.nio.file.Path): StreamingQuery = {
    val checkpoint = checkpointDir.toString
    val q = df.writeStream
        .queryName(s"graft_hub_$id")
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          if (hub.hasListeners(id)) {
            val rows =
              batch.select(col(lineCol).cast("string")).limit(maxLinesPerBatch).collect()
            rows.foreach(r => hub.publish(id, r.getString(0)))
          }
        }
        .start()
    // register the checkpoint only once the query is RUNNING — putting
    // it first left a stale entry pointing at a deleted dir when start
    // failed (and a retry would then overwrite the older mapping
    // without reaping its directory)
    pumpCheckpoints.put(id, checkpointDir)
    q
  }

  private def writeLine(out: OutputStream, s: String): Unit =
    out.synchronized {
      out.write(s.getBytes(StandardCharsets.UTF_8))
      out.write('\r'); out.write('\n')
      out.flush()
    }

  private def prompt(out: OutputStream): Unit =
    out.synchronized { out.write('>'); out.flush() }
}

/** ANSI / telnet control constants (reference `io/telnet/TelnetCodes.java`
  * — the subset the CLI layer uses).
  */
object TelnetCodes {
  val IAC: Int = 0xFF
  val ESC = "\u001b"
  val WILL_SGA: Array[Byte] = Array(0xFF.toByte, 251.toByte, 3.toByte)
  val WILL_ECHO: Array[Byte] = Array(0xFF.toByte, 251.toByte, 1.toByte)
  val TEXT_RESET: String = ESC + "[0m"
  val TEXT_GREEN: String = ESC + "[0;32m"
  val TEXT_RED: String = ESC + "[0;31m"
  val TEXT_YELLOW: String = ESC + "[0;33m"
  val CLEAR_LINE_END: String = ESC + "[K"
  def cursorLeft(n: Int): String = if (n <= 0) "" else ESC + s"[${n}D"
}

/** Telnet-aware line reader with the reference CLI's editing surface
  * (`io/telnet/CommandLineInterface.java:34-194`): arrow-up/down command
  * history (dedup, 20 deep, `:89-93`), left/right cursor movement,
  * backspace and forward-delete mid-line, with server-side echo and
  * `ESC[K`-based redraw.
  *
  * Editing and echo activate only once the client sends an IAC sequence —
  * real telnet clients negotiate on connect (and get WILL ECHO/SGA back,
  * like the reference CLI constructor, `:23-26`); line-mode machine
  * clients never see echoes and get the plain split-on-LF behavior.
  * Lines are capped at [[TelnetLineReader.MaxLine]] bytes — a client
  * streaming bytes with no newline must not grow driver memory unbounded
  * (netty's frame decoder enforces the same limit in the reference);
  * excess bytes of an over-long line are dropped, the line still
  * terminates at its newline.
  */
private class TelnetLineReader(in: InputStream, out: OutputStream) {
  private val buf = new StringBuilder
  private var cursor = 0
  private var telnetMode = false
  private val history = scala.collection.mutable.ArrayBuffer.empty[String]
  private var histIdx = 0

  private def echo(s: String): Unit = if (telnetMode) out.synchronized {
    out.write(s.getBytes(StandardCharsets.UTF_8)); out.flush()
  }

  /** Repaint the edit line and put the terminal cursor at [[cursor]]. */
  private def redraw(): Unit = {
    echo("\r>" + buf.toString + TelnetCodes.CLEAR_LINE_END)
    echo(TelnetCodes.cursorLeft(buf.length - cursor))
  }

  private def recall(adj: Int): Unit = if (history.nonEmpty) {
    // clamp like the reference (CommandLineInterface.java:180-186)
    histIdx = math.min(math.max(histIdx + adj, 0), history.size - 1)
    buf.clear(); buf.append(history(histIdx))
    cursor = buf.length
    redraw()
  }

  private def finish(): String = {
    // chars were accumulated byte-per-char (the editor is byte-oriented
    // like the reference's ByteBuf); reinterpret as UTF-8 at line end
    val r = new String(buf.toString.map(_.toByte).toArray, StandardCharsets.UTF_8)
    if (r.nonEmpty) {
      history -= r; history += r               // dedup, most-recent-last
      if (history.size > 20) { history.remove(0); () }
    }
    histIdx = history.size
    r
  }

  def readLine(): String = {
    buf.clear(); cursor = 0
    var b = in.read()
    while (b != -1) {
      if (b == TelnetCodes.IAC) {
        val verb = in.read()
        if (verb >= 0xFB && verb <= 0xFE) in.read() // WILL/WONT/DO/DONT <opt>
        if (!telnetMode) {
          telnetMode = true
          // reference CLI negotiates char-at-a-time + server echo
          out.synchronized {
            out.write(TelnetCodes.WILL_SGA); out.write(TelnetCodes.WILL_ECHO)
            out.flush()
          }
        }
      } else if (b == 27) { // ESC [ <code>
        if (in.read() == '[') in.read() match {
          case 'A' => recall(-1) // arrow up
          case 'B' => recall(+1) // arrow down
          case 'C' => if (cursor < buf.length) { cursor += 1; echo(TelnetCodes.ESC + "[C") }
          case 'D' => if (cursor > 0) { cursor -= 1; echo(TelnetCodes.ESC + "[D") }
          case '3' => // forward delete is ESC [ 3 ~
            in.read() // consume '~'
            if (cursor < buf.length) { buf.deleteCharAt(cursor); redraw() }
          case _ => ()
        }
      } else if (b == '\n') {
        echo("\r\n")
        return finish()
      } else if (b == 127 || b == 8) { // backspace
        if (cursor > 0) {
          buf.deleteCharAt(cursor - 1); cursor -= 1
          redraw()
        }
      } else if ((b > 31 || b == '\t') && buf.length < TelnetLineReader.MaxLine) {
        // '\t' passes through: line-mode machine clients send tab-bearing
        // payloads (TSV, SQL) and the old CR-only stripper kept them; only
        // the editing/control bytes handled above are consumed
        buf.insert(cursor, b.toChar)
        cursor += 1
        if (cursor == buf.length) echo(b.toChar.toString) else redraw()
      }
      b = in.read()
    }
    if (buf.nonEmpty) finish() else null
  }
}

private object TelnetLineReader {
  val MaxLine: Int = 64 * 1024
}
