package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.alerts._

/** Embedded mini SMTP server (the delivery-side twin of MiniMqttBroker):
  * EHLO/AUTH/MAIL/RCPT/DATA/QUIT, records delivered messages, can be told
  * to fail the next N MAIL commands with a transient 451 to exercise the
  * retry queue.
  */
class MiniSmtpServer {
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  val failNext = new AtomicInteger(0)
  /** (mail-from, rcpts, raw message) per delivery. */
  val received = new ConcurrentLinkedQueue[(String, Seq[String], String)]()
  @volatile private var running = true

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
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.ISO_8859_1))
    val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.ISO_8859_1)
    def w(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
    w("220 mini ESMTP")
    var from = ""
    var rcpts = List.empty[String]
    var line = in.readLine()
    while (line != null) {
      val up = line.toUpperCase
      if (up.startsWith("EHLO") || up.startsWith("HELO")) {
        out.write("250-mini\r\n"); w("250 AUTH PLAIN")
      } else if (up.startsWith("AUTH PLAIN")) w("235 ok")
      else if (up.startsWith("MAIL FROM:")) {
        if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) w("451 try again later")
        else { from = line.drop(10).trim.stripPrefix("<").stripSuffix(">"); w("250 ok") }
      } else if (up.startsWith("RCPT TO:")) {
        rcpts = rcpts :+ line.drop(8).trim.stripPrefix("<").stripSuffix(">")
        w("250 ok")
      } else if (up == "DATA") {
        w("354 go ahead")
        val sb = new StringBuilder
        var l = in.readLine()
        while (l != null && l != ".") {
          sb.append(if (l.startsWith("..")) l.drop(1) else l).append("\r\n")
          l = in.readLine()
        }
        received.add((from, rcpts, sb.toString))
        from = ""; rcpts = Nil
        w("250 queued")
      } else if (up == "QUIT") { w("221 bye"); sock.close(); return }
      else w("250 ok")
      line = in.readLine()
    }
  }

  def close(): Unit = { running = false; server.close() }
}

/** Embedded mini IMAP server: LOGIN/SELECT/SEARCH UNSEEN/FETCH BODY[] as
  * a literal/STORE flags/EXPUNGE/LOGOUT over a mutable mailbox.
  */
class MiniImapServer {
  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  /** (raw rfc822, flags) — flags mutate via STORE; EXPUNGE removes
    * \Deleted.
    */
  val messages = java.util.Collections.synchronizedList(
    new java.util.ArrayList[(String, scala.collection.mutable.Set[String])]())
  @volatile private var running = true

  def add(raw: String): Unit = messages.add((raw, scala.collection.mutable.Set.empty[String]))

  def unseenCount: Int = messages.asScala.count(m => !m._2.contains("Seen"))

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
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.ISO_8859_1))
    val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.ISO_8859_1)
    def w(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
    w("* OK mini imap")
    var line = in.readLine()
    while (line != null) {
      val sp = line.split(" ", 3)
      val (tag, cmd) = (sp(0), if (sp.length > 1) sp(1).toUpperCase else "")
      val rest = if (sp.length > 2) sp(2) else ""
      cmd match {
        case "LOGIN" => w(s"$tag OK logged in")
        case "SELECT" =>
          w(s"* ${messages.size} EXISTS"); w(s"$tag OK selected")
        case "SEARCH" =>
          val ids = messages.asScala.zipWithIndex.collect {
            case ((_, flags), i) if !flags.contains("Seen") && !flags.contains("Deleted") =>
              (i + 1).toString
          }
          w(("* SEARCH" +: ids).mkString(" ")); w(s"$tag OK search done")
        case "FETCH" =>
          val seq = rest.split(" ")(0).toInt
          val (raw, flags) = messages.get(seq - 1)
          flags += "Seen"
          val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
          out.write(s"* $seq FETCH (BODY[] {${bytes.length}}\r\n")
          out.flush()
          sock.getOutputStream.write(bytes)
          w(")"); w(s"$tag OK fetch done")
        case "STORE" =>
          val parts = rest.split(" ", 3)
          val seq = parts(0).toInt
          val flags = messages.get(seq - 1)._2
          val flag = parts(2).replaceAll("[()\\\\]", "")
          if (parts(1) == "+FLAGS") flags += flag else flags -= flag
          w(s"$tag OK store done")
        case "EXPUNGE" =>
          val keep = messages.asScala.filterNot(_._2.contains("Deleted")).toList
          messages.clear(); keep.foreach(messages.add)
          w(s"$tag OK expunged")
        case "LOGOUT" => w("* BYE"); w(s"$tag OK bye"); sock.close(); return
        case _ => w(s"$tag OK noop")
      }
      line = in.readLine()
    }
  }

  def close(): Unit = { running = false; server.close() }
}

/** S6/K8 email subsystem vs the reference semantics
  * (`/root/reference/src/io/email/EmailWorker.java`): SMTP delivery with
  * book/throttle/retry/attachment rules, IMAP inbox polling with
  * permits, label ingest, buffered command replies.
  */
class EmailSpec extends AnyFunSuite {

  private def awaitCond(ms: Long = 20000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(cond, "condition not met in time")
  }

  private def newWorker(
      smtp: MiniSmtpServer,
      imap: MiniImapServer = null,
      execute: (String, String => Unit) => Unit = (_, _) => (),
      onData: (String, String, String) => Unit = (_, _, _) => (),
      from: String = "graft@email.com",
      inboxUser: String = "graft"): EmailWorker =
    new EmailWorker(
      outbox = MailboxCfg("127.0.0.1", smtp.port, from = from),
      inbox = if (imap == null) MailboxCfg()
        else MailboxCfg("127.0.0.1", imap.port, user = inboxUser, pass = "pw"),
      execute = execute,
      onData = onData,
      busyWindowMillis = 400,
      sendSpacingMillis = 5,
      retryFirstMillis = 100,
      retryBackoffBaseMillis = 100,
      retryBackoffMaxMillis = 300,
      replyWindowMillis = 150,
      failedCheckRetryMillis = 100)

  test("delivers a book-resolved html email with subject macro") {
    val smtp = new MiniSmtpServer
    val w = newWorker(smtp)
    try {
      w.addTo("admin", "a@x.com;b@x.com")
      w.sendEmail(Email.toAdminAbout("alarm at.").content("<b>temp high</b>"))
      awaitCond()(smtp.received.size == 1)
      val (from, rcpts, msg) = smtp.received.peek()
      assert(from == "graft@email.com")
      assert(rcpts == Seq("a@x.com", "b@x.com"))
      assert(msg.contains("Content-Type: text/html"))
      assert(msg.contains("<b>temp high</b>"))
      // " at." macro expanded to " at HH:mm."
      assert("Subject: alarm at \\d\\d:\\d\\d\\.".r.findFirstIn(msg).nonEmpty)
    } finally { w.stop(); smtp.close() }
  }

  test("transient failure lands in the retry queue and redelivers") {
    val smtp = new MiniSmtpServer
    val w = newWorker(smtp)
    try {
      w.addTo("admin", "a@x.com")
      smtp.failNext.set(1)
      w.sendEmail(Email.toAdminAbout("retry me"))
      awaitCond()(smtp.received.size == 1 && w.retryQueueSize == 0)
      assert(smtp.received.peek()._3.contains("Subject: retry me"))
    } finally { w.stop(); smtp.close() }
  }

  test("throttle allows at most 5 sends per busy window") {
    val smtp = new MiniSmtpServer
    val w = newWorker(smtp)
    try {
      (1 to 8).foreach(i => w.sendEmail(Email.to("a@x.com").subject(s"m$i")))
      // the throttle drops the excess at submit time, so exactly 5 ever
      // arrive: wait for them, then confirm no stragglers follow
      awaitCond()(smtp.received.size == 5)
      Thread.sleep(150)
      assert(smtp.received.size == 5, s"got ${smtp.received.size}")
      awaitCond()(w.spamStatus.startsWith("Busy at 0")) // window cleared
      w.sendEmail(Email.to("a@x.com").subject("after window"))
      awaitCond()(smtp.received.size == 6)
    } finally { w.stop(); smtp.close() }
  }

  test("attachment rules: base64 attach, zip-from-size, drop-over-max, missing") {
    val smtp = new MiniSmtpServer
    val dir = Files.createTempDirectory("email-attach")
    val file = dir.resolve("data.csv")
    Files.write(file, "a,b,c\n1,2,3\n".getBytes(StandardCharsets.UTF_8))
    def worker(zipFrom: Double, maxSize: Double) = new EmailWorker(
      outbox = MailboxCfg("127.0.0.1", smtp.port, from = "graft@email.com"),
      zipFromMB = zipFrom, maxSizeMB = maxSize,
      busyWindowMillis = 400, sendSpacingMillis = 5, retryFirstMillis = 100)
    // 1) small attachment rides along as base64
    val w1 = worker(10, 15)
    w1.sendEmail(Email.to("a@x.com").subject("csv").attachment(file.toString))
    awaitCond()(smtp.received.size == 1)
    val plain = smtp.received.poll()._3
    assert(plain.contains("""filename="data.csv""""))
    val b64 = java.util.Base64.getEncoder.encodeToString(Files.readAllBytes(file))
    assert(plain.contains(b64))
    // 2) above zip threshold: zipped
    val w2 = worker(0.000001, 15)
    w2.sendEmail(Email.to("a@x.com").subject("zipped").attachment(file.toString))
    awaitCond()(smtp.received.size == 1)
    val zipped = smtp.received.poll()._3
    assert(zipped.contains("""filename="data.csv.zip""""))
    assert(Files.exists(file), "original kept without deleteOnSend")
    // the worker deletes the temp zip AFTER the SMTP dialogue completes,
    // and MiniSmtpServer registers the message at DATA completion — a
    // plain exists() here raced the worker's cleanup closure (seen flaky
    // in the round-15 green-gate run); await it like the sends above
    awaitCond()(!Files.exists(dir.resolve("data.csv.zip")))
    // 3) zipped still above max: dropped with subject annotation
    val w3 = worker(0.000001, 0.0000001)
    w3.sendEmail(Email.to("a@x.com").subject("too big").attachment(file.toString))
    awaitCond()(smtp.received.size == 1)
    val dropped = smtp.received.poll()._3
    assert(dropped.contains("[ATTACHMENT REMOVED because size constraint!]"))
    assert(!dropped.contains("filename="))
    // 4) missing file annotated
    val w4 = worker(10, 15)
    w4.sendEmail(Email.to("a@x.com").subject("gone")
      .attachment(dir.resolve("nope.csv").toString))
    awaitCond()(smtp.received.size == 1)
    assert(smtp.received.poll()._3.contains("[attachment not found!]"))
    Seq(w1, w2, w3, w4).foreach(_.stop()); smtp.close()
  }

  private def rfc822(from: String, to: String, subject: String, body: String): String =
    s"From: <$from>\r\nTo: <$to>\r\nSubject: $subject\r\n" +
      s"Content-Type: text/plain\r\n\r\n$body"

  test("inbox: stranger is refused, known sender command gets a buffered reply") {
    val smtp = new MiniSmtpServer
    val imap = new MiniImapServer
    val executed = new ConcurrentLinkedQueue[String]()
    val w = newWorker(smtp, imap,
      execute = (cmd, sink) => { executed.add(cmd); sink(s"result of $cmd"); sink("line2") })
    try {
      w.addTo("admin", "boss@x.com")
      imap.add(rfc822("boss@x.com", "graft@email.com", "st:status", "please"))
      imap.add(rfc822("rando@spam.com", "graft@email.com", "sd", "muhaha"))
      assert(w.check() == 2)
      // known sender: command executed, buffered reply emailed back
      awaitCond()(executed.asScala.toSeq == Seq("st:status"))
      awaitCond()(smtp.received.asScala.exists(_._3.contains("Buffered response to st:status")))
      val reply = smtp.received.asScala.find(_._3.contains("Buffered response")).get
      assert(reply._2 == Seq("boss@x.com"))
      assert(reply._3.contains("result of st:status<br>line2"))
      // stranger: refusal to sender + spam notice to admin
      awaitCond()(smtp.received.asScala.exists(_._3.contains("strangers")))
      awaitCond()(smtp.received.asScala.exists(_._3.contains("Got spam?")))
      // both messages consumed (deleted + expunged)
      awaitCond()(imap.messages.isEmpty)
    } finally { w.stop(); smtp.close(); imap.close() }
  }

  test("inbox: label: subject turns body lines into labeled data") {
    val smtp = new MiniSmtpServer
    val imap = new MiniImapServer
    val data = new ConcurrentLinkedQueue[(String, String, String)]()
    val w = newWorker(smtp, imap, onData = (l, o, v) => data.add((l, o, v)))
    try {
      w.addTo("sensors", "buoy@x.com")
      imap.add(rfc822("buoy@x.com", "graft@email.com", "label:sbe38",
        "21.3,35.1\r\n21.4,35.0\r\n\r\nsignature junk"))
      assert(w.check() == 1)
      awaitCond()(data.size == 2)
      assert(data.asScala.toSeq == Seq(
        ("sbe38", "buoy@x.com", "21.3,35.1"), ("sbe38", "buoy@x.com", "21.4,35.0")))
    } finally { w.stop(); smtp.close(); imap.close() }
  }

  test("inbox: admin-class command from non-admin is denied; permits override") {
    val smtp = new MiniSmtpServer
    val imap = new MiniImapServer
    val executed = new ConcurrentLinkedQueue[String]()
    val w = newWorker(smtp, imap, execute = (cmd, _) => executed.add(cmd))
    try {
      w.addTo("ops", "op@x.com")
      // denied: sd is admin-class and op is not in admin
      imap.add(rfc822("op@x.com", "graft@email.com", "sd", ""))
      assert(w.check() == 1)
      awaitCond()(smtp.received.asScala.exists(_._3.contains("Not allowed to use sd")))
      assert(!executed.asScala.exists(_ == "sd"))
      // explicit allow permit flips it
      w.addPermit(Permit(denies = false, ref = "ops", value = "sd", regex = false))
      imap.add(rfc822("op@x.com", "graft@email.com", "sd", ""))
      assert(w.check() == 1)
      awaitCond()(executed.asScala.toSeq == Seq("sd"))
    } finally { w.stop(); smtp.close(); imap.close() }
  }

  test("multi-instance ' for ' routing: wrong instance unseen, ours forwarded") {
    val smtp = new MiniSmtpServer
    val imap = new MiniImapServer
    val executed = new ConcurrentLinkedQueue[String]()
    val w = newWorker(smtp, imap, execute = (cmd, _) => executed.add(cmd))
    try {
      w.addTo("admin", "boss@x.com")
      // not for this instance (fromStart "graft" absent): left unseen
      imap.add(rfc822("boss@x.com", "graft@email.com", "st for other", ""))
      assert(w.check() == 1)
      assert(executed.isEmpty)
      awaitCond()(imap.unseenCount == 1) // reverted to unseen for the right instance
      imap.messages.clear()
      // for us plus another: command runs here, a copy minus our id forwards
      imap.add(rfc822("boss@x.com", "graft@email.com", "st for other,graft", ""))
      assert(w.check() == 1)
      awaitCond()(executed.asScala.toSeq == Seq("st"))
      awaitCond()(smtp.received.asScala.exists(_._3.contains("Subject: st for other")))
    } finally { w.stop(); smtp.close(); imap.close() }
  }

  test("DcafsXml.parseEmail reads the reference email node") {
    val xml =
      """<dcafs><settings><email>
        |  <outbox>
        |    <server port="2525" user="u" pass="p" ssl="no">smtp.host</server>
        |    <from>unit1@email.com</from>
        |    <zip_from_size_mb>3</zip_from_size_mb>
        |    <delete_rec_zip>yes</delete_rec_zip>
        |    <max_size_mb>10</max_size_mb>
        |  </outbox>
        |  <inbox>
        |    <server port="1143" user="unit1" pass="pw" ssl="yes">imap.host</server>
        |    <checkinterval>3m</checkinterval>
        |    <allowed>vliz.be</allowed>
        |  </inbox>
        |  <book>
        |    <entry ref="admin">boss@x.com;backup@x.com</entry>
        |    <entry ref="ops">op@x.com</entry>
        |  </book>
        |  <permits>
        |    <allow ref="ops" regex="yes">sd.*</allow>
        |    <deny ref="spy@x.com">st</deny>
        |  </permits>
        |</email></settings></dcafs>""".stripMargin
    val cfg = DcafsXml.parseEmail(xml).get
    assert(cfg.outbox.server == "smtp.host" && cfg.outbox.port == 2525)
    assert(cfg.outbox.from == "unit1@email.com" && cfg.outbox.fromStart == "unit1")
    assert(cfg.inbox.server == "imap.host" && cfg.inbox.ssl)
    assert(cfg.checkIntervalSeconds == 180)
    assert(cfg.allowedDomain == "vliz.be")
    assert(cfg.zipFromMB == 3.0 && cfg.maxSizeMB == 10.0 && cfg.deleteRecZip)
    assert(cfg.book == Seq("admin" -> "boss@x.com;backup@x.com", "ops" -> "op@x.com"))
    assert(cfg.permits == Seq(
      Permit(denies = false, "ops", "sd.*", regex = true),
      Permit(denies = true, "spy@x.com", "st", regex = false)))
  }

  test("end-to-end: emailed command runs through the worker and replies") {
    // the full S6 -> command plane -> K8 loop: an email arrives, the
    // subject executes, the output is emailed back through SMTP
    val smtp = new MiniSmtpServer
    val imap = new MiniImapServer
    val w = newWorker(smtp, imap,
      execute = (cmd, sink) => cmd match {
        case "rv:temp" => sink("temp=21.4")
        case other => sink(s"unknown $other")
      })
    try {
      w.addTo("admin", "boss@x.com")
      imap.add(rfc822("boss@x.com", "graft@email.com", "rv:temp", ""))
      assert(w.check() == 1)
      awaitCond()(smtp.received.asScala.exists { case (_, rcpt, msg) =>
        rcpt == Seq("boss@x.com") &&
          msg.contains("Buffered response to rv:temp") && msg.contains("temp=21.4")
      })
    } finally { w.stop(); smtp.close(); imap.close() }
  }
}
