package graft.alerts

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{LocalDateTime, ZoneOffset}
import java.util.concurrent.{ScheduledExecutorService, ScheduledFuture, TimeUnit}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.streaming.{BufferCollector, CollectorScheduler}

/** The reference email subsystem re-expressed
  * (`/root/reference/src/io/email/EmailWorker.java:30-1077`): alert
  * delivery over SMTP with the reference's book/throttle/retry rules
  * (K8), and inbox polling that turns emails into commands or labeled
  * data lines (S6).
  *
  * Delivery semantics carried over:
  *  - email book resolves refs to address lists (`applyBook`), `admin`
  *    is the alert default (`Email.toAdminAbout`);
  *  - throttle: at most 5 sends per busy window, each spaced by the
  *    current busy count, window cleared after 8 s (`sendEmail`,
  *    `clearBusy`); excess requests dropped with a spam warning;
  *  - failures queue for retry: first retry after 10 s, then
  *    `min(30 s * attempts, 300 s)`; stale emails (older than
  *    `maxEmailAgeHours`) are purged from the queue; any success flushes
  *    the whole retry queue;
  *  - subject macro `" at."` -> `" at HH:mm."`; attachment names may
  *    embed `[datetime-format]`; attachments above `zipFromMB` are
  *    zipped, above `maxSizeMB` dropped with a subject annotation,
  *    missing files annotated `[attachment not found!]`.
  *
  * Inbox semantics carried over (`Check.run`):
  *  - unseen messages only; sender resolved against the book — strangers
  *    get a refusal reply and the admin a spam notice, then delete;
  *  - permits: admin-class commands (admin/sd/shutdown/sleep/update/
  *    retrieve:set) deny-by-default unless the sender is in `admin`;
  *    explicit allow/deny rows match subject (equals or regex);
  *  - `" for "` multi-instance routing: not addressed to this instance ->
  *    revert to unseen; addressed plus others left -> forward onward;
  *  - subject `label:<l>` -> body lines become labeled data (S6 as an
  *    ingest source); any other subject is a command — commands with `:`
  *    collect their output in a time-limited buffer and email it back
  *    (`DataRequest`/`collectorFinished`);
  *  - attachment parts are saved under `attachmentsDir` (zips unpacked);
  *  - a received email schedules up to 5 quick follow-up checks at
  *    `min(interval/3, 30 s)`; a failed connect retries after 60 s.
  *
  * All reference delays are constructor parameters (defaults = reference
  * values) so tests run the same state machine at millisecond scale.
  */
class EmailWorker(
    val outbox: MailboxCfg,
    val inbox: MailboxCfg = MailboxCfg(),
    execute: (String, String => Unit) => Unit = (_, _) => (),
    onData: (String, String, String) => Unit = (_, _, _) => (),
    var checkIntervalSeconds: Int = 300,
    zipFromMB: Double = 10.0,
    maxSizeMB: Double = 15.0,
    maxEmailAgeHours: Int = -1,
    attachmentsDir: Path = Paths.get("attachments"),
    deleteReceivedZip: Boolean = true,
    transport: (MailboxCfg, String, Seq[String], String) => Unit = SmtpClient.send,
    fetcher: MailboxCfg => (ImapClient.FetchedMessage => ImapClient.Disposition) => Int =
      cfg => handle => ImapClient.checkUnseen(cfg)(handle),
    busyWindowMillis: Long = 8000,
    sendSpacingMillis: Long = 1000,
    retryFirstMillis: Long = 10000,
    retryBackoffBaseMillis: Long = 30000,
    retryBackoffMaxMillis: Long = 300000,
    replyWindowMillis: Long = 60000,
    failedCheckRetryMillis: Long = 60000,
    scheduler: ScheduledExecutorService = CollectorScheduler.shared) {

  private val emailBook = mutable.LinkedHashMap.empty[String, String]
  private val permits = mutable.ArrayBuffer.empty[Permit]
  private val retryQueue = mutable.ArrayBuffer.empty[(Email, Int)] // (email, attempts)
  @volatile var sendEmails = true
  private var busy = 0
  private var sendRequests = 0
  @volatile private var errorCount = 0
  private var retryFuture: ScheduledFuture[_] = null
  private var checker: ScheduledFuture[_] = null
  private var fastCheck: ScheduledFuture[_] = null
  private var slowCheck: ScheduledFuture[_] = null
  private var maxQuickChecks = 0
  @volatile private var stopped = false
  @volatile private var lastInboxConnect = -1L

  // ---- book / permits ----

  def addTo(ref: String, addresses: String): Unit = synchronized {
    val add = addresses.replace(";", ",")
    emailBook(ref) = emailBook.get(ref).filter(_.nonEmpty).map(_ + "," + add).getOrElse(add)
  }

  def addPermit(p: Permit): Unit = synchronized { permits += p }

  def bookListing: String =
    synchronized(emailBook.map { case (r, a) => s"$r -> $a" })
      .mkString("-Emailbook-\n", "\n", "")

  def permitListing: Seq[Permit] = synchronized(permits.toSeq)

  /** Resolve refs in the to-field to addresses (reference `applyBook`);
    * unknown refs drop out.
    */
  def applyBook(to: String): String = synchronized {
    to.split(",").flatMap { part =>
      if (part.contains("@")) Some(part) else emailBook.get(part)
    }.mkString(",")
  }

  /** Book refs a sender belongs to; own-inbox senders map to `echo`.
    * Entries compare by EQUALITY on the comma-separated addresses —
    * a substring check would let 'ob@gmail.com' (registrable) inherit
    * 'bob@gmail.com''s refs, including admin, and pass isDenied.
    */
  private def findTo(from: String): Seq[String] = synchronized {
    if (inbox.user.nonEmpty && from.startsWith(inbox.user)) Seq("echo")
    else emailBook.collect {
      case (ref, addrs) if addrs.split(",").map(_.trim).contains(from) => ref
    }.toSeq
  }

  /** Reference `isDenied`: admin-class commands deny-by-default unless
    * the sender is an admin; explicit permits override.
    */
  private[alerts] def isDenied(tos: Seq[String], from: String, subject: String): Boolean = {
    var deny = false
    val adminClass = subject.contains("admin") || subject.startsWith("sd") ||
      subject.startsWith("shutdown") || subject.startsWith("sleep") ||
      subject.startsWith("update") || subject.startsWith("retrieve:set")
    if (adminClass) {
      if (tos.contains("admin")) return false
      deny = true
    }
    if (inbox.user.nonEmpty && from.startsWith(inbox.user + "@")) return false
    synchronized(permits.toSeq).foreach { p =>
      val applies =
        if (p.ref.contains("@")) p.ref == from else tos.contains(p.ref)
      if (applies && p.matches(subject)) return p.denies
    }
    deny
  }

  // ---- sending ----

  def retryQueueSize: Int = synchronized(retryQueue.size)
  def spamStatus: String = synchronized(s"Busy at $busy and sendrequests at $sendRequests")

  /** Queue an email for delivery (reference `sendEmail(Email)`):
    * throttled, book-resolved, spaced by the busy count.
    */
  def sendEmail(email: Email): Unit = {
    if (!sendEmails || !email.isValid) return
    val resolved = email.copy(to = applyBook(email.to))
    if (resolved.to.isEmpty) return
    val delay = synchronized {
      sendRequests += 1
      if (busy >= 5) -1L
      else {
        busy += 1
        if (busy == 1)
          scheduler.schedule(runnable(() => clearBusy()), busyWindowMillis,
            TimeUnit.MILLISECONDS)
        (busy - 1) * sendSpacingMillis
      }
    }
    if (delay >= 0)
      scheduler.schedule(runnable(() => deliver(resolved, attempts = 0, retry = false)),
        delay, TimeUnit.MILLISECONDS)
  }

  private def clearBusy(): Unit = synchronized { busy = 0; sendRequests = 0 }

  private def runnable(f: () => Unit): Runnable = () => f()

  /** One delivery attempt plus the reference retry state machine. */
  private def deliver(email: Email, attempts: Int, retry: Boolean): Unit = {
    try {
      val subject = applyMacros(email.subject)
      val (name, bytes, extraSubject, cleanup) = prepareAttachment(email)
      val from = if (email.from.nonEmpty) email.from else outbox.from
      val recipients = email.to.split(",").map(SmtpClient.bareAddress).toSeq
      val msg = SmtpClient.buildMessage(from, recipients, subject + extraSubject,
        email.content, name, bytes)
      transport(outbox, from, recipients, msg)
      cleanup()
      errorCount = 0
      // success flushes the whole retry queue (reference sendEmail catch-else)
      val flush = synchronized {
        if (retryFuture != null) retryFuture.cancel(false)
        val q = retryQueue.toSeq
        retryQueue.clear()
        q
      }
      flush.foreach { case (em, at) =>
        scheduler.execute(runnable(() => deliver(em, at, retry = false)))
      }
    } catch {
      case _: Exception =>
        errorCount += 1
        val at = attempts + 1
        if (!retry) {
          synchronized {
            retryQueue += ((email, at))
            if (retryQueue.size == 1 || retryFuture == null || retryFuture.isDone)
              retryFuture = scheduler.schedule(
                runnable(() => retryHead()), retryFirstMillis, TimeUnit.MILLISECONDS)
          }
        } else {
          synchronized {
            retryQueue += ((email, at))
            if (email.isFresh(maxEmailAgeHours)) {
              val d = math.min(retryBackoffBaseMillis * at, retryBackoffMaxMillis)
              retryFuture = scheduler.schedule(runnable(() => retryHead()), d,
                TimeUnit.MILLISECONDS)
            } else {
              retryQueue.filterInPlace { case (em, _) => em.isFresh(maxEmailAgeHours) }
              if (retryQueue.nonEmpty)
                retryFuture = scheduler.schedule(runnable(() => retryHead()),
                  retryBackoffMaxMillis, TimeUnit.MILLISECONDS)
            }
          }
        }
    }
  }

  private def retryHead(): Unit = {
    val head = synchronized {
      if (retryQueue.isEmpty) None
      else Some(retryQueue.remove(0))
    }
    head.foreach { case (em, at) => deliver(em, at, retry = true) }
  }

  /** `" at."` suffix plus the console-side `{localtime}`/`{utctime}`. */
  private[alerts] def applyMacros(subject: String): String = {
    val hm = DateTimeFormatter.ofPattern("HH:mm")
    var s = subject
    if (s.endsWith(" at."))
      s = s.stripSuffix(" at.") + " at " + LocalDateTime.now().format(hm) + "."
    s = s.replace("{localtime}", LocalDateTime.now().format(hm))
    s.replace("{utctime}", LocalDateTime.now(ZoneOffset.UTC).format(hm))
  }

  /** Apply the reference attachment rules; returns (name, bytes,
    * subjectSuffix, cleanup).
    */
  private def prepareAttachment(email: Email): (String, Array[Byte], String, () => Unit) = {
    if (email.attachment.isEmpty) return ("", Array.emptyByteArray, "", () => ())
    // [HH:mm] style datetime segment in the attachment name
    val resolved = {
      val a = email.attachment.indexOf('[')
      val b = email.attachment.indexOf(']')
      if (a >= 0 && b > a) {
        val fmt = email.attachment.substring(a + 1, b)
        email.attachment.substring(0, a) +
          LocalDateTime.now(ZoneOffset.UTC).format(DateTimeFormatter.ofPattern(fmt)) +
          email.attachment.substring(b + 1)
      } else email.attachment
    }
    val mega = 1024.0 * 1024.0
    val path = Paths.get(resolved)
    if (!Files.exists(path))
      return ("", Array.emptyByteArray, " [attachment not found!]", () => ())
    if (Files.size(path) > zipFromMB * mega) {
      val zipped = SmtpClient.zipFile(path)
      if (Files.size(zipped) > maxSizeMB * mega) {
        Files.deleteIfExists(zipped)
        return ("", Array.emptyByteArray,
          " [ATTACHMENT REMOVED because size constraint!]", () => ())
      }
      val bytes = Files.readAllBytes(zipped)
      (zipped.getFileName.toString, bytes, "", () => {
        Files.deleteIfExists(zipped)
        if (email.deleteOnSend) Files.deleteIfExists(path)
      })
    } else {
      (path.getFileName.toString, Files.readAllBytes(path), "", () => {
        if (email.deleteOnSend) Files.deleteIfExists(path)
      })
    }
  }

  // ---- inbox ----

  def timeSinceLastInboxConnect: Long =
    if (lastInboxConnect < 0) -1 else System.currentTimeMillis() - lastInboxConnect

  /** Start periodic inbox checks (reference `init`). */
  def start(): Unit = synchronized {
    if (checker == null || checker.isDone)
      checker = scheduler.scheduleAtFixedRate(runnable(() => check()),
        checkIntervalSeconds.toLong, checkIntervalSeconds.toLong, TimeUnit.SECONDS)
  }

  def stop(): Unit = synchronized {
    stopped = true
    Seq(checker, fastCheck, slowCheck, retryFuture)
      .foreach(f => if (f != null) f.cancel(false))
  }

  /** One inbox check (reference `Check.run`); returns messages seen, or
    * -1 when the connect failed (a single 60 s retry is then pending).
    */
  def check(): Int = {
    if (stopped) return -1
    val got =
      try {
        val n = fetcher(inbox)(process)
        lastInboxConnect = System.currentTimeMillis()
        n
      } catch {
        case _: Exception =>
          synchronized {
            if (!stopped && (slowCheck == null || slowCheck.isDone))
              slowCheck = scheduler.schedule(runnable(() => check()),
                failedCheckRetryMillis, TimeUnit.MILLISECONDS)
          }
          return -1
      }
    if (maxQuickChecks > 0) synchronized {
      maxQuickChecks -= 1
      if (fastCheck == null || fastCheck.isDone)
        fastCheck = scheduler.schedule(runnable(() => check()),
          math.min(checkIntervalSeconds * 1000L / 3, 30000L), TimeUnit.MILLISECONDS)
    }
    got
  }

  private def process(m: ImapClient.FetchedMessage): ImapClient.Disposition = {
    val from = m.from
    var cmd = m.subject
    val tos = findTo(from)
    if (tos.isEmpty) {
      sendEmail(Email.to(from).subject("My admin doesn't allow me to talk to strangers..."))
      sendEmail(Email.toAdminAbout("Got spam? ").content(s"From: $from $cmd"))
      return ImapClient.Delete
    }
    if (isDenied(tos, from, cmd)) {
      sendEmail(Email.to(from).subject(s"Not allowed to use $cmd")
        .content("Try asking an admin for permission?"))
      sendEmail(Email.toAdminAbout("Permission issue?").content(s"From: $from -> $cmd"))
      return ImapClient.Delete
    }
    // multi-instance routing: "cmd for id1,id2" (reference Check.run) —
    // not addressed to this instance: leave unseen for the right one;
    // addressed here with others remaining: forward a copy minus our id
    // (the original is processed and deleted below).
    if (cmd.contains(" for ")) {
      if (!cmd.contains(outbox.fromStart)) return ImapClient.Unsee
      val newSub = cmd.replaceFirst(",?" + java.util.regex.Pattern.quote(outbox.fromStart), "")
      if (!newSub.endsWith("for "))
        sendEmail(Email.to(m.to).from(from).subject(newSub).content(m.text))
      cmd = cmd.substring(0, cmd.indexOf(" for"))
    }
    synchronized { maxQuickChecks = 5 }
    saveAttachments(m)
    handleContent(cmd, from, m)
    ImapClient.Delete
  }

  private def handleContent(cmd: String, from: String, m: ImapClient.FetchedMessage): Unit = {
    // "label:" is 6 chars, so any non-empty label means length > 6 — a
    // > 7 check sent single-character labels down the command branch
    if (cmd.startsWith("label:") && cmd.length > 6) {
      // the email body is sensor data under the given label — substring,
      // not split(":")(1): dcafs labels are routinely colon-structured
      // (nmea:GGA), and splitting silently truncated at the second colon
      val label = cmd.substring(6)
      m.text.split("\r?\n").takeWhile(_.nonEmpty).foreach(l => onData(label, from, l))
    } else {
      val full =
        if (cmd.startsWith("retrieve:") && !cmd.contains(",")) cmd + "," + from else cmd
      if (full.contains(":")) {
        // buffered reply: collect command output, email it back
        val collector = new BufferCollector(
          timeoutMillis = replyWindowMillis,
          onFinished = (lines, nonEmpty) =>
            if (nonEmpty)
              sendEmail(Email.to(from).subject(s"Buffered response to $full")
                .content(lines.mkString("<br>"))),
          scheduler = scheduler)
        execute(full, line => { collector.addData(line); () })
      } else execute(full, _ => ())
    }
  }

  /** Save attachment parts under [[attachmentsDir]], unzip zips
    * (reference multipart walk in `Check.run`).
    */
  private def saveAttachments(m: ImapClient.FetchedMessage): Unit = {
    val ct = m.contentType
    if (!ct.toLowerCase.startsWith("multipart")) return
    val b = Rfc822.boundary(ct).getOrElse(return)
    m.body.split(java.util.regex.Pattern.quote("--" + b)).drop(1)
      .takeWhile(p => !p.startsWith("--")).foreach { part =>
        val (h, pb) = Rfc822.split(part.dropWhile(c => c == '\n' || c == '\r'))
        val disp = h.getOrElse("content-disposition", "")
        if (disp.toLowerCase.startsWith("attachment")) {
          val rawName = """filename="?([^";]+)"?""".r.findFirstMatchIn(disp)
            .map(_.group(1)).getOrElse("attachment.bin")
          // Basename only: a crafted filename like "../../x" must not
          // escape attachmentsDir (same guard unzipInto applies).
          val name = Option(Paths.get(rawName).getFileName).map(_.toString)
            .filter(n => n.nonEmpty && n != "." && n != "..")
            .getOrElse("attachment.bin")
          val bytes =
            if (h.getOrElse("content-transfer-encoding", "").equalsIgnoreCase("base64"))
              java.util.Base64.getMimeDecoder.decode(pb.trim)
            else pb.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          Files.createDirectories(attachmentsDir)
          val dest = attachmentsDir.resolve(name)
          Files.write(dest, bytes)
          if (name.endsWith(".zip")) {
            unzipInto(dest, attachmentsDir)
            if (deleteReceivedZip) Files.deleteIfExists(dest)
          }
        }
      }
  }

  private def unzipInto(zip: Path, dir: Path): Unit = {
    val zin = new java.util.zip.ZipInputStream(Files.newInputStream(zip))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { entry =>
        val dest = dir.resolve(entry.getName).normalize()
        require(dest.startsWith(dir.normalize()), s"zip entry escapes dir: ${entry.getName}")
        if (!entry.isDirectory) {
          Files.createDirectories(dest.getParent)
          Files.write(dest, zin.readAllBytes())
        }
      }
    } finally zin.close()
  }

  /** Settings listing (reference `getSettings`). */
  def settingsListing: String = {
    val b = Seq.newBuilder[String]
    b += "--Email settings--"
    b += "-Sending-"
    b += s"Server: ${outbox.server}:${outbox.port}"
    b += s"SSL: ${outbox.ssl}"
    b += s"From (send replies): ${outbox.from}"
    b += s"Attachments zip size:$zipFromMB"
    b += s"Maximum attachment size:$maxSizeMB"
    b += ""
    b += "-Receiving-"
    b += s"Inbox: ${inbox.server}:${inbox.port}"
    b += s"User: ${inbox.user}"
    b += s"SSL: ${inbox.ssl}"
    b.result().mkString("\n")
  }
}
