package graft.streaming

import java.util.concurrent.{Executors, ScheduledExecutorService, ScheduledFuture, TimeUnit}

import scala.concurrent.{Future, Promise}

/** Shared daemon scheduler for collector timeouts: collectors are created
  * per exchange (one ConfirmCollector per send-await conversation, one
  * BufferCollector per handover), so giving each its own executor thread
  * would leak a thread per instance.
  *
  * CONTRACT for callbacks running on this thread (BufferCollector's
  * onFinished, ConfirmCollector's retry send): they must not block — one
  * blocking callback stalls every collector timeout and retry
  * process-wide (single thread by design; round-13 review made the
  * implicit contract explicit). Callbacks that may block (a write to a
  * possibly-hung sink) must hand off to their own executor.
  */
object CollectorScheduler {
  lazy val shared: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-collector-scheduler")
      t.setDaemon(true)
      t
    })
}

/** K10 confirm collector (reference
  * `/root/reference/src/io/collector/ConfirmCollector.java:10-60`): send a
  * command to a device and await a specific reply, retrying up to
  * `maxAttempts` every `timeoutSeconds`, reporting success/failure as a
  * Future per confirm. Confirms are a FIFO queue: the next message is only
  * sent after the previous reply arrived. `**` in the expected reply is
  * replaced by the message (reference `addConfirm`), matching is
  * case-insensitive, and an empty expected reply succeeds immediately
  * after the send (fire-and-forget).
  *
  * Control-plane by nature: wire `send` to a stream's write side (e.g.
  * the K9 socket writer) and feed received lines to [[onReply]] from the
  * stream's read side.
  */
class ConfirmCollector(
    send: String => Unit,
    maxAttempts: Int = 5,
    timeoutSeconds: Int = 3,
    scheduler: ScheduledExecutorService = CollectorScheduler.shared) {

  private case class Confirm(msg: String, reply: String, done: Promise[Boolean],
      var attempts: Int = 0)

  private val queue = new java.util.ArrayDeque[Confirm]()
  private var retryFuture: ScheduledFuture[_] = null

  /** Queue a message; returns a Future completing true when the expected
    * reply arrives, false after all attempts time out.
    */
  def addConfirm(message: String, expectedReply: String): Future[Boolean] =
    synchronized {
      val c = Confirm(message, expectedReply.replace("**", message), Promise[Boolean]())
      queue.addLast(c)
      if (queue.size == 1) attempt(c)
      c.done.future
    }

  private def attempt(c: Confirm): Unit = {
    c.attempts += 1
    // a throwing send (the NORMAL failure for the socket writers this
    // class wraps — dead TCP peer, closed serial port) must count as a
    // failed attempt with the retry chain kept alive: pre-fix the
    // exception escaped before the retry was scheduled (or was swallowed
    // by the executor on a retry tick), leaving the head confirm wedged
    // with no timer and every later confirm queued behind it forever
    // (round-13 review)
    val sent =
      try { send(c.msg); true } catch { case _: Exception => false }
    if (sent && c.reply.isEmpty) { // fire-and-forget confirm
      c.done.trySuccess(true)
      advance()
    } else if (!sent && c.attempts >= maxAttempts) {
      c.done.trySuccess(false)
      advance()
    } else {
      retryFuture = scheduler.schedule(new Runnable {
        override def run(): Unit = ConfirmCollector.this.synchronized {
          if (!queue.isEmpty && (queue.peekFirst() eq c)) {
            if (c.attempts >= maxAttempts) {
              c.done.trySuccess(false)
              advance()
            } else attempt(c)
          }
        }
      }, timeoutSeconds.toLong, TimeUnit.SECONDS)
    }
  }

  private def advance(): Unit = {
    queue.pollFirst()
    if (retryFuture != null) retryFuture.cancel(false)
    if (!queue.isEmpty) attempt(queue.peekFirst())
  }

  /** Feed a received line; matches against the head confirm. */
  def onReply(reply: String): Unit = synchronized {
    val head = queue.peekFirst()
    if (head != null && head.reply.nonEmpty && reply.equalsIgnoreCase(head.reply)) {
      head.done.trySuccess(true)
      advance()
    }
  }

  def pending: Int = synchronized(queue.size)
}

/** K11 buffer collector (reference `BufferCollector.java:9-50`): collect
  * lines until `bufferSize` is exceeded or `timeoutMillis` elapses, then
  * hand the batch to `onFinished(lines, nonEmpty)` exactly once. The
  * streaming-query twin of this shape is a tumbling window +
  * collect_list (oracle `w_tumbling`); this is the control-plane
  * endpoint used for command replies.
  */
class BufferCollector(
    bufferSize: Int = -1,
    timeoutMillis: Long = -1L,
    onFinished: (Seq[String], Boolean) => Unit,
    scheduler: ScheduledExecutorService = CollectorScheduler.shared) {

  // with BOTH bounds left unset nothing can ever finish: addData returns
  // true forever, the buffer grows until OOM, and onFinished is never
  // called — refuse the configuration instead of silently never meeting
  // the hand-the-batch-exactly-once contract (round-13 review)
  require(bufferSize > 0 || timeoutMillis > 0,
    "BufferCollector: at least one of bufferSize/timeoutMillis must be set" +
    " — with neither, the collector never finishes and grows unbounded")

  private val buffer = scala.collection.mutable.ArrayBuffer.empty[String]
  @volatile private var finished = false
  private val timeoutFuture: ScheduledFuture[_] =
    if (timeoutMillis > 0)
      scheduler.schedule(new Runnable {
        override def run(): Unit = finish()
      }, timeoutMillis, TimeUnit.MILLISECONDS)
    else null

  /** Returns false once the collector has finished (detach it then). */
  def addData(line: String): Boolean = synchronized {
    if (finished) false
    else {
      buffer += line
      if (bufferSize != -1 && buffer.size > bufferSize) finish()
      !finished
    }
  }

  private def finish(): Unit = synchronized {
    if (!finished) {
      finished = true
      if (timeoutFuture != null) timeoutFuture.cancel(false)
      onFinished(buffer.toSeq, buffer.nonEmpty)
    }
  }

  def collected: Seq[String] = synchronized(buffer.toSeq)
}
