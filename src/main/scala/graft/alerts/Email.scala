package graft.alerts

/** An outgoing email (reference `/root/reference/src/io/email/Email.java:1-134`):
  * destination may be raw addresses or email-book refs (resolved by
  * [[EmailWorker.applyBook]]), content is sent as text/html, the optional
  * attachment path may embed a `[datetime-format]` segment that is
  * substituted at send time.
  */
final case class Email(
    to: String,
    subject: String = "",
    content: String = "",
    attachment: String = "",
    from: String = "",
    deleteOnSend: Boolean = false,
    createdMillis: Long = System.currentTimeMillis()) {

  def subject(s: String): Email = copy(subject = s)
  def content(c: String): Email = copy(content = c)
  def attachment(a: String): Email = copy(attachment = a)
  def from(f: String): Email = copy(from = f)

  def isValid: Boolean = to.nonEmpty

  /** Younger than `maxAgeHours` (reference `Email.isFresh`); -1 = always. */
  def isFresh(maxAgeHours: Int): Boolean =
    maxAgeHours < 0 ||
      System.currentTimeMillis() - createdMillis < maxAgeHours * 3600L * 1000L
}

object Email {
  def to(to: String): Email = Email(to)
  /** Shorthand used all over the reference for alert delivery. */
  def toAdminAbout(subject: String): Email = Email("admin", subject)
}

/** SMTP/IMAP endpoint settings (reference `EmailWorker.MailBox`). */
final case class MailboxCfg(
    server: String = "",
    port: Int = 25,
    user: String = "",
    pass: String = "",
    ssl: Boolean = false,
    from: String = "graft@email.com") {
  /** The local part of the from address — the instance id used by the
    * multi-instance " for " routing (reference `MailBox.getFromStart`).
    */
  def fromStart: String = from.takeWhile(_ != '@')
}

/** One permit row (reference `EmailWorker.Permit`): `ref` is either a
  * book ref or a literal address; `value` matches the subject (equals or
  * regex).
  */
final case class Permit(denies: Boolean, ref: String, value: String, regex: Boolean) {
  def matches(subject: String): Boolean =
    if (regex) subject.matches(value) else subject == value
}
