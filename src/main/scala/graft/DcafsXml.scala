package graft

import java.io.StringReader

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import org.xml.sax.InputSource

import scala.collection.mutable.ListBuffer

/** Compatibility reader for dcafs-style `settings.xml` path declarations:
  * parses a `<path>` element into a [[PathSpec]], so existing reference
  * configs can drive the Spark engine directly.
  *
  * Modeled on the reference's own parsing:
  * filter single-rule/`<rule>` forms `FilterForward.java:167-208`,
  * math ops from text content `MathForward.java:98-123`,
  * editor `type` attribute edits `EditorForward.java:191-287`,
  * store typed children `BaseStream.java:107-128`.
  *
  * Supported subset (documented unsupported features raise):
  * filter types start/nostart/end/contain/minlength/maxlength/regex/math;
  * math `iN=expr` ops; editor prepend/append/replace/remove/rexremove/
  * trim/cutstart/cutend; store real/int/text/flag children with index +
  * def.
  */
object DcafsXml {

  /** Hardened XML parser, ONE copy for every entry point (and
    * SettingsFab): the default DocumentBuilderFactory expands DTDs and
    * external entities, so a settings/tasklist file carrying
    * `<!DOCTYPE x [<!ENTITY e SYSTEM "file:///...">]>` could read local
    * files, reach network URLs, or billion-laughs the console JVM —
    * config files arrive over email/telnet ingest paths, so this is a
    * real surface, not a hypothetical. dcafs configs never use DTDs, so
    * disallowing the doctype outright loses nothing.
    */
  private[graft] def newSecureBuilder(): javax.xml.parsers.DocumentBuilder = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder()
  }

  def parsePath(xml: String): PathSpec = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val path = doc.getDocumentElement
    require(path.getTagName == "path", s"expected <path>, got <${path.getTagName}>")
    val id = attr(path, "id").getOrElse("path")
    val delim = attr(path, "delimiter").getOrElse(",")
    val steps = ListBuffer.empty[StepSpec]
    children(path).foreach { el =>
      el.getTagName match {
        case "filter" => steps += parseFilter(el)
        case "math" => steps += parseMath(el)
        case "editor" => steps += parseEditor(el)
        case "store" => steps += parseStore(el)
        case other => throw new IllegalArgumentException(
          s"unsupported path step <$other>")
      }
    }
    PathSpec(id, delim, steps.toSeq)
  }

  private def parseFilter(el: Element): FilterStep = {
    val ruleNodes = children(el).filter(_.getTagName == "rule")
    val rules =
      if (ruleNodes.nonEmpty)
        ruleNodes.map(r => ruleSql(attr(r, "type").getOrElse(""), r.getTextContent))
      else Seq(ruleSql(attr(el, "type").getOrElse(""), el.getTextContent))
    val negate = attr(el, "negate").exists(_.toBoolean)
    FilterStep(if (negate) Seq(s"NOT (${rules.mkString(" AND ")})") else rules)
  }

  private def ruleSql(tpe: String, value: String): String = tpe.toLowerCase match {
    case "start" => s"startswith(line, ${lit(value)})"
    case "nostart" => s"NOT startswith(line, ${lit(value)})"
    case "end" => s"endswith(line, ${lit(value)})"
    case "contain" => s"contains(line, ${lit(value)})"
    case "minlength" => s"length(line) >= ${value.trim.toInt}"
    case "maxlength" => s"length(line) <= ${value.trim.toInt}"
    // non-capturing group: bare ^a|b$ would match prefix-a OR suffix-b,
    // not the whole-line match FilterForward.matches() performs (same
    // fix as FilterRules.regex)
    case "regex" => s"line RLIKE ${lit("^(?:" + value + ")\\z")}"
    case "math" => value // MathDsl handles iN refs and word comparisons
    case other => throw new IllegalArgumentException(s"unsupported filter type '$other'")
  }

  private def parseMath(el: Element): MathStep = {
    // <def ref="name">value</def> named constants (MathForward.java:131-132)
    val defs = children(el).filter(_.getTagName == "def")
      .map(d => attr(d, "ref").getOrElse("") -> d.getTextContent.trim)
      .filter(_._1.nonEmpty)
    val opNodes = children(el).filter(_.getTagName == "op")
    val texts = if (opNodes.nonEmpty) opNodes.map(_.getTextContent)
      else Seq(el.getTextContent)
    def substitute(t: String): String =
      defs.foldLeft(t) { case (acc, (name, value)) =>
        acc.replaceAll(raw"\b" + java.util.regex.Pattern.quote(name) + raw"\b",
          s"($value)")
      }
    MathStep(texts.filter(_.trim.nonEmpty).map(t => parseOp(substitute(t))),
      suffix = attr(el, "suffix").getOrElse(""))
  }

  /** dcafs op forms (MathForward.java:345-369): plain `iN=expr`, compound
    * `iN+=expr` / `-=` / `*=` / `/=`, and `iN++` / `iN--`.
    */
  private[graft] def parseOp(t: String): (Int, String) = {
    val s = t.trim
    val incdec = raw"i(\d+)\s*(\+\+|--)".r
    val compound = raw"i(\d+)\s*([+\-*/])=\s*(.+)".r
    val plain = raw"i(\d+)\s*=\s*(.+)".r
    s match {
      case incdec(n, op) => n.toInt -> s"i$n ${op.head} 1"
      case compound(n, op, e) => n.toInt -> s"i$n $op ($e)"
      case plain(n, e) => n.toInt -> e.trim
      case _ => throw new IllegalArgumentException(
        s"math op must look like iN=expression, got '$t'")
    }
  }

  private def parseEditor(el: Element): EditStep = {
    val editNodes = children(el).filter(e =>
      e.getTagName == "edit" || e.getTagName == "editor")
    val nodes = if (editNodes.nonEmpty) editNodes else Seq(el)
    EditStep(nodes.map { e =>
      val content = e.getTextContent
      attr(e, "type").getOrElse("").toLowerCase match {
        case "prepend" => s"concat(${lit(content)}, line)"
        case "append" => s"concat(line, ${lit(content)})"
        case "replace" =>
          s"replace(line, ${lit(attr(e, "find").getOrElse(""))}, ${lit(content)})"
        case "remove" => s"replace(line, ${lit(content)}, '')"
        case "rexremove" => s"regexp_replace(line, ${lit(content)}, '')"
        case "trim" => "trim(line)"
        case "cutstart" => s"substring(line, ${content.trim.toInt + 1}, 1000000)"
        case "cutend" =>
          s"substr(line, 1, greatest(length(line) - ${content.trim.toInt}, 0))"
        case other => throw new IllegalArgumentException(
          s"unsupported editor type '$other'")
      }
    })
  }

  private def parseStore(el: Element): StoreStep = {
    var autoIdx = -1
    StoreStep(children(el).flatMap { v =>
      autoIdx += 1
      val idx = attr(v, "index").orElse(attr(v, "i")).map(_.toInt).getOrElse(autoIdx)
      val name = Option(v.getTextContent).map(_.trim).filter(_.nonEmpty)
        .orElse(attr(v, "name"))
        .getOrElse(s"col$idx")
      v.getTagName match {
        case "real" => Some((name, idx, "double",
          attr(v, "def").map(lit).getOrElse("'NaN'")))
        case "int" => Some((name, idx, "bigint",
          attr(v, "def").map(lit).getOrElse(Int.MaxValue.toString)))
        case "text" => Some((name, idx, "string",
          lit(attr(v, "def").getOrElse(""))))
        case "flag" | "bool" => Some((name, idx, "boolean",
          attr(v, "def").map(lit).getOrElse("false")))
        case "ignore" => None
        case other => throw new IllegalArgumentException(
          s"unsupported store val <$other>")
      }
    })
  }

  /** One parsed `<stream>` declaration (BaseStream.java:23-58 config +
    * trigger cmds `:130-141`). `hello` is the write sent on every
    * (re)connect (triggers open/hello/wakeup collapse to it — the
    * source-side behaviors); `idleCmd` is surfaced for the engine's alert
    * runtime (RtVals.idleAlerts) to dispatch.
    */
  final case class StreamSpec(
      id: String, kind: String, host: String, port: Int,
      label: String, eol: String, ttlMillis: Long,
      hello: Option[String], idleCmd: Option[String], topic: Option[String])

  /** Parse a dcafs `<streams>` block (settings.xml) into [[StreamSpec]]s.
    * Supported kinds: tcp, udp, mqtt (serial/I2C are hardware-gated —
    * replay their recorded captures via `LineSources.modbusReplay`).
    */
  def parseStreams(xml: String): Seq[StreamSpec] = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    require(root.getTagName == "streams", s"expected <streams>, got <${root.getTagName}>")
    children(root).filter(_.getTagName == "stream").map { el =>
      val id = attr(el, "id").getOrElse("stream")
      val kind = attr(el, "type").getOrElse("tcp").toLowerCase
      val kids = children(el)
      def kid(tag: String): Option[String] =
        kids.find(_.getTagName == tag).map(_.getTextContent.trim)
      // a portless modbus <address> defaults to 502, like the reference's
      // ModbusTCPStream.readExtraFromXML (ModbusTCPStream.java:38-40)
      val defaultPort = if (kind == "modbus" || kind == "modbustcp") 502 else 0
      val (host, port) = kid("address") match {
        case Some(a) if a.contains(":") =>
          val i = a.lastIndexOf(':')
          (a.substring(0, i), a.substring(i + 1).toInt)
        case Some(a) => (a, kid("port").map(_.toInt).getOrElse(defaultPort))
        case None => ("", kid("port").map(_.toInt).getOrElse(defaultPort))
      }
      val cmds = kids.filter(k => k.getTagName == "cmd" || k.getTagName == "write")
        .map { c =>
          val when = attr(c, "when").orElse(attr(c, "trigger"))
            .getOrElse(if (c.getTagName == "write") "hello" else "open")
          (when.toLowerCase, c.getTextContent.trim)
        }
      StreamSpec(
        id, kind, host, port,
        label = kid("label").getOrElse(""),
        eol = kid("eol").getOrElse("crlf"),
        ttlMillis = kid("ttl").map(parsePeriodMillis).getOrElse(-1L),
        // connect-time commands only: "asleep" is the reference's
        // IDLE-time trigger (BaseStream flagIdle), not a hello — folding
        // it in sent the low-power command on every (re)connect and,
        // worse, could SHADOW the real open/hello command (collectFirst
        // keeps only one)
        hello = cmds.collectFirst {
          case (w, c) if Set("open", "hello", "wakeup", "welcome")(w) => c
        },
        idleCmd = cmds.collectFirst { case ("idle", c) => c },
        topic = kid("topic"))
    }
  }

  /** A whole parsed settings document: the declared ingest plane plus the
    * transform paths.
    */
  final case class Settings(streams: Seq[StreamSpec], paths: Seq[PathSpec])

  /** Parse a full dcafs `settings.xml` document (`<das>` root, or any
    * root): `<streams>` -> [[StreamSpec]]s (ForwardPool/StreamManager
    * read the same blocks), `<paths><path>` children and bare `<path>`
    * elements -> [[PathSpec]]s. A reference deployment's config drives
    * the Spark engine with no rewriting.
    */
  def parseSettings(xml: String): Settings = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    def elementToString(el: Element): String = {
      val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
      tf.setOutputProperty(javax.xml.transform.OutputKeys.OMIT_XML_DECLARATION, "yes")
      val out = new java.io.StringWriter()
      tf.transform(new javax.xml.transform.dom.DOMSource(el),
        new javax.xml.transform.stream.StreamResult(out))
      out.toString
    }
    val streams = children(root).filter(_.getTagName == "streams")
      .flatMap(s => parseStreams(elementToString(s)))
    // <monitor><file id=".." path=".."/></monitor>: live-file tails
    // (reference FileMonitor.java:38-58, wired DAS.java:206-208) become
    // kind="monitor" StreamSpecs; fromSpec maps them to FileTailSource
    val monitors = children(root).filter(_.getTagName == "monitor")
      .flatMap(children(_)).filter(_.getTagName == "file")
      .zipWithIndex.map { case (el, i) =>
        val id = attr(el, "id").getOrElse(s"fm$i")
        StreamSpec(id, "monitor",
          host = attr(el, "path").getOrElse(""), port = 0,
          label = attr(el, "label").getOrElse(id), eol = "lf",
          ttlMillis = -1L, hello = None, idleCmd = None, topic = None)
      }
    val paths =
      children(root).filter(_.getTagName == "path") ++
        children(root).filter(_.getTagName == "paths").flatMap(children(_))
          .filter(_.getTagName == "path")
    Settings(streams ++ monitors, paths.map(p => parsePath(elementToString(p))))
  }

  // ---- Tasklist (TaskManager) scripts ----

  /** One parsed `<task>` (`/root/reference/src/util/task/Task.java:23-90`):
    * trigger, output target, value/command, optional `req` guard
    * expression (kept as text — the engine compiles it onto the same
    * guard surface RuleEngine evaluates).
    */
  final case class TaskSpec(id: String,
      trigger: Option[graft.streaming.TaskTrigger],
      output: String, value: String, req: Option[String])

  /** A `<taskset>`: run mode oneshot (all at once) or step (sequential,
    * stop on first failing guard) — TaskManager.java:172-190.
    */
  final case class TaskSetSpec(id: String, name: String, run: String,
      repeat: Int, tasks: Seq[TaskSpec])

  final case class Tasklist(tasks: Seq[TaskSpec], sets: Seq[TaskSetSpec])

  /** Parse a reference tasklist script — `<tasklist>` holding `<tasks>`
    * and `<tasksets>` (DAS Core manual, "Creating a script";
    * `TaskManager.java:1-200`) — onto the engine's TaskTrigger algebra.
    */
  def parseTasks(xml: String): Tasklist = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    require(root.getTagName == "tasklist",
      s"expected <tasklist>, got <${root.getTagName}>")
    def toTask(el: Element, defaultId: String): TaskSpec = TaskSpec(
      id = attr(el, "id").getOrElse(defaultId),
      trigger = attr(el, "trigger").map(parseTrigger),
      output = attr(el, "output").getOrElse("system"),
      value = Option(el.getTextContent).map(_.trim).getOrElse(""),
      req = attr(el, "req"))
    val singles = children(root).filter(_.getTagName == "tasks")
      .flatMap(children(_)).filter(_.getTagName == "task")
      .zipWithIndex.map { case (t, i) => toTask(t, s"task$i") }
    val sets = children(root).filter(_.getTagName == "tasksets")
      .flatMap(children(_)).filter(_.getTagName == "taskset")
      .map { s =>
        val id = attr(s, "id").getOrElse("set")
        TaskSetSpec(id,
          attr(s, "name").getOrElse(id),
          attr(s, "run").getOrElse("oneshot").toLowerCase,
          attr(s, "repeat").map(_.toInt).getOrElse(1),
          children(s).filter(_.getTagName == "task").zipWithIndex
            .map { case (t, i) => toTask(t, s"$id#$i") })
      }
    Tasklist(singles, sets)
  }

  private val dayAbbrev: Map[String, java.time.DayOfWeek] = Map(
    "mo" -> java.time.DayOfWeek.MONDAY, "tu" -> java.time.DayOfWeek.TUESDAY,
    "we" -> java.time.DayOfWeek.WEDNESDAY, "th" -> java.time.DayOfWeek.THURSDAY,
    "fr" -> java.time.DayOfWeek.FRIDAY, "sa" -> java.time.DayOfWeek.SATURDAY,
    "su" -> java.time.DayOfWeek.SUNDAY)

  /** Trigger attribute grammar (manual "Short summary of the attributes",
    * `Task.java:62-81` TRIGGERTYPE): `interval:10s[,5s]` (default initial
    * delay = interval), `delay:2m10s`, `time:HH:mm[,days]` (UTC) /
    * `localtime:HH:mm[,days]`, `retry:10s,5` / `waitfor:10s,5` (poll the
    * req until it holds), `while:10s,5` (run while the req holds),
    * `keyword:word`.
    */
  def parseTrigger(s: String): graft.streaming.TaskTrigger = {
    import graft.streaming._
    val (kind, rest) = s.span(_ != ':')
    val a = rest.stripPrefix(":").trim
    def parts = a.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    kind.trim.toLowerCase match {
      case "interval" =>
        val p = parts
        val period = parsePeriodMillis(p.head)
        Interval(period, if (p.length > 1) parsePeriodMillis(p(1)) else period)
      case "delay" => Delay(parsePeriodMillis(a))
      case "time" | "utctime" | "localtime" =>
        val p = parts
        val t = java.time.LocalTime.parse(
          if (p.head.length == 4) "0" + p.head else p.head)
        Clock(t,
          p.drop(1).flatMap(d => dayAbbrev.get(d.toLowerCase.take(2))).toSet,
          utc = kind.trim.toLowerCase != "localtime")
      case "retry" | "waitfor" =>
        val p = parts
        WaitFor(parsePeriodMillis(p.head),
          if (p.length > 1) p(1).toInt else Int.MaxValue)
      case "while" =>
        val p = parts
        While(parsePeriodMillis(p.head),
          if (p.length > 1) p(1).toInt else Int.MaxValue)
      case "keyword" => Keyword(a)
      case other => throw new IllegalArgumentException(
        s"unsupported trigger '$other'")
    }
  }

  /** dcafs period literal ("5s", "3m20s", "1h", "-1") to millis
    * (TimeTools.parsePeriodStringToSeconds semantics, subset).
    */
  def parsePeriodMillis(p: String): Long = {
    val t = p.trim
    if (t == "-1" || t.isEmpty) -1L
    else {
      val re = "(\\d+)\\s*(ms|h|m|s|d)".r
      val parts = re.findAllMatchIn(t.toLowerCase).map { m =>
        val n = m.group(1).toLong
        m.group(2) match {
          case "ms" => n
          case "s" => n * 1000L
          case "m" => n * 60000L
          case "h" => n * 3600000L
          case "d" => n * 86400000L
        }
      }.toSeq
      if (parts.isEmpty) t.toLong * 1000L else parts.sum
    }
  }

  // ---- Email settings (reference EmailWorker.readFromXML) ----

  /** Parsed `<email>` settings node
    * (`/root/reference/src/io/email/EmailWorker.java:154-200`).
    */
  final case class EmailCfg(
      outbox: graft.alerts.MailboxCfg,
      inbox: graft.alerts.MailboxCfg,
      checkIntervalSeconds: Int,
      allowedDomain: String,
      zipFromMB: Double,
      maxSizeMB: Double,
      deleteRecZip: Boolean,
      book: Seq[(String, String)],
      permits: Seq[graft.alerts.Permit])

  /** Parse an `<email>` element (bare, or nested under
    * `dcafs/settings`): outbox/inbox server nodes with port/user/pass/ssl
    * attributes, the emailbook `<entry ref=..>` rows, and allow/deny
    * permits.
    */
  /** Parse the `<telnet port=".." title="..">` settings node (reference
    * `TelnetServer.readSettingsFromXML`, `TelnetServer.java:61-69`;
    * defaults port 23 / title "DCAFS" — here 2323/"graft" so an unprivileged
    * process can bind). Digs `dcafs/telnet` or `dcafs/settings/telnet`.
    */
  def parseTelnet(xml: String): Option[(Int, String)] = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    def find(el: Element, tag: String): Option[Element] =
      children(el).find(_.getTagName == tag)
    val el =
      if (root.getTagName == "telnet") Some(root)
      else find(root, "telnet")
        .orElse(find(root, "settings").flatMap(find(_, "telnet")))
    el.map { t =>
      (attr(t, "port").map(_.toInt).getOrElse(2323),
        attr(t, "title").getOrElse("graft"))
    }
  }

  def parseEmail(xml: String): Option[EmailCfg] = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    val emailEl =
      if (root.getTagName == "email") Some(root)
      else { // dig dcafs/settings/email or settings/email or direct child
        def find(el: Element, tag: String): Option[Element] =
          children(el).find(_.getTagName == tag)
        find(root, "email")
          .orElse(find(root, "settings").flatMap(find(_, "email")))
      }
    emailEl.map { el =>
      def boolOf(s: String) = Set("yes", "true", "1")(s.trim.toLowerCase)
      def mailbox(tag: String, defaultFrom: String): (graft.alerts.MailboxCfg, Seq[Element]) =
        children(el).find(_.getTagName == tag) match {
          case Some(box) =>
            val kids = children(box)
            val server = kids.find(_.getTagName == "server")
            val cfg = graft.alerts.MailboxCfg(
              server = server.map(_.getTextContent.trim).getOrElse(""),
              port = server.flatMap(attr(_, "port")).map(_.toInt).getOrElse(25),
              user = server.flatMap(attr(_, "user")).getOrElse(""),
              pass = server.flatMap(attr(_, "pass")).getOrElse(""),
              ssl = server.flatMap(attr(_, "ssl")).exists(boolOf),
              from = kids.find(_.getTagName == "from")
                .map(_.getTextContent.trim).getOrElse(defaultFrom))
            (cfg, kids)
          case None => (graft.alerts.MailboxCfg(from = defaultFrom), Seq.empty)
        }
      def kidText(kids: Seq[Element], tag: String): Option[String] =
        kids.find(_.getTagName == tag).map(_.getTextContent.trim)
      val (outbox, outKids) = mailbox("outbox", "graft@email.com")
      val (inbox, inKids) = mailbox("inbox", "")
      val book = children(el).filter(_.getTagName == "book")
        .flatMap(children(_)).filter(_.getTagName == "entry")
        .flatMap(e => attr(e, "ref").map(_ -> e.getTextContent.trim))
      val permits = children(el).filter(_.getTagName == "permits")
        .flatMap(children(_)).flatMap { p =>
          val denies = p.getTagName == "deny" || p.getTagName == "denies"
          val allow = p.getTagName == "allow"
          if (!denies && !allow) None
          else attr(p, "ref").map(r => graft.alerts.Permit(denies, r,
            p.getTextContent.trim, attr(p, "regex").exists(boolOf)))
        }
      EmailCfg(
        outbox = outbox,
        inbox = inbox,
        checkIntervalSeconds =
          (parsePeriodMillis(kidText(inKids, "checkinterval").getOrElse("5m")) / 1000L).toInt,
        allowedDomain = kidText(inKids, "allowed").getOrElse(""),
        zipFromMB = kidText(outKids, "zip_from_size_mb").map(_.toDouble).getOrElse(10.0),
        maxSizeMB = kidText(outKids, "max_size_mb").map(_.toDouble).getOrElse(15.0),
        deleteRecZip = kidText(outKids, "delete_rec_zip").forall(boolOf),
        book = book,
        permits = permits)
    }
  }

  /** `<taskmanager id="x">path/to/script.xml</taskmanager>` references
    * anywhere in a settings document (reference
    * `TaskManagerPool.readFromXML`,
    * `/root/reference/src/util/task/TaskManagerPool.java:47-60`);
    * relative paths resolve against the settings file's directory at the
    * caller.
    */
  def parseTaskManagerRefs(xml: String): Seq[(String, String)] = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val found = ListBuffer.empty[(String, String)]
    def walk(el: Element): Unit = {
      if (el.getTagName == "taskmanager")
        found += ((attr(el, "id").getOrElse("tm" + found.size), el.getTextContent.trim))
      children(el).foreach(walk)
    }
    walk(doc.getDocumentElement)
    found.toSeq
  }

  /** Parse a `<matrix>` node (reference `MatrixClient.readFromXML`,
    * `/root/reference/src/io/matrix/MatrixClient.java:92-127`): user/pass
    * attributes, optional `<server>`, `<macro id=..>` children and
    * `<room id=..>` children with url/entering/leaving/greet.
    */
  def parseMatrix(xml: String): Option[graft.alerts.MatrixCfg] = {
    val doc = newSecureBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    val el =
      if (root.getTagName == "matrix") Some(root)
      else children(root).find(_.getTagName == "matrix")
        .orElse(children(root).find(_.getTagName == "settings")
          .flatMap(s => children(s).find(_.getTagName == "matrix")))
    el.flatMap { m =>
      attr(m, "user").filter(u => u.startsWith("@") && u.contains(":")).map { user =>
        def kid(e: Element, tag: String): String =
          children(e).find(_.getTagName == tag).map(_.getTextContent.trim).getOrElse("")
        val server = kid(m, "server") match {
          case "" => ""
          case s if s.startsWith("http") => s
          case s => "http://" + s
        }
        graft.alerts.MatrixCfg(
          user = user,
          pass = attr(m, "pass").getOrElse(""),
          server = server,
          rooms = children(m).filter(_.getTagName == "room").map { r =>
            graft.alerts.RoomSetup(
              id = attr(r, "id").getOrElse("room"),
              url = kid(r, "url"),
              entering = kid(r, "entering"),
              leaving = kid(r, "leaving"),
              greet = kid(r, "greet"))
          },
          macros = children(m).filter(_.getTagName == "macro")
            .flatMap(mc => attr(mc, "id").map(_ -> mc.getTextContent.trim)).toMap)
      }
    }
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def attr(el: Element, name: String): Option[String] = {
    val v = el.getAttribute(name)
    if (v == null || v.isEmpty) None else Some(v)
  }

  private def children(el: Element): Seq[Element] = {
    val nodes = el.getChildNodes
    (0 until nodes.getLength).map(nodes.item)
      .collect { case e: Element => e }
  }
}
