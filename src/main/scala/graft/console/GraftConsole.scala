package graft.console

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{DcafsXml, PathCompiler, PathSpec}
import graft.streaming.TasklistRunner

/** The reference's telnet command surface (SURVEY.md §2.10, §3.2) mapped
  * onto Spark SQL: listings become queries over registered temp views,
  * subscriptions become streaming sinks, and anything not covered by a
  * dcafs-style shorthand is passed through to `spark.sql` directly —
  * the rtvals listing (`RealtimeValues.java:869-942`) was the closest
  * thing dcafs had to a SELECT; here the user gets the whole SQL surface.
  *
  * Commands:
  *   help                 this text
  *   ss                   list registered streams/tables (StreamManager listing)
  *   st                   engine status: active streaming queries
  *   rv | rtvals          current rtvals snapshot (requires an rtvals view)
  *   raw:<name>[,N]       sample N (default 10) rows of a registered source
  *   pf:list              declared paths
  *   pf:add,<id>          register an (empty) path spec by id
  *   pf:test,<id>,<line>  probe one line through a declared path
  *   settings:load,<file> load a dcafs settings.xml (streams + paths)
  *   streams              list loaded stream declarations
  *   dbm:...              database manager (DatabaseManager.java surface):
  *                        add,<id>,<jdbcUrl> | status | tables,<id> |
  *                        fetch,<id>,<sql> | store,<id>,<view>,<table>
  *   tm:...               task managers (TaskManagerPool/CommandPool tm):
  *                        load,<id>,<file> | managers | <id>,listtasks |
  *                        <id>,listsets | <id>,run,<set> | <id>,stop
  *   <anything else>      executed as Spark SQL
  */
class GraftConsole(spark: SparkSession) {

  private val paths = mutable.LinkedHashMap.empty[String, PathSpec]
  private val streamSpecs = mutable.LinkedHashMap.empty[String, DcafsXml.StreamSpec]
  /** The settings.xml behind `settings:load` — command-plane mutations
    * (`ss:add*`, `pf:add`) write back through it so they survive restart,
    * like reference `CommandPool` persisting via `XMLfab`
    * (`StreamManager.java:507-523`). None until a settings file is loaded;
    * mutations then apply in-memory only, and say so.
    */
  private var settingsFile: Option[java.nio.file.Path] = None
  private val dbs = mutable.LinkedHashMap.empty[String, String]
  private val taskManagers = mutable.LinkedHashMap.empty[String, TasklistRunner]
  /** (taskId, output, value) sends from task managers whose output is not
    * `system` (those re-enter [[execute]]) — the test/driver drain.
    */
  val taskSends = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, String)]()

  def addPath(spec: PathSpec): Unit = paths(spec.id) = spec

  def streamSpec(id: String): Option[DcafsXml.StreamSpec] = streamSpecs.get(id)

  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Attach a path to a registered source view, materializing the result
    * as a new view `<pathId>_out` (the pull-subscription analog).
    */
  def attach(pathId: String, sourceView: String): Unit = {
    val out = PathCompiler.compile(paths(pathId), spark.table(sourceView))
    out.createOrReplaceTempView(s"${pathId}_out")
  }

  /** Serialized: execute is called concurrently from telnet session
    * threads, the email inbox scheduler, Matrix sync threads and task
    * managers, and it mutates the plain LinkedHashMaps above
    * (settings:load writing streamSpecs while another session iterates
    * `streams` would throw ConcurrentModificationException or corrupt
    * the table; concurrent SettingsFab read-modify-writes would lose a
    * writer). Console command rates are human-scale — a coarse monitor
    * is the right tool. synchronized is re-entrant, so task dispatches
    * that re-enter execute on the same thread still work.
    */
  def execute(cmd: String): String = synchronized { executeImpl(cmd) }

  private def executeImpl(cmd: String): String = cmd.trim match {
    case "" => ""
    case "help" =>
      "commands: help | ss | ss:addtcp/addudp/addmodbus/remove | st | rv | " +
        "raw:<name>[,N] | pf:list | pf:add,<id> | " +
        "pf:test,<id>,<line> | board:list | board:<query>[,<sfDir>[,N]] | " +
        "dbm:... | tm:... | <sql>"
    // analytics-board surface: every registered SparkEntry query is a
    // console command — the ops face of the whole library (run a dedup
    // funnel or a dataset card from the telnet prompt).
    case "board:list" =>
      graft.SparkEntry.queries.keys.toSeq.sorted.mkString("\n")
    case c if c.startsWith("board:") =>
      val parts = c.stripPrefix("board:").split(",").map(_.trim)
      val name = parts(0)
      val dir = if (parts.length > 1 && parts(1).nonEmpty) parts(1)
        else "/root/testdata/sf0.001"
      val n = if (parts.length > 2) parts(2).toInt else 20
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) => render(fn(spark, dir).limit(n))
        case None => s"unknown board query '$name' (board:list shows all)"
      }
    case "ss" =>
      val names = spark.catalog.listTables().collect().map(_.name)
      if (names.isEmpty) "no registered streams" else names.mkString("\n")
    case "st" =>
      val qs = spark.streams.active
      if (qs.isEmpty) "no active streaming queries"
      else qs.map(q => s"${Option(q.name).getOrElse(q.id)}\t${q.status.message}")
        .mkString("\n")
    case "rv" | "rtvals" => render(spark.sql("SELECT * FROM rtvals"))
    case c if c.startsWith("raw:") =>
      val parts = c.stripPrefix("raw:").split(",")
      val n = if (parts.length > 1) parts(1).trim.toInt else 10
      render(spark.table(parts(0).trim).limit(n))
    case "pf:list" =>
      if (paths.isEmpty) "no paths"
      else paths.values.map(p => s"${p.id}: ${p.steps.size} steps").mkString("\n")
    case c if c.startsWith("pf:add,") =>
      val id = c.stripPrefix("pf:add,").trim
      addPath(PathSpec(id))
      settingsFile match {
        case Some(f) =>
          SettingsFab.upsertPath(f, id, ",")
          s"path $id added (persisted to ${f.getFileName})"
        case None => s"path $id added (in-memory only — settings:load a file to persist)"
      }
    // single-line probe through a path (EditorForward.java:589-596 test())
    case c if c.startsWith("pf:test,") =>
      val rest = c.stripPrefix("pf:test,")
      val (id, line) = rest.span(_ != ',')
      import spark.implicits._
      val in = Seq(line.stripPrefix(",")).toDF("line")
      render(PathCompiler.compile(paths(id), in))
    case c if c.startsWith("ss:") => ssCmd(c.stripPrefix("ss:"))
    case c if c.startsWith("settings:load,") =>
      val file = c.stripPrefix("settings:load,").trim
      val xml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(file)), java.nio.charset.StandardCharsets.UTF_8)
      settingsFile = Some(java.nio.file.Paths.get(file).toAbsolutePath)
      val s = DcafsXml.parseSettings(xml)
      s.paths.foreach(addPath)
      s.streams.foreach(sp => streamSpecs(sp.id) = sp)
      val email = DcafsXml.parseEmail(xml).map { cfg =>
        val w = new graft.alerts.EmailWorker(
          outbox = cfg.outbox, inbox = cfg.inbox,
          execute = (c, sink) => execute(c).linesIterator.foreach(sink),
          checkIntervalSeconds = cfg.checkIntervalSeconds,
          zipFromMB = cfg.zipFromMB, maxSizeMB = cfg.maxSizeMB,
          deleteReceivedZip = cfg.deleteRecZip)
        cfg.book.foreach { case (ref, addrs) => w.addTo(ref, addrs) }
        cfg.permits.foreach(w.addPermit)
        attachEmail(w)
        ", email configured"
      }.getOrElse("")
      val matrix = DcafsXml.parseMatrix(xml).map { cfg =>
        attachMatrix(new graft.alerts.MatrixClient(cfg,
          execute = (c, sink) => execute(c).linesIterator.foreach(sink)))
        ", matrix configured"
      }.getOrElse("")
      // <taskmanager id=..>script path</taskmanager> references boot
      // their tasklists, relative paths against the settings file's dir
      // (reference TaskManagerPool.readFromXML)
      val base = java.nio.file.Paths.get(file.trim).toAbsolutePath.getParent
      val tms = DcafsXml.parseTaskManagerRefs(xml).map { case (id, path) =>
        val resolved = {
          val p = java.nio.file.Paths.get(path)
          if (p.isAbsolute) p else base.resolve(p)
        }
        loadTaskManager(id, resolved)
        id
      }
      val tmNote = if (tms.isEmpty) "" else s", taskmanagers ${tms.mkString("/")}"
      s"loaded ${s.streams.size} streams, ${s.paths.size} paths$email$matrix$tmNote"
    case "streams" =>
      if (streamSpecs.isEmpty) "no stream declarations loaded"
      else streamSpecs.values
        .map(s => s"${s.id}\t${s.kind}\t${s.host}:${s.port}\tlabel=${s.label}")
        .mkString("\n")
    case c if c.startsWith("dbm:") => dbm(c.stripPrefix("dbm:"))
    case c if c.startsWith("tm:") => tm(c.stripPrefix("tm:"))
    case c if c.startsWith("email:") => emailCmd(c.stripPrefix("email:"))
    case c if c.startsWith("matrix:") => matrixCmd(c.stripPrefix("matrix:"))
    case c if c.startsWith("admin:") => adminCmd(c.stripPrefix("admin:"))
    case sql => render(spark.sql(sql))
  }

  /** `ss:` stream-mutation family (reference `StreamManager.replyToCommand`,
    * `StreamManager.java:659-1000`): add/alter/remove stream declarations.
    * Each mutation updates the in-memory spec table AND writes back to the
    * loaded settings.xml via [[SettingsFab]] — the reference persists
    * through `addStreamToXML` (`StreamManager.java:507-523,900`) so an
    * `ss:addtcp` survives restart. Unlike the reference this does not also
    * auto-connect: sources are built lazily from specs by
    * `LineSources.fromSpec` when a query subscribes.
    */
  private def ssCmd(cmd: String): String = {
    val p = cmd.split(",", -1).map(_.trim)
    def addStream(kind: String): String = {
      if (p.length < 3) return s"! Bad amount of arguments, need at least 3 ss:${p(0)},id,ip:port(,label)"
      val id = p(1)
      val address = p(2)
      val label = if (p.length >= 4) p(3) else ""
      val (host, port) = address.lastIndexOf(':') match {
        case -1 => (address, if (kind == "modbus") 502 else 0)
        case i => (address.substring(0, i), address.substring(i + 1).toInt)
      }
      streamSpecs(id) = DcafsXml.StreamSpec(id, kind, host, port, label,
        eol = "crlf", ttlMillis = -1L, hello = None, idleCmd = None, topic = None)
      settingsFile match {
        case Some(f) =>
          SettingsFab.upsertStream(f, id, kind, address, label)
          s"Added $kind stream $id (persisted to ${f.getFileName})"
        case None =>
          s"Added $kind stream $id (in-memory only — settings:load a file to persist)"
      }
    }
    p(0) match {
      case "?" =>
        "ss:addtcp,id,ip:port(,label) | ss:addudp,id,ip:port(,label) | " +
          "ss:addmodbus,id,ip:port(,label) | ss:remove,id | ss (listing)"
      case "addtcp" => addStream("tcp")
      case "addudp" => addStream("udp")
      case "addmodbus" | "addmodbustcp" => addStream("modbus")
      case "remove" if p.length >= 2 =>
        val id = p(1)
        val known = streamSpecs.remove(id).nonEmpty
        val persisted = settingsFile.exists(SettingsFab.removeStream(_, id))
        if (known || persisted) s"Removed stream $id" else s"! No such stream $id"
      case other => s"! No such subcommand in ss: $other"
    }
  }

  /** `admin:` family (reference `CommandPool.doADMIN`,
    * `CommandPool.java:472-560`): clock/regex/gc/lt/ipv4/ipv6 runtime
    * introspection, log tails from `logDir`, getlogs emails the logs to
    * the admin ref. Host-level actions (reboot, sleep) are refused —
    * a query-engine library must not power-manage its host.
    */
  var logDir: java.nio.file.Path = java.nio.file.Paths.get("logs")

  private def adminCmd(cmd: String): String = {
    val p = cmd.split(",", -1)
    def tailLog(name: String, n: Int): String = {
      val f = logDir.resolve(name)
      if (!java.nio.file.Files.exists(f)) s"No $name yet"
      else {
        val lines = java.nio.file.Files.readAllLines(f)
        lines.subList(math.max(0, lines.size - n), lines.size)
          .toArray.mkString("\n")
      }
    }
    p(0) match {
      case "?" =>
        "admin:getlogs | admin:clock | admin:regex,<regex>,<match> | " +
          "admin:ipv4 | admin:ipv6 | admin:gc | admin:lt | " +
          "admin:info,x | admin:errors,x"
      case "clock" => java.time.OffsetDateTime.now().toString
      case "regex" =>
        if (p.length < 3) "Not enough arguments: admin:regex,<regex>,<match>"
        else s"Matches? ${p(2).matches(p(1))}"
      case "gc" =>
        System.gc()
        val rt = Runtime.getRuntime
        f"Garbage collection requested; heap ${(rt.totalMemory - rt.freeMemory) / 1048576}%d MB used / ${rt.totalMemory / 1048576}%d MB"
      case "lt" =>
        Thread.getAllStackTraces.keySet().toArray(Array.empty[Thread])
          .sortBy(_.getName)
          .map(t => s"${t.getName}\t${t.getState}")
          .mkString("\n")
      case "ipv4" | "ipv6" =>
        val want6 = p(0) == "ipv6"
        val out = new StringBuilder
        val ifs = java.net.NetworkInterface.getNetworkInterfaces
        while (ifs.hasMoreElements) {
          val nif = ifs.nextElement()
          val addrs = nif.getInetAddresses
          while (addrs.hasMoreElements) {
            val a = addrs.nextElement()
            val is6 = a.isInstanceOf[java.net.Inet6Address]
            if (is6 == want6)
              out.append(s"${nif.getName}\t${a.getHostAddress}\n")
          }
        }
        if (out.isEmpty) "none" else out.toString.trim
      case "info" | "errors" =>
        val n = if (p.length > 1) p(1).toInt else 30
        tailLog(if (p(0) == "info") "info.log" else "errors.log", n)
      case "getlogs" =>
        emailWorker match {
          case Some(w) =>
            val info = logDir.resolve("info.log")
            if (java.nio.file.Files.exists(info)) {
              w.sendEmail(graft.alerts.Email.toAdminAbout("Statuslog")
                .content("File attached (probably)").attachment(info.toString))
              "Sending logs to admin"
            } else "No logs to send yet"
          case None => "No EmailWorker attached"
        }
      case "reboot" | "sleep" =>
        s"'${p(0)}' is host power management — not a query-engine concern; refused"
      case _ => "unknown admin command"
    }
  }

  /** `matrix:` family (reference `MatrixClient.replyToCommand`,
    * `MatrixClient.java:773-884`): rooms/join/say/files/down/sync over
    * an attached [[graft.alerts.MatrixClient]].
    */
  private var matrixClient: Option[graft.alerts.MatrixClient] = None

  def attachMatrix(m: graft.alerts.MatrixClient): Unit = matrixClient = Some(m)

  private def matrixCmd(cmd: String): String = {
    val m = matrixClient.getOrElse(
      return "No MatrixClient initialized (yet), attach one or settings:load a <matrix> node.")
    val p = cmd.split(",", -1).map(_.trim)
    p(0) match {
      case "?" =>
        "matrix:rooms | matrix:join,roomid,url | matrix:say,roomid,message | " +
          "matrix:broadcast,message | matrix:files | matrix:upload,path(,roomid) | " +
          "matrix:down,fileid | matrix:sync | matrix:restart"
      case "rooms" =>
        val r = m.roomListing
        if (r.isEmpty) "no rooms" else r.mkString("\n")
      case "join" if p.length >= 3 =>
        val rs = graft.alerts.RoomSetup(p(1), p(2))
        m.addRoom(rs); m.joinRoom(rs)
        "Tried to join room"
      case "say" | "txt" =>
        if (p.length < 3) "! Not enough arguments: matrix:say,roomid,message"
        else m.room(p(1)) match {
          case Some(r) =>
            m.sendMessage(r.url, cmd.split(",", 3)(2)) // message may hold commas
            "Message send"
          case None => s"No such room (yet): ${p(1)}"
        }
      case "broadcast" if p.length >= 2 =>
        m.broadcast(cmd.split(",", 2)(1)); "Broadcast send"
      case "files" =>
        if (m.fileLinks.isEmpty) "! No files yet" else m.fileLinks.keys.mkString("\n")
      // media plane (reference MatrixClient.java:791-862 upload/down)
      case "upload" =>
        if (p.length < 2) "! Not enough arguments: matrix:upload,filepath(,roomid)"
        else m.sendFile(if (p.length >= 3) p(2) else "",
          java.nio.file.Paths.get(p(1)))
      case "down" =>
        if (p.length < 2) "! Not enough arguments: matrix:down,fileid"
        else m.downloadFile(p(1))
      case "sync" => m.syncOnce(first = false); "Initiated sync"
      case "restart" => m.login(); "Tried reloading"
      case _ => s"! No such subcommand in matrix: ${p(0)}"
    }
  }

  /** `email:` family (reference `EmailWorker.replyToCommand`,
    * `EmailWorker.java:651-737`): send/refs/setup/checknow/interval/
    * addallow/adddeny/spam against an attached [[graft.alerts.EmailWorker]].
    */
  private var emailWorker: Option[graft.alerts.EmailWorker] = None

  def attachEmail(w: graft.alerts.EmailWorker): Unit = emailWorker = Some(w)

  private def emailCmd(cmd0: String): String = {
    // shorthand the reference also rewrites: toadmin,<subject> -> send,admin,...
    val cmd = cmd0.replace("toadmin,", "send,admin,")
    val w = emailWorker.getOrElse(
      return "No EmailWorker initialized (yet), attach one or settings:load an <email> node.")
    val p = cmd.split(",", -1).map(_.trim)
    p(0) match {
      case "?" =>
        "email:refs | email:send,to,subject,content | email:setup | " +
          "email:checknow | email:addallow,from,cmd(,isRegex) | " +
          "email:adddeny,from,cmd(,isRegex) | email:interval,x | email:spam"
      case "refs" => w.bookListing
      case "setup" | "status" => w.settingsListing
      case "send" =>
        if (p.length != 4) "Not enough arguments send,ref/email,subject,content"
        else {
          w.sendEmail(graft.alerts.Email.to(p(1)).subject(p(2)).content(p(3)))
          "Tried to send email"
        }
      case "checknow" =>
        val n = w.check()
        if (n < 0) "Inbox check failed" else s"Checked inbox: $n new"
      case "interval" =>
        if (p.length == 2) {
          w.checkIntervalSeconds =
            (graft.DcafsXml.parsePeriodMillis(p(1)) / 1000L).toInt
          s"Interval changed to ${w.checkIntervalSeconds} seconds"
        } else "Invalid number of parameters"
      case "addallow" | "adddeny" =>
        if (p.length < 3) s"Not enough arguments email:${p(0)},from,cmd(,isRegex)"
        else {
          val regex = p.length == 4 && Set("yes", "true", "1")(p(3).toLowerCase)
          w.addPermit(graft.alerts.Permit(p(0) == "adddeny", p(1), p(2), regex))
          "Permit added"
        }
      case "spam" => w.spamStatus
      case _ => "unknown command"
    }
  }

  /** `dbm:` database-manager family (CommandPool.java:173-183 routing;
    * subcommand surface `DatabaseManager.java:397-639`). Connections are
    * generic JDBC urls — `add` subsumes the reference's per-vendor
    * addsqlite/addmysql/addmariadb/addpostgresql/addmssql forms.
    */
  private def dbm(cmd: String): String = {
    val p = cmd.split(",", -1).map(_.trim)
    p(0) match {
      case "add" if p.length >= 3 =>
        dbs(p(1)) = p.drop(2).mkString(",")
        s"db ${p(1)} registered"
      case "status" | "list" =>
        if (dbs.isEmpty) "no databases"
        else dbs.map { case (id, url) => s"$id\t$url" }.mkString("\n")
      case "tables" if p.length >= 2 =>
        val url = dbs.getOrElse(p(1), return s"no such db ${p(1)}")
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
          val names = Iterator.continually(rs)
            .takeWhile(_.next()).map(_.getString("TABLE_NAME")).toList
          if (names.isEmpty) "no tables" else names.sorted.mkString("\n")
        } finally conn.close()
      case "fetch" if p.length >= 3 =>
        val url = dbs.getOrElse(p(1), return s"no such db ${p(1)}")
        val sql = cmd.split(",", 3)(2) // query may itself contain commas
        render(spark.read.format("jdbc")
          .option("url", url).option("query", sql).load())
      case "store" if p.length >= 4 =>
        val url = dbs.getOrElse(p(1), return s"no such db ${p(1)}")
        spark.table(p(2)).write.mode("append")
          .format("jdbc").option("url", url).option("dbtable", p(3)).save()
        s"stored ${p(2)} into ${p(3)}"
      case _ => "dbm: add,<id>,<jdbcUrl> | status | tables,<id> | " +
        "fetch,<id>,<sql> | store,<id>,<view>,<table>"
    }
  }

  /** `tm:` task-manager family (CommandPool tasks:* commands, DAS Core
    * manual "Telnet" section): tasklist XML scripts load into
    * [[TasklistRunner]]s; task output `system` re-enters [[execute]]
    * (the reference's system output runs a telnet command), everything
    * else lands on [[taskSends]] for the caller's output plane.
    */
  /** Load one tasklist script as a task manager; task outputs route to
    * the console (`system`), the attached alert channels
    * (`email:`/`matrix:`, reference TaskManager.java:658), or the
    * [[taskSends]] drain.
    */
  private def loadTaskManager(id: String, file: java.nio.file.Path): String = {
    val xml = new String(java.nio.file.Files.readAllBytes(file),
      java.nio.charset.StandardCharsets.UTF_8)
    val runner = new TasklistRunner(DcafsXml.parseTasks(xml),
      send = (taskId, output, value) =>
        if (output == "system") { execute(value); () }
        else if (output.startsWith("email") && emailWorker.nonEmpty) {
          val refs = output.split(":", 2).lift(1).getOrElse("admin")
          refs.split(";").foreach(r => emailWorker.get.sendEmail(
            graft.alerts.Email.to(r).subject(s"Task $taskId")
              .content("<html>" + value.replace("\r\n", "<br>") + "</html>")))
        } else if (output.startsWith("matrix") && matrixClient.nonEmpty) {
          val target = output.split(":", 2).lift(1).getOrElse("")
          matrixClient.get.room(target) match {
            case Some(r) => matrixClient.get.sendMessage(r.url, value)
            case None => matrixClient.get.broadcast(value)
          }
        } else taskSends.add((taskId, output, value)))
    taskManagers.get(id).foreach(_.shutdown())
    taskManagers(id) = runner
    s"taskmanager $id: ${runner.taskIds.size} tasks, ${runner.setIds.size} sets"
  }

  private def tm(cmd: String): String = {
    val p = cmd.split(",", -1).map(_.trim)
    p(0) match {
      case "load" if p.length >= 3 =>
        loadTaskManager(p(1), java.nio.file.Paths.get(p(2)))
      case "managers" =>
        if (taskManagers.isEmpty) "no task managers"
        else taskManagers.keys.mkString("\n")
      case id if taskManagers.contains(id) && p.length >= 2 =>
        val r = taskManagers(id)
        p(1) match {
          case "listtasks" =>
            if (r.taskIds.isEmpty) "no tasks" else r.taskIds.mkString("\n")
          case "listsets" =>
            if (r.setIds.isEmpty) "no sets" else r.describeSets.mkString("\n")
          case "run" if p.length >= 3 =>
            if (r.startSet(p(2))) s"started taskset ${p(2)}"
            else s"no such taskset ${p(2)}"
          case "stop" =>
            r.shutdown(); taskManagers.remove(id); s"stopped $id"
          case other => s"unknown tm subcommand $other"
        }
      case _ => "tm: load,<id>,<file> | managers | <id>,listtasks | " +
        "<id>,listsets | <id>,run,<set> | <id>,stop"
    }
  }

  private def render(df: DataFrame, max: Int = 20): String = {
    val rows = df.limit(max + 1).collect()
    val header = df.columns.mkString("\t")
    val body = rows.take(max).map(_.toSeq.map(v => String.valueOf(v)).mkString("\t"))
    val more = if (rows.length > max) s"\n... (> $max rows)" else ""
    (header +: body).mkString("\n") + more
  }
}
