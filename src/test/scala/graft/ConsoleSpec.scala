package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.console.GraftConsole

class ConsoleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("console maps dcafs commands to SQL surface") {
    val c = new GraftConsole(spark)
    c.registerTable("sensor_raw",
      Seq("2.0,3.5,44", "7.5,1.25,44").toDF("line"))

    assert(c.execute("ss").linesIterator.contains("sensor_raw"))
    assert(c.execute("raw:sensor_raw,1").linesIterator.size == 2) // header + 1

    c.addPath(PathSpec("p1", ",", Seq(
      StoreStep(Seq(("v", 0, "double", "-1.0"))))))
    assert(c.execute("pf:list").contains("p1: 1 steps"))
    c.attach("p1", "sensor_raw")
    val out = c.execute("SELECT round(sum(v), 2) AS s FROM p1_out")
    assert(out.linesIterator.toSeq == Seq("s", "9.5"))
    assert(c.execute("st").contains("no active streaming"))
    assert(c.execute("help").nonEmpty)
    // single-line path probe (dcafs editor test())
    val probe = c.execute("pf:test,p1,42.5,x")
    assert(probe.contains("42.5"), probe)
  }

  test("board: commands run the analytics library from the console") {
    val c = new GraftConsole(spark)
    assert(c.execute("board:list").linesIterator.contains("q1_agg"))
    val out = c.execute("board:q1_agg,/root/testdata/sf0.001,5")
    assert(out.linesIterator.nonEmpty && out.contains("sum_qty"), out)
    assert(c.execute("board:nope").contains("unknown board query"))
  }

  test("rv lists the rtvals snapshot view (the dcafs rtvals listing)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val c = new GraftConsole(spark)
    val mem = MemoryStream[graft.streaming.ValUpdate]
    val q = graft.streaming.RtVals.snapshots(mem.toDS())
      .writeStream.format("memory").queryName("rtvals").outputMode("update").start()
    try {
      mem.addData(
        graft.streaming.ValUpdate("deck_temp", 19.2, 1),
        graft.streaming.ValUpdate("deck_hum", 55.0, 1))
      q.processAllAvailable()
      val rv = c.execute("rv")
      assert(rv.contains("deck_temp") && rv.contains("19.2"))
      assert(c.execute("st").contains("rtvals"))
    } finally q.stop()
  }

  test("settings:load wires a whole dcafs config into the console") {
    val c = new graft.console.GraftConsole(spark)
    val f = java.nio.file.Files.createTempFile("graft-settings", ".xml")
    java.nio.file.Files.write(f,
      """<das>
        |  <streams>
        |    <stream id="ctd" type="tcp"><address>10.0.0.5:4001</address>
        |      <label>generic:ctd</label></stream>
        |  </streams>
        |  <paths>
        |    <path id="clean" delimiter=","><filter type="start">$</filter></path>
        |  </paths>
        |</das>""".stripMargin.getBytes)
    assert(c.execute(s"settings:load,$f") == "loaded 1 streams, 1 paths")
    assert(c.execute("streams").contains("ctd\ttcp\t10.0.0.5:4001"))
    assert(c.execute("pf:list").contains("clean"))
    assert(c.streamSpec("ctd").exists(_.label == "generic:ctd"))
  }

  test("ss:/pf: mutations persist to settings.xml and survive a console restart") {
    val f = java.nio.file.Files.createTempFile("graft-settings-wb", ".xml")
    java.nio.file.Files.write(f,
      """<das>
        |  <streams>
        |    <stream id="ctd" type="tcp"><address>10.0.0.5:4001</address>
        |      <label>generic:ctd</label></stream>
        |  </streams>
        |</das>""".stripMargin.getBytes)
    val c1 = new graft.console.GraftConsole(spark)
    assert(c1.execute(s"settings:load,$f") == "loaded 1 streams, 0 paths")
    // reference parity: ss:addtcp,id,ip:port,label writes the stream to xml
    // (StreamManager.java:879-905 addStreamToXML)
    assert(c1.execute("ss:addtcp,gps,10.0.0.7:4002,nmea:gps").contains("persisted"))
    assert(c1.execute("ss:addmodbus,plc,10.0.0.9").contains("persisted"))
    assert(c1.execute("pf:add,clean").contains("persisted"))
    assert(c1.execute("streams").contains("gps\ttcp\t10.0.0.7:4002"))

    // a FRESH console booted from the rewritten file sees the mutations
    val c2 = new graft.console.GraftConsole(spark)
    assert(c2.execute(s"settings:load,$f") == "loaded 3 streams, 1 paths")
    assert(c2.streamSpec("gps").exists(s => s.kind == "tcp" && s.host == "10.0.0.7"
      && s.port == 4002 && s.label == "nmea:gps"))
    assert(c2.streamSpec("plc").exists(s => s.kind == "modbus" && s.port == 502))
    assert(c2.streamSpec("ctd").nonEmpty, "pre-existing stream must survive the rewrite")
    assert(c2.execute("pf:list").contains("clean"))

    // remove persists too
    assert(c2.execute("ss:remove,gps") == "Removed stream gps")
    val c3 = new graft.console.GraftConsole(spark)
    assert(c3.execute(s"settings:load,$f") == "loaded 2 streams, 1 paths")
    assert(c3.streamSpec("gps").isEmpty)
  }

  test("dbm: family manages JDBC databases (CommandPool dbm surface)") {
    val c = new GraftConsole(spark)
    val dbDir = java.nio.file.Files.createTempDirectory("graft-dbm")
      .toFile.getAbsolutePath + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE readings (id INT, val DOUBLE)")
      st.executeUpdate("INSERT INTO readings VALUES (1, 1.5), (2, 3.0)")
      st.close()
    } finally conn.close()
    assert(c.execute(s"dbm:add,marine,$url") == "db marine registered")
    assert(c.execute("dbm:status").contains("marine"))
    assert(c.execute("dbm:tables,marine").contains("READINGS"))
    val fetched = c.execute("dbm:fetch,marine,SELECT id, val FROM readings")
    assert(fetched.contains("1.5") && fetched.contains("3.0"))
    // store a view back, then read it through the same surface
    import spark.implicits._
    c.registerTable("more", Seq((3, 4.5)).toDF("id", "val"))
    assert(c.execute("dbm:store,marine,more,readings").startsWith("stored"))
    assert(c.execute("dbm:fetch,marine,SELECT count(*) AS n FROM readings")
      .contains("3"))
  }

  test("tm: family loads and drives tasklist scripts (tasks: commands)") {
    val c = new GraftConsole(spark)
    val f = java.nio.file.Files.createTempFile("graft-tasks", ".xml")
    java.nio.file.Files.write(f,
      """<tasklist>
        |  <tasksets>
        |    <taskset name="Alarm chain" id="alarm">
        |      <task output="stream:horn">ON</task>
        |    </taskset>
        |  </tasksets>
        |  <tasks>
        |    <task id="hello" output="stream:dev" trigger="keyword:boot">hi</task>
        |  </tasks>
        |</tasklist>""".stripMargin.getBytes)
    assert(c.execute(s"tm:load,sched,$f") == "taskmanager sched: 1 tasks, 1 sets")
    assert(c.execute("tm:managers").contains("sched"))
    assert(c.execute("tm:sched,listtasks").contains("hello"))
    assert(c.execute("tm:sched,listsets").contains("alarm\tAlarm chain"))
    assert(c.execute("tm:sched,run,alarm") == "started taskset alarm")
    assert(c.execute("tm:sched,run,nope") == "no such taskset nope")
    val sends = c.taskSends.toArray.toSeq
    assert(sends.contains(("alarm#0", "stream:horn", "ON")), s"got $sends")
    assert(c.execute("tm:sched,stop") == "stopped sched")
    assert(c.execute("tm:managers") == "no task managers")
  }

  test("task output email:/matrix: routes through the attached alert channels") {
    val c = new GraftConsole(spark)
    val smtp = new MiniSmtpServer
    val matrix = new MiniMatrixServer
    try {
      val w = new graft.alerts.EmailWorker(
        outbox = graft.alerts.MailboxCfg("127.0.0.1", smtp.port, from = "graft@email.com"),
        sendSpacingMillis = 5, busyWindowMillis = 400)
      w.addTo("admin", "boss@x.com")
      c.attachEmail(w)
      val m = new graft.alerts.MatrixClient(
        graft.alerts.MatrixCfg("@graft:x", "pw", matrix.url,
          rooms = Seq(graft.alerts.RoomSetup("ops", "!ops:x"))),
        retryStepMillis = 50, syncTimeoutMillis = 300)
      m.login()
      c.attachMatrix(m)
      val f = java.nio.file.Files.createTempFile("graft-alert-tasks", ".xml")
      java.nio.file.Files.write(f,
        """<tasklist><tasksets>
          |  <taskset name="Alert chain" id="alert">
          |    <task output="email:admin">Temperature critical</task>
          |    <task output="matrix:ops">Temperature critical</task>
          |  </taskset>
          |</tasksets></tasklist>""".stripMargin.getBytes)
      assert(c.execute(s"tm:load,alerts,$f").contains("1 sets"))
      assert(c.execute("tm:alerts,run,alert") == "started taskset alert")
      val deadline = System.currentTimeMillis() + 5000
      import scala.jdk.CollectionConverters._
      while ((smtp.received.isEmpty ||
          !matrix.messages.asScala.exists(_._2 == "Temperature critical")) &&
          System.currentTimeMillis() < deadline) Thread.sleep(20)
      val mail = smtp.received.asScala.find(_._3.contains("Temperature critical"))
      assert(mail.nonEmpty && mail.get._2 == Seq("boss@x.com"))
      assert(mail.get._3.contains("Subject: Task alert#0"))
      assert(matrix.messages.asScala.exists { case (r, b) =>
        r == "!ops:x" && b == "Temperature critical" })
      assert(c.taskSends.isEmpty, "alert outputs must not leak to taskSends")
      w.stop(); m.stop()
      c.execute("tm:alerts,stop")
    } finally { smtp.close(); matrix.close() }
  }

  test("email: family drives an attached worker (EmailWorker command surface)") {
    val c = new GraftConsole(spark)
    assert(c.execute("email:refs").contains("No EmailWorker initialized"))
    val smtp = new MiniSmtpServer
    try {
      val w = new graft.alerts.EmailWorker(
        outbox = graft.alerts.MailboxCfg("127.0.0.1", smtp.port, from = "graft@email.com"),
        sendSpacingMillis = 5, busyWindowMillis = 400)
      c.attachEmail(w)
      w.addTo("admin", "boss@x.com")
      assert(c.execute("email:refs").contains("admin -> boss@x.com"))
      assert(c.execute("email:setup").contains(s"Server: 127.0.0.1:${smtp.port}"))
      assert(c.execute("email:toadmin,ping,all well") == "Tried to send email")
      val deadline = System.currentTimeMillis() + 5000
      while (smtp.received.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(smtp.received.peek()._2 == Seq("boss@x.com"))
      assert(c.execute("email:addallow,ops,sd") == "Permit added")
      assert(c.execute("email:interval,2m").contains("120 seconds"))
      assert(c.execute("email:spam").startsWith("Busy at"))
      w.stop()
    } finally smtp.close()
  }

  test("matrix: family drives an attached client (MatrixClient command surface)") {
    val c = new GraftConsole(spark)
    assert(c.execute("matrix:rooms").contains("No MatrixClient initialized"))
    val srv = new MiniMatrixServer
    try {
      val m = new graft.alerts.MatrixClient(
        graft.alerts.MatrixCfg("@graft:x", "pw", srv.url),
        retryStepMillis = 50, syncTimeoutMillis = 300)
      c.attachMatrix(m)
      m.login()
      assert(c.execute("matrix:join,ops,!ops:x") == "Tried to join room")
      assert(c.execute("matrix:rooms").contains("ops -> !ops:x"))
      assert(c.execute("matrix:say,ops,hello, world") == "Message send")
      val deadline = System.currentTimeMillis() + 5000
      while (srv.messages.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      import scala.jdk.CollectionConverters._
      assert(srv.messages.asScala.exists(_._2 == "hello, world"))
      assert(c.execute("matrix:files") == "! No files yet")
      m.stop()
    } finally srv.close()
  }

  test("settings:load boots <taskmanager> script references") {
    val c = new GraftConsole(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft-boot")
    java.nio.file.Files.createDirectories(dir.resolve("tmscripts"))
    java.nio.file.Files.write(dir.resolve("tmscripts/ops.xml"),
      """<tasklist><tasksets>
        |  <taskset name="Ping" id="ping">
        |    <task output="stream:dev">hello</task>
        |  </taskset>
        |</tasksets></tasklist>""".stripMargin.getBytes)
    java.nio.file.Files.write(dir.resolve("settings.xml"),
      """<dcafs><settings>
        |  <taskmanager id="ops">tmscripts/ops.xml</taskmanager>
        |</settings></dcafs>""".stripMargin.getBytes)
    val res = c.execute(s"settings:load,${dir.resolve("settings.xml")}")
    assert(res.contains("taskmanagers ops"), res)
    assert(c.execute("tm:managers").contains("ops"))
    assert(c.execute("tm:ops,run,ping") == "started taskset ping")
    val deadline = System.currentTimeMillis() + 5000
    while (c.taskSends.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(c.taskSends.toArray.toSeq.contains(("ping#0", "stream:dev", "hello")))
    c.execute("tm:ops,stop")
  }

  test("admin: family covers the CommandPool introspection surface") {
    val c = new GraftConsole(spark)
    assert(c.execute("admin:clock").take(4).forall(_.isDigit))
    assert(c.execute("admin:regex,\\d+,12345") == "Matches? true")
    assert(c.execute("admin:regex,\\d+,abc") == "Matches? false")
    assert(c.execute("admin:gc").contains("MB used"))
    assert(c.execute("admin:lt").linesIterator.nonEmpty)
    assert(c.execute("admin:reboot").contains("refused"))
    // log tails + getlogs email delivery
    val dir = java.nio.file.Files.createTempDirectory("graft-logs")
    c.logDir = dir
    assert(c.execute("admin:info").contains("No info.log yet"))
    java.nio.file.Files.write(dir.resolve("info.log"),
      (1 to 50).map(i => s"line$i").mkString("\n").getBytes)
    assert(c.execute("admin:info,3") == "line48\nline49\nline50")
    val smtp = new MiniSmtpServer
    try {
      val w = new graft.alerts.EmailWorker(
        outbox = graft.alerts.MailboxCfg("127.0.0.1", smtp.port, from = "graft@email.com"),
        sendSpacingMillis = 5, busyWindowMillis = 400)
      w.addTo("admin", "boss@x.com")
      c.attachEmail(w)
      assert(c.execute("admin:getlogs") == "Sending logs to admin")
      val deadline = System.currentTimeMillis() + 5000
      while (smtp.received.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val (_, rcpt, msg) = smtp.received.peek()
      assert(rcpt == Seq("boss@x.com"))
      assert(msg.contains("Subject: Statuslog") && msg.contains("""filename="info.log""""))
      w.stop()
    } finally smtp.close()
  }

  test("settings:load with an <email> node attaches a configured worker") {
    val c = new GraftConsole(spark)
    val f = java.nio.file.Files.createTempFile("graft-email-settings", ".xml")
    java.nio.file.Files.write(f,
      """<dcafs><settings><email>
        |  <outbox><server port="2525">smtp.host</server>
        |    <from>unit1@email.com</from></outbox>
        |  <book><entry ref="admin">boss@x.com</entry></book>
        |</email></settings></dcafs>""".stripMargin.getBytes)
    assert(c.execute(s"settings:load,$f").endsWith("email configured"))
    assert(c.execute("email:refs").contains("admin -> boss@x.com"))
    assert(c.execute("email:setup").contains("From (send replies): unit1@email.com"))
  }
}
