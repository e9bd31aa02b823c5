package graft

import org.scalatest.funsuite.AnyFunSuite

class DcafsXmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dcafs settings.xml path drives the engine end to end") {
    val xml =
      """<path id="ctd" delimiter=",">
        |  <filter>
        |    <rule type="nostart">#</rule>
        |    <rule type="minlength">5</rule>
        |    <rule type="math">i0 above 0</rule>
        |  </filter>
        |  <math>i1=i1*10+i0</math>
        |  <editor type="prepend">ctd,</editor>
        |  <store delimiter=",">
        |    <text index="0">tag</text>
        |    <real index="1" def="-999">temp</real>
        |    <real index="2">depth</real>
        |  </store>
        |</path>""".stripMargin
    val spec = DcafsXml.parsePath(xml)
    assert(spec.id == "ctd" && spec.steps.size == 4)

    val in = Seq("2.0,3.5,44", "#hdr,0,0", "-5,1,1", "x,y").toDF("line")
    val (out, reject) = PathCompiler.compileWithReject(spec, in)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("tag") == "ctd")
    assert(rows(0).getAs[Double]("temp") == 2.0)
    assert(rows(0).getAs[Double]("depth") == 37.0)
    assert(reject.count() == 3)
  }

  test("regex filters compile and full-match, incl. alternation") {
    // round-11 review: the quote-blind caret rewrite crashed EVERY regex
    // filter ('^...$' parsed as a power operator); and the anchor needs
    // a non-capturing group or top-level alternation escapes it
    val xml =
      """<path id="rx" delimiter=",">
        |  <filter type="regex">abc.*|def.*</filter>
        |</path>""".stripMargin
    val spec = DcafsXml.parsePath(xml)
    val in = Seq("abc,1", "def,2", "zzzdef,3", "qqq,4").toDF("line")
    val got = PathCompiler.compile(spec, in)
      .select("line").as[String].collect().toSet
    assert(got == Set("abc,1", "def,2"), s"got $got")
  }

  test("doctype declarations are refused (XXE hardening)") {
    val evil =
      """<!DOCTYPE p [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<path id="p" delimiter=","><filter type="contain">&x;</filter></path>""".stripMargin
    intercept[org.xml.sax.SAXParseException] { DcafsXml.parsePath(evil) }
  }

  test("asleep is an idle-time trigger, never the connect hello") {
    val xml =
      """<streams>
        |  <stream id="dev" type="tcp">
        |    <address>h:1</address>
        |    <cmd when="asleep">low_power</cmd>
        |    <cmd when="open">init</cmd>
        |  </stream>
        |</streams>""".stripMargin
    val specs = DcafsXml.parseStreams(xml)
    assert(specs.head.hello.contains("init"),
      s"asleep shadowed the real hello: ${specs.head.hello}")
  }

  test("consecutive filters chain on the reverse branch (PathForward.java:203-208)") {
    // dcafs if/elif routing: filter2 subscribes to filter1's REJECTS;
    // filter1's matches leave the path, and the path's own reject output
    // is the LAST filter's rejects only
    val spec = DcafsXml.parsePath(
      """<path id="elif" delimiter=",">
        |  <filter type="start">A</filter>
        |  <filter type="start">B</filter>
        |  <editor type="append">,tagged</editor>
        |</path>""".stripMargin)
    val in = Seq("A,1", "B,2", "B,3", "C,4").toDF("line")
    val (out, reject) = PathCompiler.compileWithReject(spec, in)
    // only filter1's rejects that match filter2 flow forward
    assert(out.select("line").as[String].collect().sorted.toSeq ==
      Seq("B,2,tagged", "B,3,tagged"))
    // path reject = filter2's rejects (filter1's were consumed)
    assert(reject.select("line").as[String].collect().toSeq == Seq("C,4"))
    // a NON-consecutive second filter still filters the main stream
    val spec2 = DcafsXml.parsePath(
      """<path id="and" delimiter=",">
        |  <filter type="start">A</filter>
        |  <editor type="append">,x</editor>
        |  <filter type="contain">1</filter>
        |</path>""".stripMargin)
    val (out2, rej2) = PathCompiler.compileWithReject(spec2, in)
    assert(out2.select("line").as[String].collect().toSeq == Seq("A,1,x"))
    assert(rej2.count() == 3) // B,2 B,3 C,4 from f1
  }

  test("single-rule filter form + editor chains + store defaults") {
    val spec = DcafsXml.parsePath(
      """<path id="p" delimiter=",">
        |  <filter type="contain">,</filter>
        |  <editor>
        |    <edit type="replace" find="alpha">A</edit>
        |    <edit type="cutend">1</edit>
        |  </editor>
        |  <store>
        |    <text index="0">head</text>
        |    <real index="1">v</real>
        |  </store>
        |</path>""".stripMargin)
    val out = PathCompiler.compile(spec, Seq("alpha,12.5x", "noedit").toDF("line")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("head") == "A")
    assert(out(0).getAs[Double]("v") == 12.5)
  }

  test("compound assignment and increment ops (MathForward.java:345-369)") {
    assert(DcafsXml.parseOp("i1 += 2*i0") == (1 -> "i1 + (2*i0)"))
    assert(DcafsXml.parseOp("i2*=3") == (2 -> "i2 * (3)"))
    assert(DcafsXml.parseOp("i0++") == (0 -> "i0 + 1"))
    assert(DcafsXml.parseOp("i3--") == (3 -> "i3 - 1"))
    val spec = DcafsXml.parsePath(
      """<path id="p" delimiter=","><math><op>i0+=1</op><op>i1*=2</op></math>
        |<store><real index="0">a</real><real index="1">b</real></store></path>""".stripMargin)
    val out = PathCompiler.compile(spec, Seq("1.0,3.0").toDF("line")).collect()(0)
    assert(out.getAs[Double]("a") == 2.0 && out.getAs[Double]("b") == 6.0)
  }

  test("def constants substitute and nmea suffix recomputes the checksum") {
    val spec = DcafsXml.parsePath(
      """<path id="p" delimiter=",">
        |  <math suffix="nmea">
        |    <def ref="gain">2.5</def>
        |    <op>i0 = i0 * gain</op>
        |  </math>
        |</path>""".stripMargin)
    val out = PathCompiler.compile(spec, Seq("4.0,x").toDF("line")).collect()(0)
    val line = out.getAs[String]("line")
    assert(line.startsWith("10.0,x*"), line)
    // the appended checksum must verify
    assert(spark.range(1).select(
      graft.functions.GraftFunctions.nmea_valid(
        org.apache.spark.sql.functions.lit(line))).collect()(0).getBoolean(0))
  }

  test("unsupported constructs fail loudly, not silently") {
    intercept[IllegalArgumentException] {
      DcafsXml.parsePath("""<path id="x"><filter type="nmeaX">v</filter></path>""")
    }
    intercept[IllegalArgumentException] {
      DcafsXml.parsePath("""<path id="x"><math>notanop</math></path>""")
    }
  }

  test("parseStreams reads reference-style <streams> declarations") {
    val specs = DcafsXml.parseStreams(
      """<streams>
        |  <stream id="ctd" type="tcp">
        |    <address>192.168.1.5:4001</address>
        |    <label>generic:ctd</label>
        |    <eol>crlf</eol>
        |    <ttl>3m20s</ttl>
        |    <cmd when="hello">give data please?</cmd>
        |    <cmd when="idle">email:send,admin,ctd idle</cmd>
        |  </stream>
        |  <stream id="met" type="udp"><port>4010</port></stream>
        |  <stream id="broker" type="mqtt">
        |    <address>mq.local:1883</address>
        |    <topic>sensors/#</topic>
        |  </stream>
        |</streams>""".stripMargin)
    assert(specs.length == 3)
    val ctd = specs(0)
    assert(ctd.id == "ctd" && ctd.kind == "tcp" &&
      ctd.host == "192.168.1.5" && ctd.port == 4001 &&
      ctd.label == "generic:ctd" && ctd.ttlMillis == 200000L &&
      ctd.hello.contains("give data please?") &&
      ctd.idleCmd.contains("email:send,admin,ctd idle"))
    assert(specs(1).kind == "udp" && specs(1).port == 4010)
    assert(specs(2).kind == "mqtt" && specs(2).topic.contains("sensors/#"))
    // fromSpec builds streaming frames with the label column attached
    val df = LineSources.fromSpec(spark, specs(1))
    assert(df.isStreaming && df.columns.contains("label"))
    intercept[IllegalArgumentException] {
      LineSources.fromSpec(spark,
        DcafsXml.parseStreams("""<streams><stream id="s" type="serial"/></streams>""").head)
    }
  }

  test("parseSettings reads a whole das document: streams + paths") {
    val s = DcafsXml.parseSettings(
      """<das>
        |  <settings><mode>normal</mode></settings>
        |  <streams>
        |    <stream id="ctd" type="tcp"><address>10.0.0.5:4001</address></stream>
        |  </streams>
        |  <paths>
        |    <path id="p1" delimiter=","><filter type="start">$</filter></path>
        |    <path id="p2" delimiter=";"><editor type="trim"/></path>
        |  </paths>
        |</das>""".stripMargin)
    assert(s.streams.map(_.id) == Seq("ctd"))
    assert(s.paths.map(_.id) == Seq("p1", "p2"))
    assert(s.paths.head.delimiter == ",")
  }

  test("parseTasks reads a reference-manual tasklist script") {
    import graft.streaming._
    val tl = DcafsXml.parseTasks(
      """<tasklist>
        |  <tasksets>
        |    <taskset name="Startup sequence" id="boot" run="step">
        |      <task output="stream:SBE38">GO 1</task>
        |      <task output="stream:SBE38" trigger="delay:2m10s">GO 2</task>
        |    </taskset>
        |    <taskset id="alarm" run="oneshot">
        |      <task output="log:info">over temp</task>
        |    </taskset>
        |  </tasksets>
        |  <tasks>
        |    <task id="poll" output="system" trigger="interval:10s,5s">st</task>
        |    <task id="daily" output="system" trigger="time:14:00,mo">report</task>
        |    <task id="boot_chain" output="manager" trigger="delay:5s">taskset:boot</task>
        |    <task id="guard" output="system" trigger="retry:10s,5" req="flag:ready">go</task>
        |    <task id="kw" output="system" trigger="keyword:alarm">taskset:alarm</task>
        |  </tasks>
        |</tasklist>""".stripMargin)
    assert(tl.sets.map(_.id) == Seq("boot", "alarm"))
    assert(tl.sets.head.run == "step" && tl.sets.head.name == "Startup sequence")
    assert(tl.sets.head.tasks.map(_.value) == Seq("GO 1", "GO 2"))
    assert(tl.sets.head.tasks(1).trigger.contains(Delay(130000L)))
    assert(tl.tasks.map(_.id) ==
      Seq("poll", "daily", "boot_chain", "guard", "kw"))
    // interval: explicit initial delay; time: UTC clock with day set;
    // retry -> waitfor polling; keyword
    assert(tl.tasks(0).trigger.contains(Interval(10000L, 5000L)))
    assert(tl.tasks(1).trigger.contains(Clock(java.time.LocalTime.of(14, 0),
      Set(java.time.DayOfWeek.MONDAY), utc = true)))
    assert(tl.tasks(3).trigger.contains(WaitFor(10000L, 5)) &&
      tl.tasks(3).req.contains("flag:ready"))
    assert(tl.tasks(4).trigger.contains(Keyword("alarm")))
    // default initial delay equals the interval (manual)
    assert(DcafsXml.parseTrigger("interval:7s") == Interval(7000L, 7000L))
    assert(DcafsXml.parseTrigger("localtime:07:30") ==
      Clock(java.time.LocalTime.of(7, 30), Set.empty, utc = false))
  }

  test("period literals parse like the reference TimeTools") {
    assert(DcafsXml.parsePeriodMillis("5s") == 5000L)
    assert(DcafsXml.parsePeriodMillis("3m20s") == 200000L)
    assert(DcafsXml.parsePeriodMillis("1h") == 3600000L)
    assert(DcafsXml.parsePeriodMillis("-1") == -1L)
    assert(DcafsXml.parsePeriodMillis("250ms") == 250L)
    assert(DcafsXml.parsePeriodMillis("90") == 90000L) // bare seconds
  }
}
