package graft.console

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{DcafsXml, PathCompiler, PathSpec}

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
  *   <anything else>      executed as Spark SQL
  */
class GraftConsole(spark: SparkSession) {

  private val paths = mutable.LinkedHashMap.empty[String, PathSpec]
  private val streamSpecs = mutable.LinkedHashMap.empty[String, DcafsXml.StreamSpec]

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

  def execute(cmd: String): String = cmd.trim match {
    case "" => ""
    case "help" =>
      "commands: help | ss | st | rv | raw:<name>[,N] | pf:list | pf:add,<id> | pf:test,<id>,<line> | <sql>"
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
      s"path $id added"
    // single-line probe through a path (EditorForward.java:589-596 test())
    case c if c.startsWith("pf:test,") =>
      val rest = c.stripPrefix("pf:test,")
      val (id, line) = rest.span(_ != ',')
      import spark.implicits._
      val in = Seq(line.stripPrefix(",")).toDF("line")
      render(PathCompiler.compile(paths(id), in))
    case c if c.startsWith("settings:load,") =>
      val file = c.stripPrefix("settings:load,").trim
      val xml = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(file)), java.nio.charset.StandardCharsets.UTF_8)
      val s = DcafsXml.parseSettings(xml)
      s.paths.foreach(addPath)
      s.streams.foreach(sp => streamSpecs(sp.id) = sp)
      s"loaded ${s.streams.size} streams, ${s.paths.size} paths"
    case "streams" =>
      if (streamSpecs.isEmpty) "no stream declarations loaded"
      else streamSpecs.values
        .map(s => s"${s.id}\t${s.kind}\t${s.host}:${s.port}\tlabel=${s.label}")
        .mkString("\n")
    case sql => render(spark.sql(sql))
  }

  private def render(df: DataFrame, max: Int = 20): String = {
    val rows = df.limit(max + 1).collect()
    val header = df.columns.mkString("\t")
    val body = rows.take(max).map(_.toSeq.map(v => String.valueOf(v)).mkString("\t"))
    val more = if (rows.length > max) s"\n... (> $max rows)" else ""
    (header +: body).mkString("\n") + more
  }
}
