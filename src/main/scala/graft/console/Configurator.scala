package graft.console

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}

/** Interactive settings.xml builder (reference
  * `/root/reference/src/das/Configurator.java:13-443`): a per-session
  * question/answer state machine over the module grammar — pick a module,
  * answer its attribute questions (defaults on empty input, regex checks
  * with re-asks), and the node is merged into the settings file; the
  * wizard then loops back to the module question until `exit`.
  *
  * Covered modules (the ingest/front-door plane the console can
  * immediately boot): `stream` (tcp/udp/serial/mqtt/monitor with
  * address/label/eol), `path` (id + delimiter) and `telnet` (port +
  * title). The reference drives its wizard from a cf-grammar over every
  * module; the analytic modules here are declared in SQL instead, so the
  * wizard covers what SQL cannot: the wiring.
  */
class Configurator(file: Path) {
  import Configurator._

  private var filling: Option[Fill] = None

  private case class Fill(module: ModuleDef, answers: Map[String, String]) {
    def question: Q = module.questions(answers.size)
  }

  /** Intro + first question (reference `getStartMessage`). */
  def start(): String =
    s"Configurator for $file — which module? (${Modules.map(_.name).mkString("/")}), exit quits"

  /** One wizard turn: (reply text, finished). */
  def reply(input0: String): (String, Boolean) = {
    val input = input0.trim
    filling match {
      case None =>
        input.toLowerCase match {
          case "exit" | "" => ("Configurator closed.", true)
          case pick =>
            Modules.find(_.name == pick) match {
              case Some(m) =>
                filling = Some(Fill(m, Map.empty))
                (ask(m.questions.head), false)
              case None =>
                (s"No such module '$pick', pick one of ${Modules.map(_.name).mkString("/")}", false)
            }
        }
      case Some(f) =>
        val q = f.question
        val value = if (input.isEmpty) q.default.getOrElse("") else input
        if (value.isEmpty && q.default.isEmpty && q.required)
          (s"'${q.key}' is required. ${ask(q)}", false)
        else if (value.nonEmpty && !q.regex.forall(value.matches)) {
          (s"'$value' doesn't match ${q.regex.get}. ${ask(q)}", false)
        } else {
          val f2 = f.copy(answers = f.answers + (q.key -> value))
          if (f2.answers.size < f2.module.questions.size) {
            filling = Some(f2)
            (ask(f2.question), false)
          } else {
            filling = None
            write(f2.module, f2.answers)
            (s"Written <${f2.module.tag}> to $file. Next module? " +
              s"(${Modules.map(_.name).mkString("/")}), exit quits", false)
          }
        }
    }
  }

  private def ask(q: Q): String =
    s"${q.prompt}${q.default.map(d => s" [$d]").getOrElse("")}?"

  // ---- XML merge ----------------------------------------------------

  private def write(m: ModuleDef, a: Map[String, String]): Unit = {
    val builder = DocumentBuilderFactory.newInstance().newDocumentBuilder()
    val doc: Document =
      if (Files.exists(file))
        builder.parse(new org.xml.sax.InputSource(new java.io.StringReader(
          new String(Files.readAllBytes(file), StandardCharsets.UTF_8))))
      else {
        val d = builder.newDocument()
        d.appendChild(d.createElement("dcafs"))
        d
      }
    val root = doc.getDocumentElement
    def ensureChild(parent: Element, tag: String): Element =
      childrenOf(parent).find(_.getTagName == tag).getOrElse {
        val e = doc.createElement(tag)
        parent.appendChild(e)
        e
      }
    m.name match {
      case "stream" =>
        val s = doc.createElement("stream")
        s.setAttribute("id", a("id"))
        s.setAttribute("type", a("type"))
        def kid(tag: String, v: String): Unit =
          if (v.nonEmpty) {
            val e = doc.createElement(tag)
            e.setTextContent(v)
            s.appendChild(e)
            ()
          }
        kid("address", a("address"))
        kid("label", a.getOrElse("label", ""))
        kid("eol", a("eol"))
        ensureChild(root, "streams").appendChild(s)
      case "path" =>
        val p = doc.createElement("path")
        p.setAttribute("id", a("id"))
        p.setAttribute("delimiter", a("delimiter"))
        root.appendChild(p)
      case "telnet" =>
        val t = ensureChild(root, "telnet")
        t.setAttribute("port", a("port"))
        t.setAttribute("title", a("title"))
    }
    val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.INDENT, "yes")
    val out = new java.io.StringWriter()
    tf.transform(new javax.xml.transform.dom.DOMSource(doc),
      new javax.xml.transform.stream.StreamResult(out))
    Files.write(file, out.toString.getBytes(StandardCharsets.UTF_8))
    ()
  }

  private def childrenOf(el: Element): Seq[Element] = {
    val nodes = el.getChildNodes
    (0 until nodes.getLength).map(nodes.item).collect { case e: Element => e }
  }
}

object Configurator {
  final case class Q(key: String, prompt: String, default: Option[String],
      regex: Option[String], required: Boolean = true)
  final case class ModuleDef(name: String, tag: String, questions: Seq[Q])

  private val Modules = Seq(
    ModuleDef("stream", "stream", Seq(
      Q("id", "Stream id", None, Some("[A-Za-z0-9_]+")),
      Q("type", "Type (tcp/udp/serial/mqtt/monitor)", Some("tcp"),
        Some("tcp|udp|serial|mqtt|monitor")),
      Q("address", "Address (host:port or device/file path)", None, None),
      Q("label", "Label (empty skips)", Some(""), None, required = false),
      Q("eol", "EOL", Some("crlf"), None))),
    ModuleDef("path", "path", Seq(
      Q("id", "Path id", None, Some("[A-Za-z0-9_]+")),
      Q("delimiter", "Delimiter", Some(","), None))),
    ModuleDef("telnet", "telnet", Seq(
      Q("port", "Port", Some("2323"), Some("\\d+")),
      Q("title", "Title", Some("graft"), None))))
}
