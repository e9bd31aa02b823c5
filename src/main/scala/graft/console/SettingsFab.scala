package graft.console

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import javax.xml.parsers.DocumentBuilderFactory

import org.w3c.dom.{Document, Element}

/** Settings.xml mutation helper — the analog of the reference's `XMLfab`
  * (`/root/reference/src/util/xml/XMLfab.java`), which `CommandPool` /
  * `StreamManager` use to persist command-plane mutations so e.g.
  * `ss:addtcp,...` survives a restart (`StreamManager.java:507-523`
  * `addStreamToXML`). Same contract here: parse (or create) the document,
  * upsert the node keyed by id, rewrite the file atomically-enough for a
  * single-writer console.
  */
object SettingsFab {

  /** Upsert a `<stream id=.. type=..>` node under `<streams>`, replacing an
    * existing node with the same id (the reference's overwrite path,
    * `StreamManager.java:507-516`).
    */
  def upsertStream(file: Path, id: String, kind: String, address: String,
      label: String): Unit = mutate(file) { doc =>
    val streams = ensureChild(doc, doc.getDocumentElement, "streams")
    childrenOf(streams)
      .filter(e => e.getTagName == "stream" && e.getAttribute("id") == id)
      .foreach(streams.removeChild)
    val s = doc.createElement("stream")
    s.setAttribute("id", id)
    s.setAttribute("type", kind)
    def kid(tag: String, v: String): Unit = if (v.nonEmpty) {
      val e = doc.createElement(tag)
      e.setTextContent(v)
      s.appendChild(e); ()
    }
    kid("address", address)
    kid("label", label)
    streams.appendChild(s); ()
  }

  /** Remove a `<stream>` node by id; returns true when one was removed. */
  def removeStream(file: Path, id: String): Boolean = {
    var removed = false
    mutate(file) { doc =>
      childrenOf(doc.getDocumentElement)
        .filter(_.getTagName == "streams")
        .foreach { streams =>
          childrenOf(streams)
            .filter(e => e.getTagName == "stream" && e.getAttribute("id") == id)
            .foreach { e => streams.removeChild(e); removed = true }
        }
    }
    removed
  }

  /** Upsert an (empty) `<path id=.. delimiter=..>` node under the root —
    * the declaration `pf:add` creates (reference `ForwardPool` writes path
    * nodes the same way the Configurator wizard does).
    */
  def upsertPath(file: Path, id: String, delimiter: String): Unit =
    mutate(file) { doc =>
      val root = doc.getDocumentElement
      childrenOf(root)
        .filter(e => e.getTagName == "path" && e.getAttribute("id") == id)
        .foreach(root.removeChild)
      val p = doc.createElement("path")
      p.setAttribute("id", id)
      p.setAttribute("delimiter", delimiter)
      root.appendChild(p); ()
    }

  private def mutate(file: Path)(f: Document => Unit): Unit = {
    val builder = graft.DcafsXml.newSecureBuilder()
    val doc: Document =
      if (Files.exists(file))
        builder.parse(new org.xml.sax.InputSource(new java.io.StringReader(
          new String(Files.readAllBytes(file), StandardCharsets.UTF_8))))
      else {
        val d = builder.newDocument()
        d.appendChild(d.createElement("dcafs"))
        d
      }
    f(doc)
    val tf = javax.xml.transform.TransformerFactory.newInstance().newTransformer()
    tf.setOutputProperty(javax.xml.transform.OutputKeys.INDENT, "yes")
    val out = new java.io.StringWriter()
    tf.transform(new javax.xml.transform.dom.DOMSource(doc),
      new javax.xml.transform.stream.StreamResult(out))
    Files.write(file, out.toString.getBytes(StandardCharsets.UTF_8))
    ()
  }

  private def ensureChild(doc: Document, parent: Element, tag: String): Element =
    childrenOf(parent).find(_.getTagName == tag).getOrElse {
      val e = doc.createElement(tag)
      parent.appendChild(e)
      e
    }

  private def childrenOf(el: Element): Seq[Element] = {
    val nodes = el.getChildNodes
    (0 until nodes.getLength).map(nodes.item).collect { case e: Element => e }
  }
}
