package graft

import java.io.File
import java.nio.file.{Files, Paths}

/** Shared test support for validating rendered sync files against the
  * reference Pure XSD contract (docs/person.xsd, user.xsd, commons.xsd)
  * — used by XmlSchemaSpec (renderer-level) and RunnerSpec (cycle-level).
  */
object XsdSupport {
  val xsdDir = "/root/reference/docs"

  def xsdsPresent: Boolean = Files.isDirectory(Paths.get(xsdDir))

  /** Throws on schema violation. commons.xsd resolves via the xsd's
    * relative schemaLocation because the factory gets a file-backed
    * source.
    */
  def validate(xmlPath: String, xsdName: String): Unit = {
    val factory = javax.xml.validation.SchemaFactory
      .newInstance(javax.xml.XMLConstants.W3C_XML_SCHEMA_NS_URI)
    factory.newSchema(new File(s"$xsdDir/$xsdName")).newValidator()
      .validate(new javax.xml.transform.stream.StreamSource(
        new File(xmlPath)))
  }

  /** Namespace-aware DOM parse; throws if not well-formed. */
  def parseDom(path: String): org.w3c.dom.Document = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    dbf.newDocumentBuilder().parse(new File(path))
  }
}
