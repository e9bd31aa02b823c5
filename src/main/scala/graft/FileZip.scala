package graft

import java.nio.file.{Files, Path}

/** Single-entry zip helper (reference `FileTools.zipFile`) — ONE copy:
  * FileCollectorSink's rollover zip, RolloverCompat's rename pass and
  * SmtpClient's attachment-size rule previously carried byte-identical
  * private clones that had to be found and fixed together.
  */
object FileZip {

  /** Zip a file next to itself as `<file>.zip`; returns the zip path. */
  def zipFile(p: Path): Path =
    zipBytes(Path.of(p.toString + ".zip"), p.getFileName.toString,
      Files.readAllBytes(p))

  /** Write `bytes` as a one-entry archive at `zipPath`. */
  def zipBytes(zipPath: Path, entryName: String, bytes: Array[Byte]): Path = {
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry(entryName))
      zos.write(bytes)
      zos.closeEntry()
    } finally zos.close()
    zipPath
  }
}
