package graft.ingest

import java.io.{File, FileInputStream, FileOutputStream}
import java.util.zip.ZipInputStream

/** S3 — archive extraction (SURVEY §2.1).
  *
  * Stage-0 ingest unpacks the selected export archive before any Spark
  * job runs — a driver-side pre-step, like the reference
  * (`src/io/zip_extractor.py:101-233`; its AES path needs pyzipper and is
  * out of engine scope — plain-zip only here, via java.util.zip).
  * Entry paths are sanitized against zip-slip.
  */
object ZipExtract {

  /** Extract `zipPath` under `destDir`; returns extracted file paths.
    * Refuses entries that would escape `destDir`. */
  def extract(zipPath: String, destDir: String): Seq[String] = {
    val dest = new File(destDir).getCanonicalFile
    dest.mkdirs()
    val zin = new ZipInputStream(new FileInputStream(zipPath))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val target = new File(dest, e.getName).getCanonicalFile
        require(target.getPath.startsWith(dest.getPath + File.separator) ||
          target.getPath == dest.getPath,
          s"zip entry escapes destination: ${e.getName}")
        if (e.isDirectory) target.mkdirs()
        else {
          target.getParentFile.mkdirs()
          val fos = new FileOutputStream(target)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = zin.read(buf)
            while (n > 0) { fos.write(buf, 0, n); n = zin.read(buf) }
          } finally fos.close()
          out += target.getPath
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toSeq
  }
}
