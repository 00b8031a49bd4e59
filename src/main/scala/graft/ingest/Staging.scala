package graft.ingest

import java.io.{BufferedInputStream, File, FileInputStream, FileOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.util.zip.ZipInputStream

/** S1 + S2 — staging-side acquisition
  * (/root/reference/ingestor_precinct.py:70-107: chunked streaming
  * HTTP download with progress, then unzip-and-delete).
  *
  * These are NOT engine operators (SURVEY.md §7.4): Spark reads
  * gz/bz2 natively but not zip members, and downloads belong on a
  * staging host/job, not in a query plan. They're provided so an
  * ingest job can stage a bundle and hand the directory to
  * [[RawReader.readDir]]. Download is chunk-streamed (the reference's
  * 4096-byte loop) so memory stays bounded regardless of file size.
  */
object Staging {

  val ChunkSize = 4096

  /** Streamed download with optional progress callback
    * (bytesSoFar, totalOrMinusOne). Returns the target file. */
  def download(url: String, destDir: File,
      progress: (Long, Long) => Unit = (_, _) => ()): File = {
    val name = url.split('/').last
    val dest = new File(destDir, name)
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(60000)
    conn.setInstanceFollowRedirects(true)
    val code = conn.getResponseCode
    // HttpURLConnection won't follow cross-protocol redirects
    // (http→https): surface that — and any error page — instead of
    // silently staging the response body as data
    if (code != HttpURLConnection.HTTP_OK)
      throw new java.io.IOException(s"download failed: HTTP $code for $url")
    val total = conn.getContentLengthLong
    val in = new BufferedInputStream(conn.getInputStream)
    try copyStream(in, dest, total, progress) finally in.close()
    dest
  }

  /** Unzip an archive into its directory, then delete it (reference
    * behavior at :102-107). Rejects entries escaping the target dir. */
  def unzipAndDelete(zipFile: File): Seq[File] = {
    val destDir = zipFile.getParentFile
    val out = Seq.newBuilder[File]
    val zin = new ZipInputStream(new BufferedInputStream(new FileInputStream(zipFile)))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (!entry.isDirectory) {
          val target = new File(destDir, entry.getName)
          if (!target.getCanonicalPath.startsWith(destDir.getCanonicalPath + File.separator))
            throw new IllegalArgumentException(s"zip entry escapes target dir: ${entry.getName}")
          target.getParentFile.mkdirs()
          copyStream(zin, target, -1, (_, _) => ())
          out += target
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
    } finally zin.close()
    zipFile.delete()
    out.result()
  }

  private def copyStream(in: InputStream, dest: File, total: Long,
      progress: (Long, Long) => Unit): Unit = {
    val os = new FileOutputStream(dest)
    try {
      val buf = new Array[Byte](ChunkSize)
      var written = 0L
      var n = in.read(buf)
      while (n >= 0) {
        os.write(buf, 0, n)
        written += n
        progress(written, total)
        n = in.read(buf)
      }
    } finally os.close()
  }
}
