package graft.ingest

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S3 — delimiter inference (/root/reference/ingestor_precinct.py:27-31:
  * `csv.Sniffer().sniff(first line)`).
  *
  * Driver-side, metadata-sized: reads ONE line of ONE file; the result
  * is passed to the distributed CSV scan as `option("sep", …)`. Spark's
  * CSV reader has no sniffer, so this is the tiny helper SURVEY.md §2a
  * calls for. Candidate set mirrors csv.Sniffer's preferred list.
  */
object Sniffer {

  val candidates: Seq[Char] = Seq(',', '\t', ';', '|', ':')

  /** Pick the candidate with the highest count in the header line
    * (ties → earlier candidate, like csv.Sniffer's preference order). */
  def sniffLine(line: String): String = {
    val best = candidates.maxBy(c => line.count(_ == c))
    if (line.count(_ == best) == 0) "," else best.toString
  }

  def sniffFile(path: String): String = {
    val reader = Files.newBufferedReader(Paths.get(path))
    try sniffLine(Option(reader.readLine()).getOrElse(""))
    finally reader.close()
  }
}
