package graft.ops

/** T3 — fuzzy column-name matcher
  * (/root/reference/ingestor_precinct.py:125-132:
  * `fuzzywuzzy.process.extractOne(schemaCol, df.columns)`, accept
  * threshold >60, special fallback `candidate` → retry with `choice`).
  *
  * Driver-side metadata work (N schema cols × M incoming cols, both
  * tiny) — deliberately NOT a distributed op (SURVEY.md §2a T3).
  * Similarity is a normalized-Levenshtein ratio over case-folded,
  * separator-normalized names; same contract as the reference
  * (0–100 score, best match wins, threshold gate).
  */
object FuzzyMatch {

  val Threshold = 60

  private def norm(s: String): String =
    s.toLowerCase.replaceAll("[_\\-\\s]+", " ").trim

  private[graft] def levenshtein(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  /** 0–100 similarity, fuzzywuzzy-style `ratio`. */
  def ratio(a: String, b: String): Int = {
    val (x, y) = (norm(a), norm(b))
    val m = math.max(x.length, y.length)
    if (m == 0) 100 else math.round(100.0 * (1.0 - levenshtein(x, y).toDouble / m)).toInt
  }

  /** Best (column, score) for a target name, None if input empty. */
  def extractOne(target: String, columns: Seq[String]): Option[(String, Int)] =
    columns.map(c => (c, ratio(target, c))).sortBy(-_._2).headOption

  /** Reference mapping pass: for each grand-schema column, best incoming
    * column if score > 60; `candidate` falls back to matching `choice`
    * (:127-128). Returns canonicalName → sourceColumn. */
  def mapColumns(schemaCols: Seq[String], incoming: Seq[String]): Map[String, String] =
    schemaCols.flatMap { sc =>
      val m = extractOne(sc, incoming) match {
        case Some((_, score)) if sc == "candidate" && score < Threshold =>
          extractOne("choice", incoming)
        case other => other
      }
      m.collect { case (c, score) if score > Threshold => sc -> c }
    }.toMap
}
