package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.{Shingles, StringFunctions}

/** The round-3 custom expressions: the Shingles generator must be
  * row-for-row equivalent to the composed expression form it replaces,
  * and NfcNormalize must implement real canonical composition in both
  * interpreted and codegen paths. */
class GeneratorExprSpec extends SparkSpec {

  test("Shingles generator ≡ explode(array_distinct(transform(...)))") {
    import spark.implicits._
    val docs = Seq(
      (0L, "abcdefghij"),          // plain
      (1L, "aaaaaaaaaa"),          // one distinct shingle
      (2L, "short"),               // len < n → whole text once
      (3L, ""),                    // empty → substring(1,8) of "" = "" once
      (4L, "the quick brown fox jumps over the lazy dog the quick brown"))
      .toDF("doc_id", "text")
    val viaGen = docs
      .select(col("doc_id"), Shingles.shingles(col("text"), 8).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val viaExpr = docs
      .select(col("doc_id"), explode(expr(Dedup.shinglesExpr)).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(viaGen.nonEmpty)
    assert(viaGen.toSeq === viaExpr.toSeq)
  }

  test("Shingles generator: null text emits nothing, distinct per row only") {
    import spark.implicits._
    val docs = Seq((0L, Option("abab")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), Shingles.shingles(col("text"), 2).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // "abab" 2-grams: ab, ba, ab → distinct {ab, ba}; null row dropped
    assert(out.toSet === Set((0L, "ab"), (0L, "ba")))
  }

  test("Shingles generator: unicode code points, not bytes") {
    import spark.implicits._
    val out = Seq((0L, "h\u00e9llo")).toDF("doc_id", "text")
      .select(Shingles.shingles(col("text"), 3).as("s"))
      .collect().map(_.getString(0)).toSet
    assert(out === Set("h\u00e9l", "\u00e9ll", "llo"))
  }

  test("Shingles registers as a SQL function") {
    Shingles.register(spark)
    val n = spark.sql("SELECT shingles(text, 4) AS s FROM VALUES ('abcdef') t(text)")
      .count()
    assert(n === 3) // abcd, bcde, cdef
  }

  test("nfc_normalize composes decomposed sequences (both eval paths)") {
    import spark.implicits._
    val decomposed = "e\u0301clair" // e + combining acute (7 code points)
    val df = Seq((1L, decomposed), (2L, "plain"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val out = df.select(col("id"), StringFunctions.nfc_normalize(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("\u00e9clair")) // precomposed, one code point shorter
    assert(out(1L).get.length === decomposed.length - 1)
    assert(out(2L) === Some("plain"))
    assert(out(3L) === None)
    // interpreted path (no codegen) must agree
    val interp = graft.functions.NfcHelper.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)).toString
    assert(interp === "\u00e9clair")
  }

  test("nfc_normalize registers as a SQL function and stays codegen-compatible") {
    StringFunctions.register(spark)
    val r = spark.sql(
      "SELECT length(nfc_normalize('e\\u0301')) AS l, nfc_normalize(NULL) AS nn").head()
    assert(r.getInt(0) === 1)
    assert(r.isNullAt(1))
  }
}
