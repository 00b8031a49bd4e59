package graft

import org.apache.spark.sql.functions._

import graft.ext.Bpe

/** Hand-checkable BPE training on a fixture corpus: the merge
  * trajectory, weighted counts, greedy-leftmost application, and the
  * chained-adjacency case are all verified against paper arithmetic
  * (the sf-corpus trajectory itself is driver-hash-gated through
  * `x4_bpe_merges`'s unrolled DuckDB mirror). */
class BpeSpec extends SparkSpec {

  private def fixtureDir(docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-bpe").toFile.getAbsolutePath
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("merge trajectory matches hand-computed weighted BPE") {
    // vocab: aaab×3, ab×2, b×1
    //   gen0 pairs: (a,a)=6, (a,b)=3+2=5           → merge1 (a,a), cnt 6
    //   gen1: aaab=[aa,a,b] → (aa,a)=3, (a,b)=3+2  → merge2 (a,b), cnt 5
    //   gen2: aaab=[aa,ab], ab=[ab] → (aa,ab)=3    → merge3 (aa,ab), cnt 3
    val dir = fixtureDir(Seq(
      (1L, "aaab aaab ab", "s0"),
      (2L, "aaab ab b", "s1")))
    val (merges, vocab) = Bpe.learn(spark, dir, n = 3)
    assert(merges.map(m => (m.a, m.b, m.cnt)) ===
      Seq(("a", "a", 6L), ("a", "b", 5L), ("aa", "ab", 3L)))
    val reprs = vocab.select(col("w"), col("repr")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reprs("aaab") === "||aaab||")
    assert(reprs("ab") === "||ab||")
    assert(reprs("b") === "||b||")
    vocab.unpersist()
  }

  test("chained adjacent merges apply in one scan (abab -> [ab, ab])") {
    val dir = fixtureDir(Seq((1L, "abab abab", "s0")))
    // gen0 pairs in abab: (a,b)=2, (b,a)=1, weight 2 → merge1 (a,b)
    val (merges, vocab) = Bpe.learn(spark, dir, n = 1)
    assert(merges.head.a === "a" && merges.head.b === "b" && merges.head.cnt === 4L)
    val repr = vocab.filter(col("w") === "abab").head().getAs[String]("repr")
    assert(repr === "||ab||ab||", s"chained merge broke: $repr")
    vocab.unpersist()
  }

  test("single-char words survive training and count one token") {
    val dir = fixtureDir(Seq((1L, "a b ab ab", "s0")))
    val (_, vocab) = Bpe.learn(spark, dir, n = 1)
    val reprs = vocab.collect().map(r =>
      r.getAs[String]("w") -> r.getAs[String]("repr")).toMap
    assert(reprs("a") === "||a||")
    assert(reprs("ab") === "||ab||")
    vocab.unpersist()
  }
}
