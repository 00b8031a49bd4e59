package graft

import org.apache.spark.sql.functions._

import graft.lake.Lake

/** Model-based protocol test for the [[graft.lake.Lake]] format: a
  * SEEDED random sequence of table operations (upsert / delete /
  * merge / compact / restore) runs against both the real table and an
  * in-memory reference model (key → priority string); after every op
  * the snapshot must equal the model, and at the end every retained
  * historical version must still read back exactly as the model
  * remembered it — snapshot isolation, CoW merge, restore, and
  * manifest bookkeeping exercised in combination rather than one
  * scenario at a time. */
class LakeModelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("random op sequences: table state always equals the reference model") {
    import spark.implicits._
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("graft-lake-model").toFile
      d.delete(); d.getAbsolutePath
    }
    val rnd = new scala.util.Random(20260814L)
    val keyDomain = 0L until 400L

    def frame(rows: Map[Long, String]) =
      rows.toSeq.toDF("k", "v")

    // model + history of committed versions
    var model = keyDomain.take(200).map(k => k -> s"v0-$k").toMap
    Lake.create(frame(model), dir, "k", targetFiles = 4)
    val history = scala.collection.mutable.Map(1L -> model)
    var latest = 1L

    def snapshot(version: Long = 0L): Map[Long, String] =
      Lake.read(spark, dir, version).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap

    for (step <- 1 to 14) {
      rnd.nextInt(5) match {
        case 0 => // upsert: random batch of updates + inserts
          val batch = (1 to 30).map { _ =>
            val k = keyDomain(rnd.nextInt(keyDomain.length))
            k -> s"s$step-$k"
          }.toMap
          latest = Lake.upsert(spark, dir, frame(batch))
          model = model ++ batch
        case 1 => // delete: random key subset (some absent — no-ops)
          val victims = (1 to 20).map(_ => keyDomain(rnd.nextInt(keyDomain.length))).toSet
          latest = Lake.delete(spark, dir, victims.toSeq.toDF("k"))
          model = model -- victims
        case 2 => // compact: state-invariant maintenance
          latest = Lake.compact(spark, dir, targetFiles = 2 + rnd.nextInt(3))
        case 3 => // restore: roll back to a random retained version
          val target = 1L + rnd.nextInt(latest.toInt).toLong
          latest = Lake.restore(spark, dir, target)
          model = history(target)
        case 4 => // merge: upserts + deletes in ONE commit, deletes win
          val ups = (1 to 15).map { _ =>
            val k = keyDomain(rnd.nextInt(keyDomain.length))
            k -> s"m$step-$k"
          }.toMap
          val dels = (1 to 10).map(_ => keyDomain(rnd.nextInt(keyDomain.length))).toSet
          latest = Lake.merge(spark, dir, frame(ups), dels.toSeq.toDF("k"))
          model = (model ++ ups) -- dels
      }
      history(latest) = model
      assert(snapshot() === model, s"state diverged after step $step (v$latest)")
      assert(Lake.metaCount(dir) === model.size.toLong,
        s"metadata count diverged after step $step")
    }
    // every remembered version still time-travels to exactly its state
    history.foreach { case (v, m) =>
      assert(snapshot(v) === m, s"time travel to v$v diverged")
    }
    // change feeds across the whole history replay to the final state
    val replayed = history(1L) ++ Seq.empty // fold the feed over v1
    val feed = Lake.changes(spark, dir, 1L, latest).collect()
    val folded = feed
      .groupBy(r => r.getAs[Long]("_commit_version")).toSeq.sortBy(_._1)
      .foldLeft(replayed) { case (state, (_, rows)) =>
        rows.foldLeft(state) { (s, r) =>
          val k = r.getAs[Long]("k")
          r.getAs[String]("_change_type") match {
            case "insert" | "update_postimage" => s + (k -> r.getAs[String]("v"))
            case "delete" => s - k
            case _ => s // update_preimage carries the old image
          }
        }
      }
    assert(folded === model, "CDF replay of the full history diverged from final state")
  }
}
