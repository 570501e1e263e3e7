package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the union+window AS-OF join: against randomly
  * generated event logs, every purchase must attribute to exactly the
  * click a brute-force scan picks (latest click_id among max-ts clicks
  * at-or-before the purchase). Deterministic seeds, same style as
  * PipelinePropertySpec. */
class AsofPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private case class Ev(event_id: Long, tsUs: Long, user: Long, typ: String)

  private val evGen: Gen[(Long, Long, String)] = for {
    user <- Gen.choose(1L, 5L)
    // coarse grid => frequent exact-timestamp ties, the hard case
    tsUs <- Gen.choose(0L, 50L).map(_ * 60000000L)
    typ <- Gen.frequency(3 -> "click", 2 -> "purchase", 1 -> "view")
  } yield (user, tsUs, typ)

  private def sample(n: Int, seed: Long): List[Ev] =
    Gen.listOfN(n, evGen)
      .apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex
      .map { case ((u, t, ty), i) => Ev(i.toLong, t, u, ty) }

  private def brute(evs: List[Ev]): Map[Long, Option[Long]] = {
    val clicks = evs.filter(_.typ == "click")
      // same pre-dedup the operator does: one click per (user, ts), max id
      .groupBy(e => (e.user, e.tsUs))
      .map { case (_, g) => g.maxBy(_.event_id) }
      .toList
    evs.filter(_.typ == "purchase").map { p =>
      val eligible = clicks.filter(c => c.user == p.user && c.tsUs <= p.tsUs)
      val pick =
        if (eligible.isEmpty) None
        else {
          val maxTs = eligible.map(_.tsUs).max
          Some(eligible.filter(_.tsUs == maxTs).map(_.event_id).max)
        }
      p.event_id -> pick
    }.toMap
  }

  test("asofJoin equals the brute-force attribution on random logs") {
    import spark.implicits._
    for (seed <- Seq(7L, 21L, 99L)) {
      val evs = sample(120, seed)
      val dir = java.nio.file.Files.createTempDirectory("graft_asof_").toString
      evs.map(e => (e.event_id, e.tsUs * 1000L, e.user, e.typ, 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = graft.operators.RelationalMore.asofJoin(spark, dir)
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      assert(got === brute(evs), s"seed $seed")
    }
  }
}
