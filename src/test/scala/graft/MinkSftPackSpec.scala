package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sft, TextDemos}

/** C112 min-k% probability and C113 SFT packing — closed-form fixtures.
  */
class MinkSftPackSpec extends SparkSpec {
  import spark.implicits._

  // ---- C112 mink_score ------------------------------------------------

  test("C112 mink selects the lowest m transition occurrences exactly") {
    // corpus: 'a a a a b' + 'a a a a a'. Bigrams doc1: (a,a)x3,(a,b)x1;
    // doc2: (a,a)x4. Corpus: cb(a,a)=7, cb(a,b)=1; cu(a)=8; V=2.
    // lp(a,a)=ln(7.5/9); lp(a,b)=ln(1.5/9). doc1 n=4, m=max(1,floor(.8))=1?
    // kFrac=0.5 -> m=2: lowest 2 occurrences = (a,b) once + (a,a) once.
    val docs = Seq((1L, "a a a a b"), (2L, "a a a a a")).toDF("doc_id", "text")
    val got = TextDemos.minkScoreOn(docs, kFrac = 0.5, flagAbove = -0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    def lp(x: Double) = math.round(math.log(x) * 1e6) / 1e6
    val lpAA = lp(7.5 / 9); val lpAB = lp(1.5 / 9)
    // doc1: m=2, lowest = lpAB (1 occ) + lpAA (1 occ partial from tf=3)
    assert(got(0)._1 == 1L && got(0)._2 == 4L && got(0)._3 == 2L)
    assert(math.abs(got(0)._4 - (lpAB + lpAA) / 2) < 1e-9)
    // doc2: m=2, both occurrences from the (a,a) group
    assert(got(1)._1 == 2L && got(1)._3 == 2L)
    assert(math.abs(got(1)._4 - lpAA) < 1e-9)
    // doc2's rarest transitions are still common -> flags; doc1 doesn't
    assert(!got(0)._5 && got(1)._5)
  }

  test("C112 m floors at 1 for tiny docs; kFrac=1 reproduces the C39 average") {
    val docs = Seq((1L, "x y"), (2L, "p q r p q")).toDF("doc_id", "text")
    val mink1 = TextDemos.minkScoreOn(docs, kFrac = 0.01).collect()
    assert(mink1.forall(_.getLong(2) == 1L)) // m = 1 everywhere
    val minkAll = TextDemos.minkScoreOn(docs, kFrac = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val avg = TextDemos.bigramLmScoreOn(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    avg.foreach { case (id, a) =>
      assert(math.abs(minkAll(id) - a) < 1e-9, s"doc $id") }
  }

  test("C112 demo plants flag and non-plants mostly don't (sf0.001)") {
    val got = graft.SparkEntry.queries("mink_score")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(4)))
    val (plants, rest) = got.partition(_._1 % 31 == 0)
    assert(plants.nonEmpty && plants.forall(_._2),
      "every planted doc must flag")
    val fp = rest.count(_._2).toDouble / rest.size
    assert(fp < 0.2, s"false-positive rate $fp too high")
  }

  // ---- C113 sft_pack --------------------------------------------------

  private val turns = Seq(
    // conv 0: 3 turns, 4+2+3 tokens
    (0L, 0L, "user", "w w w w"), (0L, 1L, "assistant", "w w"),
    (0L, 2L, "user", "w w w"),
    // conv 2: same shard (conv % 2 = 0), 5 tokens
    (2L, 0L, "user", "w w w w w"),
    // conv 1: other shard, 2 tokens
    (1L, 0L, "assistant", "w w")
  ).toDF("conv_id", "turn_idx", "role", "content")

  test("C113 offsets: conversations concat per shard, turns concat per conversation") {
    val got = Sft.packConversations(turns, "conv_id", "turn_idx", "role",
        "content", c => pmod(c, lit(2L)), capacity = 8)
      .orderBy("shard", "conv_id", "turn_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    // shard 0: conv0 spans [0,9), conv2 [9,14); capacity 8 splits
    assert(got(0) == ((0L, 0L, 0L, 4L, 0L, 0L, 0L, false)))  // user, no loss
    assert(got(1) == ((0L, 0L, 1L, 2L, 4L, 0L, 0L, true)))   // assistant
    assert(got(2) == ((0L, 0L, 2L, 3L, 6L, 0L, 1L, false)))  // crosses chunk 0->1
    assert(got(3) == ((0L, 2L, 0L, 5L, 9L, 1L, 1L, false)))
    // shard 1: conv1 starts at 0 in ITS shard
    assert(got(4) == ((1L, 1L, 0L, 2L, 0L, 0L, 0L, true)))
  }

  test("C113 loss mask marks exactly the assistant turns") {
    val got = Sft.packConversations(turns, "conv_id", "turn_idx", "role",
      "content", c => pmod(c, lit(2L)), capacity = 100)
    val byRole = got.groupBy("role").agg(
      sum(when(col("loss_mask"), 1L).otherwise(0L)).as("masked"),
      count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byRole("assistant")._1 == byRole("assistant")._2)
    assert(byRole("user")._1 == 0L)
  }

  test("C113 token accounting: per-shard max(start+n_tokens) equals the shard token sum") {
    val got = Sft.packConversations(turns, "conv_id", "turn_idx", "role",
        "content", c => pmod(c, lit(2L)), capacity = 4)
      .groupBy("shard").agg(max(col("start_off") + col("n_tokens")).as("end"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 14L, 1L -> 2L))
  }
}
