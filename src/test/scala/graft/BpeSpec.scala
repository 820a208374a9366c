package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.llm.Bpe

/** Differential gate for the distributed BPE merge learner: the full
  * merge sequence must equal a straightforward in-memory reference run
  * on the same corpus (same tie-break: count desc, left asc, right asc).
  */
class BpeSpec extends AnyFunSuite with Matchers with SparkTest {
  private val dir = "/root/testdata/sf0.001"

  private def refMerges(texts: Seq[String],
      n: Int): Seq[(Int, String, String, Long)] = {
    var words: Map[Seq[String], Long] = texts
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) =>
        (w.map(_.toString) :+ Bpe.EndOfWord, c)
      }
    (1 to n).flatMap { rank =>
      val counts = collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((syms, cnt) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += cnt
      if (counts.isEmpty) None
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        words = words.groupMapReduce {
          case (syms, _) => Bpe.fuse(syms, l, r)
        } { case (_, cnt) => cnt }(_ + _)
        Some((rank, l, r, c))
      }
    }
  }

  test("fuse: merges every non-overlapping occurrence, left to right") {
    Bpe.fuse(Seq("a", "b", "a", "b"), "a", "b") shouldBe Seq("ab", "ab")
    Bpe.fuse(Seq("a", "a", "a"), "a", "a") shouldBe Seq("aa", "a")
    Bpe.fuse(Seq("x"), "a", "b") shouldBe Seq("x")
    Bpe.fuse(Seq(), "a", "b") shouldBe Seq()
  }

  test("learned merge sequence equals the in-memory reference") {
    val docs = Tables(spark, dir, "documents")
    val got = Bpe.learnMerges(docs, nMerges = 12)
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val want = refMerges(texts, 12)
    got shouldBe want
    got.length shouldBe 12 // the fixture corpus has ≥ 12 learnable pairs
    ops.Caches.drain()
  }

  test("vocab query equals the reference encoder's token counts") {
    val texts = Tables(spark, dir, "documents")
      .select("text").collect().map(_.getString(0)).toSeq
    // reference final word table after 20 merges
    var words: Map[Seq[String], Long] = texts
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => (w.map(_.toString) :+ Bpe.EndOfWord, c) }
    refMerges(texts, 20).foreach { case (_, l, r, _) =>
      words = words.groupMapReduce {
        case (syms, _) => Bpe.fuse(syms, l, r)
      } { case (_, cnt) => cnt }(_ + _)
    }
    val tokenCounts = collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for ((syms, cnt) <- words; t <- syms) tokenCounts(t) += cnt
    val want = tokenCounts.toSeq.sortBy { case (t, c) => (-c, t) }.take(25)
      .map { case (t, c) => (t, c, t.length) }
    val got = Registry.all("q_text_bpe_vocab").fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    got shouldBe want
    ops.Caches.drain()
  }
}
