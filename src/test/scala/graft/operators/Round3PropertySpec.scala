package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Algebraic properties of the round-3 operators — the invariants a user
  * relies on without reading the implementation. Seeded-random cases (no
  * scalatestplus bridge in this env), deterministic across runs. */
class Round3PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("blockDedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    val vocab = Array("a", "b", "c", "d")
    (1 to 6).foreach { _ =>
      val docs = (0 until 6).map { i =>
        val words = Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
        (i.toLong, words.mkString(" "))
      }.toDF("id", "txt")
      val once = Dedup.blockDedup(docs, "id", "txt", blockWords = 2)
      val twice = Dedup.blockDedup(
        once.select(col("doc_id").as("id"), col("text_dedup").as("txt")),
        "id", "txt", blockWords = 2)
      assert(twice.collect().map(_.toSeq).toSet == once.collect().map(_.toSeq).toSet)
    }
  }

  test("zValue2 is invertible: decoding the interleave recovers (a, b)") {
    val pairs = (1 to 60).map(_ => (rnd.nextInt(1 << 16), rnd.nextInt(1 << 16)))
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue2(col("a"), col("b"), 16).as("z"))
      .collect()
    def deinterleave(z: Long, off: Int): Long =
      (0 until 16).foldLeft(0L)((acc, i) => acc | (((z >> (2 * i + off)) & 1L) << i))
    out.foreach { r =>
      assert(deinterleave(r.getLong(2), 0) == r.getInt(0).toLong)
      assert(deinterleave(r.getLong(2), 1) == r.getInt(1).toLong)
    }
  }

  test("semanticDecontaminate is monotone: a higher threshold keeps a superset") {
    (1 to 4).foreach { _ =>
      val emb = (0 until 12).map(i =>
        (i.toLong, Seq.fill(4)((rnd.nextInt(11) - 5).toFloat))).toDF("vec_id", "embedding")
      val corpus = emb.filter(col("vec_id") % 3 =!= 0)
      val bench = emb.filter(col("vec_id") % 3 === 0)
      def surviving(t: Double) =
        Dedup.semanticDecontaminate(corpus, bench, "vec_id", "embedding", t)
          .select("vec_id").as[Long].collect().toSet
      val loose = surviving(0.9)
      val strict = surviving(0.3)
      assert(strict.subsetOf(loose),
        s"survivors at 0.3 ($strict) not a subset of survivors at 0.9 ($loose)")
    }
  }

  test("saltedJoin equals the plain join on random data for any salt count") {
    (1 to 5).foreach { _ =>
      val salts = 1 + rnd.nextInt(9)
      val large = (0 until 40).map(i => (rnd.nextInt(6), i, rnd.nextInt(1000)))
        .toDF("k", "rid", "v")
      val small = (0 to 3).map(k => (k, s"dim$k")).toDF("sk", "name")
      val salted = Relational.saltedJoin(large, small, "k", "sk", col("rid"), salts)
        .select("k", "rid", "v", "name").collect().map(_.toSeq)
      val plain = large.join(small, col("k") === col("sk"))
        .select("k", "rid", "v", "name").collect().map(_.toSeq)
      assert(salted.sortBy(_.mkString("|")).toSeq == plain.sortBy(_.mkString("|")).toSeq,
        s"salted join diverged at salts=$salts")
    }
  }

}
