package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Round-3 operators: skew-salted join, block-level dedup with document
  * rebuild, and embedding-space decontamination. */
class SaltBlockDecontamSpec extends SparkSpec {
  import spark.implicits._

  // ---- saltedJoin -----------------------------------------------------------

  private val large = Seq(
    (1, 10, "a"), (1, 11, "b"), (1, 12, "c"), (1, 13, "d"), // hot key
    (2, 20, "e"), (3, 30, "f"), (4, 40, "g")).toDF("k", "rid", "payload")
  private val small = Seq((1, "dim1"), (2, "dim2"), (3, "dim3")).toDF("sk", "name")

  test("saltedJoin inner equals the plain join exactly (q91)") {
    val salted = Relational.saltedJoin(large, small, "k", "sk",
      scatterBy = col("rid"), salts = 4)
      .select("k", "rid", "payload", "name")
    val plain = large.join(small, col("k") === col("sk"))
      .select("k", "rid", "payload", "name")
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == plain.count()) // multiset equality (rid unique)
  }

  test("saltedJoin left keeps unmatched large rows exactly once") {
    val salted = Relational.saltedJoin(large, small, "k", "sk",
      scatterBy = col("rid"), salts = 3, joinType = "left")
      .select("k", "rid", "name")
    val plain = large.join(small, col("k") === col("sk"), "left")
      .select("k", "rid", "name")
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == plain.count())
    // key 4 has no dim row: survives with null name, not dropped, not duplicated
    assert(salted.filter(col("k") === 4).count() == 1)
  }

  test("saltedJoin scatters a hot key across salt sub-keys in the plan") {
    // the whole point: the shuffle must key on (key, salt), not key alone —
    // assert every hash exchange below the join carries >1 partition expr
    // disable auto-broadcast so the join actually shuffles (as it would at
    // scale when neither side fits)
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false").map { case (k, v) =>
      val old = spark.conf.getOption(k); spark.conf.set(k, v); k -> old
    }
    try {
      val salted = Relational.saltedJoin(large, small, "k", "sk",
        scatterBy = col("rid"), salts = 4)
      val exchanges = salted.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.outputPartitioning
      }
      assert(exchanges.nonEmpty)
      exchanges.foreach {
        case hp: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          assert(hp.expressions.size >= 2,
            s"join shuffle must include the salt: ${hp.expressions}")
        case other => fail(s"unexpected partitioning $other")
      }
      assert(salted.count() == 6)
    } finally saved.foreach { case (k, old) =>
      old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("saltedJoin rejects unsupported join types and bad salt counts") {
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(large, small, "k", "sk", col("rid"), salts = 0)
    }
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(large, small, "k", "sk", col("rid"), 4, "full_outer")
    }
  }

  // ---- blockDedup -----------------------------------------------------------

  test("blockDedup keeps canonical occurrence and rebuilds in order (q93)") {
    // 2-word blocks: doc 1 = [a b][c d], doc 2 = [c d][x y] — "c d" in doc 2
    // is a duplicate of doc 1's block and must vanish
    val docs = Seq((1, "a b c d"), (2, "c d x y")).toDF("id", "txt")
    val out = Dedup.blockDedup(docs, "id", "txt", blockWords = 2)
      .orderBy("doc_id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((1, "a b c d"), (2, "x y")))
  }

  test("blockDedup drops a doc whose every block is a duplicate") {
    val docs = Seq((1, "a b c d"), (2, "a b c d"), (3, "fresh words")).toDF("id", "txt")
    val out = Dedup.blockDedup(docs, "id", "txt", blockWords = 2)
    assert(out.select("doc_id").as[Int].collect().toSet == Set(1, 3))
  }

  test("blockDedup within-doc repetition keeps only the first occurrence") {
    val docs = Seq((7, "x y x y x y")).toDF("id", "txt")
    val out = Dedup.blockDedup(docs, "id", "txt", blockWords = 2).collect()
    assert(out.length == 1 && out(0).getString(1) == "x y")
  }

  test("blockDedup handles ragged tails (doc length not a block multiple)") {
    val docs = Seq((1, "a b c"), (2, "d e")).toDF("id", "txt")
    val out = Dedup.blockDedup(docs, "id", "txt", blockWords = 2)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("a b c", "d e")) // tails "c" and full "d e" both unique
  }

  test("blockDedup canonical choice is least (doc, blk), not arrival order") {
    // duplicate block appears later in doc 1 (blk 1) and earlier in doc 0
    // (blk 0): doc 0 wins the canonical slot
    val docs = Seq((5, "p q z z"), (4, "z z p q")).toDF("id", "txt")
    val out = Dedup.blockDedup(docs, "id", "txt", blockWords = 2)
      .orderBy("doc_id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // doc 4 is the least doc_id: both its blocks are canonical; doc 5's
    // "p q" and "z z" are both duplicates of doc 4's -> doc 5 vanishes
    assert(out == Seq((4, "z z p q")))
  }

  // ---- semanticDecontaminate ------------------------------------------------

  private def emb(rows: (Int, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("semanticDecontaminate drops rows within threshold of a benchmark vector (q92)") {
    val corpus = emb(1 -> Seq(1f, 0f), 2 -> Seq(0f, 1f), 3 -> Seq(0.9f, 0.1f))
    val benchmark = emb(100 -> Seq(1f, 0f))
    val out = Dedup.semanticDecontaminate(corpus, benchmark, "vec_id", "embedding", 0.9)
      .select("vec_id").as[Int].collect().toSet
    assert(out == Set(2)) // 1 identical, 3 cos≈0.994 — both dropped
  }

  test("semanticDecontaminate keeps zero-norm vectors (NULL cosine fails predicate)") {
    val corpus = emb(1 -> Seq(0f, 0f), 2 -> Seq(1f, 0f))
    val benchmark = emb(100 -> Seq(1f, 0f))
    val out = Dedup.semanticDecontaminate(corpus, benchmark, "vec_id", "embedding", 0.5)
      .select("vec_id").as[Int].collect().toSet
    assert(out == Set(1))
  }

  test("semanticDecontaminate with empty benchmark keeps everything") {
    val corpus = emb(1 -> Seq(1f, 0f), 2 -> Seq(0f, 1f))
    val benchmark = emb().filter(lit(false))
    val out = Dedup.semanticDecontaminate(corpus, benchmark, "vec_id", "embedding", 0.1)
    assert(out.count() == 2)
  }

  test("semanticDecontaminate plans as a broadcast join — corpus never shuffles") {
    val corpus = emb(1 -> Seq(1f, 0f), 2 -> Seq(0f, 1f))
    val benchmark = emb(100 -> Seq(1f, 0f))
    // string-match the plan: AQE wraps the tree, so node collect() is blind
    val planStr = Dedup.semanticDecontaminate(corpus, benchmark, "vec_id", "embedding", 0.5)
      .queryExecution.executedPlan.toString
    assert(planStr.contains("Broadcast"), s"expected a broadcast join:\n$planStr")
    assert(!planStr.contains("Exchange hashpartitioning") &&
      !planStr.contains("Exchange rangepartitioning"),
      s"expected no corpus shuffle:\n$planStr")
  }
}
