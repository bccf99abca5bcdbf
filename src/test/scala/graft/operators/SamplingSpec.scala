package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, stable under corpus growth, percentages honored") {
    val small = (1L to 200L).toDF("id")
    val cuts = Seq("train" -> 90, "val" -> 10)
    val assign1 = small.select(col("id"), Sampling.hashSplit(col("id"), cuts).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // growing the corpus must not move any existing assignment
    val grown = (1L to 400L).toDF("id")
      .select(col("id"), Sampling.hashSplit(col("id"), cuts).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assign1.foreach { case (id, s) => assert(grown(id) == s) }
    // split sizes roughly match percentages (hash-uniform, 400 ids)
    val trainFrac = grown.values.count(_ == "train").toDouble / grown.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    // every row gets a split; bad percentages rejected
    assert(grown.values.forall(s => s == "train" || s == "val"))
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(col("id"), Seq("a" -> 50, "b" -> 30))
    }
    // sums to 100 but is nonsense — must be rejected, not silently all-train
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(col("id"), Seq("a" -> 101, "b" -> -1))
    }
  }

  test("mixtureBalance: exact integer thresholds, nested under non-limiting growth") {
    // replicate the md5 bucket gate in plain Scala
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 1000000L
    }
    val rows = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b")) :+ ((99L, "zzz"))
    val df = rows.toDF("id", "src")
    val weights = Seq("a" -> 75, "b" -> 25)
    // n_a = n_b = 20: C = min(floor(2000/75), floor(2000/25)) = min(26, 80) = 26
    // th_a = 75*10000*26 div 20 = 975000; th_b = 25*10000*26 div 20 = 325000
    val kept = Sampling.mixtureBalance(df, "src", "id", weights)
      .collect().map(r => r.getAs[Long]("id")).toSet
    val expect = rows.collect {
      case (id, "a") if bucket(id) < 975000L => id
      case (id, "b") if bucket(id) < 325000L => id
    }.toSet
    assert(kept == expect)
    assert(!kept.contains(99L)) // stratum absent from the weights is dropped
    // b grows but a stays limiting (C still 26): a's keep set is unchanged
    // and b's new, lower-threshold keep set nests inside the old one
    val grown = df.union(Seq((200L, "b"), (201L, "b"), (202L, "b"), (203L, "b")).toDF("id", "src"))
    val kept2 = Sampling.mixtureBalance(grown, "src", "id", weights)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("src"))).toList
    assert(kept2.collect { case (id, "a") => id }.toSet == expect.filter(_ <= 20))
    assert(kept2.collect { case (id, "b") => id }.toSet.subsetOf(
      expect.filter(_ > 20) ++ Set(200L, 201L, 202L, 203L)))
    intercept[IllegalArgumentException] {
      Sampling.mixtureBalance(df, "src", "id", Seq("a" -> 60, "b" -> 30))
    }
    // a weighted stratum with NO rows makes the mixture unsatisfiable:
    // C = 0 -> empty output, never a silent rebalance over present strata
    assert(Sampling.mixtureBalance(df, "src", "id",
      Seq("a" -> 40, "b" -> 40, "ghost" -> 20)).isEmpty)
  }

  test("contiguousBins: start-offset binning per shard; over-budget docs overflow their bin") {
    val docs = Seq(
      (1L, "a b c d"),            // 4 tokens
      (2L, "a b c"),              // 3
      (3L, ("x " * 20).trim),     // 20 (over budget of 10 -> own bins)
      (4L, "a b"),                // 2
      (5L, "")                    // 0 tokens
    ).toDF("doc_id", "text")
    val out = Sampling.contiguousBins(docs, "doc_id", "text", shards = 1, tokenBudget = 10)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // (id, n_tokens, bin)
    // single shard, ordered by id: tokens-before 0,4,7,27,29 -> bins 0,0,0,2,2
    assert(out.toSeq == Seq((1L, 4L, 0L), (2L, 3L, 0L), (3L, 20L, 0L), (4L, 2L, 2L), (5L, 0L, 2L)))
    // multi-shard: every doc appears exactly once and bins restart per shard
    val sharded = Sampling.contiguousBins(docs, "doc_id", "text", shards = 3, tokenBudget = 10)
    assert(sharded.count() == 5)
    assert(sharded.groupBy("shard").agg(min(col("bin")).as("m"))
      .collect().forall(_.getLong(1) == 0L))
  }

  test("weightedSample: deterministic, weight-proportional, p=1 rows always kept") {
    import spark.implicits._
    val rows = (1L to 2000L).map(i => (i, if (i <= 1000) 1.0 else 9.0)) ++
      Seq((3000L, 0.0), (3001L, -5.0), (3002L, Double.NaN))
    val df = rows.toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", col("w"), targetK = 200)
      .collect().map(_.getLong(0)).toSet
    // reruns are identical (md5 coin, no RNG)
    val again = Sampling.weightedSample(df, "id", col("w"), targetK = 200)
      .collect().map(_.getLong(0)).toSet
    assert(kept == again)
    // zero/negative/NaN weights never sampled
    assert(!kept.contains(3000L) && !kept.contains(3001L) && !kept.contains(3002L))
    // heavy rows are ~9x more likely: expected ~20 light, ~180 heavy
    val light = kept.count(_ <= 1000L)
    val heavy = kept.count(i => i > 1000L && i <= 2000L)
    assert(light >= 5 && light <= 45, s"light=$light")
    assert(heavy >= 130 && heavy <= 230, s"heavy=$heavy")
    // a row whose weight >= W/k has p=1 and must ALWAYS be present
    val whale = df.union(Seq((5000L, 1e9)).toDF("id", "w"))
    assert(Sampling.weightedSample(whale, "id", col("w"), targetK = 10)
      .filter(col("id") === 5000L).count() == 1)
  }

  test("tokenBudgetSelect: maximal in-order prefix per group; overflow doc and tail drop") {
    val d = Seq(
      (1L, "s1", "a b c"),        // 3 tokens, cum 3
      (2L, "s1", "d e f g"),      // 4 tokens, cum 7
      (3L, "s1", "h i"),          // 2 tokens, cum 9 > 8 -> dropped
      (4L, "s1", "j"),            // cum 10 -> dropped (prefix, not knapsack)
      (5L, "s2", "k l m n o p q r s"), // 9 > 8 -> whole group empty
      (6L, "s2", "t")
    ).toDF("doc_id", "source", "text")
    val r = Sampling.tokenBudgetSelect(d, "doc_id", "text", "source",
      budgetTokens = 8L, order = Seq(col("doc_id").asc))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSet == Set(("s1", 1L, 3L, 3L), ("s1", 2L, 4L, 7L)))
  }

  test("scoreCalibration: percent_rank within group, id tie-break, group-fair") {
    val d = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 99L),
      (5L, "b", 1L), (6L, "b", 2L)
    ).toDF("doc_id", "source", "n_chars")
    val r = Sampling.scoreCalibration(d, "doc_id", "source", col("n_chars"))
      .collect().map(x => x.getLong(1) -> x.getDouble(3)).toMap
    assert(r(1L) == 0.0 && r(4L) == 1.0)         // group-a extremes
    assert(r(2L) == 0.333333 && r(3L) == 0.666667) // tie broken by id
    assert(r(5L) == 0.0 && r(6L) == 1.0)         // b's best calibrates like a's
  }
}
