package graft.operators

import graft.SparkSpec
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: dup_frac separates repeated from unique bigram docs") {
    val docs = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab -> 5 total, 2 distinct
      (2L, "p q r s"),       // 3 distinct of 3
      (3L, "solo"),          // 1 token -> no bigrams -> absent
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(docs, "doc_id", "text", shingleN = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 2L, 0.6)))
    assert(out(2L) == ((3L, 3L, 0.0)))
    assert(!out.contains(3L) && !out.contains(4L))
  }

  test("tfidfTopK: corpus-wide terms score 0, rare terms rank first, k respected") {
    val docs = Seq(
      (1L, "shared rare1 rare1 shared shared"),
      (2L, "shared mid mid"),
      (3L, "shared mid rare2")
    ).toDF("doc_id", "text")
    val rows = TextStats.tfidfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    // 'shared' is in every doc -> idf 0 -> never beats a rare term where one exists
    val d1 = rows.filter(_._1 == 1L).sortBy(_._4)
    assert(d1.head._2 == "rare1" && d1.head._3 > 0.0)
    assert(rows.groupBy(_._1).forall(_._2.size <= 2))
    // rank is dense 1..k per doc
    assert(rows.filter(_._1 == 3L).map(_._4).sorted.sameElements(Array(1, 2)))
  }

  test("bm25: query-term docs score positive, others exactly 0; longer docs damped") {
    val docs = Seq(
      (1L, "spark spark spark pad"),                     // high tf, short
      (2L, "spark " + ("pad " * 40).trim),               // same term, long doc
      (3L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val out = TextStats.bm25(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) == 0.0)
    assert(out(1L) > out(2L) && out(2L) > 0.0)
  }

  test("rollingHash: order-sensitive (unlike set fingerprints), empty/null -> 0") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"), // same token SET, different order
      (3L, "alpha beta gamma"),
      (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val h = TextStats.rollingHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(3L) && h(1L) != h(2L))
    assert(h(4L) == 0L && h(5L) == 0L)
    // the set fingerprint CANNOT see the reorder — that's the gap this op fills
    val fp = docs.select(col("doc_id"), TF.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) != fp(2L) || h(1L) != h(2L))
  }

  test("chunkTokens: stride windows overlap, tails clamp, short docs get one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, chunk 4 stride 3
      (2L, "a b"),                                    // 2 tokens -> single short chunk
      (3L, "")
    ).toDF("doc_id", "text")
    val rows = TextStats.chunkTokens(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // starts at tokens 1,4,7,10 -> sizes 4,4,4,1
    assert(d1.map(_._2).sameElements(Array(0L, 1L, 2L, 3L)))
    assert(d1.map(_._3).sameElements(Array(4L, 4L, 4L, 1L)))
    // overlap: chunk 0 = t1..t4, chunk 1 = t4..t7 (share t4) — hashes differ
    assert(d1.map(_._4).distinct.length == 4)
    assert(rows.filter(_._1 == 2L).map(_._3).sameElements(Array(2L)))
    assert(!rows.exists(_._1 == 3L))
  }

  test("stratifiedTopFrac: integer-exact per-stratum cut, stable ties") {
    val df = (1 to 20).map(i => (i.toLong, if (i <= 10) "a" else "b", (i % 5).toDouble))
      .toDF("id", "grp", "score")
    val kept = Sampling.stratifiedTopFrac(df, "grp", col("score"), "id", 2, 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).toList
    // 10 rows per stratum * 2/5 = exactly 4 kept in each
    assert(kept.count(_._1 == "a") == 4 && kept.count(_._1 == "b") == 4)
    // ties on score resolve by id: the kept set is the same on rerun
    val again = Sampling.stratifiedTopFrac(df, "grp", col("score"), "id", 2, 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).toList
    assert(kept.toSet == again.toSet)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedTopFrac(df, "grp", col("score"), "id", 3, 2)
    }
  }

  test("chunkTokens properties: full coverage, stride-exact overlap, budget cap (many shapes)") {
    val sizes = Seq(1, 2, 3, 47, 48, 49, 63, 64, 65, 100, 200)
    val docs = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(t => s"w$t").mkString(" ")) }
      .toDF("doc_id", "text")
    val rows = TextStats.chunkTokens(docs, "doc_id", "text", chunkSize = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((n, i) <- sizes.zipWithIndex) {
      val cs = rows.filter(_._1 == i.toLong).sortBy(_._2)
      val expectChunks = (n + 47) / 48  // ceil(n/stride): starts at 1, 49, ...
      assert(cs.length == expectChunks, s"n=$n")
      // contiguous 0-based chunk indexes; each chunk ≤ 64 tokens; the token
      // count across chunks covers every token at least once (overlap ≥ 0)
      assert(cs.map(_._2).sameElements(cs.indices.map(_.toLong)), s"n=$n")
      assert(cs.forall(_._3 <= 64), s"n=$n")
      val covered = cs.zipWithIndex.map { case ((_, _, len), k) => k * 48L + len }.max
      assert(covered >= n, s"n=$n: last covered token $covered")
    }
  }

  test("rollingHash differential vs plain-Scala reference over token shapes") {
    def md5p32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def ref(text: String): Long = {
      val toks = text.trim match { case "" => Nil; case t => t.split("\\s+").toList }
      toks.foldLeft(0L)((acc, t) => (acc * 31L + md5p32(t)) % 1000000007L)
    }
    val texts = Seq("", "  ", "one", "one two three", "a a a a a",
      "Unicode tökens ünd émojis", "x " * 300 + "tail", "  padded   inside  ")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextStats.rollingHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(got(i.toLong) == ref(t), s"text '$t'")
  }

  test("pii scan: counts and redaction agree; clean text untouched") {
    val df = Seq(
      (1L, "mail me at a.b+c@site-x.io or 555-1234 now"),
      (2L, "no contact info at all"),
      (3L, "two mails x@y.com z@w.org and 555-0000 555-9999")
    ).toDF("id", "t")
    val out = df.select(col("id"),
        TF.piiCount(col("t"), TF.emailPattern).as("e"),
        TF.piiCount(col("t"), TF.phonePattern).as("p"),
        TF.redactPii(col("t")).as("red"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(1L)._3 == "mail me at [EMAIL] or [PHONE] now")
    assert(out(2L) == ((0L, 0L, "no contact info at all")))
    assert(out(3L) == ((2L, 2L, "two mails [EMAIL] [EMAIL] and [PHONE] [PHONE]")))
  }
}
