package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Domains, Funnel, Ranking}

/** Wave 20: domain governance, in-engine classifier training, and the
  * HLL rolling-actives contract. */
class Wave20Spec extends SparkSpec {
  import spark.implicits._

  // ---- Domains.host / registeredDomain ----

  test("host: scheme-mandatory parse, lowercased, null-safe") {
    val got = Seq(
      "https://WWW.Example.COM/path?q=1",
      "http://sub.host.org:8080/x",
      "not a url",
      null.asInstanceOf[String])
      .toDF("u").select(Domains.host(col("u"))).collect().map(r =>
        if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("www.example.com", "sub.host.org", null, null))
  }

  test("registeredDomain: two-label default, multi-part suffix rollup, " +
    "short hosts are their own domain") {
    val tlds = Seq("co.uk", "com.au")
    val got = Seq("www.alpha.example.com", "news.daily.co.uk", "co.uk",
      "example.com", "localhost", null.asInstanceOf[String])
      .toDF("h")
      .select(Domains.registeredDomain(col("h"), tlds))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq("example.com", "daily.co.uk", "co.uk",
      "example.com", "localhost", null))
  }

  test("governanceReport: hand-computed counts — exact-host vs domain " +
    "block, corpus-wide dup, cap, quality mix") {
    // Six docs over three domains:
    //   good.example.com x2 (one dup pair member), bad.example.com x1
    //     (exact-host blocked),
    //   cdn.spam.net + mirror.spam.net (domain-blocked, second is the
    //     other dup pair member),
    //   solo.org x1 (quality fail).
    val docs = Seq(
      (1L, "https://good.example.com/a", "AAA bbb", true),
      (2L, "https://good.example.com/b", "ccc ddd eee", true),
      (3L, "https://bad.example.com/c", "fff", true),
      (4L, "https://cdn.spam.net/d", "ggg hhh", true),
      (5L, "https://mirror.spam.net/e", "aaa   BBB", true),
      (6L, "https://solo.org/f", "iii", false))
      .toDF("id", "url", "text", "q")
    val got = Domains.governanceReport(docs, col("id"), col("url"),
        col("text"), col("q"),
        blockedHosts = Seq("bad.example.com"),
        blockedDomains = Seq("spam.net"),
        multiPartTlds = Seq("co.uk"), capPerDomain = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    // example.com: 2 hosts, 3 docs, 6 tokens, 1 dup (doc 1 ~ doc 5
    // canonically), 3 quality, 1 blocked (exact host), cap keeps 1 of
    // the 2 survivors.
    val ex = got("example.com")
    assert((ex.getLong(1), ex.getLong(2), ex.getLong(3)) == ((2L, 3L, 6L)))
    assert(ex.getLong(4) == 1L && ex.getDouble(5) == 0.3333)
    assert(ex.getLong(6) == 3L && ex.getLong(8) == 1L)
    assert(ex.getLong(9) == 1L, "cap must bound the survivors")
    // spam.net: both docs blocked by the DOMAIN entry (subdomains roll
    // up), so zero survive the cap despite none being host-listed.
    val sp = got("spam.net")
    assert(sp.getLong(2) == 2L && sp.getLong(8) == 2L && sp.getLong(9) == 0L)
    assert(sp.getLong(4) == 1L, "dup screen is corpus-wide, not per-domain")
    // solo.org: unblocked, quality 0, kept 1.
    val so = got("solo.org")
    assert((so.getLong(2), so.getLong(6), so.getLong(8), so.getLong(9)) ==
      ((1L, 0L, 0L, 1L)))
  }

  test("governanceReport: unparseable URLs land under the null domain, " +
    "unblocked, and still survive the cap") {
    val docs = Seq(
      (1L, "not a url at all", "some text", true),
      (2L, "https://ok.example.com/x", "other text", true))
      .toDF("id", "url", "text", "q")
    val got = Domains.governanceReport(docs, col("id"), col("url"),
        col("text"), col("q"),
        blockedHosts = Seq("bad.example.com"), blockedDomains = Seq("x.y"),
        multiPartTlds = Nil, capPerDomain = 5)
      .collect().map(r =>
        (if (r.isNullAt(0)) null else r.getString(0)) -> r).toMap
    val nul = got(null)
    assert(nul.getLong(2) == 1L, "one doc under the null domain")
    assert(nul.getLong(8) == 0L, "unparseable is not blocked")
    assert(nul.getLong(9) == 1L, "and survives the cap")
    assert(got("example.com").getLong(9) == 1L)
  }

  // ---- Ranking.trainHashedLogReg ----

  test("trainHashedLogReg: loss strictly decreases and the trained " +
    "model separates a planted corpus (q130-score compatible)") {
    // Planted signal: positive docs speak "good", negatives "bad" —
    // linearly separable in the hashed space (terms land in distinct
    // buckets with overwhelming probability at 64 buckets).
    val docs = (1 to 20).map { i =>
      if (i % 2 == 0) (i.toLong, "good good great fine", true)
      else (i.toLong, "bad awful bad poor", false)
    }.toDF("id", "text", "y")
    val (weights, losses) = Ranking.trainHashedLogReg(docs, col("id"),
      col("text"), col("y"), nBuckets = 64, iters = 4, lr = 0.5)
    assert(losses.size == 4)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss must decrease: $losses")
    }
    // Score with the trained table exactly the way hashedLinearScore
    // scores with its seeded one: z = sum tf·w over md5 buckets.
    val w = weights.collect().map(r => r.getInt(0).toLong -> r.getDouble(1))
      .toMap
    val wCol = element_at(
      typedLit((0 until 64).map(b => w(b.toLong))),
      (pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
        lit(64L)) + 1).cast("int"))
    val scored = docs
      .select(col("id"), col("y"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("term"))
      .groupBy(col("id"), col("y")).agg(sum(wCol).as("z"))
      .collect()
    scored.foreach { r =>
      assert((r.getDouble(2) > 0) == r.getBoolean(1),
        s"trained model must separate the planted corpus: $r")
    }
  }

  test("trainHashedLogReg: zero-token docs carry no gradient and do " +
    "not poison the mean") {
    val docs = Seq((1L, "good stuff", true), (2L, "", false),
      (3L, null.asInstanceOf[String], false), (4L, "bad junk", false))
      .toDF("id", "text", "y")
    val (weights, losses) = Ranking.trainHashedLogReg(docs, col("id"),
      col("text"), col("y"), nBuckets = 16, iters = 2, lr = 0.5)
    assert(weights.count() == 16L)
    assert(losses.forall(l => !l.isNaN && !l.isInfinite))
  }

  // ---- Subword.chunkDocs ----

  test("chunkDocs: hand-computed windows — overlap, short tail, blank " +
    "docs excluded") {
    def m(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = graft.operators.Subword.chunkDocs(docs, col("id"),
        col("text"), chunkTokens = 4, stride = 3)
      .orderBy("id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 0, 0L, 4L, m("a b c d")),
      (1L, 1, 3L, 4L, m("d e f g")),
      (1L, 2, 6L, 4L, m("g h i j")),
      (1L, 3, 9L, 1L, m("j"))),
      got.mkString(","))
  }

  test("chunkDocs: stride = chunk is disjoint full packing") {
    val docs = Seq((1L, "a b c d e f")).toDF("id", "text")
    val got = graft.operators.Subword.chunkDocs(docs, col("id"),
        col("text"), chunkTokens = 3, stride = 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0, 0L, 3L), (1, 3L, 3L)))
  }

  // ---- Ranking.evalHashedLogReg ----

  test("evalHashedLogReg: separable corpus evaluates perfectly; " +
    "report is complete") {
    // Positive docs speak only class-A tokens, negatives only class-B:
    // three gradient steps + the train-mean operating point must
    // separate the held-out slice exactly.
    val docs = (1L to 60L).map { i =>
      if (i % 2 == 0) (i, "alpha alpha beta alpha", true)
      else (i, "gamma delta gamma gamma", false)
    }.toDF("id", "text", "y")
    val got = Ranking.evalHashedLogReg(docs, col("id"), col("text"),
        col("y"), trainFrac = 0.8, nBuckets = 64, iters = 3, lr = 0.5)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(got.keySet == Set("accuracy", "f1", "fn", "fp", "n_test",
      "n_train", "precision", "recall", "tn", "tp"))
    assert(got("n_train") + got("n_test") == 60.0)
    assert(got("n_test") > 0 && got("tp") > 0 && got("tn") > 0)
    assert(got("fp") == 0.0 && got("fn") == 0.0, got.toString)
    assert(got("accuracy") == 1.0 && got("precision") == 1.0 &&
      got("recall") == 1.0 && got("f1") == 1.0, got.toString)
  }

  test("evalHashedLogReg: confusion counts partition the held-out " +
    "slice on an unlearnable label") {
    val docs = (1L to 50L).map(i => (i, "same same text", i % 3 == 0))
      .toDF("id", "text", "y")
    val got = Ranking.evalHashedLogReg(docs, col("id"), col("text"),
        col("y"), trainFrac = 0.8, nBuckets = 16, iters = 3, lr = 0.5)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(got("tp") + got("fp") + got("tn") + got("fn") ==
      got("n_test"))
  }

  // ---- Funnel.rollingActivesApprox ----

  test("rollingActivesApprox: exact column equals rollingActives and " +
    "the sketch gate holds") {
    def t(d: Int, u: Long) =
      (Timestamp.valueOf(f"2024-02-$d%02d 10:00:00"), u)
    val events = (
      (1 to 9).flatMap(d => (1L to (d * 3L)).map(u => t(d, u)))
    ).toDF("ts", "user_id")
    val exact = Funnel.rollingActives(events, col("user_id"), col("ts"),
        windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val got = Funnel.rollingActivesApprox(events, col("user_id"),
        col("ts"), windowDays = 7).collect()
    assert(got.length == exact.size)
    got.foreach { r =>
      assert(r.getLong(1) == exact(r.getDate(0).toString),
        "exact column must match the exact operator")
      assert(r.getBoolean(2), s"sketch outside its envelope: $r")
    }
  }
}
