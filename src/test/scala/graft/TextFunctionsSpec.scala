package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("tokenCount: plain, multi-space, blank, empty") {
    val df = Seq("a b c", "  a   b  ", "", "   ", "single").toDF("t")
    val got = df.select(tokenCount(col("t"))).collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 2, 0, 0, 1))
  }

  test("punctRatio counts non-word non-space chars") {
    val df = Seq("ab,.!c").toDF("t") // 3 punct of 6 chars
    assert(one[Double](df.select(punctRatio(col("t")))) == 0.5)
  }

  test("stopwordRatio over EN stopwords") {
    val df = Seq("the cat and the dog").toDF("t") // 3 stopwords of 5
    assert(one[Double](df.select(stopwordRatio(col("t"), StopEn))) == 0.6)
  }

  test("avgTokenLen") {
    val df = Seq("ab cdef").toDF("t") // (2+4)/2 = 3.0
    assert(one[Double](df.select(avgTokenLen(col("t")))) == 3.0)
  }

  test("shingles: 3-grams, short docs collapse to one shingle") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(shingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("shingles are distinct (repeated n-grams collapse)") {
    val df = Seq("x y x y x y").toDF("t") // raw 3-grams: xyx,yxy,xyx,yxy
    val got = df.select(shingles(col("t"), 3)).collect().head.getSeq[String](0)
    assert(got.sorted == Seq("x y x", "y x y"))
  }

  test("langId picks language with most stopword hits, first-match ties") {
    val df = Seq(
      "the cat of doom",       // en
      "el perro de la casa",   // es
      "der hund und das brot", // de
      "xyzzy plugh")           // no hits -> und
      .toDF("t")
    val got = df.select(langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "de", "und"))
  }

  test("langId tie-break: 'la' is both es and fr -> es (list order)") {
    val df = Seq("la la").toDF("t")
    assert(one[String](df.select(langId(col("t")))) == "es")
  }

  test("bowFingerprint is order-insensitive") {
    val df = Seq(("a b c", "c b a"), ("a b c", "a b d")).toDF("x", "y")
    val got = df.select(
      (bowFingerprint(col("x")) === bowFingerprint(col("y"))).as("eq"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false))
  }

  test("qualityScore: clean english sentence scores max") {
    val df = Seq("the quick brown fox jumps over the lazy dog today").toDF("t")
    assert(one[Int](df.select(qualityScore(col("t")))) == 4)
  }

  test("rollingHash: known value, order-sensitive, deterministic") {
    val df = Seq("abc", "cba", "abc").toDF("t")
    val got = df.select(rollingHash(col("t"))).collect().map(_.getLong(0))
    assert(got(0) == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(got(0) != got(1), "order must matter")
    assert(got(0) == got(2), "deterministic")
  }

  test("subwordCount charges extra units for long tokens") {
    val df = Seq("hi internationalization").toDF("t") // 1 + ceil(20/6)=4
    assert(one[Int](df.select(subwordCount(col("t")))) == 5)
  }

  test("redactPii: all three classes, counts on original text") {
    val df = Seq(
      "mail a.user+tag@sub.example.org now",
      "call 555-123-4567 or 555.987.6543",
      "host 10.0.0.1 peer 192.168.255.254",
      "clean text with plain words 1234",
      "").toDF("t")
    val got = df.select(redactPii(col("t")),
        emailCount(col("t")), phoneCount(col("t")), ipv4Count(col("t")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got(0) == (("mail <EMAIL> now", 1, 0, 0)))
    assert(got(1) == (("call <PHONE> or <PHONE>", 0, 2, 0)))
    assert(got(2) == (("host <IP> peer <IP>", 0, 0, 2)))
    assert(got(3) == (("clean text with plain words 1234", 0, 0, 0)))
    assert(got(4) == (("", 0, 0, 0)))
  }

  test("redactPii: email wins over embedded digit runs; ordering contract") {
    // The local part contains a phone-shaped run; the whole address must
    // become ONE <EMAIL>, not a partial <PHONE> inside a mangled email.
    val df = Seq("x 555-123-4567@example.com y").toDF("t")
    assert(one[String](df.select(redactPii(col("t")))) == "x <EMAIL> y")
    // Phone before IPv4: a 3-3-4 dotted run is a phone, not a dotted-quad
    // prefix match.
    val df2 = Seq("n 555.123.4567 m").toDF("t")
    assert(one[String](df2.select(redactPii(col("t")))) == "n <PHONE> m")
  }

  test("redactPii: word boundaries stop partial digit matches") {
    // 5-digit leading run: no \b-aligned 3-3-4 match; longer dotted quads
    // with 4-digit groups don't match the IPv4 shape either.
    val df = Seq("a 55555-123-4567 b", "c 1.2.3.4567 d").toDF("t")
    val got = df.select(phoneCount(col("t")), ipv4Count(col("t")))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got(0) == ((0, 0)))
    assert(got(1) == ((0, 0)))
  }

  test("ngramStrings: shorter-than-n inputs yield empty arrays, not errors") {
    // The slice length clamps at 0 for size(toks) < n-1; every sub-n
    // size (0, 1, ..., n-1) must produce [] rather than a negative-length
    // slice runtime error.
    val df = Seq("", "a", "a b", "a b c", "a b c d").toDF("t")
    val got = df
      .select(ngramStrings(tokens(col("t")), 3).as("g"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, Nil, Nil, List("a b c"), List("a b c", "b c d")))
  }
}
