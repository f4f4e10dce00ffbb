package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Ranking, TextOps}

/** Gopher-style repetition metrics, BM25 ranking, and benchmark
  * decontamination — exercising the paths the `documents` fixture
  * leaves degenerate (multi-line text, symbols, planted contamination).
  */
class TextRankingSpec extends SparkSpec {
  import spark.implicits._

  private def metricsFor(texts: Seq[(Long, String)]) =
    texts.toDF("doc_id", "text")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("grams", Dedup.shinglesOfTokens(col("toks"), 2))
      .withColumn("lns", TextOps.lines(col("text")))

  test("duplicate-line metrics on real multi-line text") {
    val text = "alpha beta\ngamma delta\nalpha beta\n  \nepsilon"
    val row = metricsFor(Seq((1L, text)))
      .select(
        TextOps.dupLineFrac(col("lns")).as("dlf"),
        TextOps.dupLineCharFrac(col("lns")).as("dlcf"))
      .head()
    // 4 non-empty trimmed lines; "alpha beta" appears twice
    assert(row.getDouble(0) === 2.0 / 4.0)
    // chars: 10 + 11 + 10 + 7 = 38, duplicated = 20
    assert(row.getDouble(1) === 20.0 / 38.0)
  }

  test("top/duplicated n-gram char fractions, exact") {
    val text = "a b a b a b x" // 2-grams: [a b, b a, a b, b a, a b, b x]
    val row = metricsFor(Seq((1L, text)))
      .select(
        TextOps.topNgramCharFrac(col("text"), col("grams")).as("top"),
        TextOps.dupNgramCharFrac(col("text"), col("grams")).as("dup"))
      .head()
    // "a b" has count 3, "b a" count 2 → top is "a b": 3·3/13
    assert(row.getDouble(0) === 3 * 3 / 13.0)
    // duplicated grams: "a b"×3 + "b a"×2 → (9 + 6)/13
    assert(row.getDouble(1) === (9 + 6) / 13.0)
  }

  test("top n-gram tie resolves to lexicographically greatest gram") {
    val text = "a b c d" // all 2-grams distinct, count 1 each
    val row = metricsFor(Seq((1L, text)))
      .select(TextOps.topNgramCharFrac(col("text"), col("grams")))
      .head()
    // tie at count 1 → "c d" (greatest); 1·3/7
    assert(row.getDouble(0) === 3 / 7.0)
  }

  test("symbol-to-word ratio counts '#' and '...'") {
    val text = "see #tag and more... plus # alone"
    val row = metricsFor(Seq((1L, text)))
      .select(TextOps.symbolWordRatio(col("text"), col("toks")))
      .head()
    assert(row.getDouble(0) === (2 + 1) / 7.0)
  }

  test("alpha word fraction and gopher pass thresholds") {
    val good = (1 to 60).map(i => s"word$i").mkString(" ") // 60 distinct words
    val fewWords = "too short to pass"
    val df = metricsFor(Seq((1L, good), (2L, fewWords)))
      .select(col("doc_id"),
        TextOps.alphaWordFrac(col("toks")).as("awf"),
        TextOps.gopherPass(col("text"), col("toks"), col("grams"),
          col("lns")).as("pass"))
      .orderBy(col("doc_id"))
      .collect()
    assert(df(0).getDouble(1) === 1.0)
    assert(df(0).getBoolean(2)) // 60 words, all-alpha, no repetition
    assert(!df(1).getBoolean(2)) // word count < 50
  }

  test("RLE repetition metrics match a naive reference on random arrays") {
    // the linear RLE fold vs per-element counting, over random arrays
    // with heavy duplication — guards the O(n log n) rewrite against
    // semantic drift (multiplicities, char sums, tie resolution)
    import org.scalacheck.{Gen, rng}
    val elemGen = Gen.oneOf("aa", "bb", "cc", "dd", "e", "fff", "gg", "x")
    val arrGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, elemGen))
    val params = Gen.Parameters.default
    val cases = (1 to 80).map { i =>
      val arr = arrGen.pureApply(params, rng.Seed(i.toLong))
      (i.toLong, arr.mkString(" "), arr)
    }
    val got = cases.toDF("id", "text", "arr")
      .select(col("id"),
        TextOps.dupLineFrac(col("arr")).as("dlf"),
        TextOps.dupLineCharFrac(col("arr")).as("dlcf"),
        TextOps.topNgramCharFrac(col("text"), col("arr")).as("top"),
        TextOps.dupNgramCharFrac(col("text"), col("arr")).as("dup"))
      .orderBy(col("id")).collect()
    cases.zip(got).foreach { case ((id, text, arr), row) =>
      val counts = arr.groupBy(identity).view.mapValues(_.size).toMap
      val dupElems = counts.valuesIterator.filter(_ > 1).sum
      val dupChars = counts.iterator
        .collect { case (s, c) if c > 1 => c * s.length }.sum
      val totChars = arr.iterator.map(_.length).sum
      val (wantDlf, wantDlcf, wantTop, wantDup) =
        if (arr.isEmpty) (0.0, 0.0, 0.0, 0.0)
        else {
          val maxCnt = counts.valuesIterator.max
          val top = counts.collect { case (s, c) if c == maxCnt => s }.max
          (dupElems.toDouble / arr.size,
            if (totChars > 0) dupChars.toDouble / totChars else 0.0,
            maxCnt.toDouble * top.length / text.length,
            dupChars.toDouble / text.length)
        }
      assert(math.abs(row.getDouble(1) - wantDlf) < 1e-12, s"dlf id=$id")
      assert(math.abs(row.getDouble(2) - wantDlcf) < 1e-12, s"dlcf id=$id")
      assert(math.abs(row.getDouble(3) - wantTop) < 1e-12, s"top id=$id")
      assert(math.abs(row.getDouble(4) - wantDup) < 1e-12, s"dup id=$id")
    }
  }

  test("bm25TopK matches a naive in-memory reference") {
    val corpus = Seq(
      (0L, "spark runs fast and spark scales"),
      (1L, "ducks swim and ducks fly"),
      (2L, "spark and flink stream data"),
      (3L, "nothing relevant here at all"),
      (4L, "spark spark spark spark"))
    val terms = Seq("spark", "stream")
    val got = Ranking.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id",
      "text", terms, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    // naive reference
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    def score(id: Long): Double = terms.map { t =>
      val tf = toks(id).count(_ == t).toDouble
      val dfT = toks.values.count(_.contains(t)).toDouble
      val idf = math.log(1 + (n - dfT + 0.5) / (dfT + 0.5))
      idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * toks(id).size / avgdl))
    }.sum
    val want = corpus.map(_._1).map(id => (id, score(id)))
      .sortBy { case (id, s) => (-s, id) }.take(3)
    assert(got.map(_._1).toSeq === want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-12) }
  }

  test("bigram LM NLL matches hand-computed add-1 smoothed values") {
    import graft.operators.LanguageModel
    // corpus: doc0 "a b a b", doc1 "a b c"
    // unigrams a:3 b:3 c:1 → V=3; bigrams "a b":3 "b a":1 "b c":1
    // P(a b)=(3+1)/(3+3)=2/3, P(b a)=P(b c)=(1+1)/(3+3)=1/3
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val got = LanguageModel.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val ln23 = math.log(2.0 / 3.0); val ln13 = math.log(1.0 / 3.0)
    assert(got(0L)._1 === 3L)
    assert(math.abs(got(0L)._2 - (-(2 * ln23 + ln13) / 3)) < 2e-6)
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - (-(ln23 + ln13) / 2)) < 2e-6)
    // a single-token document has no bigrams and must be absent
    val single = Seq((0L, "a b"), (1L, "x")).toDF("doc_id", "text")
    val ids = LanguageModel.bigramNll(single, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(0L))
  }

  test("contaminatedAgainst flags k-gram overlap with the bench set") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "a quick brown fox jumps over a fence"), // shares 4-gram with 0
      (2L, "completely different text with no overlap at all"),
      (3L, "the quick brown fox sat still")) // shares "the quick brown fox"
    val df = docs.toDF("doc_id", "text")
    val bench = df.filter(col("doc_id") === 0)
    val flags = Dedup.contaminatedAgainst(df, bench, "doc_id", "text",
        k = 4)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(flags.toSeq === Seq((0L, true), (1L, true), (2L, false),
      (3L, true)))
  }

  test("collapseRepeats removes runs, scrubUrlsEmails drops link/email tokens") {
    val df = Seq(
      "go go go stop go",                       // run collapses, later dup survives
      "See https://x.org/a www.b.com a.b@c.io plain",
      "a A a",                                  // case-folded by tokens() first
      "").toDF("text")
    val out = df.select(
        concat_ws(" ",
          TextOps.collapseRepeats(
            TextOps.scrubUrlsEmails(TextOps.tokens(col("text"))))).as("clean"))
      .collect().map(_.getString(0))
    assert(out(0) === "go stop go")
    assert(out(1) === "see plain")
    assert(out(2) === "a")
    assert(out(3) === "")
  }
}
