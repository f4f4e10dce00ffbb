package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Recall/correctness properties of the hash-based near-dup and ANN
  * operators (no SQL oracle exists for engine-side hashes — these specs
  * are their correctness gate, vs exact baselines). */
class DedupSimSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()

  test("MinHash LSH finds every exact-Jaccard≥0.9 pair (recall at high sim)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, threshold = 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
    // verified candidates are a subset of exact matches at the threshold
    assert((lsh -- exact).isEmpty)
  }

  test("PPJoin prefix+positional filtering matches naive all-pairs Jaccard") {
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val naiveA = sets.select(col("doc_id").as("i"), col("shset").as("si"))
    val naiveB = sets.select(col("doc_id").as("j"), col("shset").as("sj"))
    val naive = naiveA.join(naiveB, col("i") < col("j"))
      .withColumn("c", size(array_intersect(col("si"), col("sj"))))
      .withColumn("jaccard", col("c").cast("double") /
        (size(col("si")) + size(col("sj")) - col("c")))
      .filter(col("jaccard") >= 0.7)
      .select("i", "j", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    val pp = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(naive.nonEmpty)
    assert(pp == naive,
      s"missed=${naive -- pp} extra=${pp -- naive}")
  }

  test("SimHash pairs have genuinely similar token multisets") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxDist = 3)
    // every reported pair must also be an exact-Jaccard near-dup at ≥ 0.5
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 1, threshold = 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reported = pairs.select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reported.nonEmpty)
    val bogus = reported -- exact
    assert(bogus.isEmpty, s"simhash reported dissimilar pairs: $bogus")
  }

  test("exact dedup keeps one id per fingerprint") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    assert(out.count() == out.select("fingerprint").distinct().count())
    assert(out.agg(sum("n_dups")).first().getLong(0) == docs.count())
  }

  test("LSH ANN reaches ≥0.6 top-5 recall vs brute force") {
    // neighbors in this synthetic data are weak (cosine ~0.3-0.4), so
    // short signatures and many tables are needed for recall
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", dim = 64,
        k = 5, planes = 4, tables = 16)
      .filter(col("query_id") < 20)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"ANN recall $recall too low")
  }

  test("IVF ANN reaches ≥0.5 top-5 recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 4)
      .filter(col("query_id") < 20)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall $recall too low")
  }

  test("banded-LSH near-dup pairs equal naive all-pairs (planted dups)") {
    import org.apache.spark.sql.types._
    // plant near-duplicates: perturbed copy of every vector (same
    // construction as the s2 harness query)
    val base = emb.filter(col("vec_id") < 300)
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
    val perturbed = base.select((col("vec_id") + 10000).as("vec_id"),
      transform(col("embedding"), x => x + lit(0.02) * x * x).as("embedding"))
    val all = base.unionAll(perturbed)
    val naive = {
      val a = all.select(col("vec_id").as("i"), col("embedding").as("va"))
      val b = all.select(col("vec_id").as("j"), col("embedding").as("vb"))
      a.join(b, col("i") < col("j"))
        .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
        .filter(col("cos") >= 0.99)
        .select("i", "j", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 1e9))).toSet
    }
    val banded = Similarity.cosineNearDupPairs(all, "vec_id", "embedding",
        threshold = 0.99, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    assert(naive.size == 300, s"expected 300 planted pairs, got ${naive.size}")
    assert(banded == naive,
      s"missed=${naive -- banded} extra=${banded -- naive}")
  }

  test("connected components label chains, cliques and isolated nodes") {
    import spark.implicits._
    // component {1,2,3,4} as a chain (diameter 3 — needs >1 round),
    // component {10,11}, isolated {20}
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("i", "j")
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("edit-verified pairs: candidates pass only under the edit bound") {
    import spark.implicits._
    // docs 0/1 differ by one word ("sky"→"sea": 2 edits, high Jaccard);
    // docs 0/2 share most 3-grams but diverge by a long tail (over the
    // edit bound) — candidates at the Jaccard floor, killed by verify
    val base = "the quick brown fox jumps over the lazy dog near the sky"
    val docs = Seq(
      (0L, base),
      (1L, base.replace("sky", "sea")),
      (2L, base + " while twelve zebras parade wildly outside"),
      (3L, "completely different text with nothing shared at all"))
      .toDF("doc_id", "text")
    val got = Dedup.editVerifiedPairs(docs, "doc_id", "text",
        k = 3, jaccardFloor = 0.3, maxEdit = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((0L, 1L, 2)))
    // sanity: the loose candidate tier DID propose (0,2) — the edit
    // verify is what rejected it
    val cands = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.toSet.contains((0L, 2L)))
  }

  test("passage dedup: first occurrence wins, reassembly in order") {
    import spark.implicits._
    // k=2 chunks: doc 0 = [a b][c d][e f]; doc 1 repeats [c d] at
    // chunk 0 and [a b] at chunk 1 plus a fresh tail; doc 2 is entirely
    // chunks already seen → must vanish from the output
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "c d a b x y"),
      (2L, "a b c d"))
      .toDF("doc_id", "text")
    val got = Dedup.passageDedup(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 3L, "a b c d e f"),   // owns all three chunks
      (1L, 1L, "x y")))          // keeps only its novel tail
    // ragged tail: last chunk shorter than k survives as its own unit
    val ragged = Seq((7L, "p q r")).toDF("doc_id", "text")
    val g2 = Dedup.passageDedup(ragged, "doc_id", "text", k = 2)
      .head()
    assert(g2.getLong(1) === 2L && g2.getString(2) === "p q r")
  }

  test("passage dedup matches a naive reference on random corpora") {
    import spark.implicits._
    val k = 3
    for (caseIdx <- 0 until 5) {
      val rnd = new scala.util.Random(caseIdx * 7919 + 5)
      // small vocabulary forces plenty of cross-document chunk dups
      val docs = (0L until 40L).map { id =>
        val words = Seq.fill(rnd.nextInt(20) + 1)("w" + rnd.nextInt(6))
        (id, words.mkString(" "))
      }
      // naive: first occurrence per chunk in (doc_id, chunk_idx) order
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val chunks = toks.grouped(k).map(_.mkString(" ")).toSeq
        val kept = chunks.filter(c => seen.add(c))
        if (kept.isEmpty) None
        else Some((id, kept.size.toLong, kept.mkString(" ")))
      }
      val got = Dedup.passageDedup(docs.toDF("doc_id", "text"),
          "doc_id", "text", k)
        .orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.toSeq === expected,
        s"case $caseIdx: got=${got.toSeq.take(3)} want=${expected.take(3)}")
    }
  }

  test("deterministic MinHash LSH: full recall at ≥0.9, exact verify, replays") {
    val toks = Dedup.tokenize(docs, "doc_id", "text")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Dedup.minHashLshPairsDeterministic(toks, k = 3,
        numHashes = 32, bands = 8, threshold = 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val det = run()
    assert(exact.nonEmpty, "fixture should contain near-duplicates")
    assert((exact -- det).isEmpty, s"missed: ${exact -- det}")
    assert((det -- exact).isEmpty, s"false positives: ${det -- exact}")
    // pure function of the data — identical pair set on re-run
    assert(run() == det)
  }

  test("deterministic SimHash pairs are similar and replay identically") {
    val toks = Dedup.tokenize(docs, "doc_id", "text")
    def run() = Dedup.simHashPairsDeterministic(toks, maxDist = 3)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val det = run()
    assert(det.nonEmpty)
    assert(run() == det)
    // every reported pair is a unigram-Jaccard ≥ 0.5 near-dup
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 1, threshold = 0.5)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bogus = det -- exact
    assert(bogus.isEmpty, s"deterministic simhash reported dissimilar: $bogus")
  }

  test("d3/d4 harness queries stay non-vacuous on the fixture") {
    // the d3/d4 rows-only driver checks prove nothing if a fixture regen
    // quietly drops the planted near-duplicates — pin non-emptiness here
    // (mirrors the s2 planted-pair gate)
    import graft.queries.DedupQueries
    val d3 = DedupQueries.queries("d3_minhash_lsh")(spark, dir)
    val d4 = DedupQueries.queries("d4_simhash")(spark, dir)
    val nD3 = d3.count(); val nD4 = d4.count()
    assert(nD3 > 0, "d3_minhash_lsh returned no pairs — fixture vacuous")
    assert(nD4 > 0, "d4_simhash returned no pairs — fixture vacuous")
    // structural sanity: pairs are ordered i < j
    assert(d3.filter(col("i") >= col("j")).count() == 0)
    assert(d4.filter(col("i") >= col("j")).count() == 0)
  }

  test("PQ codes + ADC top-k reach ≥0.4 recall vs exact L2") {
    import graft.operators.ProductQuantization
    import org.apache.spark.sql.types._
    // L2 on unit-normalized vectors orders identically to cosine
    val normed = emb.select(col("vec_id"),
      { val v = col("embedding").cast(ArrayType(DoubleType))
        val n = sqrt(graft.operators.Similarity.dot(v, v))
        transform(v, x => x / n).as("embedding") })
    val model = ProductQuantization.fitPq(normed, "embedding",
      m = 16, kCodes = 16)
    assert(model.dim == 64 && model.m == 16)
    val codes = ProductQuantization.pqEncode(normed, "vec_id", "embedding",
      model).cache()
    // 16 shorts per vector vs 64 doubles: the compression is the point
    val c0 = codes.first()
    assert(c0.getSeq[Short](c0.fieldIndex("code")).length == 16)
    // deterministic: same fit + encode on rerun
    val model2 = ProductQuantization.fitPq(normed, "embedding",
      m = 16, kCodes = 16)
    assert(model.codebooks.flatten.flatten.toSeq ==
      model2.codebooks.flatten.flatten.toSeq)

    val queries = normed.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(queries, normed, "vec_id",
        "embedding", 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = ProductQuantization.pqTopK(codes, queries, "vec_id",
        "embedding", model, k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & pq).size.toDouble / bf.size
    assert(recall >= 0.4, s"PQ recall $recall too low")

    // IVF+PQ: probing half the cells must not fall far below plain PQ,
    // and its hits must always be a subset of what full-scan ADC ranks
    val centroids = Similarity.fitIvfCentroids(normed, "embedding",
      nlist = 16, maxIter = 4)
    val cellCodes = ProductQuantization.pqEncodeWithCells(normed, "vec_id",
      "embedding", model, centroids)
    val ivfpq = ProductQuantization.ivfPqTopK(cellCodes, queries, "vec_id",
        "embedding", model, centroids, k = 5, nprobe = 8)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpqRecall = (bf & ivfpq).size.toDouble / bf.size
    assert(ivfpqRecall >= 0.3, s"IVFPQ recall $ivfpqRecall too low")

    // refine: exact re-rank of the ADC shortlist must dominate raw ADC
    // recall (its top-k is the exact-best of a superset of ADC's top-k)
    val refined = ProductQuantization.pqTopKRefined(codes, normed,
        queries, "vec_id", "embedding", model, k = 5, expand = 4)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val refinedRecall = (bf & refined).size.toDouble / bf.size
    assert(refinedRecall >= recall,
      s"refine recall $refinedRecall < ADC recall $recall")
    assert(refinedRecall >= 0.7, s"refine recall $refinedRecall too low")
    codes.unpersist()
  }

  test("cosine is symmetric and self-similarity is 1") {
    val a = emb.limit(1).select(col("embedding").as("va"))
    val row = a.select(Similarity.cosine(col("va"), col("va"))).first()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
  }

  test("curation pipeline: quality filter → cluster reps → decontaminate") {
    // synthetic corpus where every stage has a known victim:
    //   doc 4 fails the Gopher length floor (< 50 words)
    //   docs 1,2 are near-identical (J ≈ 0.90 at k=3) → one cluster,
    //     min-id representative 1 survives
    //   doc 3 is clean and unique → survives
    //   doc 5 is clean and unique but shares a 4-gram run with the
    //     benchmark → decontaminated away
    import graft.operators.TextOps
    import spark.implicits._
    def words(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i =>
        s"$prefix${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val base = words("tok", 60)
    val corpus = Seq(
      (1L, base.mkString(" ")),
      (2L, (base.dropRight(1) :+ "changed").mkString(" ")),
      (3L, words("uniq", 60).mkString(" ")),
      (4L, "too short to pass"),
      (5L, words("qrs", 60).mkString(" "))
    ).toDF("doc_id", "text")
    // benchmark text contains 4 consecutive words of doc 5
    val bench = Seq((100L, ("eval question about " +
      words("qrs", 60).slice(10, 14).mkString(" ")))).toDF("doc_id", "text")

    val quality = TextOps.gopherFilter(corpus, "text")
    assert(quality.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 5L), "quality filter should drop only doc 4")

    val pairs = Dedup.ngramJaccardPairs(quality, "doc_id", "text",
      k = 3, threshold = 0.8)
    assert(pairs.select("i", "j").as[(Long, Long)].collect().toSet ==
      Set((1L, 2L)), "only docs 1,2 are near-duplicates")

    val reps = Dedup.connectedComponents(quality, "doc_id", pairs)
      .filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"))
    val kept = quality.join(reps, Seq("doc_id"))
    val out = Dedup.contaminatedAgainst(kept,
        bench, "doc_id", "text", k = 4)
      .filter(!col("is_contaminated"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 3L),
      s"expected reps 1,3 after decontamination, got $out")
  }

  test("pointer-jumping components: O(log d) rounds on a chain, " +
      "identical labels to plain propagation") {
    import spark.implicits._
    // path graph 0-1-2-...-63: diameter 63, single component
    val n = 64
    val nodes = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("i", "j")
    val jumped = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jumpRounds = Dedup.lastComponentRounds
    assert(jumped.values.toSet === Set(0L), "one component labeled 0")
    // path halving: propagation distance ~doubles per round — the
    // 63-hop chain must close in O(log d) rounds, far under diameter
    assert(jumpRounds <= 10, s"expected O(log d) rounds, got $jumpRounds")
    val plain = Dedup.connectedComponents(nodes, "doc_id", pairs,
        pointerJump = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plainRounds = Dedup.lastComponentRounds
    assert(plain === jumped, "jump must not change the labeling")
    assert(plainRounds > 2 * jumpRounds,
      s"plain propagation should need ~diameter rounds " +
        s"($plainRounds vs $jumpRounds)")
    // random graph parity (mixed component shapes)
    val rnd = new scala.util.Random(23)
    val rPairs = (0 until 150).map { _ =>
      val a = rnd.nextInt(120).toLong; val b = rnd.nextInt(120).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("i", "j")
    val rNodes = (0L until 120L).toDF("doc_id")
    val a = Dedup.connectedComponents(rNodes, "doc_id", rPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val b = Dedup.connectedComponents(rNodes, "doc_id", rPairs,
        pointerJump = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(a === b)
  }

  test("bloom decontamination is bit-identical to the exact broadcast path") {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val exact = Dedup.contaminatedAgainst(docs, bench,
        "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val bloom = Dedup.contaminatedAgainstBloom(docs, bench,
        "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(exact.exists(_._2), "fixture should contain contaminated docs")
    assert(exact.exists(!_._2), "fixture should contain clean docs")
    assert(bloom == exact)
  }

  test("GraphAnn: bit-reproducible builds, recall floor vs brute force") {
    import graft.operators.GraphAnn
    // the s13 oracle verifies against the RUN'S OWN exported
    // candidates, so determinism needs its own pin: two independent
    // builds + searches must produce identical (query, corpus, rank)
    def run(): Seq[(Long, Long, Int)] =
      GraphAnn.search(
          GraphAnn.build(emb, "vec_id", "embedding",
            nShards = 4, m = 8, efC = 48),
          emb.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, ef = 64)
        .select("query_id", "corpus_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val a = run()
    assert(a === run(), "HNSW build/search is not deterministic")
    assert(a.size === 100) // 20 queries x top-5
    // recall floor vs the exact arm (high ef on a small corpus
    // should be near-perfect)
    val exact = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = a.count { case (q, c, _) => exact.contains((q, c)) }
    assert(hits >= 90, s"HNSW recall@5 regressed: $hits/100")
  }

  test("GraphAnn.insert: incremental batch links into touched shards " +
      "only; recall holds; deterministic") {
    import graft.operators.{GraphAnn, Similarity}
    // build on the old corpus, insert the rest as an ingest batch
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val base = GraphAnn.build(old, "vec_id", "embedding",
      nShards = 4, m = 8, efC = 48)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("shard", "id", "nbrs", "upper", "unbrs").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList,
        r.getBoolean(3), r.getSeq[Long](4).toList))
      .sortBy(t => (t._1, t._2)).toSeq
    val upd = GraphAnn.insert(base, batch, "vec_id", "embedding",
      nShards = 4, m = 8, efC = 48)
    // deterministic: the same insert twice produces identical graphs
    assert(rows(upd) === rows(GraphAnn.insert(base, batch,
      "vec_id", "embedding", nShards = 4, m = 8, efC = 48)))
    // every vector indexed exactly once
    assert(upd.count() === emb.count())
    assert(upd.groupBy(col("id")).count()
      .filter(col("count") > 1).count() === 0)
    // batch ids are hash-sharded: vec_id % 10 == 0 lands only in
    // shards {0, 2} of 4 — shards 1 and 3 must pass through VERBATIM
    // (the persist-only-touched-partitions contract)
    val untouchedBefore = rows(base).filter(t => t._1 == 1 || t._1 == 3)
    val untouchedAfter = rows(upd).filter(t => t._1 == 1 || t._1 == 3)
    assert(untouchedAfter === untouchedBefore,
      "untouched shards must not be re-linked")
    // the inserted vectors are FINDABLE: querying with the new
    // vectors themselves, recall@5 vs the exact arm over the full
    // corpus stays high (new nodes are linked, not just appended)
    val queries = emb.filter(col("vec_id") % 10 === 0 &&
      col("vec_id") < 200)
    val approx = GraphAnn.search(upd, queries, "vec_id", "embedding",
        k = 5, ef = 64)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, emb,
        "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = approx.count(exact.contains)
    assert(hits >= (exact.size * 8) / 10,
      s"post-insert recall@5 regressed: $hits/${exact.size}")
    // and new nodes surface as NEIGHBORS too: some result cites an
    // inserted id for a non-inserted query
    val oldQueries = emb.filter(col("vec_id") % 10 === 1 &&
      col("vec_id") < 200)
    val fromOld = GraphAnn.search(upd, oldQueries, "vec_id",
        "embedding", k = 5, ef = 64)
      .filter(col("corpus_id") % 10 === 0).count()
    assert(fromOld > 0, "inserted vectors never appear in results")
  }

  test("GraphAnn.delete/upsert: tombstones never served, waypoints " +
      "kept, threshold rebuild, upsert serves the new vector") {
    import graft.operators.{GraphAnn, Similarity}
    val idx = GraphAnn.build(emb, "vec_id", "embedding",
      nShards = 4, m = 8, efC = 48)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("shard", "id", "nbrs", "upper", "unbrs", "dead").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList,
        r.getBoolean(3), r.getSeq[Long](4).toList, r.getBoolean(5)))
      .sortBy(t => (t._1, t._2)).toSeq
    import spark.implicits._
    // a SMALL delete (under the rebuild threshold): flags flip, the
    // adjacency of the touched shard is untouched (waypoints kept),
    // other shards byte-identical
    val delIds = Seq(8L, 16L, 24L).toDF("vec_id") // all land in shard 0
    val afterDel = GraphAnn.delete(idx, delIds, "vec_id",
      nShards = 4, m = 8, efC = 48)
    val before = rows(idx)
    val after = rows(afterDel)
    assert(after.filter(_._1 != 0) === before.filter(_._1 != 0),
      "untouched shards must pass through byte-identical")
    assert(after.filter(t => Set(8L, 16L, 24L)(t._2)).forall(_._6))
    assert(after.map(t => (t._1, t._2, t._3, t._4, t._5)) ===
      before.map(t => (t._1, t._2, t._3, t._4, t._5)),
      "a sub-threshold delete must not re-link anything")
    // deleted ids are NEVER served; their neighbors still are (the
    // graph stays navigable through the tombstones)
    val served = GraphAnn.search(afterDel,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, ef = 64)
      .select("corpus_id").as[Long].collect().toSet
    assert(!served.exists(Set(8L, 16L, 24L)),
      "tombstoned ids must never be served")
    // recall vs brute force over the SURVIVING corpus stays high
    val exact = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 20),
        emb.filter(!col("vec_id").isin(8L, 16L, 24L)),
        "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = GraphAnn.search(afterDel,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, ef = 64)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = approx.count(exact.contains)
    assert(hits >= (exact.size * 85) / 100,
      s"post-delete recall@5 regressed: $hits/${exact.size}")
    // a MASS delete crosses the threshold: the touched shard rebuilds
    // from live nodes only — tombstones gone, dead ids absent
    val massIds = emb.filter(col("vec_id") % 8 === 0) // vec_id % 8 == 0 all land in shard 0 (floorMod(id, 4)), pushing it past rebuildAt
      .select(col("vec_id"))
    val afterMass = GraphAnn.delete(idx, massIds, "vec_id",
      nShards = 4, m = 8, efC = 48, rebuildAt = 0.3)
    val mass = rows(afterMass)
    assert(mass.filter(_._1 != 0) === before.filter(_._1 != 0))
    assert(mass.filter(_._1 == 0).forall(!_._6),
      "an above-threshold delete must rebuild, leaving no tombstones")
    assert(!mass.exists(t => t._1 == 0 && t._2 % 8 == 0),
      "rebuilt shard must drop deleted nodes entirely")
    // UPSERT: replace a vector with a very different one — the new
    // vector must be served from its new neighborhood, the old
    // ranking forgotten; untouched shards byte-identical
    val target = 12L // shard 0
    val donor = emb.filter(col("vec_id") === 101L)
      .selectExpr("CAST(embedding AS ARRAY<DOUBLE>)").head()
      .getSeq[Double](0).toArray
    val replacement = Seq((target, donor)).toDF("vec_id", "embedding")
    val afterUp = GraphAnn.upsert(afterDel, replacement, "vec_id",
      "embedding", nShards = 4, m = 8, efC = 48)
    assert(rows(afterUp).filter(_._1 != 0) === after.filter(_._1 != 0))
    assert(rows(afterUp).filter(_._1 == 0).forall(!_._6),
      "upsert rebuilds the touched shard, clearing its tombstones")
    assert(!rows(afterUp).exists(t => Set(8L, 16L, 24L)(t._2)),
      "prior tombstones fall away with the upsert rebuild")
    // querying WITH the donor vector must now surface the upserted id
    // (its new position), with cosine ~1 for the id itself
    val q = Seq((9999L, donor)).toDF("vec_id", "embedding")
    val top = GraphAnn.search(afterUp, q, "vec_id", "embedding",
        k = 3, ef = 64)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(top.take(2).map(_._1).toSet.contains(target),
      s"upserted vector not served from its new position: " +
        top.mkString(","))
    assert(top.find(_._1 == target).exists(_._2 > 0.999),
      "the SERVED vector must be the new one (cos ~ 1 vs the donor)")
  }

  test("bloom decontamination plan: codegen'd might_contain prefilter + " +
      "shuffle (not broadcast) verify join") {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val plan = Dedup.contaminatedAgainstBloom(docs, bench,
        "doc_id", "text", k = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom prefilter should reach the physical plan")
    assert(plan.contains("ShuffledHashJoin"),
      "the exact verify must be a shuffle join (large-benchmark regime)")
  }
}
