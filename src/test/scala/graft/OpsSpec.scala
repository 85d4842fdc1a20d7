package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

/** Training-data pipeline operators: dedup, text analysis, ANN, multimodal
  * plumbing, sessionization (incl. the Structured Streaming variant). */
class OpsSpec extends AnyFunSuite with SparkTestBase {
  import scala.jdk.CollectionConverters._

  def docs(rows: (Long, String)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("exact dedup maps duplicates to the smallest doc id") {
    val d = docs(1L -> "Hello  World", 2L -> "other text", 3L -> "hello world",
      4L -> "HELLO WORLD ")
    val canon = Dedup.exactCanonical(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(canon == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("minhash-LSH finds planted near-duplicates, not unrelated docs") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val near = (1 to 57).map(i => s"token$i").mkString(" ") + " tokenX tokenY tokenZ"
    val far  = (1 to 60).map(i => s"other$i").mkString(" ")
    val d = docs(1L -> base, 2L -> near, 3L -> far)
    val pairs = Dedup.minHashNearDuplicates(d, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("minhash exact verify: forced semi-join path matches the fused path") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val near = (1 to 57).map(i => s"token$i").mkString(" ") + " tokenX tokenY tokenZ"
    val far  = (1 to 60).map(i => s"other$i").mkString(" ")
    val d = docs(1L -> base, 2L -> near, 3L -> far, 4L -> base)
    def run(thr: Long) = Dedup.minHashNearDuplicatesExact(d, "doc_id", "text",
        threshold = 0.5, semiJoinThreshold = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(-1L) == run(Long.MaxValue))
    assert(run(-1L).map(t => (t._1, t._2)) == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("near-dup clusters collapse transitive chains; deduplicate keeps min ids") {
    // 1~2 and 2~3 are each >=0.5 Jaccard but 1~3 is below it — the cluster
    // must still collapse all three (transitivity via WCC), plus an exact
    // dup pair (5,6) and singletons
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mid  = ((1 to 30).map(i => s"tok$i") ++ (1 to 10).map(i => s"alt$i")).mkString(" ")
    val far  = ((1 to 20).map(i => s"tok$i") ++ (1 to 20).map(i => s"alt$i")).mkString(" ")
    val d = docs(1L -> base, 2L -> mid, 3L -> far,
      4L -> (1 to 40).map(i => s"uniq$i").mkString(" "),
      5L -> "small doc copy", 6L -> "small doc copy")
    val clusters = Dedup.nearDupClusters(d, "doc_id", "text", threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L),
      s"got $clusters")
    val kept = Dedup.deduplicate(d, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("c4 line audit and clean: punctuation, length, blocklist, doc drop") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq("this line has enough words and ends well.",
                "too short.",
                "no terminal punctuation here at all",
                "ok line with five words.")),
      (2L, Seq("perfectly fine sentence with many words.",
                "curly brace { poisons the whole document."))
    ).toDF("doc_id", "lines")
    val audit = TextOps.c4LineAudit(d, "doc_id", "lines")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getBoolean(3), r.getString(4))).toMap
    assert(audit((1L, 0)) == ((true, "kept")))
    assert(audit((1L, 1)) == ((false, "too_short")))
    assert(audit((1L, 2)) == ((false, "no_terminal_punct")))
    assert(audit((1L, 3)) == ((true, "kept")))
    assert(audit((2L, 1)) == ((false, "blocklist")))
    val cleaned = TextOps.c4Clean(d, "doc_id", "lines")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // doc 2 dropped entirely (blocklisted line); doc 1 keeps lines 0 and 3
    assert(cleaned.keySet == Set(1L))
    assert(cleaned(1L) == Seq("this line has enough words and ends well.",
      "ok line with five words."))
  }

  test("paragraph dedup keeps only the first corpus-wide occurrence") {
    import spark.implicits._
    val d = Seq(
      (10L, Seq("shared header", "own text of ten", "another own")),
      (11L, Seq("shared header", "unique paragraph here")),
      (12L, Seq("fresh start", "shared header"))
    ).toDF("doc_id", "pars")
    val audit = Dedup.paragraphAudit(d, "doc_id", "pars")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2)).toMap
    assert(audit((10L, 0)) && !audit((11L, 0)) && !audit((12L, 1)))
    assert(audit((10L, 1)) && audit((10L, 2)) && audit((11L, 1)) && audit((12L, 0)))
    val out = Dedup.paragraphDedup(d, "doc_id", "pars")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(10L) == Seq("shared header", "own text of ten", "another own"))
    assert(out(11L) == Seq("unique paragraph here"))
    assert(out(12L) == Seq("fresh start"))
  }

  test("contamination flags benchmark n-gram overlap") {
    val evalDoc  = (1 to 20).map(i => s"bench$i").mkString(" ")
    val partial  = ((1 to 10).map(i => s"bench$i") ++ (1 to 10).map(i => s"own$i")).mkString(" ")
    val clean    = (1 to 20).map(i => s"clean$i").mkString(" ")
    val d = docs(1L -> evalDoc, 2L -> partial, 3L -> clean)
    import spark.implicits._
    val bench = Seq(evalDoc).toDF("text")
    val r = TextOps.contamination(d, "doc_id", "text", bench, "text", n = 5)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // verbatim copy: all 16 5-grams contaminated
    assert(r(1L) == ((16L, 16L, 1.0)), s"got ${r(1L)}")
    // partial: 5-grams fully inside the bench1..10 prefix are the first 6
    assert(r(2L)._1 == 6L && r(2L)._2 == 16L, s"got ${r(2L)}")
    assert(r(3L) == ((0L, 16L, 0.0)), s"got ${r(3L)}")
  }

  test("simhash: near-identical docs within small hamming distance") {
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val near = (1 to 98).map(i => s"w$i").mkString(" ") + " zzz"
    val far  = (1 to 100).map(i => s"q$i").mkString(" ")
    val d = docs(1L -> base, 2L -> near, 3L -> far)
    val h = Dedup.simHash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(2L)) < 8, s"near pair hamming ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) > 15, s"far pair hamming ${ham(h(1L), h(3L))}")
  }

  test("word-set jaccard for pairs") {
    val d = docs(1L -> "a b c d", 2L -> "a b c e", 3L -> "x y")
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardForPairs(d, pairs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 0.6)
    assert(j((1L, 3L)) == 0.0)
  }

  test("token count / quality / langid column functions") {
    val d = docs(
      1L -> "the cat sat on the mat and it is a good mat for cats to sit on",
      2L -> "", 3L -> "xyz")
    val r = d.select(col("doc_id"), TextOps.tokenCount(col("text")).as("t"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.langIdHeuristic(col("text")).as("l"))
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getDouble(2), x.getString(3)))).toMap
    assert(r(1L)._1 == 17)
    assert(r(1L)._3 == "en")
    assert(r(2L) == ((0, 0.333333, "unknown")))
    assert(r(3L)._1 == 1)
  }

  test("brute-force ANN top-k is exact and deterministic") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(top.toSeq == Seq((1L, 1), (2L, 2)))
  }

  test("brute-force local tail matches the distributed path exactly") {
    import spark.implicits._
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(6)(d => ((i * 13 + d * 5) % 11 - 5).toFloat))
    }.toDF("vec_id", "embedding")
    def rowsOf(t: Long): Set[(Long, Long, Double, Int)] =
      Ann.bruteForceTopK(vecs, vecs, k = 3, localTailThreshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rowsOf(100000000L) == rowsOf(-1L))
  }

  test("LSH top-k finds the exact nearest neighbor for clustered vectors") {
    import spark.implicits._
    val vecs = (0 until 50).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array.tabulate(8)(d => base * (1.0f + 0.01f * ((i * 7 + d) % 5))))
    }.toDF("vec_id", "embedding")
    val exact = Ann.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, k = 1)
      .collect().head.getLong(1)
    val lsh = Ann.lshTopK(vecs.filter(col("vec_id") === 0), vecs, k = 1,
      planes = 4, tables = 4).collect().headOption.map(_.getLong(1))
    assert(lsh.contains(exact), s"lsh=$lsh exact=$exact")
  }

  test("IVF top-k: exact-duplicate recall is structural; clustered recall high") {
    import spark.implicits._
    // two tight clusters around +1 and -1 per-dimension bases
    val vecs = (0 until 60).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array.tabulate(8)(d => base * (1.0f + 0.01f * ((i * 7 + d) % 5))))
    }.toDF("vec_id", "embedding")
    // a planted exact copy of vector 0 must come back at rank 1, cosine 1.0
    val copy = vecs.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val hit = Ann.ivfTopK(copy, vecs.unionByName(copy), k = 1, nlist = 4, nprobe = 1)
      .collect().head
    assert(hit.getLong(1) == 0L && hit.getDouble(2) == 1.0)
    // within-cluster queries find their exact nearest neighbor with nprobe=2
    val exact = Ann.bruteForceTopK(vecs.filter(col("vec_id") < 4), vecs, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Ann.ivfTopK(vecs.filter(col("vec_id") < 4), vecs, k = 1,
      nlist = 4, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf == exact, s"ivf=$ivf exact=$exact")
  }

  test("int8 quantization: codes bounded, round-trip error within scale/2, topk sane") {
    import spark.implicits._
    val vs = Seq(
      (0L, Array(0.5, -1.0, 0.25, 0.0)),
      (1L, Array(0.5, -1.0, 0.26, 0.0)),   // near-dup of 0
      (2L, Array(-3.0, 3.0, 3.0, -3.0)),
      (3L, Array(0.0, 0.0, 0.0, 0.0)))     // zero vector
      .toDF("vec_id", "embedding")
    val qz = Ann.scalarQuantize(vs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
    // scale = max|x|/127; codes in [-127,127]; extreme elements hit ±127
    assert(math.abs(qz(0L)._1 - 1.0 / 127.0) < 1e-15)
    assert(qz(0L)._2 == Seq(64, -127, 32, 0))
    assert(qz(2L)._2 == Seq(-127, 127, 127, -127))
    assert(qz(3L)._1 == 0.0 && qz(3L)._2 == Seq(0, 0, 0, 0))
    // round-trip |x - q*scale| <= scale/2
    for ((id, (scale, codes)) <- qz; if id != 3L) {
      val orig = vs.filter(col("vec_id") === id).collect()(0).getSeq[Double](1)
      codes.zip(orig).foreach { case (q, x) =>
        assert(math.abs(x - q * scale) <= scale / 2 + 1e-12, s"vec $id code $q vs $x") }
    }
    // quantized cosine finds the planted near-dup first
    val top = Ann.quantizedCosineTopK(vs.filter(col("vec_id") === 0), vs, k = 1)
      .collect()(0)
    assert(top.getLong(1) == 1L && top.getDouble(2) > 0.99, s"got $top")
  }

  test("multimodal plumbing: decode + features + frame sampling") {
    val media = Multimodal.synthMedia(spark, 30).persist()
    val dec = Multimodal.extractFeatures(Multimodal.decodeImages(media))
    val rows = dec.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getAs[Seq[Float]]("embedding").length == 64))
    assert(rows.forall(r => r.getAs[Int]("width") > 0 && r.getAs[Int]("height") > 0))
    // determinism (byte arrays toString unstably — compare embeddings by id)
    def embs(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => r.getAs[Long]("media_id") -> r.getAs[Seq[Float]]("embedding")).toMap
    val again = Multimodal.extractFeatures(Multimodal.decodeImages(media)).collect()
    assert(embs(rows) == embs(again))
    val frames = Multimodal.sampleFrames(media, framesPerItem = 3)
    val perVideo = frames.groupBy("media_id").count().collect().map(_.getLong(1))
    assert(perVideo.nonEmpty && perVideo.forall(_ == 3))
  }

  test("real image codec: PNG decode recovers true dims, channel means, and pixel histograms") {
    import spark.implicits._
    val ids = spark.range(40).toDF("id")
    val media = Multimodal.synthPngs(ids).persist()
    // payloads are REAL PNGs (magic sniff + full ImageIO decode)
    val first = media.orderBy("media_id").select("bytes").head.getAs[Array[Byte]](0)
    assert(Multimodal.RealCodec.looksLikeImage(first))
    // decodeImages must report the TRUE dimensions (not the stub's)
    val dec = Multimodal.decodeImages(media).collect()
    dec.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") == 16 + (id % 32).toInt, s"width of $id")
      assert(r.getAs[Int]("height") == 8 + (id % 16).toInt, s"height of $id")
      assert(r.getAs[Int]("channels") == 3)
    }
    // imageStats: exact channel means of a solid color
    Multimodal.imageStats(media).collect().foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Double]("mean_r") == (id * 37 % 256).toDouble, s"mean_r of $id")
      assert(r.getAs[Double]("mean_g") == (id * 59 % 256).toDouble, s"mean_g of $id")
      assert(r.getAs[Double]("mean_b") == (id * 83 % 256).toDouble, s"mean_b of $id")
    }
    // extractFeatures over real images: a solid color puts ALL mass in one
    // luma histogram bin, and the histogram sums to 1
    Multimodal.extractFeatures(media, dim = 16).collect().foreach { r =>
      val e = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(e.length == 16)
      assert(math.abs(e.sum - 1.0f) < 1e-6, s"histogram sum ${e.sum}")
      assert(e.count(_ > 0f) == 1, s"solid color must fill exactly one bin: $e")
    }
    // non-image payloads still take the stub path (dims within stub bounds)
    val stub = Multimodal.decodeImages(Multimodal.synthMedia(spark, 5)).collect()
    assert(stub.forall(r => r.getAs[Int]("width") <= 1920))
    media.unpersist()
  }

  test("sessionize splits on the gap and aggregates values") {
    import spark.implicits._
    val ts = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000)
    val events = Seq(
      (1L, ts(0), 7L, "c", 1.0, ""), (2L, ts(60), 7L, "c", 2.0, ""),
      (3L, ts(60 + 1801 + 60), 7L, "c", 3.0, ""),
      (4L, ts(10), 9L, "v", 5.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = Events.sessionize(events, gapSeconds = 1800)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sessions == Map((7L, 1L) -> 2L, (7L, 2L) -> 1L, (9L, 1L) -> 1L))
  }

  test("repetition signals: duplicate-token and top-bigram fractions") {
    import spark.implicits._
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "a b a b a"),        // tokens: 5, distinct 2 -> dup 0.6; bigrams: a b (x2), b a (x2) -> top 2/4
      (2L, "x y z"),            // all distinct -> dup 0; bigrams x y, y z -> top 1/2
      (3L, "w"),                // single word -> shingles fallback [w]
      (4L, "  ")                // blank -> dup 0
    ).toDF("doc_id", "text")
    val dup = docs.select(col("doc_id"),
      TextOps.duplicateTokenFraction(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dup(1L) == 0.6 && dup(2L) == 0.0 && dup(3L) == 0.0 && dup(4L) == 0.0)
    val top = TextOps.topNgramFraction(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(top(1L) == ((2L, 4L, 0.5)))
    assert(top(2L) == ((1L, 2L, 0.5)))
    assert(top(3L) == ((1L, 1L, 1.0)))
  }

  test("subword token count: GPT-2 pre-tokenizer convention, hand-traced") {
    import spark.implicits._
    val rows = Seq(
      (1L, "I'll see 3 cats, don't  stop!"), // 10 pre-tokens (trace in assert)
      (2L, ""),                              // empty -> 0
      (3L, "  "),                            // whitespace only -> 0
      (4L, "abc123!?x"))                     // letter/digit/punct runs split: abc,123,!?,x
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), graft.ops.TextOps.subwordTokenCount(col("text")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // I | 'll | _see | _3 | _cats | , | _don | 't | _stop | !
    assert(got(1L) === 10)
    assert(got(2L) === 0)
    assert(got(3L) === 0)
    assert(got(4L) === 4)
  }

  test("bigram LM scoring: add-k arithmetic exact on a hand-traced corpus") {
    val d = docs(1L -> "a b a b", 2L -> "a b", 3L -> "c c", 4L -> "x")
    val out = TextOps.bigramLmScore(d, "doc_id", "text", k = 0.1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus: bigrams (a,b)x3, (b,a)x1, (c,c)x1; histories a=3, b=1, c=1;
    // V=3 (vocabulary counts tokens of scoreable docs — "x" has no bigrams)
    def p(cb: Double, ch: Double) = math.log((cb + 0.1) / (ch + 0.1 * 3))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5 + 1e-6) / 1e6
    val lp1 = (2 * p(3, 3) + p(1, 1)) / 3.0
    val lp2 = p(3, 3)
    val lp3 = p(1, 1)
    assert(out(1L)._1 === 3L); assert(out(1L)._2 === r6(lp1))
    assert(out(2L)._1 === 1L); assert(out(2L)._2 === r6(lp2))
    assert(out(3L)._1 === 1L); assert(out(3L)._2 === r6(lp3))
    assert(!out.contains(4L)) // single-token doc: no bigram evidence
    // the frequent pattern scores higher (less surprising) than the rare one
    assert(out(2L)._2 > out(3L)._2)
  }

  test("hashed-ngram text classifier separates planted vocabularies") {
    import spark.implicits._
    // two disjoint vocabularies -> a linear model over hashed n-grams must
    // separate them near-perfectly
    val vocabA = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val vocabB = Seq("uno", "dos", "tres", "cuatro", "cinco")
    def doc(i: Long, v: Seq[String]) =
      (0 until 12).map(j => v(((i + j * 7) % v.length).toInt)).mkString(" ")
    val rows = (0L until 120L).map { i =>
      if (i % 2 == 0) (i, doc(i, vocabA), 1L) else (i, doc(i, vocabB), 0L)
    }
    val df = rows.toDF("doc_id", "text", "label")
    val r = TextOps.trainTextClassifier(df, "doc_id", "text", "label", dims = 32)
    assert(r.trainRows + r.testRows === 120L)
    assert(r.testRows > 0L)
    assert(r.accuracy >= 0.95, s"accuracy ${r.accuracy}")
    // features are L1-normalized distributions
    val f = TextOps.hashedNgramFeatures(df, "doc_id", "text", 32)
      .select(aggregate(col("features"), lit(0.0), (a, v) => a + v).as("s")).collect()
    assert(f.forall(r0 => math.abs(r0.getDouble(0) - 1.0) < 1e-9))
  }

  test("hashed-ngram features: empty/whitespace docs yield no feature row, not a phantom gram") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta"), (2L, ""), (3L, "   \t  "), (4L, "solo")
    ).toDF("doc_id", "text")
    val f = TextOps.hashedNgramFeatures(df, "doc_id", "text", 16)
    // docs 2 and 3 carry zero n-gram evidence -> excluded entirely (a
    // phantom ""-unigram bucket would otherwise enter classifier training)
    assert(f.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 4L))
    // surviving docs' features are unaffected by the empty-token filter
    val sums = f.select(aggregate(col("features"), lit(0.0), (a, v) => a + v)).collect()
    assert(sums.forall(r0 => math.abs(r0.getDouble(0) - 1.0) < 1e-9))
  }

  test("dedup/ANN estimate models within 2x of measured cached index shapes") {
    val n = 50000L
    val ids = spark.range(n).select(xxhash64(col("id")).as("id"))
    def cachedBytesPerRow(df: org.apache.spark.sql.DataFrame): Double = {
      val p = df.persist(); val rows = p.count()
      val size = p.queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          r.computeStats().sizeInBytes.toLong
      }.sum
      p.unpersist(blocking = true)
      size.toDouble / rows
    }
    def within2x(est: Double, meas: Double, tag: String): Unit =
      assert(est <= meas * 2 && est >= meas / 2,
        f"$tag: estimated $est%.0f B/row vs measured $meas%.1f B/row")
    // minhash signatures: (id, 32 hash longs) per doc
    val mh = graft.ops.Dedup.estimateMinHash(n, numHashes = 32, bands = 16)
    val sigFrame = ids.select(col("id"), transform(sequence(lit(0), lit(31)),
      h => xxhash64(col("id"), h)).as("sig"))
    within2x(mh.signatureBytes.toDouble / n, cachedBytesPerRow(sigFrame), "minhash sig")
    // banded index: one (band, bucket, id) row per (doc, band)
    val bandFrame = ids.select(col("id"), explode(sequence(lit(0), lit(15))).as("band"))
      .select(col("band").cast("int"), xxhash64(col("id"), col("band")).as("bucket"), col("id"))
    within2x(mh.indexBytes.toDouble / mh.indexRows, cachedBytesPerRow(bandFrame), "minhash band")
    assert(mh.indexRows === n * 16)
    // simhash: one 64-bit signature, 4 band rows
    val sh = graft.ops.Dedup.estimateSimHash(n)
    assert(sh.signatureBytes === n * 8 && sh.indexRows === n * 4)
    // LSH index rows carry (table, bucket, id, vector[dim])
    val dim = 32
    val lsh = graft.ops.Ann.estimateLsh(n, dim, planes = 12, tables = 4)
    val lshFrame = ids.select(lit(0).cast("int").as("table"),
      xxhash64(col("id")).as("bucket"), col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => pmod(xxhash64(col("id"), d), lit(100000L)) / lit(100000.0)).as("vec"))
    within2x(lsh.indexBytes.toDouble / lsh.indexRows, cachedBytesPerRow(lshFrame), "lsh index")
    assert(lsh.indexRows === n * 4)
    val ivf = graft.ops.Ann.estimateIvf(n, dim, cells = 64)
    assert(ivf.bytesMax === ivf.bytesMin * 3 && ivf.bytesMin > 0)
  }

  test("deterministic sampling: reproducible, fraction-accurate, stratified") {
    import spark.implicits._
    import graft.ops.Sampling
    val df = spark.range(2000).select(col("id"),
      when(col("id") % 2 === 0, "en").otherwise("zh").as("lang"))
    val a = Sampling.hashSample(df, Seq(col("id")), 0.25, 3L)
    val b = Sampling.hashSample(df, Seq(col("id")), 0.25, 3L)
    val na = a.count()
    assert(na == b.count())
    assert(a.except(b).count() == 0) // identical rows, not just counts
    assert(math.abs(na / 2000.0 - 0.25) < 0.05, s"kept $na")
    // different seed -> different (but same-sized-ish) sample
    val c = Sampling.hashSample(df, Seq(col("id")), 0.25, 4L)
    assert(a.except(c).count() > 0)
    val s = Sampling.stratifiedSample(df, col("lang"),
      Map("en" -> 0.0), defaultFraction = 1.0, Seq(col("id")), 5L)
    assert(s.filter(col("lang") === "en").count() == 0)
    assert(s.filter(col("lang") === "zh").count() == 1000)
  }

  test("windowed counts work as a structured stream (memory sink)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ts = (s: Long) => new java.sql.Timestamp(1700000000000L + s * 1000)
    Seq((1L, ts(0), 7L, "c", 1.0, ""), (2L, ts(7200), 7L, "c", 2.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = Events.windowedCountsStream(stream, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("winout").start()
    q.processAllAvailable(); q.stop()
    val out = spark.sql("SELECT * FROM winout ORDER BY window_start").collect()
    assert(out.length == 2 && out.forall(_.getLong(2) == 1L))
  }
}
