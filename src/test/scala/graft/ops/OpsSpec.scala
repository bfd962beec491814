package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.kg.TestSpark

/** Unit behavior of the training-data operators on small inline frames. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup groups and keeps the minimum id") {
    val d = docsDf(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val groups = Dedup.exactGroups(d, $"doc_id", $"text").collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getLong(1) == 2L).get
    assert(dup.getLong(2) == 1L)
    assert(Dedup.exactDedup(d, "doc_id", "text").count() == 2)
  }

  test("word shingles: distinct, guarded for short docs") {
    val sh = Dedup.wordShingles(docsDf(1L -> "a b c d", 2L -> "a b"), $"doc_id", $"text", 3)
      .as[(Long, String)].collect().toSet
    assert(sh == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("minhash LSH finds near-identical docs, not unrelated ones") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w40", "w40x")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val cands = Dedup.lshCandidates(docsDf(1L -> base, 2L -> nearDup, 3L -> other),
      $"doc_id", $"text").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccard pairs compute exact set sizes") {
    val d = docsDf(1L -> "a b c d e", 2L -> "a b c d f", 3L -> "q r s t u")
    val j = Dedup.jaccardPairs(d, $"doc_id", $"text")
      .as[(Long, Long, Long, Long)].collect().toSet
    // shingles(1): {a b c, b c d, c d e}; shingles(2): {a b c, b c d, c d f}
    assert(j == Set((1L, 2L, 2L, 4L)))
  }

  test("simhash: identical docs same signature; disjoint docs differ") {
    val d = docsDf(1L -> "a b c", 2L -> "c b a", 3L -> "p q r s t u v w")
    val s = Dedup.simhash16(d, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(s(1L) == s(2L)) // token-set based: order-invariant
    assert(s.values.forall(v => v >= 0 && v < (1 << 16)))
  }

  test("cosine + brute-force top-k ranks an identical vector first") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(e, $"vec_id", $"embedding",
      e.filter($"vec_id" === 0), $"vec_id", $"embedding", k = 2)
      .orderBy("rank").as[(Long, Int, Long)].collect().toList
    assert(top.map(_._3) == List(1L, 3L))
  }

  test("LSH top-k returns a subset consistent with exact cosine order") {
    val e = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val lsh = Similarity.lshTopK(e, $"vec_id", $"embedding",
      e.filter($"vec_id" < 2), $"vec_id", $"embedding", k = 5, dims = 8)
      .as[(Long, Int, Long)].collect()
    assert(lsh.nonEmpty)
    assert(lsh.groupBy(_._1).values.forall(_.length <= 5))
  }

  test("language id picks the stopword-dominant language deterministically") {
    val d = Seq(
      (1L, "the cat and the dog"),
      (2L, "der Hund und die Katze ist"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = d.select($"doc_id", TextOps.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "und")
  }

  test("quality metrics are integer-exact") {
    val q = TextOps.quality(docsDf(1L -> "the aa bbb"), $"doc_id", $"text").collect().head
    assert(q.getAs[Int]("n_chars") == 10)
    assert(q.getAs[Int]("n_tokens") == 3)
    assert(q.getAs[Int]("n_distinct_tokens") == 3)
    assert(q.getAs[Long]("mean_tok_len_x100") == 266) // floor(8*100/3)
    assert(q.getAs[Int]("max_tok_len") == 3)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("A  b\tC", "a b c").toDF("text")
      .select(TextOps.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("repetition metrics flag duplicated 2-grams and dominant tokens") {
    val d = Seq((1L, "a b a b a b"), (2L, "u v w x y z")).toDF("doc_id", "text")
    val m = Curation.repetitionMetrics(d, $"doc_id", $"text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1: 2-grams [a b, b a, a b, b a, a b] -> 5 total, 2 distinct -> 600 permille dup
    assert(m(1L) == (600L, 500L)) // 'a' appears 3/6 times -> 500 permille
    assert(m(2L) == (0L, 166L))   // all unique; top token 1/6 -> 166
  }

  test("chunking covers every token with the configured stride") {
    val text = (1 to 130).map(i => s"t$i").mkString(" ")
    val c = Curation.chunk(Seq((1L, text)).toDF("doc_id", "text"), $"doc_id", $"text")
      .orderBy("chunk_idx").collect()
    assert(c.length == 3) // (130-51)/40+2 = 3
    assert(c.map(_.getAs[Int]("n_tokens")).toList == List(50, 50, 50))
    val short = Curation.chunk(Seq((2L, "a b c")).toDF("doc_id", "text"), $"doc_id", $"text").collect()
    assert(short.length == 1 && short.head.getAs[Int]("n_tokens") == 3)
  }

  test("deterministic sample is stable and roughly proportional") {
    val d = (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val kept = Curation.sampleDeterministic(d, $"doc_id", 3)
    val n1 = kept.count(); val n2 = kept.count()
    assert(n1 == n2 && n1 > 200 && n1 < 400)
  }

  test("inter-document segment dedup drops shared spans, keeps order") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val d = Seq(
      (1L, s"$boiler u1 u2 u3"),
      (2L, s"$boiler v1 v2 v3"),
      (3L, "w1 w2 w3")).toDF("doc_id", "text")
    val out = Curation.interdocSegmentDedup(d, $"doc_id", $"text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (("u1 u2 u3", 1L)))
    assert(out(2L) == (("v1 v2 v3", 1L)))
    assert(out(3L) == (("w1 w2 w3", 0L)))
    // a doc that is ALL boilerplate survives as an empty row, not a lost id
    val d2 = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val out2 = Curation.interdocSegmentDedup(d2, $"doc_id", $"text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out2(1L) == (("", 1L)) && out2(2L) == (("", 1L)))
  }

  test("pii scrub redacts emails and long numbers, keeps words") {
    val got = Seq("write bob.smith+x@corp.example.org or call 5551234567 x42")
      .toDF("text").select(Curation.scrubPii($"text")).as[String].head()
    assert(got == "write <EMAIL> or call <NUM> x42")
  }

  test("winnowing fingerprints: long shared runs share a fingerprint") {
    val common = "q w e r t y u i o p" // 10 tokens >= w + k - 1 = 6
    val d = docsDf(1L -> s"a b $common x y", 2L -> s"m n o $common z",
      3L -> "totally different words here now")
    val rows = d.select($"doc_id", TextOps.winnowFingerprints($"text").as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    // the MOSS guarantee: a common run longer than w+k-1 tokens always
    // contributes at least one identical selected hash to both docs
    assert((rows(1L).toSet & rows(2L).toSet).nonEmpty)
    assert((rows(1L).toSet & rows(3L).toSet).isEmpty)
    // boundary sizes: < k tokens -> empty set; k..w+k-2 -> exactly one
    val s = docsDf(4L -> "a b", 5L -> "a b c d")
      .select($"doc_id", TextOps.winnowFingerprints($"text").as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(s(4L).isEmpty && s(5L).size == 1)
  }

  test("contamination counts shared eval n-grams, keeps zero-overlap docs") {
    val train = docsDf(1L -> "a b c d e f", 2L -> "x y z w v u")
    val eval_ = docsDf(3L -> "b c d e f g")
    val got = Curation.contamination(train, $"doc_id", $"text",
        eval_, $"doc_id", $"text", n = 5)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares exactly the 5-gram "b c d e f"; doc 2 shares nothing
    assert(got == Map(1L -> 1L, 2L -> 0L))
  }

  test("integer percentiles are exact order statistics") {
    val d = (1L to 100L).map(i => (i, i)).toDF("id", "v")
    val got = Curation.integerPercentiles(d, $"v", Seq(1, 50, 100))
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 1L, 50 -> 50L, 100 -> 100L)) // rank ceil(100p/100) = p
    // ties and ceil rounding: n=4 -> p50 rank 2 (value 5), p90 rank 4 (value 9)
    val g2 = Curation.integerPercentiles(Seq(5L, 5L, 5L, 9L).toDF("v"), $"v", Seq(50, 90))
      .as[(Int, Long)].collect().toMap
    assert(g2 == Map(50 -> 5L, 90 -> 9L))
  }

  test("quota sample: two-level salted top-k equals the single-window definition") {
    val rows = (1L to 200L).map(i => (i, if (i % 3 == 0) "en" else "de"))
    val d = rows.toDF("doc_id", "lang")
    val got = Curation.quotaSample(d, $"doc_id", $"lang", k = 7, salts = 8)
      .as[(Long, String, Int)].collect().toSet
    // reference: one window over the whole stratum (the oracle's shape)
    import org.apache.spark.sql.expressions.Window
    val hx = Dedup.hash64(concat($"lang", lit(":"), $"doc_id".cast("string")))
    val w = Window.partitionBy("lang").orderBy(hx, $"doc_id")
    val ref = d.withColumn("rank", row_number().over(w)).filter($"rank" <= 7)
      .select($"doc_id", $"lang", $"rank").as[(Long, String, Int)].collect().toSet
    assert(got == ref)
    assert(got.count(_._2 == "en") == 7 && got.count(_._2 == "de") == 7)
  }

  test("as-of join attaches the latest preceding right row, inclusive at ties") {
    def evs(rows: (Long, String, Long, Double)*) =
      rows.toDF("user_id", "s", "event_id", "value")
        .withColumn("ts", $"s".cast("timestamp_ntz"))
    val left = evs(
      (1L, "2024-01-01 10:00:00", 100L, 0.0), // after view 11 at 09:30
      (1L, "2024-01-01 09:00:00", 101L, 0.0), // before any view -> NULL
      (1L, "2024-01-01 09:30:00", 102L, 0.0), // EQUAL ts to view 11 -> inclusive
      (2L, "2024-01-01 10:00:00", 200L, 0.0)) // other user's views invisible
    val right = evs(
      (1L, "2024-01-01 09:30:00", 11L, 1.5),
      (1L, "2024-01-01 09:59:00", 12L, 2.5))
    val got = EventOps.asofJoin(left, $"user_id", $"ts", $"event_id",
        right, $"user_id", $"ts", $"event_id", $"value")
      .select($"lid", $"asof_id", $"asof_value")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(got == Set((100L, 12L, 2.5), (101L, -1L, -1.0), (102L, 11L, 1.5), (200L, -1L, -1.0)))
  }

  test("funnel counts ordered subsequences per user") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "view"), (1L, "2024-01-01 10:01:00", "click"),
      (1L, "2024-01-01 10:02:00", "purchase"),
      (2L, "2024-01-01 10:00:00", "click"), (2L, "2024-01-01 10:01:00", "view"),
      (3L, "2024-01-01 10:00:00", "view"), (3L, "2024-01-01 10:30:00", "error"),
      (3L, "2024-01-01 11:00:00", "click"),
      (4L, "2024-01-01 10:00:00", "view_ad"), (4L, "2024-01-01 10:01:00", "click"))
      .toDF("user_id", "s", "event_type").withColumn("ts", $"s".cast("timestamp_ntz"))
    val got = EventOps.funnel(ev, $"user_id", $"ts", $"event_type",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    // u1 completes all 3; u2's click precedes its view (step 1 only);
    // u3 reaches view>click with an unrelated event in between; u4's
    // "view_ad" must NOT satisfy the "view" step (exact-type match)
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("asofJoin matches a naive per-key scan oracle (randomized)") {
    val rnd = new scala.util.Random(7)
    // distinct right-side (key, ts) per the operator's determinism contract
    val right = (for (k <- 1 to 8) yield {
      val times = rnd.shuffle((0 until 360).toList).take(rnd.nextInt(20) + 1)
      times.map(m => (k.toLong, f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00",
        (k * 1000 + m).toLong, rnd.nextInt(100).toDouble))
    }).flatten
    val left = (for (k <- 1 to 10; _ <- 1 to rnd.nextInt(15) + 1) yield {
      val m = rnd.nextInt(360)
      (k.toLong, f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    }).zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong, 0.0) }
    def df(rows: Seq[(Long, String, Long, Double)]) =
      rows.toDF("user_id", "s", "event_id", "value")
        .withColumn("ts", $"s".cast("timestamp_ntz"))
    val got = EventOps.asofJoin(df(left.toSeq), $"user_id", $"ts", $"event_id",
        df(right), $"user_id", $"ts", $"event_id", $"value")
      .select($"lid", $"asof_id").as[(Long, Option[Long])].collect().toMap
    val byKey = right.groupBy(_._1)
    val expected = left.map { case (k, ts, lid, _) =>
      lid -> byKey.getOrElse(k, Nil).filter(_._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap
    assert(got == expected)
  }

  test("sessionize matches a naive gap-scan oracle (randomized)") {
    val rnd = new scala.util.Random(11)
    val events = for (u <- 1 to 12; _ <- 1 to rnd.nextInt(25) + 1) yield {
      val m = rnd.nextInt(1440)
      (u.toLong, f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    }
    val gapMin = 45
    val got = EventOps.sessionize(
        events.toDF("user_id", "s").withColumn("ts", $"s".cast("timestamp_ntz")),
        $"user_id", $"ts", gapMinutes = gapMin)
      .select($"user_id", $"session_idx", $"start_s", $"end_s", $"n_events")
      .as[(Long, Long, String, String, Long)].collect().toSet
    val expected = events.groupBy(_._1).flatMap { case (u, es) =>
      // duplicates INCLUDED: a tie row's gap to its twin is zero
      val sorted = es.map(_._2).sorted
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, t) =>
        val mins = (java.time.LocalDateTime.parse(t.replace(" ", "T")).toEpochSecond(java.time.ZoneOffset.UTC) -
          java.time.LocalDateTime.parse(acc.head.head.replace(" ", "T")).toEpochSecond(java.time.ZoneOffset.UTC)) / 60
        if (mins > gapMin) List(t) :: acc else (t :: acc.head) :: acc.tail
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (ses, i) =>
        (u, (i + 1).toLong, ses.head, ses.last, ses.size.toLong)
      }
    }.toSet
    assert(got == expected)
  }

  test("funnel matches a naive per-user subsequence oracle (randomized)") {
    val rnd = new scala.util.Random(42)
    val types = Vector("view", "click", "purchase", "error", "signup", "view_ad")
    val events = for (u <- 1 to 60; i <- 1 to rnd.nextInt(12) + 1) yield
      (u.toLong, f"2024-01-01 $i%02d:00:00", types(rnd.nextInt(types.size)))
    val steps = Seq("view", "click", "purchase")
    def isSubseq(seq: Seq[String], pat: Seq[String]): Boolean = {
      var j = 0
      for (t <- seq if j < pat.length) if (t == pat(j)) j += 1
      j == pat.length
    }
    val byUser = events.groupBy(_._1).map { case (_, es) => es.sortBy(_._2).map(_._3) }
    val expected = steps.indices.map(i =>
      (i + 1) -> byUser.count(s => isSubseq(s.toSeq, steps.take(i + 1))).toLong).toMap
    val df = events.toDF("user_id", "s", "event_type")
      .withColumn("ts", $"s".cast("timestamp_ntz"))
    val got = EventOps.funnel(df, $"user_id", $"ts", $"event_type", steps)
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got == expected)
  }

  test("invertedIndex: df-bounded postings, sorted, stopwords excluded") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog ran"),
      (4L, "the fox")).toDF("doc_id", "text")
    val got = TextOps.invertedIndex(docs, $"doc_id", $"text", minDf = 2, maxDf = 3)
      .as[(String, Long, String)].collect().toSet
    // "the" (df 4) exceeds maxDf; "sat"/"dog"/"fox" (df 1) below minDf
    assert(got == Set(("cat", 2L, "1,2"), ("ran", 2L, "2,3")))
  }

  test("collocations: integer PMI ordering, hand-checked") {
    val docs = (Seq.fill(3)("new york") ++ Seq("the cat", "the dog", "the cow"))
      .toDF("text")
    // tokens: new 3, york 3, the 3, cat/dog/cow 1 each; N = 12
    // pairs: (new,york) 3, (the,*) 1 each -> only (new,york) survives minPair=2
    // score = 3 * 12 * 1000 DIV (3 * 3) = 4000
    val got = TextOps.collocations(docs, $"text", minPair = 2, k = 5)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("new york", 3L, 4000L)))
  }

  test("jsonFieldStats: schema-on-read extraction, garbage stays NULL") {
    val ev = Seq(
      ("a", """{"k": 3}"""), ("a", """{"k": 7}"""), ("a", """{"x": 1}"""),
      ("b", """{"k": "oops"}"""), ("b", "not json at all"), ("b", """{"k": -2}"""))
      .toDF("event_type", "props")
    val got = EventOps.jsonFieldStats(ev, $"event_type", $"props", "k")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    assert(got == Set(
      ("a", 3L, 2L, Some(10L), Some(3L), Some(7L)),
      ("b", 3L, 1L, Some(-2L), Some(-2L), Some(-2L))))
  }

  test("latestState keeps one deterministic winner per key, original columns") {
    val ev = Seq(
      (1L, 10L, "2024-01-01 10:00:00", "view"),
      (1L, 11L, "2024-01-01 12:00:00", "click"),    // ts tie with 12
      (1L, 12L, "2024-01-01 12:00:00", "purchase"), // higher id wins
      (2L, 20L, "2024-01-01 09:00:00", "signup"))
      .toDF("user_id", "event_id", "s", "event_type")
      .withColumn("ts", $"s".cast("timestamp_ntz"))
    val got = EventOps.latestState(ev, $"user_id", $"ts", $"event_id")
      .select("user_id", "event_id", "event_type")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 12L, "purchase"), (2L, 20L, "signup")))
  }

  test("topNgrams: exact counts, lexicographic tie-break, short docs dropped") {
    val docs = Seq("a b a b c", "a b x", "z").toDF("text")
    // bigrams: "a b" x3, "b a" x1, "b c" x1, "b x" x1; "z" has none
    val got = TextOps.topNgrams(docs, $"text", n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("native vector kernels are bit-identical to the HOF folds they replaced") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
    val pairs = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .limit(2000).select($"a.v".as("va"), $"b.v".as("vb"))
    val diff = pairs.select(
      (Similarity.dot($"va", $"vb") === Similarity.dotHof($"va", $"vb")).as("d"),
      (Similarity.cosine($"va", $"vb") === Similarity.cosineHof($"va", $"vb")).as("c"),
      (Similarity.sqDist($"va", $"vb") === Similarity.sqDistHof($"va", $"vb")).as("s"))
      .agg(sum(when(!$"d" || !$"c" || !$"s", 1).otherwise(0)).as("n_mismatch"))
      .as[Long].head()
    assert(diff == 0L)
    // null/mismatch semantics mirror the HOF folds
    val edge = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(Similarity.dot($"a", $"b").as("d"))
      .as[Option[Double]].collect().toSeq
    assert(edge == Seq(Some(11.0), None))
    // SQL surface + implicit float->double cast
    graft.kg.GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(4).createOrReplaceTempView("vk_embs")
    val sql = spark.sql(
      "SELECT vec_cosine(embedding, embedding) c FROM vk_embs").as[Double].collect()
    assert(sql.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("salientTerms ranks by (df asc, tf desc, term), top-k per doc") {
    val docs = Seq(
      (1L, "the the rare rare rare the"), // rare: df 1 tf 3; the: df 2 tf 3
      (2L, "the odd")).toDF("doc_id", "text")
    val got = TextOps.salientTerms(docs, $"doc_id", $"text", k = 2)
      .as[(Long, Int, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1, "rare", 3L, 1L), (1L, 2, "the", 3L, 2L),
      (2L, 1, "odd", 1L, 1L), (2L, 2, "the", 1L, 2L)))
  }

  test("leakFreeSplit: dup pairs co-assigned, singletons covered, stable") {
    val docs = (1L to 200L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = Curation.leakFreeSplit(docs, $"doc_id", pairs)
      .as[(Long, Long, String)].collect()
    assert(got.length == 200 && got.map(_._1).toSet == (1L to 200L).toSet)
    val byId = got.map(r => r._1 -> ((r._2, r._3))).toMap
    // whole clusters share one cluster id and one split
    assert(Set(byId(1L), byId(2L), byId(3L)).size == 1 && byId(1L)._2 == byId(3L)._2)
    assert(byId(10L) == byId(11L))
    // singleton is its own cluster
    assert(byId(40L)._1 == 40L)
    // all three splits appear over ~197 clusters (hash spread sanity)
    assert(got.map(_._3).toSet == Set("train", "val", "test"))
  }

  test("sessionization groups events by gap, interval-exact") {
    val rows = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:20:00"),
      (1L, "2024-01-01 12:00:00"), (2L, "2024-01-01 09:00:00"))
    val d = rows.toDF("user_id", "s").withColumn("ts", $"s".cast("timestamp_ntz"))
    val got = EventOps.sessionize(d, $"user_id", $"ts", gapMinutes = 30)
      .as[(Long, Long, String, String, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, "2024-01-01 10:00:00", "2024-01-01 10:20:00", 2L),
      (1L, 2L, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1L),
      (2L, 1L, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1L)))
  }

  test("connected components via large-star/small-star") {
    import graft.kg.GraphOps
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 12L)).toDF("src", "dst")
    val cc = GraphOps.connectedComponents(e, "src", "dst", maxIter = 5)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(cc(12L) == 12L)
    // O(log n) rounds: a 300-node path has diameter 300 — min-label
    // propagation would need 300 rounds; star alternation contracts it
    // within the default maxIter
    val path = (0L until 300L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("src", "dst")
    val pcc = GraphOps.connectedComponents(path, "src", "dst")
      .as[(Long, Long)].collect()
    assert(pcc.length == 300 && pcc.forall(_._2 == 0L))
    val deg = GraphOps.degrees(e.withColumnRenamed("src", "subj_id").withColumnRenamed("dst", "obj_id"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(deg(2L) == (1L, 1L)) // 2 has one out-edge (2->3) and one in-edge (1->2)
    assert(deg(1L) == (1L, 0L) && deg(3L) == (0L, 1L))
  }

  test("BFS distances: shortest paths on a path graph, depth-capped") {
    import graft.kg.GraphOps
    // path 0-1-2-3-4-5 plus a shortcut 0-3
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (0L, 3L))
      .toDF("src", "dst")
    val got = GraphOps.bfsDistances(e, "src", "dst", sources = Seq(0L), maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    // 3 via the shortcut is 1 hop; 2 is reachable both ways at dist 2;
    // 5 (dist 3) is beyond the cap and absent
    assert(got == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L, 4L -> 2L))
  }

  test("degree-ordered triangle counting: K4 plus an isolated edge") {
    import graft.kg.GraphOps
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val e = (k4 :+ (10L, 11L)).toDF("src", "dst")
    val got = GraphOps.trianglesPerNode(e, "src", "dst")
      .as[(Long, Long)].collect().toMap
    // every K4 node sits in C(3,2) = 3 triangles; the isolated edge in none
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 10L -> 0L, 11L -> 0L))
    // reversed/duplicated edges change nothing (undirected canonicalization)
    val noisy = e.union(e.select($"dst", $"src"))
    assert(GraphOps.trianglesPerNode(noisy, "src", "dst")
      .as[(Long, Long)].collect().toMap == got)
  }

  test("int8 quantization: exact scale, rounding, and zero-vector guard") {
    val d = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(d, $"vec_id", $"embedding")
      .select($"id", $"q").as[(Long, Seq[Int])].collect().toMap
    // amax=1: 1.0 -> 127; -0.5*127 = -63.5, +0.5 then floor -> -63; 0 -> 0
    assert(got(1L) == Seq(127, -63, 0))
    assert(got(2L) == Seq(0, 0, 0))
  }

  test("scaled-integer PageRank matches hand-computed exact ranks") {
    import graft.kg.GraphOps
    // 1 -> 2, 2 -> 1, 1 -> 3; S = 1e12, teleport = 0.15*S
    // iter 1: contrib(1) = S/2 to {2,3}, contrib(2) = S to 1
    //   pr(1) = .15S + .85*S = S; pr(2) = pr(3) = .15S + 85*(S/2)/100
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("src", "dst")
    val pr = GraphOps.pagerankScaled(e, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(pr(1L) == 1000000000000L)
    assert(pr(2L) == 575000000000L && pr(3L) == 575000000000L)
    // deterministic: bit-identical across runs (exact BIGINT arithmetic)
    val pr3a = GraphOps.pagerankScaled(e, "src", "dst", iters = 3).as[(Long, Long)].collect().toMap
    val pr3b = GraphOps.pagerankScaled(e, "src", "dst", iters = 3).as[(Long, Long)].collect().toMap
    assert(pr3a == pr3b)
    // the hub (node 1: two in-edges worth of mass) outranks the leaves
    assert(pr3a(1L) > pr3a(2L) && pr3a(2L) == pr3a(3L))
  }

  test("ANN LSH recall vs brute force on real embeddings >= 0.8") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding", 10))
    val lsh = pairs(Similarity.lshTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding", 10, dims = 64))
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.8, s"LSH recall too low: $recall")
  }

  test("LSH ANN at 768 dims: codegen-bounded signatures, recall >= 0.8 on clustered embeddings") {
    // r1 unrolled tables*planes*dims literal terms (~37k expression nodes
    // at 768 dims, past the 64KB codegen method limit); the rewrite folds
    // one constant coefficient array per plane, so this must both RUN and
    // keep recall on cluster-structured data
    val rnd = new scala.util.Random(5)
    val centers = (0 until 8).map(_ => Array.fill(768)(rnd.nextGaussian()))
    val vecs = for (c <- 0 until 8; j <- 0 until 8) yield
      ((c * 8 + j).toLong, centers(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    val e = vecs.toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" % 8 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding", 5))
    val lsh = pairs(Similarity.lshTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding", 5, dims = 768))
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.8, s"768-dim LSH recall too low: $recall")
  }

  test("IVF ANN: deterministic cells, equi-join candidates, recall vs brute force") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val centroids = e.filter($"vec_id" < 8)
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray).toSeq
    val q = e.filter($"vec_id" < 5)
    val ivf = Similarity.ivfTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding",
      k = 10, centroids = centroids, nprobe = 4)
    // cell assignment is deterministic across evaluations
    val cells = e.select($"vec_id",
      Similarity.ivfCell(Similarity.asDouble($"embedding"), centroids).as("cell"))
    assert(cells.collect().toSet == cells.collect().toSet)
    assert(cells.agg(countDistinct($"cell")).as[Long].head() == 8)
    // probing half the cells keeps most true neighbors
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding", 10))
    val got = pairs(ivf)
    val recall = (bf & got).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // candidates come from an equi-join on the cell id — never cartesian
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("k-means centroids: deterministic Lloyd's keeps (or beats) first-16 IVF recall") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val init = e.filter($"vec_id" < 16)
      .select($"vec_id", Similarity.asDouble($"embedding").as("v"))
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray).toSeq
    val km = Similarity.kmeansCentroids(e, $"embedding", init, iters = 2)
    // determinism: a second run produces the exact same doubles
    assert(Similarity.kmeansCentroids(e, $"embedding", init, iters = 2)
      .zip(km).forall { case (a, b) => a.sameElements(b) })
    // and the centroids moved off the seed vectors
    assert(km.zip(init).exists { case (a, b) => !a.sameElements(b) })
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val q = e.filter($"vec_id" < 5)
    val bf = pairs(Similarity.bruteForceTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding", 10))
    def recall(cents: Seq[Array[Double]]) = {
      val got = pairs(Similarity.ivfTopK(e, $"vec_id", $"embedding", q, $"vec_id", $"embedding",
        k = 10, centroids = cents, nprobe = 4))
      (bf & got).size.toDouble / bf.size
    }
    // Lloyd's guarantee: quantization error (inertia) strictly improves
    // over the seed. Recall at fixed nprobe is NOISE on these unclustered
    // test embeddings (better-balanced cells can shuffle marginal
    // neighbors), so gate it at the same absolute floor as LSH ANN.
    def inertia(cents: Seq[Array[Double]]): Double = {
      val dists = cents.map(c => Similarity.sqDist($"v", typedLit(c.toSeq)))
      e.select(Similarity.asDouble($"embedding").as("v"))
        .select(least(dists: _*).as("d")).agg(sum($"d")).as[Double].head()
    }
    val (iKm, iSeed) = (inertia(km), inertia(init))
    assert(iKm < iSeed, s"k-means inertia $iKm did not improve on seed $iSeed")
    val rKm = recall(km)
    assert(rKm >= 0.8, s"k-means IVF recall too low: $rKm (seed ${recall(init)})")
  }

  test("embedding near-dup: bucketed two-stage matches exact on planted dups, no cartesian") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(32)(rnd.nextGaussian().toFloat)))
    val dups = (0 until 10).map { i =>
      (100L + i, base(i)._2.map(x => x * 1.001f + 0.0005f * rnd.nextGaussian().toFloat))
    }
    val e = (base ++ dups).toDF("vec_id", "embedding")
    val bucketed = Dedup.embeddingNearDups(e, $"vec_id", $"embedding", 0.99, dims = 32)
    val got = bucketed.as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingNearDupsExact(e, $"vec_id", $"embedding", 0.99)
      .as[(Long, Long)].collect().toSet
    assert(exact.size >= 10)
    assert(got == exact, s"bucketed ${got.size} vs exact ${exact.size}")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "bucketed near-dup plan must not contain an all-pairs join")
  }

  test("LSH mega-bucket (10k-duplicate cluster) emits a keeper star, not a quadratic clique") {
    val n = 10000
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val d = (0L until n.toLong).map(i => (i, text)).toDF("doc_id", "text")
    val sh = Dedup.wordShingles(d, $"doc_id", $"text", 3)
    val cands = Dedup.lshCandidatesFromShingles(sh, maxBucket = 100)
      .as[(Long, Long)].collect()
    // star: n-1 pairs, every member tied to keeper 0 — O(n), not O(n^2)
    assert(cands.length == n - 1)
    assert(cands.forall(p => p._1 == 0L && p._2 > 0L))
    // and the switch is observable, never silent
    val oversized = Dedup.lshBucketStats(sh, maxBucket = 100)
      .filter($"oversized").collect()
    assert(oversized.nonEmpty && oversized.forall(_.getAs[Long]("bsz") == n.toLong))
  }

  test("real WAV decode: sample rate / channels / frames from actual headers") {
    import spark.implicits._
    // id 1: rate 8000 + 1*4000, frames 400 + 1*100; id 4: rate 8000, frames 400+4*100
    val media = Multimodal.mediaWithRealBlobs(spark,
      Seq((1L, "a"), (4L, "b")).toDF("doc_id", "text"))
    val f = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m).toMap
    assert((f(1L).width, f(1L).height, f(1L).n_frames) == (12000, 1, 500))
    assert((f(4L).width, f(4L).height, f(4L).n_frames) == (8000, 1, 800))
    assert(f(1L).n_bytes == 44 + 500 * 2) // real RIFF container
    // decodeAudio itself round-trips a synthetic WAV
    assert(Multimodal.decodeAudio(Multimodal.syntheticWav(6L)) == Some((16000, 1, 1000)))
    // corrupt audio bytes degrade to the stub instead of failing the job
    val corrupt = Seq(MediaRow(9L, "audio", "RIFFxxxxWAVEbroken".getBytes("UTF-8"))).toDS()
    val c = Multimodal.extractFeatures(corrupt).collect().head
    assert(c.width == 0 && c.height == 0) // stub shape for audio
  }

  test("real animated-GIF video decode: frames counted from the container") {
    import spark.implicits._
    // id 2: w=8+2*2, h=6+2*2, frames=3+2; id 5: w=8+0, h=6+4, frames=3+5
    val media = Multimodal.mediaWithRealBlobs(spark,
      Seq((2L, "a"), (5L, "b")).toDF("doc_id", "text"))
    val f = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m).toMap
    assert(f(2L).kind == "video" && (f(2L).width, f(2L).height, f(2L).n_frames) == (12, 10, 5))
    assert((f(5L).width, f(5L).height, f(5L).n_frames) == (8, 10, 8))
    // decodeVideo itself round-trips a synthetic animation
    assert(Multimodal.decodeVideo(Multimodal.syntheticGif(7L)) == Some((12, 8, 4)))
    // corrupt GIF bytes degrade to the stub instead of failing the job
    val corrupt = Seq(MediaRow(9L, "video", "GIF89a-broken".getBytes("UTF-8"))).toDS()
    val c = Multimodal.extractFeatures(corrupt).collect().head
    assert(c.width >= 160 && c.n_frames >= 24) // video stub shape
  }

  test("real PNG decode: width/height come from the actual bytes") {
    val media = Multimodal.mediaWithRealBlobs(spark,
      Seq((0L, "a"), (3L, "b"), (1L, "c"), (2L, "d")).toDF("doc_id", "text"))
    val f = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m).toMap
    // id 0: 16 + 0*4 x 8 + 0*4; id 3: 16 + 3*4 x 8 + 3*4 — decoded, not derived
    assert((f(0L).width, f(0L).height, f(0L).n_frames) == (16, 8, 1))
    assert((f(3L).width, f(3L).height, f(3L).n_frames) == (28, 20, 1))
    assert(f(0L).n_bytes > 50 && f(0L).content_sha.length == 64) // real encoded PNG
    // and decodeImage itself round-trips a synthetic PNG
    assert(Multimodal.decodeImage(Multimodal.syntheticPng(5L)) == Some((36, 8)))
    // corrupt image bytes degrade to the stub instead of failing the job
    import spark.implicits._
    val corrupt = Seq(MediaRow(9L, "image", "not a png".getBytes("UTF-8"))).toDS()
    val c = Multimodal.extractFeatures(corrupt).collect().head
    assert(c.width >= 160 && c.n_frames == 1) // stub shape
  }

  test("multimodal feature extraction is deterministic over binary blobs") {
    val media = Multimodal.mediaFromDocuments(spark,
      Seq((0L, "hello"), (1L, "world"), (2L, "data")).toDF("doc_id", "text"))
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f.map(_.kind).toList == List("image", "audio", "video"))
    assert(f.forall(_.n_bytes == 5 || f.exists(_.n_bytes == 4)))
    assert(f.forall(_.content_sha.length == 64))
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f.toList == again.toList)
    val img = f(0)
    assert(img.width >= 160 && img.height == img.width * 3 / 4 && img.n_frames == 1)
  }
}
