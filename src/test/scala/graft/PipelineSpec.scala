package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Ann, Dedup, Multimodal, TextAnalysis}
import graft.functions.PolyHash
import graft.rdf.TpchRdf

class PipelineSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}
  private lazy val docs = TpchRdf.table(spark, SF, "documents")
  private lazy val embs = TpchRdf.table(spark, SF, "embeddings")

  test("ngramJaccard prefix == postings on randomized corpora (incl. tiny-doc floor)") {
    val spark2 = spark; import spark2.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // seeded generator: dense shared vocabulary (the regime that
    // stresses the extended-prefix match floor — most doc pairs share
    // SOMETHING) across random (threshold, df-cap) settings
    val rnd = new scala.util.Random(12)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega")
    for (trial <- 0 until 6) {
      val nDocs = 30 + rnd.nextInt(40)
      val rows = (0 until nDocs).map { i =>
        val len = 5 + rnd.nextInt(26)
        (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = rows.toDF("doc_id", "text")
      val minJ = Seq(0.3, 0.5, 0.8)(rnd.nextInt(3))
      val maxDf = Seq(4L, 16L, Long.MaxValue)(rnd.nextInt(3))
      val got = canon(Dedup.ngramJaccard(df, minJ, maxDf = maxDf))
      val want = canon(Dedup.ngramJaccardPostings(df, minJ, maxDf = maxDf))
      assert(got == want,
        s"trial=$trial minJ=$minJ maxDf=$maxDf missed=${want -- got} extra=${got -- want}")
    }
    // tiny docs: 3-6 words → 1-4 shingles, so α ≤ M and the match
    // floor degrades to min(M, maxα) — a pair sharing its single
    // shingle must still surface
    val tiny = (0 until 12).map { i =>
      val len = 3 + rnd.nextInt(4)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(6))).mkString(" "))
    }.toDF("doc_id", "text")
    for (minJ <- Seq(0.3, 0.5, 0.9)) {
      val got = canon(Dedup.ngramJaccard(tiny, minJ))
      val want = canon(Dedup.ngramJaccardPostings(tiny, minJ))
      assert(got == want, s"tiny minJ=$minJ missed=${want -- got} extra=${got -- want}")
    }
  }

  test("minhash LSH recall = 1.0 vs exact Jaccard ground truth at 0.8") {
    val truth = Dedup.ngramJaccard(docs, 0.8).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, 0.8).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == truth, s"missed=${truth -- lsh} extra=${lsh -- truth}")
  }

  test("simhash: near-dup docs have small Hamming distance") {
    val planted = Dedup.ngramJaccard(docs, 0.9).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(planted.nonEmpty)
    val dists = planted.map { case (a, b) =>
      java.lang.Long.bitCount(sh(a) ^ sh(b))
    }
    // J≈0.95+ pairs should be within a few bits of each other
    assert(dists.count(_ <= 6).toDouble / dists.length >= 0.8,
      s"hamming distances too large: ${dists.mkString(",")}")
  }

  test("ann lsh results are a subset of brute-force rankings, sims exact") {
    val q = embs.filter(col("vec_id") < 5)
    val bf = Ann.bruteForce(q, embs, 50).select("q_id", "n_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Ann.lshTopK(q, embs, 3, numBits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty)
    lsh.foreach { case (k, sim) =>
      assert(!bf.contains(k) || bf(k) == sim, s"sim mismatch for $k")
    }
  }

  test("ivf: sims exact, one cell per vector, recall reported vs brute force") {
    val q = embs.filter(col("vec_id") < 5)
    val k = 5
    val bf = Ann.bruteForce(q, embs, k).select("q_id", "n_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Ann.ivfTopK(q, embs, k, centroidMod = 64, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(ivf.nonEmpty)
    // every IVF sim agrees with the exact pairwise cosine
    val allPairs = Ann.bruteForce(q, embs, Int.MaxValue).select("q_id", "n_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { case (key, sim) =>
      assert(allPairs(key) == sim, s"sim mismatch for $key")
    }
    // probing 4 of ~N/64 cells on a random corpus still has to find a
    // sizeable share of the true top-k (measured 0.8 on this corpus)
    val recall = ivf.count { case (key, _) => bf.contains(key) }.toDouble / bf.size
    assert(recall >= 0.5, s"ivf recall collapsed: $recall")
  }

  test("blocked cosine pairs equal exact all-pairs (recall 1.0 on corpus)") {
    val exact = Ann.cosinePairsExact(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = Ann.cosinePairs(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    assert(blocked == exact, s"missed=${exact -- blocked} extra=${blocked -- exact}")
  }

  test("cosinePairs scale guard refuses a quadratic pair space loudly") {
    // same corpus, pathologically low cap: the bucket histogram
    // predicts more enumerated pairs/vector than allowed → refuse with
    // the documented escape paths instead of launching the job
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Ann.cosinePairs(embs, 0.45, maxAvgPairsPerVector = 4L)
    }
    assert(e.getMessage.contains("semanticDedup"))
    // explicit cap raise is the unguarded escape hatch — same results
    val guardedOff = Ann.cosinePairs(embs, 0.45, maxAvgPairsPerVector = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val default = Ann.cosinePairs(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(guardedOff == default)
  }

  test("cosinePairsCell: sims exact (subset of all-pairs), semanticDedup is its min-by-a aggregate") {
    // the scale-honest low-θ pair space: cell-confined, linear. Its
    // sims must agree with the exact operator wherever a pair surfaces,
    // and semanticDedup must be exactly its keeper aggregate (the
    // composition the dedup_embed_cosine driver query now ships).
    val exact = Ann.cosinePairsExact(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cell = Ann.cosinePairsCell(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(cell.nonEmpty, "test data should contain intra-cell near-dups")
    cell.foreach { case (k, sim) =>
      assert(exact.contains(k), s"cell pair $k not in exact all-pairs")
      assert(exact(k) == sim, s"sim mismatch for $k: ${exact(k)} vs $sim")
    }
    val fromPairs = cell.groupBy(_._1._2).map { case (b, xs) =>
      val (k, sim) = xs.minBy(_._1._1)
      (b, k._1, sim)
    }.toSet
    val sd = Ann.semanticDedup(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sd == fromPairs, s"missed=${fromPairs -- sd} extra=${sd -- fromPairs}")

    // INDEPENDENT confinement replay (the anti-self-consistency pin):
    // the driver correctness oracle replays the cell assignment in SQL,
    // so a recall collapse INSIDE the confinement logic would pass both
    // sides identically. Here the seed-book argmax is re-implemented
    // from its spec (seeds = vec_id % 64 == 0, book ascending by id,
    // argmax cosine with >= ties to the LATER seed) in plain Scala, and
    // cell's pair set must EQUAL the exact pairs restricted to same
    // cell — not merely be a subset of all-pairs.
    val rows = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def nrm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val seeds = rows.filter(_._1 % 64 == 0).sortBy(_._1)
    assert(seeds.length >= 2, "fixture should yield a multi-cell book")
    val cellOf = rows.map { case (id, v) =>
      var best = Double.NegativeInfinity; var bc = -1L
      seeds.foreach { case (sid, sv) =>
        val sim = v.zip(sv).map { case (a1, b1) => a1 * b1 }.sum / (nrm(v) * nrm(sv))
        if (sim >= best) { best = sim; bc = sid }
      }
      id -> bc
    }.toMap
    val exactSameCell = exact.keySet.filter { case (a1, b1) => cellOf(a1) == cellOf(b1) }
    assert(cell.map(_._1).toSet == exactSameCell,
      s"confinement drift: missing=${exactSameCell -- cell.map(_._1).toSet} " +
        s"extra=${cell.map(_._1).toSet -- exactSameCell}")
  }

  test("seed book is hash-thinned to maxBookK and collectBook refuses oversize loudly") {
    import spark.implicits._
    // 1) thinning bounds K at corpus-proportional candidate counts:
    //    centroidMod=1 makes ALL 500 vectors candidates; maxBookK=8 →
    //    thin=63 → the Knuth-hash survivors are the 7 ids whose
    //    (id·2654435761 mod 1000003) is ≡ 0 mod 63 — a FIXED-size book
    //    where the old default would have collected 500 rows
    val expectedSeeds = (0L until 500L)
      .filter(id => id * 2654435761L % 1000003L % 63L == 0L).toSet
    assert(expectedSeeds.size == 7)
    val out = Ann.kmeansAssign(embs, centroidMod = 1, maxBookK = 8).collect()
    assert(out.length == 500)   // one row per vector, nothing dropped
    // every assigned cluster id must come from the thinned seed set
    // (clusters are seed vec_ids in the one-iteration Lloyd book)
    assert(out.map(_.getLong(1)).toSet.subsetOf(expectedSeeds))
    // 2) refuse-loud guard: ids crafted so thinning CANNOT reach the
    //    cap (all 4 candidates share hash residue 0 mod thin=4), so the
    //    book would be 4 > 2·maxBookK=2 — collectBook must refuse and
    //    name the escape hatch
    val dims = Seq.fill(4)(1.0f)
    val adversarial = Seq(0L, 320L, 384L, 768L)
      .map(id => (id, dims.zipWithIndex.map { case (_, d) => (id % 7 + d + 1).toFloat }))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ann.semanticDedup(adversarial, 0.1, centroidMod = 64, maxBookK = 1)
    }
    assert(e.getMessage.contains("maxBookK"))
    // 3) the explicit escape hatch: raising maxBookK runs the same call
    val ok = Ann.semanticDedup(adversarial, 0.1, centroidMod = 64, maxBookK = 4)
    assert(ok.collect() != null)   // completes without the guard firing
  }

  test("multi-table ANN recall >= single-table at equal bits") {
    val q = embs.filter(col("vec_id") < 5)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // this corpus's neighbors sit at cos ≈ 0.3–0.5 (θ ≈ 60–70°), so a
    // single sketch almost never collides: recall needs many tables of
    // few bits (4 bits × 32 tables ⇒ ≥ 98% per pair analytically)
    val truth = hits(Ann.bruteForce(q, embs, 3))
    val single = hits(Ann.lshTopK(q, embs, 3, numBits = 4))
    val multi = hits(Ann.lshTopKMulti(q, embs, 3, numBits = 4, tables = 32))
    val rs = (single intersect truth).size.toDouble / truth.size
    val rm = (multi intersect truth).size.toDouble / truth.size
    assert(rm >= rs, s"multi-table recall $rm < single-table $rs")
    assert(rm >= 0.8, s"multi-table recall too low: $rm")
  }

  test("lsh bucket codegen matches a reference reimplementation") {
    val row = embs.orderBy("vec_id").limit(1)
      .select(col("embedding"), graft.functions.VectorExprs.lsh_bucket(col("embedding"), 6, 0).as("b"))
      .head()
    val emb = row.getSeq[Float](0)
    var expect = 0L
    for (p <- 0 until 6) {
      var proj = 0.0
      for (d <- emb.indices) {
        val k = (p.toLong * 1299721L + d.toLong * 104729L + p.toLong * d * 7919L) % 1000003L
        proj += emb(d).toDouble * (k.toDouble / 1000003.0 - 0.5)
      }
      if (proj > 0) expect |= (1L << p)
    }
    assert(row.getLong(1) == expect)
  }

  test("polyhash: codegen path matches reference implementation") {
    val ref = "hello world 42"
    val expected = PolyHash.hash(ref.getBytes("UTF-8"))
    import spark.implicits._
    val got = Seq(ref).toDF("s").select(PolyHash.polyhash(col("s"))).head().getLong(0)
    assert(got == expected)
    // stability across rows + interpreted path
    val many = (1 to 100).map(i => s"doc $i").toDF("s")
      .select(col("s"), PolyHash.polyhash(col("s")).as("h"))
    assert(many.select("h").distinct().count() == 100)
  }

  test("multimodal decode: schema, determinism, per-partition batching") {
    val out = Multimodal.decodeDocuments(spark, s"$SF/documents.parquet")
    assert(out.columns.toSeq == Seq("doc_id", "width", "height", "n_bytes", "format"))
    assert(out.count() == docs.count())
    val twice = Multimodal.decodeDocuments(spark, s"$SF/documents.parquet")
    assert(out.exceptAll(twice).isEmpty && twice.exceptAll(out).isEmpty)
    // parallelism is a knob, defaulting to the cluster's parallelism
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    val four = Multimodal.decode(
      Multimodal.mediaOf(spark, s"$SF/documents.parquet", parallelism = 4))
    assert(four.rdd.getNumPartitions == 4)
  }

  test("custom expressions register for SQL use") {
    graft.functions.GraftFunctions.registerAll(spark)
    docs.createOrReplaceTempView("docs_v")
    val viaSql = spark.sql("SELECT polyhash(text) AS h FROM docs_v ORDER BY doc_id LIMIT 3")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = docs.orderBy("doc_id").limit(3)
      .select(PolyHash.polyhash(col("text"))).collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
    // the full function family is SQL-callable with literal params
    embs.createOrReplaceTempView("embs_v")
    val sqlBucket = spark.sql(
      "SELECT lsh_bucket(embedding, 6, 0) AS b FROM embs_v ORDER BY vec_id LIMIT 1")
      .head().getLong(0)
    val colBucket = embs.orderBy("vec_id").limit(1)
      .select(graft.functions.VectorExprs.lsh_bucket(col("embedding"), 6, 0))
      .head().getLong(0)
    assert(sqlBucket == colBucket)
    val sh = spark.sql(
      "SELECT simhash64(array('alpha','beta')) AS s, float_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS d")
      .head()
    assert(sh.getDouble(1) == 2.0)
    // extensions entry point injects without error
    new graft.functions.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("salted join equals plain join") {
    val orders = TpchRdf.table(spark, SF, "orders")
      .select(col("o_custkey").as("k"), col("o_totalprice"))
    val cust = TpchRdf.table(spark, SF, "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    val plain = orders.join(cust, "k")
    val salted = graft.operators.SkewJoin.saltedInner(orders, cust, "k", 8)
    assert(plain.count() == salted.count())
    assert(salted.select("k", "o_totalprice", "c_name")
      .exceptAll(plain.select("k", "o_totalprice", "c_name")).isEmpty)
  }

  test("mixtureSample: broadcast-only doc path, keep-all cap, target strata") {
    import graft.pipeline.Curation
    val out = Curation.mixtureSample(docs, "lang",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), budget = 200)
    // the docs side joins the per-stratum rate table by broadcast —
    // the corpus itself never shuffles
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "fr")) && langs.nonEmpty)
    // a budget beyond availability caps at keep-all (rate 1000)
    val all = Curation.mixtureSample(docs, "lang", Map("en" -> 1.0), budget = 10000000L)
    assert(all.count() == docs.filter(col("lang") === "en").count())
  }

  test("language id covers all docs with a deterministic label") {
    val lid = TextAnalysis.langId(docs)
    assert(lid.count() == docs.count())
    assert(lid.filter(!col("pred_lang").isin("de", "en", "es", "fr", "zh", "und")).count() == 0)
  }

  test("pii: detects and redacts emails/phones/ips on PII-bearing text") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "contact alice@example.com or bob.smith+tag@mail.co.uk today"),
      (2L, "call 555-123-4567 or +4915112345678 now"),
      (3L, "server at 10.0.0.1 and 192.168.255.254 responded"),
      (4L, "mixed: eve@corp.io from 172.16.0.9 dialed 800-555-0199"),
      (5L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.pii(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 0L, 0L)))
    assert(out(2L) == ((0L, 2L, 0L)))
    assert(out(3L) == ((0L, 0L, 2L)))
    assert(out(4L) == ((1L, 1L, 1L)))
    assert(out(5L) == ((0L, 0L, 0L)))
    // redaction removes every detected span: fingerprint equals the
    // hand-redacted text's fingerprint
    val red = TextAnalysis.pii(fixture).filter(col("doc_id") === 4L)
      .select("redacted_fp").head.getLong(0)
    val expect = PolyHash.hash(
      "mixed: <EMAIL> from <IP> dialed <PHONE>".getBytes("UTF-8"))
    assert(red == expect)
    // a PII-free doc's redaction is the identity
    val clean = TextAnalysis.pii(fixture).filter(col("doc_id") === 5L)
      .select("redacted_fp").head.getLong(0)
    assert(clean == PolyHash.hash("clean text with no identifiers at all".getBytes("UTF-8")))
  }

  test("dedupMedia: byte-identical media collapse to the min-id keeper") {
    import spark.implicits._
    val media = Multimodal.mediaFrom(Seq(
      (7L, "same bytes"), (3L, "same bytes"), (9L, "other")).toDF("doc_id", "text"))
    val r = Multimodal.dedupMedia(media).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2), x.getLong(3)))).toMap
    assert(r(3L) == ((3L, false, 2L)))
    assert(r(7L) == ((3L, true, 2L)))
    assert(r(9L) == ((9L, false, 1L)))
  }

  test("frameNearDup: aligned-prefix variants pair, viral frames capped") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"block$i".padTo(16, 'x')).mkString // 40 frames of 16
    val fixture = Seq(
      (1L, base), (2L, base + "trailer-segment-x"), // shares all 40 full frames
      (3L, "totally different content that shares no aligned block with the others"))
      .toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaFrom(fixture), frameBytes = 16, every = 2).toDF()
    val pairs = Multimodal.frameNearDup(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 20L)), s"got ${pairs.toSeq}")
    // a frame above the df cap is dropped BEFORE pair enumeration
    val viral = Multimodal.frameNearDup(frames, minShared = 1, maxDf = 1)
    assert(viral.isEmpty, "df-capped frames must not enumerate pairs")
  }

  test("gopherRules: each rule trips on its engineered fixture") {
    import spark.implicits._
    // 60 varied words with stopwords — passes everything
    val good = (1 to 60).map(i => if (i % 7 == 0) "the" else if (i % 11 == 0) "with" else s"word$i").mkString(" ")
    val fixture = Seq(
      (1L, good),
      (2L, "too short to pass"),                                    // word count < 50
      (3L, (1 to 60).map(_ => "a").mkString(" ")),                  // mean word length < 3
      (4L, (1 to 60).map(i => s"## word$i #").mkString(" ")),       // symbol ratio > 0.1
      (5L, (1 to 60).map(i => s"- the bullet with word$i").mkString("\n")), // all lines bullets
      (6L, (1 to 60).map(i => s"the line with word$i ...").mkString("\n")), // all lines ellipsis
      (7L, (1 to 60).map(i => s"${i}000").mkString(" ") + " the of"), // alpha fraction < 0.8
      (8L, (1 to 60).map(i => s"word$i").mkString(" ")))             // no stopwords
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(fixture).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(r(1L).schema.fieldIndex("keep")), "good doc must keep")
    def failsOnly(id: Long, col: String): Unit = {
      val row = r(id)
      val idx = row.schema.fieldIndex(col)
      assert(!row.getBoolean(idx), s"doc $id should fail $col")
      assert(!row.getBoolean(row.schema.fieldIndex("keep")))
    }
    failsOnly(2L, "keep_word_count")
    failsOnly(3L, "keep_mean_wlen")
    failsOnly(4L, "keep_symbol")
    failsOnly(5L, "keep_bullet")
    failsOnly(6L, "keep_ellipsis")
    failsOnly(7L, "keep_alpha")
    failsOnly(8L, "keep_stopwords")
    // the '…' char and a '....' run: 4 dots = ONE '...' match (both engines
    // scan left-to-right non-overlapping), '…' counts once
    val sym = TextAnalysis.gopherRules(
        Seq((9L, "x … y .... z")).toDF("doc_id", "text"))
      .select("keep_symbol").head.getBoolean(0)
    assert(!sym, "2 symbols vs 5 words trips the 10x rule")
  }

  test("ccnetBuckets: terciles per language, head = most corpus-typical") {
    val b = TextAnalysis.ccnetBuckets(docs)
    val counts = b.groupBy("lang", "bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // NTILE(3): bucket sizes within a language differ by at most 1
    val langs = counts.keys.map(_._1).toSet
    for (l <- langs) {
      val sizes = Seq("head", "middle", "tail").map(bk => counts.getOrElse((l, bk), 0L))
      assert(sizes.max - sizes.min <= 1, s"$l sizes $sizes")
    }
    // head docs score >= tail docs within every language
    val rows = b.collect().map(r => (r.getString(1), r.getString(3), r.getDouble(2)))
    for (l <- langs) {
      val head = rows.filter(x => x._1 == l && x._2 == "head").map(_._3)
      val tail = rows.filter(x => x._1 == l && x._2 == "tail").map(_._3)
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max, s"$l head/tail overlap")
    }
  }

  test("temperatureMix: alpha flattens toward uniform, alpha=1 is proportional") {
    val kept = graft.pipeline.Curation.temperatureMix(docs, "lang", 0.3, 200L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // temperature upsamples low-resource languages RELATIVELY: the
    // smallest language keeps a larger fraction of itself than the
    // biggest (rates are per-mille floors, so compare keep-rates)
    val big = natural.maxBy(_._2)._1
    val small = natural.minBy(_._2)._1
    val rate = (l: String) => kept.getOrElse(l, 0L).toDouble / natural(l)
    assert(rate(small) > rate(big),
      s"small=$small ${rate(small)} vs big=$big ${rate(big)}")
    // alpha=1 reduces to proportional sampling: every language's keep
    // rate targets budget/N, so keep-rates are ~equal (within the
    // per-mille floor's granularity)
    val prop = graft.pipeline.Curation.temperatureMix(docs, "lang", 1.0, 200L)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val pr = natural.keys.map(l => prop.getOrElse(l, 0L).toDouble / natural(l))
    assert(pr.max - pr.min < 0.15, s"alpha=1 keep-rates spread: $pr")
    // deterministic: same inputs, same sample
    val again = graft.pipeline.Curation.temperatureMix(docs, "lang", 0.3, 200L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = graft.pipeline.Curation.temperatureMix(docs, "lang", 0.3, 200L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("bpeFertility: integer-sum metrics, merges shorten token counts") {
    val f8 = graft.pipeline.TextAnalysis.bpeFertility(docs, 8).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    assert(f8.nonEmpty)
    f8.foreach { case (lang, (nw, nt, tpw, cpt)) =>
      assert(nw > 0 && nt >= nw, s"$lang: tokens >= words")
      assert(tpw >= 1.0 && cpt >= 1.0, s"$lang: $tpw $cpt")
      assert(math.abs(tpw - nt.toDouble / nw) < 1e-3)
    }
    // more merges never lengthen: fertility at k=8 <= k=1 per language
    val f1 = graft.pipeline.TextAnalysis.bpeFertility(docs, 1).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    f8.foreach { case (lang, (_, _, tpw8, _)) =>
      assert(tpw8 <= f1(lang) + 1e-9, s"$lang: $tpw8 vs ${f1(lang)}")
    }
  }

  test("ccnetBuckets: exact NTILE parity without a per-language doc sort") {
    import org.apache.spark.sql.expressions.Window
    val b = TextAnalysis.ccnetBuckets(docs)
    // bit-exact parity with the doc-level NTILE formulation
    val w = Window.partitionBy("lang").orderBy(col("logprob").desc, col("doc_id"))
    val oracle = docs.select("doc_id", "lang")
      .join(TextAnalysis.logprobScore(docs), "doc_id")
      .withColumn("t", ntile(3).over(w))
      .select(col("doc_id"),
        when(col("t") === 1, "head").when(col("t") === 2, "middle")
          .otherwise("tail").as("bucket"))
    val mism = b.select("doc_id", "bucket").as("g")
      .join(oracle.as("o"), Seq("doc_id"))
      .filter(col("g.bucket") =!= col("o.bucket")).count()
    assert(mism == 0, s"$mism docs differ from NTILE")
    // scale shape: no ntile anywhere; the only DOC-level window is the
    // boundary row_number partitioned by (lang, logprob) tie group
    val plan = b.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("ntile"), "ntile must not appear")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LW}
    val docLevelWindows = b.queryExecution.optimizedPlan.collect {
      case lw: LW if lw.windowExpressions.exists(_.toString.contains("row_number")) =>
        lw.partitionSpec.map(_.toString)
    }
    assert(docLevelWindows.nonEmpty)
    docLevelWindows.foreach { spec =>
      assert(spec.exists(_.contains("logprob")),
        s"doc-level window must be tie-group-partitioned, got $spec")
    }
  }

  test("repetition: boilerplate scores high, varied text low") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "spam spam spam spam spam"),              // all one token
      (2L, "alpha beta gamma delta epsilon zeta"),   // all distinct
      (3L, "one two one two one two one two")        // repeated 2-grams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(fixture).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == ((1.0, 0.75))) // 4 bigrams, 1 distinct "spam spam"
    assert(out(2L)._1 < 0.2 && out(2L)._2 == 0.0)
    assert(out(3L)._1 == 0.5 && out(3L)._2 > 0.7)
    // corpus run: fractions in range, every tokenized doc covered
    val full = TextAnalysis.repetition(docs)
    assert(full.filter(col("top_word_frac") <= 0 || col("top_word_frac") > 1).count() == 0)
    assert(full.filter(col("dup_2gram_frac") < 0 || col("dup_2gram_frac") > 1).count() == 0)
  }

  test("char entropy: codegen matches reference impl; uniform text scores 0") {
    import spark.implicits._
    val fixture = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd")).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(fixture).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.0)
    assert(math.abs(out(2L) - math.log(2)) < 1e-3)
    assert(math.abs(out(3L) - math.log(4)) < 1e-3)
    // codegen path (corpus scan) equals the interpreted reference
    val viaExpr = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaRef = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> BigDecimal(graft.functions.ByteEntropy.entropy(
        r.getString(1).toLowerCase.getBytes("UTF-8")))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    assert(viaExpr == viaRef)
  }

  test("chunk: windows tile with overlap, fingerprints match slices") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"w$i").mkString(" ")
    val fixture = Seq((1L, text), (2L, "tiny doc"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(fixture, chunkTokens = 64, stride = 48).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // 150 tokens, stride 48 → starts 0,48,96,144 → 4 chunks
    assert(out.keys.count(_._1 == 1L) == 4)
    assert(out((1L, 0L))._1 == 64L)   // full window
    assert(out((1L, 3L))._1 == 6L)    // tail: tokens 145..150
    assert(out.keys.count(_._1 == 2L) == 1 && out((2L, 0L))._1 == 2L)
    assert(!out.keys.exists(_._1 == 3L)) // zero-token docs drop
    val expect = PolyHash.hash((49 to 112).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
    assert(out((1L, 1L))._2 == expect)
  }

  test("scaleup: replica transform is orthogonal (intra-replica cosines preserved, replicas decorrelated)") {
    val out = java.nio.file.Files.createTempDirectory("graft_scaleup").toString
    try {
      graft.tools.ScaleUp.run(spark, SF, out, 3)
      val e = spark.read.parquet(s"$out/embeddings.parquet")
      val base = embs.count()
      assert(e.count() == base * 3)
      def vecs(lo: Long, hi: Long) = e.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val span = { var s = 1L; val mx = embs.agg(max("vec_id")).head.getLong(0)
                   while (s <= mx) s *= 10; s }
      val r0 = vecs(0, span); val r1 = vecs(span, 2 * span)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
      }
      val ids = r0.keys.toSeq.sorted.take(6)
      // intra-replica pairwise cosines preserved (orthogonal transform)
      for (Seq(i, j) <- ids.combinations(2)) {
        val c0 = cos(r0(i), r0(j))
        val c1 = cos(r1(i + span), r1(j + span))
        assert(math.abs(c0 - c1) < 1e-5, s"intra-replica cosine drifted: $c0 vs $c1")
      }
      // cross-replica copies of the same base vector are decorrelated,
      // not artificial exact dups
      val selfCos = ids.map(i => cos(r0(i), r1(i + span)))
      assert(selfCos.forall(_ < 0.95), s"replica copies too correlated: $selfCos")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
    }
  }

  test("kmeans: every vector assigned, clusters are seed ids, plan broadcasts the book") {
    val out = Ann.kmeansAssign(embs, centroidMod = 64)
    val rows = out.collect()
    assert(rows.length == embs.count())
    val seedIds = embs.filter(col("vec_id") % 64 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(1)).toSet.subsetOf(seedIds))
    assert(rows.forall(r => r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9))
    // the reassignment is a single map-side pass over the corpus with
    // the centroid book in a broadcast variable: NO join, NO exchange,
    // no N·K row fanout (the crossJoin+argmax shape this replaced was
    // measured quadratic at the 100× probe)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), plan)
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("bloom_might_contain: no false negatives, fpp in range, codegen + interpreted agree") {
    import graft.functions.BloomExprs.bloom_might_contain
    val n = 2000L
    val base = spark.range(n).select(xxhash64(col("id").cast("string")).as("h"))
    val sketch = base.stat.bloomFilter("h", n, 0.03)
    // every inserted key probes true (bloom guarantee: zero false negatives)
    assert(base.filter(!bloom_might_contain(col("h"), sketch)).isEmpty)
    // disjoint probe set: false-positive rate near the configured fpp
    val other = spark.range(n, 10 * n)
      .select(xxhash64(col("id").cast("string")).as("h"))
    val fp = other.filter(bloom_might_contain(col("h"), sketch)).count()
    assert(fp.toDouble / (9 * n) < 0.1, s"fp rate ${fp.toDouble / (9 * n)}")
    // interpreted eval path (no codegen) returns the same verdicts
    val expr = graft.functions.BloomMightContain(
      org.apache.spark.sql.graftshim.Shim.expression(lit(0L)), {
        val bos = new java.io.ByteArrayOutputStream(); sketch.writeTo(bos); bos.toByteArray
      })
    val hs = base.limit(50).collect().map(_.getLong(0))
    assert(hs.forall(expr.test))
  }

  test("incrementalDedup matches the exact (bloom-free) semi-join semantics") {
    val newB = docs.filter(col("doc_id") >= 250)
    val prior = docs.filter(col("doc_id") < 250)
    val got = Dedup.incrementalDedup(newB, prior)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // exact reference: distinct window intersection computed directly
    val pw = Dedup.shingleSets(prior, 8)
      .select(explode(col("shingles")).as("win")).distinct()
      .collect().map(_.getString(0)).toSet
    val exact = Dedup.shingleSets(newB, 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).count(pw.contains)).toMap
    assert(got.nonEmpty && got.exists(_._3), "planted cross-split near-dups expected")
    got.foreach { case (id, nShared, isDup) =>
      assert(nShared == exact(id).toLong, s"doc $id: $nShared vs exact ${exact(id)}")
      assert(isDup == (nShared > 0))
    }
    assert(got.map(_._1).toSet == exact.keySet)
  }

  test("substringDup: planted near-dups carry dup_frac > 0, unique docs 0, short docs 0 windows") {
    val out = Dedup.substringDup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == docs.count())
    // a doc pair with J >= 0.8 shares long verbatim spans → both flagged
    val planted = Dedup.ngramJaccard(docs, 0.8).select("a", "b").collect()
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(out(r.getLong(0))._3 > 0.0 && out(r.getLong(1))._3 > 0.0)
    }
    out.values.foreach { case (nw, nd, frac) =>
      assert(nd <= nw)
      if (nw == 0) assert(frac == 0.0)
      else assert(math.abs(frac - nd.toDouble / nw) < 1e-6 + 1e-9)
    }
  }

  test("semanticDedup: pruned vectors really have a lower-id near-identical cluster-mate") {
    val pruned = graft.pipeline.Ann.semanticDedup(embs, 0.45).collect()
    assert(pruned.nonEmpty, "planted embedding near-dups expected")
    // ground truth: exact all-pairs cosine at the same tau
    val exactPairs = graft.pipeline.Ann.cosinePairs(embs, 0.45)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pruned.foreach { r =>
      val (v, dupOf, sim) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(dupOf < v)
      assert(sim >= 0.45 - 1e-6)
      assert(exactPairs.contains((dupOf, v)),
        s"($dupOf, $v) not in exact cosine pairs")
    }
  }

  test("classify: margins deterministic and equal for identical token streams") {
    val a = TextAnalysis.classify(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val b = TextAnalysis.classify(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(a == b)
    a.values.foreach { case (m, l) => assert(l == (m > 0) || m == 0.0) }
    // same token multiset ⇒ same margin (hashing is content-only)
    val spark2 = spark; import spark2.implicits._
    val twin = Seq((1L, "alpha beta gamma"), (2L, "alpha  beta,GAMMA")).toDF("doc_id", "text")
    val tm = TextAnalysis.classify(twin).collect().map(r => r.getDouble(1))
    assert(tm(0) == tm(1))
  }

  test("shardOrder: reproducible permutation, dense per-shard positions, no global sort") {
    val out = graft.pipeline.Curation.shardOrder(docs, shards = 8, seed = 42)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == docs.count())
    assert(rows.map(_._1).toSet.size == rows.length)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // partition-window sort, not a global Sort over the corpus: the
    // sort node is preceded by a hash-partitioning on the shard key
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning"))
    // determinism across runs
    val again = graft.pipeline.Curation.shardOrder(docs, shards = 8, seed = 42)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
  }

  test("substringDup + incrementalDedup keep short (<w words) docs with zero windows") {
    val spark2 = spark; import spark2.implicits._
    val tiny = Seq(
      (1L, "one two three"),                                      // < 8 words
      (2L, "a b c d e f g h i j"),
      (3L, "a b c d e f g h i j"),                                // near-dup of 2
      (4L, "k l m n o p q r s t u v w x y z unique tail words")).toDF("doc_id", "text")
    val prof = Dedup.substringDup(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(prof.keySet == Set(1L, 2L, 3L, 4L))
    assert(prof(1L) == ((0L, 0.0)))
    assert(prof(2L)._2 > 0 && prof(3L)._2 > 0 && prof(4L)._2 == 0.0)
    val inc = Dedup.incrementalDedup(
        tiny.filter(col("doc_id") >= 3), tiny.filter(col("doc_id") < 3))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(inc == Map(3L -> true, 4L -> false))
    val incShort = Dedup.incrementalDedup(
        tiny.filter(col("doc_id") === 1), tiny.filter(col("doc_id") > 1))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(incShort == Map(1L -> false))
  }

  test("pq ANN: codes in range, deterministic, reasonable recall vs brute force") {
    val q = embs.filter(col("vec_id") < 5)
    val out = graft.pipeline.Ann.pqTopK(q, embs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.nonEmpty)
    // ranks dense 1..k per query, adist ascending within a query
    out.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
    }
    // deterministic across runs
    val again = graft.pipeline.Ann.pqTopK(q, embs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSet == again.toSet)
    // quantized ranking still surfaces true neighbors: top-10 by ADC
    // overlaps top-10 by exact cosine (report-style, loose bound —
    // PQ with a 16-seed codebook is coarse at this corpus size)
    val bf = graft.pipeline.Ann.bruteForce(q, embs, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val overlap = out.groupBy(_._1).map { case (qid, rs) =>
      rs.map(_._2).toSet.intersect(bf(qid).map(_._2).toSet).size
    }
    assert(overlap.sum >= overlap.size, s"PQ found no true neighbors: $overlap")
  }

  test("cosinePairs kernel equals exact all-pairs on randomized corpora (dups, ties, noise)") {
    val spark2 = spark; import spark2.implicits._
    for (seed <- Seq(7, 42)) {
      val rnd = new scala.util.Random(seed)
      val base = Array.fill(40)(Array.fill(64)(rnd.nextFloat() * 2 - 1))
      val rows = (0 until 160).map { i =>
        val v =
          if (i < 40) base(i)                                          // originals
          else if (i < 80) base(i - 40).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f) // near-dups
          else if (i < 100) base(i - 80).clone()                       // exact dups (cos=1 ties)
          else Array.fill(64)(rnd.nextFloat() * 2 - 1)                 // background
        (i.toLong, v.toSeq)
      }
      val df = rows.toDF("vec_id", "embedding")
      val got = graft.pipeline.Ann.cosinePairs(df, 0.45).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // driver-side exact reference with the kernel's arithmetic
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < 64) {
          d += a(i).toDouble * b(i).toDouble
          na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
          i += 1
        }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val exact = (for {
        i <- rows.indices; j <- (i + 1) until rows.length
        c = cos(rows(i)._2, rows(j)._2) if c >= 0.45
      } yield (i.toLong, j.toLong) -> c).toMap
      // no spurious pairs, values exact
      got.foreach { case (k, v) =>
        assert(exact.contains(k), s"seed $seed: spurious pair $k")
        assert(v == math.rint(exact(k) * 1e6) / 1e6 ||
               math.abs(v - exact(k)) < 1e-6)
      }
      // full recall away from the LSH boundary band (≥ 0.5 here —
      // the scaladoc'd boundary-miss regime is below that)
      exact.filter(_._2 >= 0.5).keys.foreach { k =>
        assert(got.contains(k), s"seed $seed: missed clear pair $k (cos=${exact(k)})")
      }
      assert(exact.exists(_._2 >= 0.9), "corpus should contain planted near-dups")
    }
  }

  test("streaming near-dup: batching-invariant, matches the batch pair set") {
    val one = graft.operators.NearDup.run(spark, docs, splits = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val three = graft.operators.NearDup.run(spark, docs, splits = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(one == three, "verdicts must not depend on micro-batch boundaries")
    // batch ground truth: b of every simhashPairs (a < b) pair is a dup
    val pairs = Dedup.simhashPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val expectedDups = pairs.map(_._2).toSet
    assert(three.filter(_._2).keySet == expectedDups)
  }

  test("rate-source sketches equal the batch sketch: merge-invariant under live triggers") {
    val spark2 = spark; import spark2.implicits._
    import graft.operators.Sketch
    val n = 20000L
    // HLL: registers from an unbounded rate stream (watermark + live
    // ProcessingTime triggers) must be BIT-EQUAL to the batch registers
    // over the same value domain — max is a semilattice merge
    val rateReg = Sketch.hllRateSource(spark, n)
      .select("bucket", "M").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val batchReg = Sketch.hllRegisters(
        spark.range(n).select(lit("all").as("grp"), col("id").as("v")),
        Seq("grp"), col("v"))
      .select("bucket", "M").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rateReg == batchReg)
    // CMS: counter increments are a commutative monoid — same contract
    val rateCms = Sketch.cmsRateSource(spark, n)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val batchCms = Sketch.cmsBuild(spark.range(n).toDF("x"), col("x"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(rateCms == batchCms)
  }

  test("socket-source sketch equals the batch sketch: TCP line transport") {
    import graft.operators.Sketch
    val n = 5000L
    // loopback line server: one connection, n numeric lines, then held
    // open — the socket source never reconnects, so the emitter must
    // outlive the query (closing early fails the stream, not the data)
    val server = new java.net.ServerSocket(
      0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    @volatile var drained = false
    val emitter = new Thread(() => {
      val s = server.accept()
      val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(
        new java.io.BufferedOutputStream(s.getOutputStream), "UTF-8"))
      (0L until n).foreach { i => w.println(i) }
      w.println("not-a-number") // nulls out under try_cast, dropped
      w.flush()
      while (!drained) Thread.sleep(50)
      s.close()
    })
    emitter.setDaemon(true)
    emitter.start()
    try {
      val sockReg = Sketch.hllSocketSource(spark, "127.0.0.1", server.getLocalPort, n)
        .select("bucket", "M").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val batchReg = Sketch.hllRegisters(
          spark.range(n).select(lit("all").as("grp"), col("id").as("v")),
          Seq("grp"), col("v"))
        .select("bucket", "M").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(sockReg == batchReg)
    } finally { drained = true; server.close() }
  }

  test("bpeTrain: greedy left-to-right non-overlap merges, hand-checked 3 rounds") {
    val spark2 = spark; import spark2.implicits._
    // engineered so round 1 merges (a,a) — the x=y overlap case:
    // greedy L2R must give aaaa→[aa,aa] and aaa→[aa,a], never [a,aa,a]
    val df = Seq((1L, "aaaa aaa ab"), (2L, "aaaa aaaa b")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(df, 3).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // counts: aaaa f=3, aaa f=1, ab f=1, b f=1
    // r1: (a,a) = 3·3 + 2·1 = 11        → aaaa=[aa,aa], aaa=[aa,a]
    // r2: (aa,aa) = 3 beats (aa,a)=1     → aaaa=[aaaa]
    // r3: tie at 1 — (a,b) < (aa,a) lexicographically on (x, y)
    assert(merges == Seq((1L, "a", "a", 11L), (2L, "aa", "aa", 3L),
      (3L, "a", "b", 1L)), s"got $merges")
  }

  test("bpeEncode: post-merge sequence lengths, hand-checked at k=2") {
    val spark2 = spark; import spark2.implicits._
    val df = Seq((1L, "aaaa aaa ab"), (2L, "aaaa aaaa b")).toDF("doc_id", "text")
    // k=2 merges (a,a) then (aa,aa): aaaa=[aaaa](1), aaa=[aa,a](2),
    // ab=[a,b](2), b=[b](1)
    val enc = TextAnalysis.bpeEncode(df, 2).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc == Seq((1L, 3L, 5L), (2L, 3L, 3L)), s"got $enc")
    // more merges can only shorten sequences
    val enc0 = TextAnalysis.bpeEncode(df, 0).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(enc.forall { case (id, _, n) => n <= enc0(id) })
  }

  test("bpeTrain on the corpus: k merges, counts non-increasing, symbols compose") {
    val merges = TextAnalysis.bpeTrain(docs, 6).orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(merges.map(_._1) == (1L to 6L))
    // each round's winning count can only shrink or hold: merging never
    // creates new occurrences of a previously-available pair
    assert(merges.sliding(2).forall { case Seq(p, n) => n._4 <= p._4; case _ => true })
    // round 1 merges two single chars; later merges build on earlier
    val alphabet = ('a' to 'z').map(_.toString).toSet ++ ('0' to '9').map(_.toString)
    assert(alphabet(merges.head._2) && alphabet(merges.head._3))
  }

  test("streaming near-dup TTL: windowed verdicts batching-invariant, state bounded") {
    val h = 100L
    val (one, _) = graft.operators.NearDup.runWithProgress(
      spark, docs, splits = 1, horizonSec = Some(h))
    val oneM = one.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val (five, peakTtl) = graft.operators.NearDup.runWithProgress(
      spark, docs, splits = 5, horizonSec = Some(h))
    val fiveM = five.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // eviction is conservative (only provably-dead entries), so the
    // windowed verdicts must not depend on micro-batch boundaries
    assert(oneM == fiveM, "TTL verdicts must be batching-invariant")
    // windowed ground truth: dup ⇔ an earlier pair-partner within h ids
    val pairs = Dedup.simhashPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.filter(p => p._2 - p._1 <= h).map(_._2).toSet
    assert(fiveM.filter(_._2).keySet == expected)
    // and the window genuinely narrows vs full history on this corpus
    val fullDups = pairs.map(_._2).toSet
    assert(expected != fullDups,
      "fixture should contain a dup pair wider than the horizon")
    // state bound: a 500-doc replay with h=100 keeps ≲ 2 horizons of
    // band rows live (current batch + the unevictable watermark tail),
    // far under the unbounded 4·|docs|; peak is post-eviction per batch
    val (_, peakFull) = graft.operators.NearDup.runWithProgress(
      spark, docs, splits = 5)
    assert(peakFull >= 4L * docs.count() * 9 / 10,
      s"unbounded run should retain ~all band rows, got $peakFull")
    assert(peakTtl <= peakFull / 2,
      s"TTL state ($peakTtl rows) should stay well under unbounded ($peakFull)")
  }

  test("streaming near-dup archive fold: bounded state ≡ full-history verdicts") {
    val full = graft.operators.NearDup.run(spark, docs, splits = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val folded = graft.operators.NearDup.runWithArchive(
        spark, docs, splits = 3, horizonSec = 100L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(folded == full,
      "horizon window ∪ expired-archive sweep must equal full history")
  }

  test("dsir: target-domain docs score higher; weights are finite and token-scaled") {
    val spark2 = spark; import spark2.implicits._
    val isTgt = col("source").isin("src0", "src1", "src2", "src3")
    val w = graft.pipeline.Curation.dsirWeights(docs, isTgt)
      .join(docs.select(col("doc_id"), isTgt.as("tgt")), "doc_id")
      .select("doc_id", "n_tokens", "dsir_weight", "tgt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(w.nonEmpty && w.forall(x => !x._3.isNaN && !x._3.isInfinite))
    // importance weights separate the domains ON AVERAGE: the target
    // sources' mean per-token weight must exceed the non-targets'
    val perTok = w.map(x => (x._4, x._3 / x._2))
    val tMean = perTok.filter(_._1).map(_._2).sum / perTok.count(_._1)
    val rMean = perTok.filterNot(_._1).map(_._2).sum / perTok.count(!_._1)
    assert(tMean > rMean,
      s"target mean per-token weight $tMean should exceed non-target $rMean")
    // synthetic separation check: a corpus whose target half uses a
    // disjoint vocabulary must rank every target doc above every raw doc
    val synth = (0 until 40).map { i =>
      val txt = if (i < 20) s"alpha beta gamma delta tok$i" else s"omega psi chi phi tok$i"
      (i.toLong, txt, "en", if (i < 20) "tgt" else "bg", txt.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val sw = graft.pipeline.Curation.dsirWeights(synth, col("source") === "tgt")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val minTgt = (0 until 20).map(i => sw(i.toLong)).min
    val maxBg = (20 until 40).map(i => sw(i.toLong)).max
    assert(minTgt > maxBg, s"disjoint-vocab target docs must dominate: $minTgt vs $maxBg")
  }

  test("bpe pair counts: rank 1 is the corpus' most frequent adjacent pair, counts exact") {
    val spark2 = spark; import spark2.implicits._
    val got = TextAnalysis.bpePairCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 50 && got.map(_._3).toSeq == (1L to 50L))
    // driver-side exact recount on the same tokenization
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    docs.select("text").as[String].collect().foreach { t =>
      t.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
        .foreach { w =>
          var i = 0
          while (i < w.length - 1) {
            counts(w.substring(i, i + 2)) =
              counts.getOrElse(w.substring(i, i + 2), 0L) + 1
            i += 1
          }
        }
    }
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
    assert(got.sortBy(_._3).map(x => (x._1, x._2)).toSeq == want)
  }

  test("random projection: JL distance preservation in expectation, digests deterministic") {
    val a = Ann.randomProject(embs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val b = Ann.randomProject(embs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(a == b, "projection must be deterministic across runs")
    assert(a.values.forall(v => v._2 >= 0 && v._2 < 16))
    // JL: projected norm concentrates around the original norm —
    // check the mean ratio is within 20% (unbiased in expectation)
    val spark2 = spark; import spark2.implicits._
    val orig = embs.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().map { case (id, e) =>
        id -> math.sqrt(e.map(x => x.toDouble * x.toDouble).sum)
      }.toMap
    val ratios = a.collect { case (id, (pn, _, _)) if orig(id) > 0 => pn / orig(id) }
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.2, s"mean norm ratio $mean should be ~1")
  }

  test("winnowing: shared substrings >= k+w-1 guarantee a shared fingerprint; density ~2/(w+1)") {
    val spark2 = spark; import spark2.implicits._
    val rnd = new scala.util.Random(11)
    def randTxt(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = "the quick brown fox jumps over it" // >> k+w-1 = 8 chars
    val fixture = Seq(
      (1L, randTxt(60) + " " + shared + " " + randTxt(60)),
      (2L, randTxt(80) + " " + shared),
      (3L, randTxt(120))).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val byDoc = fps.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    // the MOSS guarantee: docs 1 and 2 share the planted substring
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "docs sharing a >= k+w-1 substring must share a fingerprint")
    // density: ~2/(w+1) of positions selected (robust winnowing bound)
    val real = TextAnalysis.winnow(docs).collect()
    val nPos = docs.select(sum(greatest(length(
      regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")) - 4, lit(0))))
      .collect()(0).getLong(0)
    val density = real.length.toDouble / nPos
    assert(density > 0.1 && density < 0.5, s"fingerprint density $density out of range")
  }

  test("count-min: never underestimates, exact for heavy hitters, d*w-bounded table") {
    val spark2 = spark; import spark2.implicits._
    val items = (1 to 3000).map { i =>
      // zipfian-ish: item k appears ~3000/k times
      val k = (3000.0 / i).toInt.max(1)
      s"item$k"
    }.toDF("x")
    val sketch = graft.operators.Sketch.cmsBuild(items, col("x"))
    assert(sketch.count() <= 4 * 256, "counter table must stay d*w-bounded")
    val exact = items.groupBy("x").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val qs = exact.keys.toSeq.toDF("x")
    val est = graft.operators.Sketch.cmsEstimate(sketch, qs, col("x")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS underestimated $k: ${est(k)} < $n")
    }
    // heavy hitters collide rarely at N=3000, w=256: the top item's
    // overestimate must be small relative to its count
    val (topK, topN) = exact.maxBy(_._2)
    assert(est(topK) - topN <= 0.1 * 3000, s"heavy hitter $topK est ${est(topK)} vs $topN")
  }

  test("collocations: planted phrase tops PMI ranking; counts respect minCount") {
    val spark2 = spark; import spark2.implicits._
    val rnd = new scala.util.Random(9)
    val common = Seq("the", "a", "of", "and", "data", "table", "row", "scan")
    // plant a rigid phrase "zig zag" that always co-occurs; background
    // is random common-word soup
    val fixture = (0 until 80).map { i =>
      val noise = Seq.fill(30)(common(rnd.nextInt(common.size))).mkString(" ")
      (i.toLong, s"$noise zig zag $noise", "en", "s", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.collocations(fixture, minCount = 5, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty && got.forall(_._2 >= 5))
    assert(got.head._1 == "zig zag",
      s"the rigid planted phrase must rank first, got ${got.head}")
    assert(got.map(_._4).toSeq == (1L to got.length))
  }

  test("bpe round 2: merge applied left-to-right non-overlapping, round-2 pairs over symbols") {
    val spark2 = spark; import spark2.implicits._
    // "aaa" x10: round-1 top merge is "aa" (2 occurrences/word);
    // greedy application gives "#a" (NOT "a#" or double-merge)
    val fixture = (0 until 10).map(i => (i.toLong, "aaa", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.bpeSecondRound(fixture).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.head._1 == "aa", s"merge should be 'aa': ${got.head}")
    assert(got.map(x => x._2 -> x._3).toMap == Map("#a" -> 10L),
      s"round-2 pairs should be exactly {#a: 10}: ${got.toSeq}")
  }

  test("span corruption: fingerprints match hand-built input/label pair; tail span skipped") {
    val spark2 = spark; import spark2.implicits._
    // 13 tokens: span 0 covers t1-t3 (positions 1-3); the next start
    // (position 11) has only 3 left (11,12,13) -> full, masked too
    val toks = (1 to 13).map(i => s"t$i")
    val fixture = Seq((1L, toks.mkString(" "), "en", "s", 1L),
        (2L, "a b", "en", "s", 1L)) // too short for any span
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextAnalysis.spanCorruption(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def fp(s: String) = graft.functions.PolyHash.hash(s.getBytes("UTF-8"))
    val corrupted1 = "mask_0 t4 t5 t6 t7 t8 t9 t10 mask_1"
    val targets1 = "mask_0 t1 t2 t3 mask_1 t11 t12 t13"
    assert(got(1L) == ((2L, 6L, fp(corrupted1), fp(targets1))), s"got ${got(1L)}")
    assert(got(2L) == ((0L, 0L, fp("a b"), fp(""))))
  }

  test("bigram LM: shuffled-word doc scores below its natural-order twins") {
    val spark2 = spark; import spark2.implicits._
    val sent = "the quick brown fox jumps over the lazy dog and runs far away"
    val shuffled = "dog the far jumps quick and away brown the runs lazy fox over"
    val fixture = ((0 until 20).map(i => (i.toLong, sent)) :+ (99L, shuffled))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scores = TextAnalysis.bigramLmScore(fixture).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(0L) > scores(99L),
      s"natural order ${scores(0L)} must outscore shuffled ${scores(99L)}")
  }

  test("streaming cms equals the batch counter table") {
    val spark2 = spark; import spark2.implicits._
    val items = (1 to 1500).map(i => s"item${i % 97}").toDF("x")
    val batch = graft.operators.Sketch.cmsBuild(items, col("x")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = graft.operators.Sketch.cmsStreaming(items, col("x"), splits = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, "streamed counters must merge to the batch table")
  }

  test("quantizeInt8: reconstruction within half a step, digests consistent") {
    val digs = graft.pipeline.Ann.quantizeInt8(embs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val raw = embs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(digs.keySet == raw.keySet)
    raw.foreach { case (id, emb) =>
      val xs = emb.map(_.toDouble)
      val scale = xs.map(math.abs).max / 127.0
      val q = xs.map(x => math.max(-127L, math.min(127L, math.floor(x / scale + 0.5).toLong)))
      // round-trip error bound: |x − q·scale| ≤ scale/2 (+ float eps)
      xs.zip(q).foreach { case (x, qv) =>
        assert(math.abs(x - qv * scale) <= scale / 2 + 1e-9) }
      val (qscale, checksum, nSat) = digs(id)
      assert(math.abs(qscale - scale) < 5e-7)
      assert(checksum == q.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum)
      assert(nSat == q.count(v => math.abs(v) == 127L))
    }
  }

  test("budgetSelect: greedy best-quality prefix, boundary doc ends it") {
    // the selection must equal the plain running-sum prefix over
    // (quality desc, doc_id) — the histogram/threshold decomposition
    // is plan shape, not semantics
    val sel = graft.pipeline.Curation.budgetSelect(docs, 10000L).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val ranked = graft.pipeline.TextAnalysis.quality(docs)
      .join(graft.pipeline.TextAnalysis.tokenCounts(docs)
        .select("doc_id", "n_ws_tokens"), "doc_id")
      .orderBy(col("quality").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getAs[Double]("quality"),
        r.getAs[Long]("n_ws_tokens")))
    var cum = 0L
    val expect = ranked.takeWhile { case (_, _, t) => cum += t; cum <= 10000L }
    assert(sel.toSet == expect.toSet,
      s"selected=${sel.length} expected=${expect.length}")
    // the prefix is strict: a too-big doc at the boundary ends it even
    // if a later doc would individually fit (no skip-and-continue)
    val kept = sel.map(_._1).toSet
    val afterCut = ranked.drop(expect.length).map(_._1)
    assert(afterCut.nonEmpty && afterCut.forall(id => !kept(id)))
    // everything-fits branch returns the whole corpus
    val all = graft.pipeline.Curation.budgetSelect(docs, Long.MaxValue / 4)
    assert(all.count() == docs.count())
  }
}
