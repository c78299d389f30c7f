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
}
