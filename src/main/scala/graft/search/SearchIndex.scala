package graft.search

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-side handle on a persisted full-text index: the postings
  * relation `(doc_id, term, tf)`, the corpus size the TF·IDF needs,
  * the analyzer NAME the postings were tokenized with (a query
  * through a different analyzer must not consult them), and whether
  * `doc_id` IS the indexed text's term form (a value-centric literal
  * index — MATCH_EXACT can then recompute the text from the id
  * instead of joining a corpus). */
final case class SearchIndexView(postings: DataFrame, nDocs: Long,
                                 analyzer: String, termDocIds: Boolean,
                                 bucketRowBound: Option[Seq[Int] => Long] = None)

/** Durable, incrementally-maintained full-text index — the persisted
  * production shape of [[FullText.invertedIndex]], and the analog of
  * the reference's FullTextIndex (bigdata-core/bigdata-rdf/src/java/
  * com/bigdata/search/FullTextIndex.java: a statement-indexed B+Tree
  * the text indexer keeps in step with literal assert/retract). Here
  * the durable form is a lakehouse segment log beside the store:
  *
  * {{{
  *   <dir>/meta.json                 manifest (atomic rename publish)
  *   <dir>/seg-<k>-adds.parquet      postings of docs ADDED in batch k
  *   <dir>/seg-<k>-docs.parquet      distinct doc_ids ADDED in batch k
  *   <dir>/seg-<k>-gone.parquet      doc_ids REMOVED in batch k
  * }}}
  *
  * [[update]] appends one batch: only the ADDED docs tokenize (delta
  * cost, the incremental-maintenance contract), removed ids land as a
  * tombstone segment, and `meta.json` — the single commit point,
  * published by atomic rename — carries the batch list, corpus size
  * and the store version the index is current to. A reader either
  * sees the whole batch or none of it.
  *
  * The `docs` SIDECAR is the membership relation: nDocs rows of bare
  * doc ids (including docs the analyzer tokenized to NOTHING — a
  * punctuation-only literal is indexed-with-zero-postings, so it
  * neither re-tokenizes on every sync nor skews the IDF corpus size
  * against the corpus-path `docs.count()`). Incremental maintenance
  * answers "is this id already indexed?" from the sidecar scan —
  * NEVER from the postings relation, which is orders of magnitude
  * larger ([[graft.rdf.TextIndexMaintenance]] bloom-probes it
  * map-side, so membership costs O(delta), not O(index)).
  *
  * Single-writer per index directory, like the Journal: in-process
  * writes serialize on the handle's lock, and the server's namespace
  * write path is the one writer for a namespace-owned index. (The
  * manifest rename is atomic for READERS; it does not arbitrate two
  * independent writer processes — that race is the journal publish's
  * job, and the index always follows the journal.)
  *
  * [[view]] resolves the live postings: per-doc latest-action argmax
  * over the manifested segments (the [[graft.rdf.Journal.snapshot]]
  * discipline — a doc removed in batch 3 and re-added in batch 5 is
  * live with batch-5 postings). Steady state after [[compact]] is ONE
  * adds segment and the view is a plain parquet scan, zero shuffles.
  * At 100 TB the postings segments are term-bucketed parquet and a
  * query's postings lookup prunes to its terms' buckets.
  */
final class PersistedSearchIndex private (spark: SparkSession, dir: Path) {

  import PersistedSearchIndex._

  // written under the handle's lock (update/compact/vacuum) but read
  // lock-free by server read threads (version/nDocs/view) — volatile
  // gives the happens-before edge; Meta itself is immutable
  @volatile private[this] var meta: Meta = readMeta(dir)

  /** Store version this index is current to (what [[update]] was last
    * told; -1 until a caller supplies one). */
  def version: Long = meta.version

  def analyzerName: String = meta.analyzer

  /** Live doc count — maintained arithmetically per batch (O(delta)),
    * never recounted from the postings. */
  def nDocs: Long = meta.nDocs

  private def segPath(k: Long, sfx: String): Path =
    dir.resolve(s"seg-$k-$sfx.parquet")

  private def readSeg(k: Long, sfx: String): DataFrame =
    spark.read.parquet(segPath(k, sfx).toString)

  /** Adds segments are PARTITIONED BY the term's hash bucket `pb`
    * (crc32 % 64 — [[PersistedSearchIndex.termBucket]] computes the
    * same value driver-side), so an exact-term query's postings
    * lookup prunes to its terms' partition directories instead of
    * scanning the postings ([[FullText.searchIndex]] adds the prune;
    * prefix/regex queries span buckets and scan). */
  private def writeAdds(rows: DataFrame, k: Long): Unit =
    rows.withColumn("pb", PersistedSearchIndex.termBucketCol(col("term")))
      .write.mode("errorifexists").partitionBy("pb")
      .parquet(segPath(k, "adds").toString)

  /** A batch's added-doc-id relation tagged with its resolution rank:
    * the docs sidecar where the batch wrote one, else (legacy,
    * pre-sidecar batches) the distinct doc ids of its postings. */
  private def addActs(b: Batch): Option[DataFrame] =
    if (b.docs) Some(readSeg(b.k, "docs").select("doc_id")
      .withColumn("seq", lit(2 * b.k + 1)))
    else if (b.adds) Some(readSeg(b.k, "adds").select("doc_id").distinct()
      .withColumn("seq", lit(2 * b.k + 1)))
    else None

  /** The LIVE indexed doc-id set — the membership relation incremental
    * maintenance probes (nDocs rows; the postings relation is never
    * consulted on sidecar-bearing indexes). Append-only history (no
    * tombstones) is a plain union of sidecar scans, zero shuffles; with
    * tombstones it is the same latest-action argmax [[view]] uses, over
    * doc-id-sized inputs. A doc-id equality filter pushed onto this
    * relation reaches the sidecar scans below the aggregation. */
  def liveDocIds: DataFrame = {
    val m = meta
    val adds = m.batches.flatMap(addActs)
    if (adds.isEmpty) emptyPostings(spark).select("doc_id")
    else if (!m.batches.exists(_.gone)) // append-only: all added ids live
      adds.map(_.select("doc_id")).reduce(_ unionAll _)
    else {
      val acts = adds ++ m.batches.filter(_.gone).map(b =>
        readSeg(b.k, "gone").select("doc_id").withColumn("seq", lit(2 * b.k)))
      acts.reduce(_ unionAll _)
        .groupBy("doc_id").agg(max(col("seq")).as("seq"))
        .filter(col("seq") % 2 === 1)
        .select("doc_id")
    }
  }

  /** Live postings + corpus stats for the query paths. */
  def view: SearchIndexView = {
    val m = meta
    val addSegs = m.batches.filter(_.adds)
    val goneSegs = m.batches.filter(_.gone)
    val postings =
      if (goneSegs.isEmpty && addSegs.size <= 1) {
        // steady state (fresh build or post-compact): plain scan
        addSegs.headOption.map(b => readSeg(b.k, "adds").select("doc_id", "term", "tf", "dw", "pb"))
          .getOrElse(emptyPostings(spark))
      } else {
        // latest-action resolution, the journal-snapshot discipline:
        // gone at k ranks 2k, adds at k rank 2k+1 (an id never appears
        // in both sides of ONE batch — update() enforces it)
        val acts = m.batches.flatMap(addActs) ++
          goneSegs.map(b => readSeg(b.k, "gone").select("doc_id")
            .withColumn("seq", lit(2 * b.k)))
        val live = acts.reduce(_ unionAll _)
          .groupBy("doc_id").agg(max(col("seq")).as("seq"))
          .filter(col("seq") % 2 === 1)
        addSegs.map(b => readSeg(b.k, "adds").select("doc_id", "term", "tf", "dw", "pb")
            .withColumn("seq", lit(2 * b.k + 1)))
          .reduce(_ unionAll _)
          .join(live, Seq("doc_id", "seq"))
          .select("doc_id", "term", "tf", "dw", "pb")
      }
    // stats hook: an UPPER BOUND on the postings volume of a bucket
    // set, read from parquet FOOTERS only (no Spark job) — sums each
    // queried pb directory across adds segments. Loose by design (a
    // bucket pools 1/64 of the vocabulary; superseded batches still
    // count) but safe: consumers route on it, never answer from it.
    val segDirs = addSegs.map(b => segPath(b.k, "adds"))
    val bound: Seq[Int] => Long = buckets =>
      segDirs.map { d =>
        buckets.distinct.map { b =>
          val p = d.resolve(s"pb=$b")
          if (Files.exists(p)) graft.rdf.Journal.parquetRowCount(p) else 0L
        }.sum
      }.sum
    SearchIndexView(postings, m.nDocs, m.analyzer, m.termDocIds, Some(bound))
  }

  /** Append one maintenance batch and advance to `toVersion`:
    * `addedCorpus` (doc_id, text) are docs NOT currently indexed
    * (caller guarantees — [[graft.rdf.TextIndexMaintenance]] derives
    * both sides so they are disjoint from the live set and from each
    * other), `removedDocIds` (doc_id) are currently-indexed docs to
    * drop. Only the added docs tokenize; either side may be empty.
    * Returns (added, removed) doc counts — what the meta arithmetic
    * used. */
  def update(addedCorpus: DataFrame, removedDocIds: DataFrame,
             toVersion: Long): (Long, Long) = synchronized {
    val k = meta.batches.map(_.k).foldLeft(-1L)(math.max) + 1
    val az = Analyzer.byName(meta.analyzer)
    // materialize the input corpus ONCE: the id sidecar and the
    // tokenize pass both consume it, and the corpus is often an
    // expensive derivation (the literal index's corpus is a distinct
    // over the store's object column) that would otherwise evaluate
    // twice per batch
    val corpus = addedCorpus.select("doc_id", "text").localCheckpoint()
    // the INPUT corpus counts toward nDocs even when a doc tokenizes
    // to nothing (zero-token docs are indexed-with-zero-postings), so
    // the IDF's N is the same corpus size the corpus paths use
    // (FullText.matchPostings counts docs, not posting-bearing docs)
    val addedIds = corpus.select("doc_id").distinct().localCheckpoint()
    val removed = removedDocIds.select("doc_id").distinct().localCheckpoint()
    val nAdd = addedIds.count()
    val nGone = removed.count()
    // the latest-action view resolution assumes an id never appears in
    // both sides of ONE batch — enforce it loud (both sides are
    // delta-sized and already materialized; the probe never runs on
    // the one-sided common paths)
    require(nAdd == 0 || nGone == 0 ||
      addedIds.join(removed, Seq("doc_id"), "left_semi").isEmpty,
      "search-index update: a doc_id appears in BOTH addedCorpus and " +
        "removedDocIds of one batch — split the remove and the re-add " +
        "into two update() calls")
    val wroteDocs = nAdd > 0
    val wroteAdds = wroteDocs && {
      val adds = FullText.invertedIndex(corpus, az)
        .select("doc_id", "term", "tf", "dw")
        .localCheckpoint() // one tokenize pass; probed AND written below
      val any = !adds.isEmpty
      if (any) writeAdds(adds, k)
      any
    }
    val wroteGone = nGone > 0
    if (wroteDocs)
      addedIds.write.mode("errorifexists").parquet(segPath(k, "docs").toString)
    if (wroteGone)
      removed.write.mode("errorifexists").parquet(segPath(k, "gone").toString)
    val batches =
      if (wroteAdds || wroteGone || wroteDocs)
        meta.batches :+ Batch(k, wroteAdds, wroteGone, wroteDocs)
      else meta.batches
    meta = meta.copy(version = toVersion, nDocs = meta.nDocs + nAdd - nGone,
      batches = batches)
    writeMeta(dir, meta)
    (nAdd, nGone)
  }

  /** Rewrite the live postings (and the live doc-id sidecar) as ONE
    * segment — subsequent [[view]]s are a plain parquet scan with no
    * resolution shuffle. Superseded segment files STAY on disk: an
    * in-flight query holding a view resolved against the old manifest
    * keeps reading them (the server compacts on its write path while
    * reads run concurrently). [[vacuum]] reclaims them explicitly —
    * the Journal's compact/vacuum split, mirrored. */
  def compact(): Unit = synchronized {
    val k = meta.batches.map(_.k).foldLeft(-1L)(math.max) + 1
    val live = view.postings.select("doc_id", "term", "tf", "dw").localCheckpoint()
    val ids = liveDocIds.localCheckpoint()
    val anyPostings = !live.isEmpty
    val anyDocs = !ids.isEmpty
    if (anyPostings) writeAdds(live, k)
    if (anyDocs)
      ids.write.mode("errorifexists").parquet(segPath(k, "docs").toString)
    // an EMPTY live state still keeps the segment-k WATERMARK: a
    // flagless marker batch (view reads per-flag, so it contributes
    // nothing; vacuum references nothing from it). Dropping to Nil
    // would reset k to 0 while superseded seg-0-* files remain on
    // disk, wedging the next update()'s errorifexists write.
    meta = meta.copy(batches =
      if (anyPostings || anyDocs)
        Seq(Batch(k, adds = anyPostings, gone = false, docs = anyDocs))
      else Seq(Batch(k, adds = false, gone = false, docs = false)))
    writeMeta(dir, meta)
  }

  /** Delete segment files the current manifest no longer references —
    * the space-for-read-stability trade, taken EXPLICITLY (any view
    * resolved before the manifest that orphaned a segment breaks when
    * that segment is vacuumed mid-job — callers own that quiesce, the
    * Journal.vacuum contract). */
  def vacuum(): Unit = synchronized {
    val referenced = meta.batches.flatMap { b =>
      Seq(b.adds -> "adds", b.gone -> "gone", b.docs -> "docs")
        .collect { case (true, sfx) => segPath(b.k, sfx).getFileName.toString }
    }.toSet
    val ls = Files.list(dir)
    val all = try ls.toArray.toSeq.asInstanceOf[Seq[Path]] finally ls.close()
    all.filter { p =>
      val n = p.getFileName.toString
      n.startsWith("seg-") && n.endsWith(".parquet") && !referenced.contains(n)
    }.foreach(deleteRecursively)
  }
}

object PersistedSearchIndex {

  /** Term-hash partition-bucket count of the adds segments. */
  val Buckets = 64

  /** Driver-side bucket of a term — MUST match [[termBucketCol]]
    * (CRC32 over UTF-8 bytes, Spark's crc32 function exactly), so an
    * exact-term query can name its partition directories without a
    * Spark job. */
  def termBucket(term: String): Int = {
    val c = new java.util.zip.CRC32()
    c.update(term.getBytes(StandardCharsets.UTF_8))
    (c.getValue % Buckets).toInt
  }

  /** Spark-side twin of [[termBucket]]. */
  def termBucketCol(term: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(crc32(encode(term, "UTF-8")), lit(Buckets.toLong)).cast("int")

  private val mapper = new ObjectMapper()

  /** `docs`: whether the batch wrote a doc-id sidecar (false on
    * legacy, pre-sidecar batches — membership then falls back to the
    * batch's postings doc ids). */
  private final case class Batch(k: Long, adds: Boolean, gone: Boolean,
                                 docs: Boolean = false)

  private final case class Meta(version: Long, analyzer: String,
                                termDocIds: Boolean, nDocs: Long,
                                batches: Seq[Batch])

  private def emptyPostings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long, Double, Int)].toDF("doc_id", "term", "tf", "dw", "pb")
  }

  def exists(dir: String): Boolean =
    Files.exists(Paths.get(dir).resolve("meta.json"))

  /** Build a new index at `dir` over `corpus` (doc_id, text) — ONE
    * tokenize pass, written as the first segment. `termDocIds` marks
    * a value-centric literal index (doc_id IS the term). */
  def create(spark: SparkSession, dir: String, corpus: DataFrame,
             analyzer: String = "latin", termDocIds: Boolean = true,
             version: Long = -1L): PersistedSearchIndex = {
    val root = Paths.get(dir)
    require(!exists(dir), s"search index already exists at $dir")
    Files.createDirectories(root)
    // seed an empty manifest, then land the corpus as batch 0 through
    // the one maintenance path (same code, same invariants)
    writeMeta(root, Meta(-1L, analyzer, termDocIds, 0L, Nil))
    val seeded = new PersistedSearchIndex(spark, root)
    seeded.update(corpus, emptyPostings(spark).select("doc_id"), version)
    seeded
  }

  /** Reattach to an existing index. */
  def open(spark: SparkSession, dir: String): PersistedSearchIndex = {
    require(exists(dir), s"no search index at $dir")
    new PersistedSearchIndex(spark, Paths.get(dir))
  }

  private def metaJson(m: Meta): String = {
    val bs = m.batches.map(b =>
      s"""{"k":${b.k},"adds":${b.adds},"gone":${b.gone},"docs":${b.docs}}""")
      .mkString("[", ",", "]")
    s"""{"version":${m.version},"analyzer":${mapper.writeValueAsString(m.analyzer)},""" +
      s""""termDocIds":${m.termDocIds},"nDocs":${m.nDocs},"batches":$bs}"""
  }

  private def writeMeta(dir: Path, m: Meta): Unit = {
    val tmp = Files.createTempFile(dir, ".meta", ".tmp")
    Files.write(tmp, metaJson(m).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("meta.json"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def readMeta(dir: Path): Meta = {
    val root = mapper.readTree(Files.readAllBytes(dir.resolve("meta.json")))
    val it = root.path("batches").elements()
    val bs = Seq.newBuilder[Batch]
    while (it.hasNext) {
      val b = it.next()
      bs += Batch(b.get("k").asLong(), b.get("adds").asBoolean(),
        b.get("gone").asBoolean(),
        Option(b.get("docs")).exists(_.asBoolean())) // legacy: no sidecar
    }
    Meta(root.get("version").asLong(), root.get("analyzer").asText(),
      root.get("termDocIds").asBoolean(), root.get("nDocs").asLong(),
      bs.result())
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(c => deleteRecursively(c)) finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
