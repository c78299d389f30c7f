package graft.sparql

import org.apache.spark.sql.DataFrame

/** What the algebra compiler needs from a triple store.
  *
  * `fuseStar` is the property-table fast path: given BGP patterns that
  * all share one subject term and have bound predicates, a source that
  * knows its backing layout may compile them to a single scan (columns
  * = the patterns' object variables) instead of one branch scan per
  * pattern joined on the subject. Returning None falls back to the
  * generic per-pattern plan. At 100 TB this is the difference between
  * 1 scan and k scans + k-1 shuffles for every star query.
  */
trait TripleSource {
  def triples: DataFrame

  def fuseStar(patterns: Seq[TriplePattern],
               subjectTables: Option[Set[String]] = None): Option[DataFrame]

  /** Range typing: the backing table whose subjects the values of a
    * reference predicate point at (e.g. `nation` → the nation table).
    * Lets the compiler prune a variable's star to one table when that
    * variable appears as the object of a reference predicate elsewhere
    * in the BGP (the analog of Blazegraph's range-restricted access
    * path selection). */
  def refTarget(pred: String): Option[String] = None

  /** Access-path selection for one triple pattern: return all (s,p,o)
    * rows matching the pattern's constant positions, using the cheapest
    * physical shape the source knows (the analog of Blazegraph picking
    * the SPO vs POS vs OSP statement index per pattern). The default
    * just filters the generic view. */
  def scan(tp: TriplePattern): DataFrame = TripleSource.filterScan(triples, tp)

  /** Named-graph (quads) view (s, p, o, g), if this source has one. */
  def quads: Option[DataFrame] = None

  /** Corpus (doc_id, text) for the bds:search-style full-text service,
    * if this source has one. */
  def searchCorpus: Option[DataFrame] = None

  /** Default analyzer NAME for bds:search when the query carries no
    * bds:analyzer — the per-namespace analyzer configuration the
    * reference stores in namespace properties
    * (ConfigurableAnalyzerFactory). */
  def defaultAnalyzer: Option[String] = None

  /** PERSISTED postings over [[searchCorpus]], if this source keeps
    * one — the production shape of the reference's FullTextIndex (a
    * durable index maintained in step with the store, not rebuilt per
    * query). When present and analyzer-compatible, bds:search plans
    * an index lookup instead of a corpus tokenize. */
  def searchIndex: Option[graft.search.SearchIndexView] = None

  /** Persisted postings over the store's LITERAL space (doc_id = the
    * literal term) — what bds:searchInSearch consults when present.
    * For a real quad store this and [[searchIndex]] are the same
    * index; they are separate slots because a source may search an
    * external document corpus (searchCorpus) while its literal space
    * is a different relation. */
  def literalIndex: Option[graft.search.SearchIndexView] = None

  /** Point set (k, lat, lon) for the geo:search service, if this
    * source has one. */
  def geoCorpus: Option[DataFrame] = None

  /** Spatiotemporal point set (k, lat, lon, t) with its declared time
    * domain (tMin, tMax) — the reference's DEFAULT lat-lon-time
    * geospatial datatype (GeoSpatial.java), queried when geo:search
    * carries geo:timeStart/geo:timeEnd. */
  def geoCorpusTime: Option[(DataFrame, Long, Long)] = None

  /** All triples whose subject is in `nodes` (one column `s`) — the
    * DESCRIBE-set access path. Default: join the full view. Sources
    * that can map subjects to storage units (prefix → table) may
    * restrict the scan set first. */
  def scanForSubjects(nodes: DataFrame): DataFrame = {
    triples.join(nodes.select("s").distinct(), "s")
  }

  /** All triples whose OBJECT is in `objs` (one column `o`, may carry
    * a broadcast hint) — the OSP-index analog the full-text services'
    * hit→subject join runs on. Default: join the full view (one store
    * pass). A source with an object-keyed layout
    * ([[graft.rdf.TripleStorage.ospHashSource]]) prunes the scan to
    * the hit set's partition buckets first — the production shape
    * that removes the full-view pass entirely. */
  def scanForObjects(objs: DataFrame): DataFrame =
    triples.join(objs.select("o"), "o")

  /** True when [[scanForObjects]] is served by an object-KEYED layout
    * (bucket-pruned scan, not a full-view pass) — a ROUTING input: on
    * a virtual view the searchInSearch prefilter's one pass stays
    * cheaper than index-hits + a full-view O→S join (measured, r13
    * evidence), so the stats router only prefers the index where this
    * is true. */
  def objectKeyedScan: Boolean = false

  /** Access path for a graph-scoped pattern: (s,p,o,g) rows matching
    * the constant positions, `g` constant included (SPOC index analog). */
  def quadScan(tp: TriplePattern, g: Term): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val q = quads.getOrElse(sys.error("this triple source has no named graphs"))
    Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o, "g" -> g).foldLeft(q) {
      case (df, (c, Const(v))) => df.filter(col(c) === lit(v))
      case (df, _)             => df
    }
  }
}

object TripleSource {
  /** Constant-position filter over an opaque (s,p,o) relation. */
  def filterScan(df: DataFrame, tp: TriplePattern): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    Seq("s" -> tp.s, "p" -> tp.p, "o" -> tp.o).foldLeft(df) {
      case (d, (c, Const(v))) => d.filter(col(c) === lit(v))
      case (d, _)             => d
    }
  }

  /** Plain source over an opaque (s,p,o) DataFrame — no fusion. */
  def plain(df: DataFrame): TripleSource = new TripleSource {
    val triples: DataFrame = df
    def fuseStar(patterns: Seq[TriplePattern],
                 subjectTables: Option[Set[String]]): Option[DataFrame] = None
  }

  /** `base` with persisted full-text postings attached ([[TripleSource
    * .searchIndex]] / [[TripleSource.literalIndex]]); every other
    * member forwards. NOTE the overlay/scoped sources deliberately do
    * NOT forward index slots — an index is complete only for the
    * exact store it was built over. */
  def withIndexes(base: TripleSource,
                  search: Option[graft.search.SearchIndexView] = None,
                  literal: Option[graft.search.SearchIndexView] = None): TripleSource =
    new TripleSource {
      def triples: DataFrame = base.triples
      def fuseStar(patterns: Seq[TriplePattern],
                   subjectTables: Option[Set[String]]): Option[DataFrame] =
        base.fuseStar(patterns, subjectTables)
      override def refTarget(pred: String): Option[String] = base.refTarget(pred)
      override def scan(tp: TriplePattern): DataFrame = base.scan(tp)
      override def quads: Option[DataFrame] = base.quads
      override def quadScan(tp: TriplePattern, g: Term): DataFrame = base.quadScan(tp, g)
      override def searchCorpus: Option[DataFrame] = base.searchCorpus
      override def defaultAnalyzer: Option[String] = base.defaultAnalyzer
      override def geoCorpus: Option[DataFrame] = base.geoCorpus
      override def geoCorpusTime: Option[(DataFrame, Long, Long)] = base.geoCorpusTime
      override def scanForSubjects(nodes: DataFrame): DataFrame = base.scanForSubjects(nodes)
      override def scanForObjects(objs: DataFrame): DataFrame = base.scanForObjects(objs)
      override def objectKeyedScan: Boolean = base.objectKeyedScan
      override def searchIndex: Option[graft.search.SearchIndexView] =
        search.orElse(base.searchIndex)
      override def literalIndex: Option[graft.search.SearchIndexView] =
        literal.orElse(base.literalIndex)
    }

  /** Base store plus a (small) extra triple relation — the
    * focus-store shape (reference: TruthMaintenance's TempTripleStore
    * focus store layered over the main statement indices). Pattern
    * scans reach the base through ITS access paths (branch pruning,
    * prefix-resolved subjects) and the overlay through a plain filter
    * — without this, a store-union forces every pattern back to a
    * full-view scan. */
  def overlay(base: TripleSource, extra: DataFrame): TripleSource = new TripleSource {
    lazy val triples: DataFrame = base.triples.unionAll(extra)
    def fuseStar(patterns: Seq[TriplePattern],
                 subjectTables: Option[Set[String]]): Option[DataFrame] = None
    override def refTarget(pred: String): Option[String] = base.refTarget(pred)
    override def scan(tp: TriplePattern): DataFrame =
      base.scan(tp).unionAll(filterScan(extra, tp))
    override def scanForSubjects(nodes: DataFrame): DataFrame = {
      val ns = nodes.select("s").distinct()
      base.scanForSubjects(ns).unionAll(extra.join(ns, "s"))
    }
    override def scanForObjects(objs: DataFrame): DataFrame =
      base.scanForObjects(objs).unionAll(extra.join(objs.select("o"), "o"))
    override def searchCorpus: Option[DataFrame] = base.searchCorpus
    override def defaultAnalyzer: Option[String] = base.defaultAnalyzer
    override def geoCorpus: Option[DataFrame] = base.geoCorpus
    override def geoCorpusTime: Option[(DataFrame, Long, Long)] = base.geoCorpusTime
  }
}
