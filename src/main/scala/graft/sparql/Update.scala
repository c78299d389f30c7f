package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rdf.TripleStore

/** Executes parsed SPARQL UPDATE operations against a [[TripleStore]]
  * (reference: ast/eval/AST2BOpUpdate.java driving the B+Tree
  * mutations; here each op yields a new functional store). */
object Update {

  private def t2c(t: Term, n: String): Column = t match {
    case Var(v)   => col(v).cast("string").as(n)
    case Const(v) => lit(v).as(n)
  }

  /** Triple source for a bare (no WITH/USING) update WHERE against a
    * quad store: default-graph patterns see the union default graph
    * (the façade's quads-mode query convention) and GRAPH patterns
    * range over the store's named graphs — so cross-graph rewrites
    * like `INSERT { GRAPH ?g { … } } WHERE { GRAPH ?g { … } }` bind
    * their graph variable from the data (§3.1.3 over the Graph
    * Store). */
  private def bareQuadsSource(store: graft.rdf.QuadStore): TripleSource =
    new TripleSource {
      lazy val triples: DataFrame = store.quads.select("s", "p", "o").distinct()
      override def quads: Option[DataFrame] = Some(store.quads)
      def fuseStar(patterns: Seq[TriplePattern],
                   subjectTables: Option[Set[String]]): Option[DataFrame] = None
    }

  /** Triple source for a USING-clause WHERE: the compiler's
    * DatasetClause handles graph selection over `quads`; bare
    * default-graph reads (no dataset restriction in play) see the
    * store's default graph. */
  private def usingSource(store: graft.rdf.QuadStore,
                          defaultGraph: String): TripleSource =
    new TripleSource {
      lazy val triples: DataFrame = store.graph(defaultGraph)
      override def quads: Option[DataFrame] = Some(store.quads)
      def fuseStar(patterns: Seq[TriplePattern],
                   subjectTables: Option[Set[String]]): Option[DataFrame] = None
    }

  /** Materialize a WHERE solution that feeds more than one consumer
    * (k template triples and/or both the delete and insert sides).
    * Without this every consumer re-derives the whole WHERE plan —
    * pattern scans, join, and the union-default-graph distinct over
    * the store (measured: update_quad_template's final plan carried
    * 86 source scans with ZERO exchange reuse; ~3 solution
    * re-derivations collapse to one). localCheckpoint rather than
    * persist: it truncates the lineage, so the downstream
    * delete/insert anti-joins optimize over a leaf the size of the
    * SOLUTION (delta-sized — the data a commit ships anyway), not the
    * store-derivation subtree. Single-consumer solutions skip the
    * materialization pass (§4 learning: persist multi-consumer
    * projections ONCE, and only those). */
  private def shared(sol: DataFrame, consumers: Int): DataFrame =
    if (consumers > 1) sol.localCheckpoint() else sol

  /** Instantiate a QUAD template against a solution DataFrame: each
    * triple lands in its own graph — None = `defaultGraph`, a Const =
    * that graph, a Var = the per-row binding (GRAPH ?g templates). */
  private def instantiateQuads(tmpl: Seq[(Option[Term], TriplePattern)],
                               sol: DataFrame,
                               defaultGraph: String): DataFrame =
    tmpl.map { case (g, tp) =>
      val gc = g.map(t2c(_, "g")).getOrElse(lit(defaultGraph).as("g"))
      sol.select(t2c(tp.s, "s"), t2c(tp.p, "p"), t2c(tp.o, "o"), gc)
    }.reduce(_ unionAll _).distinct()

  /** Instantiate a template against a solution DataFrame. */
  private def instantiate(tmpl: Seq[TriplePattern], sol: DataFrame): DataFrame =
    tmpl.map { tp =>
      sol.select(t2c(tp.s, "s"), t2c(tp.p, "p"), t2c(tp.o, "o"))
    }.reduce(_ unionAll _).distinct()

  private def ground(ts: Seq[TriplePattern],
                     spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    ts.map {
      case TriplePattern(Const(s), Const(p), Const(o)) => (s, p, o)
      case other => sys.error(s"INSERT/DELETE DATA needs ground triples, got $other")
    }.toDF("s", "p", "o")
  }

  /** Apply `op` to a triples-mode `store` (GRAPH tags on ground data
    * are ignored — a triple store has one graph); WHERE clauses
    * evaluate against the store's own (pre-update) triples. */
  def apply(store: TripleStore, op: UpdateOp): TripleStore = op match {
    case InsertData(d) => store.insertData(ground(d.map(_._2), store.triples.sparkSession))
    case DeleteData(d) => store.deleteData(ground(d.map(_._2), store.triples.sparkSession))
    case DeleteInsertWhere(del, ins, where) =>
      val sol = shared(Compiler.compile(where, TripleSource.plain(store.triples)),
        del.size + ins.size)
      val deletes =
        if (del.isEmpty) store.triples.limit(0) else instantiate(del, sol)
      val inserts =
        if (ins.isEmpty) store.triples.limit(0) else instantiate(ins, sol)
      store.deleteInsert(deletes, inserts)
    case other =>
      sys.error(s"triples-mode update supports ground data and DELETE/INSERT WHERE, got $other")
  }

  /** Apply ground-data ops to a quads-mode store: each GRAPH block
    * lands in its named graph, bare triples in `defaultGraph`. */
  def applyQuads(store: graft.rdf.QuadStore, op: UpdateOp,
                 defaultGraph: String = "g:default"): graft.rdf.QuadStore = {
    val spark = store.quads.sparkSession
    def byGraph(d: Seq[(Option[String], TriplePattern)]) =
      d.groupBy(_._1.getOrElse(defaultGraph)).view.mapValues(v => ground(v.map(_._2), spark))
    op match {
      case InsertData(d) =>
        byGraph(d).foldLeft(store) { case (st, (g, df)) => st.insertData(g, df) }
      case DeleteData(d) =>
        byGraph(d).foldLeft(store) { case (st, (g, df)) => st.deleteData(g, df) }
      case WithGraph(g, DeleteInsertWhere(del, ins, where)) =>
        // WHERE and templates evaluate against graph g only (§3.1.3)
        val sol = shared(Compiler.compile(where, TripleSource.plain(store.graph(g))),
          del.size + ins.size)
        val st1 =
          if (del.isEmpty) store else store.deleteData(g, instantiate(del, sol))
        if (ins.isEmpty) st1 else st1.insertData(g, instantiate(ins, sol))
      case DeleteInsertWhere(del, ins, where) =>
        // bare (no WITH/USING) DELETE/INSERT WHERE in quads mode: the
        // WHERE sees the union default graph (the façade's quads-mode
        // query convention), templates act on `defaultGraph` (§3.1.3:
        // template triples without GRAPH address the default graph)
        val sol = shared(Compiler.compile(where, bareQuadsSource(store)),
          del.size + ins.size)
        val st1 =
          if (del.isEmpty) store
          else store.deleteData(defaultGraph, instantiate(del, sol))
        if (ins.isEmpty) st1
        else st1.insertData(defaultGraph, instantiate(ins, sol))
      case QuadsTemplateWhere(del, ins, where) =>
        // quad templates: WHERE evaluates like the bare form above,
        // with GRAPH patterns ranging over the store's named graphs;
        // each template triple lands in its own graph
        val sol = shared(Compiler.compile(where, bareQuadsSource(store)),
          del.size + ins.size)
        val st1 =
          if (del.isEmpty) store
          else store.deleteQuads(instantiateQuads(del, sol, defaultGraph))
        if (ins.isEmpty) st1
        else st1.insertQuads(instantiateQuads(ins, sol, defaultGraph))
      case UsingClause(defaults, named, inner) =>
        // the WHERE sees the USING dataset (update-side FROM/FROM
        // NAMED): default-graph patterns scan the USING graphs' merge,
        // GRAPH patterns range over USING NAMED. Plain templates act
        // on the default graph (§3.1.3 USING); quad templates address
        // their own graphs (GRAPH vars bind from the USING NAMED set).
        val src = usingSource(store, defaultGraph)
        inner match {
          case DeleteInsertWhere(del, ins, where) =>
            val sol = shared(Compiler.compile(DatasetClause(defaults, named, where), src),
              del.size + ins.size)
            val st1 =
              if (del.isEmpty) store
              else store.deleteData(defaultGraph, instantiate(del, sol))
            if (ins.isEmpty) st1
            else st1.insertData(defaultGraph, instantiate(ins, sol))
          case QuadsTemplateWhere(del, ins, where) =>
            val sol = shared(Compiler.compile(DatasetClause(defaults, named, where), src),
              del.size + ins.size)
            val st1 =
              if (del.isEmpty) store
              else store.deleteQuads(instantiateQuads(del, sol, defaultGraph))
            if (ins.isEmpty) st1
            else st1.insertQuads(instantiateQuads(ins, sol, defaultGraph))
        }
      // -- text-form graph management (ast/CreateGraph.java family) --
      case CreateGraph(g, _)   => store.createGraph(g)
      case DropGraph(g, _)     => store.dropGraph(g.getOrElse(defaultGraph))
      case ClearGraph(g, _)    => store.dropGraph(g.getOrElse(defaultGraph))
      case ClearAll            => store.clear()
      // DROP GRAPHS (GraphRefAll's GRAPHS arm): every NAMED graph
      // goes, the default graph stays
      case DropGraphs(_) =>
        graft.rdf.QuadStore(
          store.quads.filter(org.apache.spark.sql.functions.col("g") === defaultGraph))
      case _: SolutionsOp =>
        // named solution sets are CONNECTION-scoped (they live on the
        // Graft handle — graft.Graft.applyOne; the reference's default
        // ISolutionSetManager is the SPARQL cache, not the journal).
        // Reaching the bare store path means the caller has no handle
        // to hold them — refuse rather than silently drop.
        sys.error("named solution sets are connection-scoped: apply " +
          "SOLUTIONS updates through a Graft handle (graft.Graft.update), " +
          "not the bare quad-store path")
      case CopyGraph(f, t, _)  =>
        store.copyGraph(f.getOrElse(defaultGraph), t.getOrElse(defaultGraph))
      case MoveGraph(f, t, _)  =>
        store.moveGraph(f.getOrElse(defaultGraph), t.getOrElse(defaultGraph))
      case AddGraph(f, t, _)   =>
        store.addGraph(f.getOrElse(defaultGraph), t.getOrElse(defaultGraph))
      case Load(src, g, silent) =>
        try {
          // SILENT must absorb PARSE failures too (§3.1.4 success/no-op)
          // — the document parsers run lazily inside read tasks, so a
          // silent LOAD materializes the parsed data eagerly (inside
          // this try) before it reaches the store
          val q = loadOpQuads(spark, src, g, defaultGraph)
          store.insertQuads(if (silent) q.localCheckpoint() else q)
        } catch { case e: Exception if silent => store }
      case other => sys.error(s"quads-mode update supports ground data, WITH-scoped ops and graph management, got $other")
    }
  }

  /** Apply a ';'-separated op sequence in request order. */
  def applyQuadsSeq(store: graft.rdf.QuadStore, ops: Seq[UpdateOp],
                    defaultGraph: String = "g:default"): graft.rdf.QuadStore =
    ops.foldLeft(store)(applyQuads(_, _, defaultGraph))

  /** The (g-tagged) quads a LOAD op contributes — shared by the store
    * apply and the delta path. N-Quads/TriG statements carry their own
    * graph tags (INTO GRAPH overrides); JSON-LD named-graph documents
    * keep their labels unless INTO GRAPH flattens; every triples-mode
    * document lands whole in the target graph. */
  private[graft] def loadOpQuads(spark: org.apache.spark.sql.SparkSession, src: String,
                                 g: Option[String], defaultGraph: String): DataFrame = {
    val path = src.stripPrefix("file://")
    val fmt = fmtPath(src)
    import spark.implicits._
    if (fmt.endsWith(".nq")) {
      val q = loadQuads(spark, src)
      g.fold(q)(gg => q.withColumn("g", lit(gg)))
    } else if (fmt.endsWith(".trig")) {
      val q = spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.Turtle.parseTrig(_, defaultGraph))
        .toDF("s", "p", "o", "g")
      g.fold(q)(gg => q.withColumn("g", lit(gg)))
    } else if (fmt.endsWith(".trix")) {
      // TriX (Rio RDFFormat.TRIX) — XML quads, whole-file per task
      val q = spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.TriX.parseQuads(_, defaultGraph))
        .toDF("s", "p", "o", "g")
      g.fold(q)(gg => q.withColumn("g", lit(gg)))
    } else if (fmt.endsWith(".jsonld") && g.isEmpty) {
      spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.JsonLd.parseQuads(_, defaultGraph))
        .toDF("s", "p", "o", "g")
    } else loadTriples(spark, src)
      .select("s", "p", "o").withColumn("g", lit(g.getOrElse(defaultGraph)))
  }

  /** The journal-shaped mutation delta of one op against `store`:
    * `(adds, dels)` quad DataFrames sized by the CHANGE, never the
    * store — the write path [[graft.rdf.Repository.update]] commits
    * (the reference stages exactly these sets in its
    * TruthMaintenance/commitNow buffers; a lakehouse MERGE ships the
    * matched/not-matched sets the same way). Ground-data ops emit
    * their own rows verbatim: journal resolution is idempotent for
    * re-inserted quads and tombstones of absent quads, so NO
    * existence anti-join against the store is needed — a small
    * INSERT/DELETE DATA commit plans zero store scans (plan-asserted
    * in RepositorySpec). Graph-management deltas are graph-sized (that
    * IS the change). WHERE-driven ops evaluate against the pre-update
    * store, like [[applyQuads]]. */
  def quadsDelta(store: graft.rdf.QuadStore, op: UpdateOp,
                 defaultGraph: String = "g:default"): (DataFrame, DataFrame) = {
    val spark = store.quads.sparkSession
    val nothing = graft.rdf.QuadStore(store.quads.limit(0)).quads
    def tag(g: String, df: DataFrame): DataFrame =
      df.select("s", "p", "o").withColumn("g", lit(g))
    def byGraph(d: Seq[(Option[String], TriplePattern)]): DataFrame =
      d.groupBy(_._1.getOrElse(defaultGraph)).view
        .mapValues(v => ground(v.map(_._2), spark)).toSeq
        .map { case (g, df) => tag(g, df) }
        .reduceOption(_ unionAll _).getOrElse(nothing)
    def tagged(g: String, tmpl: Seq[TriplePattern], sol: DataFrame): DataFrame =
      if (tmpl.isEmpty) nothing else tag(g, instantiate(tmpl, sol))
    op match {
      case InsertData(d) => (byGraph(d), nothing)
      case DeleteData(d) => (nothing, byGraph(d))
      case WithGraph(g, DeleteInsertWhere(del, ins, where)) =>
        val sol = shared(Compiler.compile(where, TripleSource.plain(store.graph(g))),
          del.size + ins.size)
        (tagged(g, ins, sol), tagged(g, del, sol))
      case DeleteInsertWhere(del, ins, where) =>
        val sol = shared(Compiler.compile(where, bareQuadsSource(store)),
          del.size + ins.size)
        (tagged(defaultGraph, ins, sol), tagged(defaultGraph, del, sol))
      case QuadsTemplateWhere(del, ins, where) =>
        val sol = shared(Compiler.compile(where, bareQuadsSource(store)),
          del.size + ins.size)
        def inst(t: Seq[(Option[Term], TriplePattern)]): DataFrame =
          if (t.isEmpty) nothing else instantiateQuads(t, sol, defaultGraph)
        (inst(ins), inst(del))
      case UsingClause(defaults, named, inner) =>
        val src = usingSource(store, defaultGraph)
        inner match {
          case DeleteInsertWhere(del, ins, where) =>
            val sol = shared(Compiler.compile(DatasetClause(defaults, named, where), src),
              del.size + ins.size)
            (tagged(defaultGraph, ins, sol), tagged(defaultGraph, del, sol))
          case QuadsTemplateWhere(del, ins, where) =>
            val sol = shared(Compiler.compile(DatasetClause(defaults, named, where), src),
              del.size + ins.size)
            def inst(t: Seq[(Option[Term], TriplePattern)]): DataFrame =
              if (t.isEmpty) nothing else instantiateQuads(t, sol, defaultGraph)
            (inst(ins), inst(del))
        }
      case CreateGraph(_, _) => (nothing, nothing)
      case DropGraph(g, _)   =>
        (nothing, tag(g.getOrElse(defaultGraph), store.graph(g.getOrElse(defaultGraph))))
      case ClearGraph(g, _)  =>
        (nothing, tag(g.getOrElse(defaultGraph), store.graph(g.getOrElse(defaultGraph))))
      case ClearAll          => (nothing, store.quads)
      case CopyGraph(f0, t0, _) =>
        val (f, t) = (f0.getOrElse(defaultGraph), t0.getOrElse(defaultGraph))
        if (f == t) (nothing, nothing)
        else (tag(t, store.graph(f)), tag(t, store.graph(t)))
      case MoveGraph(f0, t0, _) =>
        val (f, t) = (f0.getOrElse(defaultGraph), t0.getOrElse(defaultGraph))
        if (f == t) (nothing, nothing)
        else (tag(t, store.graph(f)),
          tag(t, store.graph(t)).unionAll(tag(f, store.graph(f))))
      case AddGraph(f0, t0, _) =>
        (tag(t0.getOrElse(defaultGraph), store.graph(f0.getOrElse(defaultGraph))), nothing)
      case Load(src, g, silent) =>
        try {
          val q = loadOpQuads(spark, src, g, defaultGraph)
          ((if (silent) q.localCheckpoint() else q), nothing)
        } catch { case e: Exception if silent => (nothing, nothing) }
      case DropGraphs(_) =>
        (nothing, store.quads.filter(
          org.apache.spark.sql.functions.col("g") =!= defaultGraph))
      case _: SolutionsOp =>
        // see applyQuads: sets live on the Graft handle, never in a
        // journal commit — a durable namespace refuses rather than
        // silently dropping the op
        sys.error("named solution sets are connection-scoped: apply " +
          "SOLUTIONS updates through a Graft handle (graft.Graft.update), " +
          "not a journal-backed namespace")
      case other => sys.error(s"quads-mode update supports ground data, WITH-scoped ops and graph management, got $other")
    }
  }

  /** Fold an op sequence into ONE journal commit's `(adds, dels)`.
    * Later ops see earlier ops' store state (request order, §3.1);
    * the accumulated sets compose under the cancellation law
    * `A' = (A \ dels) ∪ adds`, `D' = D ∪ dels`, which is exactly what
    * makes a single commit (dels apply before adds) reproduce the
    * sequential result: a row op1 inserts and op2 deletes leaves the
    * commit, a row op1 deletes and op2 re-inserts rides the
    * within-commit add-outranks-delete rule. All delta-sized joins. */
  def quadsDeltaSeq(store: graft.rdf.QuadStore, ops: Seq[UpdateOp],
                    defaultGraph: String = "g:default"): (DataFrame, DataFrame) =
    quadsDeltaMixed(store, Seq(Left(ops)), defaultGraph)

  /** [[quadsDeltaSeq]] over a MIXED sequence of parsed update requests
    * and pre-parsed quad batches — the multi-request write-transaction
    * fold (TxServlet analog): each staged request applies in arrival
    * order under the same cancellation law, and the whole tx lands as
    * ONE commit's (adds, dels). A `Right(quads)` batch is an
    * insert-only step (REST data POST staged into a tx). */
  def quadsDeltaMixed(store: graft.rdf.QuadStore,
                      items: Seq[Either[Seq[UpdateOp], DataFrame]],
                      defaultGraph: String = "g:default"): (DataFrame, DataFrame) = {
    val cols = Seq("s", "p", "o", "g")
    val nothing = store.quads.limit(0)
    items.foldLeft((store, nothing, nothing)) {
      case ((st, accA, accD), Left(ops)) =>
        ops.foldLeft((st, accA, accD)) { case ((s2, a2, d2), op) =>
          val (a, d) = quadsDelta(s2, op, defaultGraph)
          (applyQuads(s2, op, defaultGraph),
            a2.join(d, cols, "left_anti").unionAll(a),
            d2.unionAll(d))
        }
      case ((st, accA, accD), Right(q)) =>
        val qq = q.select(cols.head, cols.tail: _*)
        (st.insertQuads(qq), accA.unionAll(qq), accD)
    } match { case (_, a, d) => (a, d) }
  }

  /** LOAD source reader: a parquet (s,p,o) table, a Turtle (.ttl)
    * document ([[graft.rdf.Turtle]] — whole-file parse, one task per
    * file since Turtle is not splittable), an RDF/XML (.rdf/.rdfxml/
    * .owl) document ([[graft.rdf.RdfXml]], same whole-file contract),
    * or an N-Triples text file
    * (`<s> <p> <o|"lit"> .` per line — line-splittable, the bulk-scale
    * text format). Term IRIs under the engine base intern to local
    * names, matching the parser. Distributed reads, not driver loops. */
  /** Format detection path: compression suffixes are transparent to
    * Spark's text readers (`.nt.gz` parses like `.nt` — bulk corpora
    * ship compressed), so they are stripped for the extension switch
    * ONLY; the read itself uses the real path. */
  private def fmtPath(source: String): String =
    source.stripPrefix("file://").stripSuffix(".gz").stripSuffix(".bz2")

  def loadTriples(spark: org.apache.spark.sql.SparkSession, source: String): DataFrame = {
    val path = source.stripPrefix("file://")
    val fmt = fmtPath(source)
    if (fmt.endsWith(".parquet")) spark.read.parquet(path).select("s", "p", "o")
    else if (fmt.endsWith(".ttl") || fmt.endsWith(".n3")) {
      // .n3 documents in the wild are Turtle (N3's formula/rule
      // extensions never reached RDF stores; Rio's N3 reader is its
      // Turtle parser too) — full N3 syntax fails loud, not silently
      import spark.implicits._
      spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.Turtle.parse(_))
        .toDF("s", "p", "o")
    }
    else if (fmt.endsWith(".rdf") || fmt.endsWith(".rdfxml") || fmt.endsWith(".owl")) {
      // RDF/XML (the reference's Rio RDFXMLParser format) — whole-file
      // parse per task like Turtle; XML is not splittable
      import spark.implicits._
      spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.RdfXml.parse(_))
        .toDF("s", "p", "o")
    }
    else if (fmt.endsWith(".jsonld")) {
      // JSON-LD (Rio JSONLDParser analog) — one JSON value per file,
      // whole-file parse per task
      import spark.implicits._
      spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.JsonLd.parse(_))
        .toDF("s", "p", "o")
    }
    else if (fmt.endsWith(".rj") || fmt.endsWith(".rdfjson")) {
      // RDF/JSON (Rio RDFJSONParser analog) — resource-centric JSON
      import spark.implicits._
      spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.RdfJson.parse(_))
        .toDF("s", "p", "o")
    }
    else if (fmt.endsWith(".trix")) {
      // TriX loaded as triples: the quads' graph column drops (the
      // triples LOAD contract; LOAD INTO GRAPH retargets explicitly)
      import spark.implicits._
      spark.read.option("wholetext", "true").textFile(path)
        .flatMap(graft.rdf.TriX.parseQuads(_, "g:default").map(q => (q._1, q._2, q._3)))
        .toDF("s", "p", "o")
    }
    else {
      val pat = "^\\s*" + RTerm + "\\s+" + RTerm + "\\s+" + OTerm + EolComment
      val rows = lineStatements(spark, path, pat, "ntriples")
      rows.select(fileScoped(unwrapTerm(col("t1"))).as("s"), unwrapTerm(col("t2")).as("p"),
                  fileScoped(unwrapTerm(col("t3"))).as("o"))
    }
  }

  /** N-Quads reader: `<s> <p> <o|"lit"> <g> .` per line — line-
    * splittable like N-Triples (the bulk-scale serialized-quad path),
    * each statement carrying its graph tag. */
  def loadQuads(spark: org.apache.spark.sql.SparkSession, source: String): DataFrame = {
    val path = source.stripPrefix("file://")
    val pat = "^\\s*" + RTerm + "\\s+" + RTerm + "\\s+" + OTerm + "\\s+" + RTerm + EolComment
    val rows = lineStatements(spark, path, pat, "nquads")
    rows.select(fileScoped(unwrapTerm(col("t1"))).as("s"), unwrapTerm(col("t2")).as("p"),
                fileScoped(unwrapTerm(col("t3"))).as("o"),
                fileScoped(unwrapTerm(col("t4"))).as("g"))
  }

  /** Shared line-format scan: skips blank and `#`-comment lines, then
    * FAILS LOUD on any remaining line the statement grammar does not
    * match (a silent drop would be silent data loss at 100-TB ingest;
    * SILENT LOAD still absorbs the error because it forces the read
    * inside its own try). Emits capture groups `t1..tN`. */
  private def lineStatements(spark: org.apache.spark.sql.SparkSession,
                             path: String, pat: String, fmt: String): DataFrame = {
    val groups = java.util.regex.Pattern.compile(pat).matcher("").groupCount()
    val line = col("value")
    spark.read.text(path)
      .filter(trim(line) =!= "" && !trim(line).startsWith("#"))
      .select((line +: (1 to groups).map(i =>
        regexp_extract(line, pat, i).as(s"t$i"))): _*)
      // the guard lives in a FILTER, not a projected column — a
      // projection is pruned away by count()-style plans and the error
      // would silently vanish with it
      .filter(when(col("t1") === "", raise_error(concat(
        lit(s"$fmt: unparseable line: "), line))).otherwise(lit(true)))
  }

  /** Blank-node labels in the line formats are document-scoped (RDF
    * 1.1 §3.4) exactly like the whole-file parsers' [[graft.rdf.Scope]]:
    * two .nt files both using `_:b1` must NOT alias. The scope key is
    * a 64-bit hash of the input file name, evaluated in the scan task
    * (before any shuffle), rendered 16-hex to match Scope.of's width
    * so display normalization strips both the same way. */
  private def fileScoped(c: Column): Column =
    when(c.startsWith("_:"),
      concat(lit("_:"), format_string("%016x", xxhash64(input_file_name())),
        lit("-"), c.substr(lit(3), length(c)))).otherwise(c)

  /** Statement tail: the terminating `.`, then optionally an
    * end-of-line `#` comment (comments are whitespace in the
    * N-Triples 1.1 grammar — rejecting them would refuse spec-valid
    * files). Non-capturing, so `t1..tN` indices are unaffected. */
  private val EolComment = """\s*\.\s*(?:#.*)?$"""

  /** Resource position: IRI or bnode label — labels admit `-`/`_`
    * (N-Triples PN_CHARS; the loaders' document-scoped labels are
    * `<8hex>-…`). */
  private val RTerm = """(<[^>]*>|_:[A-Za-z0-9_-]+)"""
  /** Object position: resource, or a literal with backslash escapes
    * and an optional `@lang` / `^^<dt>` facet. */
  private val OTerm = """(<[^>]*>|_:[A-Za-z0-9_-]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"""

  /** `<iri>` → interned term; `"lit"` → unescaped lexical form; facet
    * forms land as the RdfLiteral tagged/typed term encodings
    * (inverse of [[graft.rdf.Serializer]]). */
  private def unwrapTerm(c: Column): Column = {
    val base = graft.sparql.Parser.Base
    def intern(x: Column): Column =
      when(x === graft.sparql.Parser.RdfTypeIri, lit("type")) // canonical rdf:type
        .when(x.startsWith(base), x.substr(lit(base.length + 1), length(x)))
        .otherwise(x)
    // Exact inverse of Serializer.escape: park escaped backslashes
    // (`\\`) on a sentinel first so `\\n` (raw backslash + 'n' in the
    // data) is NOT misread as a newline, decode the named escapes,
    // then restore the sentinel as a single backslash. U+FFFF is a
    // Unicode noncharacter (never valid interchange text), so it
    // cannot collide with real data.
    def unesc(x: Column): Column =
      regexp_replace(
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(x, "\\\\\\\\", "\uFFFF"),
          "\\\\n", "\n"), "\\\\r", "\r"), "\\\\t", "\t"), "\\\\\"", "\""),
        "\uFFFF", "\\\\")
    when(c.startsWith("<"), intern(c.substr(lit(2), length(c) - 2)))
      .when(c.startsWith("_:"), c)
      // "lex"@lang → tagged form with the lex unescaped
      .when(c.rlike("^\".*\"@"),
        concat(lit("\""), unesc(regexp_extract(c, "^\"(.*)\"@", 1)),
          lit("\"@"), regexp_extract(c, "\"@([A-Za-z0-9-]+)$", 1)))
      // "lex"^^<dt> → typed form with the datatype IRI interned
      .when(c.rlike("^\".*\"\\^\\^<"),
        concat(lit("\""), unesc(regexp_extract(c, "^\"(.*)\"\\^\\^<", 1)),
          lit("\"^^"), intern(regexp_extract(c, "\\^\\^<(.*)>$", 1))))
      .otherwise(unesc(regexp_replace(c, "^\"|\"$", "")))
  }
}
