package graft.sparql

/** SPARQL 1.1 Protocol dataset parameters — the RDF dataset a client
  * supplies OUTSIDE the query text (`default-graph-uri=` /
  * `named-graph-uri=` on query requests, `using-graph-uri=` /
  * `using-named-graph-uri=` on update requests; sparql11-protocol
  * §2.1.4/§2.2.3). Generic clients (remote-store adapters, scripting
  * wrappers) pass the dataset this way rather than rewriting FROM
  * clauses, and the reference honors them on its endpoint
  * (bigdata-sails BigdataRDFContext.java:1145-1162 builds the
  * DatasetNode from the request parameters). The engine already has
  * the dataset machinery — [[DatasetClause]] / [[UsingClause]] — so
  * this is pure AST surgery ahead of compilation. */
object ProtocolDataset {

  /** Impose a protocol-supplied dataset on a parsed query. Per
    * §2.1.4 the protocol dataset TAKES PRECEDENCE over the query's
    * own FROM / FROM NAMED: the query's [[DatasetClause]] (at most
    * one — the grammar puts dataset clauses only on the top-level
    * query, never a subselect) is REPLACED, not composed; a query
    * without one gains the clause around its pattern. Only the
    * solution-modifier / query-form spine the parser assembles ABOVE
    * the dataset clause is descended. */
  def overrideIn(ast: Algebra, defaults0: Seq[String],
                 named0: Seq[String]): Algebra = {
    // the protocol dataset is a SET of graphs (§2.1.4) — a repeated
    // default-graph-uri must not double solution multiplicity through
    // the clause's unionAll merge
    val (defaults, named) = (defaults0.distinct, named0.distinct)
    def go(a: Algebra): Option[Algebra] = a match {
      case DatasetClause(_, _, child) => Some(DatasetClause(defaults, named, child))
      case x @ Slice(c, _, _)         => go(c).map(n => x.copy(child = n))
      case x @ OrderBy(c, _)          => go(c).map(n => x.copy(child = n))
      case Distinct(c)                => go(c).map(Distinct)
      case Project(c, vs @ _*)        => go(c).map(n => Project(n, vs: _*))
      case StarProject(c)             => go(c).map(StarProject)
      case x @ Extend(c, _, _)        => go(c).map(n => x.copy(child = n))
      case x @ Filter(c, _)           => go(c).map(n => x.copy(child = n))
      case x @ Group(c, _, _)         => go(c).map(n => x.copy(child = n))
      case Ask(c)                     => go(c).map(Ask)
      case x @ Construct(_, c)        => go(c).map(n => x.copy(child = n))
      case x @ DescribeWhere(_, c)    => go(c).map(n => x.copy(child = n))
      case _                          => None
    }
    go(ast).getOrElse(DatasetClause(defaults, named, ast))
  }

  /** Impose protocol `using-graph-uri` / `using-named-graph-uri` on
    * parsed update ops. Per §2.2.3 it is an ERROR to combine the
    * protocol parameters with an update that itself uses USING,
    * USING NAMED, or WITH — fail loud (the endpoint renders 400);
    * otherwise every template-WHERE op evaluates its WHERE against
    * the protocol dataset, and non-WHERE ops (data blocks, graph
    * management, LOAD) pass through untouched. */
  def usingIn(ops: Seq[UpdateOp], defaults0: Seq[String],
              named0: Seq[String]): Seq[UpdateOp] = {
    val (defaults, named) = (defaults0.distinct, named0.distinct)
    ops.map {
      case _: UsingClause | _: WithGraph =>
        throw new IllegalArgumentException(
          "protocol using-graph-uri/using-named-graph-uri must not be " +
            "combined with USING, USING NAMED, or WITH in the update " +
            "(SPARQL 1.1 Protocol §2.2.3)")
      case t: TemplateWhereOp => UsingClause(defaults, named, t)
      case other              => other
    }
  }
}
