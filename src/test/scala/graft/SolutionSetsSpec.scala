package graft

import org.scalatest.funsuite.AnyFunSuite

/** Named-solution-set UPDATE extensions — the reference's SOLUTIONS
  * grammar (sparql.jj:335; `INSERT INTO %set Select()` / `DELETE FROM
  * %set Select()` per TestUpdateExprBuilder2.java:100-235, management
  * verbs per its CREATE/DROP/CLEAR arms) evaluated against the
  * connection-scoped set store on the [[Graft]] handle, read back by
  * `INCLUDE %set` (AST2BOpUpdate.java:728-1007 semantics:
  * putSolutions appends, delete removes equal solutions). */
class SolutionSetsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def base: Graft = Graft.empty(spark).update(
    """INSERT DATA {
      |  x:1 a Person . x:1 label "ann" . x:1 age 31 .
      |  x:2 a Person . x:2 label "bob" . x:2 age 25 .
      |  x:3 a Robot  . x:3 label "c3p" .
      |}""".stripMargin)

  test("CREATE SOLUTIONS / INSERT INTO / INCLUDE round-trip; sets survive store updates") {
    val g = base.update(
      """CREATE SOLUTIONS %people ;
        |INSERT INTO %people SELECT ?s ?l WHERE { ?s a Person . ?s label ?l }""".stripMargin)
    assert(g.solutionSets.keySet == Set("people"))
    val rows = g.query("SELECT ?s ?l WHERE { INCLUDE %people } ORDER BY ?s")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("x:1", "ann"), ("x:2", "bob")))
    // the set is a MATERIALIZATION: a later store update does not
    // change it (the reference's solution set is a stored snapshot)
    val g2 = g.update("""DELETE DATA { x:2 label "bob" }""")
    assert(g2.query("SELECT ?l WHERE { INCLUDE %people }").count() == 2)
    // ... and INCLUDE joins against live patterns on shared vars
    val joined = g2.query(
      "SELECT ?s ?n WHERE { INCLUDE %people . ?s age ?n }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(joined == Set(("x:1", "31"), ("x:2", "25")))
  }

  test("INSERT INTO appends (multiset); the SELECT sees the PRE-update set") {
    val g = base.update(
      """INSERT INTO %s SELECT ?s WHERE { ?s a Person } ;
        |INSERT INTO %s SELECT ?s WHERE { ?s a Person }""".stripMargin)
    assert(g.query("SELECT ?s WHERE { INCLUDE %s }").count() == 4)
    // self-append doubles: the inner SELECT reads the set as it was
    val g2 = g.update("INSERT INTO %s SELECT ?s WHERE { INCLUDE %s }")
    assert(g2.query("SELECT ?s WHERE { INCLUDE %s }").count() == 8)
  }

  test("DELETE FROM removes equal solutions, null-safe on unbound slots") {
    val g = base.update(
      """INSERT INTO %w SELECT ?s ?l WHERE { ?s label ?l . OPTIONAL { ?s age ?l2 } } ;
        |DELETE FROM %w SELECT ?s ?l WHERE { ?s a Person . ?s label ?l }""".stripMargin)
    val left = g.query("SELECT ?s ?l WHERE { INCLUDE %w }")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(left == Set(("x:3", "c3p")))
    // deleting with a solution that leaves ?l unbound matches only
    // stored-unbound rows (null-safe equality, not null-matches-all)
    val g2 = base.update(
      """INSERT INTO %v SELECT ?s ?l WHERE { ?s a Robot . OPTIONAL { ?s age ?l } } ;
        |INSERT INTO %v SELECT ?s ?l WHERE { ?s a Robot . ?s label ?l } ;
        |DELETE FROM %v SELECT ?s ?l WHERE { ?s a Robot . OPTIONAL { ?s age ?l } }""".stripMargin)
    val v = g2.query("SELECT ?s ?l WHERE { INCLUDE %v }")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(v == Set(("x:3", Some("c3p"))))
  }

  test("management verbs: duplicate CREATE loud, SILENT quiet; DROP/CLEAR; ALL clears sets") {
    val g = base.update("CREATE SOLUTIONS %a ; INSERT INTO %a SELECT ?s WHERE { ?s a Person }")
    val dup = intercept[RuntimeException](g.update("CREATE SOLUTIONS %a"))
    assert(dup.getMessage.contains("already exists"))
    assert(g.update("CREATE SILENT SOLUTIONS %a").solutionSets.keySet == Set("a"))
    val missing = intercept[RuntimeException](g.update("DROP SOLUTIONS %nope"))
    assert(missing.getMessage.contains("no such solution set"))
    assert(g.update("DROP SILENT SOLUTIONS %nope").solutionSets.keySet == Set("a"))
    // CLEAR keeps the (empty) set; DROP removes it; bare DROP
    // SOLUTIONS drops every set; DROP ALL clears graphs AND sets
    val cleared = g.update("CLEAR SOLUTIONS %a")
    assert(cleared.solutionSets.keySet == Set("a"))
    assert(cleared.query("SELECT * WHERE { INCLUDE %a }").isEmpty)
    assert(g.update("DROP SOLUTIONS %a").solutionSets.isEmpty)
    assert(g.update("DROP SOLUTIONS").solutionSets.isEmpty)
    val all = g.update("DROP ALL")
    assert(all.solutionSets.isEmpty && all.store.quads.isEmpty)
  }

  test("DROP GRAPHS keeps the default graph and the solution sets") {
    val g = base.update(
      """INSERT DATA { GRAPH g:extra { x:9 label "zap" } } ;
        |INSERT INTO %keep SELECT ?s WHERE { ?s a Person } ;
        |DROP GRAPHS""".stripMargin)
    assert(g.solutionSets.keySet == Set("keep"))
    import org.apache.spark.sql.functions.col
    assert(g.store.quads.filter(col("g") =!= "g:default").isEmpty)
    assert(g.query("SELECT ?s WHERE { ?s a Person }").count() == 2)
  }

  test("the bare quad-store path refuses SOLUTIONS ops loud") {
    val e = intercept[RuntimeException](
      graft.sparql.Update.applyQuadsSeq(base.store,
        graft.sparql.Parser.parseUpdates("INSERT INTO %x SELECT ?s WHERE { ?s a Person }")))
    assert(e.getMessage.contains("connection-scoped"), e.getMessage)
  }
}
