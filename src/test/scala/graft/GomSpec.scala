package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gom.{BasicSkin, GenericSkin, Gpo, ObjectManager, SkinRegistry}

/** The GOM object-graph façade (reference bigdata-gom: IGPO/IObject-
  * Manager/ILinkSet contracts) over the Spark-native store. */
class GomSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def freshOm(): ObjectManager = ObjectManager.ofTriples(spark, Seq(
    ("n:1", "type", "Nation"), ("n:1", "name", "FRANCE"), ("n:1", "region", "r:1"),
    ("n:2", "type", "Nation"), ("n:2", "name", "PERU"), ("n:2", "region", "r:2"),
    ("n:3", "type", "Nation"), ("n:3", "name", "SPAIN"), ("n:3", "region", "r:1"),
    ("r:1", "type", "Region"), ("r:1", "name", "EUROPE"),
    ("r:2", "type", "Region"), ("r:2", "name", "AMERICA"))
    .toDF("s", "p", "o"))

  test("GPOs are canonical per manager; values and statements read back") {
    val om = freshOm()
    val n1 = om.getGPO("n:1")
    assert(n1 eq om.getGPO("n:1"))
    assert(n1.getValue("name").contains("FRANCE"))
    assert(n1.getValues("type") == Seq("Nation"))
    assert(n1.getStatements.toSet == Set(
      ("n:1", "type", "Nation"), ("n:1", "name", "FRANCE"), ("n:1", "region", "r:1")))
    assert(n1.isBound("region") && !n1.isBound("comment"))
    assert(n1.getType.map(_.id).contains("Nation"))
  }

  test("link sets: in/out members, statements, reverse-link counts, isMemberOf") {
    val om = freshOm()
    val europe = om.getGPO("r:1")
    val in = europe.getLinksIn("region")
    assert(in.isLinkSetIn && (in.getOwner eq europe) && in.getLinkProperty == "region")
    assert(in.members.map(_.id).toSet == Set("n:1", "n:3") && in.sizeLong == 2L)
    assert(in.statements.toSet == Set(("n:1", "region", "r:1"), ("n:3", "region", "r:1")))
    assert(om.getGPO("n:1").isMemberOf(in))
    assert(!om.getGPO("n:2").isMemberOf(in))
    assert(om.getGPO("n:1").getLinksOut("region").members.map(_.id) == Seq("r:1"))
    // getLinksOut excludes literal-valued properties ("FRANCE", "Nation"
    // are literals in the string term model; "r:1" is scheme-prefixed)
    assert(om.getGPO("n:1").getLinksOut.map(_.id) == Seq("r:1"))
    assert(europe.getReverseLinkProperties == Map("region" -> 2L))
    assert(om.getGPO("n:1").getLink("region", europe).isDefined)
    assert(om.getGPO("n:2").getLink("region", europe).isEmpty)
  }

  test("initGPOs batch-materializes many resources with one fetch") {
    val om = freshOm()
    val got = om.initGPOs(Seq("n:1", "n:2", "r:1"))
    assert(got.keySet == Set("n:1", "n:2", "r:1"))
    // navigation after the batch fetch runs on in-memory state
    assert(got("r:1").getLinksIn("region").size == 2)
    assert(got("n:2").getValue("name").contains("PERU"))
  }

  test("mutations outside a native transaction auto-commit; setValue replaces") {
    val om = freshOm()
    val n1 = om.getGPO("n:1")
    n1.setValue("name", "LA FRANCE")
    assert(n1.getValue("name").contains("LA FRANCE"))
    assert(om.evaluate("""SELECT ?n WHERE { "n:1" name ?n }""")
      .collect().map(_.getString(0)).toSeq == Seq("LA FRANCE"))
    n1.addValue("name", "FR")
    assert(n1.getValues("name").toSet == Set("LA FRANCE", "FR"))
    n1.removeValue("name", "FR")
    n1.removeValues("type")
    assert(n1.getValues("name") == Seq("LA FRANCE") && !n1.isBound("type"))
    assert(om.evaluate("""SELECT ?p ?o WHERE { "n:1" ?p ?o }""").count() == 2)
  }

  test("native transaction batches writes; evaluate sees dirty state; rollback discards") {
    val om = freshOm()
    val t = om.beginNativeTransaction()
    val gpo = om.createGPO()
    assert(gpo.id.startsWith("gpo:#") && gpo.id.endsWith("-1"))
    gpo.setValue("type", "Marker")
    gpo.setValue("at", "n:1")
    // read-your-writes before commit, through BOTH surfaces
    assert(gpo.getValue("at").contains("n:1"))
    assert(om.evaluate("""ASK { ?x type "Marker" }""").collect()(0).getBoolean(0))
    assert(om.getGPO("n:1").getLinksIn("at").size == 1)
    om.rollbackNativeTransaction()
    assert(om.evaluate("""ASK { ?x type "Marker" }""").collect()(0).getBoolean(0) == false)
    assert(om.getGPO("n:1").getLinksIn("at").size == 0)
    // now the committing twin
    val t2 = om.beginNativeTransaction()
    om.getGPO("n:2").setValue("name", "EL PERU")
    assert(om.getNativeTransactionCounter == 1)
    om.commitNativeTransaction(t2)
    assert(om.getNativeTransactionCounter == 0)
    assert(om.evaluate("""SELECT ?n WHERE { "n:2" name ?n }""")
      .collect().map(_.getString(0)).toSeq == Seq("EL PERU"))
    // mismatched handshake is loud
    val t3 = om.beginNativeTransaction()
    intercept[IllegalStateException](om.commitNativeTransaction(t3 + 1))
    om.rollbackNativeTransaction()
  }

  test("nested native transactions flush only at the outermost commit") {
    val om = freshOm()
    val outer = om.beginNativeTransaction()
    om.getGPO("n:1").setValue("name", "A")
    val inner = om.beginNativeTransaction()
    om.getGPO("n:2").setValue("name", "B")
    om.commitNativeTransaction(inner)
    // inner commit does NOT publish — the committed store is unchanged
    assert(om.getNativeTransactionCounter == 1)
    om.commitNativeTransaction(outer)
    val names = om.evaluate("""SELECT ?n WHERE { ?s type "Nation" . ?s name ?n }""")
      .collect().map(_.getString(0)).toSet
    assert(names == Set("A", "B", "SPAIN"))
  }

  test("remove() drops the object and every link to it; the handle is dead") {
    val om = freshOm()
    val n1 = om.getGPO("n:1")
    val europe = om.getGPO("r:1").materialize()
    n1.remove()
    intercept[IllegalStateException](n1.getValue("name"))
    // canonicalized neighbor's in-memory view was fixed up
    assert(europe.getLinksIn("region").members.map(_.id) == Seq("n:3"))
    // and the committed store agrees
    assert(om.evaluate("""SELECT ?x WHERE { ?x region "r:1" }""")
      .collect().map(_.getString(0)).toSeq == Seq("n:3"))
    assert(om.evaluate("""SELECT ?p ?o WHERE { "n:1" ?p ?o }""").count() == 0)
  }

  test("links assert/retract through LinkSet mutators") {
    val om = freshOm()
    val europe = om.getGPO("r:1")
    val in = europe.getLinksIn("region")
    in.add(om.getGPO("n:2"))
    assert(in.members.map(_.id).toSet == Set("n:1", "n:2", "n:3"))
    in.remove(om.getGPO("n:1"))
    assert(om.evaluate("""SELECT ?x WHERE { ?x region "r:1" }""")
      .collect().map(_.getString(0)).toSet == Set("n:2", "n:3"))
    val out = om.getGPO("n:2").getLinksOut("region")
    assert(out.members.map(_.id).toSet == Set("r:1", "r:2"))
  }

  test("execute runs SPARQL UPDATE and invalidates materialized GPOs") {
    val om = freshOm()
    val n1 = om.getGPO("n:1").materialize()
    om.execute("""DELETE { ?s name ?n } INSERT { ?s name "RENAMED" } WHERE { ?s name ?n . ?s type "Nation" }""")
    assert(n1.getValue("name").contains("RENAMED"))
    assert(om.getGPO("r:1").getValue("name").contains("EUROPE"))
  }

  test("statement GPOs (sids mode) carry metadata about a statement") {
    val om = freshOm()
    val link = om.getGPO("n:1", "region", "r:1")
    link.setValue("since", "1958")
    assert(om.getGPO("n:1", "region", "r:1").getValue("since").contains("1958"))
    assert(link.id.startsWith("sid:"))
  }

  test("save/recall names through the NameManager object") {
    val om = freshOm()
    om.save("bestRegion", "r:1")
    om.save("threshold", "10")
    assert(om.recall("threshold").contains("10"))
    assert(om.recallAsGPO("bestRegion").map(_.getValue("name")).flatten.contains("EUROPE"))
    assert(om.getNames == Seq("bestRegion", "threshold"))
    om.save("threshold", "20") // single-valued overwrite
    assert(om.recall("threshold").contains("20"))
  }

  test("skins: BasicSkin typed accessors and a registered custom skin") {
    val om = freshOm()
    om.getGPO("n:1").setValue("population", "67")
    val skin = om.getGPO("n:1").asClass[BasicSkin]
    assert(skin.getInt("population").contains(67))
    assert(skin.getString("name").contains("FRANCE"))
    assert(skin.getDouble("population").contains(67.0))
    // typed getters strip term facets
    om.getGPO("n:1").setValue("motto", "\"liberte\"@fr")
    assert(skin.getString("motto").contains("liberte"))

    class NationSkin(val gpo: Gpo) extends GenericSkin {
      def nationName: String = gpo.getValue("name").get
      def region: Gpo = gpo.getLinksOut("region").members.head
    }
    SkinRegistry.register[NationSkin](new NationSkin(_))
    val ns = om.getGPO("n:1").asClass[NationSkin]
    assert(ns.nationName == "FRANCE" && ns.region.getValue("name").contains("EUROPE"))
    class Unregistered(val gpo: Gpo) extends GenericSkin
    intercept[UnsupportedOperationException](om.getGPO("n:1").asClass[Unregistered])
  }

  test("close flushes an open transaction and detaches the manager") {
    val om = freshOm()
    om.beginNativeTransaction()
    om.getGPO("n:1").setValue("name", "CLOSED")
    om.close()
    intercept[IllegalStateException](om.getGPO("n:2"))
    assert(!om.isPersistent)
  }

  test("durable manager: commits seal journal points; reopen reattaches; rollback is journal-free") {
    import graft.rdf.Repository
    val dir = java.nio.file.Files.createTempDirectory("graft_gom").toString
    val repo = Repository.create(spark, dir)
    repo.update("""INSERT DATA { "n:1" name "FRANCE" . "n:1" region "r:1" . "r:1" name "EUROPE" }""")
    val om = graft.gom.ObjectManager.durable(repo)
    assert(om.isPersistent)
    val v0 = repo.version
    val t = om.beginNativeTransaction()
    om.getGPO("n:1").setValue("name", "LA FRANCE")
    om.createGPO().setValue("at", "r:1")
    om.commitNativeTransaction(t)
    assert(repo.version > v0, "outermost commit must seal a journal point")
    // a dirty rollback never touches the journal
    val v1 = repo.version
    om.beginNativeTransaction()
    om.getGPO("n:1").setValue("name", "DROPPED")
    om.rollbackNativeTransaction()
    assert(repo.version == v1)
    // reopen: the committed object graph reattaches
    val om2 = graft.gom.ObjectManager.durable(Repository.open(spark, dir))
    assert(om2.getGPO("n:1").getValue("name").contains("LA FRANCE"))
    assert(om2.getGPO("r:1").getLinksIn("at").size == 1)
    // historical read below the GOM commit still sees the old value
    assert(Repository.open(spark, dir).connection(v0)
      .query("""SELECT ?n WHERE { "n:1" name ?n }""")
      .collect().map(_.getString(0)).toSeq == Seq("FRANCE"))
  }

  test("connection exposes the current store to the rest of the engine") {
    val om = freshOm()
    om.getGPO("n:1").setValue("name", "X")
    val g = om.connection
    assert(g.query("""SELECT ?n WHERE { "n:1" name ?n }""")
      .collect().map(_.getString(0)).toSeq == Seq("X"))
  }

  test("rollback revives a handle whose remove() was never committed") {
    val om = freshOm()
    om.beginNativeTransaction()
    val n1 = om.getGPO("n:1")
    n1.remove()
    intercept[IllegalStateException](n1.getValue("name"))
    om.rollbackNativeTransaction()
    // the store never saw the removal — the canonical handle lives
    assert(n1.getValue("name").contains("FRANCE"))
    assert(om.getGPO("n:1").getLinksOut("region").members.map(_.id) == Seq("r:1"))
  }

  test("rollback does NOT revive a handle whose remove() was already committed") {
    val om = freshOm()
    val n2 = om.getGPO("n:2")
    n2.remove() // auto-commits: the resource really is gone
    om.beginNativeTransaction()
    om.getGPO("n:3").setValue("name", "DROPPED")
    om.rollbackNativeTransaction()
    // the unrelated rollback must not resurrect the committed remove —
    // a revived handle's writes would silently re-create the resource
    intercept[IllegalStateException](n2.getValue("name"))
    assert(om.evaluate("""SELECT ?p WHERE { "n:2" ?p ?o }""").count() == 0)
  }

  test("a GPO materialized AFTER an uncommitted remove() sees no links to the removed object") {
    val om = freshOm()
    om.beginNativeTransaction()
    om.getGPO("n:1").remove()
    // r:1 materializes only NOW — its reverse set must not resurrect
    // the removed n:1 (the evaluate() view already filters it)
    assert(om.getGPO("r:1").getLinksIn("region").members.map(_.id) == Seq("n:3"))
    assert(om.evaluate("""SELECT ?x WHERE { ?x region "r:1" }""")
      .collect().map(_.getString(0)).toSeq == Seq("n:3"))
    om.rollbackNativeTransaction()
  }

  test("connection inside a transaction is a read-only view; rollback still discards") {
    val om = freshOm()
    om.beginNativeTransaction()
    om.getGPO("n:1").setValue("name", "UNCOMMITTED")
    // the view sees the dirty write...
    assert(om.connection.query("""SELECT ?n WHERE { "n:1" name ?n }""")
      .collect().map(_.getString(0)).toSeq == Seq("UNCOMMITTED"))
    om.rollbackNativeTransaction()
    // ...but taking it committed nothing
    assert(om.getGPO("n:1").getValue("name").contains("FRANCE"))
  }

  test("durable: remove-then-re-add in one transaction ends present, like the in-memory twin") {
    import graft.rdf.Repository
    val dir = java.nio.file.Files.createTempDirectory("graft_gom_readd").toString
    val repo = Repository.create(spark, dir)
    repo.update("""INSERT DATA { "n:3" region "r:9" . "r:9" name "ATLANTIS" }""")
    val om = graft.gom.ObjectManager.durable(repo)
    val t = om.beginNativeTransaction()
    val n3 = om.getGPO("n:3").materialize()
    om.getGPO("r:9").remove()
    n3.addValue("region", "r:9")            // re-assert the link
    om.commitNativeTransaction(t)
    val got = Repository.open(spark, dir).connection()
      .query("""SELECT ?p ?o WHERE { ?s ?p ?o . FILTER(?o = "r:9" || ?s = "r:9") }""")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // the re-added link survives; r:9's own name statement is gone
    assert(got == Set(("region", "r:9")), s"got $got")
  }

  test("minted ids are unique across managers over one durable repository") {
    import graft.rdf.Repository
    val dir = java.nio.file.Files.createTempDirectory("graft_gom_ids").toString
    val repo = Repository.create(spark, dir)
    val a = graft.gom.ObjectManager.durable(repo)
    val id1 = a.createGPO().id
    a.getGPO(id1).setValue("type", "Marker")
    a.close()
    val b = graft.gom.ObjectManager.durable(Repository.open(spark, dir))
    val id2 = b.createGPO().id
    assert(id1 != id2, "a second session must not re-mint a persisted id")
    assert(b.getGPO(id2).getStatements.isEmpty)
  }

  test("BasicSkin strips facets of multi-line literals") {
    val om = freshOm()
    om.getGPO("n:1").setValue("note", "\"line1\nline2\"@en")
    assert(om.getGPO("n:1").asClass[BasicSkin].getString("note").contains("line1\nline2"))
  }
}
