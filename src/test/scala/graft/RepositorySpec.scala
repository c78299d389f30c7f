package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rdf.Repository

class RepositorySpec extends AnyFunSuite {
  import TestSpark.spark

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_repo").toString

  private def values(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("connection -> SPARQL update -> commit -> reopen round-trip") {
    val dir = tmp()
    val repo = Repository.create(spark, dir)
    val c0 = repo.connection()
    assert(repo.version == 0 && c0.query("ASK { ?s ?p ?o }").collect()(0).getBoolean(0) == false)

    val c1 = c0.update(
      """INSERT DATA { <e:a> <e:knows> <e:b> . <e:b> <e:knows> <e:c> }""")
    val v1 = repo.commit(c1)
    assert(v1 == 1)

    // a second mutation: delete one edge, add another
    val c2 = repo.connection().update(
      """DELETE DATA { <e:a> <e:knows> <e:b> } ;
        |INSERT DATA { <e:c> <e:knows> <e:a> }""".stripMargin)
    val v2 = repo.commit(c2)
    assert(v2 == 2)

    // reopen cold: head state is the v2 connection's state
    val repo2 = Repository.open(spark, dir)
    val head = repo2.connection()
    assert(values(head.query("SELECT ?s ?o WHERE { ?s <e:knows> ?o }")) ==
      Set(Seq("e:b", "e:c"), Seq("e:c", "e:a")))
    // historical read-only connection sees v1's state
    assert(values(repo2.connection(v1).query("SELECT ?s ?o WHERE { ?s <e:knows> ?o }")) ==
      Set(Seq("e:a", "e:b"), Seq("e:b", "e:c")))
  }

  test("commit writes the diff, not the store") {
    val dir = tmp()
    val repo = Repository.create(spark, dir)
    repo.commit(repo.connection().update(
      "INSERT DATA { <e:a> <e:p> \"1\" . <e:b> <e:p> \"2\" . <e:c> <e:p> \"3\" }"))
    repo.commit(repo.connection().update("INSERT DATA { <e:d> <e:p> \"4\" }"))
    // the v2 adds segment holds ONLY the delta row
    val seg = spark.read.parquet(s"$dir/segments/c2-adds.parquet")
    assert(seg.count() == 1 && seg.collect()(0).getString(0) == "e:d")
    // an unchanged connection commits no segments at all
    val v3 = repo.commit(repo.connection())
    assert(v3 == 3)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "segments", "c3-adds.parquet")))
    assert(repo.connection().store.quads.count() == 4)
  }

  test("update() commits the ops' own delta: no store scan in a small commit's plan") {
    val dir = tmp()
    val repo = Repository.create(spark, dir)
    repo.update("INSERT DATA { <e:a> <e:p> \"1\" . <e:b> <e:p> \"2\" }")
    repo.compact() // give the head a real parquet base segment
    // the delta of a ground INSERT DATA never touches the store: its
    // plan is a local relation, not a parquet scan of the base
    val head = repo.connection()
    val (adds, dels) = graft.sparql.Update.quadsDeltaSeq(head.store,
      graft.sparql.Parser.parseUpdates("INSERT DATA { <e:c> <e:p> \"3\" }"))
    val plan = adds.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      s"ground-delta commit should plan zero store scans:\n$plan")
    assert(dels.isEmpty)
    // and the committed segment holds only the delta row
    val v = repo.update("INSERT DATA { <e:c> <e:p> \"3\" }")
    val seg = spark.read.parquet(s"$dir/segments/c$v-adds.parquet")
    assert(seg.count() == 1 && seg.collect()(0).getString(0) == "e:c")
    assert(repo.connection().store.quads.count() == 3)
  }

  test("update() folds a multi-op request into one commit with sequential semantics") {
    val dir = tmp()
    val repo = Repository.create(spark, dir)
    repo.update("INSERT DATA { <e:a> <e:p> \"1\" }")
    // insert-then-delete within one request cancels; delete-then-insert revives
    val v = repo.update(
      """INSERT DATA { <e:tmp> <e:p> "t" } ;
        |DELETE DATA { <e:tmp> <e:p> "t" } ;
        |DELETE DATA { <e:a> <e:p> "1" } ;
        |INSERT DATA { <e:a> <e:p> "1" . <e:b> <e:p> "2" }""".stripMargin)
    assert(v == 2)
    assert(values(repo.connection().query("SELECT ?s WHERE { ?s <e:p> ?v }")) ==
      Set(Seq("e:a"), Seq("e:b")))
    // WHERE-driven op and graph management ride the same delta path
    repo.update("DELETE { ?s <e:p> ?v } INSERT { ?s <e:q> ?v } WHERE { ?s <e:p> ?v }")
    assert(values(repo.connection().query("SELECT ?s WHERE { ?s <e:q> ?v }")) ==
      Set(Seq("e:a"), Seq("e:b")))
    repo.update("CLEAR ALL")
    assert(repo.connection().store.quads.isEmpty)
    // history still resolves exactly
    assert(values(repo.connection(2).query("SELECT ?s WHERE { ?s <e:p> ?v }")) ==
      Set(Seq("e:a"), Seq("e:b")))
  }

  test("compact seals the head; named-graph updates persist per graph") {
    val dir = tmp()
    val repo = Repository.create(spark, dir)
    repo.commit(repo.connection().update(
      """INSERT DATA { GRAPH <g:one> { <e:a> <e:p> "1" } GRAPH <g:two> { <e:b> <e:p> "2" } }"""))
    repo.compact()
    val head = Repository.open(spark, dir).connection()
    assert(values(head.query(
      "SELECT ?g ?s WHERE { GRAPH ?g { ?s <e:p> ?v } }")) ==
      Set(Seq("g:one", "e:a"), Seq("g:two", "e:b")))
  }
}
