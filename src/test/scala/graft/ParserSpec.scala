package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.rdf.TpchRdf
import graft.sparql._

class ParserSpec extends AnyFunSuite {
  import TestSpark.{spark, SF}
  private lazy val src = TpchRdf.source(spark, SF)
  private def run(q: String) = Compiler.compile(Parser.parse(q), src)

  test("basic BGP + projection + order") {
    val df = run("""SELECT ?cname ?bal WHERE {
      ?c mktsegment "BUILDING" .
      ?c name ?cname .
      ?c acctbal ?bal
    } ORDER BY ?cname""")
    val expected = Compiler.compile(
      OrderBy(Project(Bgp(
        TriplePattern("?c", "mktsegment", "BUILDING"),
        TriplePattern("?c", "name", "?cname"),
        TriplePattern("?c", "acctbal", "?bal")), "cname", "bal"),
        Seq(col("cname"))), src)
    assert(df.columns.toSeq == Seq("cname", "bal"))
    assert(df.collect().toSeq == expected.collect().toSeq)
  }

  test("FILTER with numeric comparison and boolean ops") {
    val df = run("""SELECT ?c WHERE {
      ?c acctbal ?bal .
      ?c mktsegment ?seg .
      FILTER(?bal > 5000 && ?seg != "BUILDING")
    }""")
    val n = TpchRdf.table(spark, SF, "customer")
      .filter(col("c_acctbal").cast("decimal(18,2)").cast("string").cast("double") > 5000
        && col("c_mktsegment") =!= "BUILDING").count()
    assert(df.count() == n)
  }

  test("OPTIONAL, UNION, LIMIT/OFFSET") {
    val opt = run("""SELECT ?nname ?cname WHERE {
      ?n type "Nation" . ?n name ?nname
      OPTIONAL { ?c nation ?n . ?c name ?cname . ?c mktsegment "BUILDING" }
    }""")
    assert(opt.filter(col("cname").isNull).count() > 0)

    val uni = run("""SELECT ?x WHERE {
      { ?x type "Region" } UNION { ?x type "Nation" }
    }""")
    assert(uni.count() == 30)

    val lim = run("""SELECT ?o WHERE { ?o priority "1-URGENT" } ORDER BY ?o LIMIT 10 OFFSET 5""")
    assert(lim.count() == 10)
  }

  test("FILTER NOT EXISTS and regex") {
    val ne = run("""SELECT ?c WHERE {
      ?c type "Customer"
      FILTER NOT EXISTS { ?o customer ?c }
    }""")
    val viaAlgebra = Compiler.compile(
      NotExists(Bgp(TriplePattern("?c", "type", "Customer")),
                Bgp(TriplePattern("?o", "customer", "?c"))), src)
    assert(ne.count() == viaAlgebra.select("c").count())

    val re = run("""SELECT ?p ?pname WHERE {
      ?p name ?pname FILTER(regex(?pname, "^red"))
    }""")
    assert(re.count() ==
      TpchRdf.table(spark, SF, "part").filter(col("p_name").rlike("^red")).count())
  }

  test("BIND and DISTINCT") {
    val df = run("""SELECT DISTINCT ?band WHERE {
      ?p retailprice ?price .
      BIND(?price AS ?band)
    } ORDER BY ?band LIMIT 5""")
    assert(df.count() == 5)
  }
}
