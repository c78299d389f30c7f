package graft.rdf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sparql.{Const, TriplePattern, TripleSource}

/** Materialized triple storage — the on-disk analog of the reference's
  * POS statement index (com.bigdata.rdf.store.AbstractTripleStore's
  * SPO/POS/OSP B+Trees), as a lakehouse layout instead of a B+Tree:
  *
  *  - the store is parquet PARTITIONED BY predicate, so a
  *    bound-predicate pattern reads exactly one partition directory
  *    (Catalyst partition pruning — zero footer reads elsewhere);
  *  - rows are sorted by subject WITHIN each partition, so a bound
  *    subject prunes row groups via parquet min/max zone maps.
  *
  * This is the production shape the virtual view's scaladoc points at:
  * at 100 TB you materialize the exploded view once and every
  * bound-predicate query becomes a partition-local scan. (An OSP
  * twin — partition by subject prefix — would serve object-bound
  * lookups; same mechanics.)
  */
object TripleStorage {

  /** Write an (s,p,o) relation as the predicate-partitioned store. */
  def write(triples: DataFrame, path: String): Unit =
    triples.select("s", "p", "o")
      .repartition(col("p"))
      .sortWithinPartitions("s")
      .write.mode("overwrite").partitionBy("p").parquet(path)

  /** TripleSource over a materialized store: bound-p scans prune to
    * one partition, bound-s scans prune row groups via the sort. */
  def source(spark: SparkSession, path: String): TripleSource = new TripleSource {
    lazy val triples: DataFrame =
      spark.read.parquet(path).select("s", "p", "o")
    def fuseStar(patterns: Seq[TriplePattern],
                 subjectTables: Option[Set[String]]): Option[DataFrame] = None
  }

  /** The object-id scheme of a term (`n:3` → `n`), `lit` for plain
    * literals — the OSP partition key. */
  private def objBucket(o: org.apache.spark.sql.Column) =
    when(o.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"),
      substring_index(o, ":", 1)).otherwise("lit")

  /** OSP twin: the same triples partitioned by the OBJECT's id scheme
    * (literals pool under `lit`), objects sorted within partitions —
    * "what points at X" reads one partition directory and zone-map
    * prunes by `o`, the on-disk OSP-index analog. */
  def writeOsp(triples: DataFrame, path: String): Unit =
    triples.select(col("s"), col("p"), col("o"), objBucket(col("o")).as("ob"))
      .repartition(col("ob"))
      .sortWithinPartitions("o")
      .write.mode("overwrite").partitionBy("ob").parquet(path)

  /** TripleSource over the OSP store: a bound-object pattern filters
    * the partition column first, so only the object's scheme directory
    * is read. */
  def ospSource(spark: SparkSession, path: String): TripleSource = new TripleSource {
    lazy val triples: DataFrame =
      spark.read.parquet(path).select("s", "p", "o")
    override def scan(tp: TriplePattern): DataFrame = tp.o match {
      case Const(v) =>
        val bucket = if (v.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*")) v.takeWhile(_ != ':') else "lit"
        TripleSource.filterScan(
          spark.read.parquet(path).filter(col("ob") === bucket).select("s", "p", "o"), tp)
      case _ => TripleSource.filterScan(triples, tp)
    }
    def fuseStar(patterns: Seq[TriplePattern],
                 subjectTables: Option[Set[String]]): Option[DataFrame] = None
  }
}
