package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-level DELETE on graft-tsv tables (SupportsDelete, copy-on-write
  * generation rewrite — value parity end-to-end: q_dsv2_delete). Proves:
  *  - DELETE WHERE removes exactly the matching rows through SQL;
  *  - only files whose stats/partition values can match are rewritten
  *    (unaffected files keep their identity — never opened);
  *  - a partition-column DELETE is metadata-only (no rewrite at all);
  *  - a no-match DELETE publishes nothing; DELETE without WHERE empties
  *    the table; rewritten files carry fresh, still-prunable stats;
  *  - crash states stay invisible (staging garbage never surfaces, the
  *    old generation stays readable, the next commit sweeps);
  *  - non-translatable predicates fall back to the row-level rewrite
  *    (GraftTsvRowLevelOperation; arm-level coverage in Dsv2MergeSpec). */
class Dsv2DeleteSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_delete").toString
  spark.conf.set("spark.sql.catalog.gdel",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gdel.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gdel.db")

  private def names(table: String): Seq[String] = {
    def walk(d: java.io.File, rel: String): Seq[String] =
      d.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory) walk(f, rel + f.getName + "/")
        else Seq(rel + f.getName)
      }
    walk(new java.io.File(s"$rootDir/db/$table"), "")
  }

  test("DELETE WHERE removes exactly the matching rows, atomically") {
    spark.sql("CREATE TABLE gdel.db.t (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gdel.db.t SELECT id, concat('v', id) FROM range(100)")
    spark.sql("DELETE FROM gdel.db.t WHERE id >= 50 AND id < 70")
    val left = spark.sql("SELECT id FROM gdel.db.t").collect().map(_.getLong(0)).sorted
    assert(left.toSeq === (0L until 100L).filterNot(i => i >= 50 && i < 70))
    // one new generation; the superseded one retained for in-flight readers
    assert(names("t").count(_.startsWith("_gen-")) == 2, names("t").mkString(","))
    assert(!names("t").exists(_.contains(".staging-")),
      s"delete staging must be swept: ${names("t").mkString(",")}")
    // a second delete with a string predicate (string comparator path)
    spark.sql("DELETE FROM gdel.db.t WHERE v = 'v7'")
    assert(spark.sql("SELECT count(*) FROM gdel.db.t").head().getLong(0) == 79)
  }

  test("only files whose stats can match are rewritten") {
    spark.sql("CREATE TABLE gdel.db.s (id BIGINT, v STRING) USING `graft-tsv`")
    import spark.implicits._
    spark.range(200).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id"))
      .writeTo("gdel.db.s").append()
    val partsBefore = names("s").filter(_.startsWith("part-")).toSet
    assert(partsBefore.size == 4, partsBefore.mkString(","))
    spark.sql("DELETE FROM gdel.db.s WHERE id < 30") // covered by ONE file's range
    val after = spark.sql("SELECT id FROM gdel.db.s").collect().map(_.getLong(0)).sorted
    assert(after.toSeq === (30L until 200L))
    // the three non-covering files survive AS THEMSELVES in the new
    // manifest (identity = never rewritten); the covering file's
    // replacement is a new part name
    val gen = names("s").filter(_.startsWith("_gen-")).max
    val fs = new org.apache.hadoop.fs.Path(rootDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced = graft.sources.GraftTsvManifest.read(fs,
      new org.apache.hadoop.fs.Path(s"$rootDir/db/s/$gen")).toSet
    assert((referenced & partsBefore).size == 3,
      s"3 of 4 original files must be carried unrewritten: $referenced")
    assert((referenced -- partsBefore).size == 1,
      s"exactly one rewritten replacement expected: $referenced")
    // rewritten stats stay prunable: a fresh range read still skips files
    val q = spark.sql("SELECT id FROM gdel.db.s WHERE id >= 180")
    assert(q.collect().length == 20)
  }

  test("a partition-column DELETE is metadata-only") {
    spark.sql("""CREATE TABLE gdel.db.p (id BIGINT, day STRING)
      USING `graft-tsv` PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO gdel.db.p
      SELECT id, concat('d', id % 3) FROM range(30)""")
    val partsBefore = names("p").filter(_.contains("part-")).toSet
    spark.sql("DELETE FROM gdel.db.p WHERE day = 'd1'")
    assert(spark.sql("SELECT count(*) FROM gdel.db.p").head().getLong(0) == 20)
    assert(spark.sql("SELECT DISTINCT day FROM gdel.db.p").collect()
      .map(_.getString(0)).sorted.toSeq === Seq("d0", "d2"))
    // metadata-only: NO new part file was written anywhere
    val partsAfter = names("p").filter(_.contains("part-")).toSet
    assert(partsAfter == partsBefore,
      s"partition delete must not rewrite: ${(partsAfter -- partsBefore).mkString(",")}")
  }

  test("a provably-no-match DELETE publishes nothing") {
    spark.sql("CREATE TABLE gdel.db.n (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gdel.db.n SELECT id, 'x' FROM range(10)")
    val gensBefore = names("n").filter(_.startsWith("_gen-")).toSet
    spark.sql("DELETE FROM gdel.db.n WHERE id > 1000000")
    assert(names("n").filter(_.startsWith("_gen-")).toSet == gensBefore,
      "no-op delete must not publish a generation")
    assert(spark.sql("SELECT count(*) FROM gdel.db.n").head().getLong(0) == 10)
  }

  test("DELETE without WHERE empties the table (and COUNT(*) still works)") {
    spark.sql("CREATE TABLE gdel.db.e (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gdel.db.e SELECT id, 'x' FROM range(10)")
    spark.sql("DELETE FROM gdel.db.e")
    assert(spark.sql("SELECT count(*) FROM gdel.db.e").head().getLong(0) == 0,
      "pushed COUNT(*) over an empty generation must be 0, not NULL")
    assert(spark.sql("SELECT * FROM gdel.db.e").collect().isEmpty)
  }

  test("crash states stay invisible and are swept by the next commit") {
    spark.sql("CREATE TABLE gdel.db.c (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gdel.db.c SELECT id, 'x' FROM range(20)")
    // a crashed delete attempt: staged rewrite output, no generation swap
    val tdir = new java.io.File(s"$rootDir/db/c")
    val w = new java.io.PrintWriter(
      new java.io.File(tdir, ".staging-delcrash99-00000"), "UTF-8")
    w.println("999\tghost"); w.close()
    assert(spark.sql("SELECT count(*) FROM gdel.db.c").head().getLong(0) == 20,
      "staged rewrite output must stay invisible")
    spark.sql("DELETE FROM gdel.db.c WHERE id < 5") // next commit sweeps
    assert(spark.sql("SELECT count(*) FROM gdel.db.c").head().getLong(0) == 15)
    assert(!names("c").exists(_.contains(".staging-")),
      s"crashed delete staging must be swept: ${names("c").mkString(",")}")
  }

  test("non-translatable predicates fall back to the row-level rewrite") {
    // pre-row-level-operations this was refused loudly; with
    // SupportsRowLevelOperations the group-based copy-on-write rewrite
    // (GraftTsvRowLevelOperation) handles any predicate Spark can
    // evaluate — the translatable ones above still take the
    // GraftTsvDelete metadata fast path (file-identity assertions in
    // "only files whose stats can match are rewritten" prove it)
    spark.sql("CREATE TABLE gdel.db.u (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gdel.db.u SELECT id, concat('v', id) FROM range(10)")
    spark.sql("DELETE FROM gdel.db.u WHERE id % 2 = 0")
    assert(spark.sql("SELECT id FROM gdel.db.u ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("canDeleteWhere surface: pushdown-shaped filters yes, others no") {
    import org.apache.spark.sql.sources._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    assert(graft.sources.GraftTsvDelete.canDelete(schema, header = false,
      Array(GreaterThan("id", 5L), In("v", Array("a", "b")), IsNotNull("v"),
        AlwaysTrue())))
    assert(!graft.sources.GraftTsvDelete.canDelete(schema, header = false,
      Array(StringContains("v", "x"))))
    assert(!graft.sources.GraftTsvDelete.canDelete(schema, header = true,
      Array(GreaterThan("id", 5L))), "headered tables are refused")
  }
}
