package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generation time travel on graft-tsv: commit cleanup retains the newest
  * `retain.generations` superseded manifests (floor 1 = the concurrent-
  * reader safety minimum), a pinned `generation` read option resolves any
  * retained manifest, and the catalog surfaces it as SQL VERSION AS OF —
  * reproducible snapshots of a mutating table without copying data. */
class Dsv2TimeTravelSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def tmp() = Files.createTempDirectory("graft_tt").toString

  private def write(out: String, rows: Seq[(Long, String)],
      mode: String = "append", retain: Option[Int] = None): Unit = {
    val s = spark
    import s.implicits._
    val w = rows.toDF("id", "v").coalesce(1).write.format("graft-tsv").mode(mode)
    retain.fold(w)(r => w.option("retain.generations", r.toString)).save(out)
  }

  private def readGen(out: String, gen: Option[Long]): Set[(Long, String)] = {
    val r = spark.read.format("graft-tsv").schema(schema)
    gen.fold(r)(g => r.option("generation", g.toString)).load(out)
      .collect().map(row => (row.getLong(0), row.getString(1))).toSet
  }

  test("default retention keeps exactly the just-superseded generation") {
    val out = tmp()
    write(out, Seq((1L, "a")))           // gen 1
    write(out, Seq((2L, "b")))           // gen 2; gen 1 retained
    assert(readGen(out, Some(1L)) == Set((1L, "a")))
    assert(readGen(out, Some(2L)) == Set((1L, "a"), (2L, "b")))
    assert(readGen(out, None) == Set((1L, "a"), (2L, "b")))
    write(out, Seq((3L, "c")))           // gen 3; gen 1 reclaimed
    assert(readGen(out, Some(2L)) == Set((1L, "a"), (2L, "b")))
    val e = intercept[Exception](readGen(out, Some(1L)))
    assert(e.getMessage.contains("not available") &&
      e.getMessage.contains("retain.generations"), e.getMessage)
  }

  test("deeper retention keeps a readable history across appends AND overwrites") {
    val out = tmp()
    write(out, Seq((1L, "a")), retain = Some(3))                // gen 1
    write(out, Seq((2L, "b")), retain = Some(3))                // gen 2
    write(out, Seq((9L, "z")), mode = "overwrite", retain = Some(3)) // gen 3
    // the overwrite truncated the VISIBLE set, but retained generations
    // still resolve their own manifests — including the parts the
    // overwrite superseded
    assert(readGen(out, Some(1L)) == Set((1L, "a")))
    assert(readGen(out, Some(2L)) == Set((1L, "a"), (2L, "b")))
    assert(readGen(out, Some(3L)) == Set((9L, "z")))
    assert(readGen(out, None) == Set((9L, "z")))
  }

  test("a retention-window slide reclaims the oldest generation's exclusive files only") {
    val out = tmp()
    write(out, Seq((1L, "a")), retain = Some(2))  // gen 1
    write(out, Seq((2L, "b")), retain = Some(2))  // gen 2
    write(out, Seq((3L, "c")), retain = Some(2))  // gen 3: window keeps gens 1,2
    write(out, Seq((4L, "d")), retain = Some(2))  // gen 4: window slides, gen 1 reclaimed
    assert(readGen(out, Some(2L)) == Set((1L, "a"), (2L, "b")),
      "gen 2 still references gen-1-era parts; retention must keep shared files")
    assert(readGen(out, Some(3L)) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    val e = intercept[Exception](readGen(out, Some(1L)))
    assert(e.getMessage.contains("not available"), e.getMessage)
    // shared part files survive as long as ANY retained manifest lists
    // them — only manifests fell out of the window, no data loss above
  }

  test("generation pin on a plain directory (no manifest history) fails loud") {
    val out = tmp()
    val s = spark
    import s.implicits._
    // bare CSV-ish file, no commit protocol
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.option("sep", "\t").mode("overwrite").csv(out)
    val e = intercept[Exception](readGen(out, Some(1L)))
    assert(e.getMessage.contains("no generation manifests"), e.getMessage)
  }

  test("catalog time travel: TBLPROPERTIES retention, VERSION AS OF, ALTER SET") {
    val s = spark
    import s.implicits._
    val rootDir = Files.createTempDirectory("graft_tt_cat").toString
    s.conf.set("spark.sql.catalog.gtt",
      classOf[graft.sources.GraftTsvCatalog].getName)
    s.conf.set("spark.sql.catalog.gtt.root", rootDir)
    s.sql("CREATE NAMESPACE gtt.db")
    s.sql("""CREATE TABLE gtt.db.t (id BIGINT, v STRING) USING `graft-tsv`
      TBLPROPERTIES ('retain.generations' = '3')""")
    Seq((1L, "a")).toDF("id", "v").writeTo("gtt.db.t").append()      // gen 1
    Seq((2L, "b")).toDF("id", "v").writeTo("gtt.db.t").append()      // gen 2
    s.sql("INSERT OVERWRITE gtt.db.t VALUES (9, 'z')")               // gen 3
    def q(sql: String) = s.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(q("SELECT * FROM gtt.db.t") == Set((9L, "z")))
    assert(q("SELECT * FROM gtt.db.t VERSION AS OF 1") == Set((1L, "a")))
    assert(q("SELECT * FROM gtt.db.t VERSION AS OF 2") == Set((1L, "a"), (2L, "b")))
    assert(q("SELECT * FROM gtt.db.t VERSION AS OF 3") == Set((9L, "z")))
    // non-numeric version and unknown property fail loudly
    val e1 = intercept[Exception](s.sql("SELECT * FROM gtt.db.t VERSION AS OF 'x'"))
    assert(e1.getMessage.contains("numeric generation"), e1.getMessage)
    val e2 = intercept[Exception](
      s.sql("ALTER TABLE gtt.db.t SET TBLPROPERTIES ('nope' = '1')"))
    assert(e2.getMessage.contains("unsupported table property"), e2.getMessage)
    val e3 = intercept[Exception](
      s.sql("ALTER TABLE gtt.db.t SET TBLPROPERTIES ('retain.generations' = '0')"))
    assert(e3.getMessage.contains(">= 1"), e3.getMessage)
    // narrowing retention via DDL takes effect on the NEXT commit
    s.sql("ALTER TABLE gtt.db.t SET TBLPROPERTIES ('retain.generations' = '1')")
    Seq((4L, "d")).toDF("id", "v").writeTo("gtt.db.t").append()      // gen 4
    assert(q("SELECT * FROM gtt.db.t VERSION AS OF 3") == Set((9L, "z")))
    val e4 = intercept[Exception](q("SELECT * FROM gtt.db.t VERSION AS OF 1"))
    assert(e4.getMessage.contains("not available"), e4.getMessage)
  }
}
