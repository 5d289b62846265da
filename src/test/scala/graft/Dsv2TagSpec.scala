package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Named snapshot tags on the graft catalog (`CALL g.system.tag/untag`
  * + `VERSION AS OF '<name>'`): a tag names a retained generation in the
  * table descriptor and PINS it — every publish path's retention sweep
  * keeps the tagged manifest and its parts past the window, so the name
  * stays resolvable until untagged. Proves:
  *  - tag → VERSION AS OF '<name>' reads exactly the tagged snapshot;
  *  - pinning: with retain=1, a tagged generation survives multiple
  *    later commits (both by name and by number) while untagged
  *    generations are reclaimed on schedule;
  *  - untag releases the pin — the next commit's sweep reclaims it and
  *    the name stops resolving, with the error naming surviving tags;
  *  - rollback can target a tag-pinned generation outside the window;
  *  - guards: all-digit names, unknown generations, unknown tags. */
class Dsv2TagSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_tag").toString
  spark.conf.set("spark.sql.catalog.gtag",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gtag.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gtag.db")

  private def insert(table: String, lo: Int, hi: Int): Unit =
    spark.range(lo, hi).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .writeTo(s"gtag.db.$table").append()

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  private def gensOnDisk(table: String): Set[Long] =
    new java.io.File(s"$rootDir/db/$table").listFiles().toSeq
      .flatMap(f => graft.sources.GraftTsvManifest.genNumber(f.getName)).toSet

  test("tag pins a generation past retention; untag releases it") {
    spark.sql("CREATE TABLE gtag.db.t (id BIGINT, v STRING) USING `graft-tsv`")
    insert("t", 0, 3)  // gen 1
    val r = spark.sql(
      "CALL gtag.system.tag(`table` => 'db.t', tag => 'v1', generation => 1)")
      .collect().head
    assert(r.getString(0) == "v1" && r.getLong(1) == 1L && !r.getBoolean(2))

    insert("t", 3, 6)  // gen 2
    insert("t", 6, 9)  // gen 3: default retain=1 keeps gen 2; gen 1 only via pin
    assert(gensOnDisk("t") == Set(1L, 2L, 3L),
      "tagged gen 1 must survive the retention sweep")
    assert(ids(spark.sql("SELECT * FROM gtag.db.t VERSION AS OF 'v1'")) ==
      Set(0L, 1L, 2L))
    assert(ids(spark.sql("SELECT * FROM gtag.db.t VERSION AS OF 1")) ==
      Set(0L, 1L, 2L), "a pinned generation must also resolve by number")
    assert(ids(spark.table("gtag.db.t")) == (0L until 9L).toSet)

    // re-tag moves the name and reports the replacement
    val r2 = spark.sql(
      "CALL gtag.system.tag(`table` => 'db.t', tag => 'v1', generation => 2)")
      .collect().head
    assert(r2.getBoolean(2), "moving an existing tag must report replaced=true")
    spark.sql("CALL gtag.system.tag(`table` => 'db.t', tag => 'v0', generation => 1)")

    // untag v0: gen 1 unpins; the NEXT commit reclaims it (untag itself
    // deletes nothing)
    val u = spark.sql(
      "CALL gtag.system.untag(`table` => 'db.t', tag => 'v0')").collect().head
    assert(u.getLong(1) == 1L)
    assert(gensOnDisk("t").contains(1L), "untag must not delete anything")
    insert("t", 9, 12) // gen 4: sweep reclaims gen 1 (unpinned, outside window)
    assert(gensOnDisk("t") == Set(2L, 3L, 4L),
      s"gen 1 should be reclaimed, gen 2 stays pinned via v1: ${gensOnDisk("t")}")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM gtag.db.t VERSION AS OF 'v0'").collect())
    assert(e.getMessage.contains("no such tag") && e.getMessage.contains("v1"),
      e.getMessage)
  }

  test("rollback can target a tag-pinned generation outside the window") {
    spark.sql("CREATE TABLE gtag.db.rb (id BIGINT, v STRING) USING `graft-tsv`")
    insert("rb", 0, 2)   // gen 1
    spark.sql("CALL gtag.system.tag(`table` => 'db.rb', tag => 'good', generation => 1)")
    insert("rb", 2, 4)   // gen 2
    insert("rb", 4, 6)   // gen 3 — gen 1 survives only through the tag
    val res = spark.sql(
      "CALL gtag.system.rollback(`table` => 'db.rb', to_generation => 1)")
      .collect().head
    assert(res.getLong(0) == 3L && res.getLong(1) == 4L)
    assert(ids(spark.table("gtag.db.rb")) == Set(0L, 1L))
  }

  test("guards: all-digit names, unknown generations, unknown tags") {
    spark.sql("CREATE TABLE gtag.db.g (id BIGINT, v STRING) USING `graft-tsv`")
    insert("g", 0, 2)
    val bad = intercept[Exception](spark.sql(
      "CALL gtag.system.tag(`table` => 'db.g', tag => '42', generation => 1)"))
    assert(bad.getMessage.contains("all digits"), bad.getMessage)
    val gone = intercept[Exception](spark.sql(
      "CALL gtag.system.tag(`table` => 'db.g', tag => 'x', generation => 9)"))
    assert(gone.getMessage.contains("not on disk"), gone.getMessage)
    val none = intercept[Exception](spark.sql(
      "CALL gtag.system.untag(`table` => 'db.g', tag => 'nope')"))
    assert(none.getMessage.contains("no tag 'nope'"), none.getMessage)
  }
}
