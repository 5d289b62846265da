package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Row-level MERGE INTO / UPDATE on graft-tsv tables
  * (SupportsRowLevelOperations, group-based copy-on-write — value parity
  * end-to-end: q_dsv2_merge / q_dsv2_update). Proves:
  *  - all three MERGE arms (UPDATE / DELETE / INSERT) apply exactly;
  *  - runtime group filtering rewrites ONLY the files containing matched
  *    rows (unaffected files keep their identity in the new manifest);
  *  - UPDATE applies through SQL, including moving a row across hive
  *    partitions (the rewrite routes it to its new leaf);
  *  - a no-op MERGE publishes nothing; crash states stay invisible and
  *    are swept; `_file` is queryable as a metadata column;
  *  - a DELETE whose predicate exceeds the pushdown surface now takes
  *    the same rewrite path instead of failing (Dsv2DeleteSpec pins the
  *    translatable DELETEs still take the metadata fast path). */
class Dsv2MergeSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_merge").toString
  spark.conf.set("spark.sql.catalog.gmrg",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmrg.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gmrg.db")

  private def names(table: String): Seq[String] = {
    def walk(d: java.io.File, rel: String): Seq[String] =
      d.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory) walk(f, rel + f.getName + "/")
        else Seq(rel + f.getName)
      }
    walk(new java.io.File(s"$rootDir/db/$table"), "")
  }

  test("MERGE INTO applies update, delete and insert arms exactly") {
    spark.sql("CREATE TABLE gmrg.db.t (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gmrg.db.t SELECT id, concat('v', id) FROM range(10)")
    // source: ids 5..14 — 5..9 match (odd → update, even → delete),
    // 10..14 don't (insert)
    spark.range(5, 15).select(col("id"), concat(lit("s"), col("id")).as("sv"))
      .createOrReplaceTempView("mrg_src")
    spark.sql("""
      MERGE INTO gmrg.db.t t USING mrg_src s ON t.id = s.id
      WHEN MATCHED AND s.id % 2 = 1 THEN UPDATE SET v = s.sv
      WHEN MATCHED THEN DELETE
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, concat('n', s.sv))
    """)
    val got = spark.sql("SELECT id, v FROM gmrg.db.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want =
      (0L to 4L).map(i => (i, s"v$i")) ++          // untouched
      Seq((5L, "s5"), (7L, "s7"), (9L, "s9")) ++   // updated (6, 8 deleted)
      (10L to 14L).map(i => (i, s"ns$i"))          // inserted
    assert(got === want.sortBy(_._1))
    assert(!names("t").exists(_.contains(".staging-")),
      s"merge staging must be swept: ${names("t").mkString(",")}")
  }

  test("runtime group filtering rewrites only the files with matched rows") {
    spark.sql("CREATE TABLE gmrg.db.g (id BIGINT, v STRING) USING `graft-tsv`")
    spark.range(200).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id"))
      .writeTo("gmrg.db.g").append()
    val partsBefore = names("g").filter(_.startsWith("part-")).toSet
    assert(partsBefore.size == 4, partsBefore.mkString(","))
    // source touches only ids 0..29 — covered by ONE file's range
    spark.range(30).select(col("id"), lit("upd").as("sv"))
      .createOrReplaceTempView("mrg_small")
    spark.sql("""
      MERGE INTO gmrg.db.g t USING mrg_small s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.sv
    """)
    assert(spark.sql("SELECT count(*) FROM gmrg.db.g WHERE v = 'upd'")
      .head().getLong(0) == 30)
    assert(spark.sql("SELECT count(*) FROM gmrg.db.g").head().getLong(0) == 200)
    val gen = names("g").filter(_.startsWith("_gen-")).max
    val fs = new org.apache.hadoop.fs.Path(rootDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val referenced = graft.sources.GraftTsvManifest.read(fs,
      new org.apache.hadoop.fs.Path(s"$rootDir/db/g/$gen")).toSet
    assert((referenced & partsBefore).size == 3,
      s"3 of 4 original files must be carried unrewritten: $referenced")
  }

  test("UPDATE applies through SQL and moves rows across partitions") {
    spark.sql("""CREATE TABLE gmrg.db.u (id BIGINT, day STRING)
      USING `graft-tsv` PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO gmrg.db.u
      SELECT id, concat('d', id % 3) FROM range(30)""")
    // value rewrite within a partition
    spark.sql("UPDATE gmrg.db.u SET id = id + 1000 WHERE day = 'd1' AND id < 10")
    val moved = spark.sql("SELECT id FROM gmrg.db.u WHERE id >= 1000")
      .collect().map(_.getLong(0)).sorted
    assert(moved.toSeq === Seq(1001L, 1004L, 1007L))
    // partition-value rewrite: the row must land in the d9 leaf
    spark.sql("UPDATE gmrg.db.u SET day = 'd9' WHERE id = 1001")
    assert(spark.sql("SELECT day FROM gmrg.db.u WHERE id = 1001")
      .head().getString(0) == "d9")
    assert(names("u").exists(_.startsWith("day=d9/")),
      s"updated row must live in its new hive leaf: ${names("u").mkString(",")}")
    assert(spark.sql("SELECT count(*) FROM gmrg.db.u").head().getLong(0) == 30)
  }

  test("MERGE with NOT MATCHED BY SOURCE clauses (sync-to-source shape)") {
    // the full sync verb: update matched, insert new, delete rows the
    // source no longer carries — the "make the table equal the feed"
    // refresh a curation pipeline runs
    spark.sql("CREATE TABLE gmrg.db.s2 (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gmrg.db.s2 SELECT id, concat('v', id) FROM range(10)")
    spark.range(5, 15).select(col("id"), concat(lit("s"), col("id")).as("sv"))
      .createOrReplaceTempView("mrg_sync")
    spark.sql("""
      MERGE INTO gmrg.db.s2 t USING mrg_sync s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.sv
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.sv)
      WHEN NOT MATCHED BY SOURCE THEN DELETE
    """)
    val got = spark.sql("SELECT id, v FROM gmrg.db.s2 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === (5L to 14L).map(i => (i, s"s$i")),
      s"table must equal the source after sync: $got")
  }

  test("a replayed upsert MERGE is state-idempotent (foreachBatch contract)") {
    // q_stream_upsert's at-least-once guarantee: a micro-batch whose
    // MERGE already committed can be replayed after a crash. With
    // ABSOLUTE update values the replay's matched arm rewrites the same
    // values and the replay's not-matched arm finds its previous inserts
    // now matched — table state is a fixed point. (A generation IS
    // published by the replay — the rewrite reads and rewrites matched
    // files — but its CONTENT is identical.)
    spark.sql("CREATE TABLE gmrg.db.rp (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gmrg.db.rp SELECT id, concat('v', id) FROM range(6)")
    spark.range(3, 9).select(col("id"), concat(lit("s"), col("id")).as("sv"))
      .createOrReplaceTempView("mrg_replay")
    val upsert = """
      MERGE INTO gmrg.db.rp t USING mrg_replay s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.sv
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.sv)
    """
    spark.sql(upsert)
    val first = spark.sql("SELECT id, v FROM gmrg.db.rp ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    spark.sql(upsert) // the replay
    val second = spark.sql("SELECT id, v FROM gmrg.db.rp ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(first === (0L to 2L).map(i => (i, s"v$i")) ++
      (3L to 8L).map(i => (i, s"s$i")))
    assert(second === first, "replayed MERGE must be a state fixed point")
  }

  test("MERGE routes inserts and updates into hive partition leaves") {
    spark.sql("""CREATE TABLE gmrg.db.pm (id BIGINT, day STRING)
      USING `graft-tsv` PARTITIONED BY (day)""")
    spark.sql("""INSERT INTO gmrg.db.pm
      SELECT id, concat('d', id % 2) FROM range(10)""")
    // update moves id=0 to day d7; insert lands id=100 in day d8
    spark.sql("""SELECT * FROM VALUES (0L, 'd7'), (100L, 'd8') AS s(id, day)""")
      .createOrReplaceTempView("mrg_part")
    spark.sql("""
      MERGE INTO gmrg.db.pm t USING mrg_part s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET day = s.day
      WHEN NOT MATCHED THEN INSERT (id, day) VALUES (s.id, s.day)
    """)
    assert(spark.sql("SELECT day FROM gmrg.db.pm WHERE id = 0")
      .head().getString(0) == "d7")
    assert(names("pm").exists(_.startsWith("day=d7/")))
    assert(names("pm").exists(_.startsWith("day=d8/")))
    assert(spark.sql("SELECT count(*) FROM gmrg.db.pm").head().getLong(0) == 11)
    // partition pruning still works over the merged layout
    assert(spark.sql("SELECT count(*) FROM gmrg.db.pm WHERE day = 'd8'")
      .head().getLong(0) == 1)
  }

  test("a no-op MERGE publishes no generation") {
    spark.sql("CREATE TABLE gmrg.db.n (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gmrg.db.n SELECT id, 'x' FROM range(10)")
    val gensBefore = names("n").filter(_.startsWith("_gen-")).toSet
    spark.range(5000, 5010).select(col("id"), lit("y").as("sv"))
      .createOrReplaceTempView("mrg_none")
    spark.sql("""
      MERGE INTO gmrg.db.n t USING mrg_none s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.sv
    """)
    assert(names("n").filter(_.startsWith("_gen-")).toSet == gensBefore,
      "no-op merge must not publish a generation")
    assert(spark.sql("SELECT count(*) FROM gmrg.db.n").head().getLong(0) == 10)
  }

  test("non-pushdown DELETE predicates take the rewrite path") {
    spark.sql("CREATE TABLE gmrg.db.d (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gmrg.db.d SELECT id, concat('v', id) FROM range(10)")
    spark.sql("DELETE FROM gmrg.db.d WHERE id % 2 = 0") // not pushdown-translatable
    val left = spark.sql("SELECT id FROM gmrg.db.d ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(left === Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("crash states stay invisible; _file metadata column is queryable") {
    spark.sql("CREATE TABLE gmrg.db.c (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gmrg.db.c SELECT id, 'x' FROM range(20)")
    // a crashed merge attempt: staged rewrite output, no generation swap
    val w = new java.io.PrintWriter(
      new java.io.File(s"$rootDir/db/c", ".staging-mrgcrash77-0-1-aa-0"), "UTF-8")
    w.println("999\tghost"); w.close()
    assert(spark.sql("SELECT count(*) FROM gmrg.db.c").head().getLong(0) == 20,
      "staged merge output must stay invisible")
    // `_file` resolves as a metadata column and matches the listed part
    val files = spark.sql("SELECT DISTINCT _file FROM gmrg.db.c")
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("part-")), files.mkString(","))
    // next commit sweeps the crash garbage
    spark.range(20, 22).select(col("id"), lit("y").as("sv"))
      .createOrReplaceTempView("mrg_c")
    spark.sql("""
      MERGE INTO gmrg.db.c t USING mrg_c s ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.sv)
    """)
    assert(spark.sql("SELECT count(*) FROM gmrg.db.c").head().getLong(0) == 22)
    assert(!names("c").exists(_.contains(".staging-")),
      s"crashed merge staging must be swept: ${names("c").mkString(",")}")
  }
}
