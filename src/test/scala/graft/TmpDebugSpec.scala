package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TmpDebugSpec extends SparkSuite {
  test("debug count loop") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("day", StringType), StructField("grp", StringType)))
    val out = new java.io.File(
      Files.createTempDirectory("graft_dbg6").toFile, "t").getAbsolutePath
    spark.range(120).select(col("id"),
      concat(lit("v"), col("id")).as("v"),
      concat(lit("2024-01-0"), (col("id") % 3 + 1)).as("day"),
      concat(lit("g"), (col("id") % 4)).as("grp"))
      .repartition(3).write.format("graft-tsv")
      .option("partition.columns", "day,grp").mode("overwrite").save(out)
    val back = spark.read.format("graft-tsv").schema(schema)
      .option("partition.columns", "day,grp").load(out)
    back.collect()
    val q = back.filter(col("grp") === "g3")
    val results = (1 to 20).map(_ => q.count())
    println("DBGL RESULTS=" + results.mkString(","))
  }
}
