package graft.queries

import org.apache.spark.sql.SparkSession

/** Signature-keyed persistence for DERIVED ARTIFACTS the engine builds
  * once and serves many times — the ANN index (q_ivf_build/q_ivf_probe)
  * and the trained BPE merge table (q_bpe_encode).
  *
  * The artifact root is a STABLE temp path keyed by the source parquet's
  * length+mtime (the SourceParity.roundTrip scheme): regenerated testdata
  * can never be served a stale artifact, because a signature change simply
  * keys a fresh root. The done-marker is written only after EVERY build
  * step committed, so a crashed build is rebuilt, never half-read. In
  * production the root would be a table location in the catalog; the
  * lifecycle (signature → build-or-reuse → marker) is the part that
  * carries over.
  */
object ArtifactStore {

  /** Stable artifact root for (source table, artifact name). */
  def root(dir: String, table: String, name: String): String = {
    val src = new java.io.File(graft.sources.Tables.path(dir, table))
    val sig = java.lang.Long.toHexString(
      src.length * 1000003L + src.lastModified)
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${name}_${Integer.toHexString(dir.hashCode)}_$sig").toString
  }

  private def marker(root: String) =
    new org.apache.hadoop.fs.Path(root, "_GRAFT_ARTIFACT_DONE")

  /** Always build fresh (for the query whose WRITE path is the exhibit):
    * wipe the root, run `build`, then publish the marker. */
  def rebuild(spark: SparkSession, dir: String, table: String, name: String)(
      build: String => Unit): String = {
    val r = root(dir, table, name)
    val p = new org.apache.hadoop.fs.Path(r)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    build(r)
    fs.create(marker(r), true).close()
    r
  }

  /** Reuse a completed build, else build — the serving path's resolution.
    * (Artifact content must be deterministic in the source, so build
    * order across queries cannot change results.) */
  def ensure(spark: SparkSession, dir: String, table: String, name: String)(
      build: String => Unit): String = {
    val r = root(dir, table, name)
    val fs = marker(r).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker(r))) r
    else rebuild(spark, dir, table, name)(build)
  }
}
