package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Object-store-portable filesystem primitives: every DATA-PATH
  * listing, existence check and delete in the library goes through
  * the Hadoop `FileSystem` API — the same abstraction every parquet
  * read/write in the session already resolves through — never
  * `java.io.File`. On a real lake (s3a:/hdfs:/abfs:) a POSIX listing
  * silently returns nothing and a POSIX delete silently no-ops; the
  * `FileSystem` calls resolve the scheme from the session's Hadoop
  * configuration, so the manifest/vacuum/snapshot code is identical
  * on file:, hdfs: and s3a: URIs.
  *
  * Remaining `java.io`/NIO uses are pinned by FsPortabilitySpec to
  * the LOCAL-BY-CONSTRUCTION harness spots only (gate tmp staging,
  * Verify's local out dir, the FileStreamSource mtime choreography —
  * `setLastModified` has no object-store analogue; S3A `setTimes` is
  * unsupported — and the embedded-Derby JDBC fixtures).
  */
object Fs {

  /** The (FileSystem, Path) pair `path` resolves to under the
    * session's Hadoop configuration.
    */
  def resolve(s: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Immediate children of `dir` as (name, fully-qualified URI
    * string) — the qualified form feeds straight back into
    * `spark.read.parquet`, on any scheme. Empty if `dir` is absent.
    */
  def listChildren(s: SparkSession, dir: String): Seq[(String, String)] = {
    val (fs, p) = resolve(s, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(st => (st.getPath.getName, st.getPath.toString))
  }

  /** Grandchildren of `dir` (two-level listing — the
    * `data/<batch>/<part file>` lake layout), fully qualified.
    */
  def listGrandchildren(s: SparkSession, dir: String): Seq[(String, String)] =
    listChildren(s, dir).flatMap { case (_, child) => listChildren(s, child) }

  def exists(s: SparkSession, path: String): Boolean = {
    val (fs, p) = resolve(s, path)
    fs.exists(p)
  }

  /** Non-recursive delete of one file. */
  def delete(s: SparkSession, path: String): Boolean = {
    val (fs, p) = resolve(s, path)
    fs.delete(p, false)
  }
}
