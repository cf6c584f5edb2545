package graft.iceberg

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Driver-side Hadoop configuration resolution: prefer the active Spark
  * session's conf (it carries the user's fs.* settings and credentials for
  * hdfs:// / s3a:// paths) and fall back to a bare `Configuration` only
  * when no session exists (e.g. plain-JVM CLI usage, where local files are
  * the norm). A fresh `new Configuration()` at an hdfs/s3a call site would
  * silently ignore the session's settings. */
object HadoopConfs {
  def active(): Configuration =
    scala.util.Try(SparkSession.active.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  def fileSystemFor(p: String): org.apache.hadoop.fs.FileSystem =
    fileSystemFor(new org.apache.hadoop.fs.Path(p), active())

  /** Executor-side variant: resolve against a SHIPPED configuration (see
    * [[SerializableHadoopConf]]) — `SparkSession.active` does not exist on
    * executors, and a fresh `new Configuration()` there would drop the
    * session's fs.* settings and credentials. `FileSystem.get` caches per
    * (scheme, authority, ugi), so per-file calls are cheap. */
  def fileSystemFor(p: org.apache.hadoop.fs.Path,
      conf: Configuration): org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(p.toUri match {
      case u if u.getScheme == null => new java.net.URI("file:///")
      case u => u
    }, conf)
}
