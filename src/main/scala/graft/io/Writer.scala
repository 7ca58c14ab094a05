package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Output writers (S6-S9): one logical object per call, addressed by a
  * bucket-relative path — the reference's defining sink behavior is
  * materializing thousands of exactly-named small objects
  * (reference: flows/common.py:240-287, flows/data_pipeline.py:49-60).
  *
  * Implementations must be Serializable: they are constructed on the driver
  * from config and used inside `foreachPartition` on executors. Expensive
  * clients (S3) are held in per-JVM lazy singletons, mirroring the
  * reference's per-worker cached boto client.
  *
  * WRITE CONTRACT (WriterFaultSpec): `write` either materializes the
  * COMPLETE object at `path` or throws — a reader listing the destination
  * must never observe a truncated object under its final name. A thrown
  * error must propagate (GroupSink runs writers inside foreachPartition,
  * so a throw fails the Spark task, surfaces in the job result, and on a
  * cluster triggers task retry — writes are full-object overwrites, hence
  * idempotent, so at-least-once retry converges to the same bytes).
  * How the contract is met is per-backend: [[FileWriter]] publishes via
  * temp file + atomic rename; S3 object PUTs are visible only when
  * complete (the s3a committer semantics); plain hdfs:// or file:// URIs
  * through [[HadoopFsWriter]] expose a mid-write stream, so use
  * [[FileWriter]] for local trees that need the guarantee.
  */
trait Writer extends Serializable {
  def write(body: Array[Byte], path: String): Unit
  def write(body: String, path: String): Unit =
    write(body.getBytes(StandardCharsets.UTF_8), path)
}

/** No-op writer for profiling (S8; reference: flows/common.py:269-270). */
object NullWriter extends Writer {
  override def write(body: Array[Byte], path: String): Unit = ()
}

/** Local-filesystem writer (S7; reference: flows/common.py:274-287):
  * `{bucketDir}/{path}`, creating parent directories.
  *
  * Publishes atomically: the body lands in a task-unique `.inprogress`
  * sibling first and is MOVEd onto the final name, so a crash or thrown
  * error mid-write leaves at worst a temp file (ignorable by name), never
  * a truncated object under the final path — and concurrent task-retry
  * attempts of the same object cannot interleave bytes. */
final case class FileWriter(bucketDir: String) extends Writer {
  override def write(body: Array[Byte], path: String): Unit = {
    val p = Paths.get(bucketDir, path)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(
      p.getFileName.toString + ".inprogress-" + java.util.UUID.randomUUID())
    try {
      Files.write(tmp, body)
      try
        Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally Files.deleteIfExists(tmp)
  }
}

/** Object-store writer through the Hadoop FileSystem API (S6). With
  * `hadoop-aws` on the cluster classpath and `fs.s3a.*` credentials
  * configured, `baseUri = "s3a://bucket"` writes S3 objects; the same code
  * path serves hdfs:// or file:// URIs. The FileSystem handle is resolved
  * lazily once per executor JVM (reference keeps a per-worker boto client,
  * flows/common.py:240-265).
  *
  * @param confKV Hadoop configuration overrides (endpoint, credentials)
  *               carried as data so the task closure stays serializable.
  * @param rawLocal `file:`-scheme URIs ONLY (other schemes ignore it —
  *               s3a is unaffected): bypass Hadoop's checksummed
  *               LocalFileSystem, which writes a `.crc` sidecar per
  *               object — 2× creates, measured at exactly ½ fan-out
  *               throughput on the 1.64M-object tile rehearsal
  *               (SCALE.md round-16). The raw filesystem is also the
  *               honest analogue of the production S3 path (one PUT per
  *               object, integrity on the server side). The write
  *               contract is unchanged: a throw still propagates and
  *               fails the task (WriterFaultSpec).
  */
final case class HadoopFsWriter(baseUri: String,
    confKV: Map[String, String] = Map.empty,
    rawLocal: Boolean = false)
    extends Writer {
  @transient private lazy val fs = {
    val conf = new org.apache.hadoop.conf.Configuration()
    confKV.foreach { case (k, v) => conf.set(k, v) }
    val uri = java.net.URI.create(baseUri)
    val wantRaw = rawLocal && uri.getScheme == "file"
    if (wantRaw)
      conf.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    // FileSystem.get caches by scheme/authority only — if Spark already
    // opened this bucket with cluster config, the cached instance wins and
    // every confKV override (endpoint, credentials — or the raw-local
    // impl) is silently dropped. With overrides present, force a private
    // instance; it lives for the executor JVM (this val is a per-JVM lazy
    // singleton).
    if (confKV.nonEmpty || wantRaw)
      org.apache.hadoop.fs.FileSystem.newInstance(uri, conf)
    else org.apache.hadoop.fs.FileSystem.get(uri, conf)
  }
  override def write(body: Array[Byte], path: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$baseUri/$path"), true)
    try out.write(body)
    finally out.close()
  }
}

/** Writer dispatch by destination type (S9; reference:
  * flows/data_pipeline.py:49-60 WRITE_TYPES).
  *
  * `s3Conf` carries the `fs.s3a.*` Hadoop settings the s3 destination
  * assumes (endpoint, path-style access, credentials provider — see
  * doc/S3_WRITER.md for the contract); it reaches [[HadoopFsWriter]] as
  * plain data so executor-side FileSystem resolution sees the overrides
  * even when the cluster's cached FileSystem was opened with different
  * config. */
object Writer {
  def forDest(destType: String, bucket: String,
              s3Conf: Map[String, String] = Map.empty): Writer = destType match {
    case "file" => FileWriter(bucket)
    case "none" => NullWriter
    case "s3" =>
      // fail fast on a config typo instead of a deep runtime URI error;
      // normalize the common s3:// alias to Hadoop's s3a connector
      val scheme = Option(java.net.URI.create(bucket).getScheme).getOrElse(
        throw new IllegalArgumentException(
          s"s3 destination must be a URI with a scheme (e.g. s3a://bucket), got: '$bucket'"))
      val normalized =
        if (scheme == "s3") "s3a://" + bucket.stripPrefix("s3://") else bucket
      HadoopFsWriter(normalized, s3Conf)
    case other  => throw new IllegalArgumentException(s"unknown dest type: $other")
  }
}
