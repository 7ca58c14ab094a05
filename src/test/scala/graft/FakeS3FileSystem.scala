package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** In-JVM S3 stand-in for writer tests — the moto-mock pattern of the
  * reference's unit tests (tests/unit/test_compute_regional_timeseries.py:31
  * `@mock_s3`) without any AWS dependency: a Hadoop FileSystem registered
  * for the `s3a://` scheme via `fs.s3a.impl` that stores each object at the
  * local path of its key (the bucket authority is dropped, exactly like
  * RawLocalFileSystem's pathToFile ignores authority). Tests point the
  * bucket's key prefix at a temp directory, run the REAL
  * Writer.forDest("s3", "s3a://bucket...") → HadoopFsWriter executor code
  * path, and assert the resulting object tree with plain java.nio.
  */
class FakeS3FileSystem extends RawLocalFileSystem {
  private var fsUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    fsUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
    super.initialize(name, conf)
  }

  override def getScheme: String = "s3a"
  // the RawLocalFileSystem CONSTRUCTOR calls getUri (via
  // getInitialWorkingDirectory → makeQualified) before any Scala field
  // initializer or initialize() runs — guard with the bare scheme
  override def getUri: URI =
    if (fsUri == null) URI.create("s3a:///") else fsUri
}
