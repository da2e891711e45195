package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission

/** Local-filesystem implementation for the harness environment
  * (registered as `spark.hadoop.fs.file.impl` in [[graft.Sessions]]).
  *
  * Two pathologies of Hadoop's default local FS in a sandbox without
  * libhadoop.so, both measured with the executor sampler on the bench
  * (guide §1.1 — empirical loop):
  *
  *  1. `LocalFileSystem` is checksummed: every created file also
  *     creates and writes a `.crc` sidecar — twice the creates, on a
  *     filesystem where create() profiles at ~5-15 ms.
  *  2. Without native IO, `RawLocalFileSystem.setPermission` shells
  *     out (`fork`+`exec chmod`) — once per created file and created
  *     directory, ~10 ms a fork, visible as `ProcessImpl.forkAndExec
  *     <= HadoopOutputFile.create` in task stacks.
  *
  * Extending the RAW local FS drops the sidecars; overriding
  * `setPermission` to a no-op drops the forks (files keep the JVM's
  * umask-derived permissions, which is what a single-user sandbox
  * wants anyway). This class only ever serves `file:` URIs — cluster
  * deployments talk to object stores/HDFS and never load it, so
  * nothing here tunes the engine itself to local mode. */
final class FastLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
