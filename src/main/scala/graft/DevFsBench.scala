package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Dev microbench: per-file create/write/close cost through the three
  * local FileSystem implementations (checksummed default, raw, raw
  * minus the permission fork) plus bare java.io — isolates the
  * syscall/fork cost of the harness filesystem from Spark noise. */
object DevFsBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300)
    val dir = java.nio.file.Files.createTempDirectory("fsbench").toString
    val conf = new Configuration()

    def bench(label: String, fs: org.apache.hadoop.fs.FileSystem): Unit = {
      val sub = new Path(s"$dir/$label")
      fs.mkdirs(sub)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        val out = fs.create(new Path(sub, s"f$i"), true)
        out.write(42); out.close()
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e6
      println(f"[fsbench] $label%-14s $n files: $dt%8.1f ms  (${dt / n}%6.2f ms/file)")
    }

    locally {
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) {
        val f = new java.io.FileOutputStream(s"$dir/raw$i")
        f.write(42); f.close()
        i += 1
      }
      println(f"[fsbench] java.io        $n files: ${(System.nanoTime() - t0) / 1e6}%8.1f ms  (${(System.nanoTime() - t0) / 1e6 / n}%6.2f ms/file)")
    }

    val checksummed = new org.apache.hadoop.fs.LocalFileSystem()
    checksummed.initialize(new java.net.URI("file:///"), conf)
    bench("local+crc", checksummed)

    val raw = new org.apache.hadoop.fs.RawLocalFileSystem()
    raw.initialize(new java.net.URI("file:///"), conf)
    bench("raw", raw)

    val fast = new graft.sources.FastLocalFs()
    fast.initialize(new java.net.URI("file:///"), conf)
    bench("fast", fast)

    org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
  }
}
