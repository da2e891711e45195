package graft.pipeline

import java.io.FileInputStream
import java.util.Properties
import scala.jdk.CollectionConverters._

/** A1 config scan: load app parameters under a key prefix — the engine's
  * analog of the reference's SSM `getParametersByPath('/fuelpriceguide/')`
  * (/root/reference/index.js:385-410), backed by a local properties file
  * (parameter stores are an I/O binding, not engine semantics). */
object Config {

  def load(path: String, prefix: String): Map[String, String] = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in)
    finally in.close()
    props.asScala.toMap.collect {
      case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
    }
  }
}
