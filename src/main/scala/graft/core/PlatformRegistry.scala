package graft.core

import java.nio.file.{Files, Path, Paths}
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Named-platform registry (reference: ixmp `Config.add_platform` /
  * `remove_platform` / `get_platform_info`, _config.py:374-424, and the
  * `ixmp platform add|remove|list` CLI group, cli.py:332-360).
  *
  * Re-cut for this engine: a platform is a named store root. The
  * registry is a properties file (`name = storeRoot`; the reserved name
  * `default` holds the NAME of the default platform, mirroring the
  * reference's `("default", name)` alias entry). Location:
  * `$GRAFT_CONFIG` if set, else `~/.graft/platforms.properties` —
  * driver-side config, like the reference's per-user config.json.
  */
class PlatformRegistry(val path: Path) {

  private def load(): Properties = {
    val p = new Properties()
    if (Files.exists(path)) {
      val in = Files.newInputStream(path)
      try p.load(in) finally in.close()
    }
    p
  }

  private def save(p: Properties): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val out = Files.newOutputStream(path)
    try p.store(out, "graft platform registry") finally out.close()
  }

  /** Register `name` -> `storeRoot`. The first platform added becomes
    * the default, like the reference's initial config. */
  def add(name: String, storeRoot: String, makeDefault: Boolean = false): Unit = {
    require(name != "default", "register a named platform, then set it as default")
    val p = load()
    p.setProperty(name, storeRoot)
    if (makeDefault || p.getProperty("default") == null) p.setProperty("default", name)
    save(p)
  }

  def remove(name: String): Unit = {
    val p = load()
    require(p.remove(name) != null, s"platform '$name' is not registered")
    if (name == p.getProperty("default")) p.remove("default")
    save(p)
  }

  def setDefault(name: String): Unit = {
    val p = load()
    require(p.getProperty(name) != null, s"platform '$name' is not registered")
    p.setProperty("default", name)
    save(p)
  }

  /** (name, storeRoot) pairs, default first-marked by [[defaultName]]. */
  def list(): Seq[(String, String)] = {
    val p = load()
    p.stringPropertyNames().asScala.toSeq.filter(_ != "default").sorted
      .map(n => n -> p.getProperty(n))
  }

  def defaultName: Option[String] = Option(load().getProperty("default"))

  /** Resolve a platform name ("default" follows the alias) to its
    * store root. */
  def resolve(name: String): String = {
    val p = load()
    val target = if (name == "default") {
      val d = p.getProperty("default")
      require(d != null, s"no default platform configured in $path")
      d
    } else name
    val root = p.getProperty(target)
    require(root != null, s"platform '$target' is not registered in $path")
    root
  }
}

object PlatformRegistry {
  /** `$GRAFT_CONFIG` (a file path) or `~/.graft/platforms.properties`. */
  def defaultPath: Path = sys.env.get("GRAFT_CONFIG").map(Paths.get(_))
    .getOrElse(Paths.get(sys.props("user.home"), ".graft", "platforms.properties"))

  def apply(): PlatformRegistry = new PlatformRegistry(defaultPath)

  /** Open the named platform (reference `ixmp.Platform(name)`). */
  def open(spark: SparkSession, name: String = "default",
      registry: PlatformRegistry = PlatformRegistry()): Platform =
    new Platform(spark, registry.resolve(name))
}
