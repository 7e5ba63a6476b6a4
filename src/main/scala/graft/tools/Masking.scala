package graft.tools

/** Log hygiene — the reference masks credential-shaped config keys before
  * logging the job configuration (`core/.../Engine.java:110-120`:
  * `*password*` / `*accessKey*` → asterisks). Same contract here for any
  * config map the engine prints. */
object Masking {
  private val Sensitive = "(?i).*(password|accesskey|secret|token).*".r

  def mask(conf: Map[String, String]): Map[String, String] =
    conf.map {
      case (k, _) if Sensitive.matches(k) => k -> "*****"
      case kv => kv
    }
}
