package graft

/** Env-var parsing that names the variable on failure. A bare
  * `sys.env(...).toInt` crashes a whole bench/job run with an
  * uncontextualized NumberFormatException — worth a real message when
  * the knob travels through shells, cron files and CI configs. */
object Env {
  def int(name: String, default: Int): Int =
    sys.env.get(name).map { v =>
      try v.trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"env var $name must be an integer, got '$v'")
      }
    }.getOrElse(default)

  def long(name: String, default: Long): Long =
    sys.env.get(name).map { v =>
      try v.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"env var $name must be an integer, got '$v'")
      }
    }.getOrElse(default)

  /** A `local[N]` thread-count spec: an integer, or `*` (all cores —
    * passed through to Spark's master string). Returns the spec plus the
    * resolved core count (`*` → availableProcessors) so callers can size
    * `spark.sql.shuffle.partitions`, which must be numeric. */
  def cpus(name: String, default: Int): (String, Int) =
    sys.env.get(name).map(_.trim) match {
      case Some("*")  => ("*", Runtime.getRuntime.availableProcessors())
      case Some(v)    =>
        val n = try v.toInt
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"env var $name must be an integer or '*', got '$v'")
          }
        (n.toString, n)
      case None       => (default.toString, default)
    }
}
