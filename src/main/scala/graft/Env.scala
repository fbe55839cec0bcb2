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
        // `local[0]` fails deep inside Spark with an unrelated-looking
        // error and shuffle.partitions=0 is nonsense — fail at the knob
        if (n < 1) throw new IllegalArgumentException(
          s"env var $name must be >= 1 or '*', got '$v'")
        (n.toString, n)
      case None       => (default.toString, default)
    }

  /** Append one timestamped JSON line to the frozen bench history
    * (`BENCH/history.jsonl` unless SPARK_GRAFT_BENCH_HISTORY): the
    * mutable `last_*.json` artifacts are overwritten by every run (three
    * rounds of doc-vs-artifact drift), so every bench/scaling run ALSO
    * appends an immutable line here and docs cite the frozen line.
    * `json` must be a one-line `{...}` object; best-effort, never
    * silent. */
  def appendHistory(json: String): Unit = {
    val histFile =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "BENCH/history.jsonl")
    try {
      val hp = java.nio.file.Paths.get(histFile)
      if (hp.getParent != null) java.nio.file.Files.createDirectories(hp.getParent)
      val line = s"""{"ts":${System.currentTimeMillis()},""" + json.drop(1) + "\n"
      java.nio.file.Files.write(hp,
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not append $histFile: $e")
    }
  }
}
