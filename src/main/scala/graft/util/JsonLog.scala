package graft.util

import java.time.{OffsetDateTime, ZoneId}
import java.time.format.DateTimeFormatter
import java.util.concurrent.atomic.AtomicReference

/** Structured (dict-shaped) logging — parity with the reference's
  * dict_logging module (/root/reference/pedsnetdcc/dict_logging.py),
  * where every log call passes a dict ({'msg': …, 'elapsed': …}) and a
  * filter renders it as JSON with level + RFC3339 timestamp attached
  * (DictLogFilter.json_filter, dict_logging.py:130-147), or as
  * plain/tty text.
  *
  * Spark-native shape: a tiny, dependency-free structured event
  * emitter. Jobs log key→value events; the sink renders one JSON
  * object per line (machine-parseable, exactly like the reference's
  * json output mode) with `level`, `time` (RFC3339), and `elapsed`
  * (zero-padded whole seconds since logger start —
  * dict_logging.py:30-37) merged in. Values are stringified the same
  * way the reference's `stringify` does for non-JSON-native types.
  * The default sink is stderr; tests inject a buffer.
  */
final class JsonLog(sink: String => Unit, clock: () => Long) {

  private val start = clock()

  def this(sink: String => Unit) = this(sink, () => System.currentTimeMillis())
  def this() = this(s => System.err.println(s))

  /** dict_logging.secs_since: whole seconds since start, 0-padded to 4. */
  private[util] def secsSince(): String =
    f"${(clock() - start) / 1000}%04d"

  /** dict_logging.strtime: RFC3339 local time with UTC offset. */
  private[util] def strtime(): String =
    OffsetDateTime.now(ZoneId.systemDefault())
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ssxxx"))

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** JSON-native numbers/booleans stay bare; everything else is
    * stringified (dict_logging.stringify).
    */
  private def render(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double if !d.isNaN && !d.isInfinite => d.toString
    case f: Float if !f.isNaN && !f.isInfinite => f.toString
    case other => quote(String.valueOf(other))
  }

  def log(level: String, fields: (String, Any)*): Unit = {
    val merged =
      Seq("level" -> (level: Any), "time" -> (strtime(): Any),
        "elapsed" -> (secsSince(): Any)) ++ fields
    sink(merged.map { case (k, v) => s"${quote(k)}: ${render(v)}" }
      .mkString("{", ", ", "}"))
  }

  def info(fields: (String, Any)*): Unit = log("info", fields: _*)
  def warn(fields: (String, Any)*): Unit = log("warning", fields: _*)
  def error(fields: (String, Any)*): Unit = log("error", fields: _*)
}

object JsonLog {
  private val global = new AtomicReference(new JsonLog())

  /** Process-wide logger (jobs); replaceable for tests. */
  def apply(): JsonLog = global.get()
  def set(l: JsonLog): Unit = global.set(l)
}
