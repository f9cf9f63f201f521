package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.JsonLog

/** dict_logging parity: JSON-line rendering, level/time/elapsed
  * merging, stringification of non-native values, control-char
  * escaping.
  */
class JsonLogSpec extends AnyFunSuite {

  private def captured(): (JsonLog, () => Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var now = 1000L
    val log = new JsonLog(s => buf += s, () => { now += 1500; now })
    (log, () => buf.toSeq)
  }

  test("events render as one JSON object per line with level+time+elapsed") {
    val (log, lines) = captured()
    log.info("msg" -> "starting transform", "table" -> "measurement",
      "rows" -> 42L)
    val Seq(line) = lines()
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"level\": \"info\""))
    assert(line.contains("\"msg\": \"starting transform\""))
    assert(line.contains("\"table\": \"measurement\""))
    assert(line.contains("\"rows\": 42"))
    // elapsed is zero-padded whole seconds (dict_logging.secs_since)
    assert(line.contains("\"elapsed\": \"0001\""))
    // RFC3339 timestamp with offset (dict_logging.strtime)
    assert("\"time\": \"\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}[+-]\\d{2}:\\d{2}\"".r
      .findFirstIn(line).isDefined, line)
  }

  test("non-native values stringify; control chars escape; output stays parseable") {
    val (log, lines) = captured()
    log.error("msg" -> "bad\nline\t\"quoted\"", "err" -> new RuntimeException("boom"),
      "null_val" -> null, "flag" -> true)
    val Seq(line) = lines()
    assert(line.contains("\\n") && line.contains("\\t") && line.contains("\\\""))
    assert(line.contains("\"flag\": true"))
    assert(line.contains("\"null_val\": null"))
    assert(line.contains("boom"))
    // no raw control characters survive
    assert(!line.exists(_ < ' '))
  }

  test("levels map to the reference's names") {
    val (log, lines) = captured()
    log.info("msg" -> "a"); log.warn("msg" -> "b"); log.error("msg" -> "c")
    assert(lines().map(l => "\"level\": \"(\\w+)\"".r
      .findFirstMatchIn(l).get.group(1)) == Seq("info", "warning", "error"))
  }
}
