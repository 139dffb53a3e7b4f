package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.Json feeds the driver-parsed artifacts (oracle_sql.json, the
  * bench line) — malformed output would silently zero a round's
  * correctness, so the escaper is pinned here.
  */
class JsonSpec extends AnyFunSuite {

  test("escapes quotes, backslashes, and named control chars") {
    assert(Json.str("""a"b\c""") == "\"a\\\"b\\\\c\"")
    assert(Json.str("x\ny\rz\tw") == "\"x\\ny\\rz\\tw\"")
  }

  test("escapes every other control char as \\u00xx") {
    assert(Json.str("abc") == "\"a\\u0001b\\u001fc\"")
  }

  test("drops a trailing unpaired high surrogate (truncated messages)") {
    val cut = "ok\uD83D" // high surrogate with its pair truncated away
    assert(Json.str(cut) == "\"ok\"")
    // an intact pair survives
    val emoji = "ok😀"
    assert(Json.str(emoji) == "\"" + emoji + "\"")
  }

  test("passes plain strings through quoted and untouched") {
    assert(Json.str("rel_agg_group") == "\"rel_agg_group\"")
    assert(Json.str("") == "\"\"")
  }
}
