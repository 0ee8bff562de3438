package graft.cdc

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** FileTokenStore round-trip coverage, including the escape sequences
  * the reference's Binary tokens can contain (C4/C5 parity,
  * `committing/token_saver.py` / `change_stream_reading/resume_token.py`).
  */
class TokenStoreSpec extends AnyFunSuite {

  private def freshStore() =
    new FileTokenStore(
      Files.createTempDirectory("tokenstore").toString)

  private def roundTrip(token: String): String = {
    val store = freshStore()
    store.save(SavedToken("r1", token, new Timestamp(1720890531000L)))
    store.load("r1").get.token
  }

  test("plain hex token round-trips") {
    val t = ChangeEvents.tokenInsert
    assert(roundTrip(t) === t)
  }

  test("literal backslash+n round-trips (not collapsed to newline)") {
    // Chained .replace unescaping corrupted this: quote("\\n") = "\\\\n",
    // which a replace("\\\\","\\") pass then exposed to replace("\\n","\n").
    val t = "abc\\ndef"
    assert(roundTrip(t) === t)
  }

  test("real newline, quote, and trailing backslash round-trip") {
    for (t <- Seq("line1\nline2", "say \"hi\"", "back\\slash", "end\\",
        "\\\\", "\\\"", "\\n\\n")) {
      assert(roundTrip(t) === t, s"token <$t>")
    }
  }

  test("upsert semantics: second save replaces the first") {
    val store = freshStore()
    store.save(SavedToken("r1", "t1", new Timestamp(1L)))
    store.save(SavedToken("r1", "t2", new Timestamp(2L)))
    assert(store.load("r1").get.token === "t2")
    assert(store.load("r1").get.date.getTime === 2L)
  }

  test("missing reader name loads None") {
    assert(freshStore().load("nope").isEmpty)
  }
}
