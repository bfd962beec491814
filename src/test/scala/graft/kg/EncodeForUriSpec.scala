package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/**
 * UriEncode (the ENCODE_FOR_URI kernel) vs an independent codepoint-wise
 * reference built straight from the XPath fn:encode-for-uri definition:
 * UTF-8 octets, percent-escape everything outside `A-Za-z0-9-_.~`,
 * uppercase hex.
 */
class EncodeForUriSpec extends AnyFunSuite {

  private def ref(s: String): String =
    s.getBytes("UTF-8").map { b =>
      val i = b & 0xff
      val c = i.toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~')
        c.toString
      else f"%%$i%02X"
    }.mkString

  test("known vectors from the XPath spec") {
    assert(UriEncode.encodeString("http://www.example.com/00/Weather/CA/Los%20Angeles#ocean")
      === "http%3A%2F%2Fwww.example.com%2F00%2FWeather%2FCA%2FLos%2520Angeles%23ocean")
    assert(UriEncode.encodeString("~bébé") === "~b%C3%A9b%C3%A9")
    assert(UriEncode.encodeString("100% organic") === "100%25%20organic")
  }

  test("equals the codepoint-wise reference on random strings") {
    val rnd = new Random(41)
    val pools = Seq(
      () => rnd.nextPrintableChar(),
      () => "абвгд日本語🎉 éü#?/&=+".charAt(rnd.nextInt(18)),
      () => rnd.nextInt(0xD7FF).toChar) // any BMP char below surrogates
    for (_ <- 1 to 300) {
      val pool = pools(rnd.nextInt(pools.size))
      val s = Seq.fill(rnd.nextInt(24))(pool()).mkString
      assert(UriEncode.encodeString(s) === ref(s), s"input: ${s.toList}")
    }
  }

  test("zero-copy fast path returns the input reference when unreserved") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("Already-safe_09.~")
    assert(UriEncode.encode(u) eq u)
    assert(UriEncode.encode(null) == null)
  }
}
