package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The sorted-array longest-match walk must be observationally identical to
  * the definitional per-candidate substring probe over the WHATWG table.
  */
class EntitiesSpec extends AnyFunSuite {

  /** Definitional matcher: try every candidate length, longest first. */
  private def referenceMatch(input: String, pos: Int): (Int, String) = {
    var len = math.min(Entities.maxNameLength, input.length - pos)
    while (len >= 2) {
      Entities.table.get(input.substring(pos, pos + len)) match {
        case Some(rep) => return (len, rep)
        case None      =>
      }
      len -= 1
    }
    null
  }

  private def packedOf(input: String, pos: Int): (Int, String) = {
    val p = Entities.matchNamedPacked(input, pos)
    if (p < 0L) null
    else ((p >>> 32).toInt, Entities.replacementAt((p & 0xffffffffL).toInt))
  }

  test("every table name matches itself, with and without trailing context") {
    Entities.table.foreach { case (name, rep) =>
      assert(packedOf(name, 0) != null, name)
      // a name that is a strict prefix of a longer name must still resolve
      // to ITS OWN longest match under various continuations
      for (suffix <- Seq("", "x", ";", "1", " rest", "Z")) {
        val s = name + suffix
        val got = packedOf(s, 0)
        val want = referenceMatch(s, 0)
        assert(got == want, s"input=$s got=$got want=$want")
      }
      assert(rep.nonEmpty)
    }
  }

  test("fuzzed inputs agree with the definitional matcher") {
    val rnd = new java.util.Random(0xE47177E5L)
    val names = Entities.table.keys.toArray
    val alphabet = "abcdefgzAGLRT019;&# l"
    (0 until 20000).foreach { _ =>
      val sb = new StringBuilder
      (0 until 1 + rnd.nextInt(12)).foreach { _ =>
        if (rnd.nextInt(4) == 0) sb.append(names(rnd.nextInt(names.length)))
        else sb.append(alphabet.charAt(rnd.nextInt(alphabet.length)))
      }
      val s = sb.toString
      val pos = rnd.nextInt(s.length)
      assert(packedOf(s, pos) == referenceMatch(s, pos), s"input=$s pos=$pos")
    }
  }

  test("no match cases return -1") {
    assert(Entities.matchNamedPacked("zzz~", 0) == -1L)
    assert(Entities.matchNamedPacked("", 0) == -1L)
    assert(Entities.matchNamedPacked("a", 0) == -1L) // too short
    assert(Entities.matchNamedPacked("~amp;", 0) == -1L)
  }

  test("replaceNumeric matches the map-based definition") {
    def reference(cp: Int): Int =
      if (cp >= 0xd800 && cp <= 0xdfff) 0xfffd
      else if (cp > 0x10ffff) 0xfffd
      else Entities.numericOverrides.getOrElse(cp, cp)
    ((0 to 0x200) ++ Seq(0xd7ff, 0xd800, 0xdfff, 0xe000, 0xfffd, 0xffff,
      0x10000, 0x10ffff, 0x110000, Int.MaxValue)).foreach { cp =>
      assert(Entities.replaceNumeric(cp) == reference(cp), s"cp=$cp")
    }
  }
}
