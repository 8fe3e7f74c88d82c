package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SlotsSpec extends AnyFunSuite {

  test("crc16 matches the published Redis test vector") {
    // Redis cluster spec appendix A: CRC16("123456789") == 0x31C3
    assert(Slots.crc16("123456789") === 0x31c3)
  }

  test("slot is CRC16 mod 16384") {
    assert(Slots.slot("123456789") === (0x31c3 & 16383))
  }

  test("hash tags co-locate: {tag} hashes only the tagged substring") {
    assert(Slots.slot("foo{bar}") === Slots.slot("bar"))
    assert(Slots.slot("{bar}baz") === Slots.slot("bar"))
    assert(Slots.slot("a{bar}b{x}") === Slots.slot("bar"))
  }

  test("empty or unterminated tag falls back to the whole key") {
    assert(Slots.slot("foo{}bar") === Slots.crc16("foo{}bar") % 16384)
    assert(Slots.slot("foo{bar") === Slots.crc16("foo{bar") % 16384)
  }

  test("slots stay in range for arbitrary keys") {
    val keys = Seq("", "a", "key:1", "é中文", "x" * 1000)
    keys.foreach { k =>
      val s = Slots.slot(k)
      assert(s >= 0 && s < 16384, s"slot($k)=$s")
    }
  }
}
