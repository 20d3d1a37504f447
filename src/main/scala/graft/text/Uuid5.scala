package graft.text

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** F10 — RFC 4122 version-5 (SHA-1, name-based) UUID.
  *
  * The reference keys every index point as
  * `uuid5(NAMESPACE_DNS, "{docket_id}_{opinion_id}_{chunk_index}")`
  * (`/root/reference/data-ingestion/data_extraction.py:288`). The JVM only
  * ships v3 (MD5) via `UUID.nameUUIDFromBytes`, so v5 is implemented here
  * per the RFC: SHA-1(namespace || name), version=5, IETF variant.
  */
object Uuid5 {

  /** RFC 4122 DNS namespace: 6ba7b810-9dad-11d1-80b4-00c04fd430c8. */
  val NamespaceDnsBytes: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  def apply(name: String): String = fromBytes(NamespaceDnsBytes, name)

  def fromBytes(namespace: Array[Byte], name: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(namespace)
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val h = md.digest() // 20 bytes; use first 16
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // IETF variant
    val hex = h.take(16).map(b => f"${b & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }
}
