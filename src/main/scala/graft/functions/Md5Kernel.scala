package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** MD5 plumbing shared by the codegen signature kernels
  * ([[ShingleMinhash]], [[TokenHash]]): thread-local digest instances,
  * big-endian long extraction, and lowercase-hex formatting. One home for
  * this logic so a fix (digest reset behavior, hex casing) cannot drift
  * between kernels. */
private[functions] object Md5Kernel {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** The calling thread's reusable digest (`digest(buf, 0, 16)` completes
    * AND resets it — safe to hold across rows). */
  def md: MessageDigest = digests.get()

  private val hexDigits = "0123456789abcdef".toCharArray

  def beLong(bytes: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(off + i) & 0xffL); i += 1 }
    v
  }

  /** 16 lowercase-hex chars of one 64-bit half. */
  def hex16(v: Long): UTF8String = {
    val cs = new Array[Char](16)
    var i = 0
    while (i < 16) { cs(i) = hexDigits(((v >>> ((15 - i) * 4)) & 0xf).toInt); i += 1 }
    UTF8String.fromString(new String(cs))
  }

  /** 32 lowercase-hex chars of a full 128-bit digest (hi, lo). */
  def hex32(hi: Long, lo: Long): UTF8String = {
    val cs = new Array[Char](32)
    var i = 0
    while (i < 16) { cs(i) = hexDigits(((hi >>> ((15 - i) * 4)) & 0xf).toInt); i += 1 }
    while (i < 32) { cs(i) = hexDigits(((lo >>> ((31 - i) * 4)) & 0xf).toInt); i += 1 }
    UTF8String.fromString(new String(cs))
  }
}
