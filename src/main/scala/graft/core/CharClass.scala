package graft.core

/** Character classes for fixed-length string pattern mining.
  *
  * Re-expresses the semantics of the reference's per-position character
  * sets with set algebra and named-class rendering (structa
  * chars.py:32-283): a finite set of chars, or the "any char" top
  * element. Named classes render as single letters (o/d/x/I/i), the top
  * element as ".", other sets as compressed `[a-dh-i]` ranges.
  */
sealed trait CharClass {
  def union(other: CharClass): CharClass = (this, other) match {
    case (AnyChar, _) | (_, AnyChar)  => AnyChar
    case (Chars(a), Chars(b))         => Chars(a | b)
  }

  def intersect(other: CharClass): CharClass = (this, other) match {
    case (AnyChar, o)         => o
    case (o, AnyChar)         => o
    case (Chars(a), Chars(b)) => Chars(a & b)
  }

  def subsetOf(other: CharClass): Boolean = (this, other) match {
    case (_, AnyChar)         => true
    case (AnyChar, _)         => false
    case (Chars(a), Chars(b)) => a.subsetOf(b)
  }

  def contains(c: Char): Boolean = this match {
    case AnyChar  => true
    case Chars(s) => s.contains(c)
  }

  def size: Int = this match {
    case AnyChar  => Int.MaxValue
    case Chars(s) => s.size
  }

  /** Reference rendering: chars.py:80-95. */
  def render: String = this match {
    case AnyChar => "."
    case Chars(s) if s.isEmpty   => "∅"
    case Chars(s) if s.size == 1 => s.head.toString
    case cc @ Chars(s) =>
      CharClass.named.get(cc) match {
        case Some(n) => n
        case None    => "[" + Format.formatChars(s) + "]"
      }
  }

  override def toString: String = render
}

/** Top element: any possible character (chars.py:155-276). */
case object AnyChar extends CharClass

/** A finite set of characters (chars.py:32-152). */
final case class Chars(chars: Set[Char]) extends CharClass

object CharClass {
  def apply(s: String): CharClass = Chars(s.toSet)
  def range(start: Char, stop: Char): CharClass =
    Chars((start to stop).toSet)

  /** chars.py:280-284 */
  val octDigit: CharClass = CharClass("01234567")
  val decDigit: CharClass = CharClass("0123456789")
  val hexDigit: CharClass = decDigit.union(CharClass("abcdefABCDEF"))
  val identFirst: CharClass =
    range('A', 'Z').union(range('a', 'z')).union(CharClass("_"))
  val identChar: CharClass = identFirst.union(decDigit)

  private[core] val named: Map[CharClass, String] = Map(
    octDigit -> "o", decDigit -> "d", hexDigit -> "x",
    identFirst -> "I", identChar -> "i")
}
