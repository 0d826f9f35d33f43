package graft

import org.scalacheck.Gen

/** Minimal property-test driver over scalacheck generators (the
  * scalatest-plus bridge isn't available offline): draw `n` samples and run
  * the assertion block on each.
  */
object GenSampling {
  def forAllSampled[T](g: Gen[T], n: Int = 10)(body: T => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)
}
