package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{Containers, MediaCodec}
import graft.operators.Multimodal.Containers.GifFrame

/** Round-15 disposal-3 invisibility laws (VERDICT r14 #5 / ADVICE r14 #1):
  * restore-to-previous is accepted under EXACTLY the disposal-2 proof —
  * last frame, or a next frame that repaints the disposed rect fully and
  * opaquely — and refuses everywhere else. Mirrors Round14GifSpec's
  * disposal-2 laws so the two disposals stay check-for-check identical. */
class Round15GifSpec extends AnyFunSuite {

  private val W = 36
  private val H = 24

  private def plane(f: (Int, Int) => Int): Array[Byte] = {
    val p = new Array[Byte](W * H)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) { p(y * W + x) = (f(x, y) & 0xff).toByte; x += 1 }
      y += 1
    }
    p
  }

  private def full(p: Array[Byte]) = GifFrame(0, 0, W, H, p)

  private def grad(off: Int) = plane((x, y) => (x * 5 + y * 2 + off) % 200)

  test("restore-to-previous is accepted exactly when provably invisible") {
    // covered by a full opaque next frame: whatever "previous" a renderer
    // restores, the next frame repaints every restored pixel
    val covered = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)).copy(disposal = 3), full(grad(1))))
    val Some((_, _, fs)) = MediaCodec.gifGrayFrames(covered)
    assert(fs.length == 2)
    assert(fs(0).toSeq == grad(0).toSeq && fs(1).toSeq == grad(1).toSeq)
    // on the LAST frame: nothing after it reads the canvas
    val last = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)), full(grad(1)).copy(disposal = 3)))
    val Some((_, _, fs2)) = MediaCodec.gifGrayFrames(last)
    assert(fs2.length == 2 && fs2(1).toSeq == grad(1).toSeq)
    // the accepted disposal-3 animation hashes like its disposal-1 twin —
    // the restore never influenced any composited plane
    val plain = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)), full(grad(1))))
    assert(MediaCodec.dhashBands(covered).get.toSeq ==
      MediaCodec.dhashBands(plain).get.toSeq)
  }

  test("a single-frame GIF with a disposal-3 GCE decodes (gifGray bit-identity)") {
    // the ADVICE r14 #1 scenario: the lone frame IS the last frame, so
    // the restore is never observed; the composited result must stay
    // bit-identical to the plain single-frame road
    val p = grad(2)
    val d3 = Containers.gifGray8Anim(W, H, Seq(full(p).copy(disposal = 3)))
    val Some((_, _, fs)) = MediaCodec.gifGrayFrames(d3)
    assert(fs.length == 1 && fs.head.toSeq == p.toSeq)
    val plain = Containers.gifGray8(W, H, p, interlaced = false)
    assert(MediaCodec.dhashBands(d3).get.toSeq ==
      MediaCodec.dhashBands(plain).get.toSeq)
  }

  test("disposal 3 with a covering-but-transparent next frame refuses") {
    // holes in the repaint would show the restored (renderer-dependent)
    // pixels — same refusal as the disposal-2 twin law
    val transNext = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)).copy(disposal = 3),
        full(grad(1)).copy(transIdx = 7)))
    assert(MediaCodec.gifGrayFrames(transNext).isEmpty)
  }

  test("mixed 2-then-3 disposals compose when each restore is covered") {
    val anim = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)).copy(disposal = 2),
        full(grad(1)).copy(disposal = 3),
        full(grad(2))))
    val Some((_, _, fs)) = MediaCodec.gifGrayFrames(anim)
    assert(fs.length == 3)
    assert(fs(2).toSeq == grad(2).toSeq)
  }
}
