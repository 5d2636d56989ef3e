package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{Containers, MediaCodec}
import graft.operators.Multimodal.Containers.GifFrame

/** Round-14 animated-GIF temporal pooling laws (VERDICT r13 #4): every
  * image block decodes and composites honestly (do-not-dispose + GCE
  * transparency), the dHash takes per-bit majorities across frames like
  * videoBands, complex disposals refuse, and the single-frame hash is
  * bit-identical to the old first-frame road (q184's oracle law). */
class Round14GifSpec extends AnyFunSuite {

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

  private def hamming(a: Array[Int], b: Array[Int]): Int =
    (0 until 4).map(i => Integer.bitCount(a(i) ^ b(i))).sum

  // a structured gradient field: strong horizontal gradient, so dHash
  // bits are stable; per-frame brightness offsets don't change gradients
  private def grad(off: Int) = plane((x, y) => (x * 5 + y * 2 + off) % 200)

  test("single-frame animated hash ≡ the plain single-frame GIF hash") {
    val p = grad(0)
    val anim = Containers.gifGray8Anim(W, H, Seq(full(p)))
    val plain = Containers.gifGray8(W, H, p, interlaced = false)
    assert(!java.util.Arrays.equals(anim, plain)) // byte streams differ
    val a = MediaCodec.dhashBands(anim).get
    val b = MediaCodec.dhashBands(plain).get
    assert(a.toSeq == b.toSeq)
  }

  test("gifGrayFrames composites a transparent sub-rect patch onto the canvas") {
    val base = grad(0)
    val patchW = 10; val patchH = 6; val left = 4; val top = 8
    val patch = new Array[Byte](patchW * patchH)
    var i = 0
    while (i < patch.length) {
      // half the patch is the transparent index 7, half paints 150
      patch(i) = (if (i % 2 == 0) 7 else 150).toByte
      i += 1
    }
    val anim = Containers.gifGray8Anim(W, H,
      Seq(full(base), GifFrame(left, top, patchW, patchH, patch, transIdx = 7)))
    val Some((w, h, frames)) = MediaCodec.gifGrayFrames(anim)
    assert(w == W && h == H && frames.length == 2)
    // frame 1 = the base plane verbatim (gray GCT: index == luminance)
    assert(frames(0).toSeq == base.toSeq)
    // frame 2 = base with only the NON-transparent patch pixels painted
    val expect = base.clone()
    var r = 0
    while (r < patchH) {
      var c = 0
      while (c < patchW) {
        val v = patch(r * patchW + c) & 0xff
        if (v != 7) expect((top + r) * W + left + c) = v.toByte
        c += 1
      }
      r += 1
    }
    assert(frames(1).toSeq == expect.toSeq)
  }

  test("re-encoded animation with a changed INTRO frame still lands on its twin") {
    // the exact miss the first-frame-only road had: [X, Y, Y, Y, Y] vs
    // [Z, Y, Y, Y, Y] — majority pooling ignores the odd frame out
    val y4 = Seq.fill(4)(full(grad(0)))
    val a = Containers.gifGray8Anim(W, H, full(plane((x, y) => 255 - x * 7 % 256)) +: y4)
    val b = Containers.gifGray8Anim(W, H, full(plane((x, y) => (x * x + y) % 256)) +: y4)
    val ba = MediaCodec.dhashBands(a).get
    val bb = MediaCodec.dhashBands(b).get
    assert(hamming(ba, bb) == 0)
  }

  test("one swapped middle frame lands within Hamming 3 of its twin") {
    val fs = (0 until 5).map(k => full(grad(k))) // same gradient family
    val twin = fs.updated(2, full(plane((x, y) => (y * 9 + x) % 256)))
    val ba = MediaCodec.dhashBands(Containers.gifGray8Anim(W, H, fs)).get
    val bb = MediaCodec.dhashBands(Containers.gifGray8Anim(W, H, twin)).get
    assert(hamming(ba, bb) <= 3)
  }

  test("unprovable restore-to-previous and restore-to-background refuse") {
    // disposal 3 followed by a PARTIAL next frame: the restored pixels
    // (renderer folklore diverges on "previous") would reach the canvas —
    // refuse (round 15 extends the disposal-2 invisibility proof to 3;
    // the ACCEPTED cases live in Round15GifSpec)
    val d3 = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)).copy(disposal = 3),
        GifFrame(2, 2, 8, 6, new Array[Byte](48))))
    assert(MediaCodec.gifGrayFrames(d3).isEmpty)
    assert(MediaCodec.dhashBands(d3).isDefined) // byte-pool stand-in road
    // disposal 2 followed by a PARTIAL next frame: the restored pixels
    // outside the repaint would reach the canvas — refuse
    val partialNext = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)).copy(disposal = 2),
        GifFrame(2, 2, 8, 6, new Array[Byte](48))))
    assert(MediaCodec.gifGrayFrames(partialNext).isEmpty)
    // disposal 2 followed by a covering frame WITH transparency: holes
    // would show the restored background — refuse
    val transNext = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)).copy(disposal = 2),
        full(grad(1)).copy(transIdx = 7)))
    assert(MediaCodec.gifGrayFrames(transNext).isEmpty)
  }

  test("reserved disposals 4-7 refuse (never composited as a guess)") {
    for (d <- 4 to 7) {
      val anim = Containers.gifGray8Anim(W, H,
        Seq(full(grad(0)).copy(disposal = d), full(grad(1))))
      assert(MediaCodec.gifGrayFrames(anim).isEmpty, s"disposal $d")
    }
  }

  test("first-frame transparency paints from the palette (no undefined canvas)") {
    val p = grad(0)
    // declare index 7 transparent on a SINGLE-frame GIF: there is no
    // underlay, so the decode must keep gifGray's deterministic palette
    // paint — and hash bit-identically to the flag-less encoding
    val trans = Containers.gifGray8Anim(W, H, Seq(full(p).copy(transIdx = 7)))
    val plain = Containers.gifGray8(W, H, p, interlaced = false)
    val Some((_, _, fs)) = MediaCodec.gifGrayFrames(trans)
    assert(fs.length == 1 && fs.head.toSeq == p.toSeq)
    assert(MediaCodec.dhashBands(trans).get.toSeq ==
      MediaCodec.dhashBands(plain).get.toSeq)
    // on a LATER frame the same flag composites against the real underlay
    val patch = Array.fill[Byte](8 * 6)(7) // all-transparent patch
    val anim = Containers.gifGray8Anim(W, H,
      Seq(full(p), GifFrame(3, 3, 8, 6, patch, transIdx = 7)))
    val Some((_, _, fs2)) = MediaCodec.gifGrayFrames(anim)
    assert(fs2(1).toSeq == p.toSeq) // nothing painted: canvas unchanged
  }

  test("restore-to-background is accepted exactly when provably invisible") {
    // covered by a full opaque next frame: the restore is a no-op
    val covered = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)).copy(disposal = 2), full(grad(1))))
    val Some((_, _, fs)) = MediaCodec.gifGrayFrames(covered)
    assert(fs.length == 2)
    assert(fs(0).toSeq == grad(0).toSeq && fs(1).toSeq == grad(1).toSeq)
    // on the LAST frame: nothing after it reads the canvas
    val last = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)), full(grad(1)).copy(disposal = 2)))
    val Some((_, _, fs2)) = MediaCodec.gifGrayFrames(last)
    assert(fs2.length == 2 && fs2(1).toSeq == grad(1).toSeq)
    // and the accepted disposal-2 animation hashes like its disposal-1
    // twin — the restore never influenced any composited plane
    val plain = Containers.gifGray8Anim(W, H,
      Seq(full(grad(0)), full(grad(1))))
    assert(MediaCodec.dhashBands(covered).get.toSeq ==
      MediaCodec.dhashBands(plain).get.toSeq)
  }

  test("a partial FIRST frame refuses (undefined canvas)") {
    val anim = Containers.gifGray8Anim(W, H,
      Seq(GifFrame(1, 0, W - 1, H, new Array[Byte]((W - 1) * H))))
    assert(MediaCodec.gifGrayFrames(anim).isEmpty)
  }

  test("a corrupt LATER frame refuses the whole payload, never a partial pool") {
    val p = grad(0)
    val good = Containers.gifGray8Anim(W, H, Seq(full(p), full(grad(1))))
    // truncate inside the second frame's LZW stream
    val cut = java.util.Arrays.copyOf(good, good.length - 9)
    assert(MediaCodec.gifGrayFrames(cut).isEmpty)
  }

  test("multi-frame ≡ single-frame when all frames are identical") {
    val p = grad(3)
    val one = MediaCodec.dhashBands(Containers.gifGray8Anim(W, H, Seq(full(p)))).get
    val five = MediaCodec.dhashBands(
      Containers.gifGray8Anim(W, H, Seq.fill(5)(full(p)))).get
    assert(one.toSeq == five.toSeq)
  }
}
