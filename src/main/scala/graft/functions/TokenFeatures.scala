package graft.functions

import graft.kg.Dims

/** Char-ordinal token features — the reference's token-ablation input
  * (script/preprocess/get_token.py:25-41; settings.py:33 TOKEN_LEN=50):
  * per-entity vector of character ordinals, truncated/right-padded to a
  * fixed length with ord(' ') = 32.
  *
  * Ordinals are FULL UNICODE CODEPOINTS (Python `ord`), not ASCII or
  * UTF-16 code units: a CJK character outside the BMP is one reference
  * token, so we iterate `codePoints`, never `charAt`. */
object TokenFeatures {

  val PadCp = 32 // ord(' ') — get_token.py:36

  def codepoints(name: String, len: Int = Dims.TokenLen, pad: Int = PadCp): Array[Int] = {
    val cps = name.codePoints().toArray
    val out = Array.fill(len)(pad)
    var i = 0
    while (i < len && i < cps.length) { out(i) = cps(i); i += 1 }
    out
  }
}
