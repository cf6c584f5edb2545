package graft.functions

/** Pure JVM kernels for the text/dedup operators — static, allocation-lean,
  * called from codegen'd Catalyst expressions (see Expressions.scala) so the
  * hot path stays inside whole-stage codegen with no UDF boxing.
  *
  * All hashing is FNV-1a-64-based with splitmix64 finalization — stable
  * across JVMs/runs (no Object.hashCode, no seeds from time), which the
  * correctness gate requires.
  */
object TextAlgos {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    val t = text.trim
    // "".split(regex) returns Array("") — guard blank inputs explicitly
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** ALL positional k-token shingle hashes (non-distinct, document order)
    * — the passage stream d11 scores: one rolling pass, no per-window
    * array allocation, so 100 TB of text shingles inside the scan stage
    * at memcpy-ish cost. Empty when the document has fewer than k tokens. */
  def posShingleHashes(text: String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k) return Array.empty
    val out = new Array[Long](toks.length - k + 1)
    var i = 0
    while (i + k <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      out(i) = fnv1a64(sb.toString)
      i += 1
    }
    out
  }

  /** Distinct k-token shingle hashes — the dedup unit. Hashing the joined
    * shingle string keeps memory O(#shingles × 8 bytes) regardless of
    * document length (at 100 TB the signature, not the text, is what
    * shuffles). */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k) {
      if (toks.isEmpty) Array.empty else Array(fnv1a64(toks.mkString(" ")))
    } else {
      val set = new java.util.HashSet[Long]()
      var i = 0
      while (i + k <= toks.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        set.add(fnv1a64(sb.toString))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var n = 0
      while (it.hasNext) { out(n) = it.next(); n += 1 }
      out
    }
  }

  /** Distinct character n-gram hashes. */
  def charGramHashes(text: String, n: Int): Array[Long] = {
    if (text == null || text.length < n) return Array.empty
    val set = new java.util.HashSet[Long]()
    var i = 0
    while (i + n <= text.length) { set.add(fnv1a64(text.substring(i, i + n))); i += 1 }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** MinHash signature from a pre-hashed element set: numHashes
    * permutations h_i(x) = splitmix64(x + i·golden) — one pass,
    * O(#elements × numHashes), no data blowup. */
  def minHashFromHashes(hashes: Array[Long], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < hashes.length) {
      val base = hashes(s)
      var i = 0
      while (i < numHashes) {
        val h = splitmix64(base + i * 0x9e3779b97f4a7c15L)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** MinHash signature over k-token shingles. */
  def minHashSignature(text: String, shingleK: Int, numHashes: Int): Array[Long] =
    minHashFromHashes(shingleHashes(text, shingleK), numHashes)

  /** LSH band keys: signature split into `bands` groups of `rows` hashes,
    * each group hashed to one band key. Two docs sharing any band key are
    * join candidates. */
  def lshBandKeys(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = FnvOffset
      var r = 0
      while (r < rows) { h ^= sig(b * rows + r); h *= FnvPrime; r += 1 }
      // mix the band index in so identical row-groups in different bands
      // land in different buckets
      keys(b) = splitmix64(h + b)
      b += 1
    }
    keys
  }

  /** MinHash-LSH band keys straight from text (signature computed
    * internally): one column, one pass, nothing but `bands` longs per doc
    * ever shuffles. */
  def minHashBandKeys(text: String, shingleK: Int, numHashes: Int, bands: Int): Array[Long] =
    lshBandKeys(minHashSignature(text, shingleK, numHashes), bands, numHashes / bands)

  /** LSH band keys over the character-n-gram set (candidate generation for
    * chargram-Jaccard dedup). */
  def charGramBandKeys(text: String, n: Int, numHashes: Int, bands: Int): Array[Long] =
    lshBandKeys(minHashFromHashes(charGramHashes(text, n), numHashes), bands, numHashes / bands)

  /** 64-bit SimHash over k-token shingles. */
  def simHash64(text: String, shingleK: Int): Long = {
    val shingles = shingleHashes(text, shingleK)
    val counts = new Array[Int](64)
    var s = 0
    while (s < shingles.length) {
      val h = shingles(s)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      s += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (counts(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  /** One-pass text normalization: case-fold, strip everything outside
    * [a-z0-9 ], collapse space runs, trim — exactly
    * `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]", ""), " +", " "))`
    * but in a single scan with zero regex machinery. The regex formulation
    * costs two full java.util.regex passes per document (~51 ms/doc at
    * sf0.1) — at 100 TB of text that CPU dominates the whole pipeline;
    * this kernel is pure branch-and-append. */
  def normalize(text: String): String = {
    if (text == null) return null
    val sb = new java.lang.StringBuilder(text.length)
    var pendingSpace = false
    var i = 0
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      } else if (c == ' ') {
        // only literal space separates words (the regex class has a bare
        // space); other whitespace is stripped like any non-matching char
        pendingSpace = true
      }
      i += 1
    }
    sb.toString
  }

  /** Content-defined rolling-hash fingerprint (Karp-Rabin over the
    * case-folded, whitespace-collapsed text). Equal up to formatting ⇒
    * equal fingerprint. */
  def fingerprint64(text: String): Long = {
    if (text == null) return 0L
    var h = FnvOffset
    var prevSpace = false
    var i = 0
    while (i < text.length) {
      val c0 = text.charAt(i)
      val isSpace = Character.isWhitespace(c0)
      if (!isSpace) {
        if (prevSpace && h != FnvOffset) { h ^= ' '.toLong; h *= FnvPrime }
        h ^= Character.toLowerCase(c0).toLong
        h *= FnvPrime
      }
      prevSpace = isSpace
      i += 1
    }
    splitmix64(h)
  }

  private val LangStopwords: Array[(String, Array[String])] = Array(
    "en" -> Array("the", "a", "of", "and", "is", "to", "in", "that", "it", "with"),
    "fr" -> Array("le", "la", "les", "et", "des", "un", "une", "du", "que", "est"),
    "es" -> Array("el", "los", "y", "de", "que", "en", "un", "una", "por", "con"),
    "de" -> Array("der", "die", "und", "das", "ist", "ein", "eine", "mit", "von", "zu"),
    "pt" -> Array("o", "os", "e", "de", "que", "um", "uma", "com", "para", "em"))

  /** Heuristic language ID: CJK codepoint share first, else the language
    * whose stopword profile hits the token stream hardest; "und"
    * (undetermined) when nothing scores. Deterministic ties by profile
    * order. */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        val block = Character.UnicodeScript.of(cp)
        if (block == Character.UnicodeScript.HAN || block == Character.UnicodeScript.HIRAGANA ||
          block == Character.UnicodeScript.KATAKANA || block == Character.UnicodeScript.HANGUL) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (letters > 0 && cjk * 2 > letters) return "zh"
    val toks = tokenize(text.toLowerCase)
    if (toks.isEmpty) return "und"
    var best = "und"
    var bestHits = 0
    var l = 0
    while (l < LangStopwords.length) {
      val (lang, words) = LangStopwords(l)
      var hits = 0
      var t = 0
      while (t < toks.length) {
        var w = 0
        var found = false
        while (w < words.length && !found) { found = toks(t) == words(w); w += 1 }
        if (found) hits += 1
        t += 1
      }
      if (hits > bestHits) { bestHits = hits; best = lang }
      l += 1
    }
    best
  }

  /** Quality heuristics: (n_tokens, n_distinct_tokens, mean_token_len,
    * stopword_ratio, alpha_ratio). */
  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
