package graft.queries

import org.apache.spark.sql.graftx.{Fmix64, MinHashSignature, MixHashLongs, RollingHash}

/** DuckDB SQL generators that replicate graft's portable 64-bit hash
  * kernels bit-for-bit, so hash-based operators (rolling hash,
  * simhash, minhash/LSH, hash split) can be verified value-for-value
  * by the external oracle instead of rows-only.
  *
  * Technique: DuckDB's HUGEINT (int128) emulates Java's wrapping
  * 64-bit arithmetic — work on unsigned residues in [0, 2^64), with
  * 64x64-bit multiplies split into 32-bit halves so intermediates stay
  * under 2^97 (< int127 max). Single-element `list_transform` lambdas
  * act as let-bindings to keep generated expressions linear in size.
  * Everything assumes ASCII text (the testdata is ASCII; ord(char) ==
  * utf8 byte), mirroring RollingHash's byte loop.
  */
object PortableHashSql {

  /** 2^64 as a DuckDB HUGEINT literal. */
  val M = "18446744073709551616"
  private val Half = "9223372036854775808"

  /** Java long constant -> unsigned decimal string. */
  def u64(v: Long): String = java.lang.Long.toUnsignedString(v)

  /** unsigned residue -> signed BIGINT (two's complement reinterpret). */
  def toSigned(u: String): String =
    s"CAST(CASE WHEN ($u) >= $Half THEN ($u) - $M ELSE ($u) END AS BIGINT)"

  /** signed BIGINT expression -> unsigned residue in [0, 2^64). */
  def toUnsigned(s: String): String =
    s"(CASE WHEN ($s) < 0 THEN CAST(($s) AS HUGEINT) + $M ELSE CAST(($s) AS HUGEINT) END)"

  /** (h * c) mod 2^64 for constant c, h an unsigned residue. */
  def mulmodConst(h: String, c: Long): String = {
    val hi = (c >>> 32) & 0xFFFFFFFFL
    val lo = c & 0xFFFFFFFFL
    s"((($h) * $lo + ((($h) * $hi) % 4294967296) * 4294967296) % $M)"
  }

  /** murmur3 fmix64 over an unsigned residue; let-bound so the input
    * expression is evaluated once.
    */
  def fmix(u: String): String =
    s"list_transform([$u], fa -> " +
      s"list_transform([xor(fa, fa >> 33)], fb -> " +
      s"list_transform([${mulmodConst("fb", Fmix64.C1)}], fc -> " +
      s"list_transform([xor(fc, fc >> 33)], fd -> " +
      s"list_transform([${mulmodConst("fd", Fmix64.C2)}], fe -> " +
      s"xor(fe, fe >> 33))[1])[1])[1])[1])[1]"

  /** RollingHash (FNV-style h*B+byte fold from the seed) of a VARCHAR
    * expression, as an unsigned residue.
    */
  def roll(strExpr: String): String =
    // list_filter guards the empty string: DuckDB split('', '') is
    // [''] and ord('') is -1, which would fold one bogus byte where
    // the Spark loop folds none (fuzz-harness finding).
    s"list_reduce(list_prepend(CAST(${u64(RollingHash.SEED)} AS HUGEINT), " +
      s"list_transform(list_filter(split($strExpr, ''), rc -> rc <> ''), " +
      s"rc -> CAST(ord(rc) AS HUGEINT))), " +
      s"(rh, rb) -> (rh * ${RollingHash.BASE} + rb) % $M)"

  /** SimHash64.tokenHash = fmix64(rollingHash(bytes)). */
  def tokenHash(strExpr: String): String = fmix(roll(strExpr))

  /** MixHashLongs fold over a HUGEINT-list expression (values already
    * unsigned residues): h = fmix64(h XOR v) from the FNV seed.
    */
  def mixHashList(listExpr: String): String =
    s"list_reduce(list_prepend(CAST(${u64(MixHashLongs.Seed)} AS HUGEINT), $listExpr), " +
      s"(mh, mv) -> ${fmix("xor(mh, mv)")})"

  /** Dedup.normText mirrored: ASCII-fold (runs outside printable
    * ASCII become one space), trim, lowercase. The fold guarantees
    * pure-ASCII tokens, so this file's `ord(char) == utf8 byte`
    * assumption holds for ARBITRARY input, not just ASCII testdata.
    */
  def norm(c: String): String =
    s"lower(trim(regexp_replace($c, '[^!-~]+', ' ', 'g')))"

  /** CTE chain computing per-doc simhash64 fingerprints from the
    * documents table: exposes `simfp(doc_id, fp_sim)`.
    */
  def simhashCtes: String =
    s"""__n AS (SELECT doc_id, ${norm("text")} AS nt FROM documents),
       |__tok AS (SELECT doc_id, unnest(split(nt, ' ')) AS tok FROM __n),
       |__th AS (SELECT doc_id, ${tokenHash("tok")} AS h FROM __tok),
       |__votes AS (
       |  SELECT doc_id, bb.b AS b,
       |    sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM __th, (SELECT unnest(range(64)) AS b) bb
       |  GROUP BY doc_id, bb.b),
       |simfp AS (
       |  SELECT doc_id, ${toSigned(
              "sum(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END)")} AS fp_sim
       |  FROM __votes GROUP BY doc_id)""".stripMargin

  /** MinHash permutation coefficient rows for the oracle: k, a split
    * into 32-bit halves (for variable-by-variable mulmod), b unsigned.
    */
  def minhashCoeffValues(numHashes: Int): String = {
    val as = MinHashSignature.coeffA(numHashes)
    val bs = MinHashSignature.coeffB(numHashes)
    (0 until numHashes).map { i =>
      val ahi = (as(i) >>> 32) & 0xFFFFFFFFL
      val alo = as(i) & 0xFFFFFFFFL
      s"(${i}, ${ahi}, ${alo}, CAST(${u64(bs(i))} AS HUGEINT))"
    }.mkString("(VALUES ", ", ", ") AS coeffs(k, ahi, alo, bu)")
  }

  /** g = (h*a + b) mod 2^64 with a a VARIABLE split into ahi/alo. */
  def permuteSql(h: String): String =
    s"(((($h) * alo + ((($h) * ahi) % 4294967296) * 4294967296) % $M + bu) % $M)"
}
