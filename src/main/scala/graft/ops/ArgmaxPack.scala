package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-friendly ARGMAX encoding (round-11, the verdict's SortAggregate
  * item): the move loops' `min(struct(−score, label))` aggregate cannot
  * plan as `HashAggregateExec` — a struct agg buffer is not
  * UnsafeRow-mutable, so every round pays a map-side AND a reduce-side
  * sort of the E-row candidate frame. Packing the (−score, label) pair
  * into ONE `DECIMAL(38,0)` atom keeps the identical total order while
  * the buffer becomes a fixed-width 16-byte decimal — mutable, so
  * `min(atom)` hash-aggregates.
  *
  * Encoding, for |score| ≤ 2⁶¹ (loudly guarded — raise_error, never a
  * wrap) and ANY long label:
  *
  *   atom = (2⁶¹ − score)·2⁶⁴ + (label + 2⁶³)
  *
  * Order/injectivity proof:
  *   - q = 2⁶¹ − score ∈ [0, 2⁶²] is strictly DECREASING in score;
  *   - u = label + 2⁶³ ∈ [0, 2⁶⁴) preserves signed label order and never
  *     carries into the q·2⁶⁴ term (u < 2⁶⁴ strictly), so
  *     atom(s₁,l₁) < atom(s₂,l₂) ⇔ (q₁,u₁) <lex (q₂,u₂)
  *     ⇔ s₁ > s₂ ∨ (s₁ = s₂ ∧ l₁ < l₂);
  *   - hence min(atom) picks max-score-then-min-label — exactly the
  *     struct-min's order — and the map is injective, so the decode is
  *     exact: label = (atom mod 2⁶⁴) − 2⁶³, score = 2⁶¹ − atom div 2⁶⁴.
  *   - capacity: atom ≤ 2⁶²·2⁶⁴ + 2⁶⁴ = 2¹²⁶ + 2⁶⁴ < 10³⁸ — exact in
  *     DECIMAL(38,0); every step is integer-valued decimal arithmetic.
  *
  * Callers whose score bound can exceed 2⁶¹ at scale (the modularity
  * loops: |score| ≤ 4m²) branch on the driver-known bound and keep the
  * struct-min beyond it — the packing changes the PLAN, never the
  * result or the operating envelope.
  */
private[ops] object ArgmaxPack {
  private val d38 = "decimal(38,0)"
  private def big(v: java.math.BigInteger): Column =
    lit(new java.math.BigDecimal(v)).cast(d38)
  private val two64 = big(java.math.BigInteger.ONE.shiftLeft(64))
  private val two63 = big(java.math.BigInteger.ONE.shiftLeft(63))
  private val two61 = big(java.math.BigInteger.ONE.shiftLeft(61))

  /** Largest Σ-edge-weight m for which the modularity score bound 4m²
    * stays inside the 2⁶¹ packing guard: floor(√(2⁶¹/4)). */
  private[ops] val maxPackedM = 759250124L

  /** The packed atom; `score` any integer-valued numeric column. */
  private[ops] def atom(score: Column, label: Column): Column = {
    val s = score.cast(d38)
    val g = when(s > two61 || s < -two61,
      raise_error(concat(
        lit("packedArgmax: |score| exceeds the 2^61 packing guard: "),
        s.cast("string"))).cast(d38))
      .otherwise(s)
    (two61 - g) * two64 + (label.cast(d38) + two63)
  }

  /** Decode the winning label from `min(atom)`. */
  private[ops] def label(atom: Column): Column =
    (pmod(atom, two64) - two63).cast("long")

  /** Decode the winning score from `min(atom)`. Decimal `/` rounds
    * HALF_UP, so divide only the remainder-free numerator — the quotient
    * is then integer-valued and the division exact. */
  private[ops] def score(atom: Column): Column =
    (two61 - ((atom - pmod(atom, two64)) / two64).cast(d38)).cast("long")
}
