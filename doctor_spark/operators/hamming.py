"""Banded Hamming self-join over 64-bit signatures — shared by the
SimHash-style text path and the perceptual image/audio fingerprint
dedup operators.

Completeness by pigeonhole: a signature split into ``n_bands`` equal
slices differing in fewer than ``n_bands`` bits must agree on at least
one slice, so for ``max_hamming < n_bands`` the same-band equi-join
loses no true pair.  Candidates rescore with JVM ``bit_count`` — never
a cross join, never Python on the pair stream.  One keyed exchange
(the band repartition) feeds both join sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["banded_hamming_pairs"]


def banded_hamming_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "id",
    sig_col: str = "sig",
) -> DataFrame:
    """``sigs`` (one row per item: ``id_col``, 64-bit ``sig_col``) →
    pairs ``(id_a, id_b, hamming)`` with ``hamming <= max_hamming``.
    NULL signatures drop out at the band equi-join for free."""
    if max_hamming >= n_bands:
        raise ValueError("completeness needs max_hamming < n_bands")
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    band_width = 64 // n_bands
    mask = (1 << band_width) - 1
    base = sigs.select(
        F.col(id_col).alias("id"), F.col(sig_col).alias("sig")
    )
    stacked = base.select(
        "id", "sig",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("sig"), b * band_width).bitwiseAND(
                    F.lit(mask)
                )
                for b in range(n_bands)
            ])
        ).alias("band_no", "band_val"),
    ).repartition(F.col("band_no"), F.col("band_val"))
    left = stacked.select(
        "band_no", "band_val",
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"),
    )
    right = stacked.select(
        "band_no", "band_val",
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"),
    )
    return (
        left.join(right, ["band_no", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(
                F.col("sig_a").bitwiseXOR(F.col("sig_b"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
