"""Perceptual image deduplication — the multimodal rung of the dedup
ladder (LAION-style corpus builds run exactly this stage between download
and training-set assembly).

Shape at 10^12 images:

- the dHash (:mod:`..kernels.imagehash`) is ONE Arrow map stage — decode
  (from-scratch PNG codec / synthetic raster / Pillow stub, same dispatch
  as the media features operator) + integer block-average + 64 gradient
  comparisons per image, no shuffle;
- exact perceptual clusters are a single keyed groupBy on the 64-bit
  hash (map-side partial aggregation collapses each cluster to one row
  per partition before the exchange);
- near-duplicate pairs (Hamming ≤ k) reuse the SimHash band-bucketing
  machinery: a 64-bit signature split into ``n_bands`` slices, same-band
  equi-join (complete by pigeonhole for ``k < n_bands``), JVM
  ``bit_count`` rescore — never a cross join, never Python on the pair
  stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["image_dhash", "image_dup_clusters", "image_near_pairs"]


def _dhash_udf():
    @F.pandas_udf("bigint")
    def udf(payload: pd.Series) -> pd.Series:
        from ..kernels.imagehash import dhash64
        from .multimodal import decode_image_any

        def one(b):
            if b is None:
                return None
            try:
                return dhash64(decode_image_any(bytes(b)))
            except (ValueError, NotImplementedError):
                # undecodable payload (or env-gated codec): NULL hash,
                # never a dead task
                return None

        # nullable Int64 dtype, NOT .map(): a plain object/float series
        # with NaNs coerces int64 hashes to float64, which silently
        # ROUNDS values above 2^53 (observed: batches containing one
        # undecodable row corrupted every hash in the batch)
        return pd.Series((one(b) for b in payload), dtype="Int64")

    # asNondeterministic stops Catalyst from inlining the UDF into
    # pushed-down predicates — without it, any isNotNull filter on the
    # hash column decodes every image TWICE (observed in the physical
    # plan: two ArrowEvalPython nodes for one udf call)
    return udf.asNondeterministic()


def image_dhash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """``(id, dhash)`` — 64-bit perceptual hash per image; NULL for
    payloads that fail to decode."""
    return df.select(
        F.col(id_col).alias("id"),
        _dhash_udf()(F.col(payload_col)).alias("dhash"),
    )


def image_dup_clusters(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Exact perceptual clusters: group by dHash.  Returns one row per
    cluster ``(dhash, rep_id = min id, n_images)`` — the keep-one-
    representative form.  Undecodable images are excluded (no cluster)."""
    hashed = image_dhash(df, payload_col, id_col).where(
        F.col("dhash").isNotNull()
    )
    return hashed.groupBy("dhash").agg(
        F.min("id").alias("rep_id"), F.count("*").alias("n_images")
    )


def image_near_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs by dHash Hamming distance ≤
    ``max_hamming`` — band-bucketed and COMPLETE (pigeonhole: signatures
    differing in < ``n_bands`` bits share at least one of ``n_bands``
    equal slices), JVM ``bit_count`` rescore.  Columns: id_a, id_b,
    hamming."""
    if max_hamming >= n_bands:
        raise ValueError("completeness needs max_hamming < n_bands")
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    band_width = 64 // n_bands
    mask = (1 << band_width) - 1
    # no isNotNull filter: a NULL signature yields NULL band keys, which
    # the inner equi-join drops for free — filtering the UDF column here
    # would make Catalyst decode every image twice
    sigs = image_dhash(df, payload_col, id_col).withColumnRenamed(
        "dhash", "sig"
    )
    stacked = sigs.select(
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
