"""Hamming-band candidate generation over 64-bit signatures — the
bucketing core shared by SimHash text near-dup (queries/dedup.py) and
perceptual-hash image near-dup (queries/multimodal_q.py).

By pigeonhole, any pair of 64-bit signatures within hamming distance
``bands - 1`` agrees exactly on at least one of ``bands`` disjoint
16-bit bands, so an equi-join on (band_id, band_value) has FULL recall
for threshold <= bands - 1 and cost proportional to band-bucket
collisions (~N/65536 expected occupancy per band value), never
|rows|². Nothing here is all-pairs and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hamming_band_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    threshold: int,
    n_bands: int = 4,
) -> DataFrame:
    """``(id, sig64)`` -> distinct candidate pairs within hamming
    ``threshold``, columns ``({id}_a, {id}_b, hamming)``, a < b.

    Requires ``threshold <= n_bands - 1`` (the pigeonhole guarantee);
    each signature explodes into ``n_bands`` 16-bit band rows, pairs
    come from the (band_id, band_val) equi-join, and the exact
    bit_count(xor) verify runs only on candidates.
    """
    if threshold > n_bands - 1:
        raise ValueError(
            f"threshold {threshold} needs > {n_bands} bands for full recall"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = sig.select(
        F.col(id_col),
        F.col(sig_col).alias("sig64"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(sig_col, width * b)
                        .bitwiseAND(mask)
                        .alias("band_val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bd"),
    ).select(
        id_col,
        "sig64",
        F.col("bd.band_id").alias("band_id"),
        F.col("bd.band_val").alias("band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(f"{id_col}_a"),
            F.col(f"b.{id_col}").alias(f"{id_col}_b"),
            F.col("a.sig64").alias("sig_a"),
            F.col("b.sig64").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int")
    return cand.select(
        f"{id_col}_a", f"{id_col}_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= threshold)
