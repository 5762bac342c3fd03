"""Blocking granularity policy for record-linkage candidate
generation (r5 verdict task 5: q182's blocking policy as CODE, not
prose — the srp_params_for / icws_params_for / ahash_params_for
sized-policy pattern applied to entity-resolution blocking).

q182 blocks on (categorical dim, overlapped value bucket): two
bucket keys shifted by half a width guarantee any pair within
width/2 of each other co-blocks (the overlapping-windows variant of
sorted-neighborhood blocking). With a FIXED bucket width over a
FIXED value range, expected block population grows linearly with the
corpus and candidate pairs quadratically — the classic ER blocking
pitfall, measured at x22 on the 10x replica before q182 moved to
(nation, bucket). Adding a fixed-cardinality dimension only divides
the slope; this module makes the width itself corpus-sized, which
holds expected block population FLAT so candidate volume stays
linear in n.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class BlockingParams:
    width: int  # bucket width in value units (e.g. cents)
    expected_block_size: float  # expected rows per (dim, bucket) block
    saturated: bool  # True: the tolerance floor binds; add dimensions


def blocking_params_for(
    n_rows: int,
    value_range: float,
    n_coblock: int = 1,
    target_block_size: float = 64.0,
    tolerance: float = 0.0,
) -> BlockingParams:
    """Size the bucket width of an overlapped-value blocking key so
    the EXPECTED block population stays ~target_block_size as the
    corpus grows (candidate work then grows linearly in n, like the
    banding policies' linear-candidate bound).

    - ``n_rows``: corpus size the blocking runs over;
    - ``value_range``: span of the bucketed value (same units as the
      width, e.g. cents for q182's balance);
    - ``n_coblock``: combined cardinality of the OTHER blocking
      dimensions the key is crossed with (q182: 25 nations) —
      uniform-mix assumption, the standard blocking-design estimate;
    - ``target_block_size``: desired expected rows per block;
    - ``tolerance``: the match window the overlapped keys must
      guarantee (two half-shifted keys co-block any pair within
      width/2, so width >= 2*tolerance is a hard floor).

    Expected block population = n_rows * width / (n_coblock *
    value_range); solving for width gives the policy. When the
    tolerance floor binds (``saturated=True``), width alone cannot
    hold the target at this corpus size — the caller must add
    blocking dimensions (raise n_coblock) or accept the returned
    expected_block_size; returning the floor keeps the co-blocking
    guarantee rather than silently losing recall."""
    if n_rows <= 0:
        raise ValueError(f"n_rows must be positive, got {n_rows}")
    if value_range <= 0:
        raise ValueError(f"value_range must be positive, got {value_range}")
    if n_coblock < 1:
        raise ValueError(f"n_coblock must be >= 1, got {n_coblock}")
    if tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    ideal = target_block_size * n_coblock * value_range / n_rows
    floor = max(1.0, 2.0 * tolerance)
    # ceil on the tolerance floor, never floor(): flooring a binding
    # fractional floor (e.g. 2*tolerance = 20.6 -> 20) would hand out
    # a width whose guaranteed co-block window width/2 is SMALLER than
    # the caller's declared tolerance — silent recall loss, the exact
    # failure the floor exists to prevent
    width = max(1, math.floor(ideal), math.ceil(floor))
    expected = n_rows * width / (n_coblock * value_range)
    return BlockingParams(
        width=width,
        expected_block_size=expected,
        saturated=ideal < floor,
    )
