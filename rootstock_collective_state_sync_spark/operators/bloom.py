"""Deterministic Bloom-filter semi-join pruning.

The classic big-data join optimization (Bloom 1970; used by every
warehouse engine, and by Spark itself as runtime row-level filtering
when ``spark.sql.optimizer.runtime.bloomFilter.enabled`` is on): before
shuffling a huge fact table to join a selective dimension, broadcast a
compact bitmap of the dimension's join keys and drop fact rows whose
key can't possibly match. False positives only cost a little extra
shuffle — the join itself removes them — so the transform is
result-exact by construction, which is why the conformance oracle for
the composed join is simply the plain SQL join.

Exposing it as an explicit operator (rather than relying on the
optimizer's heuristic) matters at 100 TB: the pipeline author knows the
dimension side is selective (e.g. "customers in one nation"), and the
pruning happens at scan time, before ANY exchange of the fact table.

Design:

- the filter is DETERMINISTIC: bit positions are
  ``pmod(xxhash64(key, seed_i), m)`` for k fixed seeds — identical on
  any cluster layout, so pruned row sets are reproducible run-to-run.
- the bitmap is built DISTRIBUTIVELY: each dim key contributes k
  (word, bit) pairs, one ``bit_or`` aggregation folds them into
  ``m/64`` longs. The only driver-side state is that bounded bitmap
  (``m = 2**20`` bits -> 16 K longs -> 128 KiB), the same
  control-plane-collect contract as the IVF centroids
  (`similarity.py`); it is then embedded as a literal array and probed
  with pure JVM bit arithmetic (element_at a literal mask table +
  bitwise AND) inside the
  fact table's scan-side WholeStageCodegen — no UDF, no Python, no
  broadcast-variable pickling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: fixed hash seeds — k = 5 gives FPR ~= 2.2 % at load factor m/n = 10
_SEEDS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _positions(key: Column, m: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(_SEEDS[i])), F.lit(m)) for i in range(k)
    ]


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


#: literal single-bit masks (1 << 0 .. 1 << 63 as signed longs) — lets
#: the bit set/test be element_at + bitwiseAND, since the pyspark
#: shiftleft/shiftright builtins only accept a constant bit count
_MASKS = F.array(
    *[F.lit(_signed64(1 << i)).cast("long") for i in range(64)]
)


def build_bloom(
    dim: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> list[int]:
    """Fold the dimension's keys into an ``m_bits``-bit Bloom bitmap,
    returned as ``m_bits / 64`` longs (the bounded control-plane
    collect documented above)."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64: {m_bits}")
    if not 1 <= k <= len(_SEEDS):
        raise ValueError(f"k must be in [1, {len(_SEEDS)}]: {k}")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    contrib = dim.select(pos).select(
        (F.col("p") / 64).cast("long").alias("w"),
        F.element_at(_MASKS, (F.col("p") % 64).cast("int") + 1).alias("b"),
    )
    words = [0] * (m_bits // 64)
    for r in contrib.groupBy("w").agg(F.bit_or("b").alias("b")).collect():
        words[r["w"]] = r["b"]
    return words


def bloom_might_contain(
    words: list[int], key: Column, m_bits: int, k: int = 5
) -> Column:
    """JVM-side membership probe: AND over the k bit tests against the
    literal bitmap array. Stays inside codegen — element_at + shift +
    bitwise AND are all built-ins."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    test = None
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        mask = F.element_at(_MASKS, (p % 64).cast("int") + 1)
        bit = word.bitwiseAND(mask) != 0
        test = bit if test is None else (test & bit)
    return test


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """``fact JOIN dim ON on`` with the fact side Bloom-pruned before
    the exchange. Result-exact vs the plain join for ``inner`` and
    ``left_semi`` (false positives are eliminated by the join); the
    broadcast of the (small) dim side is still requested so Catalyst
    keeps the fact table un-shuffled end to end."""
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(f"bloom pruning is result-exact only for inner/semi: {how}")
    words = build_bloom(dim, on, m_bits=m_bits, k=k)
    pruned = fact.filter(bloom_might_contain(words, F.col(on), m_bits, k=k))
    return pruned.join(F.broadcast(dim), on, how)
