"""SQ8 scalar quantization: 4x-compressed vectors with integer-dot search.

The classic memory-reduction path complementing IVF-PQ (reference index
family, SURVEY §2.4): each dimension is affinely mapped to an 8-bit code on
a per-dimension [min, max] grid learned from the corpus. Search scores are
integer dot products of code arrays — exact integer arithmetic, so results
are bit-reproducible by any engine (the correctness oracle replays the
whole pipeline in SQL).

Scale notes
-----------
- Training is one distributed pass: posexplode -> per-dimension min/max
  (map-side combined; the shuffle carries d rows per partition, not data).
- The grid (2 x d doubles) is a driver-side literal folded into the encode
  expression — no join, no broadcast table needed.
- Encoding is a pure per-row projection (whole-stage codegen); codes are
  array<int> and 4x smaller than float32 — at 100 TB that is the
  difference between spilling and an in-memory scan.
- Search is zip_with/aggregate over int arrays + TakeOrderedAndProject —
  the same declarative top-k shape as the exact path (`operators.topk`),
  just over compressed input.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sq_train(df: DataFrame, vec_col: str = "vector") -> tuple[list[float], list[float]]:
    """Learn the per-dimension [min, max] grid in one distributed pass.

    Returns (mins, maxs) as plain lists of length d — small driver-side
    artifacts, like the reference's trained-index parameters.
    """
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min(F.col("x").cast("double")).alias("mn"),
             F.max(F.col("x").cast("double")).alias("mx"))
        .orderBy("pos")
        .collect()
    )
    return [r.mn for r in rows], [r.mx for r in rows]


def _encode_expr(vec: Column, mins: Sequence[float], maxs: Sequence[float]) -> Column:
    """codes[i] = clamp(floor((x - mn) * 255 / (mx - mn) + 0.5), 0, 255).

    floor(v + 0.5) rather than round() for cross-engine stability; a
    degenerate dimension (mx == mn) encodes to 0.
    """
    mn_arr = F.array(*[F.lit(float(m)) for m in mins])
    mx_arr = F.array(*[F.lit(float(m)) for m in maxs])
    zipped = F.zip_with(
        F.zip_with(F.transform(vec, lambda x: x.cast("double")), mn_arr,
                   lambda x, m: F.struct(x.alias("x"), m.alias("mn"))),
        mx_arr,
        lambda s, mx: F.when(
            mx == s["mn"], F.lit(0)
        ).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(255),
                    F.floor(
                        (s["x"] - s["mn"]) * F.lit(255.0) / (mx - s["mn"])
                        + F.lit(0.5)
                    ).cast("int"),
                ),
            )
        ),
    )
    return zipped


def sq_encode(
    df: DataFrame,
    mins: Sequence[float],
    maxs: Sequence[float],
    vec_col: str = "vector",
    code_col: str = "codes",
) -> DataFrame:
    """Append the SQ8 code array; drop the float vector (the point of SQ)."""
    return df.withColumn(code_col, _encode_expr(F.col(vec_col), mins, maxs)).drop(
        vec_col
    )


def encode_query(
    q: Sequence[float], mins: Sequence[float], maxs: Sequence[float]
) -> list[int]:
    """Driver-side encoding of a vector on the same grid (mirrors
    ``sq_encode`` bit-for-bit; used for storage-side parity checks)."""
    import math

    out = []
    for x, mn, mx in zip(q, mins, maxs):
        if mx == mn:
            out.append(0)
        else:
            v = math.floor((float(x) - mn) * 255.0 / (mx - mn) + 0.5)
            out.append(max(0, min(255, int(v))))
    return out


WEIGHT_SCALE = 1 << 20


def query_weights(
    q: Sequence[float],
    mins: Sequence[float],
    maxs: Sequence[float],
    scale: int = WEIGHT_SCALE,
) -> list[int]:
    """Integerized asymmetric-SQ query weights.

    Dequantized score  dot(x, q) = sum_i (mn_i + a_i c_i) q_i  with
    ``a_i = (mx_i - mn_i)/255`` splits into a per-query constant
    (sum mn_i q_i — rank-irrelevant) plus ``sum_i (a_i q_i) c_i``. The
    float weight ``a_i q_i`` is quantized to ``round(a_i q_i * scale)`` so
    the scan score is EXACT INTEGER arithmetic — summation-order
    independent, hence bit-reproducible by any SQL engine — while staying
    rank-equivalent to the asymmetric dequantized dot up to 1/scale.
    """
    import math

    out = []
    for x, mn, mx in zip(q, mins, maxs):
        a = (mx - mn) / 255.0
        out.append(int(math.floor(a * float(x) * scale + 0.5)))
    return out


def _int_dot(codes: Column, q_codes: Sequence[int]) -> Column:
    q = F.array(*[F.lit(int(c)) for c in q_codes])
    return F.aggregate(
        F.zip_with(codes.cast("array<long>"), q.cast("array<long>"),
                   lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq_search(
    codes_df: DataFrame,
    queries: Sequence[tuple[int, Sequence[int]]],
    k: int,
    id_col: str = "id",
    code_col: str = "codes",
) -> DataFrame:
    """Asymmetric SQ8 top-k: integer weighted dot over code arrays, one
    scan for all queries (scored columns side by side, then a per-query
    ranked top-k). ``queries`` carries ``query_weights(...)`` vectors.

    Returns (query_id, id, qscore) — qscore is the integer
    ``sum_i w_i * code_i``, rank-equivalent to the dequantized inner
    product (see :func:`query_weights`). Ties break by id ascending,
    deterministic across engines.
    """
    if not queries:
        raise ValueError("sq_search needs at least one query")
    qids = [int(qid) for qid, _ in queries]
    if len(set(qids)) != len(qids):
        raise ValueError("sq_search query ids must be unique")
    # score columns are aliased by POSITION (not by qid) so negative ids
    # can't parse as arithmetic and the stack literals carry the real ids
    scored = codes_df.select(
        F.col(id_col),
        *[
            _int_dot(F.col(code_col), q).alias(f"_s{i}")
            for i, (_, q) in enumerate(queries)
        ],
    )
    # unpivot the per-query score columns to (query_id, qscore) rows, then
    # rank within query — Catalyst bounds the ranked window with
    # WindowGroupLimit (partial top-k before the exchange)
    pairs = ", ".join(f"{qid}L, _s{i}" for i, qid in enumerate(qids))
    long_df = scored.select(
        F.col(id_col),
        F.expr(f"stack({len(queries)}, {pairs}) as (query_id, qscore)"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qscore"), F.asc(id_col)
    )
    return (
        long_df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", F.col(id_col), "qscore")
    )
