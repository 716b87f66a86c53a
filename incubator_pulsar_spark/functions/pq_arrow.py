"""Arrow/numpy twins of the PQ-family hot paths (optimization r13).

The PQ encode and ADC-scan stages were pure-JVM column expressions
built from higher-order functions (``F.aggregate``/``F.zip_with``/
``F.transform``). Catalyst evaluates lambda functions INTERPRETED —
they never enter whole-stage codegen — so the per-row cost is one
boxed lambda invocation per array element: the measured sf0.1 profile
put ~1.5 s of a 1.8 s encode+write and ~1.4 s of a 1.8 s ADC probe in
exactly these expressions (plans/r13 profile; guide §4.2's "hand whole
batches to vectorized native libraries").

These kernels compute the SAME values:

- every sequential fold (``dot``, ``_d2`` via the dot expansion) is
  replayed as a vectorized left-to-right loop over the dimension axis
  — per-element IEEE adds in the identical order, so pre-round values
  are bit-identical to the JVM fold, NOT merely close (no BLAS in the
  exactness-bearing folds);
- ``F.round(double, n)`` (BigDecimal-on-shortest-repr, HALF_UP) is
  replayed by ``round_spark``: a vectorized nearest-integer fast path
  plus an exact ``Decimal(repr(x))`` re-check inside a generous band
  around the .5 boundary where binary scaling could disagree with
  decimal rounding — the rounding is provably Spark's, not
  coincidentally Spark's;
- argmin/argmax tie rules are first-occurrence on both sides
  (``array_position(xs, array_min(xs))`` == ``np.argmin``), and the
  probe-cell selection replays the struct array_sort+reverse order
  (ties on equal score pick the higher cell index).

Scale posture is unchanged: the encode stays map-only (mapInPandas,
codebooks in the task closure — the broadcast-data-column payload,
shipped once per task instead of re-evaluated per row), and the ADC
scan still reads only the pruned code table; the query table is built
driver-side from the COLLECTED query batch, which is the same
boundedness contract as the previous ``F.broadcast(qt)`` (a broadcast
IS a driver collect + ship).
"""

from __future__ import annotations

import decimal
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "round_spark", "seq_dot_many", "cosine_rows", "np_rotate",
    "encode_pq", "encode_ivfpq", "query_table", "select_probe_cells",
    "adc_scan",
]


# ------------------------------------------------------------------ exact ops

def round_spark(a: np.ndarray, nd: int) -> np.ndarray:
    """Vectorized twin of Spark ``F.round(double_col, nd)``.

    Spark rounds the SHORTEST-REPR decimal of the double, HALF_UP
    (``BigDecimal.valueOf``). Away from the .5 boundary that equals
    nearest-integer on the scaled binary value (both pick the decimal
    k·10^-nd nearest the input, and k/10^nd is a correctly-rounded
    float division on both sides). Within a band around the boundary
    the exact Decimal path decides. The band is MAGNITUDE-RELATIVE
    (max(1e-6, |y|·1e-15) — ADVICE r13): the float64 scaling error is
    ~ulp(y) ≈ |y|·2.2e-16, so a fixed 1e-6 band stops covering it
    once |y| ≳ 8.6e9 and large-magnitude .5-boundary values could
    take the fast path with a flipped frac; the relative term keeps
    the exact path covering ≥ 4× the worst-case scaling error at
    every magnitude."""
    a = np.asarray(a, dtype=np.float64)
    scale = float(10 ** nd)
    y = a * scale
    f = np.floor(y)
    frac = y - f
    k = f + (frac >= 0.5)
    near = np.abs(frac - 0.5) < np.maximum(1e-6, np.abs(y) * 1e-15)
    if near.any():
        flat = k.reshape(-1)
        src = a.reshape(-1)
        one = decimal.Decimal(1)
        with decimal.localcontext() as ctx:
            ctx.prec = 60  # quantize must never overflow at any float64
            for i in np.nonzero(near.reshape(-1))[0]:
                d = decimal.Decimal(repr(float(src[i]))).scaleb(nd)
                flat[i] = float(d.quantize(
                    one, rounding=decimal.ROUND_HALF_UP))
        k = flat.reshape(k.shape)
    return k / scale


def _seq_self_dot(X: np.ndarray) -> np.ndarray:
    """Left-to-right fold of X[:, j]² — the JVM ``dot(a, a)``."""
    acc = np.zeros(X.shape[0], dtype=np.float64)
    for j in range(X.shape[1]):
        acc = acc + X[:, j] * X[:, j]
    return acc


def seq_dot_many(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, d) × (c, d) → (n, c), each entry the exact left-to-right
    sequential fold of the JVM ``dot`` column."""
    acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for j in range(X.shape[1]):
        acc = acc + X[:, j, None] * C[:, j]
    return acc


def _seq_dot_scalar(v) -> float:
    acc = 0.0
    for x in v:
        acc = acc + float(x) * float(x)
    return acc


def cosine_rows(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Round-9 cosine of every row of X against every row of C with
    the fold path's exact zero-norm rule — the ``_cell_scores`` twin.
    Norms are sequential folds on both sides."""
    return round_spark(_cosine_raw(X, C), 9)


def np_rotate(X: np.ndarray, rotation) -> np.ndarray:
    """``_apply_rotation`` twin: (perm, signs) applies the exact
    signed permutation (negation = IEEE sign-bit flip); a dense matrix
    applies output[j] = sequential fold of R[j][i]·v[i] (the
    ``rotate_embeddings`` order)."""
    if rotation is None:
        return X
    if isinstance(rotation, tuple):
        perm, signs = rotation
        out = X[:, perm].copy()
        neg = np.array(signs) < 0
        out[:, neg] = -out[:, neg]
        return out
    R = np.asarray(rotation, dtype=np.float64)
    out = np.zeros((X.shape[0], R.shape[0]), dtype=np.float64)
    for j in range(R.shape[0]):
        acc = np.zeros(X.shape[0], dtype=np.float64)
        for i in range(R.shape[1]):
            acc = acc + R[j, i] * X[:, i]
        out[:, j] = acc
    return out


# --------------------------------------------------------------- PQ encoding

def _codes_for(X: np.ndarray, books: list) -> np.ndarray:
    """(n, m) int32 codes: per subspace the round-9 first-min d2
    codeword, d2 via the exact dot expansion the JVM ``_d2`` uses
    ((daa − 2.0·dab) + dbb, that add order)."""
    m = len(books)
    dsub = len(books[0][0])
    codes = np.empty((X.shape[0], m), dtype=np.int32)
    for s in range(m):
        sub = X[:, s * dsub:(s + 1) * dsub]
        daa = _seq_self_dot(sub)
        cw = np.asarray(books[s], dtype=np.float64)  # (ksub, dsub)
        dab = seq_dot_many(sub, cw)                  # (n, ksub)
        dbb = np.array([_seq_dot_scalar(c) for c in cw])
        d2 = round_spark((daa[:, None] - 2.0 * dab) + dbb[None, :], 9)
        codes[:, s] = np.argmin(d2, axis=1)          # first-min tie
    return codes


def _vec_matrix(series: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float64) for v in series])


def encode_pq(embeddings: DataFrame, books: list, *,
              id_col: str = "vec_id", vec_col: str = "embedding",
              rotation=None) -> DataFrame:
    """Arrow twin of the ``pq_encode`` expression pipeline: map-only
    mapInPandas, one output frame per Arrow batch."""
    from .similarity import as_double_array

    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          as_double_array(F.col(vec_col)).alias("vec"))
    id_t = e.schema["vec_id"].dataType
    schema = T.StructType([
        T.StructField("vec_id", id_t),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np_rotate(_vec_matrix(pdf["vec"]), rotation)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values,
                                "codes": list(_codes_for(X, books))})

    return e.mapInPandas(fn, schema)


def encode_ivfpq(df: DataFrame, cents: list, books: list, *,
                 residual: bool, rotation=None,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Arrow twin of ``_ivfpq_encode``: cell by round-9 first-max
    cosine in RAW space, optional exact residual subtraction, optional
    rotation, then PQ codes."""
    from .similarity import as_double_array

    e = df.select(F.col(id_col).alias("vec_id"),
                  as_double_array(F.col(vec_col)).alias("vec"))
    id_t = e.schema["vec_id"].dataType
    schema = T.StructType([
        T.StructField("vec_id", id_t),
        T.StructField("cell", T.IntegerType()),
        T.StructField("codes", T.ArrayType(T.IntegerType())),
    ])
    C = np.asarray(cents, dtype=np.float64)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = _vec_matrix(pdf["vec"])
            cell = np.argmax(cosine_rows(X, C), axis=1).astype(np.int32)
            V = X - C[cell] if residual else X
            V = np_rotate(V, rotation)
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values,
                                "cell": cell,
                                "codes": list(_codes_for(V, books))})

    return e.mapInPandas(fn, schema)


# ------------------------------------------------------------- ADC probe side

def query_table(qv: np.ndarray, books: list) -> np.ndarray:
    """(nq, m, ksub) round-9 ADC distance table — the
    ``_pq_query_table`` values, computed driver-side over the
    collected (bounded, previously-broadcast) query batch."""
    m = len(books)
    dsub = len(books[0][0])
    qt = np.empty((qv.shape[0], m, len(books[0])), dtype=np.float64)
    for s in range(m):
        sub = qv[:, s * dsub:(s + 1) * dsub]
        daa = _seq_self_dot(sub)
        cw = np.asarray(books[s], dtype=np.float64)
        dab = seq_dot_many(sub, cw)
        dbb = np.array([_seq_dot_scalar(c) for c in cw])
        qt[:, s, :] = round_spark((daa[:, None] - 2.0 * dab) + dbb[None, :], 9)
    return qt


def select_probe_cells(qv: np.ndarray, cents: list,
                       nprobe: int) -> list[list[int]]:
    """Per-query nprobe cells — the ``_ivfpq_probe`` selection rule:
    struct(score, index) array_sort ascending + reverse + slice, i.e.
    descending (score, index): ties on equal round-9 score pick the
    HIGHER cell index first."""
    scores = cosine_rows(qv, np.asarray(cents, dtype=np.float64))
    out = []
    for r in scores:
        pairs = sorted(((float(s), i) for i, s in enumerate(r)),
                       reverse=True)
        out.append([i for _, i in pairs[:nprobe]])
    return out


def adc_scan(enc: DataFrame, qids: list, q_id_type, *,
             flat_qt: np.ndarray | None = None,
             cell_tables: dict[int, tuple[np.ndarray, np.ndarray]]
             | None = None) -> DataFrame:
    """Arrow twin of the scored stage (codes ⋈ query table → round-6
    ADC distance, the left-to-right lookup fold).

    ``flat_qt`` (nq, m, ksub): every query scores every row (the flat
    PQ crossJoin). ``cell_tables``: {cell → (qpos, table)} where qpos
    indexes into ``qids`` and table is (len(qpos), m, ksub) — the IVF
    cell equi-join, including the residual form where each (query,
    cell) pair has its own table. Output volume and values identical
    to the former broadcast join."""
    id_t = enc.schema["vec_id"].dataType
    schema = T.StructType([
        T.StructField("query_id", q_id_type),
        T.StructField("vec_id", id_t),
        T.StructField("adc_d2", T.DoubleType()),
    ])
    qids_arr = np.array(qids, dtype=object)
    has_cell = cell_tables is not None
    cols = ["vec_id", "codes"] + (["cell"] if has_cell else [])
    src = enc.select(*cols)
    if flat_qt is not None:
        m = flat_qt.shape[1]
    elif cell_tables:
        m = next(iter(cell_tables.values()))[1].shape[1]
    else:
        m = 0  # no queries: the kernel emits nothing

    def _adc(table: np.ndarray, codes: np.ndarray) -> np.ndarray:
        # table (nq, m, ksub), codes (n, m) → (nq, n); fold in s order
        nq = table.shape[0]
        acc = np.zeros((nq, codes.shape[0]), dtype=np.float64)
        rows = np.arange(nq)[:, None]
        for s in range(m):
            acc = acc + table[:, s, :][rows, codes[:, s]]
        return round_spark(acc, 6)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            codes = np.array([np.asarray(c) for c in pdf["codes"]],
                             dtype=np.int64)
            vids = pdf["vec_id"].values
            out_q, out_v, out_d = [], [], []
            if has_cell:
                cellv = pdf["cell"].values.astype(np.int64)
                for c in np.unique(cellv):
                    hit = cell_tables.get(int(c))
                    if hit is None or not len(hit[0]):
                        continue
                    qpos, table = hit
                    sel = cellv == c
                    d = _adc(table, codes[sel])
                    out_q.append(np.repeat(qids_arr[qpos], int(sel.sum())))
                    out_v.append(np.tile(vids[sel], len(qpos)))
                    out_d.append(d.reshape(-1))
            else:
                d = _adc(flat_qt, codes)
                out_q.append(np.repeat(qids_arr, codes.shape[0]))
                out_v.append(np.tile(vids, flat_qt.shape[0]))
                out_d.append(d.reshape(-1))
            if not out_q:
                continue
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "adc_d2": np.concatenate(out_d),
            })

    return src.mapInPandas(fn, schema)


# ------------------------------------------- SQ8 / BQ integer-exact twins
#
# The scalar-quantization and binary-quantization scans are pure
# integer arithmetic (sum of squared code deltas; popcount of XOR), so
# their numpy twins are exact by construction — no fold-order or
# rounding considerations at all. The encodes use only exact IEEE ops
# (mul/div/add/floor, same order) and bit shifts.

def encode_sq8(df: DataFrame, mins, maxs, *, id_col: str = "vec_id",
               vec_col: str = "embedding",
               out_col: str = "codes") -> DataFrame:
    """Arrow twin of ``sq8_encode_col``:
    clamp(floor((x−mn)·255/(mx−mn) + 0.5), 0, 255); degenerate dims
    (mx == mn) encode 0. Exact IEEE ops in the identical order."""
    from .similarity import as_double_array

    e = df.select(F.col(id_col).alias("vec_id"),
                  as_double_array(F.col(vec_col)).alias("vec"))
    id_t = e.schema["vec_id"].dataType
    schema = T.StructType([
        T.StructField("vec_id", id_t),
        T.StructField(out_col, T.ArrayType(T.IntegerType())),
    ])
    mn = np.asarray(mins, dtype=np.float64)
    mx = np.asarray(maxs, dtype=np.float64)
    ok = mx > mn
    span = np.where(ok, mx - mn, 1.0)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = _vec_matrix(pdf["vec"])
            raw = np.floor((X - mn) * 255.0 / span + 0.5)
            codes = np.clip(raw, 0, 255).astype(np.int32)
            codes[:, ~ok] = 0
            yield pd.DataFrame({"vec_id": pdf["vec_id"].values,
                                out_col: list(codes)})

    return e.mapInPandas(fn, schema)


def sq8_codes_np(qv: np.ndarray, mins, maxs) -> np.ndarray:
    """Driver-side ``sq8_encode_col`` over collected query vectors."""
    mn = np.asarray(mins, dtype=np.float64)
    mx = np.asarray(maxs, dtype=np.float64)
    ok = mx > mn
    span = np.where(ok, mx - mn, 1.0)
    codes = np.clip(np.floor((qv - mn) * 255.0 / span + 0.5), 0, 255) \
        .astype(np.int64)
    codes[:, ~ok] = 0
    return codes


def int_scan(table: DataFrame, qids: list, qmat: np.ndarray, q_id_type,
             *, code_col: str, out_col: str, metric: str) -> DataFrame:
    """Arrow twin of the SQ8 integer crossJoin scan: for every table
    row and query emit (query_id, vec_id, dist) — sum of squared code
    deltas, exact integer arithmetic in any order. (A Hamming twin was
    measured and REVERTED: bit packing + popcount are cheap enough in
    the JVM that the Python stage costs more than it saves.)"""
    id_t = table.schema["vec_id"].dataType
    schema = T.StructType([
        T.StructField("query_id", q_id_type),
        T.StructField("vec_id", id_t),
        T.StructField(out_col, T.LongType()),
    ])
    qids_arr = np.array(qids, dtype=object)
    nq = qmat.shape[0]

    def _dist(C: np.ndarray) -> np.ndarray:
        assert metric == "sq8", metric
        d = C[None, :, :].astype(np.int64) - qmat[:, None, :]
        return np.sum(d * d, axis=2)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            C = np.array([np.asarray(c) for c in pdf[code_col]],
                         dtype=np.int64)
            vids = pdf["vec_id"].values
            d = _dist(C)
            yield pd.DataFrame({
                "query_id": np.repeat(qids_arr, C.shape[0]),
                "vec_id": np.tile(vids, nq),
                out_col: d.reshape(-1),
            })

    return table.select("vec_id", code_col).mapInPandas(fn, schema)


def _cosine_raw(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Unrounded cosine matrix with the fold path's zero-norm rule —
    the shared core of ``cosine_rows`` (round-9) and the kmeans final
    similarity (round-6 of the RAW cosine, not of the round-9)."""
    nx = np.sqrt(_seq_self_dot(X))
    nc = np.array([np.sqrt(_seq_dot_scalar(c)) for c in C])
    dots = seq_dot_many(X, C)
    den = nx[:, None] * nc[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dots / den
    return np.where((nx[:, None] > 0) & (nc[None, :] > 0), cos, 0.0)


def assign_clusters(df: DataFrame, cents: list, *, id_col: str,
                    vec_col: str, final_sim: bool = False) -> DataFrame:
    """Arrow twin of the ``_attach_centroids`` + ``_nearest_cell``
    assignment pass (argmax of round-9 cosine, first-max tie): emits
    (id, cluster, vec) for the Lloyd iteration, or (id, cluster,
    cosine_sim) with the round-6 RAW cosine to the assigned centroid
    for the kmeans output tail."""
    id_t = df.schema[id_col].dataType
    fields = [T.StructField(id_col, id_t),
              T.StructField("cluster", T.IntegerType())]
    if final_sim:
        fields.append(T.StructField("cosine_sim", T.DoubleType()))
    else:
        fields.append(T.StructField(vec_col,
                                    T.ArrayType(T.DoubleType())))
    schema = T.StructType(fields)
    C = np.asarray(cents, dtype=np.float64)
    src = df.select(id_col, vec_col)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = _vec_matrix(pdf[vec_col])
            raw = _cosine_raw(X, C)
            cl = np.argmax(round_spark(raw, 9), axis=1).astype(np.int32)
            out = {id_col: pdf[id_col].values, "cluster": cl}
            if final_sim:
                out["cosine_sim"] = round_spark(
                    raw[np.arange(len(cl)), cl], 6)
            else:
                out[vec_col] = pdf[vec_col].values
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, schema)
