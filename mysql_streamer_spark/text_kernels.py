"""Vectorized Arrow kernels for the shingle pipeline (guide §4.2).

Spark evaluates higher-order array lambdas (``transform`` /
``array_join`` / ``array_distinct``) per ELEMENT in the interpreted
expression evaluator — they never enter whole-stage codegen — so k-shingling
a 300-token document costs ~300 interpreted lambda frames plus a sliced
array allocation per shingle. Handing whole Arrow batches to a compiled
``str.split``/``str.join`` loop does the same work ~6x faster (measured at
sf0.1, min-of-5 in-session A/B: distinct-shingle postings 0.47s vs 3.11s
for the JVM expression chain), and the fused signature kernel removes the
per-shingle interpreted ``md5`` transform the same way.

Exactness contract: every kernel is byte-identical to the JVM expression
composition it replaces — ``str.split(' ')`` == ``F.split(col, ' ')``
(literal single-space pattern, trailing empties kept by both),
``' '.join`` == ``array_join(..., ' ')``, ``dict.fromkeys`` == first-
occurrence ``array_distinct``, ``hashlib.md5(...).hexdigest()`` ==
``md5(...)`` (lowercase hex), and ``min`` over 4-char ASCII-hex slices ==
``array_min`` string comparison. Differentially pinned against the JVM
builders in tests/test_text_kernels.py; the builders in text.py stay the
lock-step source of the DuckDB oracle SQL.

Scale shape: map-only (no shuffle), one Python worker pass per task with
Arrow batches both ways; only (id, text) crosses the boundary (callers
select first — guide §4.1) and the returned postings/sets are the same
rows the JVM path produced. Python-worker memory must be budgeted via
``spark.executor.pyspark.memory`` on a real cluster like every other
mapInArrow stage in this repo (secure wire, multimodal).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

from mysql_streamer_spark.text import (
    MINHASH_SLICE_CHARS,
    SHINGLE_K,
    TOKEN_DELIM,
)


def _distinct_shingles(text: str | None, k: int) -> dict[str, None] | None:
    """First-occurrence-ordered distinct k-token shingles, or None for a
    null/too-short document (the JVM path's size(sset) > 0 filter)."""
    if text is None:
        return None
    toks = text.split(TOKEN_DELIM)
    n = len(toks) - k + 1
    if n <= 0:
        return None
    join = TOKEN_DELIM.join
    return dict.fromkeys(join(toks[i : i + k]) for i in range(n))


def shingle_postings(
    docs: DataFrame,
    k: int = SHINGLE_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, shingle) postings of the DISTINCT k-token shingles per doc —
    the rows ``explode(array_distinct(shingles_col(tokens_col)))`` yields
    after the ``size(sset) > 0`` filter, in one Arrow kernel."""
    import pyarrow as pa

    src = docs.select(id_col, text_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column(0).to_pylist()
            texts = b.column(1).to_pylist()
            out_ids: list[int] = []
            out_sh: list[str] = []
            for did, t in zip(ids, texts):
                seen = _distinct_shingles(t, k)
                if not seen:
                    continue
                out_ids.extend([did] * len(seen))
                out_sh.extend(seen)
            yield pa.record_batch(
                [pa.array(out_ids, pa.int64()), pa.array(out_sh, pa.string())],
                names=[id_col, "shingle"],
            )

    return src.mapInArrow(kernel, f"{id_col} long, shingle string")


def doc_repetition_stats(
    docs: DataFrame,
    k: int = SHINGLE_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_distinct_tokens, n_shingles, top_shingle_count):
    the per-document repetition statistics, map-only — replaces the
    (doc_id, shingle) explode + two hash-aggregates + join with one pass
    (every stat is a within-document property). Reproduces the JVM
    composition exactly, including ``size(NULL) = -1`` for null text and
    ``top_shingle_count = 0`` where no shingles exist (the left-join
    coalesce)."""
    import pyarrow as pa

    src = docs.select(id_col, text_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from collections import Counter

        for b in batches:
            n_tok: list[int] = []
            n_dis: list[int] = []
            n_sh: list[int] = []
            top: list[int] = []
            for t in b.column(1).to_pylist():
                if t is None:
                    # split(NULL) -> NULL tokens: size(NULL) is NULL, but
                    # the shingle CASE yields array() -> n_shingles = 0
                    n_tok.append(None)
                    n_dis.append(None)
                    n_sh.append(0)
                    top.append(0)
                    continue
                toks = t.split(TOKEN_DELIM)
                n = len(toks) - k + 1
                n_tok.append(len(toks))
                n_dis.append(len(set(toks)))
                if n <= 0:
                    n_sh.append(0)
                    top.append(0)
                    continue
                join = TOKEN_DELIM.join
                counts = Counter(join(toks[i : i + k]) for i in range(n))
                n_sh.append(n)
                top.append(max(counts.values()))
            yield pa.record_batch(
                [
                    b.column(0),
                    pa.array(n_tok, pa.int32()),
                    pa.array(n_dis, pa.int32()),
                    pa.array(n_sh, pa.int32()),
                    pa.array(top, pa.int64()),
                ],
                names=[
                    id_col,
                    "n_tokens",
                    "n_distinct_tokens",
                    "n_shingles",
                    "top_shingle_count",
                ],
            )

    return src.mapInArrow(
        kernel,
        f"{id_col} long, n_tokens int, n_distinct_tokens int, "
        "n_shingles int, top_shingle_count long",
    )


def adjacent_token_pairs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(w1, w2) adjacent-token pairs with w1 != w2, deduplicated PER
    DOCUMENT — feeds a corpus-level distinct, which is unchanged by the
    per-doc dedup (distinct of a multiset ignores multiplicity). Replaces
    the interpreted ``transform(sequence(...), i -> named_struct(...))``
    bigram explode."""
    import pyarrow as pa

    src = docs.select(text_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            w1s: list[str] = []
            w2s: list[str] = []
            for t in b.column(0).to_pylist():
                if t is None:
                    continue
                toks = t.split(TOKEN_DELIM)
                seen = dict.fromkeys(
                    p for p in zip(toks, toks[1:]) if p[0] != p[1]
                )
                for a, c in seen:
                    w1s.append(a)
                    w2s.append(c)
            yield pa.record_batch(
                [pa.array(w1s, pa.string()), pa.array(w2s, pa.string())],
                names=["w1", "w2"],
            )

    return src.mapInArrow(kernel, "w1 string, w2 string")


def shingle_sets(
    docs: DataFrame,
    k: int = SHINGLE_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep, sset): the DISTINCT k-token shingle set per doc with
    optional passthrough columns — the frame
    ``array_distinct(shingles_col(tokens_col))`` + ``size(sset) > 0``
    produces, in one Arrow kernel."""
    import pyarrow as pa

    src = docs.select(id_col, *keep, text_col)

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            texts = b.column(len(keep) + 1).to_pylist()
            mask: list[bool] = []
            out_sets: list[list[str]] = []
            for t in texts:
                seen = _distinct_shingles(t, k)
                ok = bool(seen)
                mask.append(ok)
                if ok:
                    out_sets.append(list(seen))
            m = pa.array(mask, pa.bool_())
            kept = [pc.filter(b.column(j), m) for j in range(len(keep) + 1)]
            yield pa.record_batch(
                kept + [pa.array(out_sets, pa.list_(pa.string()))],
                names=[id_col, *keep, "sset"],
            )

    keep_schema = "".join(
        f", {c} {docs.schema[c].dataType.simpleString()}" for c in keep
    )
    return src.mapInArrow(
        kernel, f"{id_col} long{keep_schema}, sset array<string>"
    )


def shingle_sets_signed(
    docs: DataFrame,
    n_sigs: int,
    k: int = SHINGLE_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sset, sig_0..sig_{n-1}): distinct k-token shingles plus the
    sliced-min-md5 MinHash signature, fused into one kernel pass.

    sig_i == ``array_min(transform(shingles, s -> substring(md5(s),
    1 + i*W, W)))`` with W = MINHASH_SLICE_CHARS — computed over the
    DISTINCT set, which is identical to the raw shingle bag's min
    (duplicates never change a min). Feeds ``lsh_bands(pre_signed=True)``
    and the exact-Jaccard verify without any interpreted per-shingle JVM
    lambda."""
    import pyarrow as pa

    if not 0 < n_sigs * MINHASH_SLICE_CHARS <= 32:
        raise ValueError(f"n_sigs must be in (0, {32 // MINHASH_SLICE_CHARS}]")
    src = docs.select(id_col, text_col)
    w = MINHASH_SLICE_CHARS
    sig_names = [f"sig_{i}" for i in range(n_sigs)]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from hashlib import md5

        for b in batches:
            ids = b.column(0).to_pylist()
            texts = b.column(1).to_pylist()
            out_ids: list[int] = []
            out_sets: list[list[str]] = []
            out_sigs: list[list[str]] = [[] for _ in range(n_sigs)]
            for did, t in zip(ids, texts):
                seen = _distinct_shingles(t, k)
                if not seen:
                    continue
                hexes = [md5(s.encode()).hexdigest() for s in seen]
                out_ids.append(did)
                out_sets.append(list(seen))
                for i in range(n_sigs):
                    lo = i * w
                    out_sigs[i].append(min(h[lo : lo + w] for h in hexes))
            yield pa.record_batch(
                [
                    pa.array(out_ids, pa.int64()),
                    pa.array(out_sets, pa.list_(pa.string())),
                ]
                + [pa.array(s, pa.string()) for s in out_sigs],
                names=[id_col, "sset", *sig_names],
            )

    sig_schema = ", ".join(f"{s} string" for s in sig_names)
    return src.mapInArrow(
        kernel, f"{id_col} long, sset array<string>, {sig_schema}"
    )
