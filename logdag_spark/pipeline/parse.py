"""Stage 1 — vectorized template parse (token stream -> gid).

The reference consumes lines already classified into templates by amulog
(/root/reference/logdag/source/src_amulog.py:44-66; upstream regex rules in
/root/reference/tutorial/ssh_parser.py:10-27).  Here the classification is
part of the engine: match each ``tokens array<int32>`` against the
template dictionary (constant positions must equal, wildcard positions
match anything) — grok semantics over token ids.

Two interchangeable implementations (tests assert they agree):

* ``parse_tokens`` — pure Catalyst: broadcast-join candidates on array
  length, validate constants with ``zip_with``/``forall``.  Whole-stage
  codegen, zero Python.  Default for the hot path.
* ``parse_tokens_pandas`` — Arrow-batched ``pandas_udf``: templates are
  shipped once per executor via closure capture; each batch is matched
  with numpy broadcasting grouped by token-array length.  This is the
  north-rule "vectorized pandas/Arrow UDF" form and the extension point
  for fuzzier matchers (regex/grok over string logs lives in
  ``operators/text.py``).

Invariant checked by tests: the ``tokens`` column passes through
bit-identical (per-row token-array equality, BASELINE.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_tokens(df: DataFrame, template_dim: DataFrame) -> DataFrame:
    """Assign ``gid`` by template match; unmatched rows get gid NULL.

    Plan shape: ``df BROADCAST-JOIN templates ON n_tok = length`` (small
    dim side, no shuffle of the fact table) then a codegen'd
    ``forall(zip_with(...))`` constant check.  At 10^12 rows this is a
    map-only stage — no shuffle at all.
    """
    tmpl = template_dim.select(
        F.col("gid").alias("_t_gid"), F.col("length").alias("_t_len"), F.col("pattern")
    )
    matched = (
        df.join(F.broadcast(tmpl), df["n_tok"] == tmpl["_t_len"], "left")
        .where(
            F.col("pattern").isNull()
            | F.forall(
                F.zip_with("pattern", "tokens", lambda p, t: (p < 0) | (p == t)),
                lambda x: x,
            )
        )
        .drop("_t_len", "pattern")
        .withColumnRenamed("_t_gid", "gid")
    )
    # a row matching no template keeps gid NULL via the left join; a row
    # matching one template yields exactly one surviving joined row
    # (template head constants are distinct, so >1 match is impossible by
    # construction — asserted in tests).
    return matched


def parse_tokens_pandas(df: DataFrame, template_dim: DataFrame) -> DataFrame:
    """Same semantics through an Arrow-batched pandas UDF (no per-row Python)."""
    specs = [
        (int(r["gid"]), np.asarray(r["pattern"], dtype=np.int64))
        for r in template_dim.select("gid", "pattern").collect()
    ]
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for length in {len(p) for _, p in specs}:
        group = [(g, p) for g, p in specs if len(p) == length]
        gids = np.asarray([g for g, _ in group], dtype=np.int64)
        pats = np.stack([p for _, p in group])  # (n_templates, length)
        by_len[length] = (gids, pats)

    @F.pandas_udf(T.IntegerType())
    def _match(tokens: pd.Series) -> pd.Series:
        out = np.full(len(tokens), -1, dtype=np.int64)
        lengths = tokens.map(len).to_numpy()
        for length, (gids, pats) in by_len.items():
            sel = np.nonzero(lengths == length)[0]
            if sel.size == 0:
                continue
            mat = np.stack(tokens.iloc[sel].to_numpy())  # (n_rows, length)
            # (n_rows, n_templates, length) broadcast compare; wildcard = -1
            ok = ((pats[None, :, :] == mat[:, None, :]) | (pats[None, :, :] < 0)).all(
                axis=2
            )
            hit_rows, hit_tmpl = np.nonzero(ok)
            out[sel[hit_rows]] = gids[hit_tmpl]
        return pd.Series(out).where(pd.Series(out) >= 0).astype("Int32")

    return df.withColumn("gid", _match("tokens").cast("int"))
