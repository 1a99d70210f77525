"""Worker-side page-row builder for the distributed generator.

numpy/pandas-only imports (this module is unpickled inside mapInPandas
workers — see functions/window_kernel.py for why pyspark must stay out).

Determinism: every url's rows derive from ``default_rng([seed, url_id])``
— a pure function of the plan row, independent of which Spark partition
builds it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_EPOCH0 = np.datetime64("2024-01-01T00:00:00", "us")

_VOCAB = np.array(
    [
        "the", "web", "page", "crawl", "data", "spark", "feature", "window",
        "join", "session", "table", "index", "query", "stream", "batch",
        "vector", "text", "token", "hash", "shuffle", "partition", "key",
        "value", "row", "column", "scan", "filter", "group", "sort", "merge",
    ]
)


def build_url_rows(
    url: str, url_id: int, lang: str, n: int, t0: float, seed: int
) -> pd.DataFrame:
    rng = np.random.default_rng([seed, url_id])
    gaps = rng.uniform(30.0, 600.0, size=n)
    big = rng.random(n) < 0.05
    gaps[big] = rng.uniform(1900.0, 7200.0, size=int(big.sum()))
    rel = np.cumsum(gaps) + t0
    warc_ts = _EPOCH0 + (rel * 1e6).astype("int64").astype("timedelta64[us]")
    n_tok = rng.integers(5, 121, size=n)
    all_tok = rng.integers(0, len(_VOCAB), size=int(n_tok.sum()))
    bounds = np.r_[0, np.cumsum(n_tok)]
    words = _VOCAB[all_tok]
    texts = [" ".join(words[bounds[i] : bounds[i + 1]]) for i in range(n)]
    htmls = [f"<html><body>{t}</body></html>".encode() for t in texts]
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": pd.Series(warc_ts),
            "html": htmls,
            "text": texts,
            "lang": lang,
        }
    )


def plan_mapper(seed: int):
    """mapInPandas fn: plan rows (url, url_id, lang, n_rows_url, t0) →
    page rows."""

    def fn(batches):
        for b in batches:
            for row in b.itertuples(index=False):
                yield build_url_rows(
                    row.url, int(row.url_id), row.lang,
                    int(row.n_rows_url), float(row.t0), seed,
                )

    return fn
