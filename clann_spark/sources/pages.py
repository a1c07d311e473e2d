"""Deterministic synthetic Common-Crawl-style pages fixture.

Schema per BASELINE.json input_hint:
  url:string, warc_ts:timestamp, html:binary, text:string, lang:string

plus planted ground truth `dup_pairs_gt(url_a, url_b, jaccard, kind)`
(FIXTURES.md §1). Generation is pure-seeded (numpy default_rng(seed));
the driver never regenerates these — tests call make_pages directly.

The reference's equivalents are the ann-benchmarks HDF5 fixtures with
a ground-truth `distances` dataset (src/utils/mod.rs:25-57) and random
token sets (libpuffinn format/set.hpp test fixtures); planted-mutation
clones adapt that to dedup pairs.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from clann_spark.functions.text import py_shingles, py_wrap_html

VOCAB_SIZE = 4000
LANGS = ["en"] * 9 + ["de"]


def _vocab() -> list[str]:
    rng = np.random.default_rng(7)
    letters = "abcdefghijklmnopqrstuvwxyz"
    out = []
    for i in range(VOCAB_SIZE):
        n = int(rng.integers(3, 10))
        out.append("".join(letters[j] for j in rng.integers(0, 26, n)) + str(i % 10))
    return out


@dataclass
class PagesFixture:
    pages: pd.DataFrame      # url, warc_ts, html, text, lang
    gt_pairs: pd.DataFrame   # url_a, url_b, jaccard, kind


def _jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    return len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0


def make_pages(
    n_base: int = 1000,
    seed: int = 42,
    shingle_k: int = 5,
    dup_frac: float = 0.2,
    skew: bool = False,
) -> PagesFixture:
    """Generate n_base base docs; a seeded dup_frac of them get 1-4
    mutated clones (edit rates 0/2/5/10%, boilerplate injection,
    paragraph reorder) plus long-shared-substring pairs.

    skew=True additionally (a) prefixes 30% of docs with one shared
    boilerplate template and (b) adds 1000 exact copies of doc 0
    (FIXTURES.md §4 — the adversarial mega-bucket fixture).
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    base_ts = datetime(2025, 1, 1)

    texts: list[str] = []
    for _ in range(n_base):
        n_words = int(rng.integers(50, 500))
        texts.append(" ".join(vocab[w] for w in rng.integers(0, VOCAB_SIZE, n_words)))

    boiler = " ".join(vocab[w] for w in rng.integers(0, VOCAB_SIZE, 30))

    rows: list[tuple[str, datetime, str, str]] = []  # url, ts, text, lang
    gt: list[tuple[str, str, float, str]] = []

    def url(i: int, clone: int = 0) -> str:
        site = i % 17
        return f"https://site{site}.example/p/{i}" + (f"/c{clone}" if clone else "")

    for i, text in enumerate(texts):
        t = text
        if skew and i % 10 < 3:
            t = boiler + " " + t
        rows.append((url(i), base_ts + timedelta(seconds=i), t, LANGS[int(rng.integers(0, 10))]))

    dup_ids = [int(x) for x in rng.choice(n_base, size=int(n_base * dup_frac), replace=False)]
    edit_rates = [0.0, 0.02, 0.05, 0.10]
    for i in dup_ids:
        words = rows[i][2].split(" ")
        n_clones = int(rng.integers(1, 5))
        for c in range(1, n_clones + 1):
            mode = int(rng.integers(0, 4))
            w = list(words)
            if mode == 0:  # token substitution at a seeded edit rate
                rate = edit_rates[int(rng.integers(0, 4))]
                for j in range(len(w)):
                    if rng.random() < rate:
                        w[j] = vocab[int(rng.integers(0, VOCAB_SIZE))]
                kind = "exact" if rate == 0.0 else "near"
            elif mode == 1:  # boilerplate injection
                w = boiler.split(" ")[:10] + w
                kind = "near"
            elif mode == 2:  # paragraph reorder (swap halves)
                h = len(w) // 2
                w = w[h:] + w[:h]
                kind = "near"
            else:  # long shared substring inside an otherwise new doc
                other = " ".join(vocab[x] for x in rng.integers(0, VOCAB_SIZE, len(w)))
                run_len = max(40, len(w) // 3)
                start = int(rng.integers(0, max(1, len(w) - run_len)))
                ow = other.split(" ")
                w = ow[: len(ow) // 2] + w[start : start + run_len] + ow[len(ow) // 2 :]
                kind = "substring"
            clone_text = " ".join(w)
            jac = _jaccard(
                py_shingles(rows[i][2], shingle_k), py_shingles(clone_text, shingle_k)
            )
            cu = url(i, c)
            rows.append(
                (cu, base_ts + timedelta(seconds=n_base + i * 10 + c), clone_text, rows[i][3])
            )
            a, b = sorted([url(i), cu])
            gt.append((a, b, jac, kind))

    if skew:
        for c in range(1000):
            cu = f"https://mirror{c % 50}.example/copy/{c}"
            rows.append((cu, base_ts + timedelta(days=1, seconds=c), rows[0][2], rows[0][3]))
            a, b = sorted([url(0), cu])
            gt.append((a, b, 1.0, "exact"))

    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "text", "lang"])
    pages["html"] = pages["text"].map(py_wrap_html)
    pages = pages[["url", "warc_ts", "html", "text", "lang"]]
    gt_df = pd.DataFrame(gt, columns=["url_a", "url_b", "jaccard", "kind"])
    return PagesFixture(pages=pages, gt_pairs=gt_df)


def pages_to_spark(spark, fixture: PagesFixture):
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    gt_schema = StructType(
        [
            StructField("url_a", StringType()),
            StructField("url_b", StringType()),
            StructField("jaccard", DoubleType()),
            StructField("kind", StringType()),
        ]
    )
    return (
        spark.createDataFrame(fixture.pages, schema=schema),
        spark.createDataFrame(fixture.gt_pairs, schema=gt_schema),
    )
