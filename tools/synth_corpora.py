"""Synthetic REGIME corpora for scale rehearsals — the adverse shapes
the driver testdata can't produce.

The /root/testdata and /tmp/pbs_sf1 documents tables are LOW-DIVERSITY
(~2,821 distinct char-5-grams), so they always exercise the DENSE
regime of the adaptive operators; these generators build the opposite
regimes so both sides of every regime gate get scale-rehearsed:

- ``high_diversity_docs``: wide-alphabet random text (millions of
  distinct grams, avg df ~1) with a planted near-duplicate fraction —
  the SPARSE (PPJoin) regime of ``prefix_filter_jaccard_pairs``, with
  recall measurable against the planted pairs (r10: recall 1.000 on
  5,088 planted pairs at 50k docs).
- ``zipf_profiles``: (user_id, event_type) events with zipf-popular
  types — the wide-vocabulary regime of ``profile_topk_pairs_sparse``,
  including the corpus-frequency hot types that make an uncapped
  inverted-index join all-pairs-sized (r10: uncapped ran out a 580s
  clock; max_df=2000 finished in 81s).

Deterministic (seeded numpy), no Spark dependency — writes parquet via
pyarrow. Usage:

    python tools/synth_corpora.py docs /tmp/sparse_corpus [n_docs]
    python tools/synth_corpora.py profiles /tmp/wide_profiles.parquet
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def high_diversity_docs(
    out_dir: str,
    n_docs: int = 50_000,
    dup_frac: float = 0.10,
    mutate_tail: float = 0.05,
    seed: int = 7,
) -> tuple[str, str]:
    """Write ``documents.parquet`` (doc_id, text) and ``planted.json``
    (list of [src_id, dup_id] pairs) under ``out_dir``. Duplicates copy
    an earlier base doc and rewrite its last ``mutate_tail`` fraction,
    so at char-5 grams each planted pair sits well above a 0.6-0.8
    Jaccard threshold."""
    rng = np.random.RandomState(seed)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789"))
    docs, planted, base_cache = [], [], []
    for i in range(n_docs):
        if i >= 10 and rng.rand() < dup_frac:
            j = int(rng.randint(0, len(base_cache)))
            src_id, text = base_cache[j]
            cut = int(len(text) * (1.0 - mutate_tail))
            tail = "".join(rng.choice(alphabet, size=len(text) - cut))
            docs.append(text[:cut] + tail)
            planted.append((src_id, i))
        else:
            length = int(rng.randint(150, 260))
            text = "".join(rng.choice(alphabet, size=length))
            docs.append(text)
            base_cache.append((i, text))
    os.makedirs(out_dir, exist_ok=True)
    doc_path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                  "text": pa.array(docs)}),
        doc_path)
    planted_path = os.path.join(out_dir, "planted.json")
    with open(planted_path, "w") as fh:
        json.dump(planted, fh)
    return doc_path, planted_path


def zipf_profiles(
    out_path: str,
    n_users: int = 200_000,
    n_types: int = 50_000,
    n_events: int = 4_000_000,
    zipf_a: float = 1.3,
    seed: int = 11,
) -> str:
    """Write (user_id, event_type) events with zipf-``a`` type
    popularity — at a=1.3 the hottest type carries ~29% of all events,
    which is the all-pairs-in-disguise shape for an uncapped
    inverted-index similarity join."""
    rng = np.random.RandomState(seed)
    uid = rng.randint(0, n_users, size=n_events).astype("int64")
    ty = (rng.zipf(zipf_a, size=n_events) % n_types).astype("int64")
    tys = np.char.add("t", ty.astype("U8"))
    pq.write_table(pa.table({"user_id": uid, "event_type": tys}), out_path)
    return out_path


if __name__ == "__main__":
    kind = sys.argv[1]
    if kind == "docs":
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparse_corpus"
        n = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
        print(high_diversity_docs(out, n_docs=n))
    elif kind == "profiles":
        out = (sys.argv[2] if len(sys.argv) > 2
               else "/tmp/wide_profiles.parquet")
        print(zipf_profiles(out))
    else:
        raise SystemExit(f"unknown corpus kind {kind!r}: docs | profiles")
