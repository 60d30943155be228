#!/usr/bin/env python3
"""Dev-only scale-factor extrapolator for the documents/embeddings
tables: generates a deterministic corpus with the SAME distributions as
the driver's /root/testdata tables (measured at sf0.1) at an arbitrary
multiple, for scale-proof benchmarking (BASELINE.md sf1 table). The
other eight tables are symlinked from the source sf dir — the six
compute-bound queries under proof read only documents/embeddings.

Measured sf0.1 shape this mirrors:
  documents: 5000 rows; 31-word uniform vocab; words/doc ~U(10,100);
    lang ~ {en:.412, zh:.151, es:.149, fr:.148, de:.140}; source
    src0..src19 exactly uniform; 8 exact-dup pairs per 5000 docs.
  embeddings: 2000 rows; 64-dim i.i.d. gaussian unit-normalized
    (measured max pairwise cosine 0.60 over all 2M pairs — no planted
    near-dups); label ~U{0..9}.

Usage: python3 tools/gen_sf.py <outDir> <multiple> [srcSfDir]
  e.g.  python3 tools/gen_sf.py target/testdata/sf1 10 /root/testdata/sf0.1
Seeded (42): same args -> byte-identical parquet.
"""
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.412, 0.151, 0.149, 0.148, 0.140]
BASE_DOCS = 5000
BASE_EMB = 2000
DUP_PAIRS_PER_BASE = 8  # exact-dup pairs planted per 5000 docs
LINKED = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events"]


def gen_documents(out_dir: str, mult: int) -> None:
    rng = random.Random(42)
    n = BASE_DOCS * mult
    texts, langs, sources = [], [], []
    for i in range(n):
        k = rng.randint(10, 100)
        texts.append(" ".join(rng.choices(VOCAB, k=k)))
        langs.append(rng.choices(LANGS, weights=LANG_W, k=1)[0])
        sources.append(f"src{i % 20}")
    # plant exact-dup pairs at the measured rate: doc j copies doc j-1
    for p in range(DUP_PAIRS_PER_BASE * mult):
        j = (p * 625 + 1) % n
        texts[j] = texts[j - 1]
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def gen_embeddings(out_dir: str, mult: int) -> None:
    rng = np.random.default_rng(42)
    n = BASE_EMB * mult
    m = rng.standard_normal((n, 64)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(m), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def main(out_dir: str, mult: int, src_sf: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    gen_documents(out_dir, mult)
    gen_embeddings(out_dir, mult)
    for t in LINKED:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src_sf, f"{t}.parquet"), dst)
    print(f"wrote {out_dir}: documents={BASE_DOCS * mult} "
          f"embeddings={BASE_EMB * mult}, {len(LINKED)} tables linked from {src_sf}")
    return 0


if __name__ == "__main__":
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sys.exit(main(sys.argv[1], int(sys.argv[2]), src))
