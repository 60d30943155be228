#!/usr/bin/env python3
"""Dev-only events-table scale extrapolator (the sibling of gen_sf.py,
which scales documents/embeddings and symlinks the rest): generates a
deterministic events table with the SAME distributions as the driver's
fixture (measured at sf0.1) at an arbitrary multiple, for scale-proof
benchmarking of the time-series / as-of / range-join / window core.

Measured sf0.1 shape this mirrors:
  100000 rows over 2024-01-01 .. 2024-01-30 (30 days); ts strictly
  increasing (serial event_id = arrival order) with ~26 s mean spacing;
  ts parquet type TIMESTAMP(MICROS) (the r6+ fixture encoding);
  user_id ~ U{0..1499}; event_type uniform over
  {signup, purchase, view, click, error}; value ~ U[0, 560) rounded to
  2 dp; props = {"k": U{0..99}}.

Scaling keeps the TIME SPAN fixed and multiplies density (more events
per user per hour — the high-traffic shape), matching how the driver's
own sf0.01 -> sf0.1 step behaves.

Usage: python3 tools/gen_sf_events.py <outDir> <multiple> [srcSfDir]
  e.g.  python3 tools/gen_sf_events.py target/testdata/sf1 10 /root/testdata/sf0.1
Writes ONLY events.parquet into <outDir> (run gen_sf.py first for the
rest). Seeded (43): same args -> byte-identical parquet.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SPAN_US = 2588354089277  # sf0.1 measured span (first..last event)
T0_US = 1704067211172425  # sf0.1 first event timestamp
TYPES = ["signup", "purchase", "view", "click", "error"]

# Generator VERSION, stamped into a sidecar next to the parquet (r12
# advice): the chunked writer changed rng consumption order for
# n > 50M vs the old monolithic writer, so large fixtures produced by
# the two versions differ at the same args. Pinned baseline rows must
# therefore record which generator produced the fixture they ran on —
# bump this on ANY change to the data-producing arithmetic.
#   v1 = monolithic writer (r11 and earlier)
#   v2 = chunked writer, 50M-row chunks (r12+)
GEN_VERSION = 2


def main(out_dir: str, mult: int, src: str) -> None:
    src_n = pq.read_metadata(os.path.join(src, "events.parquet")).num_rows
    n = src_n * mult
    rng = np.random.default_rng(43)
    # strictly-increasing timestamps: exponential inter-arrivals scaled
    # to fill the span (±1 us), made strictly monotone by a +event_id
    # offset on top of the non-decreasing floor (floor-to-micros plus
    # maximum.accumulate alone only guarantees NON-decreasing — at high
    # multiples duplicate ts become likely and break the tie-sensitive
    # window/as-of proofs this fixture exists for)
    gaps = rng.exponential(1.0, n)
    base = np.floor(np.cumsum(gaps) / gaps.sum() * (SPAN_US - n)).astype(np.int64)
    del gaps
    ts = T0_US + np.maximum.accumulate(base) + np.arange(n, dtype=np.int64)
    del base
    assert (np.diff(ts) > 0).all(), "ts must be strictly increasing"
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "events.parquet")
    if os.path.islink(dst):
        os.unlink(dst)  # replace gen_sf.py's symlink with the scaled table
    # CHUNKED writer (needed at 1B+ rows: the all-at-once numpy string
    # column alone would be tens of GB); same rng consumption ORDER as
    # the monolithic writer per chunk, deterministic for fixed (n,
    # chunk) — the fixture contract is per-(args) determinism, not
    # cross-chunk-size equality
    schema = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string())])
    chunk = 50_000_000
    with pq.ParquetWriter(dst, schema) as w:
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            m = hi - lo
            w.write_table(pa.table({
                "event_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "ts": pa.array(ts[lo:hi], type=pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, 1500, m, dtype=np.int64)),
                "event_type": pa.array(np.array(TYPES)[rng.integers(0, 5, m)]),
                "value": pa.array(np.round(rng.uniform(0, 560.21, m), 2)),
                "props": pa.array(
                    np.char.add(np.char.add('{"k": ',
                        rng.integers(0, 100, m).astype(str)), "}")),
            }, schema=schema))
    with open(dst + ".genver", "w") as f:
        f.write(f"gen_sf_events v{GEN_VERSION} mult={mult} rows={n}\n")
    print(f"wrote {dst}: {n} rows ({mult}x of {src_n}) [gen v{GEN_VERSION}]")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1")
