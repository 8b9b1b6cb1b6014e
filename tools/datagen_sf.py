"""Local fixture generator for scaling-curve measurements.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md, seed 42,
read-only). To measure a THIRD decade of the scaling curve (VERDICT
r8 item 6) this tool extrudes a distribution-matched fixture at any
sf, from generation rules reverse-engineered off the shipped tables
(row-count ratios, per-column ranges/vocabularies, and shape checks —
lines-per-order is Poisson(4) from uniform orderkey draws, event
inter-arrivals are exponential i.e. sorted-uniform timestamps, event
values are Exponential(mean 50), embeddings are unit-normalized
isotropic gaussians with a label that is pure noise, documents are
10-100 uniform words over the observed 31-word vocabulary with a
~0.16 % planted exact-duplicate rate).

The output is ONLY used for wall-clock scaling runs (BASELINE.md) and
local oracle cross-checks — never for the driver correctness gate,
which runs at the shipped sf0.01. Deterministic: seed 42.

Usage: python tools/datagen_sf.py 0.3 [outdir] [--heaps]
       (default outdir .localdata/sf<sf> under the repo root, or
       .localdata/sf<sf>-heaps with --heaps; never /root/testdata)

--heaps (VERDICT r9 item 5): grow the document vocabulary with
corpus size per Heaps' law, V(sf) = 31 * (sf/0.1)^0.5 anchored at
the shipped sf0.1's 31 words, and draw words Zipf(s=0.6) over that
vocabulary instead of uniform (the exponent is calibrated so the
HEAD word probability matches real text given the small vocab:
s=0.6 over 98 ranks puts p(rank 1) at 0.073 ~ p("the") ~ 0.07 in
English; a textbook s~1 over so few ranks would put 22 % of all
tokens on one word, which over-stresses LSH bucket density instead
of relieving trigram density). The default fixed-31-word extrusion
keeps trigram document frequencies rising LINEARLY with sf, which
saturates d3's candidate density quadratically at sf >= 1 — a
worst-case density stress worth keeping (BASELINE.md sf1 analysis);
--heaps keeps df distributions Zipf as real corpora do, separating
real workload growth from that density artifact. In heaps mode the
documents step draws from its own seeded RNG stream so the default
path stays byte-identical to the already-measured fixtures; the
non-document tables are distribution-identical between modes (the
embeddings draw starts at a shifted main-stream position).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "old", "new", "red", "cold", "small"]
PNOUN = ["ring", "bolt", "plate", "screw", "nut", "washer", "gear", "pin"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = (["en"] * 8 + ["de", "es", "fr", "zh"] * 2)[:16]  # en ~40 %, rest ~15 %
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000


def _ts_us_array(days_since_epoch: np.ndarray) -> pa.Array:
    return pa.array(
        (days_since_epoch.astype(np.int64) * DAY_US), type=pa.timestamp("us")
    )


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _heaps_vocab(sf: float) -> np.ndarray:
    """Heaps-law vocabulary: V(sf) = 31 * (sf/0.1)^0.5, anchored so
    sf0.1 reproduces the shipped fixture's 31 words; synthesized
    tokens are deterministic w0031, w0032, ..."""
    v = max(len(VOCAB), int(round(len(VOCAB) * (sf / 0.1) ** 0.5)))
    return np.array(VOCAB + [f"w{i:04d}" for i in range(len(VOCAB), v)])


def generate(sf: float, outdir: str, heaps: bool = False) -> None:
    rng = np.random.default_rng(SEED)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_docs = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(
        outdir,
        "region",
        pa.table(
            {"r_regionkey": pa.array(range(5), pa.int32()), "r_name": REGIONS}
        ),
    )
    _write(
        outdir,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    _write(
        outdir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(
                    rng.uniform(-1000.0, 10000.0, n_cust), 2
                ),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
    )
    _write(
        outdir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_supp), 2),
            }
        ),
    )
    pk = np.arange(n_part)
    _write(
        outdir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(pk, pa.int64()),
                "p_name": [
                    f"{PADJ[a]} {PNOUN[b]}"
                    for a, b in zip(
                        rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
                    )
                ],
                "p_brand": [f"Brand#{b}" for b in rng.integers(0, 25, n_part)],
                "p_type": pa.array(
                    np.array(PTYPES)[rng.integers(0, 6, n_part)]
                ),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 1),
            }
        ),
    )
    # orders: 1995-01-01 .. 2001-08-01 (day granularity)
    d0 = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
    d1 = (np.datetime64("2001-08-02") - np.datetime64("1970-01-01")).astype(int)
    _write(
        outdir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    np.array(STATUSES)[rng.integers(0, 3, n_ord)]
                ),
                "o_totalprice": np.round(
                    rng.uniform(1000.0, 500000.0, n_ord), 2
                ),
                "o_orderdate": _ts_us_array(rng.integers(d0, d1, n_ord)),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
                ),
            }
        ),
    )
    s0 = (np.datetime64("1995-01-02") - np.datetime64("1970-01-01")).astype(int)
    s1 = (np.datetime64("2001-11-05") - np.datetime64("1970-01-01")).astype(int)
    _write(
        outdir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(
                    rng.uniform(900.0, 105000.0, n_li), 2
                ),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(
                    np.array(LINESTATUSES)[rng.integers(0, 2, n_li)]
                ),
                "l_shipdate": _ts_us_array(rng.integers(s0, s1, n_li)),
            }
        ),
    )
    # events: Poisson arrivals (sorted uniform) over 30 days of 2024-01
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(int)
    span = 30 * DAY_US
    ts = np.sort(rng.integers(t0, t0 + span, n_ev))
    _write(
        outdir,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
                "event_type": pa.array(
                    np.array(ETYPES)[rng.integers(0, 5, n_ev)]
                ),
                "value": np.round(rng.exponential(50.0, n_ev), 2),
                "props": [
                    '{"k": %d}' % k for k in rng.integers(0, 100, n_ev)
                ],
            }
        ),
    )
    # documents: 10-100 words per doc; ~0.16 % exact duplicates
    # planted (copy an earlier doc) so dedup operators have work at
    # every sf. Default: uniform draws over the shipped 31-word vocab
    # (byte-identical to the measured fixtures). --heaps: Heaps-law
    # vocab growth + Zipf(0.6) word frequencies from an ISOLATED rng
    # stream (module docstring explains the exponent calibration).
    if heaps:
        drng = np.random.default_rng(SEED ^ 0x9E3779B9)
        vocab = _heaps_vocab(sf)
        ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
        zipf_p = 1.0 / ranks**0.6
        zipf_p /= zipf_p.sum()

        def _words(nw: int) -> np.ndarray:
            return vocab[drng.choice(len(vocab), size=nw, p=zipf_p)]

    else:
        drng = rng
        vocab = np.array(VOCAB)

        def _words(nw: int) -> np.ndarray:
            return vocab[drng.integers(0, len(vocab), nw)]

    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and drng.random() < 0.0016:
            texts.append(texts[drng.integers(0, i)])
        else:
            nw = drng.integers(10, 101)
            texts.append(" ".join(_words(nw)))
    _write(
        outdir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), pa.int64()),
                "text": texts,
                "lang": pa.array(
                    np.array(LANGS)[drng.integers(0, len(LANGS), n_docs)]
                ),
                "source": [f"src{i % 20}" for i in range(n_docs)],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )
    # embeddings: unit-normalized isotropic gaussians, label pure noise
    # (centroid norms of the shipped fixture match chance: 0.063 vs the
    # 1/sqrt(200)=0.071 null).
    raw = rng.standard_normal((n_emb, 64)).astype(np.float32)
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    _write(
        outdir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(raw), pa.list_(pa.float32())
                ),
                "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
            }
        ),
    )


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--heaps"]
    heaps = "--heaps" in sys.argv[1:]
    sf = float(argv[0]) if argv else 0.3
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    suffix = "-heaps" if heaps else ""
    outdir = (
        argv[1]
        if len(argv) > 1
        else os.path.join(repo, ".localdata", f"sf{sf:g}{suffix}")
    )
    if outdir.startswith("/root/testdata") or outdir.startswith(
        "/root/reference"
    ):
        print("refusing to write into read-only fixture dirs")
        return 1
    # ADVICE r10: an explicit outdir + --heaps used to write the
    # heaps-mode tables into the named directory verbatim — so
    # `datagen_sf.py 1 .localdata/sf1 --heaps` silently OVERWROTE the
    # default-mode fixture BASELINE.md's scaling rows were measured
    # on. Heaps mode now refuses an explicit outdir that doesn't
    # carry the -heaps marker (and vice versa), so the two fixture
    # families can't clobber each other.
    if len(argv) > 1:
        base = os.path.basename(os.path.normpath(outdir))
        if heaps and not base.endswith("-heaps"):
            print(
                f"refusing: --heaps with outdir {outdir!r} — heaps-mode "
                "fixtures must live in a '*-heaps' directory so they "
                "never overwrite a default-mode fixture "
                f"(use {outdir.rstrip('/') + '-heaps'!r})"
            )
            return 1
        if not heaps and base.endswith("-heaps"):
            print(
                f"refusing: default-mode generation into {outdir!r} "
                "would overwrite a heaps-mode fixture (drop the "
                "'-heaps' suffix or pass --heaps)"
            )
            return 1
    print(f"generating sf={sf}{' (heaps)' if heaps else ''} into {outdir}")
    generate(sf, outdir, heaps=heaps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
