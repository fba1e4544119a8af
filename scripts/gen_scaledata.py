"""Generate an sf1 scale point (10x sf0.1) under .scaledata/sf1.

The driver ships sf0.001/0.01/0.1 only; every timing artifact through
round 8 therefore sat at or below sf0.1 and the 100 TB claims rested
on plan-shape arguments. This script manufactures ONE measured point
above that — deterministic (fixed seeds), derived exclusively from
the committed sf0.1 tables, written inside the repo (testdata is
read-only) and gitignored (it is ~140 MB of derived parquet, not
source).

Construction, per table:
- region/nation/supplier/part: copied unchanged (dims grow slower
  than facts; fixed dims also keep join fan-out growth honest).
- customer: x10, c_custkey -> 10*key + rep (orders co-scale, so
  per-customer order counts stay constant); c_name is REBUILT from
  the new key in the source's exact format — replicating the name
  verbatim would hand every customer 10 exact name twins and
  quadratically explode the entity-resolution pair families with
  duplicates no real 10x growth would contain (measured: blocked
  linkage x23 per 10x before this fix).
- orders: x10, o_orderkey/o_custkey remapped likewise;
  o_totalprice += rep/100 so the DISTINCT-value domain grows with
  the data (pure replication would freeze it and flatter every
  distinct-value-bounded plan — exactly the ceiling the two-level
  rank cumsum exists for).
- lineitem: x10 following orders; l_extendedprice += rep/100 for the
  same reason; part/supp keys unchanged.
- events: x10, event_id/user_id remapped (per-user streams replicate
  whole, so sessionization/funnel shapes are preserved).
- documents: 50,000 FRESH docs sampled from sf0.1's empirical
  unigram, length, and (lang, source) distributions — replication
  would make every doc a 10-way exact duplicate and quadratically
  explode every near-dup pair join. ~8% of docs are near-dup
  mutations (5% token substitution) of an earlier doc, mirroring the
  corpus's duplicate density.
- embeddings: x10, each base vector + N(0, 0.15) noise, renormalized
  to unit length, label kept, vec_id -> 10*id + rep. The noise scale
  matters: sigma=0.02 put the 10 siblings at pairwise cosine ~0.97 —
  every vector gained 9 near-duplicate twins and the LSH/kNN pair
  families exploded x40-50 per 10x (an artifact no organic 10x
  growth would show). sigma=0.15 puts siblings at cosine ~0.4
  (64 dims: 1/(1+64*0.0225) ~ 0.41): same CLUSTER structure for
  IVF/kNN, no manufactured near-dup mass.

Usage: python scripts/gen_scaledata.py [out_dir]   (default
.scaledata/sf1 next to the repo root; skips work if out_dir exists)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Source dir is overridable so the same machinery can stack decades:
# sf0.1 -> sf1 (default), then sf1 -> sf10 (pass src=.scaledata/sf1,
# n_docs=500000). Stacking is safe against manufactured-twin mass:
# names are REBUILT from keys each time, prices keep growing their
# value domain (+rep/100 per decade), documents are freshly sampled,
# and embedding noise compounds (sibling cosine drops, never rises).
SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
REPS = 10
SEED = 20260815


def _replicated(con: duckdb.DuckDBPyConnection, out: str) -> None:
    copies = {
        "region": None,
        "nation": None,
        "supplier": None,
        "part": None,
        "customer": """
            SELECT c_custkey * 10 + r.rep AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey * 10 + r.rep AS VARCHAR),
                                       9, '0') AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM t, r""",
        "orders": """
            SELECT o_orderkey * 10 + r.rep AS o_orderkey,
                   o_custkey * 10 + r.rep AS o_custkey, o_orderstatus,
                   o_totalprice + r.rep / 100.0 AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM t, r""",
        "lineitem": """
            SELECT l_orderkey * 10 + r.rep AS l_orderkey, l_partkey,
                   l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice + r.rep / 100.0 AS l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus,
                   l_shipdate
            FROM t, r""",
        "events": """
            SELECT event_id * 10 + r.rep AS event_id, ts,
                   user_id * 10 + r.rep AS user_id, event_type, value,
                   props
            FROM t, r""",
    }
    con.execute(f"CREATE TEMP TABLE r AS SELECT unnest(range({REPS})) AS rep")
    for name, sql in copies.items():
        con.execute(
            f"CREATE OR REPLACE TEMP VIEW t AS "
            f"SELECT * FROM read_parquet('{SRC}/{name}.parquet')"
        )
        body = sql if sql else "SELECT * FROM t"
        con.execute(
            f"COPY ({body}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {name}: written")


def _documents(out: str, n_docs: int = 50_000) -> None:
    rng = np.random.default_rng(SEED)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text, lang, source FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchall()
    # empirical distributions from the source corpus
    from collections import Counter

    wc: Counter = Counter()
    lengths = []
    for text, _l, _s in rows:
        toks = text.split()
        wc.update(toks)
        lengths.append(len(toks))
    vocab = sorted(wc)
    probs = np.array([wc[w] for w in vocab], dtype=np.float64)
    probs /= probs.sum()
    lengths = np.array(lengths)
    pairs = [(l, s) for _t, l, s in rows]
    upairs = sorted(set(pairs))
    pprobs = np.array([pairs.count(p) for p in upairs], dtype=np.float64)
    pprobs /= pprobs.sum()

    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    vocab_arr = np.array(vocab, dtype=object)
    for i in range(n_docs):
        if i > 100 and rng.random() < 0.08:
            # near-dup: mutate an earlier doc at a 5% token rate
            base = texts[int(rng.integers(0, i))].split()
            toks = [
                (
                    str(vocab_arr[int(rng.integers(0, len(vocab_arr)))])
                    if rng.random() < 0.05
                    else w
                )
                for w in base
            ]
        else:
            n = int(lengths[int(rng.integers(0, len(lengths)))])
            toks = list(rng.choice(vocab_arr, size=n, p=probs))
        texts.append(" ".join(toks))
        li, si = upairs[int(rng.choice(len(upairs), p=pprobs))]
        langs.append(li)
        sources.append(si)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"  documents: {n_docs} written")


def _embeddings(out: str) -> None:
    rng = np.random.default_rng(SEED + 1)
    con = duckdb.connect()
    base = con.execute(
        f"SELECT vec_id, embedding, label "
        f"FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids, vecs, labels = [], [], []
    for vid, emb, lab in base:
        v = np.asarray(emb, dtype=np.float32)
        for rep in range(REPS):
            p = v + rng.normal(0.0, 0.15, size=v.shape).astype(np.float32)
            p /= np.linalg.norm(p)
            ids.append(vid * 10 + rep)
            vecs.append(p.astype(np.float32))
            labels.append(lab)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"  embeddings: {len(ids)} written")


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, ".scaledata", "sf1")
    )
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    if os.path.isdir(out) and os.listdir(out):
        print(f"{out} already populated; delete it to regenerate")
        return
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    _replicated(con, out)
    _documents(out, n_docs=n_docs)
    _embeddings(out)
    print(f"scale point ready at {out} (src={SRC}, docs={n_docs})")


if __name__ == "__main__":
    main()
