#!/usr/bin/env python
"""Perturbed-corpus differential sweep (r11 depth work).

Builds a SAME-SHAPE, DIFFERENT-VALUES corpus from a base fixture dir by
deterministic hash-based jitter of every non-key column, then (via
``tools/check_oracles.py <scratch>``) the full registry is hash-compared
Spark-vs-DuckDB on data neither engine has seen before.

Why: the oracle gate is only as strong as the value combinations the
fixtures happen to contain. The two real cross-engine flips r10's
sf0.001 sweep caught (``min_cost_supplier``'s boundary-double round,
``attribution_report``'s sum-order ulp on a cents boundary) were BOTH
"a value landed exactly on a rounding boundary" classes — classes whose
trigger probability scales with how many fresh value combinations the
gate has ever observed. This tool manufactures fresh combinations on
demand; jitters are pure functions of the row key (DuckDB ``hash()``),
so the corpus is reproducible bit-for-bit and needs no RNG state.

Invariants preserved (the operators' documented contracts):
- every table keeps its exact schema (column names, arrow types);
- primary/foreign keys are UNTOUCHED — referential integrity holds;
- enumerated domains (event_type, flags, priorities, segments, lang,
  source) are PERMUTED within themselves, never invented;
- value ranges stay physical (quantities >= 1, discounts in [0, .10],
  balances may stay negative, timestamps within ± a day of the base
  span, text stays non-empty with n_chars recomputed);
- embeddings keep their norm distribution (components circularly
  rolled + sign-flipped, fixture label kept so the IVF/blocked label
  contract holds).

Usage::

    python tools/perturb_corpus.py [base_sf_dir] [out_dir] [seed] [--nulls]
    python tools/check_oracles.py <out_dir>

Each ``seed`` yields an independent corpus — sweeping several seeds
multiplies the fresh value combinations the gate has observed.

``--nulls`` additionally NULLs a deterministic slice of the nullable
payload columns (documents.text/lang, events.value/props — NOT the
event-time axis, which is a non-null contract past the ingestion
boundary): the r10 null-regime sweep ran on the base fixtures only, so
this composes the two regimes — null handling exercised against fresh
value combinations instead of the shipped ones.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.01"

SEED = 0  # folded into every jitter hash; set via CLI before TABLE_SQL use


# deterministic per-key jitter in [0, m) — DuckDB hash() is stable
def _j(key: str, m: int, salt: int = 0) -> str:
    return f"CAST(hash({key} + {salt} + @SEED@ * 1009) % {m} AS BIGINT)"


# Permutations of the enumerated domains (same value sets, new rows).
_EVENT_TYPE = (
    "CASE event_type WHEN 'purchase' THEN 'view' WHEN 'view' THEN 'click'"
    " WHEN 'click' THEN 'error' WHEN 'error' THEN 'signup'"
    " ELSE 'purchase' END"
)

TABLE_SQL = {
    # keys / FKs / enums kept or permuted; measures jittered per-key.
    "region": "SELECT * FROM region",
    "nation": "SELECT * FROM nation",
    "customer": f"""
        SELECT c_custkey, c_name, c_nationkey,
               round(c_acctbal + {_j('c_custkey', 2001)} / 100.0 - 10.0, 2)
                   AS c_acctbal,
               c_mktsegment
        FROM customer
    """,
    "supplier": f"""
        SELECT s_suppkey, s_name, s_nationkey,
               round(s_acctbal + {_j('s_suppkey', 2001)} / 100.0 - 10.0, 2)
                   AS s_acctbal
        FROM supplier
    """,
    "part": f"""
        SELECT p_partkey, p_name, p_brand, p_type,
               CAST(1 + {_j('p_partkey', 50)} AS INTEGER) AS p_size,
               round(p_retailprice + {_j('p_partkey', 10001, 7)} / 100.0, 2)
                   AS p_retailprice
        FROM part
    """,
    "orders": f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               round(o_totalprice * (90 + {_j('o_orderkey', 21)}) / 100.0, 2)
                   AS o_totalprice,
               o_orderdate
                   + to_seconds(CAST({_j('o_orderkey', 172801, 3)} - 86400
                                AS BIGINT)) AS o_orderdate,
               o_orderpriority
        FROM orders
    """,
    "lineitem": f"""
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               CAST(1 + {_j('l_orderkey * 7 + l_linenumber', 50)} AS DOUBLE)
                   AS l_quantity,
               round(l_extendedprice
                     * (90 + {_j('l_orderkey * 7 + l_linenumber', 21, 1)})
                     / 100.0, 2) AS l_extendedprice,
               CAST({_j('l_orderkey * 7 + l_linenumber', 11, 2)} AS DOUBLE)
                   / 100.0 AS l_discount,
               CAST({_j('l_orderkey * 7 + l_linenumber', 9, 3)} AS DOUBLE)
                   / 100.0 AS l_tax,
               l_returnflag, l_linestatus,
               l_shipdate + to_seconds(CAST(
                   {_j('l_orderkey * 7 + l_linenumber', 172801, 4)} - 86400
                   AS BIGINT)) AS l_shipdate
        FROM lineitem
    """,
    # events: permute the provider enum, re-pair users<->rows via a
    # bijective key walk, jitter ts (±1 day) and value (fresh cents
    # incl. exact .x5 boundary candidates), rewrite props payload.
    "events": f"""
        SELECT event_id,
               ts + to_seconds(CAST({_j('event_id', 172801)} - 86400
                               AS BIGINT)) AS ts,
               CAST((user_id + {_j('event_id', 7, 5)}) %
                    (SELECT max(user_id) + 1 FROM events) AS BIGINT)
                   AS user_id,
               {_EVENT_TYPE} AS event_type,
               round(value + {_j('event_id', 40001, 6)} / 200.0, 2)
                   AS value,
               '{{"k": ' || CAST({_j('event_id', 100, 8)} AS VARCHAR) || '}}'
                   AS props
        FROM events
    """,
    # documents: perturb token stream (suffix rotation creates fresh
    # shingles/minhashes), shuffle lang/source within their domains,
    # recompute n_chars so the metadata matches the text.
    "documents": f"""
        WITH toks AS (
            SELECT doc_id, lang, source,
                   list_transform(
                       string_split(text, ' '),
                       t -> CASE WHEN length(t) > 3
                                 THEN t || CAST(hash(doc_id + @SEED@ * 1009) % 7 AS VARCHAR)
                                 ELSE t END
                   ) AS parts
            FROM documents
        )
        SELECT doc_id,
               array_to_string(parts, ' ') AS text,
               lang, source,
               CAST(length(array_to_string(parts, ' ')) AS BIGINT) AS n_chars
        FROM toks
    """,
}


# seed centroids (similarity.N_CENTROIDS, vec_id < 4) stay non-null under
# --nulls: the centroid table models a curated OFFLINE-trained artifact
# (similarity._centroids docstring), never a raw nullable payload
_N_SEED_CENTROIDS = 4


def _perturb_embeddings(
    base: Path, out: Path, seed: int = 0, nulls: bool = False
) -> None:
    t = pq.read_table(base / "embeddings.parquet")
    vec_ids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    # circular roll by a per-row amount + deterministic sign flip of a
    # per-row component stripe: norms preserved, band patterns fresh.
    # --nulls additionally NULLs a ~1/11 vector slice (r12 verdict item
    # #6 — the one fixture family that never carried NULLs): the row
    # stays, its embedding goes NULL, exercising every ANN assign /
    # verify / mapInPandas path's NULL-vector contract.
    rows: list[np.ndarray | None] = []
    for i, vid in enumerate(vec_ids):
        if (
            nulls
            and int(vid) >= _N_SEED_CENTROIDS
            and (int(vid) * 2654435761 + seed) % 11 == 5
        ):
            rows.append(None)
            continue
        r = (int(vid) + seed) * 2654435761 % dim
        v = np.roll(emb[i], r)
        flip = ((int(vid) + seed) * 40503) % dim
        v[flip] = -v[flip]
        rows.append(v.astype(np.float32))
    out_t = pa.table(
        {
            "vec_id": t.column("vec_id"),
            "embedding": pa.array(
                [None if r is None else r.tolist() for r in rows],
                type=pa.list_(pa.float32()),
            ),
            "label": t.column("label"),
        }
    )
    out_t = out_t.cast(pq.read_schema(base / "embeddings.parquet"))
    pq.write_table(out_t, out / "embeddings.parquet")


# --nulls: NULL a deterministic ~1/9 slice of each nullable payload
# column (hash-keyed so seeds move the slice); event-time / keys stay
# intact per the non-null ingestion contract
_NULL_RULES = {
    "documents": {
        "text": "hash(doc_id + @SEED@) % 9 = 0",
        "lang": "hash(doc_id + @SEED@ + 1) % 9 = 1",
    },
    "events": {
        "value": "hash(event_id + @SEED@ + 2) % 9 = 2",
        "props": "hash(event_id + @SEED@ + 3) % 9 = 3",
        # r12: value IS speedKmh downstream (pings projection), so the
        # value rule already exercises NULL speeds through the
        # flows/science family (LOCF, EWMA, tile means). event_type is
        # the pings PROVIDER — a rarer NULL slice drives rows into the
        # validity-conjunction drop in both engines and NULL group keys
        # in the event-side queries. bearing exists only in the
        # producer wire schema (no fixture column); media bytes derive
        # from documents.text, covered by the text rule.
        "event_type": "hash(event_id + @SEED@ + 4) % 17 = 4",
    },
}


# --nulls also EMPTIES a disjoint ~1/13 documents.text slice (r12 verdict
# item #6: zero-length media blobs — media bytes derive from text, so an
# empty text is an empty blob through media_table and every mapInPandas
# extractor). n_chars is recomputed to 0 so the metadata matches the
# payload (the tool's documented invariant).
_EMPTY_TEXT_RULE = "hash(doc_id + @SEED@ + 5) % 13 = 6"


def _apply_nulls(sql: str, tname: str, columns: list[str]) -> str:
    rules = _NULL_RULES.get(tname)
    if not rules:
        return sql
    sel = ",\n               ".join(
        f"CASE WHEN {rules[c]} THEN NULL ELSE {c} END AS {c}"
        if c in rules
        else c
        for c in columns  # original order — the schema cast needs it
    )
    out = f"SELECT {sel} FROM ({sql})"
    if tname == "documents":
        empt = f"{_EMPTY_TEXT_RULE} AND text IS NOT NULL"
        out = f"""
        SELECT doc_id,
               CASE WHEN {empt} THEN '' ELSE text END AS text,
               lang, source,
               CASE WHEN {empt} THEN 0 ELSE n_chars END AS n_chars
        FROM ({out})"""
    return out


def build(base_dir: str, out_dir: str, seed: int = 0, nulls: bool = False) -> None:
    base, out = Path(base_dir), Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for tname in TABLE_SQL:
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{base}/{tname}.parquet'"
        )
    for tname, sql in TABLE_SQL.items():
        want = pq.read_schema(base / f"{tname}.parquet")
        if nulls:
            sql = _apply_nulls(sql, tname, [f.name for f in want])
        got = con.sql(sql.replace("@SEED@", str(seed))).arrow()
        if isinstance(got, pa.RecordBatchReader):  # duckdb >= 1.3
            got = got.read_all()
        got = got.cast(want)
        pq.write_table(got, out / f"{tname}.parquet")
        if got.num_rows != pq.read_metadata(base / f"{tname}.parquet").num_rows:
            raise SystemExit(f"{tname}: row count changed")
    _perturb_embeddings(base, out, seed, nulls=nulls)
    print(f"perturbed corpus at {out} (seed {seed}, nulls={nulls})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--nulls"]
    base = args[0] if len(args) > 0 else BASE
    out = args[1] if len(args) > 1 else tempfile.mkdtemp(prefix="perturbed-corpus-")
    build(
        base,
        out,
        int(args[2]) if len(args) > 2 else 0,
        nulls="--nulls" in sys.argv,
    )
