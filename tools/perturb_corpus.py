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
    rows: list[np.ndarray | list | None] = []
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
        # --nulls also poisons disjoint slices with NON-FINITE components
        # (r13 NaN-embedding probe: quantization paths CRASH under Spark
        # ANSI on NaN->INT casts and DuckDB errors casting nan to int64
        # — both engines now drop non-finite vectors at the load_
        # embeddings/_EMB validity boundary, and this keeps that boundary
        # exercised). A -0.0 slice stays IN-DOMAIN: negative zero is a
        # valid component, pinned engine-consistent.
        if nulls and int(vid) >= _N_SEED_CENTROIDS:
            m = (int(vid) * 2654435761 + seed) % 13
            if m == 4:
                v[0] = np.nan
            elif m == 8:
                v[1 % dim] = np.inf
            elif m == 12:
                v[2 % dim] = -0.0
            elif m == 2:
                # r14 (advisor): NULL COMPONENT — a non-NULL vector with
                # one NULL element. This slice sat on a 3-valued-logic
                # fault line (Spark exists() -> NULL -> dropped; DuckDB
                # bool_or skips the NULL -> kept) until both predicates
                # tested the element explicitly; it keeps that boundary
                # under live pressure.
                lv = [float(x) for x in v]
                lv[3 % dim] = None
                rows.append(lv)
                continue
        rows.append(v.astype(np.float32))
    out_t = pa.table(
        {
            "vec_id": t.column("vec_id"),
            "embedding": pa.array(
                [
                    None
                    if r is None
                    else (r if isinstance(r, list) else r.tolist())
                    for r in rows
                ],
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


# --unicode (r13): multibyte / special-casing text. The fixture corpus is
# pure ASCII, so no registered query had ever executed the text family's
# primitives over non-ASCII input. A cross-engine primitive probe found
# the used surface (length, BPE/punct regex classes, \\s+ tokenize, md5)
# agrees on unicode EXCEPT ``lower()``: Java applies SpecialCasing full
# mappings (İ -> i+U+0307) and the contextual final-sigma rule (ΑΣ -> ας)
# where utf8proc applies simple mappings (İ -> i, Σ -> σ always) — so the
# casefold sites (fingerprint, tokens, rolling hash) are now the shared
# fold_lower/fold_lower_duck fragments (functions/textfns.py), and this
# axis keeps them honest: a ~1/5 doc slice gains a hash-picked unicode
# token (dotted-İ, final-sigma Greek, ß, CJK, combining accents, non-BMP
# emoji, fullwidth, NBSP inside a token) appended or prepended, with
# n_chars recomputed (code-point length agrees cross-engine).
_UNI_TOKENS = (
    "İstanbul",      # U+0130 — the Java/utf8proc lower() split
    "ΒΑΣΙΛΕΥΣ",      # word-final Σ — contextual final sigma
    "straße",        # ß (upper-divergent; lower-stable)
    "東京",          # CJK, 3-byte UTF-8
    "café",    # combining acute — NFC/NFD sensitivity
    "naïve",    # precomposed ï
    "\U0001F44D\U0001F680",  # non-BMP emoji — 4-byte UTF-8
    "Ａｂｃ",        # fullwidth letters
    "a b",      # NBSP inside a token (not \\s in either regex)
)


def _apply_unicode(sql: str, tname: str, columns: list[str]) -> str:
    if tname != "documents":
        return sql
    toks = ", ".join(f"'{t}'" for t in _UNI_TOKENS)
    pick = (
        f"[{toks}][CAST(1 + hash(doc_id + @SEED@ + 31) %"
        f" {len(_UNI_TOKENS)} AS BIGINT)]"
    )
    slice_ = "hash(doc_id + @SEED@ + 32) % 5 = 2"
    prepend = "hash(doc_id + @SEED@ + 33) % 2 = 0"
    new_text = (
        f"CASE WHEN {slice_} AND text IS NOT NULL AND text != '' THEN "
        f"CASE WHEN {prepend} THEN {pick} || ' ' || text "
        f"ELSE text || ' ' || {pick} END ELSE text END"
    )
    # n_chars recomputed ONLY for slice rows (code-point length — Spark
    # and DuckDB agree, incl. non-BMP); untouched rows keep the original
    # value so composing with --nulls preserves that regime's contract.
    new_chars = (
        f"CASE WHEN {slice_} AND text IS NOT NULL AND text != '' THEN "
        f"CAST(length({new_text}) AS BIGINT) ELSE n_chars END"
    )
    sel = ",\n               ".join(
        f"{new_text} AS text"
        if c == "text"
        else (f"{new_chars} AS n_chars" if c == "n_chars" else c)
        for c in columns  # original order — the schema cast needs it
    )
    return f"SELECT {sel} FROM ({sql})"


# --json (r13): adversarial props payloads. The fixture props is always
# the one shape '{"k": N}', so the schema-on-read parsers (json_decode's
# typed from_json, props_key_stats' strict map parse) had never seen
# anything else. A cross-engine battery found FIVE divergence classes in
# the naive extract-then-cast oracles (quoted numbers coerced, doubles
# rounded, overflow/boolean/malformed ERRORING where Spark PERMISSIVE
# yields NULL, and Spark's whole-map-null strictness); the oracles now
# mirror the Spark contract via json_type guards, and this axis keeps
# them honest: disjoint hash slices of events.props take each shape.
# Slices rewrite; non-sliced rows keep the jittered standard shape.
_JSON_SHAPES = (
    # valid, still k-bearing ({n} -> a per-row 0..99 integer)
    ('{"k": {n}, "extra": {"a": 1}}', 13, 0),  # nested extra
    ('{"k": {n}, "s": "x"}', 13, 1),           # string extra (map-null)
    ('{"k": {n}, "d": 2.5}', 13, 2),           # double extra (map-null)
    ('{"k": "{n}"}', 13, 3),                   # quoted k (int-null)
    ('{"k": {n}.0}', 13, 4),                   # integral double (both-null)
    ('{"k": {n}9999999999}', 13, 5),           # beyond int32
    ('{"k": null}', 17, 6),                    # explicit null entry
    # valid, k-less / non-object
    ('{"é": {n}}', 17, 7),                # unicode key
    ('[{n}, 2]', 17, 8),                       # top-level array
    ('{}', 17, 9),                             # empty object
    # invalid
    ('{"k": {n}', 19, 10),                     # truncated
    ('', 19, 11),                              # empty string
)


def _apply_json(sql: str, tname: str, columns: list[str]) -> str:
    if tname != "events":
        return sql
    expr = "props"
    for tmpl, mod, salt in reversed(_JSON_SHAPES):
        shaped = (
            "'"
            + tmpl.replace("{n}", "' || CAST(hash(event_id + @SEED@) % 100 AS VARCHAR) || '")
            + "'"
        )
        shaped = shaped.replace(" || ''", "").replace("'' || ", "")
        cond = f"hash(event_id + @SEED@ + {40 + salt}) % {mod} = {salt % mod}"
        expr = f"CASE WHEN {cond} THEN {shaped} ELSE {expr} END"
    sel = ",\n               ".join(
        f"{expr} AS props" if c == "props" else c
        for c in columns  # original order — the schema cast needs it
    )
    return f"SELECT {sel} FROM ({sql})"


# --ties (r13): duplicate event timestamps. The base fixtures (and every
# jittered corpus — the ts jitter is a bijection of event_id) contain ZERO
# (user_id, ts) ties, so no registered query has ever been order-pressured
# on the pings axis the way real GPS streams are (two pings in the same
# second is the NORM for a fleet). TPC-H dates already carry ties (47
# same-order l_shipdate ties, 2376 global o_orderdate ties at sf0.01), so
# that family has survived tie pressure; events never has. Two rules:
#   1. SAME-USER ties (~1/7 of non-first events): ts := the user's
#      PREVIOUS event's ts (lag by event_id) — the hard case for every
#      per-vehicle window/fold (sessions, trips, EWMA, Markov, latest,
#      as-of, resample). Any order-sensitive operator without a
#      deterministic secondary key diverges between engines here.
#   2. CROSS-USER ties (~1/11 disjoint slice): ts truncated to the
#      HOUR — collides timestamps ACROSS vehicles (minute truncation
#      yields ~0 collisions at fixture density: ~1 month span), so
#      global orderings (top-by-ts snapshots, windowed top-k) see ties.
# Event-time stays NON-NULL (the ingestion contract) — ties move values
# within the valid domain, they never invalidate rows.
def _apply_ties(sql: str, tname: str, columns: list[str]) -> str:
    if tname != "events":
        return sql
    same_user = "hash(event_id + @SEED@ + 21) % 7 = 3"
    cross_user = "hash(event_id + @SEED@ + 22) % 11 = 5"
    sel = ",\n               ".join(
        (
            f"CASE WHEN {same_user} AND _prev_ts IS NOT NULL THEN _prev_ts\n"
            f"                    WHEN {cross_user} THEN date_trunc('hour', ts)\n"
            f"                    ELSE ts END AS ts"
        )
        if c == "ts"
        else c
        for c in columns  # original order — the schema cast needs it
    )
    return f"""
        SELECT {sel}
        FROM (
            SELECT *, lag(ts) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS _prev_ts
            FROM ({sql})
        )"""


# --dupkeys (r14): duplicate primary keys. Every fixture (and every
# jittered corpus — keys are UNTOUCHED by the jitter) has UNIQUE
# event_id / doc_id, so the whole registry leans on PK semantics the
# gate has never violated: the r13 ties fix keys argmax on
# (eventTs, event_id) with event_id as the deterministic tiebreak,
# dozens of window orderings end in event_id, and the split/dedup
# families treat doc_id as a row identity. Real pipelines violate PKs
# two ways, and the axis manufactures both:
#   1. REPLAY (~1/13): a row is replaced by a verbatim copy of the
#      lag-3 row (at-least-once redelivery — the payload agrees).
#      Fully identical rows are value-symmetric: ANY engine's winner
#      among them carries identical columns, so replay dups must never
#      split the engines.
#   2. CONFLICT (~1/17): a row keeps its own payload but takes the
#      lag-5 row's (event_id, ts) key pair — a PK collision whose
#      payloads DISAGREE, colliding exactly the (eventTs, event_id)
#      argmax/ordering key. A disjoint sub-slice (~1/19) also takes
#      user_id (lag-7), colliding the per-vehicle ordering
#      (user_id, ts, event_id) itself.
#      documents: the conflict slice copies doc_id only (text stays
#      own), colliding the groupBy-doc_id and split identities.
# Counts are preserved (victims are REPLACED, not appended).
_DUP_PK = {"events": "event_id", "documents": "doc_id"}
# events: key pair (and the user sub-slice); documents: bare pk
_DUP_KEY_COLS = {"events": ("event_id", "ts"), "documents": ("doc_id",)}


def _apply_dupkeys(sql: str, tname: str, columns: list[str]) -> str:
    pk = _DUP_PK.get(tname)
    if not pk:
        return sql
    key_cols = _DUP_KEY_COLS[tname]
    replay = f"hash({pk} + @SEED@ + 51) % 13 = 7"
    conflict = f"hash({pk} + @SEED@ + 52) % 17 = 9"
    conflict_user = (
        f"hash({pk} + @SEED@ + 53) % 19 = 11" if tname == "events" else "FALSE"
    )
    lags = ",\n                   ".join(
        f"lag({c}, 3) OVER (ORDER BY {pk}) AS _r_{c}" for c in columns
    )
    key_lags = ",\n                   ".join(
        f"lag({c}, 5) OVER (ORDER BY {pk}) AS _c_{c}" for c in key_cols
    )
    user_lags = (
        ",\n                   ".join(
            f"lag({c}, 7) OVER (ORDER BY {pk}) AS _u_{c}"
            for c in (*key_cols, "user_id")
        )
        if tname == "events"
        else ""
    )

    def cell(c: str) -> str:
        branches = [f"WHEN {replay} AND _r_{pk} IS NOT NULL THEN _r_{c}"]
        if tname == "events" and c in (*key_cols, "user_id"):
            branches.append(
                f"WHEN {conflict_user} AND _u_{pk} IS NOT NULL THEN _u_{c}"
            )
        if c in key_cols:
            branches.append(
                f"WHEN {conflict} AND _c_{pk} IS NOT NULL THEN _c_{c}"
            )
        return (
            "CASE " + "\n                    ".join(branches)
            + f"\n                    ELSE {c} END AS {c}"
        )

    sel = ",\n               ".join(cell(c) for c in columns)
    inner_lags = ",\n                   ".join(
        x for x in (lags, key_lags, user_lags) if x
    )
    return f"""
        SELECT {sel}
        FROM (
            SELECT *,
                   {inner_lags}
            FROM ({sql})
        )"""


# --xts (r15): extreme timestamps. The fixtures (and every jitter,
# which moves timestamps ± a day) keep the time axis inside 1992-2025,
# so the gate had never observed the domain boundaries both engines
# support (proleptic-Gregorian year 1 .. 9999) or the band OUTSIDE
# pandas' ns window (~1677-2262) that the r14 probe showed breaks the
# COMPARISON HARNESS (fixed: tools/check_oracles.spark_to_pandas).
# Four disjoint-by-construction slices per timestamp column, shifted by
# whole years so wall-clock fields stay valid and arithmetic keeps
# headroom to the 9999-12-31 ceiling (TTL/staleAt adds minutes):
#   far-future ~1/23: +7900y -> ~9890s (out of ns window, high)
#   ancient    ~1/29: -1900y -> ~year 92-125 (keeps the TPC-H
#                              1992 floor above Spark's 0001 domain edge)
#   pre-epoch  ~1/31:  -150y -> ~1840-1875 (negative epoch, IN ns window)
#   pre-ns     ~1/37:  -400y -> ~1590-1625 (out of ns window, low;
#                                           post-1582 Julian gap)
_XTS_COLS = {
    "events": ("event_id", "ts"),
    "orders": ("o_orderkey", "o_orderdate"),
    "lineitem": ("l_orderkey * 8 + l_linenumber", "l_shipdate"),
}


def _apply_xts(sql: str, tname: str, columns: list[str]) -> str:
    spec = _XTS_COLS.get(tname)
    if not spec:
        return sql
    pk, ts = spec
    shifted = (
        f"CASE WHEN hash({pk} + @SEED@ + 61) % 23 = 5"
        f" THEN {ts} + INTERVAL 7900 YEAR\n"
        f"                    WHEN hash({pk} + @SEED@ + 62) % 29 = 7"
        f" THEN {ts} - INTERVAL 1900 YEAR\n"
        f"                    WHEN hash({pk} + @SEED@ + 63) % 31 = 11"
        f" THEN {ts} - INTERVAL 150 YEAR\n"
        f"                    WHEN hash({pk} + @SEED@ + 64) % 37 = 13"
        f" THEN {ts} - INTERVAL 400 YEAR\n"
        f"                    ELSE {ts} END AS {ts}"
    )
    sel = ",\n               ".join(
        shifted if c == ts else c for c in columns
    )
    return f"SELECT {sel} FROM ({sql})"


# --xval (r15): extreme finite doubles. The jitters keep every numeric
# column at physical magnitudes, so the gate had never observed the
# IEEE-754 boundary band: ±DBL_MAX (overflow-adjacent products/squares
# go Inf mid-aggregate), subnormals (gradual-underflow arithmetic),
# 1e8-magnitude in-contract cents (a fresh exponent band for the
# fixed-point recovery; the first-contact 1e15 slice measured values
# beyond 2-decimal double representability — outside the wire contract,
# now covered by the DBL_MAX slice's sensitive set), and -0.0 (sign-sensitive
# formatting/grouping). Slices land on events.value ONLY: the free
# measure column feeding the percentile/OLS/science families. The
# MONEY columns (*price, *acctbal, value-as-money in pricing paths)
# carry the engine's documented cents-domain contract (DECIMAL-exact,
# functions/money.py) — ±DBL_MAX there is outside ANY money domain and
# would only test DECIMAL-overflow error shapes, so money columns get a
# just-under-the-documented-$1e5-bound slice (money.py: per-row money
# below $1e5 keeps e4-unit recovery inside 2^53 through the product;
# first contact at 1e12 measured the recovery going ulp-inexact exactly
# as that bound predicts) instead of the full band.
# int64 overflow-adjacency is deliberately NOT manufactured: the only
# non-key int64 measure (documents.n_chars) carries the n_chars =
# length(text) derivation contract, and breaking it to force a sum past
# 2^63 tests a corpus no contract admits (adjudication: SCALE.md r15
# int64-overflow probe).
_XVAL_DOUBLE_MAX = "1.7976931348623157e308"
_XVAL_SUBNORMAL = "4.9406564584124654e-324"  # min positive subnormal


def _apply_xval(sql: str, tname: str, columns: list[str]) -> str:
    if tname == "events":
        sign = "CASE WHEN hash(event_id + @SEED@ + 75) % 2 = 0 THEN 1.0 ELSE -1.0 END"
        rule = (
            f"CASE WHEN hash(event_id + @SEED@ + 71) % 41 = 5"
            f" THEN {_XVAL_DOUBLE_MAX} * ({sign})\n"
            f"                    WHEN hash(event_id + @SEED@ + 72) % 43 = 7"
            f" THEN {_XVAL_SUBNORMAL} * ({sign})\n"
            f"                    WHEN hash(event_id + @SEED@ + 73) % 47 = 11"
            f" THEN (1e8 + CAST(hash(event_id + @SEED@ + 76) % 100 AS DOUBLE)"
            f" / 100.0) * ({sign})\n"
            f"                    WHEN hash(event_id + @SEED@ + 74) % 53 = 13"
            f" THEN -(CAST(0.0 AS DOUBLE))\n"  # DECIMAL -0.0 loses the sign

            f"                    ELSE value END"
        )
        sel = ",\n               ".join(
            f"{rule} AS value" if c == "value" else c for c in columns
        )
        return f"SELECT {sel} FROM ({sql})"
    money = {
        "lineitem": ("l_extendedprice", "l_orderkey * 8 + l_linenumber"),
        "orders": ("o_totalprice", "o_orderkey"),
        "customer": ("c_acctbal", "c_custkey"),
    }.get(tname)
    if not money:
        return sql
    col, pk = money
    # in-domain boundary: just under the documented $1e5 money bound,
    # with fresh cents
    rule = (
        f"CASE WHEN hash({pk} + @SEED@ + 77) % 49 = 9"
        f" THEN 99000.0 + CAST(hash({pk} + @SEED@ + 78) % 1000 AS DOUBLE) / 100.0"
        f" ELSE {col} END"
    )
    sel = ",\n               ".join(
        f"{rule} AS {col}" if c == col else c for c in columns
    )
    return f"SELECT {sel} FROM ({sql})"


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


def build(
    base_dir: str,
    out_dir: str,
    seed: int = 0,
    nulls: bool = False,
    ties: bool = False,
    unicode_text: bool = False,
    json_shapes: bool = False,
    dupkeys: bool = False,
    xts: bool = False,
    xval: bool = False,
) -> None:
    base, out = Path(base_dir), Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for tname in TABLE_SQL:
        con.sql(
            f"CREATE VIEW {tname} AS SELECT * FROM '{base}/{tname}.parquet'"
        )
    for tname, sql in TABLE_SQL.items():
        want = pq.read_schema(base / f"{tname}.parquet")
        if ties:
            sql = _apply_ties(sql, tname, [f.name for f in want])
        if unicode_text:
            sql = _apply_unicode(sql, tname, [f.name for f in want])
        if json_shapes:
            sql = _apply_json(sql, tname, [f.name for f in want])
        if nulls:
            sql = _apply_nulls(sql, tname, [f.name for f in want])
        if xts:
            # after ties (ties copy in-window neighbors; xts then shifts
            # a slice of the RESULT, so tied pairs shift together when
            # both rows land in a slice, apart when only one does —
            # both compositions are wanted)
            sql = _apply_xts(sql, tname, [f.name for f in want])
        if xval:
            sql = _apply_xval(sql, tname, [f.name for f in want])
        if dupkeys:
            # OUTERMOST wrap: duplicates are verbatim copies of the
            # fully-perturbed rows, so the replay slice stays
            # value-symmetric under every composed regime
            sql = _apply_dupkeys(sql, tname, [f.name for f in want])
        got = con.sql(sql.replace("@SEED@", str(seed))).arrow()
        if isinstance(got, pa.RecordBatchReader):  # duckdb >= 1.3
            got = got.read_all()
        got = got.cast(want)
        pq.write_table(got, out / f"{tname}.parquet")
        if got.num_rows != pq.read_metadata(base / f"{tname}.parquet").num_rows:
            raise SystemExit(f"{tname}: row count changed")
    _perturb_embeddings(base, out, seed, nulls=nulls)
    print(
        f"perturbed corpus at {out} (seed {seed}, nulls={nulls},"
        f" ties={ties}, unicode={unicode_text}, json={json_shapes},"
        f" dupkeys={dupkeys}, xts={xts}, xval={xval})"
    )


if __name__ == "__main__":
    flags = ("--nulls", "--ties", "--unicode", "--json", "--dupkeys", "--xts", "--xval")
    args = [a for a in sys.argv[1:] if a not in flags]
    base = args[0] if len(args) > 0 else BASE
    out = args[1] if len(args) > 1 else tempfile.mkdtemp(prefix="perturbed-corpus-")
    build(
        base,
        out,
        int(args[2]) if len(args) > 2 else 0,
        nulls="--nulls" in sys.argv,
        ties="--ties" in sys.argv,
        unicode_text="--unicode" in sys.argv,
        json_shapes="--json" in sys.argv,
        dupkeys="--dupkeys" in sys.argv,
        xts="--xts" in sys.argv,
        xval="--xval" in sys.argv,
    )
