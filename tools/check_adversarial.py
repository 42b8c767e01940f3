"""Adversarial-fixture oracle gate: re-run every documents-, events-,
orders-, or embeddings-touching contract against a fixture where those
four tables carry pathological rows on top of the sf0.001 base —
documents: NULL/empty/whitespace text, multibyte (CJK / emoji /
combining marks) at window-hash span edges, a one-repeated-window doc,
a 20k-char doc, NULL lang/source, SQL-metacharacter soup, embedded NUL
bytes; embeddings: zero vector, 1e30/1e-30 magnitudes, exact and
ulp-level duplicates; events: NULL keys/times/measures, malformed
JSON, epoch-0 and far-future timestamps, exact-tie pairs; orders:
NULL join keys, NULL sort/measure columns, extreme dates, tie pairs.

Round-10's judge found a latent NULL-text hash mismatch
(``dedup_substring_clean`` n_cut, ADVICE r10) by *reading code*; this
gate finds that whole defect class *mechanically*: if Spark and DuckDB
disagree on any pathological row, the entry fails here first, before a
driver fixture ever grows a NULL. Usage:

    python tools/check_adversarial.py [entry ...]   # default: all
                                                    # documents-touching
"""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, ".")

BASE_SF = "/root/testdata/sf0.001"
FIX_DIR = Path("/tmp/gecko_adversarial_sf")

# (doc_id, text, lang, source) — n_chars derived as length(text).
_CJK_BLOCK = "汉字漢字テスト語彙解析" * 10  # 100 chars, all multibyte
ADVERSARIAL_DOCS = [
    (100001, None, "en", "srcA"),                      # NULL text
    (100002, "", "en", "srcA"),                        # empty text
    (100003, " \t\n  \t ", "en", "srcA"),              # whitespace only
    # multibyte doc with combining marks + emoji; length lands near the
    # substring-dedup window size (100) on purpose
    (100004, ("é🌍" + "é🌎汉" ) * 20, "zh", "srcA"),
    (100005, "ab" * 200, "en", "srcB"),                # one repeated window
    # two docs sharing a 100-char multibyte block → cross-doc dup span
    # whose edges are all multibyte code points
    (100006, "prefix one " + _CJK_BLOCK + " suffix one", "zh", "srcB"),
    (100007, "a different head " + _CJK_BLOCK + " and tail", "zh", "srcB"),
    # 20k chars: big enough to stress per-doc merge memory and chunked
    # span logic, small enough that the DuckDB window-hash oracle
    # (O(len·window) unrolled SQL per char) finishes in CI time
    (100008, ("the quick brown fox jumps over the lazy dog. " * 445)[:20000],
     "en", "srcC"),
    (100009, "an ordinary document with a null language tag", None, "srcC"),
    (100010, "he said \\\"hi\\\" & 'bye' \\ <b>bold</b> http://ex.com/a?b=c%20d"
             " -- ; DROP TABLE x; 100% $5.00", "en", None),
    (100011, "a", "en", "srcD"),                       # single char
    (100012, "null\x00byte embedded\x00twice", "en", "srcD"),
]


def _adversarial_vectors(dim: int) -> list:
    """(vec_id, embedding, label) rows stressing the similarity family:
    zero vector (undefined cosine), all-ones, extreme magnitudes (1e30,
    1e-30 — float32 range edges), an exact duplicate of vec 0, a
    near-duplicate of vec 0 (one component nudged by its own float32
    ulp), and an axis vector."""
    import pyarrow.parquet as papq

    base = papq.read_table(f"{BASE_SF}/embeddings.parquet").to_pydict()
    v0 = list(base["embedding"][0])
    near = list(v0)
    near[0] = float(near[0]) * (1 + 1e-6)
    axis = [0.0] * dim
    axis[dim // 2] = 1.0
    return [
        (100001, [0.0] * dim, 0),
        (100002, [1.0] * dim, 1),
        (100003, [1e30] * dim, 2),
        (100004, [1e-30] * dim, 3),
        (100005, v0, 4),
        (100006, near, 5),
        (100007, axis, 6),
    ]


# (event_id, ts, user_id, event_type, value, props) — NULL keys and
# measures, malformed/NULL props JSON, epoch-0 and far-future
# timestamps, and an exact-tie pair (same user, same ts) probing
# row_number/sessionization tie determinism across engines. event_ids
# continue past the base range (no duplicate PKs: the base tables'
# oracles assume PK uniqueness, as parquet ingests do).
ADVERSARIAL_EVENTS = [
    (200001, "2024-01-15 12:00:00", None, "click", 1.5, '{"k": 1}'),
    (200002, "2024-01-15 12:00:01", 13, None, 2.5, '{"k": 2}'),
    (200003, "2024-01-15 12:00:02", 13, "purchase", None, '{"k": 3}'),
    (200004, "2024-01-15 12:00:03", 13, "view", 3.5, None),
    (200005, "2024-01-15 12:00:04", 14, "view", 4.5, "not json {"),
    (200006, "1970-01-01 00:00:00", 14, "click", 0.0, "{}"),
    (200007, "2100-12-31 23:59:59", 14, "error", -1.0, '{"k": -1}'),
    # exact-tie pair: same user, same timestamp, distinct ids
    (200008, "2024-01-16 08:00:00", 15, "click", 7.0, '{"k": 7}'),
    (200009, "2024-01-16 08:00:00", 15, "click", 7.0, '{"k": 7}'),
    (200010, None, 15, "view", 9.0, '{"k": 9}'),  # NULL event time
]


# (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
# o_orderpriority) — NULL join key, NULL sort/measure columns, extreme
# dates, and a totalprice TIE pair: Spark and DuckDB default NULL
# ordering differs (ASC: Spark nulls FIRST, DuckDB nulls LAST), so any
# window/order contract without an explicit NULL policy or total
# tie-break surfaces here.
ADVERSARIAL_ORDERS = [
    (900001, None, "O", 1111.11, "1996-06-01", "1-URGENT"),
    (900002, 85, None, 2222.22, "1996-06-02", "2-HIGH"),
    (900003, 85, "F", None, "1996-06-03", None),
    (900004, 85, "F", 3333.33, None, "3-MEDIUM"),
    (900005, 86, "F", 3333.33, "1992-01-01", "4-NOT SPECIFIED"),  # tie w/ 900004
    (900006, 86, "O", 4444.44, "2099-12-31", "5-LOW"),
]


# (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice) — the
# linkage name-table pathology (VERDICT r11 #7): NULL/empty/whitespace
# names (NULL block keys must vanish from inner joins identically on
# both engines), multibyte and combining-mark names at edit-distance /
# JW-window edges (character-vs-byte divergence in levenshtein /
# jaro_winkler would surface here), the classic JW transposition pair
# (martha/marhta), a shared block with a leading-digit first token
# (soundex's non-letter passthrough inside a real blocked join), H/W
# leading soundex names, and same-name-different-size rows (block-key
# discrimination). Sizes cluster on 777/778 so the planted pairs
# actually co-block.
ADVERSARIAL_PARTS = [
    (300001, None, "Brand#1", "TYPE a", 777, 1.0),       # NULL name
    (300002, "", "Brand#1", "TYPE a", 777, 2.0),         # empty name
    (300003, "   ", "Brand#1", "TYPE a", 777, 3.0),      # whitespace name
    (300004, "martha steel blue", "Brand#2", "TYPE b", 777, 4.0),
    (300005, "marhta steel blue", "Brand#2", "TYPE b", 777, 5.0),  # JW transposition
    (300006, "müller grün polished", "Brand#3", "TYPE c", 778, 6.0),
    (300007, "muller grun polished", "Brand#3", "TYPE c", 778, 7.0),  # accent-stripped twin
    (300008, "müller grün polished", "Brand#3", "TYPE c", 778, 8.0),  # combining mark
    (300009, "汉字 widget 漢字", "Brand#4", "TYPE d", 778, 9.0),   # CJK tokens
    (300010, "汉字 widget 漢字X", "Brand#4", "TYPE d", 778, 10.0),  # CJK + 1 edit
    (300011, "4th gear special", "Brand#5", "TYPE e", 779, 11.0),  # digit first token
    (300012, "4th gear specials", "Brand#5", "TYPE e", 779, 12.0),
    (300013, "whyte honed almond", "Brand#6", "TYPE f", 780, 13.0),  # W-leading soundex
    (300014, "white honed almond", "Brand#6", "TYPE f", 780, 14.0),
    (300015, "same name same block", "Brand#7", "TYPE g", 781, 15.0),
    (300016, "same name same block", "Brand#7", "TYPE g", 781, 16.0),  # exact dup name
    (300017, "same name same block", "Brand#7", "TYPE g", 999, 17.0),  # dup name, other block
]


# (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment) — the
# sorted-neighborhood + Fellegi-Sunter pathology: NULL/empty/multibyte
# names at global-rank boundaries (SNM orders by (name, key) — NULL
# name ordering must agree across engines or the window pairs shift),
# NULL FS block key (nationkey) and NULL agreement field (mktsegment),
# and an identical-name tie pair probing rank tiebreaks.
ADVERSARIAL_CUSTOMERS = [
    (400001, None, 3, 1.0, "BUILDING"),          # NULL name
    (400002, "", 3, 2.0, "BUILDING"),            # empty name (sorts first)
    (400003, "Ärger Zoé", 3, 3.0, "MACHINERY"),  # multibyte, sorts by codepoint
    (400004, "Customer#tie", 5, 4.0, "AUTOMOBILE"),
    (400005, "Customer#tie", 5, 5.0, "AUTOMOBILE"),  # exact name tie
    (400006, "Customer#nullseg", 5, 6.0, None),  # NULL FS agreement field
    (400007, "Customer#nullnat", None, 7.0, "HOUSEHOLD"),  # NULL FS block key
    (400008, "éclair Ann", 7, 8.0, "FURNITURE"),   # é composed
    (400009, "éclair Ann", 7, 9.0, "FURNITURE"),  # é decomposed
]


def build_fixture() -> str:
    if FIX_DIR.exists():
        shutil.rmtree(FIX_DIR)
    FIX_DIR.mkdir(parents=True)
    for p in Path(BASE_SF).glob("*.parquet"):
        if p.stem not in (
            "documents", "embeddings", "events", "orders", "part", "customer"
        ):
            shutil.copy(p, FIX_DIR / p.name)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE adv (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR)"
    )
    con.executemany("INSERT INTO adv VALUES (?, ?, ?, ?)", ADVERSARIAL_DOCS)
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{BASE_SF}/documents.parquet')
          UNION ALL
          SELECT doc_id, text, lang, source,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM adv
          ORDER BY doc_id
        ) TO '{FIX_DIR}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(
        "CREATE TABLE adv_ord (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority VARCHAR)"
    )
    con.executemany(
        "INSERT INTO adv_ord VALUES (?, ?, ?, ?, ?, ?)", ADVERSARIAL_ORDERS
    )
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{BASE_SF}/orders.parquet')
          UNION ALL SELECT * FROM adv_ord ORDER BY o_orderkey
        ) TO '{FIX_DIR}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(
        "CREATE TABLE adv_ev (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO adv_ev VALUES (?, ?, ?, ?, ?, ?)", ADVERSARIAL_EVENTS
    )
    con.execute(f"""
        COPY (
          SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                 event_type, value, props
          FROM read_parquet('{BASE_SF}/events.parquet')
          UNION ALL SELECT * FROM adv_ev ORDER BY event_id
        ) TO '{FIX_DIR}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(
        "CREATE TABLE adv_part (p_partkey BIGINT, p_name VARCHAR, "
        "p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, "
        "p_retailprice DOUBLE)"
    )
    con.executemany(
        "INSERT INTO adv_part VALUES (?, ?, ?, ?, ?, ?)", ADVERSARIAL_PARTS
    )
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{BASE_SF}/part.parquet')
          UNION ALL SELECT * FROM adv_part ORDER BY p_partkey
        ) TO '{FIX_DIR}/part.parquet' (FORMAT PARQUET)
    """)
    con.execute(
        "CREATE TABLE adv_cust (c_custkey BIGINT, c_name VARCHAR, "
        "c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)"
    )
    con.executemany(
        "INSERT INTO adv_cust VALUES (?, ?, ?, ?, ?)", ADVERSARIAL_CUSTOMERS
    )
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{BASE_SF}/customer.parquet')
          UNION ALL SELECT * FROM adv_cust ORDER BY c_custkey
        ) TO '{FIX_DIR}/customer.parquet' (FORMAT PARQUET)
    """)
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet("
        f"'{BASE_SF}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    con.execute("CREATE TABLE adv_emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany(
        "INSERT INTO adv_emb VALUES (?, ?, ?)", _adversarial_vectors(dim)
    )
    con.execute(f"""
        COPY (
          SELECT * FROM read_parquet('{BASE_SF}/embeddings.parquet')
          UNION ALL SELECT * FROM adv_emb ORDER BY vec_id
        ) TO '{FIX_DIR}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return str(FIX_DIR)


def documents_entries() -> list[str]:
    """Entries whose oracle SQL (or known streaming parity capture)
    reads an adversarially-fixtured table. part/customer (the linkage
    name tables, round 12) match as relation references only — 'part'
    is a substring of split_part/PARTITION, so a bare find() would
    drag in half the catalogue."""
    import re

    import __spark_entry__ as e

    rel = re.compile(r"(?i)\b(?:from|join)\s+(part|customer)\b")
    names = []
    oracles = e.oracle_sql()
    for name in e.queries():
        sql = oracles.get(name, "")
        if ("documents" in sql or "embeddings" in sql or "orders" in sql
                or rel.search(sql) or name.startswith("stream_")):
            names.append(name)
    return names


def main() -> int:
    only = sys.argv[1:]
    fix = build_fixture()
    names = only or documents_entries()
    print(f"fixture: {fix}  entries: {len(names)}")
    rc = subprocess.call(
        [sys.executable, "tools/check_oracle.py", fix, *names]
    )
    return rc


if __name__ == "__main__":
    sys.exit(main())
