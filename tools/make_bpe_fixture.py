"""Build the BPE-encoding ORACLE fixture:
``tests/fixtures/bpe_expected.parquet`` (text_id, text, expected — the
space-joined token sequence).

Non-circular: the merge table is FIXED (three merges) and every
expected encoding below is derived BY HAND from the greedy
lowest-rank-first algorithm, written as literals — the kernel is then
cross-checked against the hand derivation before the parquet is
written (regression gate, not definition). The planted cases cover the
subtle behaviors: end-of-word marking blocks a merge whose right side
isn't ``</w>``-marked ("ab" stays a+b</w>), rank priority beats
position ((ab,c</w>) at rank 1 fires before (ab,c) at rank 2 even when
the rank-2 site is earlier in the word), unseen characters pass
through, and empty text yields zero tokens.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gecko_spark.operators.text import _bpe_encode_word  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)

# rank order: 0, 1, 2
MERGES = [("a", "b"), ("ab", "c</w>"), ("ab", "c")]

# (text, hand-derived expected tokens)
CASES = [
    # abc: a,b,c</w> -r0-> ab,c</w> -r1-> abc</w>
    ("abc", ["abc</w>"]),
    # abcd: a,b,c,d</w> -r0-> ab,c,d</w> -r2-> abc,d</w>; second word as case 1
    ("abcd abc", ["abc", "d</w>", "abc</w>"]),
    # ab alone: symbols are (a, b</w>) — rank-0 (a,b) does NOT apply
    ("ab", ["a", "b</w>"]),
    # cab: (c,a),(a,b</w>) — no merge matches
    ("ba cab", ["b", "a</w>", "c", "a", "b</w>"]),
    # abcabc: ab,c,ab,c</w> -> rank 1 at the LATER site beats rank 2 at
    # the earlier site -> ab,c,abc</w> -r2-> abc,abc</w>
    ("abcabc", ["abc", "abc</w>"]),
    # unseen characters pass through as themselves
    ("xyz", ["x", "y", "z</w>"]),
    ("", []),
    ("abc ab xyz abcabc", ["abc</w>", "a", "b</w>", "x", "y", "z</w>",
                           "abc", "abc</w>"]),
]


def main() -> None:
    ranks = {m: i for i, m in enumerate(MERGES)}
    for text, expected in CASES:
        got = []
        for w in text.split():
            got.extend(_bpe_encode_word(w, ranks))
        assert got == expected, (text, got, expected)
    table = pa.table(
        {
            "text_id": pa.array(range(len(CASES)), pa.int64()),
            "text": pa.array([t for t, _ in CASES]),
            "expected": pa.array([" ".join(e) for _, e in CASES]),
            "expected_n": pa.array([len(e) for _, e in CASES], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(OUT_DIR, "bpe_expected.parquet"))
    print(f"wrote bpe_expected.parquet ({len(CASES)} hand-derived cases)")


if __name__ == "__main__":
    main()
