"""Build the main-content-extraction ORACLE fixture:
``tests/fixtures/html_pages.parquet`` (page_id, html, expected_main).

Non-circular by construction (same design as the media fixtures): each
page is COMPOSED from blocks whose keep/drop fate is decided by the
planted numbers, not by running the kernel —

* content paragraphs are built ≥ 2× the 40-char minimum with zero or
  one short link (density far below 0.35) → keep by construction;
* nav/footer/aside blocks are either all-link (density 1.0) or shorter
  than 40 chars → drop by construction;
* each section heading is short (< 40 chars) and immediately precedes
  a content paragraph → kept by the heading-promotion rule.

``expected_main`` is therefore written straight from the planted
paragraph list. The builder then cross-checks the kernel reproduces it
(a regression gate, not the definition) before writing the parquet.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gecko_spark.operators.text import _extract_main_py  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures",
)


def build_page(i: int) -> tuple[str, str]:
    n_paras = 2 + (i % 3)
    heads, paras = [], []
    for j in range(n_paras):
        words = " ".join(f"w{(i * 13 + j * 7 + k) % 53}" for k in range(25 + 5 * j))
        if j == 1:
            # one short in-paragraph link: density stays well under 0.35
            words += ' see <a href="/ref">ref</a> for details and context'
        heads.append(f"Section {i}.{j}")
        paras.append(words)

    nav = "".join(
        f'<li><a href="/m{k}">menu item number {k}</a></li>' for k in range(5)
    )
    body = "".join(
        f"<h2>{h}</h2><p>{p}</p>" for h, p in zip(heads, paras)
    )
    html = (
        f"<html><head><title>t{i}</title><style>p{{margin:0}}</style>"
        f"<script>var v={i};</script></head><body>"
        f"<nav><ul>{nav}</ul></nav>"
        f'<header><a href="/">Site</a> | <a href="/in">Login</a></header>'
        f"<article>{body}</article>"
        f'<aside><a href="/a">Ad one</a> <a href="/b">Ad two</a></aside>'
        f'<footer>(c) 2024 <a href="/p">Privacy</a></footer>'
        f"</body></html>"
    )
    # expected: heading + paragraph text, tags removed, whitespace
    # collapsed — written from the PLAN, not the kernel
    flat = []
    for h, p in zip(heads, paras):
        flat.append(h)
        flat.append(" ".join(p.replace('<a href="/ref">', " ")
                             .replace("</a>", " ").split()))
    return html, "\n".join(flat)


def main() -> None:
    rows = [build_page(i) for i in range(10)]
    # the planted-fate crosscheck: kernel output == constructed expectation
    for i, (html, expected) in enumerate(rows):
        got = _extract_main_py(html, 40, 0.35)
        assert got == expected, (
            f"page {i}: kernel diverged from construction\n"
            f"got:      {got!r}\nexpected: {expected!r}"
        )
    table = pa.table(
        {
            "page_id": pa.array(range(len(rows)), pa.int64()),
            "html": pa.array([r[0] for r in rows]),
            "expected_main": pa.array([r[1] for r in rows]),
        }
    )
    pq.write_table(table, os.path.join(OUT_DIR, "html_pages.parquet"))
    print(f"wrote html_pages.parquet ({len(rows)} pages, construction-checked)")


if __name__ == "__main__":
    main()
