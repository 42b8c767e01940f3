"""CLDR keyboard XML → per-character typo-candidate map.

Parses a CLDR keyboard layout (release-43 format: ``keyboard/keyMap
[@modifiers]/map[@iso,@to]``) and computes, for every character on the
keyboard, the string of characters it could plausibly be mistyped as:
its 4-neighborhood on the key grid plus its shift-modifier counterpart.

Behavioral parity with the reference (gecko/mutator.py:149-227,
gecko/_cldr.py:6-63), re-implemented on the stdlib
``xml.etree.ElementTree`` (no lxml dependency). The candidate strings
are sorted for reproducibility, matching the reference.
"""

from __future__ import annotations

import html
import re
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Union

_UNICODE_ENTITY_RE = re.compile(r"\\u\{([0-9a-fA-F]+)\}")


def unescape_kb_char(char: str) -> str:
    """Unescape HTML entities and CLDR ``\\u{..}`` unicode escapes."""
    char = html.unescape(char)
    if char.startswith("\\u"):
        def _sub(m: re.Match) -> str:
            return chr(int(m.group(1), 16))

        return _UNICODE_ENTITY_RE.sub(_sub, char)
    return char


def decode_iso_kb_pos(iso: str) -> tuple[int, int]:
    """Decode an ISO key position like ``C05`` into (row, col)."""
    return ord(iso[0]) - ord("A"), int(iso[1:])


def _neighbors(
    pos: tuple[int, int, int], max_row: int, max_col: int
) -> list[tuple[int, int, int]]:
    row, col, mod = pos
    out = []
    if row > 0:
        out.append((row - 1, col, mod))
    if col > 0:
        out.append((row, col - 1, mod))
    if row < max_row:
        out.append((row + 1, col, mod))
    if col < max_col:
        out.append((row, col + 1, mod))
    out.append((row, col, mod ^ 1))  # shift flip
    return out


def load_cldr_candidates(
    cldr_path: Union[str, Path],
    charset: Union[str, list[str], None] = None,
) -> dict[str, str]:
    """Parse a CLDR keyboard file into ``{char: candidate_chars}``.

    ``charset`` optionally restricts which characters participate (both
    as mutation sources and candidates), mirroring the reference's
    charset filter applied at map-build time (gecko/mutator.py:190-193).
    """
    charset_set = set(charset) if charset is not None else None

    root = ET.parse(str(cldr_path)).getroot()

    entries: list[tuple[int, int, int, str]] = []
    max_row = max_col = 0
    for key_map in root.iterfind("./keyMap"):
        modifiers = key_map.get("modifiers")
        if modifiers is None:
            mod = 0
        elif modifiers == "shift":
            mod = 1
        else:
            continue
        for map_node in key_map.iterfind("./map"):
            row, col = decode_iso_kb_pos(map_node.get("iso"))
            max_row = max(max_row, row)
            max_col = max(max_col, col)
            char = unescape_kb_char(map_node.get("to"))
            if charset_set is not None and char not in charset_set:
                continue
            entries.append((row, col, mod, char))

    # the reference sizes the grid over ALL keys (before charset
    # filtering), so recompute max over every map node
    for map_node in root.iterfind("./keyMap/map"):
        row, col = decode_iso_kb_pos(map_node.get("iso"))
        max_row = max(max_row, row)
        max_col = max(max_col, col)

    grid: dict[tuple[int, int, int], str] = {}
    for row, col, mod, char in entries:
        grid[(row, col, mod)] = char

    candidates: dict[str, str] = {}
    for (row, col, mod), char in grid.items():
        if char == "":
            continue
        cands = set()
        for npos in _neighbors((row, col, mod), max_row, max_col):
            nchar = grid.get(npos, "")
            if nchar and nchar != char:
                cands.add(nchar)
        if cands:
            candidates[char] = "".join(sorted(cands))
    return candidates
