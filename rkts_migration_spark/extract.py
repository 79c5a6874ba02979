"""Mention extraction: batched token-level Aho-Corasick over transcript
turns via ``mapInPandas`` (Arrow batches — the sanctioned Python
boundary; no row-at-a-time Python UDFs, per BASELINE north_star).

Semantics (must equal the oracle's longest-first regex alternation,
oracle.py): normalize text (lowercase, collapse whitespace), then
leftmost-longest non-overlapping match of gazetteer surfaces at
whitespace-token boundaries. The trie is built ONCE per Python worker
from a broadcast surface list and cached by broadcast id, so a 1000-
executor run pays the build cost per worker, not per batch. This is
the distributed replacement for the reference's per-item string
scanning of catalog titles (/root/reference/kernelxmltottl.php:159-228).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V

MENTION_SCHEMA = "conv_id string, turn_idx int, begin int, matched string"


class TokenTrie:
    """Token-sequence trie with greedy longest-match scanning."""

    __slots__ = ("root",)

    def __init__(self, surfaces: list[str]):
        self.root: dict = {}
        for surf in surfaces:
            toks = surf.split(" ")
            node = self.root
            for t in toks:
                node = node.setdefault(t, {})
            node[None] = surf  # terminal -> canonical normalized surface

    def scan(self, norm_text: str) -> list[tuple[int, str]]:
        """[(char_offset_in_norm_text, matched_surface)], leftmost-longest
        non-overlapping."""
        toks = norm_text.split(" ")
        offsets = []
        off = 0
        for t in toks:
            offsets.append(off)
            off += len(t) + 1
        out: list[tuple[int, str]] = []
        i, n = 0, len(toks)
        while i < n:
            node = self.root
            best: str | None = None
            best_j = i
            j = i
            while j < n and toks[j] in node:
                node = node[toks[j]]
                j += 1
                if None in node:
                    best = node[None]
                    best_j = j
            if best is not None:
                out.append((offsets[i], best))
                i = best_j
            else:
                i += 1
        return out


_TRIE_CACHE: dict[int, TokenTrie] = {}


def _get_trie(bc) -> TokenTrie:
    key = id(bc)
    trie = _TRIE_CACHE.get(key)
    if trie is None:
        trie = TokenTrie(bc.value)
        _TRIE_CACHE.clear()  # one live gazetteer per worker
        _TRIE_CACHE[key] = trie
    return trie


def extract_mentions(turns: DataFrame, gazetteer: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, begin, matched) for every non-placeholder turn.

    Column pruning: only (conv_id, turn_idx, text) crosses the Arrow
    boundary. The placeholder filter runs JVM-side before the Python
    stage so empty turns never pay serialization.
    """
    spark = turns.sparkSession
    surfaces = sorted(
        {V.norm_surface(r["surface"]) for r in gazetteer.select("surface").collect()}
    )
    bc = spark.sparkContext.broadcast(surfaces)

    src = turns.select("conv_id", "turn_idx", "text").filter(
        ~F.col("text").isin(*V.PLACEHOLDERS)
    )

    def scan_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        trie = _get_trie(bc)
        for pdf in batches:
            conv_ids: list[str] = []
            turn_idxs: list[int] = []
            begins: list[int] = []
            matches: list[str] = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"].values, pdf["turn_idx"].values, pdf["text"].values
            ):
                if not text:
                    continue
                for begin, matched in trie.scan(V.norm_surface(text)):
                    conv_ids.append(conv_id)
                    turn_idxs.append(int(turn_idx))
                    begins.append(begin)
                    matches.append(matched)
            yield pd.DataFrame(
                {
                    "conv_id": pd.Series(conv_ids, dtype="object"),
                    "turn_idx": pd.Series(turn_idxs, dtype="int32"),
                    "begin": pd.Series(begins, dtype="int32"),
                    "matched": pd.Series(matches, dtype="object"),
                }
            )

    return src.mapInPandas(scan_batches, schema=MENTION_SCHEMA)
